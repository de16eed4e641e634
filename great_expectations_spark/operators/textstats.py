"""Text-analysis operators for corpus curation — all JVM-side expressions.

- :func:`token_count_ws` / :func:`token_count_bpe_ish` — token counting
  (whitespace and a BPE-ish regex segmentation)
- :func:`language_scores` / :func:`detect_language` — stopword-profile
  language ID (n-gram/stopword heuristic; no external model)
- :func:`text_quality_profile` / :func:`quality_score` — length / punct /
  stopword-ratio quality features and a composite score
- :func:`document_fingerprint` / :func:`kgram_fingerprints` — whole-doc
  rolling-hash fingerprint and sampled k-gram fingerprints ("0 mod p"
  selection; cf. winnowing, Schleimer et al. SIGMOD'03)

Every function returns Column expressions or narrow projections, so quality
filtering composes with predicate pushdown: a downstream
``.filter(quality_score(...) > t)`` runs inside the same codegen stage as
the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword profiles (top function words). Enough signal to
# separate major European languages on ≥20-word docs; this is the classic
# stopword-profile heuristic, not a trained model.
STOPWORD_PROFILES: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "is", "it", "you", "that", "was",
           "for", "on", "are", "with", "as", "this", "have", "from", "they"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "ein", "mit",
           "auf", "für", "den", "von", "des", "dem", "sich", "aber", "auch"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "un", "une", "dans",
           "que", "qui", "pour", "pas", "sur", "avec", "par", "mais", "nous"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un", "una",
           "es", "no", "por", "con", "para", "del", "se", "su", "como"],
    "it": ["il", "la", "di", "che", "e", "un", "una", "per", "non", "sono",
           "con", "del", "della", "gli", "le", "si", "ma", "anche", "come"],
}

#: BPE-ish segmentation: word pieces, numbers, or single non-space symbols —
#: the GPT-2-style pre-tokenizer shape expressible as a pure regex.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _contains(sw: Column):
    """Single-arg lambda factory — a 2-arg lambda would be interpreted by
    PySpark's higher-order-function binding as (element, index)."""
    return lambda t: F.array_contains(sw, t)


def tokens(text_col: str | Column) -> Column:
    """Lowercased whitespace tokens (empty strings removed)."""
    return F.filter(
        F.split(F.lower(F.trim(_c(text_col))), r"\s+"),
        lambda t: F.length(t) > 0,
    )


def token_count_ws(text_col: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text_col))


def token_count_bpe_ish(text_col: str | Column) -> Column:
    """BPE-ish token count: segments matched by :data:`BPE_ISH_PATTERN`
    (letters-run | digits-run | single symbol) — a cheap, deterministic
    proxy for subword tokenizer counts, fully vectorized via
    ``regexp_count``."""
    return F.regexp_count(_c(text_col), F.lit(BPE_ISH_PATTERN))


def language_scores(
    text_col: str | Column, toks: Column | None = None
) -> Column:
    """Per-language stopword-hit fraction as a map<lang, double>.

    ``toks``: optionally pass a pre-materialized token-array ATTRIBUTE to
    avoid re-tokenizing — tokenize() contains a HOF filter, which blocks
    codegen common-subexpression elimination, so every textual use
    re-runs the split regex (see ``text_quality_profile``)."""
    toks = tokens(text_col) if toks is None else toks
    n = F.size(toks)
    entries = []
    for lang, words in STOPWORD_PROFILES.items():
        sw = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, _contains(sw)))
        entries.append(
            (F.lit(lang), F.when(n > 0, hits / n).otherwise(F.lit(0.0)))
        )
    return F.map_from_arrays(
        F.array(*[e[0] for e in entries]), F.array(*[e[1] for e in entries])
    )


def detect_language(
    text_col: str | Column,
    min_score: float = 0.05,
    toks: Column | None = None,
) -> Column:
    """argmax over :func:`language_scores`; ``'und'`` (undetermined) when no
    profile clears ``min_score``."""
    toks = tokens(text_col) if toks is None else toks
    n = F.size(toks)
    scored = []
    for lang, words in STOPWORD_PROFILES.items():
        sw = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, _contains(sw)))
        score = F.when(n > 0, hits / n).otherwise(F.lit(0.0))
        scored.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scored))
    return F.when(best["score"] >= min_score, best["lang"]).otherwise(
        F.lit("und")
    )


def quality_features(
    text_col: str | Column, toks: Column | None = None
) -> dict[str, Column]:
    """The standard cheap quality signals (C4/Gopher-style heuristics)."""
    c = _c(text_col)
    toks = tokens(c) if toks is None else toks
    n_tok = F.size(toks)
    n_chars = F.length(c)
    alpha_chars = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    punct_chars = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", ""))
    sw = F.array(
        *[F.lit(w) for w in STOPWORD_PROFILES["en"]]
    )
    sw_hits = F.size(F.filter(toks, _contains(sw)))
    mean_tok_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
        / n_tok,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "n_tokens_bpe_ish": token_count_bpe_ish(c),
        "alpha_ratio": F.when(n_chars > 0, alpha_chars / n_chars).otherwise(0.0),
        "punct_ratio": F.when(n_chars > 0, punct_chars / n_chars).otherwise(0.0),
        "stopword_ratio": F.when(n_tok > 0, sw_hits / n_tok).otherwise(0.0),
        "mean_token_len": mean_tok_len,
    }


def quality_score(
    text_col: str | Column, toks: Column | None = None
) -> Column:
    """Composite [0,1] quality score: penalize too-short/too-long docs,
    low alpha ratio, punctuation walls, stopword-free keyword soup, and
    degenerate token lengths. Weights are heuristic but deterministic."""
    f = quality_features(text_col, toks=toks)
    len_score = F.least(
        F.lit(1.0), f["n_tokens"] / F.lit(20.0)
    ) * F.when(f["n_tokens"] > 10_000, F.lit(0.5)).otherwise(F.lit(1.0))
    alpha_score = F.least(F.lit(1.0), f["alpha_ratio"] / F.lit(0.6))
    punct_score = F.when(f["punct_ratio"] > 0.3, F.lit(0.3)).otherwise(F.lit(1.0))
    sw_score = F.least(F.lit(1.0), f["stopword_ratio"] / F.lit(0.1))
    tok_len_score = F.when(
        (f["mean_token_len"] >= 2.5) & (f["mean_token_len"] <= 10.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return (
        len_score * alpha_score * punct_score * sw_score * tok_len_score
    ).alias("quality_score")


def text_quality_profile(df: DataFrame, text_col: str) -> DataFrame:
    """Append all quality feature columns + composite score + language.

    Tokenizes ONCE per row: the token array is materialized as a column
    and passed to every helper as an attribute (without this the inlined
    tokenize() — whose HOF filter blocks codegen subexpression
    elimination — re-ran the split regex ~12x per row across the
    feature/score/language expressions)."""
    out = df.withColumn("__gx_toks", tokens(text_col))
    toks = F.col("__gx_toks")
    feats = quality_features(text_col, toks=toks)
    for name, expr in feats.items():
        out = out.withColumn(name, expr)
    return (
        out.withColumn("quality_score", quality_score(text_col, toks=toks))
        .withColumn("detected_lang", detect_language(text_col, toks=toks))
        .drop("__gx_toks")
    )


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------

def document_fingerprint(text_col: str | Column) -> Column:
    """Whole-document 64-bit fingerprint of the normalized text."""
    c = F.regexp_replace(F.lower(F.trim(_c(text_col))), r"\s+", " ")
    return F.xxhash64(c)


def kgram_fingerprints(
    text_col: str | Column, k: int = 8, p: int = 4
) -> Column:
    """Rolling k-gram fingerprints with "0 mod p" selection: hash every
    character k-gram, keep the ~1/p whose hash ≡ 0 (mod p). Linear-time in
    Catalyst (one transform + one filter over the gram array — a
    sliding-window minimum à la winnowing [Schleimer et al., SIGMOD'03]
    would re-inline the gram array per window position under project
    collapsing and go quadratic). Documents that select no gram fall back
    to their single minimum hash so every non-empty doc has ≥1 print.
    Returns a distinct array<bigint>.
    """
    c = F.regexp_replace(F.lower(F.trim(_c(text_col))), r"\s+", " ")
    n_grams = F.greatest(F.length(c) - (k - 1), F.lit(0))
    gram_hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.xxhash64(c.substr(i, F.lit(k))),
    )
    selected = F.array_distinct(
        F.filter(gram_hashes, lambda h: F.pmod(h, F.lit(p)) == 0)
    )
    return F.when(n_grams <= 0, F.array().cast("array<bigint>")).otherwise(
        F.when(F.size(selected) > 0, selected).otherwise(
            F.array(F.array_min(gram_hashes))
        )
    )


def kgram_fingerprint_rows(
    df: DataFrame, text_col: str, id_col: str, k: int = 8, p: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, fp) rows of distinct selected k-gram fingerprints per doc —
    the DataFrame-level path for :func:`kgram_fingerprints`.

    The Column form's HOF lambdas are interpreted per gram position
    (measured ~90µs/row under explode); here gram positions explode through
    GenerateExec and the substring+hash+mod-p selection is whole-stage
    codegen. Same "0 mod p" selection and same min-hash fallback for docs
    that select nothing.

    ``hash_fn='md5'`` swaps the gram hash for the 60-bit md5-derived form
    (``operators.dedup._md5num``) so an ANSI/DuckDB oracle can replay the
    whole selection; xxhash64 stays the production default (one JVM
    intrinsic per gram vs md5's digest + hex + base conversion). The
    "0 mod p" selection rate is the same under either hash."""
    from great_expectations_spark.operators.dedup import (
        _check_hash_fn,
        _ensure_parallelism,
        _md5num,
    )

    _check_hash_fn(hash_fn)
    hasher = F.xxhash64 if hash_fn == "xxhash64" else _md5num
    base = (
        _ensure_parallelism(df.filter(F.col(text_col).isNotNull()), id_col)
        .select(
            F.col(id_col).alias("__id"),
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ").alias("__t"),
        )
        .filter(F.length("__t") >= k)
    )
    grams = base.select(
        "__id",
        F.explode(F.sequence(F.lit(1), F.length("__t") - (k - 1))).alias("__p"),
        "__t",
    ).select(
        "__id", hasher(F.col("__t").substr(F.col("__p"), F.lit(k))).alias("fp")
    )
    selected = grams.filter(F.pmod("fp", F.lit(p)) == 0).distinct()
    fallback = (
        grams.join(selected.select("__id").distinct(), "__id", "left_anti")
        .groupBy("__id")
        .agg(F.min("fp").alias("fp"))
    )
    return selected.unionByName(fallback)


def _grams_arr(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of a token-array ATTRIBUTE (see the
    captured-subtree note in ``repetition_profile``)."""
    n_grams = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(n_grams <= 0, F.array().cast("array<string>")).otherwise(
        grams
    )


def _runlength_stats(arr: Column) -> Column:
    """Row-local duplicate statistics of one doc's gram/line array:
    ``struct(top, dup, occ, distinct, chars)`` (all bigint), where ``top``
    is the max over distinct values of ``count*length`` and ``dup`` the sum
    of ``count*length`` over values occurring more than once.

    Sort the array, then a single linear run-length walk with
    ``F.aggregate`` — the merge lambda touches only the accumulator and
    the element, so nothing re-evaluates per element."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("top"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("distinct"),
        F.lit(0).cast("long").alias("occ"),
        F.lit(0).cast("long").alias("chars"),
    )

    def _flush_top(acc):
        run_cov = acc["run"] * F.length(acc["prev"])
        return F.when(acc["prev"].isNull(), acc["top"]).otherwise(
            F.greatest(acc["top"], run_cov)
        )

    def _flush_dup(acc):
        run_cov = acc["run"] * F.length(acc["prev"])
        return F.when(
            acc["prev"].isNotNull() & (acc["run"] > 1), acc["dup"] + run_cov
        ).otherwise(acc["dup"])

    def step(acc, g):
        same = acc["prev"].isNotNull() & (g == acc["prev"])
        return F.when(
            same,
            F.struct(
                acc["prev"].alias("prev"),
                (acc["run"] + 1).alias("run"),
                acc["top"].alias("top"),
                acc["dup"].alias("dup"),
                acc["distinct"].alias("distinct"),
                (acc["occ"] + 1).alias("occ"),
                (acc["chars"] + F.length(g)).alias("chars"),
            ),
        ).otherwise(
            F.struct(
                g.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                _flush_top(acc).alias("top"),
                _flush_dup(acc).alias("dup"),
                (acc["distinct"] + 1).alias("distinct"),
                (acc["occ"] + 1).alias("occ"),
                (acc["chars"] + F.length(g)).alias("chars"),
            )
        )

    def finish(acc):
        return F.struct(
            _flush_top(acc).alias("top"),
            _flush_dup(acc).alias("dup"),
            acc["occ"].alias("occ"),
            acc["distinct"].alias("distinct"),
            acc["chars"].alias("chars"),
        )

    return F.aggregate(F.array_sort(arr), zero, step, finish)


def repetition_profile(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7),
    strategy: str = "rowlocal",
) -> DataFrame:
    """Per-document repetition quality signals (Gopher-style; Rae et al.
    2021 appendix A1.1 "repetitious text" filters, as popularized for LLM
    corpus curation):

    - ``dup_line_frac`` — fraction of (trimmed, non-empty) lines that are
      repeat occurrences: ``(total_lines - distinct_lines) / total_lines``
    - ``dup_line_char_frac`` — characters inside lines that occur more
      than once (ALL their occurrences) / total line characters
    - ``top_{n}gram_char_frac`` (n ∈ ``top_ns``) — the largest
      character coverage of any single word n-gram:
      ``max over grams of (count × gram_chars) / text_chars``. Defined as
      the max of the product (not "count of the argmax gram") so the value
      is deterministic under count ties with different gram lengths.
    - ``dup_{n}gram_char_frac`` (n ∈ ``dup_ns``) — characters covered by
      word n-grams occurring more than once, counting every occurrence:
      ``sum over grams with count>1 of (count × gram_chars) / text_chars``.
      Overlapping occurrences are NOT de-overlapped (the exact Gopher
      variant marks character positions); this standard approximation can
      exceed 1.0 on pathologically repetitive docs — callers threshold,
      not sum, these fractions.

    ``text_chars`` is the raw text length; gram chars are the
    space-joined lowercase gram length.

    ``strategy`` (identical results — equality-tested — different plans):

    - ``"rowlocal"`` (default) — ZERO-SHUFFLE: every statistic is
      per-document, so each doc's gram arrays are sorted and
      run-length-walked inside one projection (``_runlength_stats``); the
      whole profile is a map-only plan over the scan (plan-asserted: no
      Exchange, no Generate). The per-row working set is
      O(words x (len(top_ns)+len(dup_ns))) — fine up to multi-MB docs, and
      the shape that scales linearly with executors at 100 TB. Measured
      30-40x faster than ``"shuffle"`` at 500k docs
      (BENCH/PIPELINE_OPS.md addendum).
    - ``"shuffle"`` — stacked explode + keyed aggregations, described
      below; moves ~sum(len-n+1) slim rows per doc through an exchange
      (measured DRAM-bandwidth-bound). Use only when single pathological
      documents (10^8+ chars) could not hold their gram array in one
      task's memory.

    Scale shape (``strategy="shuffle"``): ONE stacked explode produces
    ``(id, n, gram)`` rows for
    every requested n AND the line rows (sentinel n = -1) — a single
    GenerateExec over a single text scan (a separate line explode would
    re-scan the full text column) — then keyed aggregations
    ``(id, n, gram) → (id, n) → (id)``: all slim rows on the uniform
    document-id key, no skew surface, no collect. The only other input
    consumption is a column-pruned ``(id, length(text))`` pass for the
    denominators. Returns one row per non-null-text input doc.
    """
    ns = sorted(set(top_ns) | set(dup_ns))
    if not ns or min(ns) < 1:
        raise ValueError("top_ns/dup_ns must contain integers >= 1")
    if strategy not in ("shuffle", "rowlocal"):
        raise ValueError("strategy must be 'shuffle' or 'rowlocal'")

    # Tokens and lines are materialized as COLUMNS here, not inlined into
    # the gram lambdas below: a higher-order-function lambda re-evaluates
    # every captured non-attribute subtree once per array element, so an
    # inline split() re-tokenized each doc ~sum(len-n+1) times (measured
    # >10x end-to-end; same trap documented in
    # decontamination._grams_of_tokens). CollapseProject keeps a non-cheap
    # multi-referenced alias, so this stays a separate projection.
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: F.length(t) > 0,
        ).alias("__toks"),
        F.filter(
            F.transform(F.split(F.col(text_col), r"\n"), lambda l: F.trim(l)),
            lambda l: F.length(l) > 0,
        ).alias("__lines"),
    )

    toks = F.col("__toks")

    if strategy == "rowlocal":
        stats = base.select(
            "__id",
            "n_chars",
            *[
                _runlength_stats(_grams_arr(toks, n)).alias(f"__s_{n}")
                for n in ns
            ],
            _runlength_stats(F.col("__lines")).alias("__s_l"),
        )
        rfrac = lambda num, den: F.when(  # noqa: E731
            den > 0, num.cast("double") / den
        ).otherwise(F.lit(0.0))
        rproj = [
            F.col("__id").alias(id_col),
            F.col("n_chars"),
            F.col("__s_l.occ").alias("n_lines"),
            rfrac(
                F.col("__s_l.occ") - F.col("__s_l.distinct"),
                F.col("__s_l.occ"),
            ).alias("dup_line_frac"),
            rfrac(F.col("__s_l.dup"), F.col("__s_l.chars")).alias(
                "dup_line_char_frac"
            ),
        ]
        for n in top_ns:
            rproj.append(
                rfrac(F.col(f"__s_{n}.top"), F.col("n_chars"))
                .alias(f"top_{n}gram_char_frac")
            )
        for n in dup_ns:
            rproj.append(
                rfrac(F.col(f"__s_{n}.dup"), F.col("n_chars"))
                .alias(f"dup_{n}gram_char_frac")
            )
        return stats.select(*rproj)

    def _gram_at(n: int):
        # single-arg lambda factory — a 2-arg lambda (even via a default)
        # would be bound by PySpark's HOF machinery as (element, index)
        return lambda i: F.struct(
            F.lit(n).alias("n"),
            F.array_join(F.slice(toks, i, n), " ").alias("gram"),
        )

    stacked = []
    for n in ns:
        n_grams = F.greatest(F.size(toks) - (n - 1), F.lit(0))
        grams_n = F.transform(F.sequence(F.lit(1), n_grams), _gram_at(n))
        stacked.append(
            F.when(n_grams <= 0, F.array().cast(
                "array<struct<n:int,gram:string>>")).otherwise(grams_n)
        )
    # line rows ride the same explode under sentinel n = -1
    line_structs = F.transform(
        F.col("__lines"),
        lambda l: F.struct(F.lit(-1).alias("n"), l.alias("gram")),
    )
    gram_rows = base.select(
        "__id", F.explode(F.concat(*stacked, line_structs)).alias("g")
    ).select("__id", F.col("g.n").alias("__n"), F.col("g.gram").alias("__gram"))

    per_gram = gram_rows.groupBy("__id", "__n", "__gram").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    # ONE (id, n) aggregation computes the gram metrics AND (under the
    # line sentinel) the line metrics — no filter split, so the whole
    # profile is a single linear chain (one Generate, one
    # (id,n,gram)-keyed shuffle, then strictly shrinking keyed aggs). A
    # filtered two-branch form re-explodes the text per branch: pushdown
    # splits the exchange subtrees and defeats exchange reuse.
    cov = F.col("__cnt") * F.length("__gram")
    per_n = per_gram.groupBy("__id", "__n").agg(
        F.max(cov).alias("__top_cov"),
        F.coalesce(
            F.sum(F.when(F.col("__cnt") > 1, cov)), F.lit(0)
        ).alias("__dup_cov"),
        F.sum("__cnt").alias("__occ"),
        F.count(F.lit(1)).alias("__distinct"),
        F.sum(cov).alias("__chars"),
    )

    def _pick(n: int, col: str):
        return F.first(
            F.when(F.col("__n") == n, F.col(col)), ignorenulls=True
        )

    stats_aggs = (
        [F.coalesce(_pick(n, "__top_cov"), F.lit(0)).alias(f"__top_{n}")
         for n in top_ns]
        + [F.coalesce(_pick(n, "__dup_cov"), F.lit(0)).alias(f"__dup_{n}")
           for n in dup_ns]
        + [
            F.coalesce(_pick(-1, "__occ"), F.lit(0)).alias("__n_lines"),
            F.coalesce(_pick(-1, "__distinct"), F.lit(0)).alias("__n_distinct"),
            F.coalesce(_pick(-1, "__dup_cov"), F.lit(0)).alias("__dup_line_cov"),
            F.coalesce(_pick(-1, "__chars"), F.lit(0)).alias("__line_chars"),
        ]
    )
    doc_stats = per_n.groupBy("__id").agg(*stats_aggs)

    out = base.select("__id", "n_chars").join(doc_stats, "__id", "left")
    frac = lambda num, den: F.when(  # noqa: E731
        den > 0, num.cast("double") / den
    ).otherwise(F.lit(0.0))
    proj = [
        F.col("__id").alias(id_col),
        F.col("n_chars"),
        F.coalesce(F.col("__n_lines"), F.lit(0)).alias("n_lines"),
        frac(
            F.coalesce(F.col("__n_lines") - F.col("__n_distinct"), F.lit(0)),
            F.coalesce(F.col("__n_lines"), F.lit(0)),
        ).alias("dup_line_frac"),
        frac(
            F.coalesce(F.col("__dup_line_cov"), F.lit(0)),
            F.coalesce(F.col("__line_chars"), F.lit(0)),
        ).alias("dup_line_char_frac"),
    ]
    for n in top_ns:
        proj.append(
            frac(F.coalesce(F.col(f"__top_{n}"), F.lit(0)), F.col("n_chars"))
            .alias(f"top_{n}gram_char_frac")
        )
    for n in dup_ns:
        proj.append(
            frac(F.coalesce(F.col(f"__dup_{n}"), F.lit(0)), F.col("n_chars"))
            .alias(f"dup_{n}gram_char_frac")
        )
    return out.select(*proj)


def fingerprint_overlap_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    p: int = 4,
    min_shared: int = 2,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Plagiarism-style containment detection: explode k-gram
    fingerprints, join on fingerprint, count shared prints per pair.
    Returns (id_a, id_b, shared_fingerprints).

    ``max_bucket_size`` discards fingerprints shared by more than that many
    documents before the pair join — ubiquitous grams ("stop fingerprints",
    standard winnowing practice) carry no containment signal and blow the
    join up quadratically (a 5000-doc bucket alone is 12.5M pairs)."""
    fps = kgram_fingerprint_rows(df, text_col, id_col, k, p)
    sizes = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__bsz"))
    fps = fps.join(
        sizes.filter(F.col("__bsz") <= max_bucket_size).select("fp"),
        on="fp",
        how="left_semi",
    )
    a = fps.select("fp", F.col("__id").alias("id_a"))
    b = fps.select("fp", F.col("__id").alias("id_b"))
    return (
        a.join(b, on="fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
        .filter(F.col("shared_fingerprints") >= min_shared)
    )


def corpus_ngram_diversity(
    df: DataFrame,
    text_col: str = "text",
    ns: tuple[int, ...] = (1, 2, 3),
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Corpus-level distinct-n diversity: ``(n, total_grams,
    distinct_grams, diversity)`` with ``diversity = distinct / total`` —
    the distinct-N metric used to QA synthetic / model-generated corpora
    (mode collapse shows up as diversity cratering at n ≥ 2 long before
    humans notice).

    Scale shape: the tokenizer materializes ONCE per row in its own
    projection (the HOF captured-subtree trap, SURVEY §8.2), all n stack
    through one Generate, and only ``(n, gram_hash)`` rows shuffle.
    ``count_distinct`` plans as the two-phase distinct (first exchange
    keyed ``(n, hash)``), so the tiny n-key space does not skew.
    ``hash_fn="md5"`` gives the SQL-replayable hash; distinct counts are
    hash-collision-exact up to the documented 64-bit birthday bound.
    """
    from great_expectations_spark.operators.dedup import (
        _check_hash_fn,
        _md5num,
    )

    _check_hash_fn(hash_fn)

    def _h(g: Column) -> Column:
        return F.xxhash64(g) if hash_fn == "xxhash64" else _md5num(g)

    toked = df.select(tokens(F.col(text_col)).alias("__toks"))

    def _stack(n: int) -> Column:
        # single-arg lambda factory: a 2-arg lambda (g, n) would be bound
        # by PySpark's HOF signature inspection as (element, index)
        return F.transform(
            _grams_arr(F.col("__toks"), n),
            lambda g: F.struct(F.lit(n).alias("n"), _h(g).alias("gh")),
        )

    stacks = [_stack(n) for n in ns]
    rows = toked.select(
        F.explode(F.flatten(F.array(*stacks))).alias("__g")
    ).select(F.col("__g.n").alias("n"), F.col("__g.gh").alias("gh"))
    return (
        rows.groupBy("n")
        .agg(
            F.count(F.lit(1)).alias("total_grams"),
            F.count_distinct("gh").alias("distinct_grams"),
        )
        .withColumn(
            # groupBy only emits groups with ≥1 row, so no zero guard
            "diversity",
            F.col("distinct_grams") / F.col("total_grams"),
        )
    )
