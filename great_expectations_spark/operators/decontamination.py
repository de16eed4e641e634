"""Benchmark decontamination — training⇄eval n-gram overlap detection.

Implements the public n-gram-collision decontamination protocol used for
LLM training corpora (the GPT-2/GPT-3 "13-gram overlap" method and The
Pile's variant): normalize text, form word n-grams, and flag every training
document that shares at least ``min_hits`` distinct n-grams with any
document in a benchmark/eval corpus.

Reference-parity note: the upstream engine (SURVEY.md §2 inventory) has no
decontamination operator — this is part of the round brief's
"large-scale training-data pipeline" family, alongside
``operators/dedup.py`` and ``operators/textstats.py``.

Scale shape (the asymmetry IS the design — 100 TB corpus, ~MB benchmark):

- **corpus side never shuffles its text.** Word n-grams are formed inside
  whole-stage codegen (``split`` → ``sequence`` → ``transform`` →
  ``array_distinct``) and exploded through a single GenerateExec into a
  slim ``(id, gram)`` pair stream; when ``hash_fn='xxhash64'`` the gram is
  reduced to 8 bytes before anything leaves the scan stage.
- **benchmark side is always broadcast.** Eval suites are 10^4–10^6
  distinct grams (MMLU + GSM8K + HumanEval together are a few MB) — the
  distinct-gram relation gets an explicit ``F.broadcast`` hint, so the
  contamination join is a broadcast-hash semi/inner join: zero shuffle of
  the 100 TB side, no skew surface.
- the only shuffle in the whole pipeline is the final per-doc hit-count
  ``groupBy(id)`` over matched pairs — a vanishingly small fraction of
  corpus rows (matches only).

The per-call default keeps raw gram strings (``hash_fn='none'``) so results
are byte-reproducible in ANSI SQL / DuckDB for the oracle harness;
production at scale should pass ``hash_fn='xxhash64'`` for the slim pair
stream (identical semantics modulo the ~2^-64 collision rate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "word_ngrams",
    "ngram_rows",
    "contaminated_docs",
    "decontaminate",
]


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _check_hash_fn(hash_fn: str) -> None:
    if hash_fn not in ("none", "xxhash64"):
        raise ValueError("hash_fn must be 'none' or 'xxhash64'")


def normalize_text(text_col: str | Column) -> Column:
    """Decontamination normalization: lowercase, strip punctuation to
    spaces, collapse whitespace — so formatting/casing differences between
    a training copy and the eval original still collide. Unicode-aware
    (``\\p{L}\\p{N}``): training corpora are multilingual, and an
    ASCII-only class would silently scope the whole gate to English (every
    Cyrillic/CJK/accented benchmark copy would normalize to zero tokens
    and never be flagged). The same class exists in RE2, so DuckDB oracles
    reproduce it verbatim."""
    c = F.lower(F.trim(_c(text_col)))
    c = F.regexp_replace(c, r"[^\p{L}\p{N}]+", " ")
    return F.trim(c)


def tokenize(text_col: str | Column) -> Column:
    """Normalized word tokens as ``array<string>`` (empty tokens dropped)."""
    toks = F.split(normalize_text(text_col), " ")
    return F.filter(toks, lambda t: F.length(t) > 0)


def _grams_of_tokens(toks: Column, n: int) -> Column:
    """Distinct space-joined ``n``-grams of a token-array column.

    PERF CONTRACT: pass an ATTRIBUTE (a materialized column), not a complex
    expression. A Spark higher-order-function lambda re-evaluates every
    captured non-attribute subtree ONCE PER ARRAY ELEMENT — with the
    tokenizer (Unicode regex + split) captured here, that re-tokenized
    each document ~``words`` times and measured 26x slower end-to-end.
    ``ngram_rows`` materializes tokens in their own projection first
    (CollapseProject keeps a non-cheap alias referenced more than once).
    """
    n_grams = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(n_grams <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(grams)
    )


def word_ngrams(text_col: str | Column, n: int = 13) -> Column:
    """Distinct space-joined word ``n``-grams of the normalized text as
    ``array<string>``. Documents with fewer than ``n`` words return an
    empty array (they cannot be contaminated at this n).

    Convenience single-expression form; for bulk paths prefer
    ``ngram_rows``, which materializes the token array once per row
    (see ``_grams_of_tokens`` PERF CONTRACT)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    return _grams_of_tokens(tokenize(text_col), n)


def ngram_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 13,
    hash_fn: str = "none",
) -> DataFrame:
    """``(id, gram)`` rows — one per distinct word n-gram per document.

    The gram column is the raw string (``hash_fn='none'``) or its
    ``xxhash64`` (slim 8-byte shuffle rows for the 100 TB path). The
    explode runs through one GenerateExec per scan partition; nothing
    here shuffles. Tokenization happens in its own projection so the
    gram lambda only captures an attribute (see ``_grams_of_tokens``).
    """
    _check_hash_fn(hash_fn)
    if n < 1:
        raise ValueError("n must be >= 1")
    if hash_fn == "xxhash64":
        # Token-hash form: gram strings are never built. Hash each token
        # once (8 bytes), then a gram's hash is xxhash64 over the length-n
        # slice of token hashes. Flagging semantics are identical because
        # BOTH sides of the contamination join derive grams through this
        # same function (equality-of-hash == equality-of-gram modulo the
        # documented ~2^-64 collision rate, which also covers
        # array_distinct de-duplicating by hash). Skips array_join'ing
        # ~9n bytes per gram on the 100 TB side.
        toked = df.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias("__id"),
            F.transform(
                tokenize(text_col), lambda t: F.xxhash64(t)
            ).alias("__thash"),
        )
        thash = F.col("__thash")
        n_grams = F.greatest(F.size(thash) - (n - 1), F.lit(0))
        grams = F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.xxhash64(F.slice(thash, i, n)),
        )
        grams = F.when(n_grams <= 0, F.array().cast("array<long>")).otherwise(
            F.array_distinct(grams)
        )
        return toked.select("__id", F.explode(grams).alias("gram"))
    toked = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        tokenize(text_col).alias("__toks"),
    )
    out = toked.select(
        "__id",
        F.explode(_grams_of_tokens(F.col("__toks"), n)).alias("gram"),
    )
    return out


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    min_hits: int = 1,
    hash_fn: str = "none",
    benchmark_text_col: str | None = None,
) -> DataFrame:
    """Documents in ``corpus`` sharing ≥ ``min_hits`` distinct word
    n-grams with ``benchmark``. Returns ``(id_col, hit_grams)``.

    The benchmark's distinct-gram relation is explicitly broadcast —
    the corpus side joins without shuffling (see module docstring).
    SIZE ASSUMPTION behind that hint: the broadcast is bounded by the
    benchmark's DISTINCT n-grams, not the corpus — real eval suites are
    10^4–10^6 grams (≈MB with ``hash_fn='xxhash64'``, 8 bytes/gram). A
    "benchmark" that is itself corpus-sized breaks the asymmetry this
    operator is shaped around; pre-aggregate or shard it first.
    """
    if min_hits < 1:
        raise ValueError("min_hits must be >= 1")
    bench_grams = (
        ngram_rows(
            benchmark, benchmark_text_col or text_col, id_col, n, hash_fn
        )
        .select("gram")
        .distinct()
    )
    corpus_grams = ngram_rows(corpus, text_col, id_col, n, hash_fn)
    hits = corpus_grams.join(F.broadcast(bench_grams), on="gram", how="inner")
    return (
        hits.groupBy("__id")
        .agg(F.count(F.lit(1)).alias("hit_grams"))
        .filter(F.col("hit_grams") >= min_hits)
        .select(F.col("__id").alias(id_col), "hit_grams")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    min_hits: int = 1,
    hash_fn: str = "xxhash64",
    benchmark_text_col: str | None = None,
    broadcast: bool | None = None,
) -> DataFrame:
    """``corpus`` minus contaminated documents (left-anti join on the
    contaminated-id set — null-id rows are never flagged, matching the
    "cannot be contaminated" semantics of a doc with no grams).

    Unlike the benchmark-gram side (bounded by the eval suite), the
    flagged-id set is UNBOUNDED — a heavily contaminated corpus (or a low
    ``min_hits`` against a big suite) can flag any fraction of a 100 TB
    corpus, so a forced broadcast would OOM. Default ``broadcast=None``
    lets AQE pick (it broadcasts small builds at runtime anyway);
    ``True`` forces the hint (caller knows the flagged set is tiny),
    ``False`` forbids it (``merge`` hint → sort-merge join)."""
    flagged = contaminated_docs(
        corpus, benchmark, text_col, id_col, n, min_hits, hash_fn,
        benchmark_text_col,
    ).select(id_col)
    if broadcast is True:
        flagged = F.broadcast(flagged)
    elif broadcast is False:
        flagged = flagged.hint("merge")
    return corpus.join(flagged, on=id_col, how="left_anti")
