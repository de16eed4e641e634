"""Corpus-level line deduplication — C4-style boilerplate stripping.

Removes lines (nav bars, cookie banners, footers, license headers) that
recur across many documents, keeping each document's unique content in
its original line order (cf. C4's "discard any line occurring elsewhere
in the corpus more than once"; whole-document dedup is
``operators/dedup.py``, within-document repetition is
``operators/textstats.repetition_profile``).

Scale design — text never rides a shuffle it doesn't have to:

1. ``line_rows``: posexplode to SLIM rows ``(__id, line_idx, line_hash)``
   — the line *string* is hashed executor-side inside the Generate stage
   and never leaves it.
2. duplicate-hash set: ``groupBy(line_hash) → count_distinct(__id)``
   — one shuffle of 16-byte rows with map-side partial aggregation.
3. dropped positions: lines ⋈ dup-hashes (dup set is usually tiny →
   AQE broadcasts it; no corpus shuffle), then
   ``groupBy(__id) → collect_list(line_idx)`` — again slim rows only.
4. rebuild: docs ⟕ dropped-positions on ``__id``; the kept text is a
   pure HOF — ``filter(split(text), (l, i) -> NOT array_contains(dropped,
   i))`` → ``array_join``. The dropped-positions side holds only docs
   that actually lose lines; when that set is small AQE broadcasts it
   and the corpus text NEVER shuffles end-to-end.

Hashing: ``xxhash64`` of the normalized line by default (one JVM
intrinsic); ``hash_fn="md5"`` switches to the 60-bit md5-derived form
(``dedup._md5num``) the DuckDB oracle can replay. A 64-bit collision
false-drops a unique line; at 10^10 distinct lines the expected count is
~10^20/2^65 ≈ 2.7 — negligible against the boilerplate it removes, and
documented here because the failure direction is data loss.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from great_expectations_spark.operators.dedup import _check_hash_fn, _md5num


def _line_key(line: Column, normalize: bool, hash_fn: str) -> Column:
    key = F.regexp_replace(F.lower(F.trim(line)), r"\s+", " ") if normalize \
        else line
    return F.xxhash64(key) if hash_fn == "xxhash64" else _md5num(key)


def line_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
    min_chars: int = 1,
    hash_fn: str = "xxhash64",
    sep: str = "\n",
) -> DataFrame:
    """Slim per-line rows ``(__id, line_idx, line_hash)``.

    Lines whose trimmed length is < ``min_chars`` get a NULL hash — they
    are never dedup candidates (blank separator lines would otherwise be
    "boilerplate" and vanish from every document). ``sep`` is a REGEX
    (Spark split): the default deduplicates lines; ``sep="\\n\\n+"``
    switches to paragraph granularity.
    """
    _check_hash_fn(hash_fn)
    lines = F.split(F.col(text_col), sep)
    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(lines).alias("line_idx", "__line"),
    )
    key = F.when(
        F.length(F.trim(F.col("__line"))) >= min_chars,
        _line_key(F.col("__line"), normalize, hash_fn),
    )
    return exploded.select("__id", "line_idx", key.alias("line_hash"))


def duplicate_line_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    normalize: bool = True,
    min_chars: int = 1,
    hash_fn: str = "xxhash64",
    sep: str = "\n",
) -> DataFrame:
    """Hashes of lines occurring in ≥ ``min_docs`` DISTINCT documents:
    ``(line_hash, n_docs)``. Within-document repetition alone never
    qualifies a line (that is ``repetition_profile``'s job)."""
    rows = line_rows(df, text_col, id_col, normalize, min_chars, hash_fn, sep)
    return (
        rows.filter(F.col("line_hash").isNotNull())
        .groupBy("line_hash")
        .agg(F.count_distinct("__id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_duplicate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    normalize: bool = True,
    min_chars: int = 1,
    hash_fn: str = "xxhash64",
    out_col: str | None = None,
    sep: str = "\n",
    join_sep: str | None = None,
) -> DataFrame:
    """Remove every line that occurs in ≥ ``min_docs`` distinct documents;
    the surviving lines are rejoined with ``join_sep`` (default: ``sep``
    when it is a plain string, ``"\\n"`` otherwise — a regex separator
    cannot be inverted) in original order into ``out_col`` (default:
    replace ``text_col``). Documents that lose all their lines keep an
    empty string; NULL text stays NULL. ``sep="\\n\\n+"`` with
    ``join_sep="\\n\\n"`` gives paragraph-granularity dedup."""
    out_col = out_col or text_col
    if join_sep is None:
        join_sep = sep if not any(ch in sep for ch in "+*?[](){}|.^$") else "\n"
    rows = line_rows(df, text_col, id_col, normalize, min_chars, hash_fn, sep)
    dups = duplicate_line_hashes(
        df, text_col, id_col, min_docs, normalize, min_chars, hash_fn, sep
    )
    dropped = (
        rows.join(dups, "line_hash")
        .groupBy("__id")
        .agg(F.collect_list("line_idx").alias("__dropped_idx"))
    )
    joined = df.join(
        dropped, df[id_col] == dropped["__id"], "left"
    ).drop("__id")
    kept = F.filter(
        F.split(F.col(text_col), sep),
        lambda line, i: ~F.coalesce(
            F.array_contains(F.col("__dropped_idx"), i), F.lit(False)
        ),
    )
    rebuilt = F.when(
        F.col(text_col).isNotNull(), F.array_join(kept, join_sep)
    )
    return joined.withColumn(out_col, rebuilt).drop("__dropped_idx")
