"""Streaming exact deduplication — cross-micro-batch duplicate drop.

The batch operator (:mod:`..operators.dedup`) cannot see a duplicate that
arrives in a LATER micro-batch; Structured Streaming's stateful
``dropDuplicates`` / ``dropDuplicatesWithinWatermark`` can. This module
wraps them with the engine's normalization convention so a re-formatted
copy (case/whitespace) of an earlier document is still dropped.

State-size story (the part that matters at 10^12 rows):

- ``streaming_exact_dedup(..., watermark=None)`` keys state by the 8-byte
  normalized-text hash — unbounded but minimal state (one hash per distinct
  doc ever seen): right for bounded key universes or replay windows.
- ``watermark=(ts_col, delay)`` switches to
  ``dropDuplicatesWithinWatermark``: state is dropped once the event-time
  watermark passes, so steady-state memory is O(docs per delay window) —
  the only shape that survives an unbounded 100 TB/day firehose. Duplicates
  farther apart than the delay are NOT caught (by design; pair with a
  periodic batch dedup compaction for the long tail).

Null-text rows pass through untouched (a null has no content to duplicate —
same convention as the batch operator's exact_dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["streaming_exact_dedup"]


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    normalize: bool = True,
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Drop rows whose (normalized) ``text_col`` hash was already seen.

    ``watermark=("ts", "30 minutes")`` bounds state via
    ``dropDuplicatesWithinWatermark`` (requires an event-time column);
    ``None`` keeps exact cross-batch state forever (one 8-byte hash per
    distinct doc). Returns the input rows minus duplicates, with the
    internal hash column removed.
    """
    from great_expectations_spark.operators.dedup import _norm

    c = F.col(text_col)
    key = F.xxhash64(_norm(c) if normalize else c)
    # null text hashes to a null key; dropDuplicates treats nulls as equal,
    # so route nulls around the dedup entirely (they pass through)
    hashed = stream_df.withColumn("__gx_dedup_key", key)
    nulls = hashed.filter(c.isNull()).drop("__gx_dedup_key")
    nonnull = hashed.filter(c.isNotNull())
    if watermark is not None:
        ts_col, delay = watermark
        nonnull = nonnull.withWatermark(ts_col, delay)
        deduped = nonnull.dropDuplicatesWithinWatermark(["__gx_dedup_key"])
    else:
        deduped = nonnull.dropDuplicates(["__gx_dedup_key"])
    return deduped.drop("__gx_dedup_key").unionByName(nulls)
