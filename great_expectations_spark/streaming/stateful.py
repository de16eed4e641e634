"""Custom stateful streaming operators (SURVEY.md §2.10 extension).

Two validation shapes ``foreachBatch`` cannot express because they need
state ACROSS micro-batches:

- :func:`monotonic_violations` — per-key sequence monotonicity where the
  previous batch's high-water mark must carry over (a conv whose turn_idx
  restarts in a LATER micro-batch is invisible to any per-batch check).
  Implemented with ``applyInPandasWithState``: state = one (last_seq) row
  per key; each batch's group rows arrive as Arrow record batches, the
  check itself is vectorized numpy on the sorted sequence.
- :func:`windowed_quality_metrics` — per-event-time-window suite counters
  (rows, nulls, unexpected) with a watermark so late data folds into the
  right window and state is dropped once the watermark passes.

State size: one small row per key / per open window — executor memory holds
|keys| × ~32 bytes, partitioned by the groupBy hash; 10⁹ conversations
spread over a cluster is ~32 GB total state, linear in keys and independent
of throughput, which is the practical ceiling Structured Streaming's
HDFS/RocksDB state stores are built for.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def monotonic_violations(
    stream_df: DataFrame,
    key_col: str = "conv_id",
    seq_col: str = "turn_idx",
    strictly: bool = True,
) -> DataFrame:
    """Streaming per-key monotonicity check with cross-batch state.

    Emits one row per violating input row ``(key, seq, prev_seq)``. Two
    violation classes, both DETERMINISTIC (``applyInPandasWithState``
    gives no intra-group row-order guarantee after the shuffle, so arrival
    order is never consulted):

    - cross-batch regression: ``seq`` fails to advance past the previous
      batches' high-water mark (``prev_seq`` = that mark);
    - in-batch duplicate (``strictly`` only): equal ``seq`` values within
      one batch, checked on the batch's SORTED sequence.

    Null ``seq`` values are IGNORED (documented semantic): a null has no
    position in the ordering, so it can neither violate monotonicity nor
    advance the high-water mark — callers wanting nulls surfaced should gate
    them with a not_null expectation upstream. (A null arrives in pandas as
    float NaN; converting it used to raise inside applyInPandasWithState and
    kill the whole streaming query — the validator dying on dirty data.)

    State per key is a single long (the running max), updated only when the
    batch contributed at least one non-null value (an all-null or empty
    group must not write a synthetic high-water mark of 0, which would flag
    every later legitimate restart from 0 as a regression).
    """
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("seq", LongType()),
            StructField("prev_seq", LongType()),
        ]
    )
    state_schema = StructType([StructField("last_seq", LongType())])

    def check(key: Any, pdfs: Iterator["pd.DataFrame"], state: GroupState):  # noqa: F821
        import pandas as pd

        last = state.get[0] if state.exists else None
        seqs: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                seqs.extend(int(s) for s in pdf[seq_col].dropna())
        seqs.sort()
        rows = {"key": [], "seq": [], "prev_seq": []}
        prev_in_batch: int | None = None
        for s in seqs:
            if last is not None and (s <= last if strictly else s < last):
                rows["key"].append(str(key[0]))
                rows["seq"].append(s)
                rows["prev_seq"].append(last)
            elif strictly and prev_in_batch is not None and s == prev_in_batch:
                rows["key"].append(str(key[0]))
                rows["seq"].append(s)
                rows["prev_seq"].append(prev_in_batch)
            prev_in_batch = s
        if seqs:
            top = seqs[-1]
            last = top if last is None else max(last, top)
        # only write state when there is a real mark to record — an
        # empty/all-null group must not plant a spurious 0 high-water mark
        if last is not None:
            state.update((int(last),))
        if rows["key"]:
            yield pd.DataFrame(rows)

    return (
        stream_df.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(seq_col).cast("long").alias(seq_col),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            check,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_quality_metrics(
    stream_df: DataFrame,
    ts_col: str,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
    not_null_cols: list[str] | None = None,
) -> DataFrame:
    """Per-event-time-window validation counters with late-data handling.

    One row per closed window: total rows plus a null count per guarded
    column. The watermark bounds state (windows older than it are finalized
    and dropped) and lets late rows within the bound fold into their true
    window — the streaming analogue of per-partition EVR counters.
    """
    cols = not_null_cols or []
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls__{c}")
        )
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *[F.col(c) for c in ["row_count"] + [f"nulls__{c}" for c in cols]],
        )
    )
