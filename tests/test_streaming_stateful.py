"""Custom stateful streaming operators (streaming/stateful.py).

- monotonic_violations: state carries the per-key high-water mark ACROSS
  micro-batches — a regression arriving in a LATER batch is caught (the
  case per-batch/foreachBatch validation cannot see);
- windowed_quality_metrics: watermarked event-time windows fold late rows
  into the right window and emit per-window counters.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from great_expectations_spark.streaming.stateful import (
    monotonic_violations,
    windowed_quality_metrics,
)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
    ]
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _drain(stream_out, out_path, ckpt):
    q = (
        stream_out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_monotonic_state_carries_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: c1 rises to 5, c2 rises to 3 — no violations
    _write(spark, src, [("c1", 1), ("c1", 3), ("c1", 5), ("c2", 2), ("c2", 3)])

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    _drain(monotonic_violations(stream, "conv_id", "turn_idx"), out, ckpt)
    first = spark.read.schema(
        "key string, seq long, prev_seq long"
    ).parquet(out)
    assert first.count() == 0

    # batch 2 (separate trigger via new files + same checkpoint): c1
    # REGRESSES to 2 (cross-batch violation), c2 continues cleanly, and c1
    # also repeats 6 twice (in-batch strict violation)
    _write(spark, src, [("c1", 2), ("c1", 6), ("c1", 6), ("c2", 4)])
    stream2 = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    _drain(monotonic_violations(stream2, "conv_id", "turn_idx"), out, ckpt)

    got = {
        (r["key"], r["seq"], r["prev_seq"])
        for r in spark.read.schema("key string, seq long, prev_seq long")
        .parquet(out).collect()
    }
    assert got == {("c1", 2, 5), ("c1", 6, 6)}, got


def test_monotonic_non_strict_allows_repeats(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # one micro-batch: [1, 1, 0] — order within a batch carries no
    # information (no intra-group row-order guarantee after the state
    # shuffle), so the batch is judged on its sorted sequence: repeats are
    # fine non-strict, and 0 is no regression because no PRIOR batch set a
    # high-water mark
    _write(spark, src, [("c1", 1), ("c1", 1), ("c1", 0)])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    _drain(
        monotonic_violations(stream, "conv_id", "turn_idx", strictly=False),
        out, ckpt,
    )
    rows = spark.read.schema("key string, seq long, prev_seq long").parquet(out)
    assert rows.count() == 0

    # second micro-batch regresses below the HWM=1: 0 violates (non-strict
    # allows equality, so the repeated 1 still passes)
    _write(spark, src, [("c1", 0), ("c1", 1), ("c1", 2)])
    stream2 = spark.readStream.schema(SCHEMA).parquet(src)
    _drain(
        monotonic_violations(stream2, "conv_id", "turn_idx", strictly=False),
        out, ckpt,
    )
    rows = spark.read.schema("key string, seq long, prev_seq long").parquet(out)
    assert {(r["seq"], r["prev_seq"]) for r in rows.collect()} == {(0, 1)}


def test_windowed_quality_metrics(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
        ]
    )
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    # max event 12:29 → watermark 12:24 > the 12:10 window's 12:20 end, so
    # both the 12:00 and 12:10 windows CLOSE; the 12:20 window stays open
    rows = [
        (base + dt.timedelta(minutes=m), None if m % 7 == 0 else f"t{m}")
        for m in range(0, 30)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    metrics = windowed_quality_metrics(
        stream, "ts", window_duration="10 minutes", watermark="5 minutes",
        not_null_cols=["text"],
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        metrics.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (str(r["window_start"].time()), r["row_count"], r["nulls__text"])
        for r in spark.read.parquet(out).collect()
    }
    # minutes 0-9 (nulls at 0,7), 10-19 (null at 14); the 12:20 window stays
    # OPEN at availableNow drain end (watermark), so only closed windows emit
    assert ("12:00:00", 10, 2) in got
    assert ("12:10:00", 10, 1) in got


def test_monotonic_null_seq_ignored_and_no_spurious_hwm(spark, tmp_path):
    """Regression (round-3): a null turn_idx used to arrive as NaN and kill
    the whole streaming query via int(NaN); and an all-null group used to
    plant a synthetic high-water mark of 0, flagging a later legitimate
    first turn 0 as a regression. Semantics: nulls are IGNORED — they
    neither violate nor advance state."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: c1 has a null mixed in (ignored); c3 is ALL null (no state)
    _write(spark, src, [("c1", 1), ("c1", None), ("c1", 3), ("c3", None)])
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    _drain(monotonic_violations(stream, "conv_id", "turn_idx"), out, ckpt)
    assert (
        spark.read.schema("key string, seq long, prev_seq long").parquet(out).count()
        == 0
    )

    # batch 2: c3 starts at 0 — NOT a violation (no synthetic 0 HWM was
    # written); c1 regresses to 2 — caught against the real HWM of 3
    _write(spark, src, [("c3", 0), ("c3", 1), ("c1", 2)])
    stream2 = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    _drain(monotonic_violations(stream2, "conv_id", "turn_idx"), out, ckpt)
    got = {
        (r["key"], r["seq"], r["prev_seq"])
        for r in spark.read.schema("key string, seq long, prev_seq long")
        .parquet(out)
        .collect()
    }
    assert got == {("c1", 2, 3)}, got
