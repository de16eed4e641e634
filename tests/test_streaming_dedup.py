"""Streaming exact dedup (streaming/dedup.py) — duplicates arriving in a
LATER micro-batch are dropped (the case batch dedup cannot see)."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from great_expectations_spark.streaming.dedup import streaming_exact_dedup

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2026, 1, 1, 12, minute)


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


def test_cross_batch_duplicate_dropped(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))

    _write(spark, src, [(0, "The quick brown fox", _ts(0)),
                        (1, "something else entirely", _ts(1))])
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    dedup = streaming_exact_dedup(stream, "text")
    _drain(dedup, out, ckpt)
    assert spark.read.schema(SCHEMA).parquet(out).count() == 2

    # batch 2: a normalize-equal copy of doc 0 (case/whitespace differ), one
    # genuinely new doc, and a null-text row (must pass through)
    _write(spark, src, [(2, "the  QUICK brown fox", _ts(2)),
                        (3, "brand new content", _ts(3)),
                        (4, None, _ts(4))])
    _drain(dedup, out, ckpt)
    got = {r["doc_id"] for r in spark.read.schema(SCHEMA).parquet(out).collect()}
    assert got == {0, 1, 3, 4}  # 2 dropped as a cross-batch duplicate


def test_watermarked_dedup_bounds_state_and_dedups_within_delay(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))

    _write(spark, src, [(0, "alpha beta gamma", _ts(0)),
                        (1, "alpha beta gamma", _ts(1))])  # dup within delay
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    dedup = streaming_exact_dedup(stream, "text", watermark=("ts", "10 minutes"))
    _drain(dedup, out, ckpt)
    first = spark.read.schema(SCHEMA).parquet(out).collect()
    assert [r["doc_id"] for r in first] == [0]

    # watermarks advance at batch boundaries: first push it past doc 0's
    # expiry (ts 12:00 + 10 min) with an unrelated doc at 12:50 …
    _write(spark, src, [(2, "unrelated filler doc", _ts(50))])
    _drain(dedup, out, ckpt)
    # … then the SAME text as doc 0 is (by design) admitted again — its
    # dedup state expired with the watermark, which is what bounds state
    # on an unbounded stream
    _write(spark, src, [(3, "alpha beta gamma", _ts(55))])
    _drain(dedup, out, ckpt)
    got = {r["doc_id"] for r in spark.read.schema(SCHEMA).parquet(out).collect()}
    assert got == {0, 2, 3}
