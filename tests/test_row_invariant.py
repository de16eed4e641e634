"""Row-level invariant (BASELINE.json input_hint / SURVEY.md §5): per-turn
``text`` equality under stable ``(conv_id, turn_idx)`` ordering — a suite
run must be a PURE READER of the batch, and the deterministic generator must
be byte-stable across parallelism levels.

Checksum: sum of per-row xxhash64(conv_id, turn_idx, text) + row count.
Commutative, so it's order-independent while still keying every value to its
(conv_id, turn_idx) position — equality ⟺ the multiset of keyed rows is
identical, which under key uniqueness ⟺ per-turn text equality under any
stable ordering.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from great_expectations_spark import ExpectationSuite, SuiteRunner
from great_expectations_spark.schema import generate_transcripts


def _checksum(df):
    row = df.agg(
        F.sum(F.xxhash64("conv_id", "turn_idx", "text")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return (int(row["h"]), int(row["n"]))


def test_suite_run_is_pure_reader(spark, tmp_path):
    p = str(tmp_path / "t")
    generate_transcripts(spark, n_turns=20_000, seed=42).write.parquet(p)
    tdf = spark.read.parquet(p)
    before = _checksum(tdf)

    suite = ExpectationSuite("inv")
    suite.add("expect_column_values_to_not_be_null", column="text", mostly=0.9)
    suite.add("expect_compound_columns_to_be_unique",
              column_list=["conv_id", "turn_idx"])
    suite.add("expect_column_values_to_be_increasing", column="turn_idx",
              strictly=True, partition_by="conv_id", order_by="turn_idx")
    res = SuiteRunner(
        spark, unexpected_index_column_names=["conv_id", "turn_idx"],
        violations_path=str(tmp_path / "viol"),
    ).validate(tdf, suite)
    assert res.statistics["evaluated_expectations"] == 3

    # re-read from storage after the full run: bit-identical rows
    assert _checksum(spark.read.parquet(p)) == before
    # and a re-sorted emission preserves every (key, text) pairing
    assert _checksum(tdf.orderBy("conv_id", "turn_idx")) == before


def test_generator_stable_across_parallelism(spark):
    a = generate_transcripts(spark, n_turns=10_000, seed=7, partitions=2)
    b = generate_transcripts(spark, n_turns=10_000, seed=7, partitions=16)
    assert _checksum(a) == _checksum(b)
    # full-row equality, not just the checksum columns
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_generator_seed_sensitivity(spark):
    a = generate_transcripts(spark, n_turns=5_000, seed=1)
    b = generate_transcripts(spark, n_turns=5_000, seed=2)
    assert _checksum(a) != _checksum(b)
