"""Segmented validation (great_expectations_spark/segmented.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from great_expectations_spark import ExpectationSuite, validate_by_group


@pytest.fixture(scope="module")
def seg_df(spark):
    rows = []
    for i in range(40):
        rows.append(("a", i, float(i % 10), f"doc {i}"))
    for i in range(20):
        rows.append(("b", i, 100.0, None if i % 2 else f"doc {i}"))
    rows.append((None, 0, 1.0, "null segment"))
    return spark.createDataFrame(
        rows, "seg string, k int, v double, text string"
    )


def test_per_segment_map_and_agg(spark, seg_df):
    suite = ExpectationSuite("s")
    suite.add("expect_column_values_to_not_be_null", column="text",
              mostly=0.6)
    suite.add("expect_column_mean_to_be_between", column="v",
              min_value=0.0, max_value=10.0)
    out = {
        (r["group"], r["expectation_type"]): r
        for r in validate_by_group(seg_df, suite, "seg").collect()
    }
    nn_a = out[("a", "expect_column_values_to_not_be_null")]
    assert nn_a["success"] and nn_a["unexpected_count"] == 0
    nn_b = out[("b", "expect_column_values_to_not_be_null")]
    assert not nn_b["success"] and nn_b["unexpected_count"] == 10
    assert out[("a", "expect_column_mean_to_be_between")]["success"]
    assert not out[("b", "expect_column_mean_to_be_between")]["success"]
    # NULL segment validates as its own group
    assert out[("NULL", "expect_column_values_to_not_be_null")]["success"]


def test_per_segment_uniqueness(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 2), ("b", 1), ("b", 2), ("b", None)],
        "seg string, k int",
    )
    suite = ExpectationSuite("u")
    suite.add("expect_column_values_to_be_unique", column="k")
    out = {
        r["group"]: r
        for r in validate_by_group(df, suite, "seg").collect()
    }
    assert not out["a"]["success"] and out["a"]["unexpected_count"] == 2
    assert out["b"]["success"]
    assert out["b"]["missing_count"] == 1   # null key is missing, not dup


def test_unsupported_kind_raises_or_skips(spark, seg_df):
    suite = ExpectationSuite("w")
    suite.add("expect_column_values_to_be_increasing", column="k",
              partition_by="seg", order_by="k")
    with pytest.raises(ValueError, match="not segmentable"):
        validate_by_group(seg_df, suite, "seg")
    out = validate_by_group(seg_df, suite, "seg", strict=False)
    assert out.count() == 0


def test_max_groups_guard(spark):
    df = spark.createDataFrame(
        [(str(i), i) for i in range(50)], "seg string, k int"
    )
    suite = ExpectationSuite("g")
    suite.add("expect_column_values_to_not_be_null", column="k")
    with pytest.raises(ValueError, match="max_groups"):
        validate_by_group(df, suite, "seg", max_groups=10)


def test_matches_per_group_suite_runner(spark, seg_df):
    """Segmented results equal running the same suite on each filtered
    segment — the N-scan semantics in one pass."""
    from great_expectations_spark import validate

    suite = ExpectationSuite("eq")
    suite.add("expect_column_values_to_not_be_null", column="text",
              mostly=0.6)
    suite.add("expect_column_mean_to_be_between", column="v",
              min_value=0.0, max_value=10.0)
    seg_rows = {
        (r["group"], r["expectation_type"]): r
        for r in validate_by_group(seg_df, suite, "seg").collect()
    }
    for g in ("a", "b"):
        res = validate(seg_df.filter(F.col("seg") == g), suite)
        for r in res.results:
            s = seg_rows[(g, r.expectation_config["expectation_type"])]
            assert s["success"] == r.success
            if "unexpected_count" in r.result:
                assert s["unexpected_count"] == r.result["unexpected_count"]


def test_max_groups_guard_applies_to_unique_pass_too(spark):
    """Regression: the uniqueness pass must RAISE past max_groups, not
    silently truncate the report."""
    df = spark.createDataFrame(
        [(str(i), i) for i in range(50)], "seg string, k int"
    )
    suite = ExpectationSuite("u")
    suite.add("expect_column_values_to_be_unique", column="k")
    with pytest.raises(ValueError, match="max_groups"):
        validate_by_group(df, suite, "seg", max_groups=10)
