"""M1 end-to-end slice (SURVEY.md §7.2): one expectation through the full
pipeline — planner → bundled agg → EVR with exact §1.4 fields — plus the
suite-wide single-bundle behavior."""

from __future__ import annotations

import pytest

from great_expectations_spark import ExpectationSuite, validate


@pytest.fixture()
def transcripts_df(spark):
    rows = [
        ("c1", 0, "system", "hello world", None, "2025-01-01 00:00:00"),
        ("c1", 1, "user", "question one", None, "2025-01-01 00:00:30"),
        ("c1", 2, "assistant", None, None, "2025-01-01 00:01:00"),
        ("c2", 0, "system", "hi", None, "2025-01-01 01:00:00"),
        ("c2", 1, "user", "", None, "2025-01-01 01:00:30"),
        ("c2", 2, "tool", "result", "tool_01", "2025-01-01 01:01:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    )
    return df.withColumn("ts", df.ts.cast("timestamp"))


def test_not_null_summary_evr(transcripts_df):
    suite = ExpectationSuite("m1")
    suite.add(
        "expect_column_values_to_not_be_null",
        column="text",
        mostly=0.99,
        result_format="SUMMARY",
    )
    out = validate(transcripts_df, suite)
    assert len(out.results) == 1
    evr = out.results[0]
    r = evr.result
    assert evr.success is False  # 1/6 null > 1% failure budget
    assert r["element_count"] == 6
    assert r["missing_count"] == 0  # not_be_null: nulls are unexpected, not missing
    assert r["unexpected_count"] == 1
    assert r["unexpected_percent"] == pytest.approx(100.0 / 6)
    assert r["unexpected_percent_total"] == pytest.approx(100.0 / 6)
    assert r["partial_unexpected_list"] == [None]
    assert r["partial_unexpected_counts"] == [{"value": None, "count": 1}]
    assert out.statistics["evaluated_expectations"] == 1
    assert out.statistics["successful_expectations"] == 0


def test_not_null_mostly_pass(transcripts_df):
    suite = ExpectationSuite("m1b")
    suite.add("expect_column_values_to_not_be_null", column="text", mostly=0.8)
    out = validate(transcripts_df, suite)
    assert out.success is True
    assert out.results[0].result["unexpected_count"] == 1


def test_full_suite_mixed_kinds(transcripts_df):
    suite = ExpectationSuite("mixed")
    suite.add("expect_column_values_to_be_in_set", column="role",
              value_set=["system", "user", "assistant", "tool"])
    suite.add("expect_column_values_to_be_between", column="turn_idx",
              min_value=0, max_value=10)
    suite.add("expect_column_mean_to_be_between", column="turn_idx",
              min_value=0.5, max_value=1.5)
    suite.add("expect_table_row_count_to_equal", value=6)
    suite.add("expect_column_to_exist", column="conv_id")
    suite.add("expect_compound_columns_to_be_unique",
              column_list=["conv_id", "turn_idx"])
    out = validate(transcripts_df, suite)
    assert out.success is True
    by_type = {r.expectation_config["expectation_type"]: r for r in out.results}
    assert by_type["expect_column_mean_to_be_between"].result["observed_value"] == 1.0
    assert by_type["expect_compound_columns_to_be_unique"].result["unexpected_count"] == 0


def test_result_format_levels(transcripts_df):
    for level, has_partial, has_counts in [
        ("BOOLEAN_ONLY", False, False),
        ("BASIC", True, False),
        ("SUMMARY", True, True),
        ("COMPLETE", True, True),
    ]:
        suite = ExpectationSuite("rf")
        suite.add(
            "expect_column_values_to_be_in_set",
            column="role",
            value_set=["system", "user"],
            result_format=level,
        )
        out = validate(transcripts_df, suite)
        r = out.results[0].result
        assert ("partial_unexpected_list" in r) == has_partial
        assert ("partial_unexpected_counts" in r) == has_counts
        if level == "COMPLETE":
            assert sorted(r["unexpected_list"]) == ["assistant", "tool"]


def test_unexpected_index_columns(transcripts_df):
    suite = ExpectationSuite("idx")
    suite.add(
        "expect_column_values_to_not_be_null",
        column="text",
        result_format={
            "result_format": "COMPLETE",
            "unexpected_index_column_names": ["conv_id", "turn_idx"],
        },
    )
    out = validate(transcripts_df, suite)
    r = out.results[0].result
    assert r["unexpected_index_list"] == [{"conv_id": "c1", "turn_idx": 2}]
    assert r["unexpected_index_column_names"] == ["conv_id", "turn_idx"]


def test_catch_exceptions(transcripts_df):
    suite = ExpectationSuite("boom")
    suite.add("expect_column_mean_to_be_between", column="no_such_column", min_value=0)
    out = validate(transcripts_df, suite)
    evr = out.results[0]
    assert evr.success is False
    assert evr.exception_info["raised_exception"] is True


def test_row_condition(transcripts_df):
    suite = ExpectationSuite("rc")
    suite.add(
        "expect_column_values_to_not_be_null",
        column="text",
        row_condition="role = 'user'",
    )
    out = validate(transcripts_df, suite)
    r = out.results[0].result
    assert r["element_count"] == 2
    assert r["unexpected_count"] == 0
