"""profile_suite — the UserConfigurableProfiler analog (SURVEY.md §3 tail).

Key property (reference's own guarantee): a profiled suite must PASS when
validated against the batch it was built from.
"""

from __future__ import annotations

import pytest

from great_expectations_spark import ExpectationSuite, SuiteRunner
from great_expectations_spark.profiler import profile_suite
from great_expectations_spark.schema import generate_transcripts


@pytest.fixture(scope="module")
def tdf(spark):
    return generate_transcripts(spark, n_turns=5_000, seed=7)


def test_profiled_suite_passes_on_training_batch(spark, tdf):
    suite = profile_suite(tdf, primary_or_compound_key=["conv_id", "turn_idx"])
    types = [e.expectation_type for e in suite]
    assert "expect_table_columns_to_match_ordered_list" in types
    assert "expect_table_row_count_to_be_between" in types
    # role has <=10 distinct values (4 valid + injected junk) → value set
    in_sets = [e for e in suite
               if e.expectation_type == "expect_column_values_to_be_in_set"]
    assert any(e.kwargs["column"] == "role" for e in in_sets)
    # numeric turn_idx gets bounds + mean + median
    assert "expect_column_mean_to_be_between" in types
    assert "expect_column_median_to_be_between" in types
    # temporal ts gets min/max
    assert "expect_column_min_to_be_between" in types
    assert "expect_compound_columns_to_be_unique" in types

    res = SuiteRunner(spark).validate(tdf, suite)
    failed = [
        (r.expectation_config["expectation_type"], r.expectation_config["kwargs"],
         (r.exception_info or {}).get("exception_message"))
        for r in res.results if not r.success
    ]
    assert res.success, failed


def test_profiled_suite_json_roundtrip(spark, tdf):
    suite = profile_suite(tdf)
    clone = ExpectationSuite.from_json(suite.to_json())
    res = SuiteRunner(spark).validate(tdf, clone)
    failed = [
        (r.expectation_config["expectation_type"], r.expectation_config["kwargs"],
         (r.exception_info or {}).get("exception_message"))
        for r in res.results if not r.success
    ]
    assert res.success, failed


def test_profiled_suite_catches_drift(spark, tdf):
    from pyspark.sql import functions as F

    suite = profile_suite(tdf, columns=["role", "turn_idx"])
    drifted = tdf.withColumn(
        "role", F.when(F.col("role") == "user", F.lit("USER")).otherwise(F.col("role"))
    ).withColumn("turn_idx", F.col("turn_idx") + 1_000_000)
    res = SuiteRunner(spark).validate(drifted, suite)
    assert not res.success
    failed_types = {r.expectation_config["expectation_type"]
                    for r in res.results if not r.success}
    assert "expect_column_values_to_be_in_set" in failed_types
    assert "expect_column_mean_to_be_between" in failed_types


def test_drift_gates_pass_on_training_and_holdout(spark):
    """drift_gates=True emits chi-square + boundary-KS gates that are
    exactly calibrated on the training batch (p = 1 there) and still pass
    on a same-distribution holdout, but trip on a shifted batch."""
    from pyspark.sql import functions as F

    train = generate_transcripts(spark, n_turns=8_000, seed=11)
    suite = profile_suite(train, columns=["role", "turn_idx"],
                          drift_gates=True, drift_p=0.05)
    types = [e.expectation_type for e in suite]
    assert "expect_column_chisquare_test_p_value_to_be_greater_than" in types
    assert (
        "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than" in types
    )

    gates = ExpectationSuite("gates")
    for e in suite:
        if e.expectation_type.endswith("p_value_to_be_greater_than"):
            gates.add(e.expectation_type, **e.kwargs)

    # training batch: the KS baseline is the batch's own boundary counts,
    # so D = 0 / p = 1; the chi-square observed==expected up to the holdout
    res = SuiteRunner(spark).validate(train, gates)
    assert res.success, [r.result for r in res.results if not r.success]

    # same-distribution holdout (different seed): should still pass
    holdout = generate_transcripts(spark, n_turns=8_000, seed=12)
    res2 = SuiteRunner(spark).validate(holdout, gates)
    assert res2.success, [r.result for r in res2.results if not r.success]

    # shifted batch: halve turn_idx → the KS gate must trip
    shifted = holdout.withColumn(
        "turn_idx", (F.col("turn_idx") / 2).cast("int")
    )
    res3 = SuiteRunner(spark).validate(shifted, gates)
    ks = [r for r in res3.results
          if r.expectation_config["expectation_type"].startswith(
              "expect_column_bootstrapped_ks")
          and r.expectation_config["kwargs"]["column"] == "turn_idx"]
    assert ks and not ks[0].success


def test_profile_job_count_independent_of_column_width(spark):
    """Round-3 fusion: pass 2 runs ONE grouping-sets job for all value-set
    columns and ONE fused agg for all unique verifications — the number of
    driver job submissions must not grow with column count (was one job per
    column, i.e. hundreds of serial submissions on a wide table). AQE makes
    per-query job counts non-constant, so the assertion is COMPARATIVE:
    tripling the column width must not change the job count."""
    from pyspark.sql import functions as F

    def wide(n_cat: int, n_uid: int, n_num: int):
        df = spark.range(0, 500)
        for i in range(n_cat):
            df = df.withColumn(f"cat{i}", (F.col("id") % (3 + i)).cast("string"))
        for i in range(n_uid):
            df = df.withColumn(f"uid{i}", F.col("id") * (i + 1))
        for i in range(n_num):
            df = df.withColumn(f"num{i}", (F.col("id") * 1.5 + i))
        return df.drop("id")

    sc = spark.sparkContext

    def count_jobs(df, group):
        sc.setJobGroup(group, "profiler fusion job count")
        try:
            suite = profile_suite(df, value_set_threshold="FEW",
                                  drift_gates=True)
        finally:
            sc.setJobGroup("", "")
        return suite, len(sc.statusTracker().getJobIdsForGroup(group))

    _, jobs_narrow = count_jobs(wide(4, 1, 2), "profile-jobs-narrow")
    suite, jobs_wide = count_jobs(wide(12, 4, 4), "profile-jobs-wide")
    assert jobs_wide == jobs_narrow, (
        f"narrow={jobs_narrow} wide={jobs_wide}: job count grew with "
        "column width — pass-2 fusion regressed"
    )

    # and the fused path still emits the right expectations
    in_set = {e.kwargs["column"] for e in suite
              if e.expectation_type == "expect_column_values_to_be_in_set"}
    assert {f"cat{i}" for i in range(12)} <= in_set
    uniq = {e.kwargs["column"] for e in suite
            if e.expectation_type == "expect_column_values_to_be_unique"}
    assert {f"uid{i}" for i in range(4)} <= uniq
    chisq = {e.kwargs["column"] for e in suite if e.expectation_type
             == "expect_column_chisquare_test_p_value_to_be_greater_than"}
    assert {f"cat{i}" for i in range(12)} <= chisq


def test_fused_value_counts_guards_high_cardinality(spark):
    """A column whose true cardinality exceeds max_values must be dropped
    executor-side (absent from the result), never flood the driver; null
    values are excluded from value sets."""
    from pyspark.sql import functions as F

    from great_expectations_spark.profiler import _fused_value_counts

    df = spark.range(0, 2000).select(
        (F.col("id") % 4).cast("string").alias("lo"),
        F.col("id").cast("string").alias("hi"),
        F.when(F.col("id") % 2 == 0, F.col("id") % 3).alias("withnull"),
    )
    out = _fused_value_counts(df, ["lo", "hi", "withnull"], max_values=100)
    assert "hi" not in out
    assert sorted(v for v, _ in out["lo"]) == ["0", "1", "2", "3"]
    assert all(cnt == 500 for _, cnt in out["lo"])
    # nulls excluded: 1000 non-null rows over values 0,1,2
    assert [v for v, _ in out["withnull"]] == [0, 1, 2]
    assert sum(cnt for _, cnt in out["withnull"]) == 1000
