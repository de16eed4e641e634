"""skew.value_counts — salted and plain paths must agree exactly; the auto
heuristic salts single-column keys (hot-key prone) and not compound keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from great_expectations_spark.skew import salted_value_counts, value_counts


def _df(spark):
    # hot key: "hot" owns 60% of rows
    rows = [("hot" if i % 5 < 3 else f"k{i % 50}", i % 7) for i in range(1000)]
    return spark.createDataFrame(rows, "k string, sub int")


def test_salted_equals_plain(spark):
    df = _df(spark)
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"] for r in salted_value_counts(df, ["k"]).collect()}
    assert salted == plain
    assert salted["hot"] == 600


def test_auto_heuristic_by_key_shape(spark):
    df = _df(spark)
    single = value_counts(df, ["k"])          # auto → salted (two-level agg)
    compound = value_counts(df, ["k", "sub"])  # auto → plain groupBy
    single_plan = single._jdf.queryExecution().optimizedPlan().toString()
    compound_plan = compound._jdf.queryExecution().optimizedPlan().toString()
    assert "__salt" in single_plan
    assert "__salt" not in compound_plan
    # and both still count correctly
    got = {(r["k"], r["sub"]): r["count"] for r in compound.collect()}
    want = {(r["k"], r["sub"]): r["count"]
            for r in df.groupBy("k", "sub").count().collect()}
    assert got == want


def test_forced_salting_on_compound(spark):
    df = _df(spark)
    forced = value_counts(df, ["k", "sub"], salted=True)
    assert "__salt" in forced._jdf.queryExecution().optimizedPlan().toString()
    got = {(r["k"], r["sub"]): r["count"] for r in forced.collect()}
    want = {(r["k"], r["sub"]): r["count"]
            for r in df.groupBy("k", "sub").count().collect()}
    assert got == want
