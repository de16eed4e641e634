"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: a full expectation-suite run (the engine's
production path) over the sf0.001 tables, returning the EVR table.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, each checked against DuckDB on the same parquet at sf0.01.
Column names are aliased identically on both sides (the driver hashes values
after sorting columns by name).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Full constraint-suite run on sf0.001 → EVR table.

    Exercises the engine end-to-end: planner → ONE bundled agg pass per
    domain + salted-groupBy uniqueness + left-anti referential join →
    EVR rows (SURVEY.md §3 entry point B).
    """
    from great_expectations_spark import ExpectationSuite, SuiteRunner

    sf_dir = "/root/testdata/sf0.001"
    lineitem = _load(spark, sf_dir, "lineitem")
    customer = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders")

    suite = ExpectationSuite("flagship")
    suite.add("expect_column_values_to_not_be_null", column="l_orderkey")
    suite.add("expect_column_values_to_be_between", column="l_discount",
              min_value=0.0, max_value=0.1)
    suite.add("expect_column_values_to_be_in_set", column="l_returnflag",
              value_set=["A", "N", "R"])
    suite.add("expect_column_mean_to_be_between", column="l_quantity",
              min_value=1.0, max_value=50.0)
    suite.add("expect_column_quantile_values_to_be_between", column="l_extendedprice",
              quantile_ranges={"quantiles": [0.5], "value_ranges": [[0.0, None]]})
    suite.add("expect_compound_columns_to_be_unique",
              column_list=["l_orderkey", "l_linenumber"])
    suite.add("expect_table_row_count_to_be_between", min_value=1)

    runner = SuiteRunner(spark, tables={"customer": customer, "orders": orders})
    result = runner.validate(lineitem, suite)

    rows = [
        (
            r.expectation_config["expectation_type"],
            bool(r.success),
            int(r.result.get("element_count") or 0),
            int(r.result.get("unexpected_count") or 0),
            str(r.result.get("observed_value")),
        )
        for r in result.results
    ]
    return spark.createDataFrame(
        rows,
        "expectation_type string, success boolean, element_count long, "
        "unexpected_count long, observed_value string",
    )


# ---------------------------------------------------------------------------
# operator queries + DuckDB oracles
# ---------------------------------------------------------------------------

def _unexpected_count_df(df: DataFrame, cond) -> DataFrame:
    return df.agg(
        F.sum(F.when(cond.unexpected, 1).otherwise(0))
        .cast("long")
        .alias("unexpected_count")
    )


def q_map_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    from great_expectations_spark.functions import conditions as C

    ev = _load(spark, sf_dir, "events")
    return _unexpected_count_df(ev, C.not_be_null("props"))


def q_map_in_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    from great_expectations_spark.functions import conditions as C

    ev = _load(spark, sf_dir, "events")
    cond = C.be_in_set("event_type", ["click", "view", "purchase"])
    return _unexpected_count_df(ev, cond)


def q_map_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    from great_expectations_spark.functions import conditions as C

    li = _load(spark, sf_dir, "lineitem")
    cond = C.be_between("l_discount", min_value=0.0, max_value=0.05)
    return _unexpected_count_df(li, cond)


def q_map_value_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    from great_expectations_spark.functions import conditions as C

    docs = _load(spark, sf_dir, "documents")
    cond = C.value_lengths_be_between("text", min_value=20, max_value=500)
    return _unexpected_count_df(docs, cond)


def q_map_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from great_expectations_spark.functions import conditions as C

    docs = _load(spark, sf_dir, "documents")
    cond = C.match_regex("text", r"^[a-z ]+$")
    return _unexpected_count_df(docs, cond)


def q_agg_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bundled aggregate metrics, grouped — mean/sum/min/max/count over an
    exact-in-floating-point domain (l_quantity is integral)."""
    li = _load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        F.avg("l_quantity").alias("mean_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


def q_unique_dup_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """column_values.unique semantics: rows whose key value occurs more than
    once (ALL rows of a duplicated value are unexpected) — via the salted
    two-level groupBy, never a full-table window (SURVEY.md §4.3)."""
    from great_expectations_spark.skew import salted_value_counts

    orders = _load(spark, sf_dir, "orders")
    vc = salted_value_counts(orders.filter(F.col("o_custkey").isNotNull()), ["o_custkey"])
    return vc.filter(F.col("count") > 1).agg(
        F.coalesce(F.sum("count"), F.lit(0)).cast("long").alias("unexpected_count"),
        F.count(F.lit(1)).cast("long").alias("duplicate_key_count"),
    )


def q_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential check via broadcast LEFT-ANTI join (SURVEY.md §2.7)."""
    orders = _load(spark, sf_dir, "orders")
    customer = _load(spark, sf_dir, "customer")
    dim = customer.select(F.col("c_custkey").alias("o_custkey")).distinct()
    orphans = orders.filter(F.col("o_custkey").isNotNull()).join(
        F.broadcast(dim), on="o_custkey", how="left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("unexpected_count"))


def q_table_row_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).cast("long").alias("row_count"))


def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events")
    return ev.agg(F.countDistinct("event_type").cast("long").alias("distinct_count"))


def q_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """column.value_counts — ordered by value for EVR determinism
    (SURVEY.md §2.9)."""
    ev = _load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
        .orderBy("event_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "map_not_null": q_map_not_null,
        "map_in_set": q_map_in_set,
        "map_between": q_map_between,
        "map_value_length": q_map_value_length,
        "map_regex": q_map_regex,
        "agg_profile": q_agg_profile,
        "unique_dup_rows": q_unique_dup_rows,
        "referential_orphans": q_referential_orphans,
        "table_row_count": q_table_row_count,
        "distinct_count": q_distinct_count,
        "value_counts": q_value_counts,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "map_not_null": (
            "SELECT CAST(count(*) FILTER (WHERE props IS NULL) AS BIGINT)"
            " AS unexpected_count FROM events"
        ),
        "map_in_set": (
            "SELECT CAST(count(*) FILTER (WHERE event_type IS NOT NULL AND "
            "event_type NOT IN ('click','view','purchase')) AS BIGINT)"
            " AS unexpected_count FROM events"
        ),
        "map_between": (
            "SELECT CAST(count(*) FILTER (WHERE l_discount IS NOT NULL AND "
            "NOT (l_discount >= 0.0 AND l_discount <= 0.05)) AS BIGINT)"
            " AS unexpected_count FROM lineitem"
        ),
        "map_value_length": (
            "SELECT CAST(count(*) FILTER (WHERE text IS NOT NULL AND "
            "NOT (length(text) >= 20 AND length(text) <= 500)) AS BIGINT)"
            " AS unexpected_count FROM documents"
        ),
        "map_regex": (
            "SELECT CAST(count(*) FILTER (WHERE text IS NOT NULL AND "
            "NOT regexp_matches(text, '^[a-z ]+$')) AS BIGINT)"
            " AS unexpected_count FROM documents"
        ),
        "agg_profile": (
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows, "
            "sum(l_quantity) AS sum_qty, avg(l_quantity) AS mean_qty, "
            "min(l_quantity) AS min_qty, max(l_quantity) AS max_qty "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "unique_dup_rows": (
            "WITH vc AS (SELECT o_custkey, count(*) AS cnt FROM orders "
            "WHERE o_custkey IS NOT NULL GROUP BY o_custkey) "
            "SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS unexpected_count, "
            "CAST(count(*) AS BIGINT) AS duplicate_key_count FROM vc WHERE cnt > 1"
        ),
        "referential_orphans": (
            "SELECT CAST(count(*) AS BIGINT) AS unexpected_count FROM orders "
            "WHERE o_custkey IS NOT NULL AND o_custkey NOT IN "
            "(SELECT c_custkey FROM customer)"
        ),
        "table_row_count": (
            "SELECT CAST(count(*) AS BIGINT) AS row_count FROM lineitem"
        ),
        "distinct_count": (
            "SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS distinct_count "
            "FROM events"
        ),
        "value_counts": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS count FROM events "
            "WHERE event_type IS NOT NULL GROUP BY event_type ORDER BY event_type"
        ),
    }
