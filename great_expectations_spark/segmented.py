"""Segmented validation — per-group EVRs from ONE bundled pass.

``validate_by_group(df, suite, group_by)`` evaluates a suite once per
distinct value of ``group_by`` (per source, per language, per day, per
tenant) and returns a long-format DataFrame of per-segment results.

The reference can only express this as N filtered validation runs — N
full scans. Spark-first, it is ONE ``groupBy(group).agg(...)`` carrying
every map counter and aggregate metric of the suite (plus one extra
keyed pass per uniqueness expectation), so a 10,000-segment quality
report costs the same scan count as a single-segment one.

Supported expectation kinds: map conditions (not-null/in-set/between/
regex/PII/... — anything without window or second-wave aggregate
dependencies), scalar aggregates (mean/stddev/min/max/sum/median/
row-count bounds), and single/compound uniqueness. Window-backed,
two-wave (z-score), relational, query, and meta expectations raise a
``ValueError`` naming the offender (``strict=False`` skips them) —
their semantics are inherently cross-segment or need their own pass;
run them through ``SuiteRunner`` instead.

Scale guard: the grouped counters collect to the driver for the
(Python) finalizers, so segment cardinality must be report-sized —
``max_groups`` (default 100k) hard-fails before an accidental
million-segment collect.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

from great_expectations_spark.registry import (
    CompiledAgg,
    CompiledMap,
    CompiledUnique,
    compile_expectation,
)
from great_expectations_spark.result import calc_map_success
from great_expectations_spark.suite import ExpectationSuite

RESULT_SCHEMA = (
    "group string, expectation_type string, success boolean, "
    "element_count long, missing_count long, unexpected_count long, "
    "observed_value string"
)


def validate_by_group(
    df: DataFrame,
    suite: ExpectationSuite,
    group_by: str,
    strict: bool = True,
    max_groups: int = 100_000,
) -> DataFrame:
    """Per-segment EVR rows ``(group, expectation_type, success,
    element_count, missing_count, unexpected_count, observed_value)``.

    NULL segment values validate as their own group (rendered as the
    string ``"NULL"``)."""
    maps: list[tuple[int, CompiledMap]] = []
    aggs: list[tuple[int, CompiledAgg]] = []
    uniqs: list[CompiledUnique] = []
    for i, cfg in enumerate(suite.expectations):
        comp = compile_expectation(cfg)
        if isinstance(comp, CompiledMap) and not comp.condition.needs_window \
                and not comp.condition.requires:
            maps.append((i, comp))
        elif isinstance(comp, CompiledAgg):
            aggs.append((i, comp))
        elif isinstance(comp, CompiledUnique):
            uniqs.append(comp)
        elif strict:
            raise ValueError(
                f"{cfg.expectation_type} is not segmentable (window/"
                "two-wave/relational/query kinds need their own pass); "
                "run it via SuiteRunner or pass strict=False to skip"
            )

    spark = df.sparkSession
    gcol = F.coalesce(F.col(group_by).cast("string"), F.lit("NULL"))
    out: list[tuple] = []

    # ---- ONE bundled pass: every map counter + every agg metric ---------
    exprs: list[F.Column] = [F.count(F.lit(1)).alias("__ec")]
    for i, cm in maps:
        c = cm.condition
        exprs.append(
            F.sum(F.when(c.missing, 1).otherwise(0)).alias(f"m_{i}")
        )
        exprs.append(
            F.sum(F.when(c.unexpected, 1).otherwise(0)).alias(f"u_{i}")
        )
    for i, ca in aggs:
        for alias, e in ca.metric.exprs.items():
            exprs.append(e.alias(f"a{i}_{alias}"))
    def _capped_collect(rel: DataFrame) -> list:
        # ONE job: limit caps what ever reaches the driver, the +1 row
        # turns "too many segments" into an error instead of a silent
        # truncation of the report
        rows = rel.limit(max_groups + 1).collect()
        if len(rows) > max_groups:
            raise ValueError(
                f"group_by={group_by!r} exceeds max_groups={max_groups}; "
                "a report over that many segments should stay distributed "
                "(plain groupBy aggregations), not collect per-segment EVRs"
            )
        return rows

    if maps or aggs:
        grouped = df.groupBy(gcol.alias("__g")).agg(*exprs)
        for row in _capped_collect(grouped):
            g = row["__g"]
            ec = int(row["__ec"])
            for i, cm in maps:
                missing, unexpected = int(row[f"m_{i}"]), int(row[f"u_{i}"])
                ok = calc_map_success(ec, missing, unexpected, cm.mostly)
                out.append((
                    g, cm.cfg.expectation_type, bool(ok),
                    ec, missing, unexpected, None,
                ))
            for i, ca in aggs:
                values = {
                    alias: row[f"a{i}_{alias}"] for alias in ca.metric.exprs
                }
                observed = ca.metric.finalize(values)
                ok, _extra = ca.validate(observed)
                out.append((
                    g, ca.cfg.expectation_type, bool(ok),
                    ec, 0, 0, str(observed),
                ))

    # ---- one keyed pass per uniqueness expectation -----------------------
    for cu in uniqs:
        keys = [F.col(c) for c in cu.key_cols]
        missing_row = F.greatest(*[k.isNull() for k in keys]) if len(keys) > 1 \
            else keys[0].isNull()
        per_key = (
            df.select(
                gcol.alias("__g"),
                missing_row.alias("__miss"),
                *[k.alias(f"__k{j}") for j, k in enumerate(keys)],
            )
            .groupBy("__g", "__miss", *[f"__k{j}" for j in range(len(keys))])
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        seg = per_key.groupBy("__g").agg(
            F.sum("__cnt").alias("__ec"),
            F.sum(F.when(F.col("__miss"), F.col("__cnt")).otherwise(0))
            .alias("__missing"),
            F.sum(
                F.when(~F.col("__miss") & (F.col("__cnt") > 1), F.col("__cnt"))
                .otherwise(0)
            ).alias("__ux"),
        )
        for row in _capped_collect(seg):
            ec, missing = int(row["__ec"]), int(row["__missing"] or 0)
            ux = int(row["__ux"] or 0)
            ok = calc_map_success(ec, missing, ux, cu.mostly)
            out.append((
                row["__g"], cu.cfg.expectation_type, bool(ok),
                ec, missing, ux, None,
            ))

    return spark.createDataFrame(out, RESULT_SCHEMA)
