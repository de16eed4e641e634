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
dependencies; ``row_condition`` is honored by folding the condition
into the per-segment counters), scalar aggregates (mean/stddev/min/
max/sum/median/row-count/correlation bounds), and single/compound
uniqueness. Window-backed, two-wave (z-score), relational, query,
meta, value-counts-backed aggregates (most_common_value — its metric
needs the planner's groupby pass), and aggregates/uniques carrying a
``row_condition`` raise a ``ValueError`` naming the offender
(``strict=False`` skips them) — their semantics need their own pass;
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

    NULL segment values validate as their own group (the ``group``
    column of the result is genuinely NULL for them — no string
    sentinel, so a data value that happens to be the string "NULL"
    stays a separate segment)."""
    maps: list[tuple[int, CompiledMap, str | None]] = []
    aggs: list[tuple[int, CompiledAgg]] = []
    uniqs: list[CompiledUnique] = []

    def _reject(cfg, why: str) -> None:
        if strict:
            raise ValueError(
                f"{cfg.expectation_type} is not segmentable ({why}); "
                "run it via SuiteRunner or pass strict=False to skip"
            )

    for i, cfg in enumerate(suite.expectations):
        comp = compile_expectation(cfg)
        rc = cfg.kwargs.get("row_condition")
        if isinstance(comp, CompiledMap) and not comp.condition.needs_window \
                and not comp.condition.requires:
            maps.append((i, comp, rc))
        elif isinstance(comp, CompiledAgg):
            if rc is not None:
                _reject(cfg, "row_condition on an aggregate needs its own "
                             "filtered pass")
            elif not comp.metric.exprs:
                _reject(cfg, "its metric has no bundled exprs — it needs "
                             "the planner's value-counts pass")
            else:
                aggs.append((i, comp))
        elif isinstance(comp, CompiledUnique):
            if rc is not None:
                _reject(cfg, "row_condition on a uniqueness check needs "
                             "its own filtered pass")
            else:
                uniqs.append(comp)
        else:
            _reject(cfg, "window/two-wave/relational/query kinds need "
                         "their own pass")

    spark = df.sparkSession
    gcol = F.col(group_by).cast("string")
    out: list[tuple] = []

    # ---- ONE bundled pass: every map counter + every agg metric ---------
    exprs: list[F.Column] = [F.count(F.lit(1)).alias("__ec")]
    for i, cm, rc in maps:
        c = cm.condition
        dom = F.expr(rc) if rc is not None else F.lit(True)
        if rc is not None:
            # row_condition shrinks the domain exactly as SuiteRunner's
            # df.filter(row_condition) does — per-expectation counters
            exprs.append(F.sum(F.when(dom, 1).otherwise(0)).alias(f"e_{i}"))
        exprs.append(
            F.sum(F.when(dom & c.missing, 1).otherwise(0)).alias(f"m_{i}")
        )
        exprs.append(
            F.sum(F.when(dom & c.unexpected, 1).otherwise(0)).alias(f"u_{i}")
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
            for i, cm, rc in maps:
                ec_i = int(row[f"e_{i}"]) if rc is not None else ec
                missing, unexpected = int(row[f"m_{i}"]), int(row[f"u_{i}"])
                ok = calc_map_success(ec_i, missing, unexpected, cm.mostly)
                out.append((
                    g, cm.cfg.expectation_type, bool(ok),
                    ec_i, missing, unexpected, None,
                ))
            for i, ca in aggs:
                values = {
                    alias: row[f"a{i}_{alias}"] for alias in ca.metric.exprs
                }
                observed = ca.metric.finalize(values)
                ok, _extra = ca.validate(observed)
                out.append((
                    g, ca.cfg.expectation_type, bool(ok),
                    ec, 0, 0,
                    # NULL observed (all-null segment) stays SQL NULL — the
                    # string 'None' would render as text in the docs page
                    str(observed) if observed is not None else None,
                ))

    # ---- one keyed pass per uniqueness expectation -----------------------
    for cu in uniqs:
        keys = [F.col(c) for c in cu.key_cols]
        # match SuiteRunner's compound domain: missing only when ALL key
        # columns are null (ignore_row_if=all_values_are_missing default);
        # a partially-null key still participates in uniqueness
        missing_row = keys[0].isNull()
        for k in keys[1:]:
            missing_row = missing_row & k.isNull()
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
