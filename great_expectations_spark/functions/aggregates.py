"""Column-aggregate metric builders (SURVEY.md §2.5/§2.6).

Each builder returns an :class:`AggMetric` whose ``exprs`` participate in the
suite-wide **bundled aggregation pass** — the engine's core optimization
(reference: ``SparkDFExecutionEngine.resolve_metric_bundle``; N aggregate
metrics over the same domain → ONE ``df.agg(...)`` → one scan). Aliases are
deterministic so identical metrics requested by different expectations
dedup to a single expression (reference: ``Validator._metrics`` cache keyed
by MetricConfiguration id).

Every partial here is *mergeable across partitions* (counts/sums add,
min/max combine, histogram buckets add) — the property the resumable
checkpoint path relies on (SURVEY.md §4.2 item 5).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column, functions as F


def safe_alias(*parts: Any) -> str:
    """Deterministic, Spark-safe alias from free-form parts."""
    raw = "__".join(str(p) for p in parts)
    return re.sub(r"[^0-9a-zA-Z_]", "_", raw)


@dataclass
class AggMetric:
    """A set of named scalar aggregate expressions + a finalizer producing
    the observed value from the resolved bundle."""

    exprs: dict[str, Column]
    finalize: Callable[[dict[str, Any]], Any]
    #: extra payload for result.details (e.g. observed histogram partition)
    details: Callable[[dict[str, Any]], dict[str, Any] | None] = field(
        default=lambda values: None
    )


def _dcol(column: str) -> Column:
    return F.col(column).cast("double")


def _single(alias: str, expr: Column) -> AggMetric:
    return AggMetric({alias: expr}, lambda v, a=alias: v[a])


# -- plain scalar aggregates --------------------------------------------------

def mean(column: str) -> AggMetric:
    return _single(safe_alias("mean", column), F.mean(_dcol(column)))


def stddev(column: str) -> AggMetric:
    """Sample stddev (ddof=1) for pandas parity — reference uses
    ``F.stddev_samp`` on Spark (column_standard_deviation.py)."""
    return _single(safe_alias("stddev", column), F.stddev_samp(_dcol(column)))


def col_min(column: str, parse_strings_as_datetimes: bool = False) -> AggMetric:
    c = F.try_to_timestamp(F.col(column)) if parse_strings_as_datetimes else F.col(column)
    return _single(safe_alias("min", column, parse_strings_as_datetimes), F.min(c))


def col_max(column: str, parse_strings_as_datetimes: bool = False) -> AggMetric:
    c = F.try_to_timestamp(F.col(column)) if parse_strings_as_datetimes else F.col(column)
    return _single(safe_alias("max", column, parse_strings_as_datetimes), F.max(c))


def col_sum(column: str) -> AggMetric:
    return _single(safe_alias("sum", column), F.sum(_dcol(column)))


def row_count() -> AggMetric:
    return _single("table_row_count", F.count(F.lit(1)))


def nonnull_count(column: str) -> AggMetric:
    return _single(safe_alias("nonnull", column), F.count(F.col(column)))


def null_count(column: str) -> AggMetric:
    return _single(
        safe_alias("nullcount", column),
        F.sum(F.when(F.col(column).isNull(), 1).otherwise(0)),
    )


# -- quantiles ----------------------------------------------------------------

def median(column: str, approximate: bool = True, relative_error: float = 0.001) -> AggMetric:
    """Reference Spark: ``DataFrame.approxQuantile(col, [0.5], err)``
    (column_median.py). Ours rides the bundle: ``percentile_approx`` with
    accuracy ⌈1/err⌉, or exact ``percentile`` when approximate=False."""
    if approximate:
        acc = max(100, int(1.0 / max(relative_error, 1e-6)))
        expr = F.percentile_approx(_dcol(column), 0.5, acc)
    else:
        expr = F.percentile(_dcol(column), F.lit(0.5))
    return _single(safe_alias("median", column, approximate), expr)


def quantile_values(
    column: str,
    quantiles: list[float],
    allow_relative_error: float | bool = 0.001,
    approximate: bool = True,
) -> AggMetric:
    """column.quantile_values (reference: column_quantile_values.py —
    Greenwald–Khanna via DataFrame.approxQuantile). Ours:
    ``percentile_approx`` with an array of quantiles in the shared bundle —
    one pass for any number of quantiles."""
    alias = safe_alias("quantiles", column, *quantiles, approximate)
    qarr = F.array(*[F.lit(float(q)) for q in quantiles])
    if approximate:
        err = 0.001 if allow_relative_error in (True, False, None) else float(allow_relative_error)
        acc = max(100, int(1.0 / max(err, 1e-6)))
        expr = F.percentile_approx(_dcol(column), qarr, acc)
    else:
        expr = F.percentile(_dcol(column), qarr)
    return AggMetric({alias: expr}, lambda v, a=alias: list(v[a]) if v[a] is not None else None)


# -- distinctness ---------------------------------------------------------------

def distinct_count(column: str, approximate: bool = False, rsd: float = 0.01) -> AggMetric:
    """Exact ``count(DISTINCT)`` or HLL ``approx_count_distinct`` — the
    10^12-scale path per north_star (SURVEY.md §2.5)."""
    alias = safe_alias("distinct_count", column, approximate)
    expr = (
        F.approx_count_distinct(F.col(column), rsd)
        if approximate
        else F.countDistinct(F.col(column))
    )
    return _single(alias, expr)


def pair_correlation(column_a: str, column_b: str) -> AggMetric:
    """Pearson sample correlation of two numeric columns (``F.corr`` —
    one JVM aggregate; rows with a null on either side are excluded by
    Spark's corr semantics, matching SQL ``corr``). Extension: the
    reference has no correlation expectation; a drift in the r between
    two columns is a classic silent-schema-change signal."""
    return _single(
        safe_alias("corr", column_a, column_b),
        F.corr(_dcol(column_a), _dcol(column_b)),
    )


def unique_proportion(column: str, approximate: bool = False) -> AggMetric:
    """distinct_count / nonnull_count — two bundled aggs, zero extra scans."""
    dc = safe_alias("distinct_count", column, approximate)
    nn = safe_alias("nonnull", column)
    exprs = {
        dc: F.approx_count_distinct(F.col(column))
        if approximate
        else F.countDistinct(F.col(column)),
        nn: F.count(F.col(column)),
    }

    def fin(v: dict[str, Any]) -> Any:
        return (v[dc] / v[nn]) if v[nn] else None

    return AggMetric(exprs, fin)


def distinct_values(column: str) -> AggMetric:
    """Exact distinct set via ``collect_set`` inside the bundle. Driver-side
    set — intended for capped-cardinality columns (the reference collects the
    full value_counts series likewise). Use `distinct_count(approximate=True)`
    as the scale gate first."""
    alias = safe_alias("distinct_values", column)
    return AggMetric(
        {alias: F.sort_array(F.collect_set(F.col(column)))},
        lambda v: sorted(v[alias]) if v[alias] is not None else [],
    )


# -- range counts / histograms -------------------------------------------------

def values_between_count(
    column: str,
    min_value: Any = None,
    max_value: Any = None,
    strict_min: bool = False,
    strict_max: bool = False,
) -> AggMetric:
    from great_expectations_spark.functions.conditions import _between_expr

    alias = safe_alias("between_count", column, min_value, max_value, strict_min, strict_max)
    cond = _between_expr(F.col(column), min_value, max_value, strict_min, strict_max)
    return _single(alias, F.sum(F.when(F.col(column).isNotNull() & cond, 1).otherwise(0)))


def histogram(column: str, bins: list[float]) -> AggMetric:
    """column.histogram — reference Spark uses ``pyspark.ml.feature.Bucketizer``
    + groupBy; ours bundles the whole histogram into the shared agg pass as
    ONE array-of-sums expression (no extra shuffle, no ML dependency).
    Convention matches Bucketizer: buckets are [b_i, b_{i+1}) with the LAST
    bucket closed [b_{n-1}, b_n]. ±inf edges supported.

    Built as a single ``F.expr`` SQL string: a per-bucket ``F.when`` chain
    costs ~10 Py4J round-trips per bucket (measured ~0.5s of serial driver
    time for 20 buckets); one parsed SQL expression costs one round-trip
    regardless of bucket count."""
    import math

    col_sql = f"cast(`{column}` as double)"
    notnull = f"`{column}` is not null"
    n = len(bins) - 1
    parts: list[str] = []
    for i in range(n):
        lo, hi = float(bins[i]), float(bins[i + 1])
        conds = [notnull]
        if not math.isinf(lo):
            conds.append(f"{col_sql} >= {lo!r}")
        if not math.isinf(hi):
            op = "<=" if i == n - 1 else "<"
            conds.append(f"{col_sql} {op} {hi!r}")
        parts.append(f"sum(case when {' and '.join(conds)} then 1 else 0 end)")
    # the alias must encode EVERY edge, not just endpoints: two histograms
    # over the same column/range with different interior edges (uniform vs
    # quantile bins) must not collide in the domain group's bundle dict
    import hashlib

    bins_digest = hashlib.md5(repr([float(b) for b in bins]).encode()).hexdigest()[:10]
    alias = safe_alias("hist", column, n, bins_digest)
    expr = F.expr("array(" + ", ".join(parts) + ")")

    def fin(v: dict[str, Any]) -> list[int]:
        return [int(x or 0) for x in v[alias]]

    return AggMetric({alias: expr}, fin)
