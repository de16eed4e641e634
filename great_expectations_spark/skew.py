"""Skew-aware aggregation helpers + session configuration defaults.

north_rule: "partitioning / shuffle / skew handled explicitly". Hot
``conv_id`` keys (FIXTURES.md F1: ~1% of convs own ~30% of turns) make naive
``groupBy(conv_id)`` shuffles lopsided. The fix is **two-level salted
aggregation** (SURVEY.md §4.2 item 3): partial-aggregate on
``(key, salt)`` — map-side combine spreads each hot key over ``n_salts``
reducers — then merge on ``key``. AQE's skew handling only splits *join*
partitions, so aggregation salting is ours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_SALTS = 16

#: conf we set on every session the engine builds — AQE on, sane shuffle
#: partitioning; callers running spark-submit on a real cluster keep these.
ENGINE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # map-expectation predicates must evaluate NULL-safely, not raise
    "spark.sql.ansi.enabled": "false",
}


def build_session(
    app_name: str = "great_expectations_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    for k, v in ENGINE_CONF.items():
        b = b.config(k, v)
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def salt_expr(n_salts: int = DEFAULT_SALTS):
    """Salt derived from the row's position, NOT from the key — salting by a
    key-derived hash would send every row of a hot key to the same salt and
    defeat the two-level split. ``monotonically_increasing_id`` is computed
    locally per task (no shuffle) and spreads each partition's rows evenly
    over the salts; salt values never affect results, only shuffle balance,
    so run-to-run layout differences are harmless."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))


def salted_value_counts(
    df: DataFrame, key_cols: list[str], n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Exact per-key counts via two-level aggregation.

    Level 1 groups on ``(keys…, salt)`` so a hot key's rows land on
    ``n_salts`` reducers; level 2 merges the (tiny) partials on the key.
    Equivalent to ``df.groupBy(keys).count()`` but skew-robust.

    Spark's hash aggregate already does map-side partial aggregation, which
    covers *low-cardinality* hot keys; salting additionally protects the
    reduce side when a hot key's partials exceed one task (many distinct
    spill groups per mapper). Cost: one extra (cheap) shuffle of pre-reduced
    rows — negligible next to the first-level shuffle it heals.
    """
    salted = df.select(*key_cols, salt_expr(n_salts).alias("__salt"))
    partial = salted.groupBy(*key_cols, "__salt").agg(F.count(F.lit(1)).alias("__pc"))
    return partial.groupBy(*key_cols).agg(F.sum("__pc").alias("count"))


def value_counts(
    df: DataFrame,
    key_cols: list[str],
    salted: bool | None = None,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Per-key counts with skew handling chosen by key shape.

    ``salted=None`` (auto): salt single-column keys — the skew-prone shape
    (a hot ``conv_id`` concentrates mapper-side spill groups); use a plain
    ``groupBy`` for compound keys, whose hash distribution is uniform even
    when a component column is hot (a hot conv_id does NOT make any
    ``(conv_id, turn_idx)`` pair hot — salting there only buys an extra
    full shuffle). Both paths keep map-side partial aggregation, so counts
    shuffle pre-reduced either way.
    """
    if salted is None:
        salted = len(key_cols) == 1
    if salted:
        return salted_value_counts(df, key_cols, n_salts)
    return df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("count"))
