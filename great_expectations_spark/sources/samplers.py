"""Data samplers — validate a deterministic subset of a batch.

Reference: ``SparkDataSampler``
(great_expectations/execution_engine/split_and_sample/
sparkdf_data_sampler.py, ≈200 LoC, unverified — SURVEY.md §2.2). The
reference's ``sample_using_hash`` wraps ``hashlib`` in a per-row Python UDF;
ours uses native ``F.md5`` (JVM codegen, bit-identical hex for utf8).

Determinism contract (SURVEY.md §7.4): resumable runs must re-produce the
same sample, so ``sample_using_random`` REQUIRES a seed — derive it from
``(run_id, partition_id)`` upstream. Every other sampler is a pure function
of row content.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F


def sample_using_limit(df: DataFrame, n: int) -> DataFrame:
    return df.limit(int(n))


def sample_using_random(df: DataFrame, p: float, seed: int) -> DataFrame:
    if seed is None:
        raise ValueError("sample_using_random requires an explicit seed")
    return df.sample(withReplacement=False, fraction=float(p), seed=int(seed))


def sample_using_mod(df: DataFrame, column: str, mod: int, value: int) -> DataFrame:
    return df.filter(
        F.pmod(F.col(column).cast("long"), F.lit(int(mod))) == F.lit(int(value))
    )


def sample_using_a_list(
    df: DataFrame, column: str, value_list: list[Any]
) -> DataFrame:
    return df.filter(F.col(column).isin(list(value_list)))


def sample_using_hash(
    df: DataFrame, column: str, hash_digits: int = 1, hash_value: str = "f"
) -> DataFrame:
    """Rows whose md5(column) hex digest ends with ``hash_value`` — a
    content-stable ~16^-digits fraction, identical across runs and engines."""
    n = int(hash_digits)
    return df.filter(
        F.substring(F.md5(F.col(column).cast("string")), 33 - n, n)
        == F.lit(str(hash_value))
    )


def sample_using_stratified(
    df: DataFrame,
    strata_column: str,
    fractions: dict[Any, float],
    seed: int,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``df.sampleBy`` — one pass, no
    shuffle; each task coin-flips its own rows). Approximate row counts;
    seed-deterministic for a fixed partition layout."""
    if seed is None:
        raise ValueError("sample_using_stratified requires an explicit seed")
    return df.sampleBy(
        strata_column, {k: float(v) for k, v in fractions.items()}, seed=int(seed)
    )


def sample_stratified_exact(
    df: DataFrame,
    strata_column: str,
    n_per_stratum: int,
    id_column: str,
) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows per stratum, chosen content-stably:
    the rows with the smallest ``md5(id)`` hex within each stratum (window
    ranked per stratum — the shuffle is keyed by the stratum column, so the
    cost is one repartition). md5 hex is bit-identical across engines
    (unlike Spark's xxhash64), so the selection is oracle-checkable and
    resume-safe.

    Skew note: a hot stratum concentrates its rows into one task for the
    ranking; for pathologically hot strata prefer
    :func:`sample_using_stratified` (no shuffle, approximate counts).
    """
    from pyspark.sql import Window

    h = F.md5(F.col(id_column).cast("string"))
    w = Window.partitionBy(strata_column).orderBy(h, F.col(id_column))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(n_per_stratum))
        .drop("__rk")
    )
