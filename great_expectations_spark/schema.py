"""Transcripts schema + deterministic synthetic generator.

The primary input table per BASELINE.json ``input_hint``::

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp

The generator is fully deterministic (seeded, no ``rand()`` without seed —
SURVEY.md §7.4) and synthesizes the violation mix FIXTURES.md F1 calls for:
skewed (Zipf-ish) conv_id hot keys, NULL/empty text, invalid roles, dangling
tool references, and out-of-order timestamps.

Generation is distributed: we build the table from ``spark.range`` so it
scales to bench sizes without driver memory, and every derived column is a
pure function of the row id (byte-stable across runs and parallelism levels —
the per-turn text-equality invariant).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), nullable=False),
        StructField("turn_idx", IntegerType(), nullable=False),
        StructField("role", StringType(), nullable=True),
        StructField("text", StringType(), nullable=True),
        StructField("tool", StringType(), nullable=True),
        StructField("ts", TimestampType(), nullable=True),
    ]
)

ROLES = ["system", "user", "assistant", "tool"]

#: referential dimension (FIXTURES.md F2) — tool names the `tool` column may use
TOOL_NAMES = [f"tool_{i:02d}" for i in range(50)]
TOOL_CATEGORIES = ["search", "code", "file", "web", "math"]

_EPOCH = _dt.datetime(2025, 1, 1)

# deterministic word list for pseudo-text
_WORDS = (
    "the a of to and in is it you that he was for on are as with his they "
    "at be this have from or one had by word but not what all were we when "
    "your can said there use an each which she do how their if will up "
    "other about out many then them these so some her would make like him "
    "into time has look two more write go see number no way could people my "
    "than first water been call who oil its now find long down day did get "
    "come made may part"
).split()


def _hash_expr(*cols):
    """Deterministic non-negative 63-bit hash of the given columns."""
    return F.abs(F.xxhash64(*cols))


def generate_transcripts(
    spark: SparkSession,
    n_turns: int = 10_000,
    seed: int = 42,
    n_convs: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcripts table of ``n_turns`` rows (FIXTURES.md F1).

    Skew: conv ids are assigned by a quadratic ramp so a small fraction of
    conversations own a disproportionate share of turns (~hot keys), which
    exercises the salted-aggregation path (SURVEY.md §4.3).

    Violation injection rates (per FIXTURES.md F1):
      - ~0.2% NULL text, ~0.5% empty text
      - ~1% invalid role values (e.g. ``"agent "``)
      - ~0.1% dangling ``tool`` values absent from the tools dim
      - ~0.5% out-of-order ``ts`` within a conversation
    """
    if n_convs is None:
        n_convs = max(1, n_turns // 20)

    df = spark.range(0, n_turns, 1, numPartitions=partitions or spark.sparkContext.defaultParallelism)

    # --- conv assignment with Zipf-ish skew -------------------------------
    hot = F.col("id") % 10 < 3  # 30% of turns …
    conv_idx = F.when(
        hot, (_hash_expr(F.col("id"), F.lit(seed + 1)) % F.lit(max(1, n_convs // 100)))
    ).otherwise(
        _hash_expr(F.col("id"), F.lit(seed + 2)) % F.lit(n_convs)
    )  # … go to ~1% of convs (hot keys)

    df = df.withColumn("conv_idx", conv_idx)

    # turn_idx: contiguous 0..n-1 per conv, ordered by row id (deterministic)
    from pyspark.sql import Window

    w = Window.partitionBy("conv_idx").orderBy("id")
    df = df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))

    h2 = _hash_expr(F.col("id"), F.lit(seed + 3))
    h3 = _hash_expr(F.col("id"), F.lit(seed + 4))
    h4 = _hash_expr(F.col("id"), F.lit(seed + 5))

    role = (
        F.when(h2 % 1000 < 10, F.lit("agent "))  # ~1% invalid
        .when(F.col("turn_idx") == 0, F.lit("system"))
        .when(h2 % 4 == 0, F.lit("tool"))
        .when(h2 % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )

    # deterministic pseudo-text: words picked by hash, log-normal-ish length
    n_words = (F.pow(F.lit(2.0), (h3 % 1000) / 125.0)).cast("int") + 1  # 1..~256 words
    words_arr = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda i: F.element_at(
            F.array(*[F.lit(wd) for wd in _WORDS]),
            (
                (F.xxhash64(F.col("id"), i, F.lit(seed)) % len(_WORDS) + len(_WORDS))
                % len(_WORDS)
                + 1
            ).cast("int"),
        ),
    )
    text = F.concat_ws(" ", words_arr)
    text = (
        F.when(h3 % 10000 < 20, F.lit(None).cast("string"))  # ~0.2% NULL
        .when(h3 % 10000 < 70, F.lit(""))  # ~0.5% empty
        .otherwise(text)
    )

    tool = (
        F.when(
            role == "tool",
            F.when(
                h4 % 1000 < 1, F.concat(F.lit("ghost_tool_"), (h4 % 7).cast("string"))
            ).otherwise(  # ~0.1% dangling
                F.element_at(
                    F.array(*[F.lit(t) for t in TOOL_NAMES]),
                    (h4 % len(TOOL_NAMES)).cast("int") + 1,
                )
            ),
        )
    ).cast("string")  # NULL for non-tool turns

    # ts: monotone per conversation with a small out-of-order injection
    base_s = (F.col("conv_idx") % 86400) * 60
    jitter = F.when(h4 % 1000 < 5, -120).otherwise(0)  # ~0.5% out of order
    ts = F.timestamp_seconds(
        F.lit(int(_EPOCH.timestamp()))
        + base_s
        + F.col("turn_idx") * 30
        + jitter
    )

    out = df.select(
        F.format_string("conv-%08d", F.col("conv_idx")).alias("conv_id"),
        F.col("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
    return out


def generate_tools_dim(spark: SparkSession) -> DataFrame:
    """Referential dimension (FIXTURES.md F2): 50 unique tool names."""
    rows = [
        (name, TOOL_CATEGORIES[i % len(TOOL_CATEGORIES)])
        for i, name in enumerate(TOOL_NAMES)
    ]
    return spark.createDataFrame(rows, "tool_name string, category string")
