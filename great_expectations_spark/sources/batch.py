"""BatchSpec → DataFrame readers.

Reference: ``SparkDFExecutionEngine.get_batch_data_and_markers``
(great_expectations/execution_engine/sparkdf_execution_engine.py ≈L300–420,
unverified — SURVEY.md §0) dispatches on the batch-spec class:
RuntimeDataBatchSpec (in-memory df), PathBatchSpec (csv/json/parquet/orc/
delta via ``reader_method`` + ``reader_options``), and table specs.

Ours is one frozen dataclass + one function. The splitter / sampler are
applied AFTER the read as plain DataFrame filters so Catalyst can push the
predicates into the scan (partition pruning on partitioned parquet /
Iceberg; PushedFilters on row groups).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame, SparkSession

# reader_method → SparkSession.read accessor (built-in file sources) …
_PATH_READERS = ("csv", "json", "parquet", "orc", "text")
# … vs DataSourceV2 formats read via .format(m).load(path). Delta/Iceberg
# jars are absent in the sandbox (SURVEY.md §7.4) so these dispatch-verify
# with a recording stub in tests; on a cluster with the connector on the
# classpath the same spec reads the real table. Catalog tables
# (spark.read.table("cat.db.transcripts")) remain the preferred Iceberg
# path — table_options carries v2 time-travel options (Iceberg
# "snapshot-id"/"as-of-timestamp", Delta "versionAsOf"/"timestampAsOf"),
# which DataFrameReader.table forwards to the v2 catalog.
_FORMAT_READERS = ("delta", "iceberg", "avro")


@dataclass(frozen=True)
class BatchSpec:
    """How to obtain one batch.

    Exactly one of ``dataframe`` / ``path`` / ``table`` must be set.

    splitter / sampler: names + kwargs resolved against
    :mod:`great_expectations_spark.sources.splitters` /
    :mod:`…samplers` — e.g. ``splitter_method="split_on_year_and_month"``,
    ``splitter_kwargs={"column": "ts", "batch_identifiers":
    {"year": 2025, "month": 6}}``.
    """

    dataframe: Optional[DataFrame] = None
    path: Optional[str] = None
    reader_method: str = "parquet"
    reader_options: dict[str, Any] = field(default_factory=dict)
    table: Optional[str] = None
    table_options: dict[str, Any] = field(default_factory=dict)
    jdbc: Optional[dict[str, Any]] = None
    splitter_method: Optional[str] = None
    splitter_kwargs: dict[str, Any] = field(default_factory=dict)
    sampling_method: Optional[str] = None
    sampling_kwargs: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        set_count = sum(
            x is not None
            for x in (self.dataframe, self.path, self.table, self.jdbc)
        )
        if set_count != 1:
            raise ValueError(
                "BatchSpec needs exactly one of dataframe / path / table / jdbc"
            )
        if self.path is not None and self.reader_method not in (
            _PATH_READERS + _FORMAT_READERS
        ):
            raise ValueError(
                f"reader_method {self.reader_method!r} not in "
                f"{_PATH_READERS + _FORMAT_READERS}"
            )
        if self.table_options and self.table is None:
            raise ValueError("table_options requires table")
        if self.jdbc is not None:
            if "url" not in self.jdbc or not (
                "dbtable" in self.jdbc or "query" in self.jdbc
            ):
                raise ValueError(
                    "jdbc spec needs 'url' and one of 'dbtable' / 'query'"
                )


def _resolve(module: Any, prefix: str, name: str) -> Callable[..., DataFrame]:
    fn = getattr(module, name, None) or getattr(module, f"{prefix}{name}", None)
    if fn is None:
        raise ValueError(f"unknown method {name!r} in {module.__name__}")
    return fn


def read_batch(spark: SparkSession, spec: BatchSpec) -> DataFrame:
    """Materialize the batch a spec describes (lazily — no action runs)."""
    if spec.dataframe is not None:
        df = spec.dataframe
    elif spec.table is not None:
        # v2 time-travel options (Iceberg snapshot-id / as-of-timestamp,
        # Delta versionAsOf / timestampAsOf) flow through DataFrameReader
        # to the catalog's table implementation.
        df = spark.read.options(**spec.table_options).table(spec.table)
    elif spec.jdbc is not None:
        # SQL-table source (reference SqlAlchemy datasource analog).
        # Filters/column pruning push into the remote database (JDBC source
        # supports pushdown natively); parallel reads via the standard
        # partitionColumn/lowerBound/upperBound/numPartitions options, which
        # must be set for any large table — a single-partition JDBC scan
        # serializes the whole extract through one task.
        df = spark.read.format("jdbc").options(**spec.jdbc).load()
    elif spec.reader_method in _FORMAT_READERS:
        # DataSourceV2 path-style read: .format("delta"|"iceberg"|…).load()
        df = (
            spark.read.format(spec.reader_method)
            .options(**spec.reader_options)
            .load(spec.path)
        )
    else:
        reader = spark.read.options(**spec.reader_options)
        df = getattr(reader, spec.reader_method)(spec.path)

    if spec.splitter_method:
        from great_expectations_spark.sources import splitters as S

        df = _resolve(S, "split_on_", spec.splitter_method)(df, **spec.splitter_kwargs)
    if spec.sampling_method:
        from great_expectations_spark.sources import samplers as P

        df = _resolve(P, "sample_using_", spec.sampling_method)(
            df, **spec.sampling_kwargs
        )
    return df
