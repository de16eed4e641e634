"""Filesystem batch discovery — the DataConnector path-regex analog.

Reference: ``InferredAssetFilesystemDataConnector`` /
``ConfiguredAssetFilesystemDataConnector``
(great_expectations/datasource/data_connector/*.py, unverified — SURVEY.md
§0/§2.1): list files under a base directory, match each path against a
regex whose capture groups become ``batch_identifiers``, and turn every
match into a loadable batch.

Spark-first: listing goes through the Hadoop FileSystem API of the ACTIVE
session (``spark._jvm``), so the same connector works on ``file://``,
``hdfs://`` and ``s3a://`` URIs with whatever filesystems are on the
classpath — no Python-side os.walk that only sees local disk. Listing cost
is one namenode/object-store LIST, driver-side; the data itself is never
touched until :func:`great_expectations_spark.sources.batch.read_batch`
reads the chosen file lazily.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from great_expectations_spark.sources.batch import BatchSpec


@dataclass(frozen=True)
class FilesystemBatchDefinition:
    """One discovered batch: a concrete file path + the identifiers parsed
    out of it by the connector regex."""

    path: str
    batch_identifiers: dict[str, str] = field(default_factory=dict)

    def to_batch_spec(
        self, reader_method: str = "parquet", **reader_options: Any
    ) -> BatchSpec:
        return BatchSpec(
            path=self.path,
            reader_method=reader_method,
            reader_options=dict(reader_options),
        )


def _hadoop_list_files(
    spark: SparkSession, base_dir: str, recursive: bool
) -> tuple[str, list[str]]:
    """Returns (qualified_base, file_paths).

    ``qualified_base`` is ``base_dir`` as the filesystem itself renders it
    (``fs.makeQualified``) — e.g. ``file:///x`` → ``file:/x``, bare
    ``hdfs://nn`` gains its default port — so callers can derive relative
    paths by prefix against the exact strings ``listFiles`` returns instead
    of guessing at URI normalization."""
    jvm = spark._jvm
    sc = spark.sparkContext
    path = jvm.org.apache.hadoop.fs.Path(base_dir)
    fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
    qualified = fs.makeQualified(path).toString()
    out: list[str] = []
    it = fs.listFiles(path, bool(recursive))
    while it.hasNext():
        status = it.next()
        out.append(status.getPath().toString())
    return qualified, out


def discover_filesystem_batches(
    spark: SparkSession,
    base_dir: str,
    regex: str,
    group_names: list[str],
    recursive: bool = False,
    batch_identifiers: dict[str, str] | None = None,
) -> list[FilesystemBatchDefinition]:
    """List ``base_dir`` and return one batch definition per file whose
    NAME (path relative to base_dir) matches ``regex``; capture group *i*
    binds to ``group_names[i]``.

    ``batch_identifiers`` filters to batches whose parsed identifiers
    include the given key/values (the reference's
    ``get_batch_definition_list_from_batch_request`` semantics). Results
    are sorted by identifier tuple for stable iteration order.
    """
    pat = re.compile(regex)
    if pat.groups != len(group_names):
        raise ValueError(
            f"regex has {pat.groups} capture groups but "
            f"{len(group_names)} group_names were given"
        )
    qualified_base, files = _hadoop_list_files(spark, base_dir, recursive)
    base_norm = qualified_base.rstrip("/") + "/"
    defs: list[FilesystemBatchDefinition] = []
    for full in files:
        rel = full[len(base_norm):] if full.startswith(base_norm) else full.rsplit("/", 1)[-1]
        m = pat.search(rel)
        if not m:
            continue
        ids = {g: m.group(i + 1) for i, g in enumerate(group_names)}
        if batch_identifiers and any(
            ids.get(k) != str(v) for k, v in batch_identifiers.items()
        ):
            continue
        defs.append(FilesystemBatchDefinition(path=full, batch_identifiers=ids))
    defs.sort(key=lambda d: tuple(d.batch_identifiers[g] for g in group_names))
    return defs
