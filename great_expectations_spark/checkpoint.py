"""Resumable checkpointed validation runs (SURVEY.md §7.2 M8).

The reference's ``Checkpoint`` (great_expectations/checkpoint/checkpoint.py,
≈1.5k LoC, unverified per SURVEY.md §0) is a batch-run config object: it
resolves (batch_request × suite) pairs and stores one validation result per
batch. Our engine lifts that to the north_rule contract:

- the input table is validated **per partition** (an Iceberg partition value
  or, in the sandbox, a distinct value of a partition column of a
  dir-partitioned parquet table — Catalyst prunes the scan to one partition
  per run unit);
- every finished partition appends one **manifest row** with lineage +
  metrics ``(run_id, partition_id, status, rows_scanned, violations,
  elapsed_s, suite_hash, element_count, unexpected_count, finished_ts)``;
- a re-run with the same ``(suite_hash, partition_id)`` is **skipped**
  (resume = anti-diff against the manifest, computed driver-side from a
  manifest read — the manifest is tiny: one row per partition);
- suite-level statistics are re-derivable by **merging** the per-partition
  counters (counts add; ``mostly`` re-evaluated on merged counts) — see
  :func:`merge_map_counts`. This mirrors the reference's
  AGGREGATE_FN partial → finalize split lifted to partition granularity
  (SURVEY.md §4.2 item 5).

Determinism: nothing here uses unseeded randomness; the manifest is the only
state, so kill/resume at any point re-runs at most the one in-flight
partition (writes are atomic per partition: parquet append of a 1-row
DataFrame after the partition's validation completes).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from great_expectations_spark.result import (
    ExpectationSuiteValidationResult,
    calc_map_success,
)
from great_expectations_spark.runner import SuiteRunner
from great_expectations_spark.suite import ExpectationSuite

MANIFEST_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("partition_id", StringType()),
        StructField("status", StringType()),
        StructField("suite_hash", StringType()),
        StructField("rows_scanned", LongType()),
        StructField("violations", LongType()),
        StructField("elapsed_s", DoubleType()),
        StructField("success", BooleanType()),
        StructField("finished_ts", TimestampType()),
    ]
)

#: per-(partition × expectation) mergeable counters — the "metrics" half of
#: the manifest. Counts add across partitions; observed_value is kept for
#: aggregate expectations (not mergeable in general → suite-level aggregates
#: are reported per partition, the north_rule's per-partition pass/fail).
EVR_ROW_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("partition_id", StringType()),
        StructField("expectation_type", StringType()),
        StructField("expectation_id", StringType()),
        StructField("success", BooleanType()),
        StructField("element_count", LongType()),
        StructField("missing_count", LongType()),
        StructField("unexpected_count", LongType()),
        StructField("observed_value", StringType()),
    ]
)

#: per-(partition × segment × expectation) counters — the segmented-mode
#: twin of EVR_ROW_SCHEMA (``Checkpoint.run(segment_col=...)``). Counts add
#: across partitions per segment, so the suite-level per-segment verdict is
#: re-derivable from a resumed run exactly like the whole-partition one.
SEGMENT_EVR_ROW_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("partition_id", StringType()),
        StructField("segment", StringType()),
        StructField("expectation_type", StringType()),
        StructField("success", BooleanType()),
        StructField("element_count", LongType()),
        StructField("missing_count", LongType()),
        StructField("unexpected_count", LongType()),
        StructField("observed_value", StringType()),
    ]
)


def salted_suite_hash(shash: str, segment_col: str) -> str:
    """The segmented-mode manifest hash: the plain suite hash salted with
    the segment column, so segmented and whole-partition runs of the same
    suite never cross-skip. ONE definition — ``run()`` and the merge views
    must always agree, or every segmented merge silently empties."""
    return hashlib.sha256(
        f"{shash}|segmented:{segment_col}".encode()
    ).hexdigest()[:16]


def check_partitioned_layout(
    spark: SparkSession, path: str, stale_prefix: str, expected: str
) -> None:
    """One-time guard against mixing two partition-directory depths under one
    parquet root (same protection as StreamingValidator._check_layout):
    appending the new layout into a root that already holds ``stale_prefix=``
    top-level dirs would make the whole root unreadable ("conflicting
    directory structures"). Raises ValueError; FS quirks never block."""
    try:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if not fs.exists(p):
            return
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name.startswith(f"{stale_prefix}="):
                raise ValueError(
                    f"{path!r} holds a stale top-level {stale_prefix}= "
                    f"partition layout; this sink now writes {expected}. "
                    "Use a new path or migrate the old files first."
                )
    except ValueError:
        raise
    except Exception:  # pragma: no cover - FS quirks never block validation
        pass


def suite_hash(suite: ExpectationSuite) -> str:
    """Deterministic digest of the suite definition — a manifest row only
    counts as 'done' for the exact suite it was produced by."""
    payload = json.dumps(
        [cfg.to_dict() for cfg in suite], sort_keys=True, default=str
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


@dataclass
class PartitionRunRecord:
    partition_id: str
    status: str  # "validated" | "skipped" | "failed"
    result: ExpectationSuiteValidationResult | None = None
    rows_scanned: int = 0
    violations: int = 0
    elapsed_s: float = 0.0
    #: for status="skipped": the manifest-recorded verdict of the run that
    #: validated this partition (None if the manifest predates this field)
    manifest_success: bool | None = None
    #: segmented mode: number of segments validated in this partition, and
    #: the partition verdict (all segments passed) — ``result`` stays None
    #: because segmented runs emit per-segment rows, not one suite result
    segments: int = 0
    segmented_success: bool | None = None


@dataclass
class CheckpointRunResult:
    run_id: str
    suite_hash: str
    records: list[PartitionRunRecord] = field(default_factory=list)

    @property
    def validated(self) -> list[PartitionRunRecord]:
        return [r for r in self.records if r.status == "validated"]

    @property
    def skipped(self) -> list[PartitionRunRecord]:
        return [r for r in self.records if r.status == "skipped"]

    @property
    def success(self) -> bool:
        """True only if every partition of the TABLE passed — including
        partitions skipped on resume, judged by their manifest verdict (a
        resumed run over a previously-FAILING table must not report
        success just because the failing partitions were already done)."""
        for r in self.records:
            if r.result is not None:
                if not r.result.success:
                    return False
            elif r.segmented_success is False:
                return False
            elif r.status == "skipped" and r.manifest_success is False:
                return False
        return True


def merge_map_counts(
    per_partition: list[dict[str, Any]], mostly: float | None = None
) -> dict[str, Any]:
    """Merge per-partition map-expectation counters into suite-level ones.

    counts add; success is re-evaluated on the merged counts with the same
    ``mostly`` rule (reference `_calc_map_expectation_success`, SURVEY.md
    §1.4). This is what makes per-partition EVRs sufficient state for a
    resumable suite-level verdict.
    """
    element_count = sum(int(p.get("element_count") or 0) for p in per_partition)
    missing_count = sum(int(p.get("missing_count") or 0) for p in per_partition)
    unexpected_count = sum(
        int(p.get("unexpected_count") or 0) for p in per_partition
    )
    return {
        "element_count": element_count,
        "missing_count": missing_count,
        "unexpected_count": unexpected_count,
        "success": calc_map_success(
            element_count, missing_count, unexpected_count, mostly
        ),
    }


class Checkpoint:
    """Named, re-runnable (table × suite) validation with a resume manifest.

    Parameters
    ----------
    spark : session
    manifest_path : parquet dir holding the manifest table (created lazily)
    evr_path : optional parquet dir for per-(partition × expectation) EVR
        counter rows (the mergeable metrics store)
    violations_path : optional violations sink forwarded to SuiteRunner
    runner_kwargs : forwarded to :class:`SuiteRunner`
    """

    def __init__(
        self,
        spark: SparkSession,
        manifest_path: str,
        evr_path: str | None = None,
        violations_path: str | None = None,
        **runner_kwargs: Any,
    ) -> None:
        self.spark = spark
        self.manifest_path = manifest_path
        self.evr_path = evr_path
        self.violations_path = violations_path
        self.runner_kwargs = runner_kwargs

    # ------------------------------------------------------------ manifest io
    def read_manifest(self) -> DataFrame:
        try:
            return self.spark.read.schema(MANIFEST_SCHEMA).parquet(
                self.manifest_path
            )
        except Exception:  # noqa: BLE001 — first run: no manifest yet
            return self.spark.createDataFrame([], MANIFEST_SCHEMA)

    def completed_partitions(self, shash: str) -> dict[str, bool | None]:
        """{partition_id: recorded suite success} for every partition the
        manifest marks validated under this suite hash (latest row wins —
        dict-like a set for membership, plus the verdict for resume
        reporting). A NULL success column (manifest written before the
        field existed, or by an external tool) stays ``None`` — coercing
        it to False would flip the whole resumed run's verdict to failed
        even when every partition actually passed
        (``PartitionRunRecord.manifest_success`` documents None as
        "predates this field" and only ``is False`` fails the run)."""
        rows = (
            self.read_manifest()
            .filter(
                (F.col("suite_hash") == shash)
                & (F.col("status") == "validated")
            )
            .select("partition_id", "success", "finished_ts")
            .orderBy("finished_ts")
            .collect()
        )
        return {
            r["partition_id"]: (None if r["success"] is None else bool(r["success"]))
            for r in rows
        }

    def _append_manifest(self, row: dict[str, Any]) -> None:
        import datetime as _dt

        row = dict(row, finished_ts=_dt.datetime.now())
        self.spark.createDataFrame([row], MANIFEST_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.manifest_path)

    def _append_evrs(
        self,
        run_id: str,
        partition_id: str,
        result: ExpectationSuiteValidationResult,
    ) -> None:
        if not self.evr_path:
            return
        rows = []
        for r in result.results:
            res = r.result or {}
            rows.append(
                {
                    "run_id": run_id,
                    "partition_id": partition_id,
                    "expectation_type": r.expectation_config.get(
                        "expectation_type"
                    ),
                    "expectation_id": r.expectation_config.get("id"),
                    "success": bool(r.success),
                    "element_count": int(res.get("element_count") or 0),
                    "missing_count": int(res.get("missing_count") or 0),
                    "unexpected_count": int(res.get("unexpected_count") or 0),
                    "observed_value": json.dumps(
                        res.get("observed_value"), default=str
                    ),
                }
            )
        self.spark.createDataFrame(rows, EVR_ROW_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.evr_path)

    def _append_segment_evrs(self, run_id: str, partition_id: str,
                             seg_rows: list) -> None:
        """Segmented-mode EVR append: one row per (segment × expectation),
        already driver-local (validate_by_group collects its counters)."""
        if not self.evr_path:
            return
        rows = [
            {
                "run_id": run_id,
                "partition_id": partition_id,
                "segment": r["group"],
                "expectation_type": r["expectation_type"],
                "success": bool(r["success"]),
                "element_count": int(r["element_count"] or 0),
                "missing_count": int(r["missing_count"] or 0),
                "unexpected_count": int(r["unexpected_count"] or 0),
                "observed_value": r["observed_value"],
            }
            for r in seg_rows
        ]
        self.spark.createDataFrame(
            rows, SEGMENT_EVR_ROW_SCHEMA
        ).coalesce(1).write.mode("append").parquet(self.evr_path)

    # ------------------------------------------------------------------- run
    def run(
        self,
        df: DataFrame,
        suite: ExpectationSuite,
        run_id: str,
        partition_col: str,
        partition_values: list[Any] | None = None,
        fail_partition: Any = None,
        max_concurrent_partitions: int = 1,
        segment_col: str | None = None,
        segment_max_groups: int = 100_000,
    ) -> CheckpointRunResult:
        """Validate ``df`` partition-by-partition, resuming from the manifest.

        ``partition_values`` defaults to the distinct values of
        ``partition_col`` (one extra scan of that column only — prunable).
        ``fail_partition`` is a test hook: raises mid-run after that
        partition would start, simulating a kill for resume tests.

        ``max_concurrent_partitions`` > 1 validates that many partitions as
        concurrent Spark job sets (thread pool) — small partitions rarely
        saturate the cluster alone, so overlapping them fills the scheduler.
        Manifest/EVR parquet appends are serialized through a lock (one
        writer at a time avoids committer staging races); a partition's
        manifest row still commits only after its validation finished, so
        resume semantics are identical to the sequential path.

        ``segment_col`` switches each partition's validation to
        :func:`~great_expectations_spark.segmented.validate_by_group`:
        the suite is evaluated once per distinct segment value WITHIN each
        partition (one bundled groupBy per partition, not one scan per
        segment), EVR rows land in ``evr_path`` under
        :data:`SEGMENT_EVR_ROW_SCHEMA` (an extra ``segment`` column — use a
        fresh path, not a whole-partition EVR store; guarded), and the
        manifest/resume semantics are unchanged: kill/resume re-runs at
        most the one in-flight partition, and per-segment suite-level
        verdicts merge across partitions via
        :meth:`merged_segment_verdicts`. The suite hash is salted with the
        segment column so segmented and whole-partition runs of the same
        suite never cross-skip each other.
        """
        if self.violations_path is not None:
            # refuse to append partition_id=<pid>/expectation=… under a root
            # still holding the pre-change expectation=… top-level layout
            check_partitioned_layout(
                self.spark,
                self.violations_path,
                stale_prefix="expectation",
                expected="partition_id=<pid>/expectation=<type>/",
            )
        shash = suite_hash(suite)
        if self.evr_path:
            # the two EVR shapes must never share a store: reading a mixed
            # store under either schema silently null-fills the other
            # side's rows — and a whole-partition row null-filled into the
            # `segment` column would merge into the genuinely-NULL segment
            # group (a legitimate value in segmented mode). Refuse BOTH
            # directions instead.
            from pyspark.errors import AnalysisException

            try:
                existing = set(
                    self.spark.read.parquet(self.evr_path).columns
                )
            except AnalysisException:
                # first run: no store yet (PATH_NOT_FOUND / unable to
                # infer schema). ONLY that case may skip the guard — a
                # corrupt or unreadable existing store must fail loudly
                # here, not get the other schema appended into it
                existing = None
            if existing is not None:
                if segment_col is not None and "segment" not in existing:
                    raise ValueError(
                        f"evr_path {self.evr_path!r} holds whole-partition "
                        "EVR rows (no `segment` column); segmented runs "
                        "need their own EVR store path"
                    )
                if segment_col is None and "segment" in existing:
                    raise ValueError(
                        f"evr_path {self.evr_path!r} holds segmented EVR "
                        "rows (`segment` column present); whole-partition "
                        "runs need their own EVR store path"
                    )
        if segment_col is not None:
            shash = salted_suite_hash(shash, segment_col)
        done = self.completed_partitions(shash)
        if partition_values is None:
            partition_values = sorted(
                r[partition_col]
                for r in df.select(partition_col).distinct().collect()
            )

        out = CheckpointRunResult(run_id=run_id, suite_hash=shash)

        import threading
        import urllib.parse

        write_lock = threading.Lock()

        def run_partition(pv: Any) -> PartitionRunRecord:
            pid = str(pv)
            t0 = time.monotonic()
            # Each partition's violations go to their OWN Hive-style
            # subdirectory (violations_path/partition_id=<pid>/): concurrent
            # workers never append to the same parquet root, so no two
            # threads share a _temporary committer staging dir (the
            # manifest/EVR lock below does not cover this write), and
            # reading the root rediscovers partition_id as a column.
            vpath = self.violations_path
            if vpath is not None:
                vpath = os.path.join(
                    vpath, f"partition_id={urllib.parse.quote(pid, safe='')}"
                )
            # Catalyst partition-prunes this filter when partition_col is a
            # physical partition column of the source (Iceberg / dir-parquet).
            pdf = df.filter(F.col(partition_col) == F.lit(pv))

            if segment_col is not None:
                from great_expectations_spark.segmented import (
                    validate_by_group,
                )

                seg_rows = validate_by_group(
                    pdf, suite, segment_col,
                    max_groups=segment_max_groups,
                    violations_path=vpath,
                    unexpected_index_column_names=self.runner_kwargs.get(
                        "unexpected_index_column_names"
                    ),
                ).collect()
                n_segments = len({r["group"] for r in seg_rows})
                if any(
                    r["group"] == "__empty_partition__" for r in seg_rows
                ):
                    raise ValueError(
                        f"partition {pid!r} holds a genuine segment named "
                        "'__empty_partition__', which is reserved for "
                        "empty-partition verdict rows — rename or derive "
                        "the segment column so the merged per-segment "
                        "counters cannot mix the two"
                    )
                if not seg_rows:
                    # An EMPTY partition yields zero segments, so nothing
                    # above ran — and `all([])` would mark the partition
                    # validated/passed unconditionally with ZERO EVR rows
                    # (invisible in the merge views and the docs page).
                    # Whole-partition parity instead: run the WHOLE suite
                    # through SuiteRunner on the empty frame (map kinds
                    # succeed vacuously, a row-count floor FAILS) with the
                    # checkpoint's configured runner kwargs, and record
                    # every verdict with its real counters/observed value
                    # under the reserved segment "__empty_partition__" —
                    # NOT NULL, which is a legitimate segment value that
                    # other partitions may genuinely hold and must not be
                    # polluted with synthesized rows in the merge.
                    empty_res = SuiteRunner(
                        self.spark, **self.runner_kwargs
                    ).validate(pdf, suite)
                    seg_rows = [
                        {
                            "group": "__empty_partition__",
                            "expectation_type": r.expectation_config[
                                "expectation_type"
                            ],
                            "success": bool(r.success),
                            "element_count": int(
                                (r.result or {}).get("element_count") or 0
                            ),
                            "missing_count": int(
                                (r.result or {}).get("missing_count") or 0
                            ),
                            "unexpected_count": int(
                                (r.result or {}).get("unexpected_count")
                                or 0
                            ),
                            # plain str like validate_by_group's agg rows
                            # (one encoding per column across the store);
                            # None stays SQL NULL
                            "observed_value": (
                                str(ov) if (ov := (r.result or {}).get(
                                    "observed_value")) is not None else None
                            ),
                        }
                        for r in empty_res.results
                    ]
                elapsed = time.monotonic() - t0
                per_seg_ec: dict[Any, int] = {}
                violations = 0
                for r in seg_rows:
                    per_seg_ec[r["group"]] = max(
                        per_seg_ec.get(r["group"], 0),
                        int(r["element_count"] or 0),
                    )
                    violations += int(r["unexpected_count"] or 0)
                ok = all(bool(r["success"]) for r in seg_rows)
                rows_scanned = sum(per_seg_ec.values())
                with write_lock:
                    self._append_segment_evrs(run_id, pid, seg_rows)
                    self._append_manifest(
                        {
                            "run_id": run_id,
                            "partition_id": pid,
                            "status": "validated",
                            "suite_hash": shash,
                            "rows_scanned": rows_scanned,
                            "violations": violations,
                            "elapsed_s": elapsed,
                            "success": ok,
                        }
                    )
                return PartitionRunRecord(
                    partition_id=pid,
                    status="validated",
                    rows_scanned=rows_scanned,
                    violations=violations,
                    elapsed_s=elapsed,
                    segments=n_segments,
                    segmented_success=ok,
                )

            runner = SuiteRunner(
                self.spark, violations_path=vpath, **self.runner_kwargs
            )
            result = runner.validate(pdf, suite)
            elapsed = time.monotonic() - t0

            rows_scanned = 0
            violations = 0
            for r in result.results:
                res = r.result or {}
                rows_scanned = max(rows_scanned, int(res.get("element_count") or 0))
                violations += int(res.get("unexpected_count") or 0)

            with write_lock:
                self._append_evrs(run_id, pid, result)
                self._append_manifest(
                    {
                        "run_id": run_id,
                        "partition_id": pid,
                        "status": "validated",
                        "suite_hash": shash,
                        "rows_scanned": rows_scanned,
                        "violations": violations,
                        "elapsed_s": elapsed,
                        "success": bool(result.success),
                    }
                )
            return PartitionRunRecord(
                partition_id=pid,
                status="validated",
                result=result,
                rows_scanned=rows_scanned,
                violations=violations,
                elapsed_s=elapsed,
            )

        todo: list[Any] = []
        for pv in partition_values:
            pid = str(pv)
            if pid in done:
                out.records.append(
                    PartitionRunRecord(
                        partition_id=pid,
                        status="skipped",
                        manifest_success=done[pid],
                    )
                )
                continue
            todo.append(pv)

        if max_concurrent_partitions <= 1:
            for pv in todo:
                if fail_partition is not None and str(pv) == str(fail_partition):
                    raise RuntimeError(
                        f"simulated kill before partition {pv!r} (test hook)"
                    )
                out.records.append(run_partition(pv))
        else:
            if fail_partition is not None:
                raise ValueError(
                    "fail_partition (test hook) requires sequential mode"
                )
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=max_concurrent_partitions) as pool:
                for rec in pool.map(run_partition, todo):
                    out.records.append(rec)
        return out

    # ------------------------------------------------------------- merge view
    def _committed_rows(
        self, evrs: DataFrame, shash: str | None = None
    ) -> DataFrame:
        """Restrict an EVR frame to MANIFEST-COMMITTED rows: per partition,
        the latest ``status=validated`` manifest row AMONG THE RUNS PRESENT
        IN THIS STORE names the one ``run_id`` whose EVRs count. The
        manifest append is the commit point (EVRs are written first, inside
        the same lock) — a process killed between the two appends leaves
        orphan EVR rows that a resumed run re-validates, and summing both
        sets would double every counter for that partition.

        "Among the runs present in this store" matters: the manifest is
        deliberately shareable across modes and suites (the segment-salted
        suite hash exists precisely so a whole-partition run and a
        segmented run of the same suite share one manifest without
        cross-skipping, each with its OWN EVR store). Picking the latest
        validated run across the whole manifest would name the other
        store's run_id and semi-join this store down to nothing — so the
        candidate set is intersected with this store's (partition, run)
        pairs first. ``shash`` optionally narrows the manifest rows to one
        suite hash. The join side is tiny (one row per partition) and
        broadcast."""
        validated = self.read_manifest().filter(
            F.col("status") == "validated"
        )
        if shash is not None:
            validated = validated.filter(F.col("suite_hash") == shash)
        pairs = evrs.select("partition_id", "run_id").distinct()
        latest = (
            pairs.join(
                validated.select("partition_id", "run_id", "finished_ts"),
                on=["partition_id", "run_id"],
            )
            .groupBy("partition_id")
            .agg(F.max_by("run_id", "finished_ts").alias("run_id"))
        )
        return evrs.join(
            F.broadcast(latest), on=["partition_id", "run_id"],
            how="left_semi",
        )

    @staticmethod
    def _resolve_shash(shash_or_suite: Any) -> str | None:
        if shash_or_suite is None:
            return None
        if isinstance(shash_or_suite, str):
            return shash_or_suite
        return suite_hash(shash_or_suite)

    def merged_map_verdicts(self, shash_or_suite: Any = None) -> DataFrame:
        """Suite-level merged counters per expectation_type from the EVR
        store — counts add across partitions (SURVEY.md §4.2 item 5).
        Only manifest-committed rows participate (``_committed_rows``);
        passing the suite (or its hash) additionally pins the commit
        lookup to that suite's manifest rows."""
        if self.evr_path is None:
            raise ValueError("Checkpoint was created without evr_path")
        evrs = self._committed_rows(
            self.spark.read.schema(EVR_ROW_SCHEMA).parquet(self.evr_path),
            shash=self._resolve_shash(shash_or_suite),
        )
        return (
            evrs.groupBy("expectation_type")
            .agg(
                F.sum("element_count").alias("element_count"),
                F.sum("missing_count").alias("missing_count"),
                F.sum("unexpected_count").alias("unexpected_count"),
                F.min(F.col("success").cast("int")).cast("boolean").alias(
                    "all_partitions_success"
                ),
            )
            .orderBy("expectation_type")
        )

    def merged_segment_verdicts(
        self, shash_or_suite: Any = None, segment_col: str | None = None
    ) -> DataFrame:
        """Per-(segment × expectation_type) merged counters from a
        segmented-mode EVR store: counts add across partitions, so a
        resumed multi-partition run re-derives the same per-segment
        suite-level numbers a single whole-table ``validate_by_group``
        produces (tests assert the equivalence).

        Exactness caveat (inherent to per-partition validation, not to
        the merge): map/aggregate counters add exactly; uniqueness and
        window (increasing/decreasing) counters add exactly ONLY when the
        checkpoint's partition column does not split a key group — a
        duplicate pair or a lag window straddling two partitions is
        counted per partition, which is the declared semantics of
        partition-granularity validation everywhere in this engine.

        Only manifest-committed rows participate (``_committed_rows``):
        EVR rows orphaned by a kill between the EVR append and the
        manifest append are superseded by the resumed run's committed
        set, never double-counted.

        Pinning the commit lookup to one segmented run's manifest rows
        (optional): pass the SUITE plus ``segment_col`` — the salted hash
        is derived here — or the ALREADY-SALTED hash string from
        ``CheckpointRunResult.suite_hash`` alone. A suite without
        ``segment_col`` raises (the segmented manifest only ever holds
        salted hashes, so the unsalted hash would silently match nothing
        and empty the view); a string is never re-salted (double-salting
        would do the same)."""
        if self.evr_path is None:
            raise ValueError("Checkpoint was created without evr_path")
        shash = self._resolve_shash(shash_or_suite)
        if shash is None and segment_col is not None:
            raise ValueError(
                "segment_col= without the suite pins nothing — pass "
                "merged_segment_verdicts(suite, segment_col=...) or the "
                "already-salted CheckpointRunResult.suite_hash"
            )
        if shash is not None and not isinstance(shash_or_suite, str):
            if segment_col is None:
                raise ValueError(
                    "merged_segment_verdicts(suite) needs segment_col= to "
                    "derive the segment-salted manifest hash — or pass "
                    "CheckpointRunResult.suite_hash (already salted) "
                    "instead of the suite"
                )
            shash = salted_suite_hash(shash, segment_col)
        elif isinstance(shash_or_suite, str) and segment_col is not None:
            raise ValueError(
                "pass EITHER the already-salted hash string OR the suite "
                "plus segment_col — a string is never re-salted"
            )
        evrs = self._committed_rows(
            self.spark.read.schema(SEGMENT_EVR_ROW_SCHEMA).parquet(
                self.evr_path
            ),
            shash=shash,
        )
        return (
            evrs.groupBy("segment", "expectation_type")
            .agg(
                F.sum("element_count").alias("element_count"),
                F.sum("missing_count").alias("missing_count"),
                F.sum("unexpected_count").alias("unexpected_count"),
                F.min(F.col("success").cast("int")).cast("boolean").alias(
                    "all_partitions_success"
                ),
            )
            .orderBy("segment", "expectation_type")
        )
