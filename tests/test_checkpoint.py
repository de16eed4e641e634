"""Checkpoint/resume tests (SURVEY.md §7.2 M8: kill/resume pytest).

Reference analogue: Checkpoint.run produces one validation result per
batch; ours produces per-partition EVRs + a manifest, and a second run
must skip everything already validated (the resumability contract in
north_rule).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from great_expectations_spark import ExpectationSuite
from great_expectations_spark.checkpoint import (
    Checkpoint,
    merge_map_counts,
    suite_hash,
)


@pytest.fixture()
def suite():
    s = ExpectationSuite("ckpt-suite")
    s.add("expect_column_values_to_not_be_null", column="text", mostly=0.5)
    s.add("expect_column_values_to_be_between", column="turn_idx",
          min_value=0, max_value=100)
    return s


@pytest.fixture()
def tdf(spark):
    rows = []
    for part in ("2025-01-01", "2025-01-02", "2025-01-03"):
        for i in range(10):
            rows.append((f"c-{part}-{i % 3}", i, "user",
                         None if i == 9 else f"msg {i}", part))
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, day string"
    )


def test_full_run_then_resume_skips_all(spark, tmp_path, suite, tdf):
    ck = Checkpoint(spark, manifest_path=str(tmp_path / "manifest"),
                    evr_path=str(tmp_path / "evrs"))
    r1 = ck.run(tdf, suite, run_id="r1", partition_col="day")
    assert len(r1.validated) == 3 and not r1.skipped
    assert r1.success

    r2 = ck.run(tdf, suite, run_id="r2", partition_col="day")
    assert len(r2.skipped) == 3 and not r2.validated


def test_kill_and_resume(spark, tmp_path, suite, tdf):
    ck = Checkpoint(spark, manifest_path=str(tmp_path / "manifest"))
    with pytest.raises(RuntimeError, match="simulated kill"):
        ck.run(tdf, suite, run_id="r1", partition_col="day",
               fail_partition="2025-01-03")
    # two partitions made it into the manifest before the kill
    assert len(ck.completed_partitions(suite_hash(suite))) == 2

    r2 = ck.run(tdf, suite, run_id="r2", partition_col="day")
    assert len(r2.skipped) == 2
    assert [r.partition_id for r in r2.validated] == ["2025-01-03"]


def test_suite_change_invalidates_manifest(spark, tmp_path, suite, tdf):
    ck = Checkpoint(spark, manifest_path=str(tmp_path / "manifest"))
    ck.run(tdf, suite, run_id="r1", partition_col="day")

    other = ExpectationSuite("ckpt-suite-2")
    other.add("expect_column_values_to_not_be_null", column="conv_id")
    assert suite_hash(other) != suite_hash(suite)
    r2 = ck.run(tdf, other, run_id="r2", partition_col="day")
    assert len(r2.validated) == 3  # different suite → nothing skipped


def test_manifest_lineage_fields(spark, tmp_path, suite, tdf):
    ck = Checkpoint(spark, manifest_path=str(tmp_path / "manifest"))
    ck.run(tdf, suite, run_id="r1", partition_col="day")
    m = ck.read_manifest().collect()
    assert len(m) == 3
    for row in m:
        assert row["run_id"] == "r1"
        assert row["status"] == "validated"
        assert row["rows_scanned"] == 10
        assert row["elapsed_s"] > 0
        assert row["violations"] >= 1  # one null-text row per partition


def test_merged_verdicts_equal_whole_table_counts(spark, tmp_path, suite, tdf):
    ck = Checkpoint(spark, manifest_path=str(tmp_path / "manifest"),
                    evr_path=str(tmp_path / "evrs"))
    ck.run(tdf, suite, run_id="r1", partition_col="day")
    merged = {
        r["expectation_type"]: r for r in ck.merged_map_verdicts(suite).collect()
    }
    nn = merged["expect_column_values_to_not_be_null"]
    assert nn["element_count"] == 30
    assert nn["unexpected_count"] == 3  # one null per partition


def test_merge_map_counts_reapplies_mostly():
    parts = [
        {"element_count": 100, "missing_count": 0, "unexpected_count": 4},
        {"element_count": 100, "missing_count": 0, "unexpected_count": 0},
    ]
    merged = merge_map_counts(parts, mostly=0.97)
    assert merged["unexpected_count"] == 4
    # 196/200 = 0.98 >= 0.97 → success even though partition 1 alone was 0.96
    assert merged["success"] is True
    assert merge_map_counts(parts, mostly=0.99)["success"] is False


def test_concurrent_partition_run_matches_sequential(spark, tmp_path):
    """max_concurrent_partitions>1 must produce the same manifest/EVR state
    and per-partition results as the sequential path, and resume cleanly."""
    from pyspark.sql import functions as F

    from great_expectations_spark import ExpectationSuite
    from great_expectations_spark.checkpoint import Checkpoint
    from great_expectations_spark.schema import generate_transcripts

    tdf = generate_transcripts(spark, n_turns=4_000, seed=11).withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(4))
    )
    suite = ExpectationSuite("cc")
    suite.add("expect_column_values_to_not_be_null", column="text", mostly=0.9)
    suite.add("expect_column_mean_to_be_between", column="turn_idx",
              min_value=0, max_value=10_000)

    seq = Checkpoint(spark, manifest_path=str(tmp_path / "m_seq"),
                     evr_path=str(tmp_path / "e_seq"))
    conc = Checkpoint(spark, manifest_path=str(tmp_path / "m_conc"),
                      evr_path=str(tmp_path / "e_conc"))
    r_seq = seq.run(tdf, suite, run_id="r", partition_col="bucket")
    r_conc = conc.run(tdf, suite, run_id="r", partition_col="bucket",
                      max_concurrent_partitions=4)

    def summarize(res):
        return sorted(
            (rec.partition_id, rec.rows_scanned, rec.violations,
             rec.result.success)
            for rec in res.validated
        )

    assert summarize(r_seq) == summarize(r_conc)
    evr_seq = spark.read.parquet(str(tmp_path / "e_seq"))
    evr_conc = spark.read.parquet(str(tmp_path / "e_conc"))
    cols = ["partition_id", "expectation_type", "success",
            "element_count", "unexpected_count"]
    assert sorted(map(tuple, evr_seq.select(*cols).collect())) == \
        sorted(map(tuple, evr_conc.select(*cols).collect()))

    # resume: everything skipped on a re-run (concurrent mode too)
    r2 = conc.run(tdf, suite, run_id="r2", partition_col="bucket",
                  max_concurrent_partitions=4)
    assert len(r2.skipped) == 4 and not r2.validated


def test_violations_path_stale_layout_refused(spark, tmp_path, suite, tdf):
    """Round-3 guard: a pre-change violations root holding top-level
    expectation=<type>/ dirs must be refused — appending the new
    partition_id=<pid>/ layout on top would mix two directory depths and
    make the whole root unreadable."""
    import os

    vroot = tmp_path / "violations"
    (vroot / "expectation=expect_column_values_to_not_be_null").mkdir(
        parents=True
    )
    ck = Checkpoint(
        spark,
        manifest_path=str(tmp_path / "manifest"),
        violations_path=str(vroot),
    )
    with pytest.raises(ValueError, match="stale top-level expectation="):
        ck.run(tdf, suite, run_id="r1", partition_col="day")

    # a fresh root (or the new layout itself) is accepted
    ck2 = Checkpoint(
        spark,
        manifest_path=str(tmp_path / "manifest2"),
        violations_path=str(tmp_path / "violations2"),
    )
    out = ck2.run(tdf, suite, run_id="r1", partition_col="day")
    assert len(out.validated) == 3
    # re-running against the now-populated partition_id= layout still works
    out2 = ck2.run(tdf, suite, run_id="r2", partition_col="day")
    assert len(out2.skipped) == 3


def test_resumed_run_reports_failed_skipped_partitions(spark, tmp_path, tdf):
    """A resume that skips previously-FAILING partitions must not report
    success=True just because nothing re-ran (round-3 fix: skipped records
    now carry the manifest verdict)."""
    failing = ExpectationSuite("always-fails")
    failing.add("expect_column_values_to_be_between", column="turn_idx",
                min_value=100, max_value=200)  # all rows violate
    ck = Checkpoint(spark, manifest_path=str(tmp_path / "m"))
    first = ck.run(tdf, failing, run_id="r1", partition_col="day")
    assert first.success is False and len(first.validated) == 3

    resumed = ck.run(tdf, failing, run_id="r2", partition_col="day")
    assert len(resumed.skipped) == 3
    assert all(r.manifest_success is False for r in resumed.skipped)
    assert resumed.success is False


# ---------------------------------------------------------------- segmented


@pytest.fixture()
def seg_suite():
    s = ExpectationSuite("seg-ckpt")
    s.add("expect_column_values_to_not_be_null", column="text", mostly=0.5)
    s.add("expect_column_values_to_be_unique", column="conv_id")
    return s


def test_segmented_checkpoint_kill_resume_equals_single_run(
    spark, tmp_path, seg_suite, tdf
):
    """Kill/resume WITH segments (round 5): a killed segmented run resumes
    at partition granularity, and the merged per-segment verdicts from the
    resumed EVR store equal a single whole-table validate_by_group."""
    from great_expectations_spark import validate_by_group

    ck = Checkpoint(spark, manifest_path=str(tmp_path / "m"),
                    evr_path=str(tmp_path / "evr"))
    with pytest.raises(RuntimeError, match="simulated kill"):
        ck.run(tdf, seg_suite, run_id="r1", partition_col="day",
               segment_col="role", fail_partition="2025-01-03")

    r2 = ck.run(tdf, seg_suite, run_id="r2", partition_col="day",
                segment_col="role")
    assert len(r2.skipped) == 2
    assert [r.partition_id for r in r2.validated] == ["2025-01-03"]
    assert all(r.segments == 1 for r in r2.validated)  # one role value

    merged = {
        (r["segment"], r["expectation_type"]): r
        for r in ck.merged_segment_verdicts().collect()
    }
    single = {
        (r["group"], r["expectation_type"]): r
        for r in validate_by_group(tdf, seg_suite, "role").collect()
    }
    assert set(merged) == set(single)
    for k, m in merged.items():
        s = single[k]
        assert m["element_count"] == s["element_count"], k
        assert m["missing_count"] == s["missing_count"], k
        # conv_id repeats across days WITHIN a partition only (ids embed
        # the day), so per-partition unexpected counts add cleanly here
        assert m["unexpected_count"] == s["unexpected_count"], k


def test_segmented_and_whole_runs_never_cross_skip(spark, tmp_path, suite,
                                                   tdf):
    """The suite hash is salted with the segment column: a finished
    whole-partition run must NOT mark the segmented run's partitions done
    (and vice versa)."""
    ck = Checkpoint(spark, manifest_path=str(tmp_path / "m"))
    ck.run(tdf, suite, run_id="r1", partition_col="day")
    r2 = ck.run(tdf, suite, run_id="r2", partition_col="day",
                segment_col="role")
    assert len(r2.validated) == 3 and not r2.skipped


def test_segmented_refuses_whole_partition_evr_store(spark, tmp_path, suite,
                                                     tdf):
    """Appending segmented rows (extra `segment` column) into a
    whole-partition EVR store would null-fill on read — must raise."""
    ck = Checkpoint(spark, manifest_path=str(tmp_path / "m"),
                    evr_path=str(tmp_path / "evr"))
    ck.run(tdf, suite, run_id="r1", partition_col="day")
    with pytest.raises(ValueError, match="segment"):
        ck.run(tdf, suite, run_id="r2", partition_col="day",
               segment_col="role")


def test_segmented_checkpoint_failure_verdict(spark, tmp_path, tdf):
    """A failing segment fails its partition's manifest row AND the run
    verdict — including on resume (skipped partitions keep their recorded
    failure)."""
    s = ExpectationSuite("failing")
    s.add("expect_column_values_to_not_be_null", column="text")  # 1 null/day
    ck = Checkpoint(spark, manifest_path=str(tmp_path / "m"),
                    evr_path=str(tmp_path / "evr"))
    r1 = ck.run(tdf, s, run_id="r1", partition_col="day", segment_col="role")
    assert not r1.success
    assert all(r.segmented_success is False for r in r1.validated)
    r2 = ck.run(tdf, s, run_id="r2", partition_col="day", segment_col="role")
    assert len(r2.skipped) == 3 and not r2.success


def test_whole_run_refuses_segmented_evr_store(spark, tmp_path, seg_suite,
                                               suite, tdf):
    """The shape guard is symmetric (round-5 review fix): a whole-partition
    run into an existing SEGMENTED store is refused — its rows would
    null-fill `segment` on read and merge into the genuinely-NULL segment
    group, silently inflating those counters."""
    ck = Checkpoint(spark, manifest_path=str(tmp_path / "m"),
                    evr_path=str(tmp_path / "evr"))
    ck.run(tdf, seg_suite, run_id="r1", partition_col="day",
           segment_col="role")
    with pytest.raises(ValueError, match="segmented EVR rows"):
        ck.run(tdf, suite, run_id="r2", partition_col="day")


def test_merged_segment_verdicts_ignore_orphan_evrs(spark, tmp_path,
                                                    seg_suite, tdf):
    """A kill BETWEEN the EVR append and the manifest append leaves orphan
    EVR rows; the resumed run re-validates the partition and appends a
    second full set. The merge must count ONLY manifest-committed rows
    (round-5 review fix), or every counter of that partition doubles."""
    from great_expectations_spark import validate_by_group

    ck = Checkpoint(spark, manifest_path=str(tmp_path / "m"),
                    evr_path=str(tmp_path / "evr"))
    r1 = ck.run(tdf, seg_suite, run_id="r1", partition_col="day",
                segment_col="role")
    assert r1.success is not None

    # simulate the torn write: EVR rows committed, manifest row lost
    orphan_rows = validate_by_group(
        tdf.filter(F.col("day") == "2025-01-02"), seg_suite, "role"
    ).collect()
    ck._append_segment_evrs("r-orphan", "2025-01-02", orphan_rows)

    merged = {
        (r["segment"], r["expectation_type"]): r
        for r in ck.merged_segment_verdicts().collect()
    }
    single = {
        (r["group"], r["expectation_type"]): r
        for r in validate_by_group(tdf, seg_suite, "role").collect()
    }
    assert set(merged) == set(single)
    for k, m in merged.items():
        assert m["element_count"] == single[k]["element_count"], k
        assert m["unexpected_count"] == single[k]["unexpected_count"], k


def test_shared_manifest_does_not_wipe_merge_views(spark, tmp_path,
                                                   seg_suite, tdf):
    """The manifest is deliberately shareable across modes (segment-salted
    suite hashes prevent cross-skip), each mode with its OWN EVR store.
    The commit lookup must pick the latest validated run AMONG THE RUNS
    PRESENT IN EACH STORE — picking the manifest-wide latest would name
    the other store's run_id and semi-join a store down to nothing
    (round-5 second-review fix)."""
    m = str(tmp_path / "m")
    ck_whole = Checkpoint(spark, manifest_path=m,
                          evr_path=str(tmp_path / "e_whole"))
    ck_seg = Checkpoint(spark, manifest_path=m,
                        evr_path=str(tmp_path / "e_seg"))
    ck_whole.run(tdf, seg_suite, run_id="r-whole", partition_col="day")
    ck_seg.run(tdf, seg_suite, run_id="r-seg", partition_col="day",
               segment_col="role")

    whole = ck_whole.merged_map_verdicts(seg_suite).collect()
    assert len(whole) == 2                      # both expectations survive
    assert all(r["element_count"] == 30 for r in whole)
    seg = ck_seg.merged_segment_verdicts().collect()
    assert len(seg) == 2                        # one role value x 2 checks
    assert all(r["element_count"] == 30 for r in seg)


def test_empty_partition_segmented_honors_row_count_guard(spark, tmp_path,
                                                          tdf):
    """An empty partition yields zero segments; the WHOLE suite must still
    evaluate against the empty frame (whole-partition parity: map kinds
    succeed vacuously, a row-count floor FAILS instead of the partition
    being vacuously marked passed), recorded with real counters under the
    reserved "__empty_partition__" segment — never NULL, which is a
    legitimate segment value other partitions may genuinely hold."""
    s = ExpectationSuite("empty-guard")
    s.add("expect_column_values_to_not_be_null", column="text", mostly=0.5)
    s.add("expect_table_row_count_to_be_between", min_value=1)
    ck = Checkpoint(spark, manifest_path=str(tmp_path / "m"),
                    evr_path=str(tmp_path / "evr"))
    res = ck.run(tdf, s, run_id="r1", partition_col="day",
                 partition_values=["2025-01-01", "2099-12-31"],
                 segment_col="role")
    by_pid = {r.partition_id: r for r in res.records}
    assert by_pid["2025-01-01"].segmented_success is True
    ghost = by_pid["2099-12-31"]
    assert ghost.segments == 0
    assert ghost.segmented_success is False     # row-count floor fired
    assert res.success is False
    # every verdict visible in the store under the reserved segment, with
    # the runner's real observed value explaining the failure
    rows = {r["expectation_type"]: r for r in spark.read.parquet(
        str(tmp_path / "evr")).filter(
        F.col("partition_id") == "2099-12-31").collect()}
    assert len(rows) == 2
    assert all(r["segment"] == "__empty_partition__" for r in rows.values())
    rc = rows["expect_table_row_count_to_be_between"]
    assert rc["success"] is False and rc["observed_value"] == "0"
    assert rows["expect_column_values_to_not_be_null"]["success"] is True


def test_merged_segment_verdicts_salting_semantics(spark, tmp_path,
                                                   seg_suite, tdf):
    """Pinning the segmented merge to one suite: suite + segment_col works
    (hash salted once, here); the already-salted string works alone; a
    suite WITHOUT segment_col raises (unsalted hash would silently match
    nothing), and string + segment_col raises (never re-salt)."""
    ck = Checkpoint(spark, manifest_path=str(tmp_path / "m"),
                    evr_path=str(tmp_path / "evr"))
    res = ck.run(tdf, seg_suite, run_id="r1", partition_col="day",
                 segment_col="role")
    n = len(ck.merged_segment_verdicts().collect())
    assert n > 0
    assert len(ck.merged_segment_verdicts(
        seg_suite, segment_col="role").collect()) == n
    assert len(ck.merged_segment_verdicts(res.suite_hash).collect()) == n
    with pytest.raises(ValueError, match="segment_col"):
        ck.merged_segment_verdicts(seg_suite)
    with pytest.raises(ValueError, match="never re-salted"):
        ck.merged_segment_verdicts(res.suite_hash, segment_col="role")
    with pytest.raises(ValueError, match="pins nothing"):
        ck.merged_segment_verdicts(segment_col="role")


def test_reserved_empty_partition_segment_value_refused(spark, tmp_path,
                                                        seg_suite):
    """A genuine segment named '__empty_partition__' would merge with
    synthesized empty-partition verdict rows — refused loudly."""
    df = spark.createDataFrame(
        [("c1", 0, "__empty_partition__", "hello", "d1")],
        "conv_id string, turn_idx int, role string, text string, day string",
    )
    ck = Checkpoint(spark, manifest_path=str(tmp_path / "m"),
                    evr_path=str(tmp_path / "evr"))
    with pytest.raises(ValueError, match="reserved"):
        ck.run(df, seg_suite, run_id="r1", partition_col="day",
               segment_col="role")


def test_contiguous_concurrent_partitions_pair_correct_stats(spark,
                                                             tmp_path):
    """The per-group stats stash is keyed per frame (compiled objects are
    plan-cache-shared across threads): concurrent partitions must each
    join their OWN stats — wrong pairing would sink phantom violations."""
    rows = []
    for day, bad in (("d1", True), ("d2", False)):
        for conv in range(4):
            idxs = [0, 2, 3] if (bad and conv == 0) else [0, 1, 2]
            rows += [(f"{day}-c{conv}", i, day) for i in idxs]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, day string")
    s = ExpectationSuite("contig")
    s.add("expect_column_values_to_be_contiguous", column="turn_idx",
          group_by=["conv_id"], start=0)
    vpath = str(tmp_path / "viol")
    ck = Checkpoint(spark, manifest_path=str(tmp_path / "m"),
                    evr_path=str(tmp_path / "evr"), violations_path=vpath,
                    unexpected_index_column_names=["conv_id"])
    res = ck.run(df, s, run_id="r1", partition_col="day",
                 max_concurrent_partitions=2)
    assert len(res.validated) == 2
    viol = spark.read.parquet(vpath).collect()
    # exactly the broken d1 conversation's rows — nothing from d2
    assert {r["conv_id"] for r in viol} == {"d1-c0"}
    assert len(viol) == 3
