"""Sources: BatchSpec readers, splitters, samplers (SURVEY.md §2.1–2.2).

Semantics checks are exact (predicates are pure row functions); the splitter
partition test asserts that the splits form a disjoint cover of the table —
the property the per-partition checkpoint runner depends on.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F, types as T

from great_expectations_spark.sources import BatchSpec, read_batch, samplers, splitters

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


@pytest.fixture(scope="module")
def tdf(spark):
    rows = []
    for i in range(200):
        rows.append(
            (
                f"conv-{i % 7}",
                i,
                ["user", "assistant"][i % 2],
                dt.datetime(2025, 1 + (i % 12), 1 + (i % 27), i % 24),
            )
        )
    return spark.createDataFrame(rows, SCHEMA)


# ------------------------------------------------------------------ batch

def test_read_batch_runtime_df(spark, tdf):
    spec = BatchSpec(dataframe=tdf)
    assert read_batch(spark, spec) is tdf


def test_read_batch_parquet_roundtrip(spark, tdf, tmp_path):
    p = str(tmp_path / "t.parquet")
    tdf.write.parquet(p)
    spec = BatchSpec(path=p, reader_method="parquet")
    assert read_batch(spark, spec).count() == 200


def test_read_batch_csv_with_options(spark, tdf, tmp_path):
    p = str(tmp_path / "t.csv")
    tdf.select("conv_id", "turn_idx").write.option("header", True).csv(p)
    spec = BatchSpec(
        path=p, reader_method="csv",
        reader_options={"header": True, "inferSchema": True},
    )
    out = read_batch(spark, spec)
    assert out.count() == 200 and set(out.columns) == {"conv_id", "turn_idx"}


def test_read_batch_with_splitter_and_sampler(spark, tdf):
    spec = BatchSpec(
        dataframe=tdf,
        splitter_method="split_on_column_value",
        splitter_kwargs={
            "column": "conv_id", "batch_identifiers": {"conv_id": "conv-0"}
        },
        sampling_method="sample_using_mod",
        sampling_kwargs={"column": "turn_idx", "mod": 2, "value": 0},
    )
    out = read_batch(spark, spec)
    rows = out.collect()
    assert rows and all(r.conv_id == "conv-0" and r.turn_idx % 2 == 0 for r in rows)


def test_batch_spec_validates_exactly_one_source():
    with pytest.raises(ValueError):
        BatchSpec()
    with pytest.raises(ValueError):
        BatchSpec(path="/x", table="t")


# --------------------------------------------------------------- splitters

def _cover_check(tdf, ids, split_fn):
    """Splits must be pairwise-disjoint and union back to the full table."""
    total = 0
    for bi in ids:
        total += split_fn(bi).count()
    assert total == tdf.count()


def test_split_on_column_value_covers(tdf):
    ids = splitters.list_split_values(tdf, "split_on_column_value", "conv_id")
    assert len(ids) == 7
    _cover_check(
        tdf, ids,
        lambda bi: splitters.split_on_column_value(tdf, "conv_id", bi),
    )


def test_split_on_year_and_month(tdf):
    ids = splitters.list_split_values(
        tdf, "split_on_year_and_month", "ts", date_parts=["year", "month"]
    )
    assert all(set(b["ts"]) == {"year", "month"} for b in ids)
    _cover_check(
        tdf, ids, lambda bi: splitters.split_on_year_and_month(tdf, "ts", bi)
    )
    one = splitters.split_on_year_and_month(
        tdf, "ts", {"ts": {"year": 2025, "month": 3}}
    )
    assert all(r.ts.month == 3 for r in one.collect())


def test_split_on_mod_and_divided_integer(tdf):
    ids = splitters.list_split_values(tdf, "split_on_mod_integer", "turn_idx", mod=5)
    assert [b["turn_idx"] for b in ids] == [0, 1, 2, 3, 4]
    _cover_check(
        tdf, ids,
        lambda bi: splitters.split_on_mod_integer(tdf, "turn_idx", 5, bi),
    )
    ids = splitters.list_split_values(
        tdf, "split_on_divided_integer", "turn_idx", divisor=50
    )
    assert [b["turn_idx"] for b in ids] == [0, 1, 2, 3]
    _cover_check(
        tdf, ids,
        lambda bi: splitters.split_on_divided_integer(tdf, "turn_idx", 50, bi),
    )


def test_split_on_hashed_column_covers(tdf):
    ids = splitters.list_split_values(
        tdf, "split_on_hashed_column", "conv_id", hash_digits=1
    )
    _cover_check(
        tdf, ids,
        lambda bi: splitters.split_on_hashed_column(tdf, "conv_id", 1, bi),
    )


def test_split_on_multi_column_values(tdf):
    ids = splitters.list_split_values(
        tdf, "split_on_multi_column_values", column_names=["conv_id", "role"]
    )
    assert len(ids) == 14
    _cover_check(
        tdf, ids,
        lambda bi: splitters.split_on_multi_column_values(
            tdf, ["conv_id", "role"], bi
        ),
    )


# ---------------------------------------------------------------- samplers

def test_sample_using_mod_exact(tdf):
    out = samplers.sample_using_mod(tdf, "turn_idx", 10, 3)
    assert sorted(r.turn_idx for r in out.collect()) == list(range(3, 200, 10))


def test_sample_using_a_list(tdf):
    out = samplers.sample_using_a_list(tdf, "conv_id", ["conv-1", "conv-2"])
    assert out.count() == tdf.filter(F.col("conv_id").isin("conv-1", "conv-2")).count()


def test_sample_using_random_deterministic(tdf):
    a = samplers.sample_using_random(tdf, 0.3, seed=7).collect()
    b = samplers.sample_using_random(tdf, 0.3, seed=7).collect()
    assert a == b and 0 < len(a) < 200
    with pytest.raises(ValueError):
        samplers.sample_using_random(tdf, 0.3, seed=None)


def test_sample_using_hash_matches_hashlib(tdf):
    """Native F.md5 must agree with the reference's hashlib semantics."""
    import hashlib

    out = samplers.sample_using_hash(tdf, "conv_id", hash_digits=1, hash_value="a")
    got = {r.conv_id for r in out.select("conv_id").distinct().collect()}
    want = {
        f"conv-{i}"
        for i in range(7)
        if hashlib.md5(f"conv-{i}".encode()).hexdigest().endswith("a")
    }
    assert got == want


def test_sample_using_limit(tdf):
    assert samplers.sample_using_limit(tdf, 13).count() == 13


def test_sample_using_stratified(tdf):
    out = samplers.sample_using_stratified(
        tdf, "conv_id", {"conv-0": 1.0, "conv-1": 0.0}, seed=11
    )
    got = {r.conv_id for r in out.select("conv_id").distinct().collect()}
    assert got == {"conv-0"}  # fraction 1.0 keeps all, 0.0/absent drop all
    assert out.count() == tdf.filter(F.col("conv_id") == "conv-0").count()
    with pytest.raises(ValueError):
        samplers.sample_using_stratified(tdf, "conv_id", {"conv-0": 1.0}, seed=None)


def test_sample_stratified_exact(tdf):
    """Exactly n per stratum; selection is content-stable (smallest md5 of
    the id within the stratum) so re-runs and other engines agree."""
    import hashlib

    out = samplers.sample_stratified_exact(tdf, "conv_id", 3, "turn_idx")
    rows = out.select("conv_id", "turn_idx").collect()
    per = {}
    for r in rows:
        per.setdefault(r.conv_id, []).append(r.turn_idx)
    assert all(len(v) == 3 for v in per.values())
    # replicate the md5 ranking for one stratum in pure python
    stratum = sorted(
        (r.turn_idx for r in tdf.filter(F.col("conv_id") == "conv-0")
         .select("turn_idx").collect()),
        key=lambda t: (hashlib.md5(str(t).encode()).hexdigest(), t),
    )[:3]
    assert sorted(per["conv-0"]) == sorted(stratum)


# ------------------------------------------------------- filesystem connector

def test_discover_filesystem_batches(spark, tmp_path):
    """Path-regex batch discovery (DataConnector analog): capture groups
    become batch_identifiers; filtering and stable ordering; discovered
    batch loads through read_batch."""
    from great_expectations_spark.sources.connectors import (
        discover_filesystem_batches,
    )
    from great_expectations_spark.sources.batch import read_batch

    base = tmp_path / "lake"
    for ym, n in (("2024-01", 3), ("2024-02", 5), ("2025-01", 2)):
        d = base / f"events_{ym}"
        spark.range(n).coalesce(1).write.mode("overwrite").parquet(str(d))
    # also a non-matching directory that must be ignored
    (base / "README.txt").parent.mkdir(parents=True, exist_ok=True)
    (base / "README.txt").write_text("not a batch")

    defs = discover_filesystem_batches(
        spark,
        str(base),
        regex=r"events_(\d{4})-(\d{2})/part-.*\.parquet$",
        group_names=["year", "month"],
        recursive=True,
    )
    ids = [d.batch_identifiers for d in defs]
    assert ids == [
        {"year": "2024", "month": "01"},
        {"year": "2024", "month": "02"},
        {"year": "2025", "month": "01"},
    ]

    only_2024 = discover_filesystem_batches(
        spark, str(base),
        regex=r"events_(\d{4})-(\d{2})/part-.*\.parquet$",
        group_names=["year", "month"],
        recursive=True,
        batch_identifiers={"year": "2024"},
    )
    assert len(only_2024) == 2

    df = read_batch(spark, only_2024[1].to_batch_spec("parquet"))
    assert df.count() == 5


def test_discover_filesystem_batches_group_mismatch(spark, tmp_path):
    from great_expectations_spark.sources.connectors import (
        discover_filesystem_batches,
    )

    with pytest.raises(ValueError):
        discover_filesystem_batches(
            spark, str(tmp_path), regex=r"(\d+)", group_names=["a", "b"]
        )


# -- DataSourceV2 formats (Delta / Iceberg) -------------------------------
#
# The connector jars are absent offline (SURVEY.md §7.4), so dispatch is
# verified with a recording stub standing in for SparkSession: read_batch
# only touches `spark.read`, so the stub proves exactly which reader chain
# (format/options/load vs options/table) a spec compiles to — the part that
# is ours; the jar does the rest on a real cluster.


class _RecordingReader:
    def __init__(self, log):
        self.log = log

    def format(self, m):
        self.log.append(("format", m))
        return self

    def options(self, **kw):
        if kw:
            self.log.append(("options", kw))
        return self

    def load(self, path):
        self.log.append(("load", path))
        return "df"

    def table(self, name):
        self.log.append(("table", name))
        return "df"


class _RecordingSpark:
    def __init__(self):
        self.log = []

    @property
    def read(self):
        return _RecordingReader(self.log)


def test_read_batch_delta_path_dispatch():
    fake = _RecordingSpark()
    out = read_batch(
        fake,
        BatchSpec(
            path="/data/t",
            reader_method="delta",
            reader_options={"versionAsOf": "3"},
        ),
    )
    assert out == "df"
    assert fake.log == [
        ("format", "delta"),
        ("options", {"versionAsOf": "3"}),
        ("load", "/data/t"),
    ]


def test_read_batch_iceberg_table_time_travel():
    fake = _RecordingSpark()
    read_batch(
        fake,
        BatchSpec(
            table="cat.db.transcripts",
            table_options={"snapshot-id": "10963874102873"},
        ),
    )
    assert fake.log == [
        ("options", {"snapshot-id": "10963874102873"}),
        ("table", "cat.db.transcripts"),
    ]


def test_batch_spec_table_options_require_table():
    with pytest.raises(ValueError):
        BatchSpec(path="/x", table_options={"snapshot-id": "1"})
