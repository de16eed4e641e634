"""Rule-Based Profiler analog + round-2 profile additions.

- multi-batch metrics in ONE Spark job (union + groupBy(batch_id));
- exact/quantile/bootstrap range estimators;
- end-to-end: profile k batches, emitted suite PASSES a holdout batch;
- auto (FD∨Sturges) and kde partition strategies;
- table/column head previews;
- JDBC batch-spec validation + reader dispatch.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from great_expectations_spark import RuleBasedProfiler, SuiteRunner
from great_expectations_spark.rule_based_profiler import (
    estimate_range,
    multi_batch_metrics,
)


def _batches(spark, k=4, n=400):
    """Deterministic batches with mild batch-to-batch drift."""
    out = []
    for i in range(k):
        df = (
            spark.range(i * n, (i + 1) * n)
            .select(
                F.col("id"),
                # n=400 is a whole number of 100-cycles → x's distribution
                # is IDENTICAL in every batch (stable-holdout invariant)
                (F.col("id") % 100).cast("double").alias("x"),
                ((F.col("id") * 37) % 5).cast("string").alias("cat"),
            )
        )
        out.append(df)
    return out


class TestEstimators:
    def test_exact(self):
        e = estimate_range([3.0, 1.0, 2.0], estimator="exact")
        assert (e.lo, e.hi) == (1.0, 3.0)

    def test_quantile_matches_numpy(self):
        v = [1.0, 2.0, 3.0, 4.0, 5.0]
        e = estimate_range(v, estimator="quantile", false_positive_rate=0.2)
        assert e.lo == pytest.approx(np.quantile(v, 0.1))
        assert e.hi == pytest.approx(np.quantile(v, 0.9))

    def test_bootstrap_seeded_and_contained(self):
        v = [10.0, 11.0, 9.0, 10.5, 10.2, 9.8]
        e1 = estimate_range(v, estimator="bootstrap", seed=7)
        e2 = estimate_range(v, estimator="bootstrap", seed=7)
        assert (e1.lo, e1.hi) == (e2.lo, e2.hi)
        assert min(v) <= e1.lo <= e1.hi <= max(v)

    def test_unknown_estimator(self):
        with pytest.raises(ValueError):
            estimate_range([1.0], estimator="magic")


def test_multi_batch_metrics_one_row_per_batch(spark):
    batches = _batches(spark, k=3)
    cols, rows = multi_batch_metrics(batches)
    assert len(rows) == 3
    assert all(r["n"] == 400 for r in rows)
    assert {"x__mean", "x__min", "x__max", "cat__approx_distinct"} <= set(rows[0])


def test_multi_batch_metrics_keeps_empty_batch_aligned(spark):
    """A zero-row batch must stay at its index (n=0), not silently vanish
    from the metric matrix (groupBy emits no row for it)."""
    b = _batches(spark, k=2)
    empty = b[0].limit(0)
    cols, rows = multi_batch_metrics([b[0], empty, b[1]])
    assert len(rows) == 3
    assert rows[1]["n"] == 0 and rows[1]["x__nn"] == 0
    assert rows[0]["n"] == 400 and rows[2]["n"] == 400
    assert rows[1]["x__mean"] is None

    prof = RuleBasedProfiler(estimator="exact")
    suite = prof.profile([b[0], empty, b[1]])
    rc = next(
        e for e in suite
        if e.expectation_type == "expect_table_row_count_to_be_between"
    )
    assert rc.kwargs["min_value"] == 0  # the empty batch drives the floor


def test_not_null_mostly_clamped_above_zero(spark):
    """A worst-batch non-null ratio in (0, 0.01) must not emit the vacuous
    mostly=0.0; it clamps to 0.01."""
    rows = [(i, "v" if i == 0 else None) for i in range(500)]
    b = spark.createDataFrame(rows, "id int, sparse string")
    suite = RuleBasedProfiler(estimator="exact").profile(
        [b, b], columns=["sparse"]
    )
    nn = next(
        e for e in suite
        if e.expectation_type == "expect_column_values_to_not_be_null"
    )
    assert nn.kwargs["mostly"] == 0.01


def test_suite_add_meta_is_sibling_not_kwarg(spark):
    """meta= routes to ExpectationConfiguration.meta, never into kwargs/id."""
    from great_expectations_spark.suite import ExpectationSuite

    s = ExpectationSuite("m")
    cfg = s.add(
        "expect_column_mean_to_be_between",
        column="x", min_value=0, max_value=1,
        meta={"rule_based_profiler": {"metric": "mean"}},
    )
    assert "meta" not in cfg.kwargs
    assert cfg.meta["rule_based_profiler"]["metric"] == "mean"
    bare = ExpectationSuite("m2").add(
        "expect_column_mean_to_be_between", column="x", min_value=0, max_value=1
    )
    assert cfg.id == bare.id  # meta excluded from identity


def test_profile_then_holdout_passes(spark):
    """The reference RBP promise: bounds estimated from k batches hold on a
    same-distribution holdout batch."""
    all_b = _batches(spark, k=5)
    train, holdout = all_b[:4], all_b[4]
    prof = RuleBasedProfiler(
        estimator="exact", value_set_columns=["cat"]
    )
    suite = prof.profile(train)
    types = [e.expectation_type for e in suite]
    assert "expect_table_row_count_to_be_between" in types
    assert "expect_column_mean_to_be_between" in types
    assert "expect_column_values_to_be_in_set" in types
    res = SuiteRunner(spark).validate(holdout, suite)
    failed_cols = {
        r.expectation_config["kwargs"].get("column")
        for r in res.results
        if not r.success
    }
    # id is a disjoint range per batch → its bounds MUST fail on the
    # holdout; every distribution-stable column must pass
    assert failed_cols == {"id"}, failed_cols
    per_col_ok = [
        r
        for r in res.results
        if r.expectation_config["kwargs"].get("column") in ("x", "cat")
    ]
    assert per_col_ok and all(r.success for r in per_col_ok)


def test_bootstrap_profile_widens_with_fpr(spark):
    batches = _batches(spark, k=4)
    narrow = RuleBasedProfiler(estimator="bootstrap", false_positive_rate=0.5)
    wide = RuleBasedProfiler(estimator="bootstrap", false_positive_rate=0.01)
    sn = narrow.profile(batches, columns=["x"])
    sw = wide.profile(batches, columns=["x"])

    def mean_bounds(s):
        e = next(
            e for e in s if e.expectation_type == "expect_column_mean_to_be_between"
        )
        return e.kwargs["min_value"], e.kwargs["max_value"]

    n_lo, n_hi = mean_bounds(sn)
    w_lo, w_hi = mean_bounds(sw)
    assert w_lo <= n_lo and w_hi >= n_hi


class TestPartitionStrategies:
    def test_auto_bins_closed_form(self, spark):
        from great_expectations_spark.profile import (
            auto_bin_edges,
            build_continuous_partition_object,
            is_valid_continuous_partition_object,
        )

        df = spark.range(0, 1000).select(F.col("id").cast("double").alias("v"))
        p = build_continuous_partition_object(df, "v", bins="auto")
        assert is_valid_continuous_partition_object(p)
        # closed form: n=1000, lo=0, hi=999, q25=249.75, q75=749.25
        expected = auto_bin_edges(1000, 0.0, 999.0, 249.75, 749.25)
        assert p["bins"] == pytest.approx(expected)
        assert sum(p["weights"]) == pytest.approx(1.0)

    def test_kde_partition_valid_and_smooth(self, spark):
        from great_expectations_spark.profile import (
            build_continuous_partition_object,
            is_valid_continuous_partition_object,
        )

        df = spark.range(0, 900).select(
            ((F.col("id") % 30) + (F.col("id") % 7) * 0.1).alias("v")
        )
        p = build_continuous_partition_object(df, "v", bins="kde")
        assert is_valid_continuous_partition_object(p)
        total = sum(p["weights"]) + sum(p["tail_weights"])
        assert total == pytest.approx(1.0, abs=1e-6)
        assert len(p["bins"]) == int(np.floor(np.sqrt(900))) + 1

    def test_kde_constant_column(self, spark):
        from great_expectations_spark.profile import (
            build_continuous_partition_object,
        )

        df = spark.range(0, 50).select(F.lit(7.0).alias("v"))
        p = build_continuous_partition_object(df, "v", bins="kde")
        assert p["weights"] == [1.0]
        assert p["bins"][0] < 7.0 < p["bins"][1]


class TestHead:
    def test_table_head_ordered(self, spark):
        from great_expectations_spark.profile import table_head

        df = spark.range(0, 100).select((99 - F.col("id")).alias("v"))
        rows = table_head(df, n=3, order_by=["v"]).collect()
        assert [r["v"] for r in rows] == [0, 1, 2]
        plan = table_head(df, 3, ["v"])._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan

    def test_column_head_prunes(self, spark, tmp_path):
        from great_expectations_spark.profile import column_head

        p = str(tmp_path / "t")
        spark.range(0, 50).select(
            F.col("id"), (F.col("id") * 2).alias("v"), F.lit("pad").alias("w")
        ).write.parquet(p)
        df = spark.read.parquet(p)
        out = column_head(df, "v", n=2, order_by=["id"])
        assert [r["v"] for r in out.collect()] == [0, 2]
        plan = out._jdf.queryExecution().executedPlan().toString()
        scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
        assert "w" not in scan.split("ReadSchema:")[1], scan


class TestJdbcSpec:
    def test_spec_validation(self):
        from great_expectations_spark.sources.batch import BatchSpec

        with pytest.raises(ValueError):
            BatchSpec(jdbc={"url": "jdbc:postgresql://h/db"})  # no dbtable
        with pytest.raises(ValueError):
            BatchSpec(jdbc={"dbtable": "t"})  # no url
        spec = BatchSpec(jdbc={"url": "jdbc:postgresql://h/db", "dbtable": "t"})
        assert spec.jdbc["dbtable"] == "t"

    def test_reader_dispatch(self, spark, monkeypatch):
        """read_batch must route a jdbc spec through
        spark.read.format('jdbc').options(...).load() (offline sandbox: a
        recording fake replaces the reader)."""
        from great_expectations_spark.sources.batch import BatchSpec, read_batch

        calls = {}

        class FakeReader:
            def format(self, f):
                calls["format"] = f
                return self

            def options(self, **kw):
                calls["options"] = kw
                return self

            def load(self):
                calls["loaded"] = True
                return spark.range(1)

        monkeypatch.setattr(
            type(spark), "read", property(lambda self: FakeReader())
        )
        jdbc = {
            "url": "jdbc:postgresql://host/db",
            "dbtable": "public.events",
            "partitionColumn": "event_id",
            "lowerBound": "0",
            "upperBound": "1000000",
            "numPartitions": "32",
        }
        out = read_batch(spark, BatchSpec(jdbc=jdbc))
        assert calls == {"format": "jdbc", "options": jdbc, "loaded": True}
        assert out.count() == 1


def test_bootstrap_estimates_quantiles_not_mean_ci():
    """Round-3 fix: bootstrap must estimate the [a, 1-a] QUANTILES of the
    per-batch metric values (mean of per-resample quantile point estimates),
    not a confidence interval of the mean — a mean-CI is far narrower than
    the batch spread, so emitted suites failed on their own training
    batches."""
    v = [float(x) for x in range(1, 21)]  # 1..20, mean 10.5
    e = estimate_range(v, estimator="bootstrap",
                       false_positive_rate=0.1, seed=3)
    q = estimate_range(v, estimator="quantile", false_positive_rate=0.1)
    # the bootstrap range tracks the sample quantiles (within ~1.5 of the
    # plug-in estimate) and covers most of the batch spread …
    assert e.lo == pytest.approx(q.lo, abs=1.5)
    assert e.hi == pytest.approx(q.hi, abs=1.5)
    assert (e.hi - e.lo) > 0.6 * (max(v) - min(v))
    # … whereas a mean-CI would be a sliver around 10.5
    assert not (9.0 < e.lo and e.hi < 12.0)
