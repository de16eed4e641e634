"""Profiler CLI (tools/profile_table.py): profile → suite JSON →
self-validation."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools")
)

import profile_table


def _run(capsys, argv) -> dict:
    rc = profile_table.main(argv)
    assert rc == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_profile_self_validates(spark, tmp_path, capsys):
    """A suite profiled from a table must PASS on that same table (the
    mostly_floor slack and band thresholds exist exactly for this)."""
    out = str(tmp_path / "suite.json")
    report = _run(capsys, [
        "--table", "/root/testdata/sf0.001/orders.parquet",
        "--out", out, "--validate",
    ])
    assert report["validation"]["success"] is True
    assert report["validation"]["success_percent"] == 100.0
    suite = json.load(open(out))
    types = {e["expectation_type"] for e in suite["expectations"]}
    assert "expect_column_values_to_not_be_null" in types
    assert "expect_table_row_count_to_be_between" in types


def test_declared_key_is_checked_not_trusted(spark, tmp_path, capsys):
    """Passing --key for a column pair the data actually duplicates must
    FAIL the self-validation — the profiler emits the caller's key claim
    as a real check, it does not silently drop it."""
    out = str(tmp_path / "suite2.json")
    report = _run(capsys, [
        "--table", "/root/testdata/sf0.001/lineitem.parquet",
        "--out", out,
        "--key", "l_orderkey,l_linenumber",   # testdata plants duplicates
        "--validate",
    ])
    assert report["by_type"]["expect_compound_columns_to_be_unique"] == 1
    assert report["validation"]["success"] is False


def test_drift_gates_pass_on_training_batch(spark, tmp_path, capsys):
    """Drift gates are calibrated so the profiled batch itself scores
    p=1 / D=0 — only a future distribution SHIFT trips them."""
    out = str(tmp_path / "suite3.json")
    report = _run(capsys, [
        "--table", "/root/testdata/sf0.001/events.parquet",
        "--out", out, "--drift-gates", "--validate",
    ])
    assert report["validation"]["success"] is True
    assert any(
        t.endswith("p_value_to_be_greater_than") for t in report["by_type"]
    )
