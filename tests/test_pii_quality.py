"""PII quality floors — the planted-corpus rates recorded in
BENCH/PII_QUALITY.md, asserted so a pattern regression fails the suite.

The planted case lists live in tools/pii_quality.py (CASES /
DOCUMENTED_EDGES) so the pytest floors and the recorded quality table
share one source of truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def quality(spark):
    from tools.pii_quality import measure

    return measure(spark)


def test_recall_floor_every_class(quality):
    """Every designed-to-match positive is detected: recall 1.0/class."""
    for cls, m in quality["per_class"].items():
        assert m["planted"] > 0, cls
        assert m["recall"] == 1.0, (cls, m)


def test_zero_false_positives_on_decoys(quality):
    """No designed-to-not-match decoy fires: out-of-range octets,
    Luhn-invalid cards, malformed SSN shapes, TLD-less emails."""
    for cls, m in quality["per_class"].items():
        assert m["decoys"] > 0, cls
        assert m["fp"] == 0, (cls, m)


def test_no_cross_class_leakage(quality):
    """A positive of class A never fires class B's counter (e.g. a card
    digit-run half-matching as a phone)."""
    assert quality["leaks"] == []


def test_redaction_is_complete(quality):
    """Re-scanning redacted positives finds zero matches in any class."""
    assert quality["residual_after_redact"] == 0


def test_documented_edges_behave_as_documented(quality):
    """The two honest deviations stay exactly as recorded: SSN area-000
    over-match (FP direction), non-NANP international phone miss (FN
    direction). If either flips, the record is stale — fail loudly."""
    for e in quality["edges"]:
        assert e["detected"] == e["expected"], e


def test_luhn_invalid_redacted_but_not_counted(spark):
    """The over-redaction contract: a bad-checksum card-shaped run counts
    0 (Luhn gate) yet is still stripped by redact_pii (privacy-first)."""
    from great_expectations_spark.operators.pii import redact_pii, scan_pii

    df = spark.createDataFrame(
        [("pay 4111111111111112 now",)], "text string"
    )
    row = scan_pii(df, "text").select(
        "pii_credit_card_count",
        redact_pii(F.col("text")).alias("red"),
    ).collect()[0]
    assert row["pii_credit_card_count"] == 0
    assert "4111111111111112" not in row["red"]
    assert "[CREDIT_CARD]" in row["red"]
