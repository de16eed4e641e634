"""Round-4 curation operators: PII scan/redact/gate, corpus line dedup,
URL domain stats + blocklist gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from great_expectations_spark import ExpectationSuite, SuiteRunner, validate
from great_expectations_spark.operators import pii as P
from great_expectations_spark.operators.lines import (
    duplicate_line_hashes,
    strip_duplicate_lines,
)
from great_expectations_spark.operators.urls import (
    domain_counts,
    extract_domains,
    extract_urls,
    flag_blocklisted_domains,
)


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

class TestPII:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [
                (0, "write to alice.smith+x@ex-ample.co.uk or bob@corp.io"),
                (1, "server at 192.168.1.7 and bogus 10.0.0.256"),
                (2, "card 4532 0151 1283 0366 expires soon"),       # Luhn ok
                (3, "card 4532-0151-1283-0367 is a typo"),          # Luhn bad
                (4, "ssn 123-45-6789 call +1 (415) 555-2671"),
                (5, "no pii here, just 42 plain words"),
                (6, None),
            ],
            "doc_id long, text string",
        )

    def test_counts_per_class(self, spark, docs):
        rows = {
            r["doc_id"]: r
            for r in P.scan_pii(docs, "text").collect()
        }
        assert rows[0]["pii_email_count"] == 2
        assert rows[1]["pii_ipv4_count"] == 1          # .256 octet rejected
        assert rows[2]["pii_credit_card_count"] == 1   # Luhn-valid
        assert rows[3]["pii_credit_card_count"] == 0   # Luhn-invalid
        assert rows[4]["pii_ssn_count"] == 1
        assert rows[4]["pii_phone_count"] == 1
        assert rows[5]["pii_total_count"] == 0
        assert rows[6]["pii_total_count"] == 0         # null text → 0

    def test_types_found_observed_value(self, spark, docs):
        got = docs.select(
            "doc_id", P.pii_types_found("text").alias("found")
        ).collect()
        by_id = {r["doc_id"]: r["found"] for r in got}
        assert by_id[0] == "email"
        assert set(by_id[4].split(",")) == {"phone", "ssn"}
        assert by_id[5] == ""

    def test_redact_over_redacts_bad_luhn(self, spark, docs):
        red = docs.filter("doc_id in (2, 3)").select(
            "doc_id", P.redact_pii("text").alias("r")
        ).collect()
        for r in red:
            assert "[CREDIT_CARD]" in r["r"]
            assert "4532" not in r["r"]

    def test_redact_email_and_phone(self, spark, docs):
        r = docs.filter("doc_id = 0").select(
            P.redact_pii("text").alias("r")
        ).collect()[0]["r"]
        assert r == "write to [EMAIL] or [EMAIL]"
        r4 = docs.filter("doc_id = 4").select(
            P.redact_pii("text").alias("r")
        ).collect()[0]["r"]
        assert "[SSN]" in r4 and "[PHONE]" in r4

    def test_unknown_type_rejected(self, spark, docs):
        with pytest.raises(ValueError, match="unknown PII types"):
            P.scan_pii(docs, "text", types=["email", "iban"])

    def test_gate_expectation_and_violations(self, spark, docs):
        suite = ExpectationSuite("pii")
        suite.add(
            "expect_column_values_to_contain_no_pii", column="text",
            mostly=0.9,
        )
        res = validate(docs, suite)
        r = res.results[0]
        # docs 0,1,2,4 carry PII; 3 (bad Luhn), 5 are clean; 6 is null
        assert r.result["unexpected_count"] == 4
        assert r.result["missing_count"] == 1
        assert not r.success  # 4/6 in-domain rows fail, mostly=0.9

    def test_gate_type_subset(self, spark, docs):
        suite = ExpectationSuite("pii-email-only")
        suite.add(
            "expect_column_values_to_contain_no_pii", column="text",
            types=["email"],
        )
        r = validate(docs, suite).results[0]
        assert r.result["unexpected_count"] == 1


# ---------------------------------------------------------------------------
# line-level dedup
# ---------------------------------------------------------------------------

def _line_docs(spark):
    boiler = "subscribe to our newsletter"
    rows = []
    for i in range(6):
        body = f"unique content of doc {i}\nsecond line {i}"
        rows.append((i, f"{boiler}\n{body}\n{boiler.upper()}  "))
    rows.append((6, boiler))                 # all-boilerplate doc
    rows.append((7, "a one-off document\n\nwith a blank line"))
    rows.append((8, None))
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestLineDedup:
    def test_duplicate_hashes_min_docs(self, spark):
        docs = _line_docs(spark)
        dups = duplicate_line_hashes(docs, min_docs=2).collect()
        # normalized boilerplate (case/trim-folded) is the ONLY line in ≥2 docs
        assert len(dups) == 1
        assert dups[0]["n_docs"] == 7

    def test_strip_keeps_order_and_unique_content(self, spark):
        docs = _line_docs(spark)
        out = {
            r["doc_id"]: r["text"]
            for r in strip_duplicate_lines(docs, min_docs=2).collect()
        }
        assert out[0] == "unique content of doc 0\nsecond line 0"
        assert out[3] == "unique content of doc 3\nsecond line 3"
        assert out[6] == ""                      # all lines were boilerplate
        assert out[7] == "a one-off document\n\nwith a blank line"
        assert out[8] is None

    def test_blank_lines_never_dedup(self, spark):
        docs = spark.createDataFrame(
            [(0, "a\n\nb"), (1, "c\n\nd"), (2, "e\n\nf")],
            "doc_id long, text string",
        )
        out = strip_duplicate_lines(docs, min_docs=2).collect()
        assert all("\n\n" in r["text"] for r in out)

    def test_within_doc_repetition_does_not_qualify(self, spark):
        docs = spark.createDataFrame(
            [(0, "same line\nsame line\nsame line"), (1, "other text")],
            "doc_id long, text string",
        )
        assert duplicate_line_hashes(docs, min_docs=2).count() == 0

    def test_md5_mode_matches_xxhash_mode(self, spark):
        docs = _line_docs(spark)
        a = sorted(
            (r["doc_id"], r["text"])
            for r in strip_duplicate_lines(docs, min_docs=2).collect()
        )
        b = sorted(
            (r["doc_id"], r["text"])
            for r in strip_duplicate_lines(
                docs, min_docs=2, hash_fn="md5"
            ).collect()
        )
        assert a == b

    def test_slim_rows_before_shuffle(self, spark):
        """The dup-hash aggregation shuffles hashed slim rows — the raw
        line string is consumed by xxhash64 inside the Generate stage and
        does not survive into the exchange's aggregate keys."""
        docs = _line_docs(spark)
        plan = duplicate_line_hashes(docs, min_docs=2)._sc._jvm and \
            duplicate_line_hashes(docs, min_docs=2)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "xxhash64" in plan
        assert "hashpartitioning(line_hash" in plan


# ---------------------------------------------------------------------------
# URLs
# ---------------------------------------------------------------------------

class TestUrls:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [
                (0, "see https://www.Example.COM/a?x=1 and "
                    "http://user:pw@sub.example.com:8080/b"),
                (1, "plain text, no links"),
                (2, "dup https://example.com/1 https://example.com/2"),
                (3, "bad http:// and https://spam.example.net/x"),
                (4, None),
            ],
            "doc_id long, text string",
        )

    def test_extract_and_normalize(self, spark, docs):
        r = docs.filter("doc_id = 0").select(
            extract_urls("text").alias("u"),
            extract_domains("text").alias("d"),
        ).collect()[0]
        assert len(r["u"]) == 2
        assert sorted(r["d"]) == ["example.com", "sub.example.com"]

    def test_domain_counts(self, spark, docs):
        got = {r["domain"]: (r["n_urls"], r["n_docs"])
               for r in domain_counts(docs).collect()}
        assert got["example.com"] == (3, 2)   # 1 from doc0 + 2 from doc2
        assert got["spam.example.net"] == (1, 1)

    @pytest.mark.parametrize("broadcast", [None, True, False])
    def test_blocklist_flag(self, spark, docs, broadcast):
        bl = spark.createDataFrame(
            [("www.spam.example.net",), ("evil.org",)], "domain string"
        )
        flags = {
            r["doc_id"]: r["blocklisted"]
            for r in flag_blocklisted_domains(
                docs, bl, broadcast=broadcast
            ).collect()
        }
        assert flags == {0: False, 1: False, 2: False, 3: True, 4: False}
