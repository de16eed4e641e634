"""Round-4 curation operators: PII scan/redact/gate, corpus line dedup,
URL domain stats + blocklist gating."""

from __future__ import annotations

import math

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


# ---------------------------------------------------------------------------
# unigram LM quality scoring
# ---------------------------------------------------------------------------

class TestUnigramLM:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        return spark.createDataFrame(
            [
                (0, "alpha alpha alpha beta"),
                (1, "alpha beta gamma"),
                (2, "zeta"),                  # OOV once vocab is cut
                (3, ""),                      # token-less
                (4, None),
            ],
            "doc_id long, text string",
        )

    def test_vocab_probabilities(self, spark, corpus):
        from great_expectations_spark.operators.lm import unigram_vocab

        v = {r["token"]: r for r in unigram_vocab(corpus).collect()}
        # totals: alpha 4, beta 2, gamma 1, zeta 1 → 8 tokens
        assert v["alpha"]["cnt"] == 4
        assert v["alpha"]["logp"] == pytest.approx(math.log(4 / 8))
        assert v["zeta"]["logp"] == pytest.approx(math.log(1 / 8))

    def test_topk_cut_keeps_total_and_tiebreak(self, spark, corpus):
        from great_expectations_spark.operators.lm import unigram_vocab

        v = unigram_vocab(corpus, top_k=3).collect()
        toks = [r["token"] for r in v]
        # gamma/zeta tie at cnt=1 → token ASC keeps gamma, cuts zeta
        assert toks == ["alpha", "beta", "gamma"]
        # logp denominator stays the FULL corpus total (8), not the cut's
        assert dict((r["token"], r["logp"]) for r in v)["gamma"] == \
            pytest.approx(math.log(1 / 8))

    def test_scores_and_oov_penalty(self, spark, corpus):
        from great_expectations_spark.operators.lm import (
            score_documents,
            unigram_vocab,
        )

        vocab = unigram_vocab(corpus, top_k=3)          # zeta is OOV
        s = {r["doc_id"]: r for r in score_documents(corpus, vocab).collect()}
        oov = math.log(1 / 8) - math.log(2)             # rarest − ln2
        assert s[0]["mean_logp"] == pytest.approx(
            (3 * math.log(4 / 8) + math.log(2 / 8)) / 4
        )
        assert s[2]["mean_logp"] == pytest.approx(oov)
        assert s[2]["n_scored"] == 1
        assert 3 not in s and 4 not in s                # token-less: no row

    def test_with_scores_keeps_all_docs(self, spark, corpus):
        from great_expectations_spark.operators.lm import (
            unigram_vocab,
            with_unigram_scores,
        )

        out = {
            r["doc_id"]: r["mean_logp"]
            for r in with_unigram_scores(corpus, unigram_vocab(corpus)).collect()
        }
        assert len(out) == 5
        assert out[3] is None and out[4] is None

    def test_empty_vocab_rejected(self, spark):
        from great_expectations_spark.operators.lm import (
            score_documents,
            unigram_vocab,
        )

        empty = spark.createDataFrame([], "doc_id long, text string")
        with pytest.raises(ValueError, match="vocab is empty"):
            score_documents(empty, unigram_vocab(empty))


# ---------------------------------------------------------------------------
# randomized equality / invariants (seeded, one Spark job each)
# ---------------------------------------------------------------------------

def _py_luhn(s: str) -> bool:
    digits = [int(c) for c in s if c.isdigit()]
    if not 13 <= len(digits) <= 19:
        return False
    total = 0
    for i, d in enumerate(reversed(digits)):
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def test_luhn_hof_matches_python_reference(spark):
    """The HOF Luhn chain equals a straightforward Python implementation
    on 300 seeded random candidates (valid cards, corrupted checksums,
    wrong lengths, separator mixes)."""
    import random

    rng = random.Random(42)
    cands = []
    for _ in range(300):
        n = rng.randint(11, 21)
        digits = [rng.randint(0, 9) for _ in range(n)]
        if rng.random() < 0.4:  # force a Luhn-valid suffix digit
            total = 0
            for i, d in enumerate(reversed(digits[:-1]), start=2):
                if i % 2 == 0:
                    d *= 2
                    if d > 9:
                        d -= 9
                total += d
            digits[-1] = (10 - total % 10) % 10
        sep = rng.choice(["", " ", "-"])
        cands.append(sep.join(str(d) for d in digits) if sep else
                     "".join(str(d) for d in digits))

    df = spark.createDataFrame([(c,) for c in cands], "cand string")
    got = {
        r["cand"]: bool(r["ok"])
        for r in df.select(
            "cand", P.luhn_valid(F.col("cand")).alias("ok")
        ).collect()
    }
    for c in cands:
        assert got[c] == _py_luhn(c), c


def test_line_dedup_idempotent_and_partition_invariant(spark):
    """strip(strip(X)) == strip(X) (all cross-doc duplicates gone after
    one pass) and kept+dropped line multisets reconstruct the originals,
    on a seeded corpus mixing shared boilerplate and random lines."""
    import random

    rng = random.Random(7)
    words = ["spark", "scan", "agg", "join", "row", "key", "batch"]
    boiler = ["shared footer line", "copyright notice 2026"]
    rows = []
    for i in range(40):
        lines = [" ".join(rng.choices(words, k=4)) for _ in range(rng.randint(1, 5))]
        for b in boiler:
            if rng.random() < 0.5:
                lines.insert(rng.randrange(len(lines) + 1), b)
        rows.append((i, "\n".join(lines)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    once = strip_duplicate_lines(docs, min_docs=3)
    twice = strip_duplicate_lines(once, min_docs=3)
    a = sorted((r["doc_id"], r["text"]) for r in once.collect())
    b = sorted((r["doc_id"], r["text"]) for r in twice.collect())
    assert a == b

    # reconstruction: every original line is either kept (in order) or in
    # the corpus-wide duplicate set
    from great_expectations_spark.operators.lines import duplicate_line_hashes
    dup_keys = {
        r["line_hash"]
        for r in duplicate_line_hashes(docs, min_docs=3).collect()
    }
    kept = dict(a)
    for i, text in rows:
        orig = text.split("\n")
        kept_lines = kept[i].split("\n") if kept[i] else []
        j = 0
        for line in orig:
            if j < len(kept_lines) and line == kept_lines[j]:
                j += 1
        assert j == len(kept_lines)  # kept is a subsequence of original


def test_corpus_ngram_diversity(spark):
    from great_expectations_spark.operators.textstats import (
        corpus_ngram_diversity,
    )

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    got = {r["n"]: r for r in corpus_ngram_diversity(docs, ns=(1, 2)).collect()}
    # unigrams: a b a b | a b c → 7 total, 3 distinct
    assert got[1]["total_grams"] == 7 and got[1]["distinct_grams"] == 3
    # bigrams: (a b)(b a)(a b) | (a b)(b c) → 5 total, 3 distinct
    assert got[2]["total_grams"] == 5 and got[2]["distinct_grams"] == 3
    assert got[2]["diversity"] == pytest.approx(3 / 5)


def test_corpus_ngram_diversity_md5_matches(spark):
    from great_expectations_spark.operators.textstats import (
        corpus_ngram_diversity,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} shared tail") for i in range(20)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, corpus_ngram_diversity(docs).collect()))
    b = sorted(map(tuple, corpus_ngram_diversity(docs, hash_fn="md5").collect()))
    assert a == b


def test_paragraph_granularity_line_dedup(spark):
    docs = spark.createDataFrame(
        [
            (0, "unique zero first\n\nshared footer para\nsecond line"),
            (1, "unique one\n\nshared footer para\nsecond line"),
            (2, "unique two\n\nshared footer para\nsecond line"),
        ],
        "doc_id long, text string",
    )
    # line granularity would NOT drop the footer's two lines as one unit;
    # paragraph granularity treats "shared footer para\nsecond line" as
    # one dedup unit and strips it whole
    out = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_lines(
            docs, min_docs=3, sep="\n\n", join_sep="\n\n"
        ).collect()
    }
    assert out[0] == "unique zero first"
    assert out[1] == "unique one"
    assert out[2] == "unique two"


def test_pii_gate_violations_sink_roundtrip(spark, tmp_path):
    """The PII gate's failing rows land in the violations sink with the
    comma-joined classes as the observed value — the auditing trail a
    scrubbing pipeline needs."""
    vp = str(tmp_path / "viol")
    docs = spark.createDataFrame(
        [
            (0, "mail me at a@b.co from 10.1.2.3"),
            (1, "all clean"),
            (2, "ssn 123-45-6789"),
        ],
        "doc_id long, text string",
    )
    suite = ExpectationSuite("pii-sink")
    suite.add("expect_column_values_to_contain_no_pii", column="text")
    SuiteRunner(
        spark, violations_path=vp,
        unexpected_index_column_names=["doc_id"],
    ).validate(docs, suite)
    v = spark.read.parquet(vp)
    rows = {r["doc_id"]: r for r in v.collect()}
    assert set(rows) == {0, 2}
    obs = {i: rows[i]["observed_value"] for i in rows}
    assert set(obs[0].split(",")) == {"email", "ipv4"}
    assert obs[2] == "ssn"


def test_url_trailing_dot_normalized(spark):
    from great_expectations_spark.operators.urls import url_domain

    df = spark.createDataFrame(
        [("https://Example.com.",), ("http://www.x.org./p",)], "u string"
    )
    got = [r[0] for r in df.select(url_domain("u")).collect()]
    assert got == ["example.com", "x.org"]


def test_url_trailing_punct_cannot_evade_blocklist(spark):
    """Review finding (round 4): 'visit https://evil.org, for more' must
    not mint the phantom domain 'evil.org,' nor slip past the gate."""
    docs = spark.createDataFrame(
        [(0, "visit https://evil.org, for more"),
         (1, "also https://evil.org! and https://ok.example.io; done")],
        "doc_id long, text string",
    )
    got = {r["domain"] for r in domain_counts(docs).collect()}
    assert got == {"evil.org", "ok.example.io"}
    bl = spark.createDataFrame([("evil.org",)], "domain string")
    flags = {
        r["doc_id"]: r["blocklisted"]
        for r in flag_blocklisted_domains(docs, bl).collect()
    }
    assert flags == {0: True, 1: True}
