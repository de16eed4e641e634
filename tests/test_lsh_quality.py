"""Recall floors for the LSH candidate generators at their DEFAULT configs.

BENCH/LSH_QUALITY.md records the full recall/precision sweep (tools/
lsh_quality.py); these tests pin the default operating points so a
regression in the banding / pigeonhole math fails CI rather than silently
shrinking dedup coverage:

- minhash (bands=32 @ n_hashes=128): candidate recall ≥ 0.95 against exact
  all-pairs char-5-gram Jaccard ≥ 0.8 ground truth (measured 1.0).
- simhash (chunks=4 @ max_hamming=3): its contract is a HAMMING radius, not
  a Jaccard threshold (measured J≥0.8 recall is only ~0.6 — simhash is the
  coarser sketch, recorded in the sweep). What IS exact is the pigeonhole
  guarantee: any pair within hamming < chunks shares ≥1 identical chunk, so
  every truth pair whose fingerprints are within max_hamming must appear in
  the candidates — recall 1.0 on that subset, asserted here.

(Post-verify precision is 1.0 by construction — `verify_pairs_ngram_jaccard`
re-checks exact Jaccard — so candidate recall IS pipeline recall.)
"""

from __future__ import annotations

import pytest

from great_expectations_spark.operators.dedup import (
    minhash_lsh_candidates,
    simhash_candidates,
    simhash_fingerprints,
)
from tools.lsh_quality import exact_truth_pairs, pair_set, planted_corpus

N_DOCS = 400
GT_JACCARD = 0.8


@pytest.fixture(scope="module")
def corpus(spark):
    docs = planted_corpus(spark, N_DOCS).persist()
    docs.count()
    yield docs
    docs.unpersist()


@pytest.fixture(scope="module")
def truth(spark, corpus):
    pairs = pair_set(exact_truth_pairs(corpus, GT_JACCARD))
    # the generator plants a near-dup at every id ≡ 0 (mod 17)
    assert len(pairs) >= N_DOCS // 17 - 1
    return pairs


def test_minhash_default_recall_floor(corpus, truth):
    cand = pair_set(
        minhash_lsh_candidates(
            corpus, "text", "doc_id", n_hashes=128, bands=32,
            shingle_size=5, mode="char", min_jaccard=None,
        )
    )
    recall = len(cand & truth) / len(truth)
    assert recall >= 0.95, f"minhash default recall {recall:.3f} < 0.95"


def test_simhash_pigeonhole_guarantee(corpus, truth):
    fps = {
        r["doc_id"]: r["fingerprint"]
        for r in simhash_fingerprints(corpus, "text", "doc_id").collect()
    }
    in_radius = {
        (a, b)
        for (a, b) in truth
        if bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    # the planted corpus puts a meaningful share of true pairs inside the
    # default radius — otherwise this test would be vacuous
    assert len(in_radius) >= 5
    cand = pair_set(
        simhash_candidates(
            corpus, "text", "doc_id", bits=64, chunks=4, max_hamming=3,
        )
    )
    missing = in_radius - cand
    assert not missing, (
        f"pigeonhole guarantee broken: {len(missing)} in-radius truth "
        f"pairs absent from candidates, e.g. {sorted(missing)[:3]}"
    )
