"""Tests for training-data pipeline operators (operators/).

Strategy mirrors the reference's golden-corpus style (SURVEY.md §5): tiny
inline tables with *known* duplicate/similarity structure, assertions on
exact outputs — plus oracle cross-checks computed in plain Python for the
similarity math.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from great_expectations_spark.operators import (
    dedup as D,
    multimodal as M,
    similarity as S,
    textstats as T,
)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0/1: identical after normalization (case/whitespace)
        (0, "The quick brown fox jumps over the lazy dog"),
        (1, "the  quick   brown fox jumps over the lazy DOG"),
        # 2: near-dup of 0 (one word changed)
        (2, "The quick brown fox leaps over the lazy dog"),
        # 3: unrelated
        (3, "PySpark expression pipelines compile to whole stage codegen"),
        # 4: another unrelated
        (4, "Entirely different content about databases and storage engines"),
        # 5: exact copy of 3
        (5, "PySpark expression pipelines compile to whole stage codegen"),
        # 6: null text
        (6, None),
        # 7: empty text
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # ~same direction as 0
        (2, [0.0, 1.0, 0.0]),      # orthogonal
        (3, [0.0, 0.99, 0.1]),     # ~same direction as 2
        (4, [-1.0, 0.0, 0.0]),     # opposite of 0
        (5, [0.577, 0.577, 0.577]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

class TestExactDedup:
    def test_duplicate_groups(self, docs):
        groups = D.exact_duplicate_groups(docs, "text").collect()
        # {0,1} normalize-equal; {3,5} byte-equal → two groups of 2
        assert sorted(g["dup_count"] for g in groups) == [2, 2]

    def test_dedup_keeps_min_id_and_nulls(self, docs):
        out = D.exact_dedup(docs, "text", "doc_id")
        ids = sorted(r["doc_id"] for r in out.collect())
        # dropped: 1 (dup of 0), 5 (dup of 3); kept: null-text row 6
        assert ids == [0, 2, 3, 4, 6, 7]

    def test_no_normalize(self, docs):
        out = D.exact_dedup(docs, "text", "doc_id", normalize=False)
        ids = sorted(r["doc_id"] for r in out.collect())
        # without normalization only {3,5} are equal
        assert ids == [0, 1, 2, 3, 4, 6, 7]


# ---------------------------------------------------------------------------
# MinHash / LSH
# ---------------------------------------------------------------------------

class TestMinHash:
    def test_identical_docs_full_signature_match(self, docs):
        cand = D.minhash_lsh_candidates(
            docs, "text", "doc_id", n_hashes=32, bands=8, shingle_size=4,
            min_jaccard=None,
        ).collect()
        by_pair = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in cand}
        assert by_pair[(0, 1)] == 1.0    # normalize-identical
        assert by_pair[(3, 5)] == 1.0    # byte-identical
        # near-dup 0↔2 should be found with a high (not 1.0) estimate
        assert (0, 2) in by_pair and 0.3 < by_pair[(0, 2)] < 1.0

    def test_unrelated_not_candidates(self, docs):
        cand = D.minhash_lsh_candidates(
            docs, "text", "doc_id", n_hashes=32, bands=8, shingle_size=4,
            min_jaccard=0.8,
        ).collect()
        pairs = {(r["id_a"], r["id_b"]) for r in cand}
        assert (0, 4) not in pairs and (3, 4) not in pairs

    def test_minhash_dedup_end_to_end(self, docs):
        out = D.minhash_dedup(
            docs, "text", "doc_id", n_hashes=32, bands=8, shingle_size=4,
            min_jaccard=0.9,
        )
        ids = sorted(r["doc_id"] for r in out.collect())
        # 1 collapses into 0; 5 collapses into 3; near-dup 2 survives at 0.9
        assert 0 in ids and 3 in ids
        assert 1 not in ids and 5 not in ids
        assert 2 in ids and 4 in ids

    def test_signature_shape(self, docs):
        sigs = D.minhash_signatures(docs, "text", "doc_id", n_hashes=16,
                                    shingle_size=4)
        rows = sigs.collect()
        # null + empty text rows excluded
        assert len(rows) == 6
        assert all(len(r["signature"]) == 16 for r in rows)

    def test_word_mode(self, docs):
        cand = D.minhash_lsh_candidates(
            docs, "text", "doc_id", n_hashes=32, bands=8, shingle_size=2,
            mode="word", min_jaccard=None,
        ).collect()
        by_pair = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in cand}
        assert by_pair[(0, 1)] == 1.0


class TestNgramJaccard:
    def test_exact_verification(self, spark, docs):
        pairs = spark.createDataFrame(
            [(0, 1, 1.0), (0, 2, 0.6), (0, 4, 0.1)],
            "id_a long, id_b long, est_jaccard double",
        )
        out = D.verify_pairs_ngram_jaccard(
            pairs, docs, "text", "doc_id", n=3, mode="word", min_jaccard=0.3
        ).collect()
        kept = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
        assert kept[(0, 1)] == 1.0
        # one word changed mid-sentence → 4 shared of 10 total word-3-grams
        assert kept[(0, 2)] == pytest.approx(0.4)
        assert (0, 4) not in kept

    def test_jaccard_matches_python_oracle(self, spark):
        a = "a b c d e f g"
        b = "a b c d x y z"
        def grams(s, n=3):
            toks = s.split()
            return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
        expected = len(grams(a) & grams(b)) / len(grams(a) | grams(b))
        df = spark.createDataFrame([(a, b)], "ta string, tb string")
        got = df.select(
            D.ngram_jaccard(F.col("ta"), F.col("tb"), n=3, mode="word").alias("j")
        ).first()["j"]
        assert got == pytest.approx(expected)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class TestSimHash:
    def test_identical_zero_hamming(self, docs):
        pairs = D.simhash_candidates(
            docs, "text", "doc_id", max_hamming=0
        ).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (3, 5) in got  # byte-identical
        assert (0, 1) in got  # token-identical after lowering

    def test_near_dup_low_hamming(self, docs):
        pairs = D.simhash_candidates(
            docs, "text", "doc_id", max_hamming=16
        ).collect()
        by_pair = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
        assert by_pair.get((0, 2), 99) <= 16  # one-word change
        # unrelated docs should NOT be within 16 bits
        assert (0, 4) not in by_pair

    def test_fingerprint_deterministic(self, spark):
        df = spark.createDataFrame([("hello world foo bar",)], "t string")
        a = df.select(D.simhash("t").alias("s")).first()["s"]
        b = df.select(D.simhash("t").alias("s")).first()["s"]
        assert a == b


# ---------------------------------------------------------------------------
# embedding near-dup + cosine
# ---------------------------------------------------------------------------

class TestEmbeddingDedup:
    def test_cosine_matches_math(self, spark):
        df = spark.createDataFrame(
            [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])],
            "a array<double>, b array<double>",
        )
        got = df.select(
            D.cosine_similarity(F.col("a"), F.col("b")).alias("c")
        ).first()["c"]
        expected = (4 + 10 + 18) / (math.sqrt(14) * math.sqrt(77))
        assert got == pytest.approx(expected)

    def test_exact_pairs(self, vecs):
        out = D.embedding_near_duplicates(
            vecs, "vec_id", "embedding", min_cosine=0.95, exact=True
        ).collect()
        pairs = {(r["id_a"], r["id_b"]) for r in out}
        assert pairs == {(0, 1), (2, 3)}

    def test_lsh_finds_same_pairs(self, vecs):
        out = D.embedding_near_duplicates(
            vecs, "vec_id", "embedding", min_cosine=0.95, n_planes=8
        ).collect()
        pairs = {(r["id_a"], r["id_b"]) for r in out}
        # LSH recall: near-identical vectors collide on all planes w.h.p.
        assert (0, 1) in pairs
        # and no false accepts (cosine verified exactly)
        assert all(p in {(0, 1), (2, 3)} for p in pairs)


class TestClusters:
    def test_transitive_closure(self, spark):
        pairs = spark.createDataFrame(
            [(1, 2, 1.0), (2, 3, 1.0), (5, 6, 1.0)],
            "id_a long, id_b long, est_jaccard double",
        )
        labels = {
            r["id"]: r["cluster_id"]
            for r in D.duplicate_clusters(pairs).collect()
        }
        assert labels == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def _queries(vecs):
    return vecs.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


class TestSimilarity:
    def test_brute_force_topk_exact(self, vecs):
        out = S.brute_force_topk(
            _queries(vecs.filter("vec_id = 0")), vecs, "vec_id", "embedding", k=2
        ).collect()
        assert [r["neighbor_id"] for r in out] == [1, 5]
        assert out[0]["rank"] == 1 and out[1]["rank"] == 2
        assert out[0]["cosine"] > out[1]["cosine"]

    def test_topk_excludes_self(self, vecs):
        out = S.brute_force_topk(_queries(vecs), vecs, "vec_id", "embedding", k=3)
        assert out.filter("query_id = neighbor_id").count() == 0

    def test_lsh_topk_recall_on_near_identical(self, vecs):
        out = S.lsh_topk(
            _queries(vecs.filter("vec_id = 0")), vecs, "vec_id", "embedding",
            k=2, n_planes=6, n_tables=6,
        ).collect()
        assert out and out[0]["neighbor_id"] == 1

    def test_ivf_topk(self, vecs):
        cent, assigned = S.build_ivf_index(vecs, "vec_id", "embedding",
                                           n_centroids=3)
        assert cent.count() == 3
        # every corpus vector assigned to exactly one centroid
        assert assigned.count() == vecs.count()
        out = S.ivf_topk(
            _queries(vecs.filter("vec_id = 0")), cent, assigned,
            "vec_id", "embedding", k=2, nprobe=3,
        ).collect()
        # nprobe == n_centroids → exhaustive → must equal brute force
        assert [r["neighbor_id"] for r in out] == [1, 5]

    def test_ivf_build_tolerates_null_vectors(self, spark, vecs):
        """Null embeddings (dirty data) must not crash the driver-side
        centroid materialization; they're excluded from sampling."""
        dirty = vecs.unionByName(
            spark.createDataFrame(
                [(99, None)],
                vecs.schema,
            )
        )
        cent, assigned = S.build_ivf_index(dirty, "vec_id", "embedding",
                                           n_centroids=3)
        assert cent.count() == 3
        assert all(r["centroid_vec"] is not None for r in cent.collect())

    def test_ivf_build_empty_corpus(self, spark, vecs):
        cent, assigned = S.build_ivf_index(
            vecs.limit(0), "vec_id", "embedding", n_centroids=3
        )
        assert cent.count() == 0 and assigned.count() == 0


# ---------------------------------------------------------------------------
# text stats
# ---------------------------------------------------------------------------

class TestTextStats:
    def test_token_counts(self, spark):
        df = spark.createDataFrame(
            [("Hello world, it's 2026!",)], "t string"
        )
        row = df.select(
            T.token_count_ws("t").alias("ws"),
            T.token_count_bpe_ish("t").alias("bpe"),
        ).first()
        assert row["ws"] == 4
        # Hello|world|,|it|'|s|2026|! → 8 BPE-ish segments
        assert row["bpe"] == 8

    def test_language_id(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the cat sat on the mat and it was happy with this"),
                (2, "der hund ist nicht auf der straße und das ist gut"),
                (3, "le chat est dans la maison et il est pour nous"),
                (4, "xyzzy qwerty asdf"),
            ],
            "id long, t string",
        )
        got = {
            r["id"]: r["lang"]
            for r in df.select("id", T.detect_language("t").alias("lang")).collect()
        }
        assert got[1] == "en" and got[2] == "de" and got[3] == "fr"
        assert got[4] == "und"

    def test_quality_score_ordering(self, spark):
        good = ("This is a well formed paragraph of english text that has "
                "reasonable length and the usual function words in it for "
                "a quality check to pass with ease and it was good")
        bad = "@@@@ ???? !!!! #### %%%%"
        df = spark.createDataFrame([(1, good), (2, bad)], "id long, t string")
        got = {
            r["id"]: r["q"]
            for r in df.select("id", T.quality_score("t").alias("q")).collect()
        }
        assert got[1] > 0.8
        assert got[2] < 0.2

    def test_quality_profile_schema(self, docs):
        prof = T.text_quality_profile(docs.filter("text is not null"), "text")
        for c in ("n_chars", "n_tokens", "alpha_ratio", "punct_ratio",
                  "stopword_ratio", "mean_token_len", "quality_score",
                  "detected_lang"):
            assert c in prof.columns

    def test_fingerprints_shared_for_identical(self, spark):
        df = spark.createDataFrame(
            [(1, "some shared sentence appears here verbatim today"),
             (2, "some shared sentence appears here verbatim today"),
             (3, "completely different words live in this one now")],
            "doc_id long, text string",
        )
        pairs = T.fingerprint_overlap_pairs(df, "text", "doc_id", min_shared=1)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (1, 2) in got
        assert (1, 3) not in got

    def test_kgram_rows_md5_mode_selects_and_falls_back(self, spark):
        # md5 oracle mode: same "0 mod p" selection semantics as the
        # xxhash64 default — every doc ≥ k chars yields ≥1 print (fallback
        # min when nothing ≡ 0 mod p), and the hashes are the 60-bit
        # md5-derived values DuckDB can reproduce (dedup._md5num contract)
        import hashlib

        df = spark.createDataFrame(
            [(1, "The quick Brown fox jumps over the lazy dog"),
             (2, "tiny"), (3, None)],
            "doc_id long, text string",
        )
        rows = T.kgram_fingerprint_rows(
            df, "text", "doc_id", k=8, p=4, hash_fn="md5"
        ).collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r["__id"], set()).add(r["fp"])
        assert 1 in by_id and len(by_id[1]) >= 1
        assert 2 not in by_id and 3 not in by_id  # too short / null
        t = "the quick brown fox jumps over the lazy dog"
        expected = {
            int(hashlib.md5(t[i:i + 8].encode()).hexdigest()[:15], 16)
            for i in range(len(t) - 7)
        }
        sel = {h for h in expected if h % 4 == 0}
        assert by_id[1] == (sel or {min(expected)})
        with pytest.raises(ValueError):
            T.kgram_fingerprint_rows(df, "text", "doc_id", hash_fn="sha1")

    def test_document_fingerprint_normalizes(self, spark):
        df = spark.createDataFrame(
            [("Hello  World", "hello world")], "a string, b string"
        )
        row = df.select(
            T.document_fingerprint("a").alias("fa"),
            T.document_fingerprint("b").alias("fb"),
        ).first()
        assert row["fa"] == row["fb"]


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

class TestMultimodal:
    def test_decode_features_deterministic(self, spark):
        media = M.synthesize_media_table(spark, 16)
        f1 = {r["media_id"]: r["features"]
              for r in M.decode_image_features(media, dim=8).collect()}
        f2 = {r["media_id"]: r["features"]
              for r in M.decode_image_features(media, dim=8).collect()}
        assert f1 == f2
        assert all(len(v) == 8 for v in f1.values())
        # unit norm
        n = math.sqrt(sum(x * x for x in f1[0]))
        assert n == pytest.approx(1.0, abs=1e-5)

    def test_real_codec_flags_undecodable(self, spark):
        """codec='real' on non-image bytes: the ROW fails (decode_ok=0,
        zero features), the JOB survives — the validator convention.
        (Round 3 replaced the NotImplementedError stub with actual
        pure-numpy PPM/BMP decoding.)"""
        media = M.synthesize_media_table(spark, 2)  # sha256-text payloads
        rows = M.decode_image_features(media, codec="real").collect()
        assert all(r["decode_ok"] == 0 for r in rows)
        assert all(all(x == 0.0 for x in r["features"]) for r in rows)

    # ---- round-3 real codecs (pure numpy: PPM P6 / BMP 24-bit / WAV) ----

    def test_ppm_roundtrip(self):
        import numpy as np

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(7, 9, 3), dtype=np.uint8)
        payload = M.encode_ppm(img)
        assert payload.startswith(b"P6\n9 7\n255\n")
        back, end = M.decode_ppm(payload)
        assert end == len(payload)
        assert (back == img).all()
        # comment + multi-whitespace header form also parses
        weird = b"P6 # cmt\n 9\t7 # c2\n255\n" + img.tobytes()
        assert (M.decode_ppm(weird)[0] == img).all()

    def test_bmp_roundtrip_with_row_padding(self):
        import numpy as np

        rng = np.random.default_rng(6)
        # width 3 → row bytes 9 → 3 pad bytes per row: the classic bug site
        img = rng.integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
        payload = M.encode_bmp(img)
        assert payload[:2] == b"BM"
        assert (M.decode_bmp(payload) == img).all()

    def test_wav_roundtrip(self):
        import numpy as np

        rng = np.random.default_rng(7)
        mono = rng.integers(-32768, 32767, size=200, dtype=np.int16)
        samples, rate = M.decode_wav(M.encode_wav(mono, 8000))
        assert rate == 8000 and samples.shape == (200, 1)
        assert (samples[:, 0] == mono).all()
        stereo = rng.integers(-32768, 32767, size=(50, 2), dtype=np.int16)
        samples2, rate2 = M.decode_wav(M.encode_wav(stereo, 44100))
        assert rate2 == 44100 and samples2.shape == (50, 2)
        assert (samples2 == stereo).all()

    def test_wav_zero_channels_flags_not_kills(self, spark):
        """A corrupt fmt chunk declaring n_channels=0 (audio_fmt=1,
        bits=16 — passes the PCM16 check) must raise ValueError in
        decode_wav, NOT ZeroDivisionError, so decode_audio_stats flags
        the row instead of killing the job (round-3 advice regression)."""
        import numpy as np

        good = M.encode_wav(np.zeros(10, dtype=np.int16), 8000)
        # fmt chunk: bytes 20-21 audio_fmt, 22-23 n_channels, 24-27 rate
        zero_ch = bytearray(good)
        zero_ch[22:24] = b"\x00\x00"
        with pytest.raises(ValueError):
            M.decode_wav(bytes(zero_ch))
        zero_rate = bytearray(good)
        zero_rate[24:28] = b"\x00\x00\x00\x00"
        with pytest.raises(ValueError):
            M.decode_wav(bytes(zero_rate))
        media = spark.createDataFrame(
            [(0, good), (1, bytes(zero_ch)), (2, bytes(zero_rate))],
            "media_id long, media binary",
        )
        out = {r["media_id"]: r["decode_ok"]
               for r in M.decode_audio_stats(media).collect()}
        assert out == {0: 1, 1: 0, 2: 0}

    def test_real_resize_and_features(self, spark):
        import numpy as np

        imgs = [np.full((6, 8, 3), i * 40, dtype=np.uint8) for i in range(3)]
        media = spark.createDataFrame(
            [(i, M.encode_ppm(im)) for i, im in enumerate(imgs)],
            "media_id long, media binary",
        )
        out = {r["media_id"]: r for r in
               M.resize_images(media, 4, 3, codec="real").collect()}
        for i in range(3):
            back, _ = M.decode_ppm(bytes(out[i]["media"]))
            assert back.shape == (3, 4, 3)
            assert (back == i * 40).all()  # constant fill survives resample

        feats = {r["media_id"]: r for r in
                 M.decode_image_features(media, dim=8, codec="real").collect()}
        for i in range(3):
            assert feats[i]["decode_ok"] == 1
            w, h, mr = feats[i]["features"][:3]
            assert (w, h) == (8.0, 6.0)
            assert mr == pytest.approx(i * 40.0)

    def test_real_frame_sampling_concatenated_ppm(self, spark):
        import numpy as np

        frames = [np.full((2, 2, 3), v, dtype=np.uint8) for v in range(10)]
        stream = b"".join(M.encode_ppm(f) for f in frames)
        media = spark.createDataFrame(
            [(1, stream)], "media_id long, media binary"
        )
        out = sorted(
            M.sample_frames(media, 4, codec="real").collect(),
            key=lambda r: r["frame_idx"],
        )
        assert len(out) == 4
        vals = [M.decode_ppm(bytes(r["frame"]))[0][0, 0, 0] for r in out]
        assert vals == [0, 3, 6, 9]  # evenly spaced over the 10 frames

    def test_real_resize_and_frames_survive_bad_payloads(self, spark):
        """An undecodable payload must null/skip its OWN row, never kill
        the job — same convention as decode_image_stats."""
        import numpy as np

        good = M.encode_ppm(np.full((2, 2, 3), 9, dtype=np.uint8))
        media = spark.createDataFrame(
            [(0, good), (1, b"\x89PNG not really"), (2, b"P6\n2 2\n255\n\x00")],
            "media_id long, media binary",
        )
        out = {r["media_id"]: r["media"]
               for r in M.resize_images(media, 2, 2, codec="real").collect()}
        assert out[0] is not None and out[1] is None and out[2] is None

        frames = M.sample_frames(media, 2, codec="real").collect()
        assert {r["media_id"] for r in frames} == {0}

    def test_decode_stats_oracle_forms(self, spark):
        """decode_image_stats / decode_audio_stats recover the closed-form
        dims/fill the synth tables encode (the driver-oracle contract)."""
        ids = spark.range(0, 20).select(F.col("id").alias("media_id"))
        for fmt in ("ppm", "bmp"):
            stats = M.decode_image_stats(
                M.synthesize_real_image_table(ids, fmt=fmt)
            ).collect()
            for r in stats:
                i = r["media_id"]
                assert r["decode_ok"] == 1
                assert (r["width"], r["height"]) == (8 + i % 5, 6 + i % 3)
                assert r["mean_pixel"] == pytest.approx(float(i % 256))
        audio = M.decode_audio_stats(
            M.synthesize_real_audio_table(ids)
        ).collect()
        for r in audio:
            i = r["media_id"]
            assert r["decode_ok"] == 1
            assert r["n_samples"] == 100 + i % 50
            assert r["sample_rate"] == 16000 and r["n_channels"] == 1
            assert r["mean_abs"] == pytest.approx(abs((i % 1000) - 500))

    def test_resize_shape(self, spark):
        media = M.synthesize_media_table(spark, 4)
        out = M.resize_images(media, 10, 5).collect()
        assert all(len(r["media"]) == 10 * 5 * 3 for r in out)
        assert all(r["width"] == 10 and r["height"] == 5 for r in out)

    def test_frame_fanout(self, spark):
        media = M.synthesize_media_table(spark, 3)
        out = M.sample_frames(media, 5)
        assert out.count() == 15
        idx = out.groupBy("media_id").agg(
            F.collect_set("frame_idx").alias("s")
        ).collect()
        assert all(sorted(r["s"]) == [0, 1, 2, 3, 4] for r in idx)

    def test_media_schema(self, spark):
        media = M.synthesize_media_table(spark, 2)
        got = [(f.name, f.dataType.simpleString()) for f in media.schema.fields]
        want = [(f.name, f.dataType.simpleString()) for f in M.MEDIA_SCHEMA.fields]
        assert got == want


def test_brute_force_topk_arrow_matches_expression(spark):
    """Arrow/numpy path must return the same neighbors as the expression
    path (same data, same tie-breaks)."""
    from great_expectations_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_arrow,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.limit(6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = brute_force_topk(queries, emb, "vec_id", "embedding", k=5)
    b = brute_force_topk_arrow(queries, emb, "vec_id", "embedding", k=5)
    ra = sorted((r.query_id, r.rank, r.neighbor_id) for r in a.collect())
    rb = sorted((r.query_id, r.rank, r.neighbor_id) for r in b.collect())
    assert ra == rb


# ---------------------------------------------------------------------------
# decontamination (benchmark n-gram overlap)
# ---------------------------------------------------------------------------

class TestDecontamination:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            # 0: verbatim copy of the benchmark question (contaminated)
            (0, "What is the capital of France? The capital of France is Paris."),
            # 1: reformatted copy — casing/punct differ (still contaminated)
            (1, "what is the capital of FRANCE!!! the capital of france is paris"),
            # 2: shares a short phrase only (clean at n=5)
            (2, "The capital of France exports wine and aerospace parts."),
            # 3: unrelated (clean)
            (3, "Spark compiles declarative plans into whole stage codegen."),
            (4, None),
            (5, ""),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    @pytest.fixture(scope="class")
    def eval_set(self, spark):
        rows = [
            (100, "What is the capital of France? The capital of France is Paris."),
            (101, "How many legs does a spider have? A spider has eight legs."),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_contaminated_docs_flags_copies_only(self, corpus, eval_set):
        from great_expectations_spark.operators import decontamination as X

        got = {
            r["doc_id"]: r["hit_grams"]
            for r in X.contaminated_docs(corpus, eval_set, n=5).collect()
        }
        assert set(got) == {0, 1}
        # doc 0 and its reformatting normalize identically -> same hit count
        assert got[0] == got[1] > 0

    def test_hashed_mode_matches_raw(self, corpus, eval_set):
        from great_expectations_spark.operators import decontamination as X

        raw = sorted(
            X.contaminated_docs(corpus, eval_set, n=5, hash_fn="none").collect()
        )
        hashed = sorted(
            X.contaminated_docs(corpus, eval_set, n=5, hash_fn="xxhash64").collect()
        )
        assert raw == hashed

    def test_hashed_mode_matches_raw_randomized(self, spark):
        import random

        from great_expectations_spark.operators import decontamination as X

        rng = random.Random(99)
        vocab = ["the", "модель", "数据", "loss", "train", "Épreuve", "x9"]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
            for i in range(40)
        ]
        corpus = spark.createDataFrame(rows, "doc_id long, text string")
        bench = corpus.filter("doc_id % 7 = 0")
        raw = sorted(
            X.contaminated_docs(corpus, bench, n=3, hash_fn="none").collect()
        )
        hashed = sorted(
            X.contaminated_docs(corpus, bench, n=3, hash_fn="xxhash64").collect()
        )
        assert raw == hashed and len(raw) > 0

    def test_min_hits_threshold(self, corpus, eval_set):
        from great_expectations_spark.operators import decontamination as X

        all_hits = X.contaminated_docs(corpus, eval_set, n=5, min_hits=1)
        n_grams_doc0 = all_hits.filter("doc_id = 0").collect()[0]["hit_grams"]
        strict = X.contaminated_docs(
            corpus, eval_set, n=5, min_hits=n_grams_doc0 + 1
        )
        assert strict.count() == 0

    def test_decontaminate_removes_flagged(self, corpus, eval_set):
        from great_expectations_spark.operators import decontamination as X

        kept = sorted(
            r["doc_id"]
            for r in X.decontaminate(corpus, eval_set, n=5).collect()
        )
        assert kept == [2, 3, 4, 5]

    def test_decontaminate_broadcast_guard(self, corpus, eval_set):
        """The flagged-id set is unbounded, so decontaminate must not
        force-broadcast it (round-3 advice). Default → AQE decides;
        broadcast=False forbids the hint (sort-merge join on the anti
        side); broadcast=True forces it; all three return the same rows."""
        from great_expectations_spark.operators import decontamination as X

        expect = [2, 3, 4, 5]
        for bc in (None, True, False):
            kept = X.decontaminate(corpus, eval_set, n=5, broadcast=bc)
            assert sorted(r["doc_id"] for r in kept.collect()) == expect
        # optimized (pre-AQE) plan: no forced BroadcastExchange on the
        # anti-join by default, present when forced
        forced = X.decontaminate(corpus, eval_set, n=5, broadcast=True)
        plan_forced = forced._jdf.queryExecution().optimizedPlan().toString()
        assert "ResolvedHint" in plan_forced or "broadcast" in plan_forced.lower()
        forbid = X.decontaminate(corpus, eval_set, n=5, broadcast=False)
        plan_forbid = forbid._jdf.queryExecution().executedPlan().toString()
        anti = plan_forbid.split("LeftAnti")[0]
        assert "SortMergeJoin" in plan_forbid or "ShuffledHashJoin" in plan_forbid, (
            anti
        )

    def test_short_docs_cannot_be_contaminated(self, spark, eval_set):
        from great_expectations_spark.operators import decontamination as X

        tiny = spark.createDataFrame(
            [(0, "capital of France")], "doc_id long, text string"
        )
        assert X.contaminated_docs(tiny, eval_set, n=5).count() == 0

    def test_benchmark_side_is_broadcast(self, corpus, eval_set):
        from great_expectations_spark.operators import decontamination as X

        plan = X.contaminated_docs(corpus, eval_set, n=5)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        # the corpus (100 TB) side is the join's left child: its subtree —
        # the lines between BroadcastHashJoin and the BroadcastExchange
        # build side — must reach the join with NO exchange. (The benchmark
        # side's distinct and the post-join hit-count groupBy may shuffle;
        # both are tiny.)
        corpus_branch = plan.split("BroadcastHashJoin")[1].split(
            "BroadcastExchange"
        )[0]
        assert "Exchange hashpartitioning" not in corpus_branch, plan


# ---------------------------------------------------------------------------
# repetition profile (Gopher-style)
# ---------------------------------------------------------------------------

class TestRepetitionProfile:
    def test_duplicate_lines(self, spark):
        text = "alpha beta\ngamma delta\nalpha beta\n  \nepsilon"
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        row = T.repetition_profile(df, "text", "doc_id").collect()[0]
        # 4 non-empty lines, 3 distinct; 'alpha beta' (10 chars) twice
        assert row["n_lines"] == 4
        assert row["dup_line_frac"] == pytest.approx(1 / 4)
        line_chars = 10 + 11 + 10 + 7
        assert row["dup_line_char_frac"] == pytest.approx(20 / line_chars)

    def test_top_and_dup_ngram_fracs(self, spark):
        # 'a b' bigram occurs 3x in 'a b a b a b' (len 11)
        df = spark.createDataFrame(
            [(1, "a b a b a b")], "doc_id long, text string"
        )
        row = T.repetition_profile(
            df, "text", "doc_id", top_ns=(2,), dup_ns=(2,)
        ).collect()[0]
        # bigrams: 'a b' x3 (cov 9), 'b a' x2 (cov 6) -> top = 9/11
        assert row["top_2gram_char_frac"] == pytest.approx(9 / 11)
        # dup coverage = 9 + 6 = 15/11 (overlaps not de-overlapped; >1 ok)
        assert row["dup_2gram_char_frac"] == pytest.approx(15 / 11)

    def test_clean_doc_scores_zero(self, spark):
        df = spark.createDataFrame(
            [(1, "every word here is used exactly once today")],
            "doc_id long, text string",
        )
        row = T.repetition_profile(
            df, "text", "doc_id", top_ns=(2,), dup_ns=(2,)
        ).collect()[0]
        assert row["dup_line_frac"] == 0.0
        assert row["dup_2gram_char_frac"] == 0.0
        assert 0.0 < row["top_2gram_char_frac"] < 0.5

    def test_one_row_per_doc_and_empty_text(self, spark):
        df = spark.createDataFrame(
            [(1, "x y x y"), (2, ""), (3, None)], "doc_id long, text string"
        )
        out = T.repetition_profile(df, "text", "doc_id").collect()
        assert sorted(r["doc_id"] for r in out) == [1, 2]
        empty = [r for r in out if r["doc_id"] == 2][0]
        assert empty["n_lines"] == 0 and empty["dup_line_frac"] == 0.0

    def test_rowlocal_equals_shuffle(self, spark):
        rows = [
            (1, "a b a b a b"),
            (2, "alpha beta\ngamma delta\nalpha beta\n  \nepsilon"),
            (3, "every word here is used exactly once today"),
            (4, ""),
            (5, None),
            (6, "x\nx\nx\nx"),
            (7, "tie tie tie longword longword"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        kw = dict(top_ns=(1, 2), dup_ns=(2, 3))
        a = T.repetition_profile(
            df, "text", "doc_id", strategy="shuffle", **kw
        )
        b = T.repetition_profile(
            df, "text", "doc_id", strategy="rowlocal", **kw
        )
        assert a.columns == b.columns
        ra = {r["doc_id"]: r for r in a.collect()}
        rb = {r["doc_id"]: r for r in b.collect()}
        assert set(ra) == set(rb)
        for k in ra:
            for c in a.columns:
                assert ra[k][c] == pytest.approx(rb[k][c]), (k, c)

    def test_rowlocal_equals_shuffle_randomized(self, spark):
        import random

        rng = random.Random(1234)
        vocab = ["alpha", "beta", "gamma", "δδ", "ночь", "模型", "x", "longestword"]
        rows = []
        for i in range(30):
            n_words = rng.randint(0, 25)
            words = [rng.choice(vocab) for _ in range(n_words)]
            # inject newlines so line stats exercise too
            text = " ".join(words)
            if n_words > 4 and rng.random() < 0.5:
                text = text.replace(" ", "\n", rng.randint(1, 3))
            rows.append((i, text))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        kw = dict(top_ns=(2, 3), dup_ns=(2,))
        a = {r["doc_id"]: r for r in T.repetition_profile(
            df, "text", "doc_id", strategy="shuffle", **kw).collect()}
        b = {r["doc_id"]: r for r in T.repetition_profile(
            df, "text", "doc_id", strategy="rowlocal", **kw).collect()}
        assert set(a) == set(b)
        cols = T.repetition_profile(df, "text", "doc_id", **kw).columns
        for k in a:
            for c in cols:
                assert a[k][c] == pytest.approx(b[k][c]), (k, c, rows[k])

    def test_rowlocal_plan_is_shuffle_free(self, spark):
        df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
        plan = T.repetition_profile(
            df, "text", "doc_id", strategy="rowlocal"
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Generate" not in plan

    def test_bad_strategy_rejected(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="strategy"):
            T.repetition_profile(df, "text", "doc_id", strategy="nope")


class TestDecodersRejectCorruptHeaders:
    """struct.error must never escape the decoders — a truncated header is
    a ValueError (the kernels' row-level contract), not a job-killer."""

    def test_truncated_bmp_header_rows_flag_not_raise(self, spark):
        media = spark.createDataFrame(
            [(0, b"BM" + b"\x00" * 8), (1, b"RIFF\x00\x00")],
            "media_id long, media binary",
        )
        out = {r["media_id"]: r["decode_ok"]
               for r in M.decode_image_stats(media).collect()}
        assert out == {0: 0, 1: 0}

    def test_truncated_wav_rows_flag_not_raise(self, spark):
        import struct

        trunc = (
            b"RIFF" + struct.pack("<I", 20) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + b"\x01\x00"  # cut mid-fmt
        )
        odd_data = M.encode_wav(__import__("numpy").zeros(4, dtype="<i2"), 8000)
        odd_data = odd_data[:-1]  # data chunk no longer whole frames
        media = spark.createDataFrame(
            [(0, trunc), (1, odd_data), (2, b"BM")],
            "media_id long, media binary",
        )
        out = {r["media_id"]: r["decode_ok"]
               for r in M.decode_audio_stats(media).collect()}
        assert out == {0: 0, 1: 0, 2: 0}


def test_decontamination_is_unicode_aware(spark):
    """A verbatim Cyrillic benchmark copy must be flagged — an ASCII-only
    normalization silently scoped the gate to English."""
    from great_expectations_spark.operators import decontamination as X

    corpus = spark.createDataFrame(
        [
            (0, "Столица Франции — Париж, и она стоит на Сене!"),
            (1, "совершенно другой текст о синих китах в океане сегодня"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "столица франции париж и она стоит на сене")],
        "doc_id long, text string",
    )
    flagged = [r["doc_id"] for r in
               X.contaminated_docs(corpus, bench, n=5).collect()]
    assert flagged == [0]
