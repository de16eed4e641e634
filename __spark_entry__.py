"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: a full expectation-suite run (the engine's
production path) over the sf0.001 tables, returning the EVR table.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, each checked against DuckDB on the same parquet at sf0.01.
Column names are aliased identically on both sides (the driver hashes values
after sorting columns by name).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Full constraint-suite run on sf0.001 → EVR table.

    Exercises the engine end-to-end: planner → ONE bundled agg pass per
    domain + salted-groupBy uniqueness + left-anti referential join →
    EVR rows (SURVEY.md §3 entry point B).
    """
    from great_expectations_spark import ExpectationSuite, SuiteRunner

    sf_dir = "/root/testdata/sf0.001"
    lineitem = _load(spark, sf_dir, "lineitem")
    customer = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders")

    suite = ExpectationSuite("flagship")
    suite.add("expect_column_values_to_not_be_null", column="l_orderkey")
    suite.add("expect_column_values_to_be_between", column="l_discount",
              min_value=0.0, max_value=0.1)
    suite.add("expect_column_values_to_be_in_set", column="l_returnflag",
              value_set=["A", "N", "R"])
    suite.add("expect_column_mean_to_be_between", column="l_quantity",
              min_value=1.0, max_value=50.0)
    suite.add("expect_column_quantile_values_to_be_between", column="l_extendedprice",
              quantile_ranges={"quantiles": [0.5], "value_ranges": [[0.0, None]]})
    suite.add("expect_compound_columns_to_be_unique",
              column_list=["l_orderkey", "l_linenumber"])
    suite.add("expect_table_row_count_to_be_between", min_value=1)

    runner = SuiteRunner(spark, tables={"customer": customer, "orders": orders})
    result = runner.validate(lineitem, suite)

    rows = [
        (
            r.expectation_config["expectation_type"],
            bool(r.success),
            int(r.result.get("element_count") or 0),
            int(r.result.get("unexpected_count") or 0),
            str(r.result.get("observed_value")),
        )
        for r in result.results
    ]
    return spark.createDataFrame(
        rows,
        "expectation_type string, success boolean, element_count long, "
        "unexpected_count long, observed_value string",
    )


# ---------------------------------------------------------------------------
# operator queries + DuckDB oracles
# ---------------------------------------------------------------------------

def _unexpected_count_df(df: DataFrame, cond) -> DataFrame:
    return df.agg(
        F.sum(F.when(cond.unexpected, 1).otherwise(0))
        .cast("long")
        .alias("unexpected_count")
    )


def q_map_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    from great_expectations_spark.functions import conditions as C

    ev = _load(spark, sf_dir, "events")
    return _unexpected_count_df(ev, C.not_be_null("props"))


def q_map_in_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    from great_expectations_spark.functions import conditions as C

    ev = _load(spark, sf_dir, "events")
    cond = C.be_in_set("event_type", ["click", "view", "purchase"])
    return _unexpected_count_df(ev, cond)


def q_map_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    from great_expectations_spark.functions import conditions as C

    li = _load(spark, sf_dir, "lineitem")
    cond = C.be_between("l_discount", min_value=0.0, max_value=0.05)
    return _unexpected_count_df(li, cond)


def q_map_value_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    from great_expectations_spark.functions import conditions as C

    docs = _load(spark, sf_dir, "documents")
    cond = C.value_lengths_be_between("text", min_value=20, max_value=500)
    return _unexpected_count_df(docs, cond)


def q_map_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from great_expectations_spark.functions import conditions as C

    docs = _load(spark, sf_dir, "documents")
    cond = C.match_regex("text", r"^[a-z ]+$")
    return _unexpected_count_df(docs, cond)


def q_agg_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bundled aggregate metrics, grouped — mean/sum/min/max/count over an
    exact-in-floating-point domain (l_quantity is integral)."""
    li = _load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        F.avg("l_quantity").alias("mean_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


def q_unique_dup_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """column_values.unique semantics: rows whose key value occurs more than
    once (ALL rows of a duplicated value are unexpected) — via the salted
    two-level groupBy, never a full-table window (SURVEY.md §4.3)."""
    from great_expectations_spark.skew import salted_value_counts

    orders = _load(spark, sf_dir, "orders")
    vc = salted_value_counts(orders.filter(F.col("o_custkey").isNotNull()), ["o_custkey"])
    return vc.filter(F.col("count") > 1).agg(
        F.coalesce(F.sum("count"), F.lit(0)).cast("long").alias("unexpected_count"),
        F.count(F.lit(1)).cast("long").alias("duplicate_key_count"),
    )


def q_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential check via broadcast LEFT-ANTI join (SURVEY.md §2.7)."""
    orders = _load(spark, sf_dir, "orders")
    customer = _load(spark, sf_dir, "customer")
    dim = customer.select(F.col("c_custkey").alias("o_custkey")).distinct()
    orphans = orders.filter(F.col("o_custkey").isNotNull()).join(
        F.broadcast(dim), on="o_custkey", how="left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("unexpected_count"))


def q_table_row_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).cast("long").alias("row_count"))


def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events")
    return ev.agg(F.countDistinct("event_type").cast("long").alias("distinct_count"))


def q_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """column.value_counts — ordered by value for EVR determinism
    (SURVEY.md §2.9)."""
    ev = _load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# training-data pipeline operators (operators/)
# ---------------------------------------------------------------------------

def q_exact_dedup_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text — rows kept (operators/dedup.py)."""
    from great_expectations_spark.operators.dedup import exact_dedup

    docs = _load(spark, sf_dir, "documents")
    kept = exact_dedup(docs, "text", "doc_id")
    return kept.agg(F.count(F.lit(1)).cast("long").alias("kept_rows"))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token totals: whitespace + BPE-ish regex segmentation
    (operators/textstats.py)."""
    from great_expectations_spark.operators import textstats as T

    docs = _load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return docs.agg(
        F.sum(T.token_count_ws("text")).cast("long").alias("ws_tokens"),
        F.sum(T.token_count_bpe_ish("text")).cast("long").alias("bpe_tokens"),
    )


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate: docs passing alpha-ratio ≥ 0.6 AND ≥ 20 ws-tokens."""
    from great_expectations_spark.operators import textstats as T

    docs = _load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    feats = T.quality_features(F.col("text"))
    passing = docs.filter(
        (feats["alpha_ratio"] >= 0.6) & (feats["n_tokens"] >= 20)
    )
    return passing.agg(F.count(F.lit(1)).cast("long").alias("passing_docs"))


def q_lang_en_stopword_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs whose English-stopword hit fraction ≥ 0.05 (the 'en' vote of
    the stopword-profile language ID)."""
    from great_expectations_spark.operators.textstats import (
        STOPWORD_PROFILES,
        tokens,
    )

    docs = _load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = tokens("text")
    sw = F.array(*[F.lit(w) for w in STOPWORD_PROFILES["en"]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    ratio = F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))
    return (
        docs.filter(ratio >= 0.05)
        .agg(F.count(F.lit(1)).cast("long").alias("en_docs"))
    )


def q_cosine_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup pair count at cosine ≥ 0.95 (the
    brute-force correctness baseline of operators/dedup.py; the LSH variant
    is the scale path, checked rows-only below)."""
    from great_expectations_spark.operators.dedup import (
        embedding_near_duplicates,
    )

    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pairs = embedding_near_duplicates(
        emb, "vec_id", "embedding", min_cosine=0.95, exact=True
    )
    return pairs.agg(F.count(F.lit(1)).cast("long").alias("dup_pairs"))


def q_ann_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-1 neighbor for the first 8 vectors."""
    from great_expectations_spark.operators.similarity import brute_force_topk

    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = brute_force_topk(q, emb, "vec_id", "embedding", k=1)
    return top.select("query_id", "neighbor_id").orderBy("query_id")


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (xxhash64-based → no SQL oracle;
    rows-only driver check)."""
    from great_expectations_spark.operators.dedup import minhash_lsh_candidates

    docs = _load(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(
        docs, "text", "doc_id", n_hashes=64, bands=16, shingle_size=4,
        min_jaccard=0.8,
    )
    return cand.agg(F.count(F.lit(1)).cast("long").alias("candidate_pairs"))


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance 3 (rows-only)."""
    from great_expectations_spark.operators.dedup import simhash_candidates

    docs = _load(spark, sf_dir, "documents")
    pairs = simhash_candidates(docs, "text", "doc_id", max_hamming=3)
    return pairs.agg(F.count(F.lit(1)).cast("long").alias("simhash_pairs"))


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end (rows-only — stubbed codec per round
    brief): synthesize a deterministic binary media table, decode to
    feature vectors via Arrow mapInPandas, return per-format decode stats
    (operators/multimodal.py). No SQL oracle: the fake encoder is
    sha256+numpy, not expressible in DuckDB."""
    from great_expectations_spark.operators.multimodal import (
        decode_image_features,
        synthesize_media_table,
    )

    media = synthesize_media_table(spark, n_rows=128, seed=42)
    feats = decode_image_features(media, dim=16)
    return feats.agg(
        F.count(F.lit(1)).cast("long").alias("decoded_rows"),
        F.sum("decode_ok").cast("long").alias("decode_ok"),
        F.round(F.sum(F.aggregate(
            "features", F.lit(0.0),
            lambda acc, x: acc + (x * x).cast("double"),
        )), 3).alias("sum_sq_norm"),
    )


def q_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantiles through the engine's quantile metric
    (functions/aggregates.py::quantile_values, approximate=False — Spark
    ``percentile``, linear interpolation, same as DuckDB quantile_cont)."""
    from great_expectations_spark.functions.aggregates import quantile_values

    li = _load(spark, sf_dir, "lineitem")
    m = quantile_values("l_quantity", [0.25, 0.5, 0.75], approximate=False)
    vals = li.agg(*[e.alias(a) for a, e in m.exprs.items()]).collect()[0].asDict()
    q25, q50, q75 = [round(float(x), 6) for x in m.finalize(vals)]
    return spark.createDataFrame([(q25, q50, q75)],
                                 "q25 double, q50 double, q75 double")


def q_kl_categorical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical KL divergence of l_returnflag vs a uniform 3-way baseline
    (profile.py::_categorical_kl — the engine's bundled-agg KL path),
    rounded to 6dp on both sides to make the float hash-comparable."""
    from great_expectations_spark.profile import kl_divergence_metric

    li = _load(spark, sf_dir, "lineitem")
    baseline = {"values": ["A", "N", "R"], "weights": [1 / 3, 1 / 3, 1 / 3]}
    metric = kl_divergence_metric("l_returnflag", baseline)
    vals = li.agg(*[e.alias(a) for a, e in metric.exprs.items()]).collect()[0].asDict()
    kl = float(metric.finalize(vals))
    return spark.createDataFrame([(round(kl, 6),)], "kl double")


def q_ann_top1_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/numpy brute-force top-1 (operators/similarity.py::
    brute_force_topk_arrow) — BLAS matmul per Arrow batch with
    partition-local top-k; same oracle as the expression path."""
    from great_expectations_spark.operators.similarity import brute_force_topk_arrow

    emb = _load(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = brute_force_topk_arrow(queries_df, emb, id_col="vec_id",
                                 vec_col="embedding", k=1)
    return top.select("query_id", "neighbor_id").orderBy("query_id")


def q_ann_ivf_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with nprobe = all centroids — exhaustive probing makes IVF
    EXACT, so the brute-force cosine top-1 SQL oracle applies; this checks
    the whole index-build + probe + score path end-to-end
    (operators/similarity.py::build_ivf_index / ivf_topk)."""
    from great_expectations_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
    )

    emb = _load(spark, sf_dir, "embeddings")
    centroids, assigned = build_ivf_index(emb, "vec_id", "embedding",
                                          n_centroids=16)
    queries_df = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = ivf_topk(queries_df, centroids, assigned, "vec_id", "embedding",
                   k=1, nprobe=16)
    return top.select("query_id", "neighbor_id").orderBy("query_id")


def q_split_mod_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_on_mod_integer batch slice — row count of residue class 3 of 8
    (sources/splitters.py; SURVEY.md §2.2 splitters row)."""
    from great_expectations_spark.sources import splitters

    orders = _load(spark, sf_dir, "orders")
    part = splitters.split_on_mod_integer(orders, "o_orderkey", 8, {"o_orderkey": 3})
    return part.agg(F.count(F.lit(1)).cast("long").alias("batch_rows"))


def q_split_year_month_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part split discovery — per-(year,month) batch sizes over events.ts
    (sources/splitters.py split_on_year_and_month)."""
    ev = _load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(
            F.year("ts").cast("long").alias("yr"),
            F.month("ts").cast("long").alias("mth"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("batch_rows"))
        .orderBy("yr", "mth")
    )


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sample_using_hash — md5-suffix content-stable sample (sources/
    samplers.py; native F.md5, bit-identical to the reference's hashlib)."""
    from great_expectations_spark.sources import samplers

    ev = _load(spark, sf_dir, "events")
    s = samplers.sample_using_hash(ev, "event_id", hash_digits=1, hash_value="a")
    return s.agg(F.count(F.lit(1)).cast("long").alias("sample_rows"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "map_not_null": q_map_not_null,
        "map_in_set": q_map_in_set,
        "map_between": q_map_between,
        "map_value_length": q_map_value_length,
        "map_regex": q_map_regex,
        "agg_profile": q_agg_profile,
        "unique_dup_rows": q_unique_dup_rows,
        "referential_orphans": q_referential_orphans,
        "table_row_count": q_table_row_count,
        "distinct_count": q_distinct_count,
        "value_counts": q_value_counts,
        "exact_dedup_kept": q_exact_dedup_kept,
        "token_counts": q_token_counts,
        "quality_filter": q_quality_filter,
        "lang_en_stopword_gate": q_lang_en_stopword_gate,
        "cosine_dup_pairs": q_cosine_dup_pairs,
        "ann_top1": q_ann_top1,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "media_features": q_media_features,
        "quantiles_exact": q_quantiles_exact,
        "kl_categorical": q_kl_categorical,
        "ann_top1_arrow": q_ann_top1_arrow,
        "ann_ivf_top1": q_ann_ivf_top1,
        "split_mod_batch": q_split_mod_batch,
        "split_year_month_counts": q_split_year_month_counts,
        "hash_sample": q_hash_sample,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "map_not_null": (
            "SELECT CAST(count(*) FILTER (WHERE props IS NULL) AS BIGINT)"
            " AS unexpected_count FROM events"
        ),
        "map_in_set": (
            "SELECT CAST(count(*) FILTER (WHERE event_type IS NOT NULL AND "
            "event_type NOT IN ('click','view','purchase')) AS BIGINT)"
            " AS unexpected_count FROM events"
        ),
        "map_between": (
            "SELECT CAST(count(*) FILTER (WHERE l_discount IS NOT NULL AND "
            "NOT (l_discount >= 0.0 AND l_discount <= 0.05)) AS BIGINT)"
            " AS unexpected_count FROM lineitem"
        ),
        "map_value_length": (
            "SELECT CAST(count(*) FILTER (WHERE text IS NOT NULL AND "
            "NOT (length(text) >= 20 AND length(text) <= 500)) AS BIGINT)"
            " AS unexpected_count FROM documents"
        ),
        "map_regex": (
            "SELECT CAST(count(*) FILTER (WHERE text IS NOT NULL AND "
            "NOT regexp_matches(text, '^[a-z ]+$')) AS BIGINT)"
            " AS unexpected_count FROM documents"
        ),
        "agg_profile": (
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows, "
            "sum(l_quantity) AS sum_qty, avg(l_quantity) AS mean_qty, "
            "min(l_quantity) AS min_qty, max(l_quantity) AS max_qty "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "unique_dup_rows": (
            "WITH vc AS (SELECT o_custkey, count(*) AS cnt FROM orders "
            "WHERE o_custkey IS NOT NULL GROUP BY o_custkey) "
            "SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS unexpected_count, "
            "CAST(count(*) AS BIGINT) AS duplicate_key_count FROM vc WHERE cnt > 1"
        ),
        "referential_orphans": (
            "SELECT CAST(count(*) AS BIGINT) AS unexpected_count FROM orders "
            "WHERE o_custkey IS NOT NULL AND o_custkey NOT IN "
            "(SELECT c_custkey FROM customer)"
        ),
        "table_row_count": (
            "SELECT CAST(count(*) AS BIGINT) AS row_count FROM lineitem"
        ),
        "distinct_count": (
            "SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS distinct_count "
            "FROM events"
        ),
        "value_counts": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS count FROM events "
            "WHERE event_type IS NOT NULL GROUP BY event_type ORDER BY event_type"
        ),
        "exact_dedup_kept": (
            "SELECT CAST(count(DISTINCT regexp_replace(lower(trim(text)), "
            "'\\s+', ' ', 'g')) + count(*) FILTER (WHERE text IS NULL) AS BIGINT)"
            " AS kept_rows FROM documents"
        ),
        "token_counts": (
            "SELECT CAST(sum(len(list_filter(string_split_regex(lower(trim(text)),"
            " '\\s+'), x -> len(x) > 0))) AS BIGINT) AS ws_tokens, "
            "CAST(sum(len(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]'))) AS BIGINT) AS bpe_tokens "
            "FROM documents WHERE text IS NOT NULL"
        ),
        "quality_filter": (
            "SELECT CAST(count(*) AS BIGINT) AS passing_docs FROM documents "
            "WHERE text IS NOT NULL "
            "AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))"
            " >= 0.6 * length(text) "
            "AND len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),"
            " x -> len(x) > 0)) >= 20"
        ),
        "lang_en_stopword_gate": (
            "WITH t AS (SELECT list_filter(string_split_regex(lower(trim(text)),"
            " '\\s+'), x -> len(x) > 0) AS toks FROM documents"
            " WHERE text IS NOT NULL) "
            "SELECT CAST(count(*) AS BIGINT) AS en_docs FROM t WHERE"
            " len(toks) > 0 AND len(list_filter(toks, x -> x IN ("
            "'the','of','and','to','in','is','it','you','that','was','for',"
            "'on','are','with','as','this','have','from','they')))"
            " >= 0.05 * len(toks)"
        ),
        "cosine_dup_pairs": (
            "SELECT CAST(count(*) AS BIGINT) AS dup_pairs FROM embeddings a "
            "JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95"
        ),
        "ann_top1": (
            "SELECT query_id, neighbor_id FROM ("
            "SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, "
            "row_number() OVER (PARTITION BY a.vec_id ORDER BY "
            "list_cosine_similarity(a.embedding, b.embedding) DESC,"
            " b.vec_id ASC) AS rnk "
            "FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id "
            "WHERE a.vec_id < 8) WHERE rnk = 1 ORDER BY query_id"
        ),
        "quantiles_exact": (
            "SELECT round(quantile_cont(l_quantity, 0.25), 6) AS q25, "
            "round(quantile_cont(l_quantity, 0.5), 6) AS q50, "
            "round(quantile_cont(l_quantity, 0.75), 6) AS q75 FROM lineitem"
        ),
        "kl_categorical": (
            "WITH c AS (SELECT l_returnflag AS v, CAST(count(*) AS DOUBLE) AS n "
            "FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY 1), "
            "t AS (SELECT sum(n) AS s FROM c) "
            "SELECT round(SUM((n/s) * ln((n/s) / (1.0/3))), 6) AS kl FROM c, t"
        ),
        "ann_top1_arrow": (
            "SELECT query_id, neighbor_id FROM ("
            "SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, "
            "row_number() OVER (PARTITION BY a.vec_id ORDER BY "
            "list_cosine_similarity(a.embedding, b.embedding) DESC,"
            " b.vec_id ASC) AS rnk "
            "FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id "
            "WHERE a.vec_id < 8) WHERE rnk = 1 ORDER BY query_id"
        ),
        "ann_ivf_top1": (
            "SELECT query_id, neighbor_id FROM ("
            "SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, "
            "row_number() OVER (PARTITION BY a.vec_id ORDER BY "
            "list_cosine_similarity(a.embedding, b.embedding) DESC,"
            " b.vec_id ASC) AS rnk "
            "FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id "
            "WHERE a.vec_id < 8) WHERE rnk = 1 ORDER BY query_id"
        ),
        "split_mod_batch": (
            "SELECT CAST(count(*) AS BIGINT) AS batch_rows FROM orders "
            "WHERE o_orderkey % 8 = 3"
        ),
        "split_year_month_counts": (
            "SELECT CAST(year(ts) AS BIGINT) AS yr, "
            "CAST(month(ts) AS BIGINT) AS mth, "
            "CAST(count(*) AS BIGINT) AS batch_rows FROM events "
            "WHERE ts IS NOT NULL GROUP BY 1, 2 ORDER BY yr, mth"
        ),
        "hash_sample": (
            "SELECT CAST(count(*) AS BIGINT) AS sample_rows FROM events "
            "WHERE md5(CAST(event_id AS VARCHAR)) LIKE '%a'"
        ),
        # minhash_pairs / simhash_pairs: xxhash64-based signatures are not
        # reproducible in DuckDB SQL → rows-only driver check (by design).
    }
