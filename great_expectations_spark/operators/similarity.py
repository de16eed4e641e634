"""Approximate-nearest-neighbor search over an embedding column.

Three strategies, all pure DataFrame programs:

- :func:`brute_force_topk` — exact cosine top-k; the correctness baseline.
  Queries are broadcast (they are the small side by construction), so the
  corpus scan is a single pass with no corpus-side shuffle; the only shuffle
  is the per-query top-k aggregation.
- :func:`lsh_topk` — SRP (sign-random-projection) bucketing; candidates are
  corpus vectors sharing ≥1 of ``n_tables`` signatures with the query.
  Recall tunable by tables × planes.
- :func:`ivf_topk` — IVF-Flat: deterministic centroid sample, corpus
  assigned to nearest centroid once (materialize/persist for repeated
  query batches), queries probe the ``nprobe`` nearest centroids only —
  the scale path: scan cost drops to nprobe/n_centroids of the corpus.

Top-k extraction avoids a global sort: per-query ``min_by``-style
aggregation of a (sim, id) struct array would still collect k·|queries|
rows; we use a window ranked by similarity *within each query partition* —
the shuffle is keyed by query_id (uniform, small fan-in) and
``TakeOrderedAndProject``-equivalent pruning happens in the ranked filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from great_expectations_spark.operators.dedup import (
    cosine_similarity,
    hyperplane_signature,
)


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query batch against the corpus.

    Returns (query_id, neighbor_id, cosine, rank). One corpus scan per
    query *batch* (not per query) — batch your queries.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("__qv"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = c.crossJoin(q).withColumn(
        "cosine", cosine_similarity(F.col("__qv"), F.col("__cv"))
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    return _topk_per_query(scored, k)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """SRP-LSH top-k: ``n_tables`` independent signatures; a corpus vector
    is a candidate iff it collides with the query in ≥1 table. Exact cosine
    is computed only on candidates (recall < 1, cost ≪ brute force)."""

    def signatures(df: DataFrame, idc: str, vc: str, side: str) -> DataFrame:
        sig_structs = [
            F.struct(
                F.lit(t).alias("table"),
                hyperplane_signature(vc, n_planes, seed + 1000 * t).alias("sig"),
            )
            for t in range(n_tables)
        ]
        return df.select(
            F.col(idc).alias(f"{side}_id"),
            F.col(vc).alias(f"__{side}v"),
            F.explode(F.array(*sig_structs)).alias("tk"),
        ).select(
            f"{side}_id", f"__{side}v", F.col("tk.table"), F.col("tk.sig")
        )

    qs = signatures(
        queries.select(
            F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
        ),
        "qid",
        "qv",
        "query",
    )
    cs = signatures(
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")),
        "cid",
        "cv",
        "corpus",
    )
    cand = (
        cs.join(F.broadcast(qs), on=["table", "sig"])
        .select(
            F.col("query_id"),
            F.col("corpus_id").alias("neighbor_id"),
            "__queryv",
            "__corpusv",
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine", cosine_similarity(F.col("__queryv"), F.col("__corpusv"))
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    return _topk_per_query(scored, k)


def build_ivf_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """IVF index build — both passes scale-shaped:

    1. **Centroid sample**: the ``n_centroids`` corpus rows with the smallest
       ``xxhash64(id)`` — seedless, deterministic, order-independent. Spark
       plans ``orderBy(h).limit(k)`` as ``TakeOrderedAndProject``: each task
       keeps a local top-k heap and the driver merges k·tasks candidate
       rows — NO global sort, NO single-partition shuffle of the corpus
       (the round-1 ``Window.orderBy`` build shuffled everything into one
       task). The k winning vectors are collected to the driver (k is the
       user-chosen centroid count, small by construction) and embedded as
       literals.
    2. **Assignment**: per-row argmax over the k literal centroid vectors —
       one narrow projection, ZERO shuffle (round 1 exploded n·k rows
       through a window). Ties break toward the smallest centroid_id via
       the (sim, -cid) struct-max ordering.

    Returns (centroids(centroid_id, centroid_vec),
             assigned(centroid_id, id, vec)). Persist ``assigned`` (or write
    it bucketed by centroid_id) when serving repeated query batches.
    """
    hashed = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.xxhash64(F.col(id_col).cast("string")).alias("__h"),
        F.col(vec_col).alias("centroid_vec"),
    )
    k_rows = hashed.orderBy("__h", "centroid_vec").limit(n_centroids).collect()
    spark = corpus.sparkSession
    vec_type = corpus.schema[vec_col].dataType
    from pyspark.sql.types import IntegerType, StructField, StructType

    centroids = spark.createDataFrame(
        [(i + 1, list(r["centroid_vec"])) for i, r in enumerate(k_rows)],
        StructType(
            [
                StructField("centroid_id", IntegerType(), False),
                StructField("centroid_vec", vec_type, False),
            ]
        ),
    )
    if not k_rows:
        # empty (or all-null-vector) corpus: empty index, empty assignment
        assigned = corpus.select(
            F.lit(None).cast("int").alias("centroid_id"),
            F.col(id_col),
            F.col(vec_col),
        ).limit(0)
        return centroids, assigned
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    cosine_similarity(
                        F.col(vec_col), F.lit(list(r["centroid_vec"]))
                    ).alias("s"),
                    F.lit(-(i + 1)).alias("ncid"),
                )
                for i, r in enumerate(k_rows)
            ]
        )
    )
    assigned = corpus.select(
        (-best["ncid"]).alias("centroid_id"), F.col(id_col), F.col(vec_col)
    )
    return centroids, assigned


def ivf_topk(
    queries: DataFrame,
    centroids: DataFrame,
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 8,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF search: each query probes its ``nprobe`` nearest centroids and
    scores only the vectors assigned to them (inner join on centroid_id —
    Catalyst broadcasts the tiny query×probe side)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qv"),
    )
    qc = q.crossJoin(F.broadcast(centroids)).withColumn(
        "__csim", cosine_similarity(F.col("__qv"), F.col("centroid_vec"))
    )
    wprobe = Window.partitionBy("query_id").orderBy(
        F.desc("__csim"), "centroid_id"
    )
    probes = (
        qc.withColumn("__r", F.row_number().over(wprobe))
        .filter(F.col("__r") <= nprobe)
        .select("query_id", "__qv", "centroid_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), on="centroid_id")
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine_similarity(F.col("__qv"), F.col(vec_col)).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    return _topk_per_query(scored, k)


def brute_force_topk_arrow(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    exclude_self: bool = True,
    max_queries: int = 10_000,
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy matmul — the throughput
    path for dense vectors.

    The expression form (:func:`brute_force_topk`) evaluates the dot product
    with ``zip_with``/``aggregate`` HOFs, which Catalyst interprets per
    component (~|q|·|corpus|·dim lambda evals). Here the (small) query batch
    is collected once, L2-normalized into a numpy matrix, and captured by a
    ``mapInPandas`` closure (serialized into the task — the moral equivalent
    of a broadcast; swap in ``sparkContext.broadcast`` if query batches grow
    toward ``max_queries``); each Arrow batch of the corpus computes one
    BLAS ``M @ Q.T`` and emits only its PARTITION-LOCAL top-k per query, so
    the shuffle into the global top-k window carries ≤ |q|·k rows per batch
    regardless of corpus size. Corpus-side parallelism is the file/partition
    layout — no corpus shuffle at all.
    """
    import numpy as np
    import pandas as pd

    qrows = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
    ).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"{len(qrows)} queries > max_queries={max_queries}; "
            "batch your queries (each batch is one corpus pass)"
        )
    qids = np.array([r["qid"] for r in qrows])
    Q = np.array([r["qv"] for r in qrows], dtype=np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)

    out_schema = "query_id long, neighbor_id long, cosine double"

    def score_batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            M = np.array(list(pdf["__cv"]), dtype=np.float64)
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            S = M @ Q.T  # (batch, q)
            ids = pdf["__id"].to_numpy()
            kk = min(k + (1 if exclude_self else 0), len(ids))
            # partition-local top-k per query (argpartition: O(n) per query)
            top = np.argpartition(-S, kk - 1, axis=0)[:kk]  # (kk, q)
            rows = {"query_id": [], "neighbor_id": [], "cosine": []}
            for j in range(S.shape[1]):
                for i in top[:, j]:
                    rows["query_id"].append(qids[j])
                    rows["neighbor_id"].append(ids[i])
                    rows["cosine"].append(S[i, j])
            yield pd.DataFrame(rows)

    c = corpus.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__cv")
    )
    scored = c.mapInPandas(score_batches, schema=out_schema)
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    return _topk_per_query(scored, k)
