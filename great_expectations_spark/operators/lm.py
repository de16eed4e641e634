"""Unigram language-model quality scoring — KenLM-lite corpus fit.

The classic perplexity-style quality filter (cf. CCNet / RefinedWeb's
"score documents against a language model and drop the tail") reduced to
what a from-scratch engine can fit honestly: a unigram model ESTIMATED
FROM THE CORPUS ITSELF (or any reference corpus), scoring each document
by its mean token log-probability. Boilerplate, gibberish, and
wrong-language documents sit in the low-logprob tail; no external model
or network access is needed.

Two passes, both scale-shaped:

1. :func:`unigram_vocab` — corpus token counts → top-K vocabulary with
   natural-log probabilities. One shuffle of ``(token)`` rows with
   map-side partial aggregation; the top-K selection is DETERMINISTIC
   (count DESC, token ASC) so reruns — and the DuckDB oracle — pick the
   identical boundary under count ties.
2. :func:`score_documents` — explode to slim ``(id, token)`` rows,
   broadcast-join the vocabulary (top-K is driver-bounded by
   construction, unlike data-dependent dims), re-aggregate per document.
   The corpus text itself never shuffles; only 8-byte-ish slim rows do.

OOV handling: tokens outside the vocabulary get ``oov_logp`` (default:
the rarest in-vocab log-prob minus ln 2 — "half as likely as the rarest
known word"). The default costs ONE scalar collect over the tiny vocab
relation and is documented where it happens.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from great_expectations_spark.operators.textstats import tokens


def unigram_vocab(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 50_000,
    min_count: int = 1,
) -> DataFrame:
    """Top-``top_k`` corpus tokens with log-probabilities:
    ``(token, cnt, logp)`` where ``logp = ln(cnt / total)`` and ``total``
    counts ALL token occurrences (in- and out-of-vocabulary), so the
    distribution stays honest when the tail is cut."""
    tok = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = tok.agg(F.sum("cnt").alias("__total"))
    return (
        tok.filter(F.col("cnt") >= min_count)
        .crossJoin(F.broadcast(total))
        .withColumn("logp", F.log(F.col("cnt") / F.col("__total")))
        .drop("__total")
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(top_k)
    )


def score_documents(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_logp: float | None = None,
) -> DataFrame:
    """Per-document unigram fit: slim ``(id, mean_logp, n_scored)`` rows.

    ``mean_logp`` is the mean natural-log probability of the document's
    tokens under ``vocab`` (:func:`unigram_vocab` output or any
    ``(token, logp)`` relation); OOV tokens score ``oov_logp``.
    Documents with no tokens produce no row — callers keeping them join
    back on ``id`` (``with_unigram_scores``).

    The vocab side is explicitly broadcast: top-K bounds its size by
    construction (caller-chosen K), which is the one case where a forced
    hint is safe at 100 TB.
    """
    vocab_rel = vocab.select("token", "logp")
    if oov_logp is None:
        # Materialize the ≤top_k-row vocab ONCE, executor-side, via
        # localCheckpoint: a ONE-ROW agg then yields the OOV floor and the
        # scoring job's broadcast reads the same checkpointed blocks, so
        # the corpus is tokenized exactly once per pass and NOTHING
        # O(top_k) ever reaches the driver — an arbitrary large
        # (token, logp) relation can't OOM it (the earlier collect+rebuild
        # shape could, at vocab ≥ ~1M rows). localCheckpoint, NOT
        # persist(): CacheManager holds persisted relations until an
        # explicit unpersist (ContextCleaner never cleans SQL cache
        # entries), which would leak one ≤top_k-row cache entry per
        # score_documents call in a per-batch pipeline; checkpointed RDD
        # blocks are reference-counted and reclaimed once the caller drops
        # the returned frame.
        vocab_rel = vocab_rel.localCheckpoint(eager=True)
        row = vocab_rel.agg(
            F.min("logp").alias("__m"), F.count(F.lit(1)).alias("__n")
        ).collect()[0]
        if not row["__n"]:
            raise ValueError("vocab is empty; pass oov_logp explicitly")
        oov_logp = float(row["__m"]) - math.log(2.0)

    slim = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    joined = slim.join(F.broadcast(vocab_rel), "token", "left")
    return (
        joined.groupBy("__id")
        .agg(
            F.avg(F.coalesce(F.col("logp"), F.lit(oov_logp)))
            .alias("mean_logp"),
            F.count(F.lit(1)).alias("n_scored"),
        )
        .withColumnRenamed("__id", id_col)
    )


def with_unigram_scores(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_logp: float | None = None,
) -> DataFrame:
    """``df`` plus ``mean_logp`` / ``n_scored`` (null for token-less or
    null-text documents) — the filterable form:
    ``with_unigram_scores(df, v).filter("mean_logp >= -9.2")``."""
    scores = score_documents(df, vocab, text_col, id_col, oov_logp)
    return df.join(scores, id_col, "left")
