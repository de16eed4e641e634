"""Unigram-LM scoring at vocabulary scale — the VERDICT r4 item-7 record.

Proves (by measurement, not assertion) that ``operators/lm.py`` holds its
shape when the vocabulary is large: ``unigram_vocab(top_k=500_000)`` feeds
``score_documents`` with NOTHING O(top_k) ever reaching the driver — the
OOV floor comes from a persist + one-row agg, the vocab side is a
broadcast relation (``tests/test_plan_shape.py`` asserts the plan; this
file records the cost), and the corpus text never shuffles.

Corpus: deterministic synthetic docs (~30 tokens each) over a ~2M-distinct
token space with a harmonic-ish skew (token id drawn uniformly from a
RANGE whose size is itself uniform — P(token t) falls off ~log-linearly),
so the top-500k cut is a real boundary, not the whole vocabulary.

Timed per level (min of BENCH_REPEAT in-JVM repeats, subprocess samples
interleaved across local[N] / local[4N], protocol of
tools/pipeline_ops_bench.py):

- ``vocab_build``: unigram_vocab → persist + the one-row OOV-floor agg
  (the exact prelude score_documents runs with oov_logp=None)
- ``score``: score_documents over the prebuilt vocab, reduced with one
  scalar agg (count + sum of mean_logp) — the steady-state scoring cost

Writes BENCH/LM_VOCAB.md. Usage:
    python tools/lm_vocab_bench.py [n_docs] [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
TOP_K = int(os.environ.get("LMB_TOP_K", "500000"))
TOKEN_SPACE = int(os.environ.get("LMB_TOKEN_SPACE", "2000000"))
LEVEL_N = int(os.environ.get("SCALE_N", "4"))
LEVEL_4N = int(os.environ.get("SCALE_4N", "16"))
IN_JVM_REPEAT = os.environ.get("BENCH_REPEAT", "2")

WORKER = r"""
import json, math, os, sys, time

cpus = int(os.environ["LMB_CPUS"])
n_docs = int(os.environ["LMB_DOCS"])
top_k = int(os.environ["LMB_TOP_K"])
token_space = int(os.environ["LMB_TOKEN_SPACE"])
repeat = int(os.environ.get("BENCH_REPEAT", "2"))

sys.path.insert(0, os.environ["LMB_REPO"])
from bench import build_spark, CACHE_ROOT
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

spark = build_spark(cpus)
# Reduce parallelism sized to the DATA, identical at both levels (see the
# worker comments in tools/pipeline_ops_bench.py): the token groupBy
# shuffles ~30 slim rows/doc into a ~token_space-key hash agg.
spark.conf.set("spark.sql.shuffle.partitions", "64")
spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")

def corpus_path():
    path = os.path.join(CACHE_ROOT, f"lm_docs_{n_docs}_{token_space}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # token id uniform in [0, m) with m itself uniform in
        # [1, token_space] -> P(t) ~ sum_{m>t} 1/m: a harmonic tail, so
        # frequency ranks are meaningful and the top-k boundary is real
        rng = (
            F.pmod(F.xxhash64(F.col("id"), F.lit(0)), F.lit(token_space))
            + 1
        )
        words = F.transform(
            F.sequence(F.lit(1), F.lit(30)),
            lambda i: F.concat(
                F.lit("tok"),
                F.pmod(F.xxhash64(F.col("id"), i), rng).cast("string"),
            ),
        )
        (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.array_join(words, " ").alias("text"),
            )
            # fixed file count so every later sample scans the same layout
            # regardless of which level generated it
            .repartition(64, "doc_id")
            .write.mode("overwrite")
            .parquet(path)
        )
    return path

docs = spark.read.parquet(corpus_path())

from great_expectations_spark.operators.lm import (
    score_documents,
    unigram_vocab,
)

def q_vocab_build():
    # the exact oov_logp=None prelude score_documents runs: materialize the
    # vocab executor-side (localCheckpoint) + the one-row OOV-floor agg
    v = unigram_vocab(docs, top_k=top_k).localCheckpoint(eager=True)
    row = v.agg(F.min("logp"), F.count(F.lit(1))).collect()[0]
    return int(row[1])

def timed(fn):
    best, obs = None, None
    for _ in range(repeat):
        t0 = time.monotonic()
        obs = fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return {"sec": round(best, 3), "observed": int(obs)}

out = {}
# ORDER MATTERS: vocab_build must be timed BEFORE any other vocab relation
# is persisted — Spark's CacheManager substitutes cached plans by
# plan-EQUALITY, so a pre-existing persisted unigram_vocab(docs, top_k)
# would silently turn the timed build into a cache read (and q_vocab_build's
# unpersist would then evict the shared entry out from under the scorer).
out["vocab_build"] = timed(q_vocab_build)

# the scored vocab is built once OUTSIDE the timed scoring loop and its
# floor passed explicitly, so `score` times the steady-state path a
# pipeline pays per batch (vocab reuse is the production shape); the floor
# agg also materializes the cache so the broadcast inside each timed score
# action reads it instead of recomputing the vocab build
vocab = unigram_vocab(docs, top_k=top_k).persist(StorageLevel.MEMORY_AND_DISK)
floor_row = vocab.agg(F.min("logp").alias("m")).collect()[0]
oov = float(floor_row["m"]) - math.log(2.0)

def q_score():
    s = score_documents(docs, vocab, oov_logp=oov)
    row = s.agg(
        F.count(F.lit(1)).alias("docs"), F.sum("mean_logp")
    ).collect()[0]
    return int(row["docs"])

out["score"] = timed(q_score)
print("LMB_RESULT " + json.dumps({"cpus": cpus, "ops": out}))
spark.stop()
"""


def run_once(cpus: int) -> dict:
    env = dict(
        os.environ,
        LMB_CPUS=str(cpus),
        LMB_DOCS=str(N_DOCS),
        LMB_TOP_K=str(TOP_K),
        LMB_TOKEN_SPACE=str(TOKEN_SPACE),
        LMB_REPO=REPO,
        BENCH_REPEAT=IN_JVM_REPEAT,
    )
    proc = subprocess.run(
        [sys.executable, "-c", WORKER], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=5400,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("LMB_RESULT "):
            return json.loads(line[len("LMB_RESULT "):])
    raise RuntimeError(
        f"worker (cpus={cpus}) produced no result:\n{proc.stdout[-2000:]}"
        f"\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    samples: dict[int, list[dict]] = {LEVEL_N: [], LEVEL_4N: []}
    for _ in range(ROUNDS):
        for level in (LEVEL_N, LEVEL_4N):  # interleaved
            samples[level].append(run_once(level))
            print(f"  level {level}: {samples[level][-1]['ops']}", flush=True)

    def best(level: int, op: str) -> float:
        return min(s["ops"][op]["sec"] for s in samples[level])

    raw = {
        "n_docs": N_DOCS, "top_k": TOP_K, "token_space": TOKEN_SPACE,
        "levels": [LEVEL_N, LEVEL_4N], "ops": {},
    }
    lines = [
        "# BENCH/LM_VOCAB — unigram-LM scoring at vocabulary scale",
        "",
        f"Corpus: {N_DOCS:,} deterministic synthetic docs (~30 tokens) over "
        f"a ~{TOKEN_SPACE:,}-distinct token space with a harmonic skew; "
        f"vocabulary cut at top_k={TOP_K:,}. Protocol identical to "
        "BENCH/PIPELINE_OPS.md: fresh JVM per sample, min of "
        f"{IN_JVM_REPEAT} in-JVM repeats, samples interleaved across "
        f"local[{LEVEL_N}] (= N) and local[{LEVEL_4N}] (= 4N), min per "
        "level reported. `vocab_build` includes the persist + one-row "
        "OOV-floor agg (the oov_logp=None prelude); `score` is the "
        "steady-state scoring pass over a prebuilt vocab.",
        "",
        f"| op | local[{LEVEL_N}] s | local[{LEVEL_4N}] s | docs/s @4N "
        "| eff N→4N |",
        "|---|---|---|---|---|",
    ]
    for op in ("vocab_build", "score"):
        tn, t4 = best(LEVEL_N, op), best(LEVEL_4N, op)
        eff = (tn / t4) / (LEVEL_4N / LEVEL_N)
        raw["ops"][op] = {
            "localN_sec": tn, "local4N_sec": t4,
            "docs_per_sec_4N": round(N_DOCS / t4, 1),
            "scaling_efficiency": round(eff, 3),
            "samples": {
                str(lv): [s["ops"][op]["sec"] for s in samples[lv]]
                for lv in (LEVEL_N, LEVEL_4N)
            },
        }
        lines.append(
            f"| {op} | {tn:.2f} | {t4:.2f} | {N_DOCS / t4:,.0f} "
            f"| {eff:.3f} |"
        )
    vocab_rows = samples[LEVEL_4N][-1]["ops"]["vocab_build"]["observed"]
    lines += [
        "",
        f"The built vocabulary holds {vocab_rows:,} rows (the top-k cut is "
        "genuinely binding when that equals top_k). The scoring path is "
        "the one `tests/test_plan_shape.py::"
        "test_score_documents_broadcasts_vocab` asserts: the vocab joins "
        "as a BroadcastHashJoin build side and the only driver-bound rows "
        "are the ONE-row OOV-floor agg — at top_k=500k the old "
        "collect+rebuild shape would have pulled a multi-hundred-MB "
        "relation through the driver; this path pulls 8 bytes.",
        "",
        "Read the efficiencies against the measured single-box scan_probe "
        "ceiling in BENCH/PIPELINE_OPS.md (0.71 at 5M docs): both ops are "
        "shuffle+hash-agg bound, i.e. memory traffic, and a real cluster "
        "adds memory channels with executors.",
        "",
        f"Raw: `{json.dumps(raw)}`",
    ]
    out = os.path.join(REPO, "BENCH", "LM_VOCAB.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
