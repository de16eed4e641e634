"""End-to-end curation pipeline entry (tools/curate_corpus.py)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools")
)

import curate_corpus


def test_full_pipeline_end_to_end(spark, tmp_path, capsys):
    src = str(tmp_path / "corpus")
    bench = str(tmp_path / "bench")
    out = str(tmp_path / "curated")

    base = ("the quick brown fox jumps over the lazy dog and then the dog "
            "sleeps for a while in the sun near the old barn door today")
    rows = []
    for i in range(30):
        rows.append((i, f"{base} variant {i}\nshared boilerplate footer"))
    rows.append((100, "short junk"))                  # fails quality gate
    rows.append((101, rows[0][1]))                    # exact duplicate of 0
    rows.append((102, f"{base} variant 0 extra\nshared boilerplate footer"))
    # PII carrier with its OWN content (sharing `base` would make it a
    # legitimate near-dup of doc 0 and the pipeline would rightly drop it)
    rows.append((103, "mail me at a@b.co please regarding the meeting "
                      "agenda and the quarterly report for next week with "
                      "all the notes from the last review thanks"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.parquet(src)
    # benchmark = doc 5's text → doc 5 must be decontaminated away
    df.filter("doc_id = 5").write.parquet(bench)

    rc = curate_corpus.main([
        "--input", src, "--output", out,
        "--min-tokens", "15", "--min-quality", "0.3",
        "--redact-pii",
        "--line-dedup-min-docs", "5",
        "--exact-dedup", "--near-dedup",
        "--benchmark", bench, "--contamination-ngrams", "8",
        "--stage-counts",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    sc = report["stage_counts"]
    assert sc["input"] == 34
    assert sc["quality_gate"] == 33          # 'short junk' dropped
    assert sc["exact_dedup"] == 32           # doc 101 (dup of 0) dropped
    assert sc["near_dedup"] < sc["exact_dedup"]   # 102 near-dups 0
    assert sc["decontaminate"] == sc["near_dedup"] - 1  # doc 5 dropped

    curated = spark.read.parquet(out)
    texts = {r["doc_id"]: r["text"] for r in curated.collect()}
    assert 5 not in texts and 100 not in texts and 101 not in texts
    assert "[EMAIL]" in texts[103] and "a@b.co" not in texts[103]
    assert all("shared boilerplate footer" not in t for t in texts.values())


def test_stageless_run_is_single_write(spark, tmp_path, capsys):
    src = str(tmp_path / "c2")
    out = str(tmp_path / "o2")
    spark.createDataFrame(
        [(i, f"doc number {i} with some words") for i in range(10)],
        "doc_id long, text string",
    ).write.parquet(src)
    rc = curate_corpus.main(
        ["--input", src, "--output", out, "--exact-dedup"]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["stage_counts"] is None
    assert report["rows_out"] == 10
