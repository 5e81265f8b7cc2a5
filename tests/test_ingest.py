"""Ingestion landing zone: JSONL/CSV → canonical sorted corpus dir.

Covers: malformed-line capture, contract diversion, deterministic
duplicate-key resolution, schema/sort guarantees of the output dir
(including that the build's zero-shuffle presorted docID path accepts
it), and the CLI audit line."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from pyspark.sql import functions as F

from search_engine_spark.sources.ingest import ingest_transcripts
from search_engine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

GOOD = [
    {"conv_id": "c1", "turn_idx": 0, "role": "user",
     "text": "alpha beta", "tool": None, "ts": "2026-01-01T00:00:00Z"},
    {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
     "text": "gamma", "tool": "sh", "ts": "2026-01-01T00:01:00Z"},
    {"conv_id": "c2", "turn_idx": 0, "role": "user",
     "text": "delta", "tool": None, "ts": "2026-01-02T00:00:00Z"},
]
# duplicate key c1/0 with a LATER ts — must lose to the GOOD[0] row
DUP = {"conv_id": "c1", "turn_idx": 0, "role": "user",
       "text": "zzz shadow", "tool": None, "ts": "2026-03-01T00:00:00Z"}
BAD_CONTRACT = [
    {"conv_id": None, "turn_idx": 5, "role": "user", "text": "x",
     "tool": None, "ts": None},                       # null_key
    {"conv_id": "c3", "turn_idx": 0, "role": "user", "text": "   ",
     "tool": None, "ts": None},                       # empty_text
]


def _write_jsonl(path, rows, corrupt_lines=()):
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
        for line in corrupt_lines:
            fh.write(line + "\n")


@pytest.fixture()
def jsonl_file(tmp_path):
    p = tmp_path / "export.jsonl"
    _write_jsonl(
        p, GOOD + [DUP] + BAD_CONTRACT,
        corrupt_lines=['{"conv_id": "broken', "[1, 2, 3]"],
    )
    return str(p)


def test_jsonl_ingest_counts_and_output(spark, tmp_path, jsonl_file):
    out = str(tmp_path / "corpus")
    dl = str(tmp_path / "dead")
    counts = ingest_transcripts(
        spark, jsonl_file, out, fmt="jsonl", dead_letter_dir=dl
    )
    assert counts["rows_out"] == 3
    assert counts["dead_malformed"] == 2
    assert counts["dead_contract"] == 2
    assert counts["dead_duplicate"] == 1
    assert counts["rows_in"] == 8

    got = spark.read.parquet(out)
    assert [(f.name, f.dataType) for f in got.schema] == [
        (f.name, f.dataType) for f in TRANSCRIPT_SCHEMA
    ]
    rows = {(r["conv_id"], r["turn_idx"]): r for r in got.collect()}
    assert set(rows) == {("c1", 0), ("c1", 1), ("c2", 0)}
    # duplicate resolution kept the EARLIEST-ts row
    assert rows[("c1", 0)]["text"] == "alpha beta"

    reasons = {
        r["reason"]: r["n"]
        for r in spark.read.parquet(dl).groupBy("reason")
        .agg(F.count("*").alias("n")).collect()
    }
    assert reasons == {
        "malformed_record": 2, "null_key": 1, "empty_text": 1,
        "duplicate_key": 1,
    }


def test_output_feeds_presorted_docid_path(spark, tmp_path):
    # a bigger corpus (multiple output files) must be PROVEN sorted by
    # docs_from_sorted_dir — the zero-shuffle docID path contract
    rows = [
        {"conv_id": f"c{i:04d}", "turn_idx": t, "role": "user",
         "text": f"w{i} turn {t}", "tool": None,
         "ts": "2026-01-01T00:00:00Z"}
        for i in range(50) for t in range(4)
    ]
    src = tmp_path / "big.jsonl"
    _write_jsonl(src, rows)
    out = str(tmp_path / "corpus")
    counts = ingest_transcripts(
        spark, str(src), out, fmt="jsonl", partitions=4
    )
    assert counts["rows_out"] == 200

    from search_engine_spark.operators.docids import docs_from_sorted_dir

    pres = docs_from_sorted_dir(spark, out, ["conv_id", "turn_idx"])
    assert pres is not None  # layout provably sorted → zero-shuffle ids


def test_csv_ingest(spark, tmp_path):
    p = tmp_path / "export.csv"
    with open(p, "w") as fh:
        fh.write("conv_id,turn_idx,role,text,tool,ts\n")
        fh.write("c1,0,user,alpha,,2026-01-01T00:00:00Z\n")
        fh.write("c1,notanint,user,bad turn idx,,2026-01-01T00:00:00Z\n")
        fh.write("c2,0,user,beta,,2026-01-05T00:00:00Z\n")
    out = str(tmp_path / "corpus")
    counts = ingest_transcripts(spark, str(p), out, fmt="csv")
    assert counts["rows_out"] == 2
    assert counts["dead_malformed"] == 1
    got = spark.read.parquet(out)
    assert [(f.name, f.dataType) for f in got.schema] == [
        (f.name, f.dataType) for f in TRANSCRIPT_SCHEMA
    ]
    assert {r["text"] for r in got.collect()} == {"alpha", "beta"}


def test_ingest_cli_audit_line(tmp_path, jsonl_file):
    out = str(tmp_path / "corpus_cli")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [sys.executable, "/root/repo/jobs/ingest.py",
         "--input", jsonl_file, "--format", "jsonl",
         "--output", out, "--local-cpus", "2"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    audit = json.loads(line)
    assert audit["rows_out"] == 3 and audit["dead_duplicate"] == 1


def test_dedup_and_sorted_write_share_one_exchange(spark):
    # the docstring's plan claim: RangePartitioning on the sort key
    # satisfies the dedup window's clustering requirement, so dedup +
    # sorted write cost ONE shuffle total
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [("c1", 0, "a"), ("c1", 0, "b"), ("c2", 1, "c")],
        "conv_id string, turn_idx int, text string",
    )
    ranged = df.repartitionByRange(4, "conv_id", "turn_idx")
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("text").asc_nulls_last()
    )
    out = (
        ranged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("_rn")
        .sortWithinPartitions("conv_id", "turn_idx")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
