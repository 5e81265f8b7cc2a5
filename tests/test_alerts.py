"""Streaming percolator alerts (streaming/alerts.py): stored queries
matched against newly arriving turns, exactly-once via the stream
checkpoint."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from search_engine_spark.streaming.alerts import (
    percolate_batch,
    streaming_percolate_alerts,
)

STORED = {1: "alpha beta", 2: "gamma", 3: "the and of"}  # 3 is invalid


def _turns(spark, rows):
    return spark.createDataFrame(
        [(c, t, "user", txt, None, None) for c, t, txt in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def test_percolate_batch_matches(spark):
    turns = _turns(spark, [
        ("c1", 0, "alpha beta something"),   # matches q1
        ("c1", 1, "alpha only"),             # partial -> no strict-AND
        ("c2", 0, "gamma rays and alpha beta"),  # matches q1 + q2
        ("c3", 0, "nothing relevant"),
    ])
    got = {
        (r["query_id"], r["conv_id"], r["turn_idx"])
        for r in percolate_batch(turns, STORED).collect()
    }
    assert got == {(1, "c1", 0), (1, "c2", 0), (2, "c2", 0)}


def test_streaming_alerts_exactly_once(spark, tmp_path):
    feed = str(tmp_path / "feed")
    root = str(tmp_path / "alerts_root")
    os.makedirs(feed)

    _turns(spark, [("c1", 0, "alpha beta x")]).coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    n1 = streaming_percolate_alerts(spark, feed, root, STORED)
    assert n1 == 1

    # draining again with no new files alerts nothing (checkpoint)
    assert streaming_percolate_alerts(spark, feed, root, STORED) == 0

    # new file with one matching + one non-matching turn
    _turns(spark, [
        ("c2", 0, "gamma burst"),
        ("c2", 1, "quiet turn"),
    ]).coalesce(1).write.mode("append").parquet(feed)
    n3 = streaming_percolate_alerts(spark, feed, root, STORED)
    assert n3 == 1

    log = spark.read.parquet(os.path.join(root, "alerts"))
    rows = {(r["query_id"], r["conv_id"]) for r in log.collect()}
    assert rows == {(1, "c1"), (2, "c2")}
    assert log.count() == 2  # the old alert was never duplicated


def test_refresh_cli_alert_queries(tmp_path):
    """refresh_index --input --alert-queries: drain + percolate the new
    turns, append alert rows under <index>/alerts."""
    import json as _json
    import subprocess
    import sys

    env = dict(os.environ, PYTHONPATH="/root/repo")

    idx = str(tmp_path / "idx")
    build = subprocess.run(
        [sys.executable, "/root/repo/jobs/build_index.py",
         "--n-synthetic-convs", "20", "--output", idx,
         "--bucket-width", "1024", "--local-cpus", "2"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert build.returncode == 0, build.stderr[-2000:]

    feed = tmp_path / "feed"
    feed.mkdir()
    qfile = tmp_path / "stored.tsv"
    qfile.write_text("7\tw00000 w00001\n")

    # write one new-turn parquet file into the feed via duckdb (no
    # spark session needed in this subprocess-level test)
    import duckdb

    duckdb.sql(
        "COPY (SELECT 'cz' AS conv_id, 0 AS turn_idx, 'user' AS role, "
        "'w00000 w00001 fresh turn' AS text, "
        "CAST(NULL AS VARCHAR) AS tool, "
        "CAST('2026-01-01 00:00:00' AS TIMESTAMP) AS ts) "
        f"TO '{feed}/new1.parquet' (FORMAT PARQUET)"
    )
    ref = subprocess.run(
        [sys.executable, "/root/repo/jobs/refresh_index.py",
         "--index", idx, "--input", str(feed),
         "--alert-queries", str(qfile), "--local-cpus", "2"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert ref.returncode == 0, ref.stderr[-2000:]
    line = [l for l in ref.stdout.splitlines() if l.startswith("{")][-1]
    audit = _json.loads(line)
    assert audit["drained"] is True and audit["alerts_appended"] == 1
    assert os.path.isdir(os.path.join(idx, "alerts"))


def test_alert_sink_idempotent_on_epoch_replay(spark, tmp_path):
    """A crash between the sink write and the checkpoint commit makes
    Structured Streaming replay the SAME epoch on restart. The
    epoch-partitioned dynamic-overwrite sink must absorb the replay
    without duplicating alert rows (ADVICE r3: the old blind append
    was at-least-once)."""
    feed = str(tmp_path / "feed")
    root = str(tmp_path / "alerts_root")
    os.makedirs(feed)

    _turns(spark, [("c1", 0, "alpha beta x")]).coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    assert streaming_percolate_alerts(spark, feed, root, STORED) == 1

    # simulate the crash: the sink write happened but the commit for
    # the last batch is lost -> restart replays that epoch
    commits = os.path.join(root, "_alerts_checkpoint", "commits")
    newest = max(
        (f for f in os.listdir(commits) if not f.startswith(".")),
        key=int,
    )
    os.remove(os.path.join(commits, newest))
    # also drop the local-FS checksum twin, as a real crash would: a
    # stale .crc makes the re-commit look like a concurrent writer
    crc = os.path.join(commits, f".{newest}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    replayed = streaming_percolate_alerts(spark, feed, root, STORED)
    assert replayed == 1  # the epoch ran again…
    log = spark.read.parquet(os.path.join(root, "alerts"))
    assert log.count() == 1  # …but the log holds exactly one row
    row = log.collect()[0]
    assert (row["query_id"], row["conv_id"]) == (1, "c1")
