"""Snapshot time-travel on the index store (sources/index_store.py):
every mutation freezes its pre-state as a hardlink-tree snapshot;
DiskIndex(as_of=v) serves the frozen state unchanged; expire_snapshots
GCs old versions without disturbing shared data files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query import bm25_topk
from search_engine_spark.sources.index_store import (
    DiskIndex,
    create_snapshot,
    delete_scope,
    expire_snapshots,
    list_snapshots,
    reindex_turn,
    write_index,
)

NEW_TEXT = "w00000 w00001 w00002 w00000 w00005"
QUERY = "w00000 w00001"


def _topk(spark, idx_dir, as_of=None):
    ix = DiskIndex(spark, idx_dir, as_of=as_of).as_inverted_index()
    return [(r["doc_id"], r["score"])
            for r in bm25_topk(ix, QUERY, k=10).collect()]


def test_mutations_snapshot_and_time_travel(spark, tiny_transcripts, tmp_path):
    idx_dir = str(tmp_path / "idx")
    ix = build_index(tiny_transcripts, use_arrow_udf=False, weighted=True)
    write_index(ix, idx_dir, input_desc="tiny", bucket_width=512)
    assert list_snapshots(idx_dir) == []

    before_reindex = _topk(spark, idx_dir)

    row = tiny_transcripts.orderBy("conv_id", "turn_idx").limit(1).collect()[0]
    reindex_turn(spark, idx_dir, row["conv_id"], row["turn_idx"], NEW_TEXT,
                 bucket_width=512)
    snaps = list_snapshots(idx_dir)
    assert [s["version"] for s in snaps] == [1]
    assert "reindex_turn" in snaps[0]["note"]

    after_reindex = _topk(spark, idx_dir)
    assert after_reindex != before_reindex  # the edit moved rankings
    # time travel: snapshot v1 IS the pre-reindex state
    assert _topk(spark, idx_dir, as_of=1) == before_reindex
    # ...and the frozen doc text is the old one
    old_docs = DiskIndex(spark, idx_dir, as_of=1).docs
    old_txt = old_docs.filter(
        (F.col("conv_id") == row["conv_id"])
        & (F.col("turn_idx") == row["turn_idx"])
    ).collect()[0]["text"]
    assert old_txt == row["text"] != NEW_TEXT

    # a scope delete snapshots the post-reindex state as v2
    role = DiskIndex(spark, idx_dir).docs.select("role").orderBy(
        "role").limit(1).collect()[0][0]
    delete_scope(spark, idx_dir, "role", role, bucket_width=512)
    assert [s["version"] for s in list_snapshots(idx_dir)] == [1, 2]
    assert _topk(spark, idx_dir, as_of=2) == after_reindex
    assert _topk(spark, idx_dir, as_of=1) == before_reindex
    live = _topk(spark, idx_dir)
    assert live != after_reindex

    # deleted docs are still readable at as_of=2
    n_then = DiskIndex(spark, idx_dir, as_of=2).docs.count()
    n_now = DiskIndex(spark, idx_dir).docs.count()
    assert n_then > n_now

    # expiry: keep only the newest; v1 gone, v2 intact (hardlinked data
    # files shared with the live table survive the unlink)
    assert expire_snapshots(idx_dir, keep_last=1) == [1]
    assert [s["version"] for s in list_snapshots(idx_dir)] == [2]
    assert _topk(spark, idx_dir, as_of=2) == after_reindex
    with pytest.raises(ValueError, match="no snapshot v1"):
        DiskIndex(spark, idx_dir, as_of=1)

    # explicit snapshots keep numbering after expiry
    assert create_snapshot(idx_dir, note="manual") == 3
    assert _topk(spark, idx_dir, as_of=3) == live

    # the search CLI exposes time travel (--as-of) and rejects unknown
    # versions with the invalid-input exit code
    import json as _json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)

    def _cli(*extra):
        return subprocess.run(
            [sys.executable, os.path.join(repo, "jobs", "search.py"),
             "--local-cpus", "2", "--index", idx_dir, "--query", QUERY,
             *extra],
            capture_output=True, text=True, cwd=repo, timeout=300, env=env,
        )

    r = _cli("--as-of", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    hits = [_json.loads(l) for l in r.stdout.strip().splitlines() if l]
    assert [(h["doc_id"], h["score"]) for h in hits] == live
    bad = _cli("--as-of", "99")
    assert bad.returncode == 2 and "no snapshot v99" in bad.stderr


def test_snapshot_is_isolated_from_live_writes(spark, tiny_transcripts,
                                               tmp_path):
    """A snapshot taken explicitly, then mutated over twice, still
    serves the original state byte-for-byte (snapshot trees never share
    MUTABLE state — stats.json etc. are separate inodes per version)."""
    idx_dir = str(tmp_path / "idx")
    ix = build_index(tiny_transcripts, use_arrow_udf=False, weighted=True)
    write_index(ix, idx_dir, input_desc="tiny", bucket_width=512)
    v = create_snapshot(idx_dir, note="baseline")
    baseline = _topk(spark, idx_dir, as_of=v)

    rows = tiny_transcripts.orderBy("conv_id", "turn_idx").limit(2).collect()
    for r in rows:
        reindex_turn(spark, idx_dir, r["conv_id"], r["turn_idx"], NEW_TEXT,
                     bucket_width=512, snapshot=False)
    assert _topk(spark, idx_dir, as_of=v) == baseline
    # snapshot=False left the log at just the explicit baseline
    assert [s["version"] for s in list_snapshots(idx_dir)] == [v]
    # the snapshot dir carries its own stats.json inode
    snap_stats = os.path.join(idx_dir, "_snapshots", f"v{v}", "stats.json")
    live_stats = os.path.join(idx_dir, "stats.json")
    assert os.stat(snap_stats).st_ino != os.stat(live_stats).st_ino


def test_restore_snapshot_rolls_back_live(spark, tiny_transcripts, tmp_path):
    """restore_snapshot: the live index returns byte-for-byte to the
    frozen version's query results, the pre-restore state is itself
    snapshotted (undoable), and re-restoring forward works."""
    from search_engine_spark.sources.index_store import restore_snapshot

    idx_dir = str(tmp_path / "idx")
    ix = build_index(tiny_transcripts, use_arrow_udf=False, weighted=True)
    write_index(ix, idx_dir, input_desc="tiny", bucket_width=512)
    before = _topk(spark, idx_dir)

    row = tiny_transcripts.orderBy("conv_id", "turn_idx").limit(1).collect()[0]
    reindex_turn(spark, idx_dir, row["conv_id"], row["turn_idx"], NEW_TEXT,
                 bucket_width=512)
    after = _topk(spark, idx_dir)
    assert after != before
    assert [s["version"] for s in list_snapshots(idx_dir)] == [1]

    out = restore_snapshot(idx_dir, 1)
    spark.catalog.clearCache()
    assert out["restored_version"] == 1
    assert out["pre_restore_snapshot"] == 2
    assert "postings" in out["entries_restored"]
    assert _topk(spark, idx_dir) == before            # rolled back
    # both versions still frozen: v1 (pre-mutation) and v2 (pre-restore)
    assert [s["version"] for s in list_snapshots(idx_dir)] == [1, 2]
    assert _topk(spark, idx_dir, as_of=2) == after

    # restore FORWARD to the pre-restore state — rollback is symmetric
    restore_snapshot(idx_dir, 2, snapshot=False)
    spark.catalog.clearCache()
    assert _topk(spark, idx_dir) == after

    with pytest.raises(ValueError):
        restore_snapshot(idx_dir, 99)


def test_restore_preserves_side_state(spark, tiny_transcripts, tmp_path):
    """Rolling an index back must NOT rewind operational side-state:
    the percolator alert log and streaming checkpoints live on the
    operational timeline, and deleting a checkpoint would re-alert
    every already-drained turn (ADVICE r3)."""
    from search_engine_spark.sources.index_store import restore_snapshot

    idx_dir = str(tmp_path / "idx")
    ix = build_index(tiny_transcripts, use_arrow_udf=False, weighted=True)
    write_index(ix, idx_dir, input_desc="tiny", bucket_width=512)

    row = tiny_transcripts.orderBy("conv_id", "turn_idx").limit(1).collect()[0]
    reindex_turn(spark, idx_dir, row["conv_id"], row["turn_idx"], NEW_TEXT,
                 bucket_width=512)  # -> snapshot v1 of the pre-state

    # side-state arrives AFTER the frozen version
    alerts_dir = os.path.join(idx_dir, "alerts")
    ckpt_dir = os.path.join(idx_dir, "_alerts_checkpoint")
    os.makedirs(alerts_dir)
    os.makedirs(ckpt_dir)
    with open(os.path.join(alerts_dir, "part-0.json"), "w") as fh:
        fh.write('{"query_id": 1}')
    with open(os.path.join(ckpt_dir, "offsets"), "w") as fh:
        fh.write("epoch 3")

    out = restore_snapshot(idx_dir, 1)
    spark.catalog.clearCache()
    # the index itself rolled back…
    assert out["restored_version"] == 1
    # …but side-state survived untouched, and was not listed as removed
    assert os.path.exists(os.path.join(alerts_dir, "part-0.json"))
    assert os.path.exists(os.path.join(ckpt_dir, "offsets"))
    assert "alerts" not in out["entries_removed"]
    assert "_alerts_checkpoint" not in out["entries_removed"]
    # and new snapshots never capture side-state (it is not index data)
    from search_engine_spark.sources.index_store import snapshot_path
    v2 = out["pre_restore_snapshot"]
    assert not os.path.exists(os.path.join(snapshot_path(idx_dir, v2),
                                           "alerts"))
