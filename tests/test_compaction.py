"""Streaming-delta compaction: after compact_index the canonical index
must equal a from-scratch build over the merged corpus (scores exact;
ids dense, batch docs keeping theirs) — sources/index_store.compact_index."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.corpus import synthesize_transcripts
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query import bm25_topk
from search_engine_spark.operators.wand import wand_topk
from search_engine_spark.sources.index_store import (
    DiskIndex,
    compact_index,
    write_index,
)
from search_engine_spark.streaming.incremental import (
    STREAM_ID_BASE,
    incremental_index_refresh,
)

SPLIT = "conv-00000120"


@pytest.fixture(scope="module")
def compacted(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("compaction")
    full = synthesize_transcripts(spark, 160, partitions=4).cache()
    batch = full.filter(F.col("conv_id") < SPLIT)
    streamed = full.filter(F.col("conv_id") >= SPLIT)

    index_dir = str(root / "index")
    ix = build_index(batch, use_arrow_udf=False, weighted=True)
    write_index(ix, index_dir, input_desc="batch", bucket_width=512)

    stream_in = str(root / "stream_in")
    streamed.write.parquet(stream_in)
    incremental_index_refresh(spark, stream_in, index_dir)

    # pre-compaction: streamed docs ARE served by the doc store view
    disk0 = DiskIndex(spark, index_dir)
    assert disk0.docs.count() == full.count()

    metrics = compact_index(spark, index_dir, bucket_width=512)
    return index_dir, full, metrics


def test_compaction_metrics_and_layout(spark, compacted):
    index_dir, full, metrics = compacted
    assert metrics["compacted"] is True
    assert metrics["n_dup_dropped"] == 0
    assert metrics["n_streamed"] > 0
    assert not os.path.isdir(os.path.join(index_dir, "terms_delta"))
    assert not os.path.isdir(os.path.join(index_dir, "docs_stream"))
    disk = DiskIndex(spark, index_dir)
    # dense id space, no stream-range ids anywhere
    ids = [r["doc_id"] for r in disk.docs.select("doc_id").collect()]
    assert sorted(ids) == list(range(len(ids)))
    assert disk.stats.n_docs == full.count()


def test_compacted_equals_fresh_build(spark, compacted):
    index_dir, full, _ = compacted
    disk = DiskIndex(spark, index_dir)
    fresh = build_index(full, use_arrow_udf=False, weighted=True)

    # dictionary identical by lemma (df/cf), stats identical
    a = {r["lemma"]: (r["df"], r["cf"]) for r in disk.terms.collect()}
    b = {r["lemma"]: (r["df"], r["cf"]) for r in fresh.terms.collect()}
    assert a == b
    assert disk.stats.n_docs == fresh.stats.n_docs
    assert disk.stats.avgdl == fresh.stats.avgdl

    # rankings: same turns, same scores, from all three access paths
    key_of = {
        int(r["doc_id"]): (r["conv_id"], r["turn_idx"])
        for r in disk.docs.select("doc_id", "conv_id", "turn_idx").collect()
    }
    fresh_key = {
        int(r["doc_id"]): (r["conv_id"], r["turn_idx"])
        for r in fresh.docs.select("doc_id", "conv_id", "turn_idx").collect()
    }
    for q in ("w00001s w00002ies", "w00000 w00003ing", "w00010s"):
        got = [
            (key_of[r.doc_id], round(r.score, 9))
            for r in bm25_topk(disk.as_inverted_index(), q).collect()
        ]
        ref = [
            (fresh_key[r.doc_id], round(r.score, 9))
            for r in bm25_topk(fresh, q).collect()
        ]
        assert got == ref, q
        seg = [
            (key_of[r.doc_id], round(r.score, 9))
            for r in wand_topk(
                disk.segments, disk.terms, q, stats=disk.stats
            ).collect()
        ]
        assert seg == ref, q


def test_noop_compaction_takes_no_snapshot(spark, tmp_path):
    """compact_index with nothing pending must not accumulate a
    hardlink-tree snapshot per refresh cycle (review r3)."""
    from search_engine_spark.sources.index_store import compact_index

    full = synthesize_transcripts(spark, 10, partitions=2)
    index_dir = str(tmp_path / "idx")
    write_index(build_index(full, use_arrow_udf=False), index_dir,
                input_desc="b", bucket_width=512)
    snap_dir = os.path.join(index_dir, "_snapshots")

    def n_snaps():
        return len(os.listdir(snap_dir)) if os.path.isdir(snap_dir) else 0

    before = n_snaps()
    for _ in range(3):
        info = compact_index(spark, index_dir, bucket_width=512)
        assert info == {"compacted": False, "reason": "no streamed deltas"}
    assert n_snaps() == before


def test_compaction_drops_redelivered_and_duplicate_keys(spark, tmp_path):
    full = synthesize_transcripts(spark, 30, partitions=2).cache()
    batch = full.filter(F.col("conv_id") < "conv-00000020")
    tail = full.filter(F.col("conv_id") >= "conv-00000020")

    index_dir = str(tmp_path / "index")
    write_index(
        build_index(batch, use_arrow_udf=False), index_dir,
        input_desc="batch", bucket_width=512,
    )
    stream_in = str(tmp_path / "stream_in")
    # epoch 1: tail convs + a turn ALREADY in the batch index
    redelivered = batch.limit(1)
    tail.unionByName(redelivered).write.parquet(stream_in)
    incremental_index_refresh(spark, stream_in, index_dir)
    # epoch 2: the same tail convs again (identical content re-delivery)
    tail.write.mode("append").parquet(stream_in)
    incremental_index_refresh(spark, stream_in, index_dir)

    metrics = compact_index(spark, index_dir, bucket_width=512)
    assert metrics["n_dup_dropped"] == 1
    assert metrics["n_streamed"] == tail.count()

    disk = DiskIndex(spark, index_dir)
    assert disk.stats.n_docs == full.count()
    post = disk.as_inverted_index().postings
    assert post.filter(F.col("doc_id") >= STREAM_ID_BASE).count() == 0
    # no duplicated (doc, lemma) rows survived the re-delivery
    dups = (
        post.groupBy("doc_id", "lemma").count().filter(F.col("count") > 1)
    )
    assert dups.count() == 0
    # scores equal a fresh build over the union
    fresh = build_index(full, use_arrow_udf=False)
    a = {r["lemma"]: (r["df"], r["cf"]) for r in disk.terms.collect()}
    b = {r["lemma"]: (r["df"], r["cf"]) for r in fresh.terms.collect()}
    assert a == b
