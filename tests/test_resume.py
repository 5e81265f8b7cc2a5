"""Checkpoint/resume: per-bucket manifests make re-runs idempotent and
content-identical (SURVEY §5 item 5; sources/index_store.py)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from search_engine_spark.sources.index_store import (
    DiskIndex,
    completed_buckets,
    write_index,
)


def _segment_content(spark, index_dir):
    seg = DiskIndex(spark, index_dir).segments
    return {
        (r["term_key"], r["bucket"], r["block_id"], bytes(r["doc_ids"]),
         bytes(r["tfs"]), bytes(r["dls"]))
        for r in seg.collect()
    }


@pytest.fixture(scope="module")
def built(spark, tiny_index, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index"))
    metrics = write_index(tiny_index, d, input_desc="tiny", bucket_width=512)
    return d, metrics


def test_initial_build_metrics(built, tiny_index):
    d, metrics = built
    n_buckets = (tiny_index.stats.n_docs + 511) // 512
    assert metrics["buckets_built"] == n_buckets
    assert metrics["buckets_skipped_resume"] == 0
    assert completed_buckets(d) == set(range(n_buckets))


def test_observed_run_metrics(spark, built):
    """observe() totals ride on the write job (A7, reference counter
    surface ConfigRepository.java:64-83) and must equal a real count."""
    d, metrics = built
    obs = metrics["observed"]
    seg = DiskIndex(spark, d).segments
    want = seg.agg(
        F.count("*").alias("blocks"), F.sum("doc_count").alias("postings")
    ).collect()[0]
    assert obs["blocks"] == want["blocks"]
    assert obs["postings"] == want["postings"]
    assert obs["payload_bytes"] > 0


def test_rerun_is_noop(spark, built, tiny_index):
    d, _ = built
    before = _segment_content(spark, d)
    metrics = write_index(tiny_index, d, input_desc="tiny", bucket_width=512)
    assert metrics["buckets_built"] == 0
    assert metrics["buckets_skipped_resume"] == len(completed_buckets(d))
    assert _segment_content(spark, d) == before


def test_resume_rebuilds_only_missing_bucket(spark, built, tiny_index):
    d, _ = built
    before = _segment_content(spark, d)
    # simulate a crash that lost bucket 1: drop manifest + its partition
    os.remove(os.path.join(d, "manifests", "bucket=1.json"))
    shutil.rmtree(os.path.join(d, "segments", "bucket=1"))
    metrics = write_index(tiny_index, d, input_desc="tiny", bucket_width=512)
    assert metrics["buckets_built"] == 1
    # deterministic encode -> content identical to the original build
    assert _segment_content(spark, d) == before


def test_resume_after_append_committed_but_manifest_lost(
    spark, built, tiny_index
):
    """Crash window between the segment parquet append committing and
    the bucket manifest landing: the bucket stays in todo, and the
    resume must NOT append a second copy of its blocks (duplicate
    doc_ids in WAND top-k). The rebuild deletes the manifestless
    residue dir first (review r3)."""
    d, _ = built
    before = _segment_content(spark, d)
    n_before = DiskIndex(spark, d).segments.count()
    # simulate: manifest lost, but the bucket's segment dir survived
    os.remove(os.path.join(d, "manifests", "bucket=0.json"))
    metrics = write_index(tiny_index, d, input_desc="tiny", bucket_width=512)
    assert metrics["buckets_built"] == 1
    assert _segment_content(spark, d) == before  # set: content identical
    # count: no second copy appended (block_id is per-encode-partition,
    # NOT unique — duplication shows as row count, not key clashes)
    assert DiskIndex(spark, d).segments.count() == n_before


def test_disk_roundtrip_serves_queries(spark, built, tiny_index):
    from search_engine_spark.operators.query import bm25_topk
    from search_engine_spark.operators.wand import wand_topk

    d, _ = built
    disk = DiskIndex(spark, d)
    mem = [(r["doc_id"], r["score"]) for r in bm25_topk(tiny_index, "w00000", k=5).collect()]
    served = [(r["doc_id"], r["score"])
              for r in wand_topk(disk.segments, disk.terms, "w00000", k=5,
                                 stats=disk.stats).collect()]
    assert mem == served


def test_old_segment_format_guard_and_rebuild(spark, built, tiny_index, tmp_path):
    """A format-v2 dir (untagged payload buffers) must fail segment reads
    with a clear message, stay queryable via the DataFrame engine, and
    come back segment-identical after rebuild_segments (v3 migration)."""
    import json

    from search_engine_spark.sources.index_store import rebuild_segments

    src, _ = built
    d = str(tmp_path / "old_index")
    shutil.copytree(src, d)
    stats_path = os.path.join(d, "stats.json")
    with open(stats_path) as fh:
        stats = json.load(fh)
    stats["format"] = 2
    with open(stats_path, "w") as fh:
        json.dump(stats, fh)

    disk = DiskIndex(spark, d)
    with pytest.raises(ValueError, match="rebuild"):
        _ = disk.segments
    # dimension tables stay readable regardless of segment format
    assert disk.as_inverted_index().postings.count() > 0

    rebuild_segments(spark, d, bucket_width=512)
    disk2 = DiskIndex(spark, d)
    assert disk2.format >= 3
    # block PACKING may legitimately differ (the rebuild reads the
    # published lemma-range-clustered postings, not the build-time
    # stream order) — the invariant is the DECODED posting content
    from search_engine_spark.operators.compression import decode_segments_pd

    def decoded(idx_dir):
        pdf = decode_segments_pd(DiskIndex(spark, idx_dir).segments.toPandas())
        return sorted(map(tuple, pdf.to_records(index=False)))

    assert decoded(d) == decoded(src)


def test_snapshot_diff_reports_exact_mutation_set(spark, tmp_path):
    """snapshot_diff between the pre-mutation snapshot and the live
    index reports EXACTLY the reindexed doc as text-changed (nothing
    added/removed); diffing a snapshot against itself is empty."""
    from search_engine_spark.corpus import synthesize_transcripts
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.sources.index_store import (
        DiskIndex,
        create_snapshot,
        reindex_turn,
        snapshot_diff,
        write_index,
    )

    out = str(tmp_path / "sdiff")
    ix = build_index(synthesize_transcripts(spark, 30), use_arrow_udf=False)
    write_index(ix, out, input_desc="synthetic:30", bucket_width=1024)
    v0 = create_snapshot(out, note="baseline")
    disk = DiskIndex(spark, out)
    row = disk.docs.select("conv_id", "turn_idx", "doc_id").head()
    reindex_turn(spark, out, row["conv_id"], int(row["turn_idx"]),
                 "totally new replacement text", bucket_width=1024,
                 snapshot=False)

    d = snapshot_diff(spark, out, v0)
    assert d["added"] == 0 and d["removed"] == 0
    assert d["changed"] == 1
    assert d["changed_ids"] == [int(row["doc_id"])]
    assert d["n_old"] == d["n_new"]

    same = snapshot_diff(spark, out, v0, v0)
    assert (same["added"], same["removed"], same["changed"]) == (0, 0, 0)
