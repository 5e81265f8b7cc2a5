"""Single-doc re-index (ST4, reference /api/indexPage): after replacing
one turn's text, the authoritative tables equal a from-scratch build and
the affected segment bucket is re-encoded (sources/index_store.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from search_engine_spark.operators.compression import (
    build_segments,
    decode_segments_pd,
)
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query import bm25_topk
from search_engine_spark.sources.index_store import (
    DiskIndex,
    reindex_turn,
    write_index,
)

NEW_TEXT = "w00000 w00001 w00002 w00000 w00005"  # existing vocab only


def test_reindex_turn_equals_fresh_build(spark, tiny_transcripts, tmp_path):
    idx_dir = str(tmp_path / "idx")
    ix = build_index(tiny_transcripts, use_arrow_udf=True, weighted=True)
    write_index(ix, idx_dir, input_desc="tiny", bucket_width=512)

    row = tiny_transcripts.orderBy("conv_id", "turn_idx").limit(1).collect()[0]
    info = reindex_turn(spark, idx_dir, row["conv_id"], row["turn_idx"],
                        NEW_TEXT, bucket_width=512)

    modified = tiny_transcripts.withColumn(
        "text",
        F.when(
            (F.col("conv_id") == row["conv_id"])
            & (F.col("turn_idx") == row["turn_idx"]),
            NEW_TEXT,
        ).otherwise(F.col("text")),
    )
    fresh = build_index(modified, use_arrow_udf=True, weighted=True)
    got = DiskIndex(spark, idx_dir).as_inverted_index()

    # authoritative tables: exact equality with the from-scratch build
    for cols, a_df, b_df in [
        (["doc_id", "lemma", "tf"], got.postings, fresh.postings),
        (["doc_id", "dl"], got.doclen, fresh.doclen),
        (["lemma", "df", "cf"], got.terms, fresh.terms),
    ]:
        a = sorted(tuple(r) for r in a_df.select(*cols).collect())
        b = sorted(tuple(r) for r in b_df.select(*cols).collect())
        assert a == b, cols
    assert got.stats.n_docs == fresh.stats.n_docs
    assert abs(got.stats.avgdl - fresh.stats.avgdl) < 1e-12

    # the doc text itself was swapped in the doc store
    txt = got.docs.filter(F.col("doc_id") == info["doc_id"]).collect()[0]["text"]
    assert txt == NEW_TEXT

    # DataFrame engine over the re-indexed tables == fresh build, exactly
    for q in ("w00000 w00001", "w00005"):
        a = [(r["doc_id"], r["score"]) for r in bm25_topk(got, q, k=10).collect()]
        b = [(r["doc_id"], r["score"]) for r in bm25_topk(fresh, q, k=10).collect()]
        assert a == b, q

    # the affected bucket's blocks decode to the fresh-build postings
    bucket = info["bucket"]
    disk_seg = (
        DiskIndex(spark, idx_dir).segments.filter(F.col("bucket") == bucket)
    ).toPandas()
    fresh_seg = (
        build_segments(fresh, bucket_width=512)
        .filter(F.col("bucket") == bucket)
    ).toPandas()
    a = decode_segments_pd(disk_seg).sort_values(
        ["term_key", "doc_id"]).reset_index(drop=True)
    b = decode_segments_pd(fresh_seg).sort_values(
        ["term_key", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # segments are stats-independent (v2: raw tf/dl), so after the
    # reindex the WAND engine over the DISK index equals the fresh
    # DataFrame engine EXACTLY — no stale-avgdl caveat
    from search_engine_spark.operators.wand import wand_topk

    disk = DiskIndex(spark, idx_dir)
    for q in ("w00000 w00001", "w00005"):
        w = [(r["doc_id"], r["score"])
             for r in wand_topk(disk.segments, disk.terms, q, k=10,
                                stats=disk.stats).collect()]
        f = [(r["doc_id"], r["score"]) for r in bm25_topk(fresh, q, k=10).collect()]
        assert w == f, q


def test_reindex_to_empty_text_keeps_dense_space(
    spark, tiny_transcripts, tmp_path
):
    """new_text that lemmatizes to NOTHING must not drop the doc's
    doclen row: n_docs stays aligned with the dense id space (merge
    offsets depend on it) and queries keep working (review r3)."""
    idx_dir = str(tmp_path / "idx")
    ix = build_index(tiny_transcripts, use_arrow_udf=True, weighted=True)
    write_index(ix, idx_dir, input_desc="tiny", bucket_width=512)
    n_before = DiskIndex(spark, idx_dir).stats.n_docs

    row = tiny_transcripts.orderBy("conv_id", "turn_idx").limit(1).collect()[0]
    info = reindex_turn(spark, idx_dir, row["conv_id"], row["turn_idx"],
                        "the and of", bucket_width=512)  # all stopwords
    disk = DiskIndex(spark, idx_dir)
    assert disk.stats.n_docs == n_before
    d = info["doc_id"]
    got = disk.as_inverted_index()
    dl_row = got.doclen.filter(F.col("doc_id") == d).collect()
    assert len(dl_row) == 1 and dl_row[0]["dl"] == 0
    assert got.postings.filter(F.col("doc_id") == d).count() == 0
    # the emptied doc never matches; other docs still rank
    hits = bm25_topk(got, "w00000", k=5).collect()
    assert hits and all(r["doc_id"] != d for r in hits)


def test_reindex_unknown_turn_raises(spark, tiny_transcripts, tmp_path):
    import pytest

    idx_dir = str(tmp_path / "idx2")
    ix = build_index(tiny_transcripts, use_arrow_udf=True, weighted=True)
    write_index(ix, idx_dir, input_desc="tiny", bucket_width=512)
    with pytest.raises(ValueError, match="matches 0 docs"):
        reindex_turn(spark, idx_dir, "no-such-conv", 0, "x", bucket_width=512)


def test_delete_scope_equals_fresh_build(spark, tiny_transcripts, tmp_path):
    """delete_scope (reference delete_site_information): after deleting
    one conversation, the authoritative tables equal a from-scratch
    build over the remaining corpus (keyed comparison — survivors keep
    their doc_ids, the fresh build re-densifies), and both engines stay
    rank-identical over the re-encoded segments."""
    from search_engine_spark.operators.query import bm25_topk
    from search_engine_spark.operators.wand import wand_topk
    from search_engine_spark.sources.index_store import delete_scope

    idx_dir = str(tmp_path / "idx")
    ix = build_index(tiny_transcripts, use_arrow_udf=True, weighted=True)
    write_index(ix, idx_dir, input_desc="tiny", bucket_width=512)

    victim = tiny_transcripts.orderBy("conv_id").limit(1).collect()[0]["conv_id"]
    info = delete_scope(spark, idx_dir, "conv_id", victim, bucket_width=512)
    assert info["deleted"] > 0 and info["buckets_reencoded"]

    remaining = tiny_transcripts.filter(F.col("conv_id") != victim)
    fresh = build_index(remaining, use_arrow_udf=True, weighted=True)
    got = DiskIndex(spark, idx_dir).as_inverted_index()

    def keyed(index, df, cols):
        keys = index.docs.select("doc_id", "conv_id", "turn_idx")
        return sorted(
            tuple(r)
            for r in df.join(keys, "doc_id")
            .select("conv_id", "turn_idx", *cols)
            .collect()
        )

    # doc_ids differ (holes vs dense) -> compare keyed by (conv, turn)
    assert keyed(got, got.postings, ["lemma", "tf"]) == keyed(
        fresh, fresh.postings, ["lemma", "tf"]
    )
    assert keyed(got, got.doclen, ["dl"]) == keyed(fresh, fresh.doclen, ["dl"])
    a = sorted(tuple(r) for r in got.terms.select("lemma", "df", "cf").collect())
    b = sorted(tuple(r) for r in fresh.terms.select("lemma", "df", "cf").collect())
    assert a == b
    assert got.stats.n_docs == fresh.stats.n_docs
    assert abs(got.stats.avgdl - fresh.stats.avgdl) < 1e-12
    # no deleted doc remains anywhere
    assert got.docs.filter(F.col("conv_id") == victim).count() == 0

    # keyed score identity vs the fresh build, and DF==WAND on the
    # surgically re-encoded segments
    disk = DiskIndex(spark, idx_dir)
    q = "w00000 w00001"
    got_scores = {
        (r["conv_id"], r["turn_idx"]): r["score"]
        for r in bm25_topk(got, q, k=50)
        .join(got.docs, "doc_id")
        .select("conv_id", "turn_idx", "score")
        .collect()
    }
    fresh_scores = {
        (r["conv_id"], r["turn_idx"]): r["score"]
        for r in bm25_topk(fresh, q, k=50)
        .join(fresh.docs, "doc_id")
        .select("conv_id", "turn_idx", "score")
        .collect()
    }
    assert got_scores == fresh_scores
    wand_rows = wand_topk(disk.segments, disk.terms, q, k=50, stats=disk.stats)
    df_rows = bm25_topk(got, q, k=50)
    assert [(r["doc_id"], r["score"]) for r in df_rows.collect()] == [
        (r["doc_id"], r["score"]) for r in wand_rows.collect()
    ]


def test_delete_scope_crash_replay_and_empty_scope(spark, tiny_transcripts, tmp_path):
    """An interrupted delete (journal present, segments stale) is
    repaired by the next delete_scope call — even a no-op one."""
    import json as _json
    import os
    import shutil

    from search_engine_spark.operators.query import bm25_topk
    from search_engine_spark.operators.wand import wand_topk
    from search_engine_spark.sources.index_store import delete_scope

    idx_dir = str(tmp_path / "idx")
    ix = build_index(tiny_transcripts, use_arrow_udf=False, weighted=True)
    write_index(ix, idx_dir, input_desc="tiny", bucket_width=512)

    victim = tiny_transcripts.orderBy("conv_id").limit(1).collect()[0]["conv_id"]
    info = delete_scope(spark, idx_dir, "conv_id", victim, bucket_width=512)
    assert info["deleted"] > 0

    # simulate a crash AFTER the table swaps but BEFORE the re-encode:
    # restore stale segments for the affected buckets and re-create the
    # journal the crashed run would have left behind
    stale_src = str(tmp_path / "stale")
    ix2 = build_index(tiny_transcripts, use_arrow_udf=False, weighted=True)
    write_index(ix2, stale_src, input_desc="tiny", bucket_width=512)
    for b in info["buckets_reencoded"]:
        dst = os.path.join(idx_dir, "segments", f"bucket={b}")
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(os.path.join(stale_src, "segments", f"bucket={b}"), dst)
    with open(os.path.join(idx_dir, "delete_pending.json"), "w") as fh:
        _json.dump({"buckets": info["buckets_reencoded"], "bucket_width": 512,
                    "scope": ["conv_id", victim]}, fh)

    # stale segments now serve deleted docs (the crash symptom) …
    disk_stale = DiskIndex(spark, idx_dir)
    q = "w00000"
    wand_stale = {
        r["doc_id"]
        for r in wand_topk(disk_stale.segments, disk_stale.terms, q, k=100,
                           stats=disk_stale.stats).collect()
    }
    df_ids = {
        r["doc_id"]
        for r in bm25_topk(disk_stale.as_inverted_index(), q, k=100).collect()
    }
    # … and a NO-OP delete call replays the journaled re-encode
    info2 = delete_scope(spark, idx_dir, "conv_id", "conv-does-not-exist",
                         bucket_width=512)
    assert info2["deleted"] == 0
    assert not os.path.isfile(os.path.join(idx_dir, "delete_pending.json"))
    disk_fixed = DiskIndex(spark, idx_dir)
    wand_fixed = {
        r["doc_id"]
        for r in wand_topk(disk_fixed.segments, disk_fixed.terms, q, k=100,
                           stats=disk_fixed.stats).collect()
    }
    assert wand_fixed == df_ids


def test_delete_scope_folds_streamed_deltas_first(spark, tmp_path):
    """Streamed (not-yet-compacted) turns of the scope are deleted too,
    and the delta log cannot double-count the rebuilt dictionary."""
    import os

    from search_engine_spark.corpus import synthesize_transcripts
    from search_engine_spark.sources.index_store import delete_scope
    from search_engine_spark.streaming.incremental import (
        incremental_index_refresh,
    )

    full = synthesize_transcripts(spark, 60, partitions=2).cache()
    convs = sorted(r[0] for r in full.select("conv_id").distinct().collect())
    split, victim = convs[40], convs[45]  # victim arrives via the stream
    batch = full.filter(F.col("conv_id") < split)
    streamed = full.filter(F.col("conv_id") >= split)

    idx_dir = str(tmp_path / "idx")
    write_index(build_index(batch, use_arrow_udf=False, weighted=True),
                idx_dir, input_desc="batch", bucket_width=512)
    stream_in = str(tmp_path / "stream_in")
    streamed.write.parquet(stream_in)
    incremental_index_refresh(spark, stream_in, idx_dir)
    assert os.path.isdir(os.path.join(idx_dir, "docs_stream"))

    info = delete_scope(spark, idx_dir, "conv_id", victim, bucket_width=512)
    assert info["deleted"] > 0
    assert not os.path.isdir(os.path.join(idx_dir, "terms_delta"))

    got = DiskIndex(spark, idx_dir).as_inverted_index()
    assert got.docs.filter(F.col("conv_id") == victim).count() == 0
    # dictionary equals a fresh build over everything-but-victim
    fresh = build_index(full.filter(F.col("conv_id") != victim),
                        use_arrow_udf=False, weighted=True)
    a = sorted(tuple(r) for r in got.terms.select("lemma", "df", "cf").collect())
    b = sorted(tuple(r) for r in fresh.terms.select("lemma", "df", "cf").collect())
    assert a == b
    assert got.stats.n_docs == fresh.stats.n_docs


def test_delete_where_predicate_equals_fresh_build(spark, tiny_transcripts,
                                                   tmp_path):
    """delete_where (ES _delete_by_query): a ROLE predicate — deleting
    every tool turn — leaves tables keyed-equal to a fresh build over
    the surviving corpus; the journal records the predicate."""
    from search_engine_spark.operators.query import bm25_topk
    from search_engine_spark.sources.index_store import delete_where

    idx_dir = str(tmp_path / "idx")
    ix = build_index(tiny_transcripts, use_arrow_udf=False, weighted=True)
    write_index(ix, idx_dir, input_desc="tiny", bucket_width=512)

    n_tool = tiny_transcripts.filter(F.col("role") == "tool").count()
    assert n_tool > 0, "fixture needs tool turns"
    info = delete_where(spark, idx_dir, "role = 'tool'", bucket_width=512)
    assert info["deleted"] == n_tool

    remaining = tiny_transcripts.filter(F.col("role") != "tool")
    fresh = build_index(remaining, use_arrow_udf=False, weighted=True)
    got = DiskIndex(spark, idx_dir).as_inverted_index()

    def keyed(index, df, cols):
        keys = index.docs.select("doc_id", "conv_id", "turn_idx")
        return sorted(
            tuple(r)
            for r in df.join(keys, "doc_id")
            .select("conv_id", "turn_idx", *cols)
            .collect()
        )

    assert keyed(got, got.postings, ["lemma", "tf"]) == keyed(
        fresh, fresh.postings, ["lemma", "tf"]
    )
    assert got.stats.n_docs == fresh.stats.n_docs
    assert got.docs.filter(F.col("role") == "tool").count() == 0

    # scores over the mutated index == fresh build (keyed)
    q = "w00000s w00001"
    keys = {
        (r["conv_id"], r["turn_idx"]): r["score"]
        for r in bm25_topk(got, q, k=10)
        .join(got.docs.select("doc_id", "conv_id", "turn_idx"), "doc_id")
        .collect()
    }
    fresh_keys = {
        (r["conv_id"], r["turn_idx"]): r["score"]
        for r in bm25_topk(fresh, q, k=10)
        .join(fresh.docs.select("doc_id", "conv_id", "turn_idx"), "doc_id")
        .collect()
    }
    assert keys == fresh_keys

    # no-match predicate is a clean no-op
    info2 = delete_where(spark, idx_dir, "role = 'nonexistent'",
                         bucket_width=512)
    assert info2 == {"deleted": 0, "buckets_reencoded": []}
