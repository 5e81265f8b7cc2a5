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
