"""Near-real-time serving (DiskIndex nrt views + serving.nrt_wand_topk):
uncompacted streamed turns must be retrievable with the SAME scores a
from-scratch build over the merged corpus would give — delta-merged
dictionary (terms_delta), exact stream-adjusted stats, and a WAND path
that unions block-max-over-base with DF-scoring-over-stream."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.corpus import TRANSCRIPT_SCHEMA, synthesize_transcripts
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query import bm25_topk
from search_engine_spark.operators.serving import nrt_wand_topk
from search_engine_spark.sources.index_store import (
    DiskIndex,
    compact_index,
    write_index,
)
from search_engine_spark.streaming.incremental import incremental_index_refresh

SPLIT = "conv-00000060"
NOVEL = "zzznovel"  # lemma that exists ONLY in the streamed delta


@pytest.fixture(scope="module")
def nrt_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("nrt")
    full = synthesize_transcripts(spark, 90, partitions=2).cache()
    batch = full.filter(F.col("conv_id") < SPLIT)
    streamed = full.filter(F.col("conv_id") >= SPLIT)
    # one extra streamed turn carrying a lemma the base has never seen
    novel = spark.createDataFrame(
        [("conv-zz000000", 0, "user", f"{NOVEL} {NOVEL} w00001s", None,
          datetime.datetime(2026, 1, 1, 12, 0, 0))],
        TRANSCRIPT_SCHEMA,
    )
    merged = full.unionByName(novel).cache()

    index_dir = str(root / "index")
    write_index(build_index(batch, use_arrow_udf=False, weighted=True),
                index_dir, input_desc="batch", bucket_width=512)
    stream_in = str(root / "stream_in")
    streamed.unionByName(novel).write.parquet(stream_in)
    incremental_index_refresh(spark, stream_in, index_dir)
    return index_dir, merged


def _key_of(docs_df):
    return {
        int(r["doc_id"]): (r["conv_id"], int(r["turn_idx"]))
        for r in docs_df.select("doc_id", "conv_id", "turn_idx").collect()
    }


def test_nrt_stats_and_terms_match_fresh_build(spark, nrt_index):
    index_dir, merged = nrt_index
    disk = DiskIndex(spark, index_dir)
    fresh = build_index(merged, use_arrow_udf=False, weighted=True)
    st = disk.nrt_stats()
    assert st.n_docs == fresh.stats.n_docs
    # bit-identical, not approx: nrt_stats recovers the exact integer
    # base doclen sum from round(n*avgdl)
    assert st.avgdl == fresh.stats.avgdl
    a = {r["lemma"]: (r["df"], r["cf"]) for r in disk.nrt_terms().collect()}
    b = {r["lemma"]: (r["df"], r["cf"]) for r in fresh.terms.collect()}
    assert a == b
    assert NOVEL in a


@pytest.mark.parametrize("q", ["w00001s w00002ies", "w00000 w00003ing"])
def test_nrt_df_engine_equals_fresh_build(spark, nrt_index, q):
    index_dir, merged = nrt_index
    disk = DiskIndex(spark, index_dir)
    ix = disk.as_inverted_index(nrt=True)
    fresh = build_index(merged, use_arrow_udf=False, weighted=True)
    key_nrt = _key_of(
        disk.docs.select("doc_id", "conv_id", "turn_idx").unionByName(
            spark.read.parquet(os.path.join(index_dir, "docs_stream"))
            .select("doc_id", "conv_id", "turn_idx")
        )
    )
    key_fresh = _key_of(fresh.docs)
    got = [
        (key_nrt[r.doc_id], round(r.score, 9))
        for r in bm25_topk(ix, q).collect()
    ]
    ref = [
        (key_fresh[r.doc_id], round(r.score, 9))
        for r in bm25_topk(fresh, q).collect()
    ]
    assert got == ref, q


def test_streamed_only_lemma_requires_nrt(spark, nrt_index):
    index_dir, _ = nrt_index
    disk = DiskIndex(spark, index_dir)
    # base dictionary has never seen the lemma → DF engine finds nothing
    assert bm25_topk(disk.as_inverted_index(), NOVEL).count() == 0
    hits = bm25_topk(disk.as_inverted_index(nrt=True), NOVEL)
    assert hits.count() == 1
    # and the WAND NRT path serves it too (stream side of the union)
    wand_hits = nrt_wand_topk(disk, NOVEL)
    assert [r.doc_id for r in wand_hits.collect()] == [
        r.doc_id for r in hits.collect()
    ]


@pytest.mark.parametrize("match_all", [True, False])
def test_nrt_wand_rank_identical_to_df(spark, nrt_index, match_all):
    index_dir, _ = nrt_index
    disk = DiskIndex(spark, index_dir)
    ix = disk.as_inverted_index(nrt=True)
    q = "w00001s w00002ies"
    df_res = [
        (r.doc_id, r.score)
        for r in bm25_topk(ix, q, k=10, match_all=match_all).collect()
    ]
    wd_res = [
        (r.doc_id, r.score)
        for r in nrt_wand_topk(disk, q, k=10, match_all=match_all).collect()
    ]
    assert wd_res == df_res


def test_search_cli_nrt_flag(nrt_index):
    """jobs/search.py --nrt drives the same NRT views through the real
    CLI: a streamed-only lemma is invisible without the flag and served
    identically by the df and wand engines with it."""
    import json
    import subprocess
    import sys

    index_dir, _ = nrt_index
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)

    def search(*args):
        p = subprocess.run(
            [sys.executable, os.path.join(repo, "jobs", "search.py"),
             "--local-cpus", "4", "--index", index_dir, *args],
            capture_output=True, text=True, cwd=repo, timeout=300, env=env,
        )
        assert p.returncode == 0, p.stderr[-2000:]
        return [json.loads(l) for l in p.stdout.strip().splitlines() if l]

    assert search("--query", NOVEL, "--engine", "df") == []
    df = search("--query", NOVEL, "--engine", "df", "--nrt")
    wand = search("--query", NOVEL, "--engine", "wand", "--nrt")
    assert len(df) == 1 and df == wand


def test_nrt_wand_mid_epoch_window_serves_base_only(
    spark, tmp_path
):
    """A query landing between the refresher's postings_stream append
    and its doclen_stream append must serve base-only instead of
    crashing on the missing dir (review r3)."""
    import shutil

    from search_engine_spark.operators.serving import nrt_wand_topk
    from search_engine_spark.operators.wand import wand_topk

    full = synthesize_transcripts(spark, 20, partitions=2)
    index_dir = str(tmp_path / "idx")
    write_index(build_index(full, use_arrow_udf=False, weighted=True),
                index_dir, input_desc="b", bucket_width=512)
    # simulate the mid-epoch window: postings_stream exists, doclen/docs
    # streams not yet written
    DiskIndex(spark, index_dir).as_inverted_index().postings.limit(
        3
    ).write.parquet(os.path.join(index_dir, "postings_stream"))
    disk = DiskIndex(spark, index_dir)
    got = nrt_wand_topk(disk, "w00001s", k=5).collect()
    base = wand_topk(disk.segments, disk.nrt_terms(), "w00001s", k=5,
                     stats=disk.nrt_stats()).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in base
    ]
    shutil.rmtree(os.path.join(index_dir, "postings_stream"))


def test_nrt_view_collapses_to_base_after_compaction(spark, nrt_index):
    index_dir, merged = nrt_index
    # run LAST in the module: compaction consumes the deltas
    compact_index(spark, index_dir, bucket_width=512)
    disk = DiskIndex(spark, index_dir)
    assert not os.path.isdir(os.path.join(index_dir, "terms_delta"))
    st = disk.nrt_stats()
    assert st == disk.stats
    a = {r["lemma"]: (r["df"], r["cf"]) for r in disk.nrt_terms().collect()}
    b = {r["lemma"]: (r["df"], r["cf"]) for r in disk.terms.collect()}
    assert a == b
    # the novel streamed lemma survived compaction into the base dict
    assert NOVEL in a
