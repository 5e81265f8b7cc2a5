"""Shard-merge (index_store.merge_indexes): two independently-built
indexes over disjoint corpus shards fold into one; queries over the
merged index match a from-scratch build of the union corpus (by
natural key); dst's pre-existing bucket dirs are never rewritten."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.corpus import synthesize_transcripts
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query import bm25_topk
from search_engine_spark.sources.index_store import (
    DiskIndex,
    list_snapshots,
    load_stats,
    merge_indexes,
    write_index,
)

QUERY = "w00001s w00002ies"


def _dir_snapshot(root):
    out = {}
    for dp, _, fns in os.walk(root):
        for fn in fns:
            if fn.lstrip(".").startswith("_"):  # _SUCCESS (+.crc) markers
                continue  # are rewritten by any append job on the table
            p = os.path.join(dp, fn)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def _topk_by_natural_key(spark, index_dir, query, k=10):
    """(conv_id, turn_idx, score) ranking — doc_id numbering differs
    between a merged index and a union build, the natural key must not."""
    disk = DiskIndex(spark, index_dir)
    hits = bm25_topk(disk.as_inverted_index(), query, k=k)
    return [
        (r["conv_id"], r["turn_idx"], r["score"])
        for r in hits.join(
            disk.docs.select("doc_id", "conv_id", "turn_idx"), "doc_id"
        ).orderBy(F.col("score").desc(), "conv_id", "turn_idx").collect()
    ]


@pytest.fixture(scope="module")
def merged(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("merge")
    dst = str(base / "dst")
    src = str(base / "src")
    union = str(base / "union")
    all_t = synthesize_transcripts(spark, 80, partitions=2).cache()
    shard_a = all_t.filter(F.col("conv_id") < "conv-00000050")
    shard_b = all_t.filter(F.col("conv_id") >= "conv-00000050")
    write_index(build_index(shard_a, use_arrow_udf=False), dst,
                input_desc="shard_a", bucket_width=256)
    write_index(build_index(shard_b, use_arrow_udf=False), src,
                input_desc="shard_b", bucket_width=256)
    write_index(build_index(all_t, use_arrow_udf=False), union,
                input_desc="union", bucket_width=256)
    before = _dir_snapshot(os.path.join(dst, "segments"))
    stats = merge_indexes(spark, dst, src)
    return dst, src, union, before, stats


def test_merge_matches_union_build(spark, merged):
    dst, _, union, _, stats = merged
    assert _topk_by_natural_key(spark, dst, QUERY) == _topk_by_natural_key(
        spark, union, QUERY
    )
    su, sm = load_stats(union), load_stats(dst)
    assert sm["n_docs"] == su["n_docs"]
    assert abs(sm["avgdl"] - su["avgdl"]) < 1e-9
    assert stats["new_buckets"] >= 1


def test_merge_never_rewrites_dst_buckets(merged):
    dst, _, _, before, _ = merged
    after = _dir_snapshot(os.path.join(dst, "segments"))
    for rel, sig in before.items():
        assert after.get(rel) == sig, rel  # old segment files untouched


def test_merged_dictionary_and_engines_agree(spark, merged):
    """Dictionary df/cf equal the union build's; WAND over the merged
    segments ranks identically to the DF engine (the three-engine
    invariant holds across a merge)."""
    from search_engine_spark.operators.wand import wand_topk

    dst, _, union, _, _ = merged
    t_m = {
        r["lemma"]: (r["df"], r["cf"])
        for r in spark.read.parquet(os.path.join(dst, "terms")).collect()
    }
    t_u = {
        r["lemma"]: (r["df"], r["cf"])
        for r in spark.read.parquet(os.path.join(union, "terms")).collect()
    }
    assert t_m == t_u
    disk = DiskIndex(spark, dst)
    a = bm25_topk(disk.as_inverted_index(), QUERY).collect()
    b = wand_topk(disk.segments, disk.terms, QUERY, stats=disk.stats).collect()
    assert [(r.doc_id, r.score) for r in a] == [(r.doc_id, r.score) for r in b]


def test_merge_snapshot_and_fsck(spark, merged):
    dst, src, _, _, _ = merged
    snaps = list_snapshots(dst)
    assert len(snaps) == 1 and "pre-merge" in snaps[0]["note"]
    from tests.test_fsck import _fsck

    assert _fsck(dst) == []

    # guards: self-merge and double-merge of the same ids are refused
    with pytest.raises(ValueError, match="same index"):
        merge_indexes(spark, dst, dst)


@pytest.fixture(scope="module")
def shards(spark, tmp_path_factory):
    """Two shard indexes + the union build, UNTOUCHED by the merge tests
    (the merged fixture consumes its dst)."""
    base = tmp_path_factory.mktemp("fed")
    a, b, u = str(base / "a"), str(base / "b"), str(base / "u")
    all_t = synthesize_transcripts(spark, 50, partitions=2).cache()
    write_index(build_index(
        all_t.filter(F.col("conv_id") < "conv-00000030"),
        use_arrow_udf=False), a, input_desc="a", bucket_width=256)
    write_index(build_index(
        all_t.filter(F.col("conv_id") >= "conv-00000030"),
        use_arrow_udf=False), b, input_desc="b", bucket_width=256)
    write_index(build_index(all_t, use_arrow_udf=False), u,
                input_desc="u", bucket_width=256)
    return a, b, u


def test_federated_matches_union_index(spark, shards):
    """Query-time federation over two shards with GLOBAL idf ranks
    exactly like a single index over the union corpus (natural keys:
    doc ids are per-shard namespaces)."""
    from search_engine_spark.operators.serving import federated_bm25_topk

    a, b, u = shards
    disks = [DiskIndex(spark, a), DiskIndex(spark, b)]
    fed = federated_bm25_topk(disks, QUERY, k=10)
    rows = fed.collect()
    assert {r["shard"] for r in rows} == {0, 1}  # both shards contribute
    keyed = []
    for r in rows:
        d = disks[r["shard"]]
        doc = d.docs.filter(F.col("doc_id") == r["doc_id"]).select(
            "conv_id", "turn_idx").head()
        keyed.append((doc["conv_id"], doc["turn_idx"], r["score"]))
    want = _topk_by_natural_key(spark, u, QUERY, k=10)
    assert sorted(keyed) == sorted(want)
    # scores descend and the global ordering is the union index's
    assert [x[2] for x in keyed] == [x[2] for x in want]


def test_federated_empty_and_absent_terms(spark, shards):
    from search_engine_spark.operators.serving import federated_bm25_topk

    a, b, _ = shards
    disks = [DiskIndex(spark, a), DiskIndex(spark, b)]
    assert federated_bm25_topk(disks, "").collect() == []
    assert federated_bm25_topk(disks, "zzzznope").collect() == []


def test_three_way_sequential_merge(spark, shards, tmp_path):
    """merge(merge(a, b), c) == union build: the offset arithmetic and
    dictionary merge compose across repeated merges (how an N-shard
    parallel build actually lands)."""
    import shutil

    a, b, u = shards
    dst = str(tmp_path / "acc")
    shutil.copytree(a, dst)
    # third shard: a disjoint extra corpus slice
    extra = synthesize_transcripts(spark, 60, partitions=2).filter(
        F.col("conv_id") >= "conv-00000050"
    )
    c = str(tmp_path / "c")
    u3 = str(tmp_path / "u3")
    write_index(build_index(extra, use_arrow_udf=False), c,
                input_desc="c", bucket_width=256)
    all_t = synthesize_transcripts(spark, 60, partitions=2)
    write_index(build_index(all_t, use_arrow_udf=False), u3,
                input_desc="u3", bucket_width=256)

    merge_indexes(spark, dst, b, snapshot=False)
    merge_indexes(spark, dst, c, snapshot=False)
    assert _topk_by_natural_key(spark, dst, QUERY) == _topk_by_natural_key(
        spark, u3, QUERY
    )
    assert load_stats(dst)["n_docs"] == load_stats(u3)["n_docs"]


def test_merge_spilled_mid_layout(spark, tmp_path):
    """The AT-SCALE build layout (fused docID spill: docs store _mid +
    docid_adjust) merges directly — dst's docs materialize in place
    (copy-on-first-write), src is read resolved and never mutated."""
    import shutil
    import tempfile

    all_t = synthesize_transcripts(spark, 40, partitions=2).cache()
    dst, src, u = str(tmp_path / "d"), str(tmp_path / "s"), str(tmp_path / "u")
    for d, pred in ((dst, F.col("conv_id") < "conv-00000020"),
                    (src, F.col("conv_id") >= "conv-00000020")):
        write_index(
            build_index(all_t.filter(pred), use_arrow_udf=True,
                        scratch_dir=tempfile.mkdtemp()),
            d, input_desc="spilled", bucket_width=256,
        )
    assert load_stats(dst)["docid_adjust"] or load_stats(src)["docid_adjust"], \
        "fixture should exercise the _mid layout"
    src_before = _dir_snapshot(src)
    write_index(build_index(all_t, use_arrow_udf=False), u,
                input_desc="u", bucket_width=256)

    merge_indexes(spark, dst, src, snapshot=False)
    assert _topk_by_natural_key(spark, dst, QUERY) == _topk_by_natural_key(
        spark, u, QUERY
    )
    assert load_stats(dst)["docid_adjust"] == {}  # materialized
    assert _dir_snapshot(src) == src_before  # src never mutated


def test_federated_wand_rank_identical_to_df(spark, shards):
    """The WAND federation evaluates the identical global model — rank-
    and score-identical to the DF federation, in AND and OR modes."""
    from search_engine_spark.operators.serving import (
        federated_bm25_topk,
        federated_wand_topk,
    )

    a, b, _ = shards
    disks = [DiskIndex(spark, a), DiskIndex(spark, b)]
    for match_all in (True, False):
        df_hits = [(r["shard"], r["doc_id"], r["score"]) for r in
                   federated_bm25_topk(disks, QUERY, k=10,
                                       match_all=match_all).collect()]
        wd_hits = [(r["shard"], r["doc_id"], r["score"]) for r in
                   federated_wand_topk(disks, QUERY, k=10,
                                       match_all=match_all).collect()]
        assert df_hits == wd_hits and df_hits
    assert federated_wand_topk(disks, "zzzznope").collect() == []
