"""v4 bucket-partitioned storage layout invariants (sources/index_store):

1. mutations are partition-bounded — a 1-turn reindex rewrites ONLY the
   affected bucket dir of postings/doclen/docs (every other bucket's
   files stay byte-identical), and a scope delete rewrites only the
   buckets that lost docs — the parquet stand-in for Iceberg MERGE
   (reference Parser.java:181-256 single-page delete+reinsert bound);
2. a Zipf-hot lemma's published postings span MULTIPLE files (>= one
   per bucket), so the hot-term scan keeps file-level parallelism
   (BENCH_r02 `bm25_df_q0` regression suspect, VERDICT r2);
3. an interrupted delete_scope is repaired by replaying the WHOLE
   journaled delete, even from a crash BETWEEN the table swaps
   (ADVICE r2: re-encode-only replay left that state inconsistent).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import build_index
from search_engine_spark.sources.index_store import (
    DiskIndex,
    delete_scope,
    reindex_turn,
    write_index,
)

BW = 512  # bucket width: ~4k-turn corpus -> ~8 buckets


def _fingerprint(table_dir: str) -> dict[str, dict[str, tuple[int, float]]]:
    """{bucket_dir: {file: (size, mtime)}} for every bucket=* dir."""
    out: dict[str, dict[str, tuple[int, float]]] = {}
    for name in os.listdir(table_dir):
        if not name.startswith("bucket="):
            continue
        bdir = os.path.join(table_dir, name)
        out[name] = {
            f: (os.path.getsize(os.path.join(bdir, f)),
                os.path.getmtime(os.path.join(bdir, f)))
            for f in os.listdir(bdir)
            if not f.startswith(".")
        }
    return out


def test_reindex_rewrites_only_affected_bucket(spark, tiny_transcripts, tmp_path):
    idx_dir = str(tmp_path / "idx")
    ix = build_index(tiny_transcripts, use_arrow_udf=False, weighted=True)
    write_index(ix, idx_dir, input_desc="tiny", bucket_width=BW)

    for table in ("postings", "doclen", "docs"):
        assert os.path.isdir(os.path.join(idx_dir, table, "bucket=0")), table
    before = {t: _fingerprint(os.path.join(idx_dir, t))
              for t in ("postings", "doclen", "docs")}
    n_buckets = len(before["postings"])
    assert n_buckets >= 2, "corpus must span multiple buckets for this test"

    row = tiny_transcripts.orderBy("conv_id", "turn_idx").limit(1).collect()[0]
    info = reindex_turn(spark, idx_dir, row["conv_id"], row["turn_idx"],
                        "w00000 w00001 w00002", bucket_width=BW)
    hit = f"bucket={info['bucket']}"

    for table in ("postings", "doclen", "docs"):
        after = _fingerprint(os.path.join(idx_dir, table))
        assert after[hit] != before[table][hit], (table, "affected bucket unchanged")
        for bname, files in before[table].items():
            if bname == hit:
                continue
            assert after[bname] == files, (
                table, bname, "untouched bucket was rewritten")


def test_delete_scope_rewrites_only_affected_buckets(spark, tiny_transcripts, tmp_path):
    idx_dir = str(tmp_path / "idx")
    ix = build_index(tiny_transcripts, use_arrow_udf=False, weighted=True)
    write_index(ix, idx_dir, input_desc="tiny", bucket_width=BW)
    before = {t: _fingerprint(os.path.join(idx_dir, t))
              for t in ("postings", "doclen", "docs")}

    victim = tiny_transcripts.orderBy("conv_id").limit(1).collect()[0]["conv_id"]
    info = delete_scope(spark, idx_dir, "conv_id", victim, bucket_width=BW)
    assert info["deleted"] > 0
    affected = {f"bucket={b}" for b in info["buckets_reencoded"]}
    assert len(before["postings"]) - len(affected) >= 1, (
        "need at least one untouched bucket to make the bound observable")

    for table in ("postings", "doclen", "docs"):
        after = _fingerprint(os.path.join(idx_dir, table))
        for bname, files in before[table].items():
            if bname in affected:
                continue
            assert after[bname] == files, (
                table, bname, "untouched bucket was rewritten")


def test_hot_lemma_postings_span_multiple_files(spark, tiny_transcripts, tmp_path):
    idx_dir = str(tmp_path / "idx")
    ix = build_index(tiny_transcripts, use_arrow_udf=False, weighted=True)
    write_index(ix, idx_dir, input_desc="tiny", bucket_width=BW)

    hot = (
        ix.terms.orderBy(F.col("df").desc(), F.col("lemma").asc())
        .limit(1).collect()[0]["lemma"]
    )
    files = (
        spark.read.parquet(os.path.join(idx_dir, "postings"))
        .filter(F.col("lemma") == hot)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    n_buckets = len(_fingerprint(os.path.join(idx_dir, "postings")))
    assert n_buckets >= 2
    # the hot lemma appears in (at least) one file per bucket it touches
    # — file-level scan parallelism by construction, not one hot file
    assert files >= n_buckets, (hot, files, n_buckets)


def test_delete_scope_replay_from_mid_swap_crash(spark, tiny_transcripts, tmp_path):
    """Crash AFTER the postings swap but BEFORE doclen/docs/terms/stats:
    the journaled replay must converge to the fully-deleted state
    (ADVICE r2 — replaying only the segment re-encode left df/n_docs/
    avgdl counting deleted docs and deleted docs alive in docs/doclen)."""
    pre_dir = str(tmp_path / "pre")
    ix = build_index(tiny_transcripts, use_arrow_udf=False, weighted=True)
    write_index(ix, pre_dir, input_desc="tiny", bucket_width=BW)

    # reference post-delete state
    ref_dir = str(tmp_path / "ref")
    shutil.copytree(pre_dir, ref_dir)
    victim = tiny_transcripts.orderBy("conv_id").limit(1).collect()[0]["conv_id"]
    info = delete_scope(spark, ref_dir, "conv_id", victim, bucket_width=BW)
    assert info["deleted"] > 0

    # crashed state: pre-delete everything EXCEPT postings (already
    # swapped), journal present
    crash_dir = str(tmp_path / "crash")
    shutil.copytree(pre_dir, crash_dir)
    shutil.rmtree(os.path.join(crash_dir, "postings"))
    shutil.copytree(os.path.join(ref_dir, "postings"),
                    os.path.join(crash_dir, "postings"))
    with open(os.path.join(crash_dir, "delete_pending.json"), "w") as fh:
        json.dump({"buckets": info["buckets_reencoded"], "bucket_width": BW,
                   "scope": ["conv_id", victim]}, fh)

    # any delete_scope call replays the journaled delete first
    info2 = delete_scope(spark, crash_dir, "conv_id", "conv-does-not-exist",
                         bucket_width=BW)
    assert info2["deleted"] == 0
    assert not os.path.isfile(os.path.join(crash_dir, "delete_pending.json"))

    got = DiskIndex(spark, crash_dir)
    want = DiskIndex(spark, ref_dir)
    assert got.stats.n_docs == want.stats.n_docs
    assert abs(got.stats.avgdl - want.stats.avgdl) < 1e-12
    for cols, a_df, b_df in [
        (["doc_id", "lemma", "tf"], got.as_inverted_index().postings,
         want.as_inverted_index().postings),
        (["doc_id", "dl"], got.as_inverted_index().doclen,
         want.as_inverted_index().doclen),
        (["lemma", "df", "cf"], got.terms, want.terms),
    ]:
        a = sorted(tuple(r) for r in a_df.select(*cols).collect())
        b = sorted(tuple(r) for r in b_df.select(*cols).collect())
        assert a == b, cols
    assert got.docs.filter(F.col("conv_id") == victim).count() == 0


def test_mutation_residue_hidden_from_partition_discovery(
    spark, tiny_transcripts, tmp_path
):
    """Swap residue inside a LIVE partitioned table must be invisible to
    Hadoop partition discovery: the in-flight copy and the retired
    partition of `_swap_write(postings/bucket=N)` / `_swap_buckets`
    park as DOT-prefixed siblings. A visible `bucket=3.tmp_swap` dir
    would be discovered as partition value "3.tmp_swap" (forcing the
    bucket column to string) and its stale rows served next to the
    live ones — so (a) mutations leave only `bucket=*` entries behind,
    and (b) crash residue in the hidden form is ignored by readers and
    reaped by the next swap of the same bucket."""
    idx_dir = str(tmp_path / "idx")
    ix = build_index(tiny_transcripts, use_arrow_udf=False, weighted=True)
    write_index(ix, idx_dir, input_desc="tiny", bucket_width=BW)

    row = tiny_transcripts.orderBy("conv_id", "turn_idx").limit(1).collect()[0]
    info = reindex_turn(spark, idx_dir, row["conv_id"], row["turn_idx"],
                        "w00000 w00001 w00002", bucket_width=BW)
    victim = tiny_transcripts.orderBy(F.col("conv_id").desc()).limit(1) \
        .collect()[0]["conv_id"]
    delete_scope(spark, idx_dir, "conv_id", victim, bucket_width=BW)

    # (a) no visible non-partition entries survive either mutation
    for table in ("postings", "doclen", "docs"):
        tdir = os.path.join(idx_dir, table)
        stray = [n for n in os.listdir(tdir)
                 if not n.startswith(("bucket=", "_", "."))]
        assert stray == [], (table, stray)

    # (b) hidden crash residue: a stale copy of bucket=B parked under
    # the dot-name is ignored by partition discovery ...
    pdir = os.path.join(idx_dir, "postings")
    bdir = os.path.join(pdir, f"bucket={info['bucket']}")
    residue = os.path.join(pdir, f".bucket={info['bucket']}.old")
    n_clean = spark.read.parquet(pdir).count()
    shutil.copytree(bdir, residue)
    live = spark.read.parquet(pdir)
    assert dict(live.dtypes)["bucket"] == "int"
    assert live.count() == n_clean  # residue rows NOT double-served

    # ... and the next swap of that bucket reaps it
    reindex_turn(spark, idx_dir, row["conv_id"], row["turn_idx"],
                 "w00003 w00004", bucket_width=BW)
    assert not os.path.isdir(residue)
