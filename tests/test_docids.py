"""Dense docID assignment: bijection over (conv_id, turn_idx), stable
under partitioning (input_hint invariant; operators/docids.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.operators.docids import assign_dense_ids


def test_ids_dense_and_order_preserving(spark, tiny_transcripts):
    docs = assign_dense_ids(tiny_transcripts, ["conv_id", "turn_idx"], "doc_id")
    n = docs.count()
    rows = docs.select("doc_id", "conv_id", "turn_idx").collect()
    assert len(rows) == n
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == list(range(n))  # dense 0..N-1, no dupes
    by_key = sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"]))
    assert [r["doc_id"] for r in by_key] == list(range(n))  # rank order


def test_ids_independent_of_partition_count(spark, tiny_transcripts):
    a = assign_dense_ids(tiny_transcripts, ["conv_id", "turn_idx"], "doc_id", num_partitions=2)
    b = assign_dense_ids(tiny_transcripts, ["conv_id", "turn_idx"], "doc_id", num_partitions=11)
    am = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in a.collect()}
    bm = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in b.collect()}
    assert am == bm


def test_spilled_ids_equal_window_ids(spark, tiny_transcripts, tmp_path):
    """The fused spill path (mono-id + footer counts) must assign the
    EXACT ids of the classic two-pass window path, at any partitioning."""
    from search_engine_spark.operators.docids import assign_dense_ids_spilled

    ref = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in assign_dense_ids(
            tiny_transcripts, ["conv_id", "turn_idx"], "doc_id"
        ).collect()
    }
    for parts in (2, 11):
        docs, adjust = assign_dense_ids_spilled(
            tiny_transcripts, ["conv_id", "turn_idx"],
            str(tmp_path / f"docs_{parts}"), num_partitions=parts,
        )
        got = {
            (r["conv_id"], r["turn_idx"]): r["doc_id"] for r in docs.collect()
        }
        assert got == ref
        assert "_mid" not in docs.columns
        # round-trip through the stored _mid + adjust map (DiskIndex path)
        from search_engine_spark.operators.docids import with_derived_doc_id

        raw = spark.read.parquet(str(tmp_path / f"docs_{parts}"))
        rt = {
            (r["conv_id"], r["turn_idx"]): r["doc_id"]
            for r in with_derived_doc_id(raw, adjust).collect()
        }
        assert rt == ref


def test_per_turn_text_equality(spark, tiny_transcripts, tiny_index):
    """input_hint invariant: the indexed doc store preserves per-turn text
    byte-for-byte under the stable (conv_id, turn_idx) ordering."""
    src = {(r["conv_id"], r["turn_idx"]): r["text"] for r in tiny_transcripts.collect()}
    idx = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in tiny_index.docs.select("conv_id", "turn_idx", "text").collect()}
    assert src == idx


def test_presorted_ids_equal_window_ids(spark, tiny_transcripts, tmp_path):
    """The zero-shuffle presorted path (file offsets + row_index) must
    assign the EXACT ids of the window path when the input dir is
    sorted, and refuse (None) when it is not."""
    from search_engine_spark.operators.docids import docs_from_sorted_dir

    ref = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in assign_dense_ids(
            tiny_transcripts, ["conv_id", "turn_idx"], "doc_id"
        ).collect()
    }
    d = str(tmp_path / "sorted_corpus")
    (
        tiny_transcripts.repartitionByRange(3, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.parquet(d)
    )
    pres = docs_from_sorted_dir(spark, d, ["conv_id", "turn_idx"])
    assert pres is not None
    got = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in pres.docs.collect()
    }
    assert got == ref
    assert sum(pres.file_offsets.values()) > 0  # multiple files chained

    # the same rows hash-shuffled → files overlap in key space → refuse
    u = str(tmp_path / "unsorted_corpus")
    tiny_transcripts.repartition(3, "turn_idx").write.parquet(u)
    assert docs_from_sorted_dir(spark, u, ["conv_id", "turn_idx"]) is None

    # sorted files, but rows swapped INSIDE one file → in-run violation
    s = str(tmp_path / "inner_unsorted")
    (
        tiny_transcripts.repartitionByRange(3, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", F.col("turn_idx").desc())
        .write.parquet(s)
    )
    assert docs_from_sorted_dir(spark, s, ["conv_id", "turn_idx"]) is None


def test_presorted_index_end_to_end(spark, tiny_transcripts, tmp_path):
    """build_index_presorted → write_index → DiskIndex round trip: no
    docs copy under the index dir, ids/text identical to a classic
    build, all three engines serve the same ranking."""
    import os

    from search_engine_spark.operators.docids import docs_from_sorted_dir
    from search_engine_spark.operators.index_build import (
        build_index,
        build_index_presorted,
    )
    from search_engine_spark.operators.query import bm25_topk
    from search_engine_spark.operators.wand import wand_topk
    from search_engine_spark.sources.index_store import DiskIndex, write_index

    d = str(tmp_path / "corpus")
    (
        tiny_transcripts.repartitionByRange(3, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.parquet(d)
    )
    pres = docs_from_sorted_dir(spark, d, ["conv_id", "turn_idx"])
    assert pres is not None
    out = str(tmp_path / "index")
    ix = build_index_presorted(pres, use_arrow_udf=True, scratch_dir=out)
    write_index(ix, out, input_desc=d, bucket_width=512)
    assert not os.path.isdir(os.path.join(out, "docs"))  # never copied

    disk = DiskIndex(spark, out)
    ref = build_index(tiny_transcripts, use_arrow_udf=False, weighted=True)
    src = {
        (r["conv_id"], r["turn_idx"]): (r["doc_id"], r["text"])
        for r in ref.docs.select("doc_id", "conv_id", "turn_idx", "text").collect()
    }
    got = {
        (r["conv_id"], r["turn_idx"]): (r["doc_id"], r["text"])
        for r in disk.docs.select("doc_id", "conv_id", "turn_idx", "text").collect()
    }
    assert got == src

    q = "w00001s w00002ies"
    a = [(r.doc_id, r.score) for r in bm25_topk(disk.as_inverted_index(), q).collect()]
    b = [(r.doc_id, r.score) for r in
         wand_topk(disk.segments, disk.terms, q, stats=disk.stats).collect()]
    c = [(r.doc_id, r.score) for r in bm25_topk(ref, q).collect()]
    assert a == b == c


def test_presorted_reindex_materializes_docs(spark, tiny_transcripts, tmp_path):
    """reindex_turn on a presorted (by-reference docs) index must
    materialize the docs table locally (copy-on-first-write), clear
    docs_source, and serve the updated text from both engines."""
    import os

    from search_engine_spark.operators.docids import docs_from_sorted_dir
    from search_engine_spark.operators.index_build import build_index_presorted
    from search_engine_spark.operators.query import bm25_topk
    from search_engine_spark.sources.index_store import (
        DiskIndex,
        reindex_turn,
        write_index,
    )

    d = str(tmp_path / "corpus")
    (
        tiny_transcripts.repartitionByRange(2, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.parquet(d)
    )
    pres = docs_from_sorted_dir(spark, d, ["conv_id", "turn_idx"])
    out = str(tmp_path / "index")
    write_index(
        build_index_presorted(pres, use_arrow_udf=True, scratch_dir=out),
        out, input_desc=d, bucket_width=512,
    )
    disk = DiskIndex(spark, out)
    assert disk.docs_source and not os.path.isdir(os.path.join(out, "docs"))

    row = disk.docs.limit(1).collect()[0]
    reindex_turn(spark, out, row["conv_id"], row["turn_idx"],
                 "zzreindexneedle only text", bucket_width=512)
    disk2 = DiskIndex(spark, out)
    assert disk2.docs_source is None
    assert os.path.isdir(os.path.join(out, "docs"))
    hits = bm25_topk(disk2.as_inverted_index(), "zzreindexneedle").collect()
    assert [r.doc_id for r in hits] == [row["doc_id"]]
    # the source dir was never touched
    src = spark.read.parquet(d).filter(
        (F.col("conv_id") == row["conv_id"])
        & (F.col("turn_idx") == row["turn_idx"])
    ).collect()
    assert src[0]["text"] == row["text"]
