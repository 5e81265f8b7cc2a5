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
