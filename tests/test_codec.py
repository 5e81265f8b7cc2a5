"""Varbyte/delta codec + block encoding invariants (SURVEY §5 item 1)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.config import BLOCK_SIZE
from search_engine_spark.operators.compression import (
    _encode_partition,
    _encode_sorted_run,
    decode_block,
    delta_decode,
    delta_encode,
    encode_block,
    varbyte_decode,
    varbyte_encode,
    varbyte_encode_with_lengths,
)


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Single-group encode via the vectorized run encoder (test shim)."""
    pdf = pdf.sort_values("doc_id")
    return _encode_sorted_run(
        pdf["term_key"].to_numpy(np.int64),
        pdf["bucket"].to_numpy(np.int64),
        pdf["doc_id"].to_numpy(np.int64),
        pdf["tf"].to_numpy(np.int64),
        pdf["dl"].to_numpy(np.int64),
    )


def test_varbyte_roundtrip_simple():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63 - 1], dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(vals)) == vals).all()


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(arr)) == arr).all()


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=300))
def test_delta_varbyte_sorted_ids(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    enc = varbyte_encode(delta_encode(arr))
    assert (delta_decode(varbyte_decode(enc)) == arr).all()


def test_payload_roundtrip_simple():
    from search_engine_spark.operators.compression import (
        decode_payload,
        encode_payload,
    )

    for vals in (
        [],
        [0],
        [2**63 - 1],
        [1] * 128,
        [0] * 128,
        list(range(128)),
        [2**33] + [3] * 127,       # absolute-first outlier → exception
        [5, 2**40, 7, 2**50, 1],   # multiple exceptions
    ):
        arr = np.array(vals, dtype=np.uint64)
        got = decode_payload(encode_payload(arr))
        assert got.size == arr.size and (got == arr).all(), vals


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=256))
def test_payload_roundtrip_property(vals):
    from search_engine_spark.operators.compression import (
        decode_payload,
        encode_payload,
    )

    arr = np.array(vals, dtype=np.uint64)
    got = decode_payload(encode_payload(arr))
    assert got.size == arr.size and (got == arr).all()


def test_payload_batched_equals_single_block():
    """encode_payload_blocks must emit, per block, exactly the bytes the
    single-block encoder produces (codec choice included) — the run
    encoder slices/groups batched buffers and must not drift."""
    from search_engine_spark.operators.compression import (
        decode_payload,
        encode_payload,
        encode_payload_blocks,
    )

    rng = np.random.RandomState(3)
    v = np.concatenate([
        np.concatenate(([2**33 + 17], rng.randint(1, 30, size=127))),  # pfor+exc
        rng.randint(1, 2**20, size=128),                               # pfor wide
        rng.randint(1, 6, size=50),                                    # ragged tail
        rng.randint(2**45, 2**55, size=16),                            # varbyte wins? priced
    ]).astype(np.uint64)
    starts = np.array([0, 128, 256, 306], dtype=np.int64)
    ends = np.array([128, 256, 306, 322], dtype=np.int64)
    bufs = encode_payload_blocks(v, starts, ends)
    for j, (s, e) in enumerate(zip(starts, ends)):
        assert bufs[j] == encode_payload(v[s:e]), j
        assert (decode_payload(bufs[j]) == v[s:e]).all(), j


def test_pfor_chosen_and_smaller_on_typical_tf():
    """tf-like payloads (tiny values) must pick PFor and beat varbyte's
    1-byte-per-value floor by ≥2×; the codec="varbyte" pin must still
    produce tagged varbyte."""
    from search_engine_spark.operators.compression import (
        TAG_PFOR,
        TAG_VARBYTE,
        decode_payload,
        encode_payload,
        varbyte_encode,
    )

    tfs = np.random.RandomState(5).randint(1, 6, size=128).astype(np.uint64)
    auto = encode_payload(tfs)
    assert auto[0] == TAG_PFOR
    assert len(auto) * 2 <= len(varbyte_encode(tfs)) + 1
    pinned = encode_payload(tfs, codec="varbyte")
    assert pinned[0] == TAG_VARBYTE
    assert (decode_payload(pinned) == tfs).all()
    assert (decode_payload(auto) == tfs).all()


def test_decode_payload_rejects_unknown_tag():
    import pytest

    from search_engine_spark.operators.compression import decode_payload

    with pytest.raises(ValueError, match="codec tag"):
        decode_payload(b"\x7fzzz")


def test_block_roundtrip_and_compression_wins():
    rng = np.random.RandomState(7)
    ids = np.sort(rng.choice(10**6, size=5000, replace=False)).astype(np.uint64)
    tfs = rng.randint(1, 50, size=5000)
    dls = rng.randint(5, 400, size=5000)
    db, tb, lb = encode_block(ids, tfs, dls)
    d, t, l = decode_block(db, tb, lb)
    assert (d == ids.astype(np.int64)).all()
    assert (t == tfs).all() and (l == dls).all()
    # dense-ish sorted ids: delta+varbyte must beat raw int64
    assert len(db) < ids.nbytes / 2
    # tf/dl varbytes must beat the old 8-byte float64 weights
    assert len(tb) + len(lb) < 8 * ids.size / 2


def test_encode_group_block_invariants():
    n = 1000
    rng = np.random.RandomState(2)
    pdf = pd.DataFrame(
        {
            "term_key": 7,
            "bucket": 3,
            "doc_id": np.random.RandomState(1).permutation(np.arange(n) * 3),
            "tf": rng.randint(1, 30, size=n),
            "dl": rng.randint(4, 500, size=n),
        }
    )
    out = _encode_group(pdf)
    assert out["doc_count"].sum() == n
    assert (out["doc_count"] <= BLOCK_SIZE).all()
    assert list(out["block_id"]) == list(range(len(out)))
    prev_last = -1
    for r in out.itertuples(index=False):
        docs, tfs, dls = decode_block(r.doc_ids, r.tfs, r.dls)
        assert (np.diff(docs) > 0).all()            # strictly sorted
        assert docs[0] == r.first_doc and docs[-1] == r.last_doc
        assert docs[0] > prev_last                   # blocks ordered, disjoint
        prev_last = docs[-1]
        assert r.block_max_tf == tfs.max()
        assert r.block_min_dl == dls.min()
    # content round-trips exactly
    all_docs = np.concatenate(
        [decode_block(r.doc_ids, r.tfs, r.dls)[0] for r in out.itertuples(index=False)]
    )
    assert (all_docs == np.sort(pdf["doc_id"].to_numpy())).all()


def test_varbyte_lengths_slicing():
    """Per-value byte lengths let a single encode pass be sliced into
    independently-decodable chunks at arbitrary value boundaries."""
    vals = np.array([5, 300, 0, 2**40, 127, 128], dtype=np.uint64)
    buf, nbytes = varbyte_encode_with_lengths(vals)
    off = np.concatenate(([0], np.cumsum(nbytes)))
    raw = buf.tobytes()
    for i, v in enumerate(vals):
        assert varbyte_decode(raw[off[i]:off[i + 1]])[0] == v


def _multi_group_frame(rng, n_groups=17, max_rows=900):
    frames = []
    for g in range(n_groups):
        n = int(rng.randint(1, max_rows))
        docs = np.sort(rng.choice(10**6, size=n, replace=False))
        frames.append(pd.DataFrame({
            "term_key": g // 3, "bucket": g % 3,
            "doc_id": docs,
            "tf": rng.randint(1, 40, size=n),
            "dl": rng.randint(4, 300, size=n),
        }))
    pdf = pd.concat(frames, ignore_index=True)
    return pdf.sort_values(["term_key", "bucket", "doc_id"]).reset_index(drop=True)


def test_encode_partition_matches_per_group_and_carryover():
    """The partition-level encoder (many groups, arbitrary Arrow batch
    splits) must produce exactly the same blocks as encoding each
    (term,bucket) group alone — including when batch boundaries split a
    group mid-way (carry-over path)."""
    rng = np.random.RandomState(42)
    pdf = _multi_group_frame(rng)

    expected = pd.concat(
        [
            _encode_group(g)
            for _, g in pdf.groupby(["term_key", "bucket"], sort=True)
        ],
        ignore_index=True,
    )

    for batch_size in (pdf.shape[0], 64, 1):  # one batch / splits / per-row
        batches = [
            pdf.iloc[i : i + batch_size]
            for i in range(0, len(pdf), batch_size)
        ]
        got = pd.concat(list(_encode_partition(iter(batches))), ignore_index=True)
        got = got.sort_values(["term_key", "bucket", "block_id"]).reset_index(drop=True)
        exp = expected.sort_values(["term_key", "bucket", "block_id"]).reset_index(drop=True)
        assert len(got) == len(exp), batch_size
        for c in ["term_key", "bucket", "block_id", "doc_count", "first_doc",
                  "last_doc", "block_max_tf", "block_min_dl"]:
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), (batch_size, c)
        for c in ("doc_ids", "tfs", "dls"):
            assert list(got[c]) == list(exp[c]), (batch_size, c)


def test_colocated_segments_match_shuffled(tiny_index):
    """Zero-shuffle colocated encode must decode to the exact same
    (term_key, doc_id, tf, dl) postings as the shuffled exchange+sort
    path (block layout may differ; content may not)."""
    from search_engine_spark.operators.compression import (
        build_segments_colocated,
        build_segments_shuffled,
        decode_segments_pd,
    )

    a = decode_segments_pd(
        build_segments_colocated(tiny_index, bucket_width=512).toPandas()
    )
    b = decode_segments_pd(
        build_segments_shuffled(tiny_index, bucket_width=512).toPandas()
    )
    key = ["term_key", "doc_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b)


def test_colocated_blocks_respect_bucket_and_order(tiny_index):
    from search_engine_spark.operators.compression import (
        build_segments_colocated,
        decode_block,
    )

    rows = build_segments_colocated(tiny_index, bucket_width=512).collect()
    assert rows
    for r in rows:
        docs, tfs, dls = decode_block(r["doc_ids"], r["tfs"], r["dls"])
        assert (docs[1:] > docs[:-1]).all()  # ascending within block
        assert docs[0] == r["first_doc"] and docs[-1] == r["last_doc"]
        assert all(d // 512 == r["bucket"] for d in (docs[0], docs[-1]))
        assert r["block_max_tf"] == tfs.max()
        assert r["block_min_dl"] == dls.min()


def test_bm25_scores_np_matches_jvm(tiny_index):
    """The query-time numpy scorer must be bit-identical to the JVM
    bm25_weight_col for the same idf doubles (same operation order)."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.compression import bm25_scores_np
    from search_engine_spark.operators.index_build import (
        bm25_weight_col,
        idf_col,
    )

    stats = tiny_index.stats
    sample = (
        tiny_index.postings.join(
            tiny_index.terms.select("lemma", "df"), "lemma"
        )
        .select(
            "tf", "dl",
            idf_col(F.col("df").cast("double"), stats.n_docs).alias("idf"),
            bm25_weight_col(
                F.col("tf").cast("double"), F.col("dl").cast("double"),
                idf_col(F.col("df").cast("double"), stats.n_docs), stats.avgdl,
            ).alias("w"),
        )
        .limit(5000)
        .collect()
    )
    tfs = np.array([r["tf"] for r in sample], dtype=np.int64)
    dls = np.array([r["dl"] for r in sample], dtype=np.int64)
    for i in range(len(sample)):
        got = bm25_scores_np(tfs[i : i + 1], dls[i : i + 1],
                             float(sample[i]["idf"]), stats.avgdl)[0]
        assert got == sample[i]["w"], i  # bit-identical
