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
        pdf["term_id"].to_numpy(np.int64),
        pdf["bucket"].to_numpy(np.int64),
        pdf["doc_id"].to_numpy(np.int64),
        pdf["score"].to_numpy(np.float64),
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


def test_block_roundtrip_and_compression_wins():
    ids = np.sort(np.random.RandomState(7).choice(10**6, size=5000, replace=False)).astype(np.uint64)
    scores = np.random.RandomState(8).rand(5000)
    db, sb = encode_block(ids, scores)
    d, s = decode_block(db, sb)
    assert (d == ids.astype(np.int64)).all()
    assert np.allclose(s, scores)
    # dense-ish sorted ids: delta+varbyte must beat raw int64
    assert len(db) < ids.nbytes / 2


def test_encode_group_block_invariants():
    n = 1000
    pdf = pd.DataFrame(
        {
            "term_id": 7,
            "bucket": 3,
            "doc_id": np.random.RandomState(1).permutation(np.arange(n) * 3),
            "score": np.random.RandomState(2).rand(n) + 0.01,
        }
    )
    out = _encode_group(pdf)
    assert out["doc_count"].sum() == n
    assert (out["doc_count"] <= BLOCK_SIZE).all()
    assert list(out["block_id"]) == list(range(len(out)))
    prev_last = -1
    for r in out.itertuples(index=False):
        docs, scores = decode_block(r.doc_ids, r.scores)
        assert (np.diff(docs) > 0).all()            # strictly sorted
        assert docs[0] == r.first_doc and docs[-1] == r.last_doc
        assert docs[0] > prev_last                   # blocks ordered, disjoint
        prev_last = docs[-1]
        assert np.isclose(r.block_max_score, scores.max())
        assert (scores <= r.block_max_score + 1e-12).all()
    # content round-trips exactly
    all_docs = np.concatenate([decode_block(r.doc_ids, r.scores)[0] for r in out.itertuples(index=False)])
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
            "term_id": g // 3, "bucket": g % 3,
            "doc_id": docs, "score": rng.rand(n) + 0.01,
        }))
    pdf = pd.concat(frames, ignore_index=True)
    return pdf.sort_values(["term_id", "bucket", "doc_id"]).reset_index(drop=True)


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
            for _, g in pdf.groupby(["term_id", "bucket"], sort=True)
        ],
        ignore_index=True,
    )

    for batch_size in (pdf.shape[0], 64, 1):  # one batch / splits / per-row
        batches = [
            pdf.iloc[i : i + batch_size]
            for i in range(0, len(pdf), batch_size)
        ]
        got = pd.concat(list(_encode_partition(iter(batches))), ignore_index=True)
        got = got.sort_values(["term_id", "bucket", "block_id"]).reset_index(drop=True)
        exp = expected.sort_values(["term_id", "bucket", "block_id"]).reset_index(drop=True)
        assert len(got) == len(exp), batch_size
        for c in ["term_id", "bucket", "block_id", "doc_count", "first_doc", "last_doc"]:
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), (batch_size, c)
        assert np.allclose(got["block_max_score"], exp["block_max_score"])
        assert list(got["doc_ids"]) == list(exp["doc_ids"]), batch_size
        assert list(got["scores"]) == list(exp["scores"]), batch_size
