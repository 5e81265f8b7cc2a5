"""Varbyte/delta codec + block encoding invariants (SURVEY §5 item 1)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.config import BLOCK_SIZE
from search_engine_spark.operators.compression import (
    _encode_group,
    decode_block,
    delta_decode,
    delta_encode,
    encode_block,
    varbyte_decode,
    varbyte_encode,
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
