"""Block-max WAND pruning: blocks whose score upper bound cannot beat
the running kth score are skipped WITHOUT decoding, and pruning never
changes the top-k (operators/wand.py score_bucket_pd)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from search_engine_spark.operators.compression import BLOCK_SIZE, encode_block
from search_engine_spark.operators.wand import score_bucket_pd

A, B = 1, 2  # term ids (A = rarest)


def _blocks(term_id: int, doc_ids: np.ndarray, scores: np.ndarray) -> list[dict]:
    rows = []
    for bi, s in enumerate(range(0, doc_ids.size, BLOCK_SIZE)):
        d, sc = doc_ids[s : s + BLOCK_SIZE], scores[s : s + BLOCK_SIZE]
        db, sb = encode_block(d, sc)
        rows.append({
            "term_id": term_id, "bucket": 0, "block_id": bi,
            "doc_count": d.size, "first_doc": int(d[0]), "last_doc": int(d[-1]),
            "block_max_score": float(sc.max()), "doc_ids": db, "scores": sb,
        })
    return rows


def _skewed_fixture():
    """Rare term A: first block scores 10.0, later blocks 0.001 (cannot
    reach top-k once the heap fills). Hot term B: every doc, score 1.0."""
    a_docs = np.arange(0, 10000, 10, dtype=np.int64)          # 1000 postings
    a_scores = np.where(a_docs < 10 * BLOCK_SIZE, 10.0, 0.001)
    b_docs = np.arange(0, 10000, dtype=np.int64)
    b_scores = np.full(b_docs.size, 1.0)
    pdf = pd.DataFrame(_blocks(A, a_docs, a_scores) + _blocks(B, b_docs, b_scores))
    truth = {int(d): float(sa + 1.0) for d, sa in zip(a_docs, a_scores)}
    return pdf, truth


def _topk(truth: dict[int, float], k: int) -> list[tuple[int, float]]:
    return sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_bound_pruning_skips_blocks_and_keeps_topk_exact():
    pdf, truth = _skewed_fixture()
    counters: dict = {}
    out = score_bucket_pd(pdf, term_order=[A, B], k=5, counters=counters)
    got = sorted(
        zip(out["doc_id"].tolist(), out["score_raw"].tolist()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert got == _topk(truth, 5)
    # 8 rarest-term blocks; all but the first carry bound 0.001+1.0 < θ
    assert counters["blocks_skipped_bound"] >= 6
    # skipped blocks were never decoded: only block 0 of A (+ B overlaps)
    assert counters["blocks_decoded"] < 8 + len(pdf[pdf.term_id == B])


def test_unskewed_scores_unchanged_by_pruning():
    """With uniform scores nothing can be pruned — results must equal the
    exhaustive top-k (pruning is an optimization, not an approximation)."""
    a_docs = np.arange(0, 5000, 7, dtype=np.int64)
    rng = np.random.RandomState(7)
    a_scores = rng.uniform(0.5, 2.0, a_docs.size)
    b_docs = np.arange(0, 5000, dtype=np.int64)
    b_scores = rng.uniform(0.5, 2.0, b_docs.size)
    pdf = pd.DataFrame(_blocks(A, a_docs, a_scores) + _blocks(B, b_docs, b_scores))
    truth = {
        int(d): float(sa + b_scores[d])
        for d, sa in zip(a_docs, a_scores)
    }
    out = score_bucket_pd(pdf, term_order=[A, B], k=10)
    got = sorted(
        zip(out["doc_id"].tolist(), out["score_raw"].tolist()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    want = [(d, s) for d, s in _topk(truth, 10)]
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=1e-12
    )


def test_equal_score_ties_prefer_smaller_doc_id():
    """Exact ties (duplicate docs are real in dedup corpora): the bucket
    top-k must keep the smaller doc_ids among equal scores."""
    a_docs = np.arange(0, 2000, 2, dtype=np.int64)
    a_scores = np.full(a_docs.size, 1.0)
    b_docs = np.arange(0, 2000, dtype=np.int64)
    b_scores = np.full(b_docs.size, 1.0)
    pdf = pd.DataFrame(_blocks(A, a_docs, a_scores) + _blocks(B, b_docs, b_scores))
    out = score_bucket_pd(pdf, term_order=[A, B], k=5)
    got = sorted(out["doc_id"].tolist())
    assert got == [0, 2, 4, 6, 8]
