"""Block-max WAND pruning: blocks whose score upper bound cannot beat
the running kth score are skipped WITHOUT decoding, and pruning never
changes the top-k (operators/wand.py score_bucket_pd)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from search_engine_spark.config import BLOCK_SIZE, BM25_B, BM25_K1
from search_engine_spark.operators.compression import (
    bm25_scores_np,
    encode_block,
)
from search_engine_spark.operators.wand import score_bucket_pd

A, B = 1, 2  # term keys (A = rarest)
AVGDL = 100.0
IDF = {A: 1.0, B: 1.0}


def _blocks(term_key: int, doc_ids: np.ndarray, tfs: np.ndarray,
            dls: np.ndarray) -> list[dict]:
    rows = []
    for bi, s in enumerate(range(0, doc_ids.size, BLOCK_SIZE)):
        d = doc_ids[s : s + BLOCK_SIZE]
        tf, dl = tfs[s : s + BLOCK_SIZE], dls[s : s + BLOCK_SIZE]
        db, tb, lb = encode_block(d, tf, dl)
        rows.append({
            "term_key": term_key, "bucket": 0, "block_id": bi,
            "doc_count": d.size, "first_doc": int(d[0]), "last_doc": int(d[-1]),
            "block_max_tf": int(tf.max()), "block_min_dl": int(dl.min()),
            "doc_ids": db, "tfs": tb, "dls": lb,
        })
    return rows


def _truth(a_docs, a_tfs, a_dls, b_tfs_by_doc, b_dls_by_doc):
    sa = bm25_scores_np(a_tfs, a_dls, IDF[A], AVGDL)
    out = {}
    for d, s in zip(a_docs.tolist(), sa.tolist()):
        sb = bm25_scores_np(
            np.array([b_tfs_by_doc[d]]), np.array([b_dls_by_doc[d]]),
            IDF[B], AVGDL,
        )[0]
        out[int(d)] = s + float(sb)
    return out


def _topk(truth: dict[int, float], k: int) -> list[tuple[int, float]]:
    return sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def _run(pdf, k, counters=None):
    out = score_bucket_pd(pdf, [A, B], IDF, AVGDL, k, BM25_K1, BM25_B,
                          counters=counters)
    return sorted(
        zip(out["doc_id"].tolist(), out["score_raw"].tolist()),
        key=lambda kv: (-kv[1], kv[0]),
    )


def test_bound_pruning_skips_blocks_and_keeps_topk_exact():
    """Rare term A: first block has huge tf (score ~max), later blocks
    tf=1 with big dl (cannot reach top-k once the heap fills)."""
    a_docs = np.arange(0, 10000, 10, dtype=np.int64)          # 1000 postings
    a_tfs = np.where(a_docs < 10 * BLOCK_SIZE, 50, 1)
    a_dls = np.where(a_docs < 10 * BLOCK_SIZE, 10, 5000)
    b_docs = np.arange(0, 10000, dtype=np.int64)
    b_tfs = np.full(b_docs.size, 3)
    b_dls = np.where(np.isin(b_docs, a_docs), np.where(
        b_docs < 10 * BLOCK_SIZE, 10, 5000), 100)
    pdf = pd.DataFrame(
        _blocks(A, a_docs, a_tfs, a_dls) + _blocks(B, b_docs, b_tfs, b_dls)
    )
    counters: dict = {}
    got = _run(pdf, 5, counters)
    truth = _truth(a_docs, a_tfs, a_dls,
                   dict(zip(b_docs.tolist(), b_tfs.tolist())),
                   dict(zip(b_docs.tolist(), b_dls.tolist())))
    assert got == _topk(truth, 5)
    # 8 rarest-term blocks; the low-tf/high-dl tail cannot beat θ
    assert counters["blocks_skipped_bound"] >= 6
    assert counters["blocks_decoded"] < 8 + len(pdf[pdf.term_key == B])


def test_unskewed_scores_unchanged_by_pruning():
    """With uniform scores nothing can be pruned — results must equal the
    exhaustive top-k (pruning is an optimization, not an approximation)."""
    rng = np.random.RandomState(7)
    a_docs = np.arange(0, 5000, 7, dtype=np.int64)
    a_tfs = rng.randint(1, 20, a_docs.size)
    a_dls = rng.randint(50, 200, a_docs.size)
    b_docs = np.arange(0, 5000, dtype=np.int64)
    b_tfs = rng.randint(1, 20, b_docs.size)
    b_dls = rng.randint(50, 200, b_docs.size)
    pdf = pd.DataFrame(
        _blocks(A, a_docs, a_tfs, a_dls) + _blocks(B, b_docs, b_tfs, b_dls)
    )
    got = _run(pdf, 10)
    truth = _truth(a_docs, a_tfs, a_dls,
                   dict(zip(b_docs.tolist(), b_tfs.tolist())),
                   dict(zip(b_docs.tolist(), b_dls.tolist())))
    want = _topk(truth, 10)
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=1e-12
    )


def test_equal_score_ties_prefer_smaller_doc_id():
    """Exact ties (duplicate docs are real in dedup corpora): the bucket
    top-k must keep the smaller doc_ids among equal scores."""
    a_docs = np.arange(0, 2000, 2, dtype=np.int64)
    ones = np.full(a_docs.size, 1)
    b_docs = np.arange(0, 2000, dtype=np.int64)
    b_ones = np.full(b_docs.size, 1)
    pdf = pd.DataFrame(
        _blocks(A, a_docs, ones, ones * 100)
        + _blocks(B, b_docs, b_ones, b_ones * 100)
    )
    out = score_bucket_pd(pdf, [A, B], IDF, AVGDL, 5)
    assert sorted(out["doc_id"].tolist()) == [0, 2, 4, 6, 8]


def _truth_or(docs_by_term):
    """Union-sum ground truth: {doc: score} over any-term membership."""
    out: dict[int, float] = {}
    for t, (docs, tfs, dls) in docs_by_term.items():
        scores = bm25_scores_np(tfs, dls, IDF[t], AVGDL)
        for d, s in zip(docs.tolist(), scores.tolist()):
            out[int(d)] = out.get(int(d), 0.0) + float(s)
    return out


def test_or_scorer_matches_union_sum_and_skips_blocks():
    """Disjunctive scorer: exact union-sum top-k AND bound-based block
    skips on a skewed fixture (one high-tf region arms θ, far-away
    low-tf blocks of the other term cannot reach it)."""
    from search_engine_spark.operators.wand import score_bucket_or_pd

    rng = np.random.default_rng(7)
    # term A: docs 0..4095, tf=1 (weak); plus a hot tail 100000..100127
    a_docs = np.concatenate([
        np.arange(0, 4096, dtype=np.int64),
        np.arange(100000, 100128, dtype=np.int64),
    ])
    a_tfs = np.concatenate([
        np.ones(4096, dtype=np.int64),
        np.full(128, 50, dtype=np.int64),
    ])
    a_dls = np.full(a_docs.size, 100, dtype=np.int64)
    # term B: only the hot tail, high tf
    b_docs = np.arange(100000, 100128, dtype=np.int64)
    b_tfs = np.full(128, 40, dtype=np.int64)
    b_dls = np.full(128, 100, dtype=np.int64)

    pdf = pd.DataFrame(
        _blocks(A, a_docs, a_tfs, a_dls) + _blocks(B, b_docs, b_tfs, b_dls)
    )
    counters: dict[str, int] = {}
    out = score_bucket_or_pd(pdf, [A, B], IDF, AVGDL, 10, BM25_K1, BM25_B,
                             counters=counters)
    got = sorted(
        zip(out["doc_id"].tolist(), out["score_raw"].tolist()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    truth = _truth_or({
        A: (a_docs, a_tfs, a_dls),
        B: (b_docs, b_tfs, b_dls),
    })
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9, gd
    # the weak low-tf region of A must be bound-skipped, not decoded
    assert counters["blocks_skipped_bound"] > 0, counters
    assert counters["blocks_decoded"] < len(pdf), counters


def test_or_scorer_single_term_bucket():
    """A bucket missing one query term still scores the present term
    (no AND arity gate)."""
    from search_engine_spark.operators.wand import score_bucket_or_pd

    docs = np.arange(0, 64, dtype=np.int64)
    tfs = np.ones(64, dtype=np.int64)
    dls = np.full(64, 100, dtype=np.int64)
    pdf = pd.DataFrame(_blocks(A, docs, tfs, dls))
    out = score_bucket_or_pd(pdf, [A, B], IDF, AVGDL, 5, BM25_K1, BM25_B)
    assert len(out) == 5
    truth = _truth_or({A: (docs, tfs, dls)})
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert sorted(
        zip(out["doc_id"].tolist(), out["score_raw"].tolist()),
        key=lambda kv: (-kv[1], kv[0]),
    ) == [(d, s) for d, s in want]
