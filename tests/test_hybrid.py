"""Reciprocal-rank fusion (operators/hybrid.py)."""

from __future__ import annotations

import pytest


def test_rrf_fuse_hand_computed(spark):
    """Known ranks: doc in both lists beats either single-list doc; a
    missing list contributes 0 and rank sentinel 0."""
    from search_engine_spark.operators.hybrid import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 0.9), (20, 0.5)], "doc_id long, score double"
    )
    vec = spark.createDataFrame(
        [(20, 0.99), (30, 0.8)], "vec_id long, cosine double"
    )
    rows = rrf_fuse(lex, vec, k0=60, k=10).collect()
    got = {r["doc_id"]: r for r in rows}
    assert [r["doc_id"] for r in rows] == [20, 10, 30]
    assert got[20]["rrf"] == pytest.approx(round(1 / 62 + 1 / 61, 6), abs=1e-9)
    assert (got[20]["lex_rank"], got[20]["vec_rank"]) == (2, 1)
    assert got[10]["rrf"] == pytest.approx(round(1 / 61, 6), abs=1e-9)
    assert (got[10]["lex_rank"], got[10]["vec_rank"]) == (1, 0)
    assert (got[30]["lex_rank"], got[30]["vec_rank"]) == (0, 2)


def test_rrf_fuse_rank_ties_break_on_id(spark):
    """Equal scores rank by id ASC inside each list; equal fused scores
    order by doc_id ASC in the output."""
    from search_engine_spark.operators.hybrid import rrf_fuse

    lex = spark.createDataFrame(
        [(5, 0.7), (3, 0.7)], "doc_id long, score double"
    )
    vec = spark.createDataFrame([], "vec_id long, cosine double")
    rows = rrf_fuse(lex, vec, k0=60, k=10).collect()
    assert [(r["doc_id"], r["lex_rank"]) for r in rows] == [(3, 1), (5, 2)]


def test_linear_fuse_hand_computed(spark):
    """Min-max normalization + weighted blend against hand arithmetic;
    missing-list side contributes 0."""
    from search_engine_spark.operators.hybrid import linear_fuse

    lex = spark.createDataFrame(
        [(10, 2.0), (20, 1.0), (30, 0.0)], "doc_id long, score double"
    )
    vec = spark.createDataFrame(
        [(20, 0.9), (40, 0.1)], "vec_id long, cosine double"
    )
    rows = linear_fuse(lex, vec, alpha=0.5, k=10).collect()
    got = {r["doc_id"]: r for r in rows}
    # norms: lex 10->1.0, 20->0.5, 30->0.0 ; vec 20->1.0, 40->0.0
    assert got[20]["fused"] == pytest.approx(0.75, abs=1e-9)   # .5*.5+.5*1
    assert got[10]["fused"] == pytest.approx(0.5, abs=1e-9)
    assert got[30]["fused"] == pytest.approx(0.0, abs=1e-9)
    assert got[40]["fused"] == pytest.approx(0.0, abs=1e-9)
    assert [r["doc_id"] for r in rows] == [20, 10, 30, 40]  # id asc on tie
    assert got[40]["lex_norm"] == 0.0 and got[40]["vec_norm"] == 0.0


def test_linear_fuse_alpha_extremes_and_degenerate_pool(spark):
    """alpha=1 reproduces the lexical pool's order; a single-score pool
    normalizes to 1.0 (it is that pool's best hit)."""
    from search_engine_spark.operators.hybrid import linear_fuse

    lex = spark.createDataFrame(
        [(1, 3.0), (2, 2.0), (3, 1.0)], "doc_id long, score double"
    )
    vec = spark.createDataFrame([(9, 0.42)], "vec_id long, cosine double")
    rows = linear_fuse(lex, vec, alpha=1.0, k=10).collect()
    assert [r["doc_id"] for r in rows][:3] == [1, 2, 3]
    got = {r["doc_id"]: r for r in rows}
    assert got[9]["vec_norm"] == 1.0      # degenerate single-score pool
    assert got[9]["fused"] == 0.0         # but alpha=1 zeroes its weight
