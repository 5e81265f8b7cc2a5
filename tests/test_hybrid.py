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
