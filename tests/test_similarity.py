"""Embedding similarity: brute-force cosine vs numpy; SRP-LSH ANN recall
(operators/similarity.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.similarity import (
    brute_force_topk,
    build_srp_index,
    cosine_near_duplicates,
    srp_query_topk,
)

DIM = 16
N = 300


def _vecs():
    rs = np.random.RandomState(5)
    v = rs.randn(N, DIM)
    v[1] = v[0] + 0.01 * rs.randn(DIM)  # planted near-dup pair (0,1)
    return v


@pytest.fixture(scope="module")
def emb(spark):
    v = _vecs()
    rows = [(i, [float(x) for x in v[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_brute_force_matches_numpy(emb):
    v = _vecs()
    q = v[7]
    cos = (v @ q) / (np.linalg.norm(v, axis=1) * np.linalg.norm(q))
    order = sorted(range(N), key=lambda i: (-round(cos[i], 6), i))[:10]
    got = brute_force_topk(emb, [float(x) for x in q], k=10).collect()
    assert [r["vec_id"] for r in got] == order
    for r in got:
        assert abs(r["cosine"] - round(cos[r["vec_id"]], 6)) < 1e-6


def test_cosine_near_duplicates(emb):
    got = {(r["vec_a"], r["vec_b"]) for r in cosine_near_duplicates(emb, 0.99).collect()}
    assert (0, 1) in got
    assert len(got) < 10  # random vectors in 16-dim shouldn't collide


def test_srp_ann_recall(emb):
    v = _vecs()
    idx = build_srp_index(emb, dim=DIM, n_planes=8, n_tables=4).cache()
    # self-query: the vector itself must be returned first
    hits = 0
    for qi in range(0, 50, 5):
        got = srp_query_topk(idx, [float(x) for x in v[qi]], k=1,
                             n_planes=8, n_tables=4).collect()
        if got and got[0]["vec_id"] == qi:
            hits += 1
    assert hits >= 9  # self always lands in its own bucket: expect 10/10
