"""Portable HyperLogLog (operators/sketches.py): register table matches
a hashlib twin; the estimate tracks exact distinct counts."""

from __future__ import annotations

import hashlib
import math

import pytest

from search_engine_spark.operators.sketches import (
    HASH_BITS,
    hll_estimate,
    hll_registers,
)


def _twin_registers(values, p, seed="hll0"):
    """Pure-python register table with the identical hash/split/rank."""
    m = 1 << p
    w_bits = HASH_BITS - p
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:15], 16)
        bucket, w = h % m, h // m
        rank = (w_bits + 1) if w == 0 else (w_bits - w.bit_length() + 1)
        regs[bucket] = max(regs.get(bucket, 0), rank)
    return regs


def test_hll_registers_match_hashlib_twin(spark):
    vals = [f"doc text {i}" for i in range(800)] * 2  # dups are harmless
    df = spark.createDataFrame([(v,) for v in vals], "text string")
    got = {r["bucket"]: r["max_rank"]
           for r in hll_registers(df, "text", p=8).collect()}
    assert got == _twin_registers([f"doc text {i}" for i in range(800)], 8)


@pytest.mark.parametrize("n,p,tol", [(500, 10, 0.12), (5000, 12, 0.08)])
def test_hll_estimate_accuracy(spark, n, p, tol):
    df = spark.createDataFrame([(f"v{i}",) for i in range(n)], "text string")
    regs = [(r["bucket"], r["max_rank"])
            for r in hll_registers(df, "text", p=p).collect()]
    est = hll_estimate(regs, p=p)
    assert abs(est - n) / n < tol, est
    # rse sanity: tolerance is ~3-4 sigma of 1.04/sqrt(m)
    assert tol > 2 * 1.04 / math.sqrt(1 << p)


def test_hll_registers_mergeable(spark):
    """Registers from two halves merge by MAX into the full corpus's
    registers — the sketch-merge property a 100 TB union relies on."""
    a = spark.createDataFrame([(f"v{i}",) for i in range(300)], "text string")
    b = spark.createDataFrame([(f"v{i}",) for i in range(200, 600)], "text string")
    full = spark.createDataFrame([(f"v{i}",) for i in range(600)], "text string")
    ra = {r["bucket"]: r["max_rank"] for r in hll_registers(a, "text", p=8).collect()}
    rb = {r["bucket"]: r["max_rank"] for r in hll_registers(b, "text", p=8).collect()}
    rf = {r["bucket"]: r["max_rank"] for r in hll_registers(full, "text", p=8).collect()}
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    assert merged == rf


def _twin_cms(values, width, depth, seed="cms0"):
    import collections

    t = collections.Counter()
    for v in values:
        for d in range(depth):
            h = int(hashlib.md5(f"{v}:{seed}:{d}".encode()).hexdigest()[:15], 16)
            t[(d, h % width)] += 1
    return dict(t)


def test_cms_counters_match_twin_and_bound(spark):
    from search_engine_spark.operators.sketches import (
        cms_counters,
        cms_estimate,
    )

    vals = ["hot"] * 500 + [f"tail{i}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], "w string")
    got = {(r["row"], r["bucket"]): r["cnt"]
           for r in cms_counters(df, "w", width=64, depth=3).collect()}
    assert got == _twin_cms(vals, 64, 3)
    counters = [(r, b, c) for (r, b), c in got.items()]
    # never underestimates; the hot value's estimate is near-exact
    est_hot = cms_estimate(counters, "hot", width=64, depth=3)
    assert 500 <= est_hot <= 500 + len(vals) // 8
    for i in range(0, 300, 50):
        assert cms_estimate(counters, f"tail{i}", width=64, depth=3) >= 1
    # an absent value may collide but never goes negative
    assert cms_estimate(counters, "absent", width=64, depth=3) >= 0


def test_cms_merge_by_sum(spark):
    from search_engine_spark.operators.sketches import cms_counters

    a = spark.createDataFrame([(f"v{i % 40}",) for i in range(200)], "w string")
    b = spark.createDataFrame([(f"v{i % 70}",) for i in range(300)], "w string")
    full = a.unionByName(b)
    def tab(df):
        return {(r["row"], r["bucket"]): r["cnt"]
                for r in cms_counters(df, "w", width=32, depth=2).collect()}
    ta, tb, tf = tab(a), tab(b), tab(full)
    merged = {k: ta.get(k, 0) + tb.get(k, 0) for k in set(ta) | set(tb)}
    assert merged == tf
