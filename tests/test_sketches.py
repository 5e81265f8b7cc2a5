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


def _twin_bloom_bits(values, m_bits, k, seed="bloom0"):
    bits = set()
    for v in values:
        for i in range(k):
            h = int(hashlib.md5(f"{v}:{seed}:{i}".encode()).hexdigest()[:15], 16)
            bits.add(h % m_bits)
    return bits


def test_bloom_bits_match_twin_no_false_negatives(spark):
    from search_engine_spark.operators.sketches import bloom_bits, bloom_contains

    vals = [f"item{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "text string")
    got = {r["bit"] for r in bloom_bits(df, "text", m_bits=2048, k=4).collect()}
    assert got == _twin_bloom_bits(vals, 2048, 4)
    # zero false negatives: every inserted value probes present
    assert all(bloom_contains(got, v, m_bits=2048, k=4) for v in vals)
    # fp-rate sanity: (1-e^{-kn/m})^k ~ 0.012 at n=200,m=2048,k=4 —
    # 2000 absent probes should see only a small fraction pass
    fps = sum(
        bloom_contains(got, f"absent{i}", m_bits=2048, k=4) for i in range(2000)
    )
    assert fps < 2000 * 0.05, fps


def test_bloom_merge_by_union(spark):
    from search_engine_spark.operators.sketches import bloom_bits

    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "text string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "text string")
    both = a.union(b)
    merged = {
        r["bit"]
        for r in bloom_bits(a, "text", 1024, 3)
        .union(bloom_bits(b, "text", 1024, 3))
        .distinct()
        .collect()
    }
    whole = {r["bit"] for r in bloom_bits(both, "text", 1024, 3).collect()}
    assert merged == whole


def test_bloom_maybe_contains_col_matches_driver_probe(spark):
    """The literal-spliced codegen predicate agrees with the driver-side
    probe on present and absent values, and the plan stays Python-free."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.sketches import (
        bloom_bits,
        bloom_contains,
        bloom_maybe_contains_col,
    )
    from search_engine_spark.plans.explain import physical_plan

    vals = [f"v{i}" for i in range(80)]
    df = spark.createDataFrame([(v,) for v in vals], "text string")
    bits = {r["bit"] for r in bloom_bits(df, "text", 1024, 3).collect()}

    probe_vals = vals[:10] + [f"nope{i}" for i in range(40)]
    probe = spark.createDataFrame([(v,) for v in probe_vals], "text string")
    out = probe.select(
        "text", bloom_maybe_contains_col("text", bits, 1024, 3).alias("maybe")
    )
    got = {r["text"]: r["maybe"] for r in out.collect()}
    want = {v: bloom_contains(bits, v, 1024, 3) for v in probe_vals}
    assert got == want
    assert all(got[v] for v in vals[:10])  # no false negatives
    assert "EvalPython" not in physical_plan(out)
