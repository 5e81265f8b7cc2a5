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


def test_mmr_rerank_rejects_string_ids(spark):
    """Integral-id contract: a string id table raises a clear TypeError
    instead of crashing in createDataFrame (review r3)."""
    import pytest

    from search_engine_spark.operators.similarity import mmr_rerank

    cand = spark.createDataFrame(
        [("a", 0.9)], "vec_id string, cosine double"
    )
    emb_s = spark.createDataFrame(
        [("a", [1.0, 0.0])], "vec_id string, embedding array<double>"
    )
    with pytest.raises(TypeError, match="integral"):
        mmr_rerank(cand, emb_s, k=1)


def test_mmr_rerank_diversifies_and_degenerates(emb, spark):
    """MMR: (a) lam=1.0 degenerates to pure relevance order; (b) with
    the planted near-dup pair (0,1) at the top of the pool, a
    diversity-weighted lam must NOT pick both — the redundant twin is
    deferred below a less similar candidate; (c) mmr values are
    monotonically achievable: pick #1 is the max rel."""
    from search_engine_spark.operators.similarity import mmr_rerank

    # a ~ b (near-dups), c less relevant but diverse; the query vector
    # itself is NOT in the pool (a pool containing the query point is
    # order-invariant under MMR: sim-to-selected == rel for everyone)
    a = [0.9, 0.43588989435406736, 0.0, 0.0]
    b = [0.9001, 0.4356, 0.001, 0.0]
    c = [0.8, 0.0, 0.6, 0.0]
    tbl = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "vec_id long, embedding array<double>"
    )
    pool = brute_force_topk(tbl, [1.0, 0.0, 0.0, 0.0], k=10)
    rel_order = [r["vec_id"] for r in pool.collect()]
    assert rel_order == [2, 1, 3]  # b edges a on cosine, c last

    pure = mmr_rerank(pool, tbl, k=3, lam=1.0).collect()
    assert [r["vec_id"] for r in pure] == rel_order
    assert [r["rank"] for r in pure] == [1, 2, 3]

    div = mmr_rerank(pool, tbl, k=3, lam=0.5).collect()
    # rank 1 = most relevant (b); rank 2 = DIVERSE c, the near-dup a
    # is deferred to last despite higher relevance
    assert [r["vec_id"] for r in div] == [2, 3, 1]
    assert div[0]["mmr"] > div[1]["mmr"] > div[2]["mmr"]

    # empty candidate page -> empty result, schema intact
    none = mmr_rerank(pool.limit(0), tbl, k=3)
    assert none.count() == 0 and none.columns == ["rank", "vec_id", "mmr"]


def test_cosine_near_duplicates(emb):
    got = {(r["vec_a"], r["vec_b"]) for r in cosine_near_duplicates(emb, 0.99).collect()}
    assert (0, 1) in got
    assert len(got) < 10  # random vectors in 16-dim shouldn't collide


def test_srp_disk_index_matches_memory_and_prunes_partitions(emb, spark, tmp_path):
    """The at-scale SRP path: ids-only index partitioned by
    (table, bucket); a probe is a partition-pruned read (round-1 verdict
    item — no OR-filter full scan), results identical to the in-memory
    variant."""
    from search_engine_spark.operators.similarity import (
        _probe_condition,
        srp_query_topk_disk,
        write_srp_index,
    )
    from search_engine_spark.plans.explain import physical_plan

    v = _vecs()
    out = str(tmp_path / "srp_idx")
    write_srp_index(emb, out, dim=DIM, n_planes=8, n_tables=4)
    q = [float(x) for x in v[3]]

    mem_idx = build_srp_index(emb, dim=DIM, n_planes=8, n_tables=4)
    want = [(r["vec_id"], r["cosine"])
            for r in srp_query_topk(mem_idx, q, k=5, n_planes=8, n_tables=4).collect()]
    got = [(r["vec_id"], r["cosine"])
           for r in srp_query_topk_disk(emb, out, q, k=5, n_planes=8,
                                        n_tables=4).collect()]
    assert got == want

    # index stores (bucket, id) only — vectors never duplicated per table
    stored = spark.read.parquet(out)
    assert set(stored.columns) == {"vec_id", "table", "bucket", "bgroup"}

    # plan-pinned: the probe scan prunes PARTITION dirs on (table,
    # bgroup) and pushes the bucket predicate into the file scan
    cond = _probe_condition(np.asarray(q, dtype=np.float64), 8, 4, 1,
                            group_shift=3)
    plan = physical_plan(spark.read.parquet(out).filter(cond))
    assert "PartitionFilters" in plan, plan
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "table" in pf and "bgroup" in pf, plan
    assert "PushedFilters" in plan and "bucket" in plan.split("PushedFilters:")[1].split("]")[0], plan


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


def test_ivf_ann_self_recall_and_determinism(emb, spark):
    """IVF coarse-quantizer path: every vector's own query retrieves it
    first; index assignment is deterministic across builds; probing all
    clusters equals brute force exactly."""
    from search_engine_spark.operators.similarity import (
        build_ivf_index,
        ivf_query_topk,
    )

    v = _vecs()
    idx1, cent1 = build_ivf_index(emb, dim=DIM, n_clusters=8)
    idx2, cent2 = build_ivf_index(emb, dim=DIM, n_clusters=8)
    np.testing.assert_array_equal(cent1, cent2)
    a1 = {r["vec_id"]: r["cluster"] for r in idx1.collect()}
    a2 = {r["vec_id"]: r["cluster"] for r in idx2.collect()}
    assert a1 == a2 and len(a1) == N

    idx = idx1.cache()
    hits = 0
    for qi in range(0, 40, 5):
        got = ivf_query_topk(emb, idx, cent1, [float(x) for x in v[qi]],
                             k=1, n_probe=1).collect()
        if got and got[0]["vec_id"] == qi:
            hits += 1
    assert hits >= 7  # own cluster always probed first

    # planted near-dup pair (0,1) lands in the same cluster
    assert a1[0] == a1[1]

    # n_probe = n_clusters → identical to exact brute force
    q = [float(x) for x in v[3]]
    full = [(r["vec_id"], r["cosine"])
            for r in ivf_query_topk(emb, idx, cent1, q, k=10, n_probe=8).collect()]
    brute = [(r["vec_id"], r["cosine"])
             for r in brute_force_topk(emb, q, k=10).collect()]
    assert full == brute


def test_srp_neardup_pairs_subset_of_exact(emb):
    """LSH near-dup pairs are a subset of the exact all-pairs result with
    identical cosines, and the planted pair (0,1) — cosine ≈ 1 — collides
    in every table, so it is always recalled."""
    from search_engine_spark.operators.similarity import srp_neardup_pairs

    exact = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in cosine_near_duplicates(emb, 0.99).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in srp_neardup_pairs(
            emb, dim=DIM, threshold=0.99, n_planes=6, n_tables=4
        ).collect()
    }
    assert (0, 1) in lsh
    assert set(lsh) <= set(exact)
    for pair, cos in lsh.items():
        assert cos == exact[pair]


def test_ivf_assign_matches_numpy_argmax(emb):
    """Arrow-vectorized assignment equals numpy argmax over the same
    deterministic hash centroids. Plan pin: the UDF is ArrowEvalPython
    (vectorized batches), never BatchEvalPython (row-at-a-time Python) —
    a pure-SQL dots array was tried and abandoned: n_clusters × dim
    unrolled terms exceed Janino's 64 KB method limit, fall back to
    interpretation, and run ~25× slower (round-2 bench)."""
    from search_engine_spark.operators.similarity import hash_centroids, ivf_assign
    from search_engine_spark.plans.explain import physical_plan

    cent = hash_centroids(DIM, 8)
    np.testing.assert_allclose(np.sqrt((cent * cent).sum(axis=1)), 1.0)
    np.testing.assert_array_equal(cent, hash_centroids(DIM, 8))

    v = _vecs()
    want = np.argmax(v @ cent.T, axis=1)
    assigned = ivf_assign(emb, cent)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert got == {i: int(want[i]) for i in range(N)}

    plan = physical_plan(assigned)
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_zero_norm_vectors_excluded(spark):
    """Cosine is undefined for a zero vector; under Spark 4 ANSI mode an
    unguarded norm division is a hard DIVIDE_BY_ZERO error. All three
    cosine operators must exclude zero-norm rows instead of crashing."""
    from search_engine_spark.operators.similarity import srp_neardup_pairs

    rows = [
        (0, [0.0] * 8),               # zero vector
        (1, [1.0, 2.0] + [0.0] * 6),
        (2, [1.0, 2.0] + [0.0] * 6),  # exact dup of 1
        (3, [-1.0, 4.0] + [0.0] * 6),
    ]
    emb0 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    top = brute_force_topk(emb0, [1.0, 2.0] + [0.0] * 6, k=10).collect()
    assert [r["vec_id"] for r in top] == [1, 2, 3]  # id 0 excluded, no error

    pairs = cosine_near_duplicates(emb0, threshold=0.999, dim=8).collect()
    assert {(r["vec_a"], r["vec_b"]) for r in pairs} == {(1, 2)}

    srp = srp_neardup_pairs(emb0, dim=8, threshold=0.999).collect()
    assert all(0 not in (r["vec_a"], r["vec_b"]) for r in srp)

    with pytest.raises(ValueError):
        brute_force_topk(emb0, [0.0] * 8)


def test_null_and_zero_vectors_excluded_from_indexes(spark):
    """NULL / zero-norm embeddings must be dropped by the index builders
    (the Arrow stack would crash on a NULL array; a zero vector has no
    cosine neighbourhood) — mirroring the oracle twins' norm predicate."""
    from search_engine_spark.operators.similarity import (
        hash_centroids,
        ivf_assign,
        write_srp_index,
    )

    rows = [
        (0, None),
        (1, [0.0] * 8),
        (2, [1.0, -2.0, 0.5] + [0.0] * 5),
        (3, [3.0, 1.0, -1.0] + [0.0] * 5),
    ]
    emb0 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    idx = build_srp_index(emb0, dim=8, n_planes=4, n_tables=2)
    assert set(r["vec_id"] for r in idx.collect()) == {2, 3}

    assigned = ivf_assign(emb0, hash_centroids(8, 4))
    assert set(r["vec_id"] for r in assigned.collect()) == {2, 3}

    import tempfile
    d = tempfile.mkdtemp()
    write_srp_index(emb0, d, dim=8, n_planes=4, n_tables=2)
    disk = spark.read.parquet(d)
    assert set(r["vec_id"] for r in disk.collect()) == {2, 3}


def test_zero_vector_oracle_parity(spark):
    """The DuckDB twins exclude zero-norm vectors exactly like the engine
    (CLAUDE.md invariant: queries() and oracle_sql() value-identical) —
    checked HERE on a table that actually contains a zero vector, which
    the driver's sf0.01 fixtures do not."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod

    rows = [
        (0, [1.0, 2.0] + [0.0] * 62),
        (1, [0.0] * 64),                   # zero vector
        (2, [1.0, 2.0] + [0.0] * 62),      # dup of 0
        (3, [-1.0, 4.0] + [0.0] * 62),
    ]
    emb0 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    con = duckdb.connect()
    pdf = pd.DataFrame(
        {"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]}
    )
    con.register("embeddings", pdf)

    sqls = entrymod.oracle_sql()
    for name in ("embedding_topk", "embedding_neardup_pairs",
                 "srp_neardup_pairs", "srp_ann_topk", "ivf_ann_topk"):
        fn = entrymod.queries()[name]
        # queries() loads from sf_dir; rebuild the same op on emb0 instead
        if name == "embedding_topk":
            got = brute_force_topk(emb0, rows[0][1], k=10)
        elif name == "embedding_neardup_pairs":
            got = cosine_near_duplicates(
                emb0, threshold=entrymod.COSINE_NEARDUP_THRESHOLD, dim=64
            ).select("vec_a", "vec_b", "cosine")
        elif name == "srp_neardup_pairs":
            from search_engine_spark.operators.similarity import srp_neardup_pairs
            got = srp_neardup_pairs(
                emb0, dim=64, threshold=entrymod.COSINE_NEARDUP_THRESHOLD,
                n_planes=6, n_tables=4,
            ).select("vec_a", "vec_b", "cosine")
        elif name == "srp_ann_topk":
            from search_engine_spark.operators.similarity import srp_query_topk
            idx = build_srp_index(emb0, dim=64, n_planes=8, n_tables=4)
            got = srp_query_topk(idx, rows[0][1], k=10, n_planes=8,
                                 n_tables=4).select("vec_id", "cosine")
        else:
            from search_engine_spark.operators.similarity import (
                hash_centroids, ivf_assign, ivf_query_topk)
            cent = hash_centroids(64, entrymod.IVF_CLUSTERS)
            idx = ivf_assign(emb0, cent)
            got = ivf_query_topk(emb0, idx, cent, rows[0][1], k=10,
                                 n_probe=entrymod.IVF_NPROBE
                                 ).select("vec_id", "cosine")
        scols = sorted(got.columns)
        srows = sorted(tuple(round(v, 6) if isinstance(v, float) else v
                             for v in (r[c] for c in scols))
                       for r in got.collect())
        ddf = con.sql(sqls[name]).df()
        drows = sorted(tuple(round(v, 6) if isinstance(v, float) else v
                             for v in rec)
                       for rec in ddf[scols].itertuples(index=False))
        assert srows == drows, f"{name}: spark={srows} duck={drows}"
        id_cols = [c for c in scols if c != "cosine"]
        ids = {r[id_cols.index(c) + 1] for r in srows for c in id_cols}
        assert 1 not in ids, name  # the zero vector is excluded


def test_sq8_topk_matches_python_quantizer(emb):
    """SQ8 ADC top-k == the Python twin (quantize every vector, score by
    the integer ADC weights — exact integer scores), and the plan stays
    JVM-side on one scan."""
    from search_engine_spark.operators.similarity import (
        sq8_adc_weights_py,
        sq8_params,
        sq8_quantize_py,
        sq8_topk,
    )
    from search_engine_spark.plans.explain import physical_plan

    v = _vecs()
    q = [float(x) for x in v[7]]
    mins, invs = sq8_params(emb, dim=DIM)
    # python twin: quantize every vector with the identical formula
    codes = [sq8_quantize_py([float(x) for x in v[i]], mins, invs)
             for i in range(N)]
    ws = sq8_adc_weights_py(q, invs)
    dots = [sum(c * w for c, w in zip(row, ws)) for row in codes]
    order = sorted(range(N), key=lambda i: (-dots[i], i))[:10]

    df = sq8_topk(emb, q, mins, invs, k=10)
    got = df.collect()
    assert [r["vec_id"] for r in got] == order
    assert [r["qdot"] for r in got] == [dots[i] for i in order]

    plan = physical_plan(df)
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan

    # codes are valid uint8 and a constant dim (span 0) maps to code 0
    assert all(0 <= c <= 255 for row in codes for c in row)
    assert sq8_quantize_py([3.0], [3.0], [0.0]) == [0]
    assert sq8_adc_weights_py([3.0], [0.0]) == [0]


def test_sq8_adc_recall_on_clustered_vectors(spark):
    """The reason ADC ranking exists: on cluster-structured embeddings
    the decoded-dot order recovers the exact cosine top-10 almost
    perfectly, where the old symmetric quantized·quantized dot measured
    0.12 (chance). Pin recall@10 >= 0.8."""
    import numpy as np

    from search_engine_spark.operators.similarity import (
        brute_force_topk,
        sq8_params,
        sq8_topk,
    )

    rng = np.random.RandomState(3)
    cents = rng.randn(20, DIM)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = []
    for i in range(400):
        x = cents[i % 20] + 0.15 * rng.randn(DIM)
        vecs.append(x / np.linalg.norm(x))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).cache()
    mins, invs = sq8_params(df, dim=DIM)
    rec = []
    for qi in range(0, 30, 3):
        q = [float(x) for x in vecs[qi]]
        truth = {r["vec_id"] for r in brute_force_topk(df, q, k=10).collect()}
        got = {r["vec_id"] for r in sq8_topk(df, q, mins, invs, k=10).collect()}
        rec.append(len(got & truth) / 10)
    df.unpersist()
    assert sum(rec) / len(rec) >= 0.8, rec


def test_semdedup_pairs_are_same_cluster_subset_of_exact(emb):
    """SemDeDup pairs == the same-cluster subset of exact near-dup pairs
    (same rounded-cosine verify, cluster bound is the only pruning)."""
    from search_engine_spark.operators.similarity import (
        hash_centroids, ivf_assign, semdedup_pairs)

    thr = 0.2
    exact = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in cosine_near_duplicates(emb, thr, dim=DIM).collect()
    }
    assign = {
        r["vec_id"]: r["cluster"]
        for r in ivf_assign(emb, hash_centroids(DIM, 8)).collect()
    }
    got = semdedup_pairs(emb, dim=DIM, eps=thr, n_clusters=8).collect()
    sem = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in got}
    expect = {p: c for p, c in exact.items() if assign[p[0]] == assign[p[1]]}
    assert sem == expect
    for r in got:  # cluster column reports the shared cluster
        assert r["cluster"] == assign[r["vec_a"]] == assign[r["vec_b"]]
    # the planted near-dup (0, 1) is a true semantic dup: the clustering
    # must not split it (the paper's recall claim at small scale)
    assert (0, 1) in sem


def test_semdedup_keepers_argmin_centroid_cos(emb):
    """Each dup component keeps exactly the member with the lowest
    centroid cosine (ties by id); unpaired docs keep themselves."""
    from search_engine_spark.operators.similarity import (
        hash_centroids, semdedup_keepers, semdedup_pairs,
        _assign_with_cent_dot)
    from search_engine_spark.operators.dedup import _union_find_components

    thr, k = 0.2, 8
    pairs = [
        (r["vec_a"], r["vec_b"])
        for r in semdedup_pairs(emb, dim=DIM, eps=thr, n_clusters=k).collect()
    ]
    cent = hash_centroids(DIM, k)
    cc = {
        r["vec_id"]: round(r["cent_dot"] / r["_norm"], 6)
        for r in _assign_with_cent_dot(emb, cent, "vec_id", "embedding")
        .select("vec_id", "cent_dot", "_norm").collect()
    }
    comp = dict(_union_find_components(pairs))
    groups: dict[int, list[int]] = {}
    for doc, c in comp.items():
        groups.setdefault(c, []).append(doc)
    expected = {}
    for members in groups.values():
        keeper = min(members, key=lambda d: (cc[d], d))
        for d in members:
            expected[d] = keeper
    got = semdedup_keepers(emb, dim=DIM, eps=thr, n_clusters=k).collect()
    assert len(got) == N
    for r in got:
        want = expected.get(r["vec_id"], r["vec_id"])
        assert r["keeper_id"] == want
        assert r["is_keeper"] == (r["vec_id"] == want)
    # at least one real dup group exists (planted pair) and drops a doc
    assert any(not r["is_keeper"] for r in got)


def test_ivf_small_corpus_and_zero_norm(spark):
    """build_ivf_index with fewer non-zero-norm vectors than n_clusters
    must clamp k instead of crashing np.random.choice (ADVICE r3), and
    an all-zero-norm table must raise a clear ValueError."""
    import pytest as _pytest

    from search_engine_spark.operators.similarity import (
        build_ivf_index, ivf_query_topk)

    rows = [(i, [float(i + 1), float((i * 3) % 5), 1.0, 0.5]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx, cent = build_ivf_index(emb, dim=4, n_clusters=16)
    assert cent.shape[0] <= 5
    got = ivf_query_topk(emb, idx, cent, rows[2][1], k=3,
                         n_probe=cent.shape[0]).collect()
    assert got and got[0]["vec_id"] == 2

    zero = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="non-zero norm"):
        build_ivf_index(zero, dim=4)


def test_srp_multiprobe_hamming_ball_expands(emb):
    """multiprobe_hamming=2 probes the full Hamming-2 ball (round-3 fix:
    it used to degrade silently to the 1-bit set): candidate rows grow
    monotonically with m, and m=1 equals the documented 9-bucket set."""
    import numpy as np

    from search_engine_spark.operators.similarity import (
        _probe_condition,
        build_srp_index,
    )

    v = _vecs()
    idx = build_srp_index(emb, dim=DIM, n_planes=8, n_tables=4).cache()
    q = np.asarray([float(x) for x in v[3]])
    counts = [
        idx.filter(_probe_condition(q, 8, 4, m)).count() for m in (0, 1, 2)
    ]
    assert counts[0] <= counts[1] <= counts[2]
    assert counts[2] > counts[1]  # the Hamming-2 shell really probes
    idx.unpersist()


def test_ann_cli_build_query_brute(tmp_path):
    """jobs/ann.py end-to-end: build persists the index + meta, query
    probes it (self-query retrieves itself first), --brute gives the
    exact baseline, bad inputs exit 2."""
    import json as _json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    idx = str(tmp_path / "ann_idx")

    def run(*a):
        return subprocess.run(
            [sys.executable, os.path.join(repo, "jobs", "ann.py"),
             *a, "--embeddings", emb, "--index", idx, "--local-cpus", "2"],
            capture_output=True, text=True, cwd=repo, timeout=300, env=env,
        )

    b = run("build")
    assert b.returncode == 0, b.stderr[-2000:]
    meta = _json.loads(b.stdout.strip().splitlines()[-1])
    assert meta["n_vectors"] > 0 and os.path.exists(
        os.path.join(idx, "_ann_meta.json"))

    q = run("query", "--vec-id", "3", "--k", "5")
    assert q.returncode == 0, q.stderr[-2000:]
    hits = [_json.loads(l) for l in q.stdout.strip().splitlines() if l]
    assert hits and hits[0]["vec_id"] == 3 and abs(hits[0]["cosine"] - 1) < 1e-6

    br = run("query", "--vec-id", "3", "--k", "5", "--brute")
    bhits = [_json.loads(l) for l in br.stdout.strip().splitlines() if l]
    assert bhits[0]["vec_id"] == 3
    # ANN hits are a subset of vectors; every ANN cosine matches brute's
    # exact value for the same id
    bmap = {h["vec_id"]: h["cosine"] for h in bhits}
    for h in hits:
        if h["vec_id"] in bmap:
            assert h["cosine"] == bmap[h["vec_id"]]

    assert run("query").returncode == 2  # neither --vec-id nor --vector
    assert run("query", "--vec-id", "999999").returncode == 2

    # IVF family through the same CLI: self-query retrieves itself
    idx2 = str(tmp_path / "ann_ivf")

    def run2(*a):
        return subprocess.run(
            [sys.executable, os.path.join(repo, "jobs", "ann.py"),
             *a, "--embeddings", emb, "--index", idx2, "--local-cpus", "2"],
            capture_output=True, text=True, cwd=repo, timeout=300, env=env,
        )

    b2 = run2("build", "--method", "ivf", "--clusters", "8")
    assert b2.returncode == 0, b2.stderr[-2000:]
    q2 = run2("query", "--vec-id", "3", "--k", "5", "--n-probe", "2")
    assert q2.returncode == 0, q2.stderr[-2000:]
    h2 = [_json.loads(l) for l in q2.stdout.strip().splitlines() if l]
    assert h2 and h2[0]["vec_id"] == 3 and abs(h2[0]["cosine"] - 1) < 1e-6


def test_ivf_disk_index_matches_memory_and_prunes_partitions(emb, spark,
                                                             tmp_path):
    """write_ivf_index + ivf_query_topk_disk == the in-memory IVF on the
    same persisted model; the probe scan prunes cluster PARTITION dirs."""
    from search_engine_spark.operators.similarity import (
        build_ivf_index,
        ivf_query_topk,
        ivf_query_topk_disk,
        read_ivf_centroids,
        write_ivf_index,
    )
    from search_engine_spark.plans.explain import physical_plan

    v = _vecs()
    out = str(tmp_path / "ivf_idx")
    cent_w = write_ivf_index(emb, out, dim=DIM, n_clusters=8)
    np.testing.assert_array_equal(read_ivf_centroids(out), cent_w)
    # deterministic model: disk build == a fresh in-memory build
    idx_mem, cent_m = build_ivf_index(emb, dim=DIM, n_clusters=8)
    np.testing.assert_array_equal(cent_w, cent_m)

    q = [float(x) for x in v[11]]
    want = [(r["vec_id"], r["cosine"]) for r in
            ivf_query_topk(emb, idx_mem, cent_m, q, k=7, n_probe=3).collect()]
    got_df = ivf_query_topk_disk(emb, out, q, k=7, n_probe=3)
    got = [(r["vec_id"], r["cosine"]) for r in got_df.collect()]
    assert got == want and len(got) == 7

    # ids only on disk; probe is a partition-pruned read
    stored = spark.read.parquet(out)
    assert set(stored.columns) == {"vec_id", "cluster"}
    from pyspark.sql import functions as F
    plan = physical_plan(spark.read.parquet(out).filter(
        F.col("cluster").isin([0, 1])))
    assert "PartitionFilters" in plan and "cluster" in plan.split(
        "PartitionFilters:")[1].split("]")[0], plan

    # centroids= branch (the oracle-replayable hash-centroid quantizer):
    # disk probe == in-memory ivf_query_topk on the same model
    from search_engine_spark.operators.similarity import (
        hash_centroids,
        ivf_assign,
    )

    out_h = str(tmp_path / "ivf_idx_hash")
    cent_h = hash_centroids(DIM, 8)
    got_cent = write_ivf_index(emb, out_h, dim=DIM, centroids=cent_h)
    np.testing.assert_array_equal(got_cent, cent_h)
    want_h = [(r["vec_id"], r["cosine"]) for r in ivf_query_topk(
        emb, ivf_assign(emb, cent_h), cent_h, q, k=7, n_probe=3).collect()]
    got_h = [(r["vec_id"], r["cosine"]) for r in
             ivf_query_topk_disk(emb, out_h, q, k=7, n_probe=3).collect()]
    assert got_h == want_h and len(got_h) == 7


def _dir_snapshot(root):
    """{relpath: (size, mtime_ns)} for every file under root."""
    import os

    out = {}
    for dp, _, fns in os.walk(root):
        for fn in fns:
            p = os.path.join(dp, fn)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def test_append_ivf_partition_bounded(emb, spark, tmp_path):
    """append_ivf_index == from-scratch build of the full corpus on the
    same frozen centroids; only the clusters that received delta rows
    are rewritten (untouched partition dirs byte-stable); duplicate ids
    are refused."""
    from search_engine_spark.operators.similarity import (
        append_ivf_index,
        hash_centroids,
        ivf_assign,
        ivf_query_topk_disk,
        write_ivf_index,
    )

    v = _vecs()
    base = emb.filter(F.col("vec_id") < 290)
    delta = emb.filter(F.col("vec_id") >= 290)
    cent = hash_centroids(DIM, 8)
    out = str(tmp_path / "ivf_append")
    write_ivf_index(base, out, dim=DIM, centroids=cent)
    before = _dir_snapshot(out)

    affected = append_ivf_index(delta, out)
    assert affected  # the 10-vector delta landed somewhere
    untouched = [c for c in range(8) if c not in affected]
    assert untouched  # fixture leaves at least one cluster untouched
    after = _dir_snapshot(out)
    for rel, sig in before.items():
        cl = rel.split("/")[0]
        if cl.startswith("cluster=") and int(cl.split("=")[1]) in untouched:
            assert after.get(rel) == sig, rel  # never read, never rewritten

    # stored assignments == one fresh assignment pass over the full set
    stored = {(r["vec_id"], r["cluster"])
              for r in spark.read.parquet(out).collect()}
    want = {(r["vec_id"], r["cluster"])
            for r in ivf_assign(emb, cent).collect()}
    assert stored == want and len(stored) == N

    # probe result == a fresh full build's probe
    out_full = str(tmp_path / "ivf_full")
    write_ivf_index(emb, out_full, dim=DIM, centroids=cent)
    q = [float(x) for x in v[3]]
    got = [(r["vec_id"], r["cosine"]) for r in
           ivf_query_topk_disk(emb, out, q, k=8, n_probe=3).collect()]
    want_q = [(r["vec_id"], r["cosine"]) for r in
              ivf_query_topk_disk(emb, out_full, q, k=8, n_probe=3).collect()]
    assert got == want_q and got[0][0] == 3

    with pytest.raises(ValueError, match="already indexed"):
        append_ivf_index(emb.filter(F.col("vec_id") == 0), out)


def test_append_srp_partition_bounded(emb, spark, tmp_path):
    """append_srp_index: appended index answers probes identically to a
    from-scratch build of the full corpus (same deterministic
    hyperplanes); untouched (table, bgroup) dirs byte-stable."""
    from search_engine_spark.operators.similarity import (
        append_srp_index,
        srp_query_topk_disk,
        write_srp_index,
    )

    v = _vecs()
    base = emb.filter(F.col("vec_id") < 290)
    delta = emb.filter(F.col("vec_id") >= 290)
    out = str(tmp_path / "srp_append")
    write_srp_index(base, out, dim=DIM, n_planes=8, n_tables=2)
    before = _dir_snapshot(out)

    affected = append_srp_index(delta, out, dim=DIM, n_planes=8, n_tables=2)
    assert affected
    aff = set(affected)
    touched_rel = {f"table={t}/bgroup={g}" for t, g in aff}
    after = _dir_snapshot(out)
    untouched_seen = 0
    for rel, sig in before.items():
        parts = rel.split("/")
        if len(parts) >= 3 and parts[0].startswith("table="):
            if f"{parts[0]}/{parts[1]}" not in touched_rel:
                assert after.get(rel) == sig, rel
                untouched_seen += 1
    assert untouched_seen  # fixture leaves some groups untouched

    out_full = str(tmp_path / "srp_full")
    write_srp_index(emb, out_full, dim=DIM, n_planes=8, n_tables=2)
    q = [float(x) for x in v[295]]  # a delta vector must be findable
    got = [(r["vec_id"], r["cosine"]) for r in srp_query_topk_disk(
        emb, out, q, k=5, n_planes=8, n_tables=2).collect()]
    want = [(r["vec_id"], r["cosine"]) for r in srp_query_topk_disk(
        emb, out_full, q, k=5, n_planes=8, n_tables=2).collect()]
    assert got == want and got and got[0][0] == 295

    with pytest.raises(ValueError, match="already indexed"):
        append_srp_index(emb.filter(F.col("vec_id") == 1), out,
                         dim=DIM, n_planes=8, n_tables=2)


def test_ann_cli_append(tmp_path):
    """jobs/ann.py append: fold a delta parquet into a built index using
    the recorded meta; new ids become retrievable; re-appending an
    already-indexed id fails loudly."""
    import json as _json
    import os
    import subprocess
    import sys

    import duckdb

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    base = str(tmp_path / "base.parquet")
    delta = str(tmp_path / "delta.parquet")
    con = duckdb.connect()
    nmax = con.sql(f"SELECT max(vec_id) FROM '{emb}'").fetchone()[0]
    cut = nmax - 5
    con.sql(f"COPY (SELECT * FROM '{emb}' WHERE vec_id <= {cut}) "
            f"TO '{base}' (FORMAT PARQUET)")
    con.sql(f"COPY (SELECT * FROM '{emb}' WHERE vec_id > {cut}) "
            f"TO '{delta}' (FORMAT PARQUET)")
    idx = str(tmp_path / "ann_idx")

    def run(embeddings, *a):
        return subprocess.run(
            [sys.executable, os.path.join(repo, "jobs", "ann.py"),
             *a, "--embeddings", embeddings, "--index", idx,
             "--local-cpus", "2"],
            capture_output=True, text=True, cwd=repo, timeout=300, env=env,
        )

    b = run(base, "build", "--method", "ivf", "--clusters", "8")
    assert b.returncode == 0, b.stderr[-2000:]
    a = run(delta, "append")
    assert a.returncode == 0, a.stderr[-2000:]
    stats = _json.loads(a.stdout.strip().splitlines()[-1])
    assert stats["appended"] == 5 and stats["affected_partitions"] >= 1

    q = run(emb, "query", "--vec-id", str(nmax), "--k", "5")
    assert q.returncode == 0, q.stderr[-2000:]
    hits = [_json.loads(l) for l in q.stdout.strip().splitlines() if l]
    assert hits and hits[0]["vec_id"] == nmax \
        and abs(hits[0]["cosine"] - 1) < 1e-6

    dup = run(delta, "append")  # same ids again → insert-only contract
    assert dup.returncode != 0 and "already indexed" in dup.stderr


def test_brute_force_topk_per_group(emb, spark):
    """Per-group exact top-k == running brute_force_topk inside each
    group; the rank<=k predicate reaches WindowGroupLimit (k-bounded
    heap per group, not a full sort — the one-pass at-scale property)."""
    from search_engine_spark.operators.similarity import (
        brute_force_topk_per_group,
    )

    v = _vecs()
    labeled = emb.withColumn("label", (F.col("vec_id") % 4).cast("int"))
    q = [float(x) for x in v[7]]
    got = brute_force_topk_per_group(labeled, q, "label", k=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    rows = got.collect()
    assert [c for c in got.columns] == ["label", "vec_id", "cosine", "rank"]
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append((r["vec_id"], r["cosine"]))
    assert set(by_label) == {0, 1, 2, 3}
    for lab, hits in by_label.items():
        want = [
            (r["vec_id"], r["cosine"])
            for r in brute_force_topk(
                labeled.filter(F.col("label") == lab), q, k=3
            ).collect()
        ]
        assert hits == want, lab


def test_filtered_topk_pre_filter_semantics(spark):
    """Filtered kNN: results all satisfy the predicate and equal the
    exact top-k over the filtered subset (pre-filter, never
    post-filter under-return)."""
    import random

    from pyspark.sql import functions as F

    from search_engine_spark.operators.similarity import (
        brute_force_topk,
        filtered_topk,
    )

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3)
        for i in range(60)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    q = rows[0][1]
    got = filtered_topk(emb, q, F.col("label") == 1, k=5).collect()
    assert len(got) == 5
    labels = {r[0]: r[2] for r in rows}
    assert all(labels[r["vec_id"]] == 1 for r in got)
    want = brute_force_topk(emb.filter(F.col("label") == 1), q, k=5).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == [
        (r["vec_id"], r["cosine"]) for r in want
    ]
    # a selective filter still returns k when k qualify — the
    # post-filter failure mode this operator exists to avoid
    assert len(filtered_topk(emb, q, F.col("label") == 2, k=20).collect()) == 20


def test_pq_encode_matches_numpy_argmax(emb):
    """pq_encode's per-subspace code == numpy argmax over codeword dots
    computed independently (matrix math, not the fold loop) — the two
    only agree when the Spark batch fold is computing the right thing."""
    from search_engine_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    v = _vecs()
    cb = pq_codebooks(DIM, 8, 16)
    dsub = DIM // 8
    got = {r["vec_id"]: list(r["codes"])
           for r in pq_encode(emb, cb).collect()}
    for i in range(N):
        if np.linalg.norm(v[i]) == 0:
            assert i not in got
            continue
        want = [
            int(np.argmax(cb[s] @ v[i][s * dsub:(s + 1) * dsub]))
            for s in range(8)
        ]
        assert got[i] == want, i


def test_pq_topk_scores_are_exact_table_sums(emb):
    """pq_topk's qdot == Σ_s T[s][code_s] recomputed in Python — exact
    integers, deterministic ranking (the oracle-hash contract)."""
    from search_engine_spark.operators.similarity import (
        pq_adc_tables_py,
        pq_codebooks,
        pq_encode,
        pq_topk,
    )

    v = _vecs()
    q = [float(x) for x in v[7]]
    cb = pq_codebooks(DIM, 8, 16)
    tabs = pq_adc_tables_py(q, cb)
    codes = {r["vec_id"]: list(r["codes"])
             for r in pq_encode(emb, cb).collect()}
    want_scores = {
        i: sum(tabs[s][c] for s, c in enumerate(cs))
        for i, cs in codes.items()
    }
    got = pq_topk(emb, q, cb, k=10).collect()
    order = sorted(want_scores, key=lambda i: (-want_scores[i], i))[:10]
    assert [r["vec_id"] for r in got] == order
    for r in got:
        assert r["qdot"] == want_scores[r["vec_id"]]


def test_pq_adc_recall_on_clustered_vectors(spark):
    """PQ ADC recall on cluster-structured embeddings: with 8×16
    hash codebooks the lookup ranking must beat chance by a wide
    margin (k-means codebooks would push this toward sq8's ≥0.8 — the
    documented codebook-quality trade; the machinery is what's
    pinned)."""
    import numpy as np

    from search_engine_spark.operators.similarity import (
        brute_force_topk,
        pq_codebooks,
        pq_topk,
    )

    rng = np.random.RandomState(3)
    cents = rng.randn(20, DIM)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = []
    for i in range(400):
        x = cents[i % 20] + 0.15 * rng.randn(DIM)
        vecs.append(x / np.linalg.norm(x))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).cache()
    cb = pq_codebooks(DIM, 8, 16)
    rec = []
    for qi in range(0, 30, 3):
        q = [float(x) for x in vecs[qi]]
        truth = {r["vec_id"] for r in brute_force_topk(df, q, k=10).collect()}
        got = {r["vec_id"] for r in pq_topk(df, q, cb, k=10).collect()}
        rec.append(len(got & truth) / 10)
    df.unpersist()
    assert sum(rec) / len(rec) >= 0.3, rec  # chance is 10/400 = 0.025


def test_pq_codebooks_shape_and_dim_guard():
    from search_engine_spark.operators.similarity import pq_codebooks

    cb = pq_codebooks(64, 8, 16)
    assert cb.shape == (8, 16, 8)
    norms = np.linalg.norm(cb, axis=2)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-12)
    with pytest.raises(ValueError, match="divisible"):
        pq_codebooks(60, 8, 16)

def test_ivfpq_encode_matches_numpy(emb):
    """ivfpq_encode: cluster == ivf_assign's coarse assignment; the 2m
    codes == numpy replay of residual direction argmax + norm-level
    argmin — independent matrix math, not the batch fold."""
    from search_engine_spark.operators.similarity import (
        hash_centroids,
        ivf_assign,
        ivfpq_encode,
        pq_codebooks,
        pq_norm_levels,
    )

    v = _vecs()
    cent = hash_centroids(DIM, 16)
    cb = pq_codebooks(DIM, 8, 16)
    lv = np.array(pq_norm_levels())
    dsub = DIM // 8
    got = {r["vec_id"]: (r["cluster"], list(r["codes"]))
           for r in ivfpq_encode(emb, cent, cb).collect()}
    coarse = {r["vec_id"]: r["cluster"]
              for r in ivf_assign(emb, cent).collect()}
    for i, (cl, codes) in got.items():
        assert cl == coarse[i]
        assert len(codes) == 16
        res = v[i] - cent[cl]
        for s in range(8):
            sub = res[s * dsub:(s + 1) * dsub]
            assert codes[s] == int(np.argmax(cb[s] @ sub)), (i, s)
            assert codes[8 + s] == int(
                np.argmin(np.abs(np.linalg.norm(sub) - lv))
            ), (i, s)


def test_ivfpq_topk_scores_and_probe_bound(emb):
    """qdot == Q[cluster] + Σ_s Tdir[s][dir_s]·NV[lvl_s] replayed in
    Python (exact int64 products); every result row's cluster is inside
    the probe set."""
    import math

    from search_engine_spark.operators.similarity import (
        PQ_LVL_SCALE,
        SQ8_W_SCALE,
        hash_centroids,
        ivfpq_encode,
        ivfpq_topk,
        pq_codebooks,
        pq_norm_levels,
    )

    v = _vecs()
    q = [float(x) for x in v[7]]
    cent = hash_centroids(DIM, 16)
    cb = pq_codebooks(DIM, 8, 16)
    lv = pq_norm_levels()
    dsub = DIM // 8
    qdots = []
    for c in range(16):
        acc = 0.0
        for i in range(DIM):
            acc += q[i] * float(cent[c, i])
        qdots.append(acc)
    probe = set(sorted(range(16), key=lambda c: (-qdots[c], c))[:4])
    qterm = [int(math.floor(d * SQ8_W_SCALE + 0.5)) for d in qdots]
    tdir = []
    for s in range(8):
        row = []
        for j in range(16):
            acc = 0.0
            for i in range(dsub):
                acc += q[s * dsub + i] * float(cb[s, j, i])
            row.append(int(math.floor(acc * PQ_LVL_SCALE + 0.5)))
        tdir.append(row)
    nv = [int(math.floor(float(x) * PQ_LVL_SCALE + 0.5)) for x in lv]
    enc = {r["vec_id"]: (r["cluster"], list(r["codes"]))
           for r in ivfpq_encode(emb, cent, cb).collect()}
    want = {
        i: qterm[cl] + sum(
            tdir[s][cs[s]] * nv[cs[8 + s]] for s in range(8)
        )
        for i, (cl, cs) in enc.items() if cl in probe
    }
    got = ivfpq_topk(emb, q, cent, cb, k=10, n_probe=4).collect()
    order = sorted(want, key=lambda i: (-want[i], i))[:10]
    assert [r["vec_id"] for r in got] == order
    for r in got:
        assert r["qdot"] == want[r["vec_id"]]
        assert enc[r["vec_id"]][0] in probe


def test_ivfpq_residual_codes_beat_raw_pq_with_adapted_centroids(spark):
    """The reason IVFPQ exists: residual codes recover rank better
    than raw-vector codes ONCE the coarse quantizer is data-adapted so
    residuals are genuinely small. Pinned with the true cluster
    directions as centroids (a k-means stand-in; full probe isolates
    code quality). With data-INDEPENDENT hash centroids residuals stay
    ~norm-1 and residual coding buys nothing — measured and documented
    in the module header — which is exactly why FAISS trains the
    coarse quantizer."""
    import numpy as np

    from search_engine_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
        pq_codebooks,
        pq_topk,
    )

    rng = np.random.RandomState(3)
    cents = rng.randn(20, DIM)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = []
    for i in range(400):
        x = cents[i % 20] + 0.15 * rng.randn(DIM)
        vecs.append(x / np.linalg.norm(x))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).cache()
    cb = pq_codebooks(DIM, 8, 16)
    coarse = cents[:16]
    pq_rec, ivfpq_rec = [], []
    for qi in range(0, 30, 3):
        q = [float(x) for x in vecs[qi]]
        truth = {r["vec_id"] for r in brute_force_topk(df, q, k=10).collect()}
        got_pq = {r["vec_id"] for r in pq_topk(df, q, cb, k=10).collect()}
        got_ivfpq = {r["vec_id"] for r in
                     ivfpq_topk(df, q, coarse, cb, k=10, n_probe=16).collect()}
        pq_rec.append(len(got_pq & truth) / 10)
        ivfpq_rec.append(len(got_ivfpq & truth) / 10)
    df.unpersist()
    assert sum(ivfpq_rec) > sum(pq_rec), (ivfpq_rec, pq_rec)
    assert sum(ivfpq_rec) / len(ivfpq_rec) >= 0.5, ivfpq_rec


def test_ivfpq_disk_matches_memory_and_appends(emb, spark, tmp_path):
    """write_ivfpq_index + ivfpq_query_topk_disk == ivfpq_topk on the
    same model (codes-only probe, no vector table); a two-step
    build+append over a split corpus equals the one-shot build; the
    exact-rerank path returns true cosines."""
    from search_engine_spark.operators.similarity import (
        append_ivfpq_index,
        brute_force_topk,
        hash_centroids,
        ivfpq_query_topk_disk,
        ivfpq_topk,
        pq_codebooks,
        write_ivfpq_index,
    )

    v = _vecs()
    q = [float(x) for x in v[7]]
    cent = hash_centroids(DIM, 16)
    cb = pq_codebooks(DIM, 8, 16)

    full = str(tmp_path / "pq_full")
    write_ivfpq_index(emb, full, dim=DIM, centroids=cent)
    mem = [(r["vec_id"], r["qdot"])
           for r in ivfpq_topk(emb, q, cent, cb, k=10, n_probe=4).collect()]
    disk = [(r["vec_id"], r["qdot"])
            for r in ivfpq_query_topk_disk(spark, full, q, k=10,
                                           n_probe=4).collect()]
    assert mem == disk and mem

    # split build + append == one-shot build (model frozen at build)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    delta = emb.filter(F.col("vec_id") % 2 == 1)
    two = str(tmp_path / "pq_two")
    write_ivfpq_index(base, two, dim=DIM, centroids=cent)
    affected = append_ivfpq_index(delta, two)
    assert affected  # some cluster dirs were rewritten
    appended = [(r["vec_id"], r["qdot"])
                for r in ivfpq_query_topk_disk(spark, two, q, k=10,
                                               n_probe=4).collect()]
    assert appended == disk

    # exact rerank: cosines equal brute-force's for the same ids
    rr = ivfpq_query_topk_disk(spark, full, q, k=5, n_probe=16,
                               rerank_embeddings=emb).collect()
    bmap = {r["vec_id"]: r["cosine"]
            for r in brute_force_topk(emb, q, k=1000).collect()}
    assert rr
    for r in rr:
        assert abs(r["cosine"] - bmap[r["vec_id"]]) < 1e-9


def test_ann_cli_pq_family(tmp_path):
    """jobs/ann.py --method pq: build -> codes-only query (qdot ints),
    --rerank query (cosines, self-query first), append folds a delta."""
    import json as _json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    idx = str(tmp_path / "ann_pq")

    def run(*a):
        return subprocess.run(
            [sys.executable, os.path.join(repo, "jobs", "ann.py"),
             *a, "--embeddings", emb, "--index", idx, "--local-cpus", "2"],
            capture_output=True, text=True, cwd=repo, timeout=300, env=env,
        )

    b = run("build", "--method", "pq", "--clusters", "8")
    assert b.returncode == 0, b.stderr[-2000:]
    assert os.path.exists(os.path.join(idx, "_ivfpq_meta.json"))

    q = run("query", "--vec-id", "3", "--k", "5", "--n-probe", "8")
    assert q.returncode == 0, q.stderr[-2000:]
    hits = [_json.loads(l) for l in q.stdout.strip().splitlines() if l]
    assert hits and all("qdot" in h for h in hits)

    qr = run("query", "--vec-id", "3", "--k", "5", "--n-probe", "8",
             "--rerank")
    assert qr.returncode == 0, qr.stderr[-2000:]
    rhits = [_json.loads(l) for l in qr.stdout.strip().splitlines() if l]
    assert rhits and rhits[0]["vec_id"] == 3
    assert abs(rhits[0]["cosine"] - 1) < 1e-6


def test_ivfpq_disk_probe_prunes_partitions(emb, spark, tmp_path):
    """The persisted IVF-PQ probe must be a partition-pruned read of
    the n_probe cluster dirs (the scale contract: at 10^9 vectors a
    probe touches n_probe directories of 2m-byte codes, nothing
    else) and the stored columns are codes-only — no vectors."""
    from search_engine_spark.operators.similarity import (
        hash_centroids,
        write_ivfpq_index,
    )
    from search_engine_spark.plans.explain import physical_plan

    out = str(tmp_path / "pq_prune")
    write_ivfpq_index(emb, out, dim=DIM,
                      centroids=hash_centroids(DIM, 16))
    stored = spark.read.parquet(out)
    assert set(stored.columns) == {"vec_id", "codes", "cluster"}
    plan = physical_plan(stored.filter(F.col("cluster").isin([2, 5])))
    assert "PartitionFilters" in plan, plan
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "cluster" in pf, plan

def test_pq_trained_encode_is_nearest_l2(emb):
    """pq_encode with halfsq biases assigns each subvector its true
    nearest codeword by L2 (argmax(x·c − ‖c‖²/2) ≡ argmin ‖x−c‖², the
    trained-codebook contract — codewords are NOT unit so bare argmax-
    dot would chase big-norm codewords)."""
    from search_engine_spark.operators.similarity import (
        _pq_spark_sample,
        pq_encode,
        pq_halfsq,
        pq_train_codebooks,
    )

    sample = _pq_spark_sample(emb, DIM, sample_size=200)
    cb = pq_train_codebooks(sample, m=4, ks=8)
    biases = pq_halfsq(cb)
    got = {r["vec_id"]: list(r["codes"])
           for r in pq_encode(emb, cb, biases=biases).collect()}
    v = _vecs()
    dsub = DIM // 4
    for vid in range(0, N, 17):
        for s in range(4):
            sub = v[vid][s * dsub:(s + 1) * dsub]
            d2 = ((cb[s] - sub[None, :]) ** 2).sum(axis=1)
            assert got[vid][s] == int(np.argmin(d2)), (vid, s)


def test_pq_trained_beats_random_and_rerank_hits_band(emb):
    """The round-5 recall fix (VERDICT r4 'wrong #1'): trained
    codebooks must beat the random-codebook ADC, and the shipped
    configuration (trained m=DIM/4, ks=64, exact rerank of the top 4k)
    must clear the 0.8 recall band that IVF's probe lever sets — on
    THIS module's gaussian fixture, the same no-structure worst case
    as the driver embeddings."""
    from search_engine_spark.operators.similarity import (
        _pq_spark_sample,
        brute_force_topk,
        pq_codebooks,
        pq_halfsq,
        pq_topk,
        pq_train_codebooks,
    )

    sample = _pq_spark_sample(emb, DIM, sample_size=300)
    m = DIM // 4
    tr = pq_train_codebooks(sample, m=m, ks=64)
    biases = pq_halfsq(tr)
    rand = pq_codebooks(DIM, m, 16)
    v = _vecs()
    r_rand, r_tr, r_rr = [], [], []
    for qi in range(0, 30, 3):
        q = [float(x) for x in v[qi]]
        truth = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
        got = {r["vec_id"] for r in pq_topk(emb, q, rand, k=10).collect()}
        r_rand.append(len(got & truth) / 10)
        got = {r["vec_id"] for r in
               pq_topk(emb, q, tr, k=10, biases=biases).collect()}
        r_tr.append(len(got & truth) / 10)
        got = {r["vec_id"] for r in
               pq_topk(emb, q, tr, k=10, biases=biases,
                       rerank_embeddings=emb, rerank_factor=4).collect()}
        r_rr.append(len(got & truth) / 10)
    n = len(r_tr)
    assert sum(r_tr) / n > sum(r_rand) / n, (r_tr, r_rand)
    assert sum(r_rr) / n >= 0.8, r_rr


def test_ivfpq_plain_trained_disk_lifecycle(emb, spark, tmp_path):
    """write_ivfpq_index(codebooks='train'): the persisted meta carries
    the fitted codebooks + plain coding; the disk probe replays them
    (== in-memory ivfpq_topk with the same model), append with a split
    corpus equals the one-shot build (model frozen at build), and the
    rerank path returns true cosines."""
    from search_engine_spark.operators.similarity import (
        append_ivfpq_index,
        brute_force_topk,
        ivfpq_query_topk_disk,
        ivfpq_topk,
        pq_halfsq,
        read_ivfpq_meta,
        write_ivfpq_index,
    )

    v = _vecs()
    q = [float(x) for x in v[7]]
    full = str(tmp_path / "pq_tr_full")
    cent, cb = write_ivfpq_index(emb, full, dim=DIM, n_clusters=8,
                                 m=4, ks=16, codebooks="train")
    meta = read_ivfpq_meta(full)
    assert meta["coding"] == "plain"
    assert np.allclose(meta["codebooks"], cb)
    assert meta["ks"] == 16 and meta["m"] == 4

    mem = [(r["vec_id"], r["qdot"])
           for r in ivfpq_topk(emb, q, cent, cb, k=10, n_probe=4,
                               coding="plain",
                               biases=pq_halfsq(cb)).collect()]
    disk = [(r["vec_id"], r["qdot"])
            for r in ivfpq_query_topk_disk(spark, full, q, k=10,
                                           n_probe=4).collect()]
    assert mem == disk and mem

    base = emb.filter(F.col("vec_id") % 2 == 0)
    delta = emb.filter(F.col("vec_id") % 2 == 1)
    two = str(tmp_path / "pq_tr_two")
    write_ivfpq_index(base, two, dim=DIM, n_clusters=8, m=4, ks=16,
                      codebooks=cb)
    # frozen-model appends only make sense against the same centroids:
    # rewrite meta centroids to the full-build model for a clean A/B
    assert append_ivfpq_index(delta, two)
    # trained two-step with its own (base-sample) model still serves;
    # equality to `disk` needs the same model, so compare against a
    # one-shot build with the SAME explicit codebooks + base centroids
    meta2 = read_ivfpq_meta(two)
    one = str(tmp_path / "pq_tr_one")
    write_ivfpq_index(emb, one, dim=DIM, n_clusters=8, m=4, ks=16,
                      centroids=meta2["centroids"], codebooks=cb)
    got_two = [(r["vec_id"], r["qdot"])
               for r in ivfpq_query_topk_disk(spark, two, q, k=10,
                                              n_probe=8).collect()]
    got_one = [(r["vec_id"], r["qdot"])
               for r in ivfpq_query_topk_disk(spark, one, q, k=10,
                                              n_probe=8).collect()]
    assert got_two == got_one and got_two

    rr = ivfpq_query_topk_disk(spark, full, q, k=5, n_probe=8,
                               rerank_embeddings=emb).collect()
    bmap = {r["vec_id"]: r["cosine"]
            for r in brute_force_topk(emb, q, k=N).collect()}
    for r in rr:
        assert abs(r["cosine"] - bmap[r["vec_id"]]) < 1e-9
