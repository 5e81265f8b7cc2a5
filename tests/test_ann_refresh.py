"""Streaming ANN refresh (streaming/ann_refresh.py): AvailableNow drain
folds new embedding files into the disk index via partition-bounded
appends; duplicate re-emits are skipped; result == from-scratch build."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.streaming.ann_refresh import (
    append_ann_batch,
    incremental_ann_refresh,
    read_ann_meta,
)

DIM = 16
N = 120


def _vecs():
    rs = np.random.RandomState(11)
    return rs.randn(N, DIM)


@pytest.fixture(scope="module")
def emb(spark):
    v = _vecs()
    rows = [(i, [float(x) for x in v[i]], i % 3) for i in range(N)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).cache()


@pytest.fixture(scope="module")
def ivf_stream(spark, emb, tmp_path_factory):
    """Base IVF index over ids [0, 90) + a streamed delta [90, 120)."""
    from search_engine_spark.operators.similarity import (
        hash_centroids,
        write_ivf_index,
    )

    base_dir = tmp_path_factory.mktemp("ann_stream")
    index_dir = str(base_dir / "ivf")
    input_dir = str(base_dir / "incoming")
    cent = hash_centroids(DIM, 8)
    write_ivf_index(
        emb.filter(F.col("vec_id") < 90), index_dir, dim=DIM, centroids=cent
    )
    meta = {"method": "ivf", "dim": DIM, "n_clusters": 8}
    with open(os.path.join(index_dir, "_ann_meta.json"), "w") as fh:
        json.dump(meta, fh)
    emb.filter(F.col("vec_id") >= 90).write.mode("overwrite").parquet(
        input_dir
    )
    incremental_ann_refresh(spark, input_dir, index_dir)
    return input_dir, index_dir, cent


def test_stream_folds_delta_into_ivf(spark, emb, ivf_stream):
    from search_engine_spark.operators.similarity import ivf_assign

    _, index_dir, cent = ivf_stream
    stored = {
        (r["vec_id"], r["cluster"])
        for r in spark.read.parquet(index_dir).collect()
    }
    want = {
        (r["vec_id"], r["cluster"]) for r in ivf_assign(emb, cent).collect()
    }
    assert stored == want and len(stored) == N


def test_stream_probe_matches_full_build(spark, emb, ivf_stream, tmp_path):
    from search_engine_spark.operators.similarity import (
        ivf_query_topk_disk,
        write_ivf_index,
    )

    _, index_dir, cent = ivf_stream
    full_dir = str(tmp_path / "ivf_full")
    write_ivf_index(emb, full_dir, dim=DIM, centroids=cent)
    q = [float(x) for x in _vecs()[95]]
    got = [
        (r["vec_id"], r["cosine"])
        for r in ivf_query_topk_disk(emb, index_dir, q, k=9, n_probe=3).collect()
    ]
    want = [
        (r["vec_id"], r["cosine"])
        for r in ivf_query_topk_disk(emb, full_dir, q, k=9, n_probe=3).collect()
    ]
    assert got == want and got[0][0] == 95


def test_redelivered_file_is_skipped_not_fatal(spark, emb, ivf_stream):
    """A producer re-emitting already-indexed ids in a NEW file (so the
    stream checkpoint does not dedup it) is absorbed by the skip policy:
    no duplicate rows, no stream failure."""
    input_dir, index_dir, _ = ivf_stream
    emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110)).write.mode(
        "append"
    ).parquet(input_dir)
    incremental_ann_refresh(spark, input_dir, index_dir)
    got = spark.read.parquet(index_dir).groupBy("vec_id").count()
    assert got.filter(F.col("count") > 1).isEmpty()
    assert got.count() == N


def test_checkpoint_makes_drain_idempotent(spark, ivf_stream):
    """No new files → the drain is a no-op (exactly-once per file)."""
    input_dir, index_dir, _ = ivf_stream
    import search_engine_spark.streaming.ann_refresh as ar

    calls = []
    orig = ar.append_ann_batch

    def spy(batch, idx, meta, on_duplicate="skip"):
        calls.append(1)
        return orig(batch, idx, meta, on_duplicate=on_duplicate)

    ar.append_ann_batch = spy
    try:
        incremental_ann_refresh(spark, input_dir, index_dir)
    finally:
        ar.append_ann_batch = orig
    assert not calls


def test_error_policy_raises_on_duplicate(spark, emb, ivf_stream):
    _, index_dir, _ = ivf_stream
    meta = read_ann_meta(index_dir)
    dup = emb.filter(F.col("vec_id") == 0)
    with pytest.raises(Exception, match="already indexed"):
        append_ann_batch(dup, index_dir, meta, on_duplicate="error")


def test_srp_stream_refresh(spark, emb, tmp_path):
    """Same drain over the SRP family: meta-recorded hyperplane params,
    appended index answers probes like a from-scratch full build."""
    from search_engine_spark.operators.similarity import (
        srp_query_topk_disk,
        write_srp_index,
    )

    index_dir = str(tmp_path / "srp")
    input_dir = str(tmp_path / "incoming")
    write_srp_index(
        emb.filter(F.col("vec_id") < 90), index_dir, dim=DIM,
        n_planes=8, n_tables=2,
    )
    meta = {"method": "srp", "dim": DIM, "n_planes": 8, "n_tables": 2,
            "group_bits": 5}
    with open(os.path.join(index_dir, "_ann_meta.json"), "w") as fh:
        json.dump(meta, fh)
    emb.filter(F.col("vec_id") >= 90).write.mode("overwrite").parquet(
        input_dir
    )
    incremental_ann_refresh(spark, input_dir, index_dir)

    full_dir = str(tmp_path / "srp_full")
    write_srp_index(emb, full_dir, dim=DIM, n_planes=8, n_tables=2)
    q = [float(x) for x in _vecs()[103]]
    got = [
        (r["vec_id"], r["cosine"])
        for r in srp_query_topk_disk(
            emb, index_dir, q, k=8, n_planes=8, n_tables=2
        ).collect()
    ]
    want = [
        (r["vec_id"], r["cosine"])
        for r in srp_query_topk_disk(
            emb, full_dir, q, k=8, n_planes=8, n_tables=2
        ).collect()
    ]
    assert got == want and got and got[0][0] == 103


def test_ann_cli_refresh(tmp_path):
    """jobs/ann.py refresh: drain an incoming dir into a built index;
    a second drain with no new files is a no-op; a re-emitted id in a
    NEW file is skipped, not fatal."""
    import json as _json
    import subprocess
    import sys

    import duckdb

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    base = str(tmp_path / "base.parquet")
    incoming = str(tmp_path / "incoming")
    os.makedirs(incoming)
    con = duckdb.connect()
    nmax = con.sql(f"SELECT max(vec_id) FROM '{emb}'").fetchone()[0]
    cut = nmax - 5
    con.sql(f"COPY (SELECT * FROM '{emb}' WHERE vec_id <= {cut}) "
            f"TO '{base}' (FORMAT PARQUET)")
    con.sql(f"COPY (SELECT * FROM '{emb}' WHERE vec_id > {cut}) "
            f"TO '{incoming}/delta1.parquet' (FORMAT PARQUET)")
    idx = str(tmp_path / "ann_idx")

    def run(embeddings, *a):
        return subprocess.run(
            [sys.executable, os.path.join(repo, "jobs", "ann.py"),
             *a, "--embeddings", embeddings, "--index", idx,
             "--local-cpus", "2"],
            capture_output=True, text=True, cwd=repo, timeout=300, env=env,
        )

    def footer_vectors():
        st = subprocess.run(
            [sys.executable, os.path.join(repo, "jobs", "index_stats.py"),
             "--index", idx],
            capture_output=True, text=True, cwd=repo, timeout=120, env=env,
        )
        assert st.returncode == 0, st.stderr[-2000:]
        return _json.loads(st.stdout.strip().splitlines()[-1])

    b = run(base, "build", "--method", "ivf", "--clusters", "8")
    assert b.returncode == 0, b.stderr[-2000:]
    n_base = footer_vectors()["n_vectors"]
    r = run(incoming, "refresh")
    assert r.returncode == 0, r.stderr[-2000:]
    stats = _json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["batches"] == 1 and stats["affected_partitions"] >= 1
    n_after = footer_vectors()["n_vectors"]
    assert n_after - n_base == 5
    stats = {"n_vectors_after": n_after}  # for the report check below

    # no new files → no-op; re-emitted ids in a new file → skipped
    con.sql(f"COPY (SELECT * FROM '{emb}' WHERE vec_id > {cut}) "
            f"TO '{incoming}/delta1_again.parquet' (FORMAT PARQUET)")
    r2 = run(incoming, "refresh")
    assert r2.returncode == 0, r2.stderr[-2000:]
    stats2 = _json.loads(r2.stdout.strip().splitlines()[-1])
    assert stats2["affected_partitions"] == 0  # all ids skipped
    assert footer_vectors()["n_vectors"] == n_after

    q = run(emb, "query", "--vec-id", str(nmax), "--k", "5")
    assert q.returncode == 0, q.stderr[-2000:]
    hits = [_json.loads(l) for l in q.stdout.strip().splitlines() if l]
    assert hits and hits[0]["vec_id"] == nmax \
        and abs(hits[0]["cosine"] - 1) < 1e-6

    # delete the id we just retrieved → gone from subsequent probes
    d = run(emb, "delete", "--vec-ids", str(nmax))
    assert d.returncode == 0, d.stderr[-2000:]
    dstats = _json.loads(d.stdout.strip().splitlines()[-1])
    assert dstats["affected_partitions"] >= 1
    q2 = run(emb, "query", "--vec-id", str(nmax), "--k", "5")
    assert q2.returncode == 0, q2.stderr[-2000:]
    hits2 = [_json.loads(l) for l in q2.stdout.strip().splitlines() if l]
    assert all(h["vec_id"] != nmax for h in hits2)

    # scan-free ANN stats report (footers only, no Spark session)
    st = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "index_stats.py"),
         "--index", idx],
        capture_output=True, text=True, cwd=repo, timeout=120, env=env,
    )
    assert st.returncode == 0, st.stderr[-2000:]
    rep = _json.loads(st.stdout.strip().splitlines()[-1])
    assert rep["ann_meta"]["method"] == "ivf"
    assert rep["n_partitions"] >= 1 and rep["partition_skew"] >= 1.0
    # build + refreshed delta - the deleted id
    assert rep["n_vectors"] == stats["n_vectors_after"] - 1
    assert [s["version"] for s in rep["snapshots"]] == [1]  # the delete's

    # rebuild: re-fit centroids over the current table, keep snapshots
    rb = run(emb, "rebuild")
    assert rb.returncode == 0, rb.stderr[-2000:]
    rbs = _json.loads(rb.stdout.strip().splitlines()[-1])
    assert rbs["n_clusters"] == 8
    q3 = run(emb, "query", "--vec-id", "0", "--k", "3")
    assert q3.returncode == 0, q3.stderr[-2000:]
    hits3 = [_json.loads(l) for l in q3.stdout.strip().splitlines() if l]
    assert hits3 and hits3[0]["vec_id"] == 0


def test_delete_partition_bounded_ivf(spark, emb, tmp_path):
    """delete_from_ann_index rewrites only the partitions holding the
    ids; untouched cluster dirs byte-stable; the index afterwards equals
    a from-scratch build of the surviving corpus; deleting an absent id
    is a no-op; a fully-emptied cluster dir disappears."""
    from search_engine_spark.operators.similarity import (
        delete_from_ann_index,
        hash_centroids,
        ivf_assign,
        write_ivf_index,
    )
    from tests.test_similarity import _dir_snapshot

    cent = hash_centroids(DIM, 8)
    out = str(tmp_path / "ivf_del")
    write_ivf_index(emb, out, dim=DIM, centroids=cent)
    assigned = {r["vec_id"]: r["cluster"]
                for r in ivf_assign(emb, cent).collect()}
    # pick every id in one cluster (empties it) + two ids elsewhere
    clusters = {}
    for i, c in assigned.items():
        clusters.setdefault(c, []).append(i)
    empty_c, empty_ids = min(clusters.items(), key=lambda kv: len(kv[1]))
    other = next(iter(clusters[c][0] for c in clusters if c != empty_c))
    doomed = list(empty_ids) + [other]
    before = _dir_snapshot(out)

    affected = delete_from_ann_index(spark, out, doomed)
    touched = {c for (c,) in affected}
    assert empty_c in touched and assigned[other] in touched
    after = _dir_snapshot(out)
    for rel, sig in before.items():
        c = rel.split("/")[0]
        if c.startswith("cluster=") and int(c.split("=")[1]) not in touched:
            assert after.get(rel) == sig, rel
    assert not os.path.isdir(os.path.join(out, f"cluster={empty_c}"))

    stored = {(r["vec_id"], r["cluster"])
              for r in spark.read.parquet(out).collect()}
    want = {(i, c) for i, c in assigned.items() if i not in set(doomed)}
    assert stored == want

    assert delete_from_ann_index(spark, out, [10**9]) == []


def test_delete_all_leaves_readable_empty_index(spark, emb, tmp_path):
    """Deleting EVERY id must not brick the dir: a flat empty parquet
    keeps root reads resolving (zero rows), and a later append brings
    partition dirs back cleanly (review r3)."""
    from search_engine_spark.operators.similarity import (
        append_ivf_index,
        delete_from_ann_index,
        hash_centroids,
        write_ivf_index,
    )

    cent = hash_centroids(DIM, 8)
    out = str(tmp_path / "ivf_all")
    small = emb.filter(F.col("vec_id") < 20)
    write_ivf_index(small, out, dim=DIM, centroids=cent)
    delete_from_ann_index(spark, out, list(range(20)))
    # readable, empty, schema intact
    left = spark.read.parquet(out)
    assert left.count() == 0
    assert {"vec_id", "cluster"} <= set(left.columns)
    # append after total deletion works and the placeholder is cleared
    append_ivf_index(
        emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 30)), out
    )
    back = spark.read.parquet(out)
    assert back.count() == 10
    assert {r["vec_id"] for r in back.collect()} == set(range(20, 30))


def test_delete_srp_cleans_all_tables(spark, emb, tmp_path):
    """An SRP id lives in n_tables partitions — delete removes every
    copy and probes stop returning it."""
    from search_engine_spark.operators.similarity import (
        delete_from_ann_index,
        srp_query_topk_disk,
        write_srp_index,
    )

    out = str(tmp_path / "srp_del")
    write_srp_index(emb, out, dim=DIM, n_planes=8, n_tables=3)
    affected = delete_from_ann_index(spark, out, [42])
    assert len({t for t, _ in affected}) == 3  # one hit per table
    left = spark.read.parquet(out).filter(F.col("vec_id") == 42)
    assert left.isEmpty()
    q = [float(x) for x in _vecs()[42]]
    got = srp_query_topk_disk(emb, out, q, k=5, n_planes=8,
                              n_tables=3).collect()
    assert all(r["vec_id"] != 42 for r in got)


def test_upsert_reassigns_moved_vector(spark, emb, ivf_stream, tmp_path):
    """upsert_ann_batch: a re-embedded vector lands in its NEW cluster
    with the old assignment gone — index equals a fresh build over the
    updated corpus."""
    from search_engine_spark.operators.similarity import (
        hash_centroids,
        ivf_assign,
        write_ivf_index,
    )
    from search_engine_spark.streaming.ann_refresh import (
        read_ann_meta,
        upsert_ann_batch,
    )

    cent = hash_centroids(DIM, 8)
    out = str(tmp_path / "ivf_ups")
    write_ivf_index(emb, out, dim=DIM, centroids=cent)
    # re-embed ids 5 and 6 as copies of vector 50 (likely new clusters)
    v = _vecs()
    new_rows = [(5, [float(x) for x in v[50]], 0),
                (6, [float(x) for x in -v[50]], 0)]
    newb = spark.createDataFrame(
        new_rows, "vec_id long, embedding array<double>, label int"
    )
    meta = {"method": "ivf", "dim": DIM}
    upsert_ann_batch(newb, out, meta)

    updated = emb.filter(~F.col("vec_id").isin([5, 6])).unionByName(newb)
    want = {(r["vec_id"], r["cluster"])
            for r in ivf_assign(updated, cent).collect()}
    stored = {(r["vec_id"], r["cluster"])
              for r in spark.read.parquet(out).collect()}
    assert stored == want and len(stored) == N


def test_delete_snapshots_pre_state_and_as_of_probe(spark, emb, tmp_path):
    """A delete freezes its pre-state: list_snapshots gains a version,
    as_of probes still return the deleted id with pre-delete ranks, the
    live probe doesn't, and expire_snapshots GCs the tree. Same undo
    contract as the fulltext index's mutations."""
    from search_engine_spark.operators.similarity import (
        delete_from_ann_index,
        hash_centroids,
        ivf_query_topk_disk,
        write_ivf_index,
    )
    from search_engine_spark.sources.index_store import (
        expire_snapshots,
        list_snapshots,
    )

    out = str(tmp_path / "ivf_snap")
    cent = hash_centroids(DIM, 8)
    write_ivf_index(emb, out, dim=DIM, centroids=cent)
    import json as _json
    with open(os.path.join(out, "_ann_meta.json"), "w") as fh:
        _json.dump({"method": "ivf", "dim": DIM}, fh)
    q = [float(x) for x in _vecs()[17]]
    pre = [(r["vec_id"], r["cosine"])
           for r in ivf_query_topk_disk(emb, out, q, k=5).collect()]
    assert pre[0][0] == 17

    delete_from_ann_index(spark, out, [17])
    snaps = list_snapshots(out)
    assert len(snaps) == 1 and "pre-delete" in snaps[0]["note"]
    v = snaps[0]["version"]

    live = [(r["vec_id"], r["cosine"])
            for r in ivf_query_topk_disk(emb, out, q, k=5).collect()]
    assert all(i != 17 for i, _ in live)
    old = [(r["vec_id"], r["cosine"])
           for r in ivf_query_topk_disk(emb, out, q, k=5, as_of=v).collect()]
    assert old == pre  # time travel: exact pre-delete ranking

    # no-op delete (absent id) must not burn a snapshot version
    delete_from_ann_index(spark, out, [10**9])
    assert len(list_snapshots(out)) == 1

    assert expire_snapshots(out, keep_last=0) == [v]
    assert list_snapshots(out) == []
    # live index unaffected by the GC (hardlink refcounts, not copies)
    assert [(r["vec_id"], r["cosine"])
            for r in ivf_query_topk_disk(emb, out, q, k=5).collect()] == live


def test_rebuild_refits_centroids_preserving_snapshots(spark, emb, tmp_path):
    """rebuild_ivf_index re-fits k-means over the current corpus and
    swaps the data in WITHOUT touching _snapshots or _ann_meta.json; the
    result is identical to a from-scratch k-means build of the same
    corpus; the pre-rebuild state stays probe-able via as_of."""
    from search_engine_spark.operators.similarity import (
        hash_centroids,
        ivf_query_topk_disk,
        rebuild_ivf_index,
        write_ivf_index,
    )
    from search_engine_spark.sources.index_store import list_snapshots

    out = str(tmp_path / "ivf_rb")
    cent0 = hash_centroids(DIM, 8)
    write_ivf_index(emb, out, dim=DIM, centroids=cent0)
    import json as _json
    with open(os.path.join(out, "_ann_meta.json"), "w") as fh:
        _json.dump({"method": "ivf", "dim": DIM, "n_clusters": 8}, fh)
    q = [float(x) for x in _vecs()[22]]
    pre = [(r["vec_id"], r["cosine"])
           for r in ivf_query_topk_disk(emb, out, q, k=5).collect()]

    cent1 = rebuild_ivf_index(emb, out, n_clusters=8)
    assert cent1.shape == (8, DIM)
    assert not np.allclose(cent1, cent0)  # actually re-fit

    # fresh k-means build of the same corpus == the rebuilt index
    fresh = str(tmp_path / "ivf_fresh")
    cent2 = write_ivf_index(emb, fresh, dim=DIM, n_clusters=8)
    np.testing.assert_allclose(cent1, cent2)
    stored = {(r["vec_id"], r["cluster"])
              for r in spark.read.parquet(out).collect()}
    want = {(r["vec_id"], r["cluster"])
            for r in spark.read.parquet(fresh).collect()}
    assert stored == want and len(stored) == N

    # meta survived the swap; snapshot holds the pre-rebuild state
    assert read_ann_meta(out)["method"] == "ivf"
    snaps = list_snapshots(out)
    assert len(snaps) == 1 and "pre-rebuild" in snaps[0]["note"]
    old = [(r["vec_id"], r["cosine"])
           for r in ivf_query_topk_disk(
               emb, out, q, k=5, as_of=snaps[0]["version"]).collect()]
    assert old == pre


def test_upsert_bulk_batch_refused(spark, ivf_stream):
    """A bulk re-embed upsert beyond the IN-list bound fails loudly
    BEFORE touching the index, pointing at max_files_per_batch."""
    from search_engine_spark.streaming.ann_refresh import upsert_ann_batch

    _, index_dir, _ = ivf_stream
    big = spark.range(20_001).selectExpr(
        "id AS vec_id", "array(CAST(1.0 AS DOUBLE)) AS embedding"
    )
    with pytest.raises(ValueError, match="max_files_per_batch"):
        upsert_ann_batch(big, index_dir, {"method": "ivf"})


def test_federated_ann_topk(spark, emb, tmp_path):
    """Two shard indexes (one IVF, one SRP — heterogeneous fleet)
    federate: the planted nearest neighbor is found in whichever shard
    holds it, scores are absolute cosines, ids namespaced by shard."""
    from search_engine_spark.operators.similarity import (
        federated_ann_topk,
        hash_centroids,
        write_ivf_index,
        write_srp_index,
    )

    v = _vecs()
    a_emb = emb.filter(F.col("vec_id") < 60)
    b_emb = emb.filter(F.col("vec_id") >= 60)
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    write_ivf_index(a_emb, a_dir, dim=DIM, centroids=hash_centroids(DIM, 8))
    with open(os.path.join(a_dir, "_ann_meta.json"), "w") as fh:
        json.dump({"method": "ivf", "dim": DIM}, fh)
    write_srp_index(b_emb, b_dir, dim=DIM, n_planes=8, n_tables=3)
    with open(os.path.join(b_dir, "_ann_meta.json"), "w") as fh:
        json.dump({"method": "srp", "dim": DIM, "n_planes": 8,
                   "n_tables": 3, "group_bits": 5}, fh)

    shards = [(a_emb, a_dir), (b_emb, b_dir)]
    # query = vector 80 (lives in shard 1) → its own id must top the list
    hits = federated_ann_topk(
        shards, [float(x) for x in v[80]], k=6, n_probe=4,
        multiprobe_hamming=2,
    ).collect()
    assert hits[0]["shard"] == 1 and hits[0]["vec_id"] == 80
    assert abs(hits[0]["cosine"] - 1.0) < 1e-6
    # query = vector 10 (shard 0) → found there
    hits = federated_ann_topk(shards, [float(x) for x in v[10]], k=6).collect()
    assert hits[0]["shard"] == 0 and hits[0]["vec_id"] == 10
    # cosines non-increasing across the merged list
    cs = [h["cosine"] for h in hits]
    assert cs == sorted(cs, reverse=True)


def test_pq_stream_refresh(spark, emb, tmp_path):
    """Streaming drain over the IVF-PQ family: new files are encoded
    with the persisted model and folded partition-bounded; the
    refreshed index answers codes-only probes exactly like a one-shot
    full build."""
    from search_engine_spark.operators.similarity import (
        hash_centroids,
        ivfpq_query_topk_disk,
        write_ivfpq_index,
    )

    index_dir = str(tmp_path / "pq")
    input_dir = str(tmp_path / "incoming")
    cent = hash_centroids(DIM, 8)
    write_ivfpq_index(
        emb.filter(F.col("vec_id") < 90), index_dir, dim=DIM,
        centroids=cent,
    )
    meta = {"method": "pq", "dim": DIM, "n_clusters": 8, "m": 8, "ks": 16}
    with open(os.path.join(index_dir, "_ann_meta.json"), "w") as fh:
        json.dump(meta, fh)
    emb.filter(F.col("vec_id") >= 90).write.mode("overwrite").parquet(
        input_dir
    )
    incremental_ann_refresh(spark, input_dir, index_dir)

    full_dir = str(tmp_path / "pq_full")
    write_ivfpq_index(emb, full_dir, dim=DIM, centroids=cent)
    q = [float(x) for x in _vecs()[103]]
    got = [(r["vec_id"], r["qdot"])
           for r in ivfpq_query_topk_disk(spark, index_dir, q, k=8,
                                          n_probe=8).collect()]
    want = [(r["vec_id"], r["qdot"])
            for r in ivfpq_query_topk_disk(spark, full_dir, q, k=8,
                                           n_probe=8).collect()]
    assert got == want and got
