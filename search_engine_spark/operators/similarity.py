"""Similarity search over an embedding column (array<float>).

Two paths:
- brute-force cosine top-k: exact baseline, JVM-side arithmetic via
  higher-order functions (zip_with product + aggregate sum) — correct at
  any scale but O(N) per query; fine for reranking / small candidate sets.
- LSH-bucketed ANN: sign-random-projection buckets; query probes only
  its bucket(s). The 100 TB path: index once (one narrow shuffle), probe
  cost O(bucket size). Deterministic hyperplanes derived from xxhash64 so
  index and query sides agree without shipping a model.

Embedding cosine near-dup pairs (dedup use-case) also lives here since it
shares the machinery.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

COS_DECIMALS = 6


def _dot_sql(a: str, b: str, dim: int | None = None) -> str:
    """Sequential left-fold dot product — same accumulation order as the
    DuckDB oracle's list arithmetic (cross-engine float parity).

    With ``dim`` known, the fold is unrolled into a left-associative
    arithmetic expression (identical IEEE accumulation order: 0 + p0 is
    exactly p0, and SQL ``+`` is left-associative); a single unrolled
    64-dim dot whole-stage-codegens and beats the interpreted
    ``aggregate``/``zip_with`` lambda ~20×. ANSI mode turns a
    shorter-than-dim array into a hard INVALID_ARRAY_INDEX error rather
    than a silent wrong answer.

    DO NOT build expressions containing MANY unrolled dots (per-centroid
    dot arrays, multi-plane bucket sums): past ~2-4 unrolled 64-dim dots
    the generated Java method exceeds Janino's 64 KB limit ("Code grows
    beyond 64 KB"), Spark silently falls back to interpreting the whole
    stage, and the giant node-per-term tree is ~8× SLOWER than the
    single-node lambda (measured round 2). Multi-dot paths use the
    Arrow-batched numpy fold (:func:`_pair_dot`, :func:`_bucket_udf`,
    :func:`ivf_assign`) which keeps the identical left-fold order."""
    if dim is not None:
        return " + ".join(
            f"(cast({a}[{i}] as double) * cast({b}[{i}] as double))"
            for i in range(dim)
        )
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _stack(vecs: pd.Series) -> np.ndarray:
    """Arrow batch of array<float|double> → (rows, dim) float64 matrix.
    float32→float64 widening is exact, matching _dot_sql's cast-to-double."""
    return np.stack([np.asarray(v, dtype=np.float64) for v in vecs.to_numpy()])


@F.pandas_udf(T.DoubleType())
def _pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
    """Dot product per row pair, vectorized across the Arrow batch with a
    scalar loop over DIMS only: acc = acc + a[:,i]*b[:,i]. Each row's
    accumulation is the exact left-fold order of _dot_sql / DuckDB
    list_dot_product (0 + p0 == p0; one rounded double multiply + add per
    term — numpy ufuncs round identically), so oracle hash parity holds
    bit-for-bit while the batch runs at numpy speed. This is the hot path
    of pair verification under BroadcastNestedLoopJoin, where Spark can't
    whole-stage-codegen anything and interpreted SQL dots cost ~20-50µs
    per 64-dim pair."""
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    ma, mb = _stack(a), _stack(b)
    acc = np.zeros(len(a), dtype=np.float64)
    for i in range(ma.shape[1]):
        acc = acc + ma[:, i] * mb[:, i]
    return pd.Series(acc)


def _norm_sql(a: str, dim: int | None = None) -> str:
    return f"sqrt({_dot_sql(a, a, dim)})"


def with_norm(
    embeddings: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    return embeddings.withColumn("_norm", F.expr(_norm_sql(vec_col, dim)))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: one scan, TakeOrderedAndProject (no shuffle
    beyond the final k-row merge).

    Zero-norm rows are excluded (cosine undefined; under Spark 4 ANSI
    mode the division would otherwise be a hard DIVIDE_BY_ZERO error)."""
    q = [float(x) for x in query_vec]
    qnorm = float(np.sqrt(np.dot(q, q)))
    if qnorm == 0.0:
        raise ValueError("query_vec must be non-zero (cosine undefined)")
    q_sql = "array(" + ", ".join(f"cast({x!r} as double)" for x in q) + ")"
    dim = len(q)
    scored = with_norm(embeddings, vec_col, dim).filter(F.col("_norm") > 0).withColumn(
        "cosine",
        F.round(
            F.expr(_dot_sql(vec_col, q_sql, dim))
            / (F.col("_norm") * F.lit(qnorm)),
            COS_DECIMALS,
        ),
    )
    return (
        scored.select(F.col(id_col), "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def filtered_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    predicate,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PRE-FILTERED exact kNN (the Elasticsearch/vector-DB "filtered
    kNN" semantics): cosine top-k among only the rows satisfying
    ``predicate`` (a Column, e.g. ``F.col("label") == 3``).

    Pre-filter (filter THEN rank) is the correct semantics — it always
    returns k qualifying neighbors when k exist. The tempting
    post-filter (rank globally, then drop non-matching) silently
    under-returns when the filter is selective. Plan: the predicate is
    applied before the distance computation, so Catalyst pushes it to
    the parquet scan (PushedFilters — a selective label reads a sliver
    of a label-partitioned store) and the exact scan cost is
    proportional to the FILTERED set, not the corpus. For bucketed ANN
    the same pre-filter composes with the probe's candidate read
    (filter the candidate frame before ranking)."""
    return brute_force_topk(
        embeddings.filter(predicate), query_vec, k=k,
        id_col=id_col, vec_col=vec_col,
    )


def mmr_rerank(
    candidates: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    rel_col: str = "cosine",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-Marginal-Relevance diversification of a top-n candidate
    page: greedily pick the item maximizing
    ``round(lam·rel − (1−lam)·max_sim_to_selected, 6)`` (tie → lower
    id), where pairwise sim is the 6-decimal-rounded exact cosine —
    the classic Carbonell-Goldstein re-rank that stops a result page
    from being k near-copies of the same hit.

    Distribution contract: the DISTRIBUTED work is producing the
    candidate page (any scorer — BM25, ANN, brute cosine) and the
    semi-join fetch of its k-bounded vectors; the greedy loop itself is
    inherently sequential over n ≤ a few hundred collected rows and
    runs driver-side in numpy — at 100 TB the candidate page is still
    top-n-sized, so this is the right split (same contract as
    wand_topk_tree's driver merge).

    Float parity (the reason this has a hard DuckDB oracle): pairwise
    dots accumulate with the dim-loop LEFT FOLD of `_pair_dot` — bit-
    identical to ``list_dot_product`` — norms/division/blend replicate
    the oracle's op order exactly, and both the per-pair sim and the
    final mmr are rounded to COS_DECIMALS before comparison, so the
    argmax sequence is engine-exact, not merely close. ``rel`` is
    consumed as given (already rounded by every scorer in this repo).

    Contract notes (review r3): ids must be integral (the selection
    arrays and the output schema are int64; a string-id table raises
    here instead of crashing in createDataFrame), and a candidate with
    no row in ``embeddings`` is NOT diversifiable — the join drops it
    and the page may come back shorter than k; callers re-ranking over
    a mutable vector store should treat a short page as "vectors were
    deleted since scoring", not as exhausted results.

    Returns (rank 1..k, id, mmr) in selection order."""
    spark = candidates.sparkSession
    id_type = candidates.schema[id_col].dataType.simpleString()
    if id_type not in ("bigint", "int", "smallint", "tinyint"):
        raise TypeError(
            f"mmr_rerank needs an integral {id_col} column, got {id_type}"
        )
    cand = candidates.select(
        F.col(id_col).alias("_id"), F.col(rel_col).cast("double").alias("_rel")
    )
    rows = (
        embeddings.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .join(F.broadcast(cand), "_id")
        .collect()
    )
    out_schema = f"rank int, {id_col} long, mmr double"
    if not rows:
        return spark.createDataFrame([], out_schema)
    rows.sort(key=lambda r: r["_id"])
    ids = np.array([r["_id"] for r in rows], dtype=np.int64)
    rel = np.array([r["_rel"] for r in rows], dtype=np.float64)
    mat = np.stack([np.asarray(r["_v"], dtype=np.float64) for r in rows])
    norms = np.zeros(len(rows), dtype=np.float64)
    for i in range(mat.shape[1]):  # left-fold == list_dot_product
        norms = norms + mat[:, i] * mat[:, i]
    norms = np.sqrt(norms)
    msim = np.zeros(len(rows), dtype=np.float64)  # max sim to selected
    taken = np.zeros(len(rows), dtype=bool)
    picks: list[tuple[int, int, float]] = []
    for rank in range(1, min(k, len(rows)) + 1):
        mmr = np.round(lam * rel - (1.0 - lam) * msim, COS_DECIMALS)
        mmr[taken] = -np.inf
        best = int(np.argmax(mmr))  # ids sorted asc → first max wins tie
        taken[best] = True
        picks.append((rank, int(ids[best]), float(mmr[best])))
        dots = np.zeros(len(rows), dtype=np.float64)
        bv = mat[best]
        for i in range(mat.shape[1]):
            dots = dots + mat[:, i] * bv[i]
        sim = np.round(dots / (norms * norms[best]), COS_DECIMALS)
        msim = np.maximum(msim, sim)
    return spark.createDataFrame(picks, out_schema)


def cosine_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """All pairs with cosine ≥ threshold — exact, via self-join.

    Quadratic by design (ground truth / small collections); the scale
    path is :func:`srp_neardup_pairs`, which prunes to same-bucket pairs.

    The N² pair stream must not collapse into one task: the broadcast
    nested-loop join inherits the left side's partitioning, and a small
    parquet scan is a single partition — so the left side is repartitioned
    to the session's parallelism (interpreted higher-order-function dots
    at ~50µs/pair make a single-task plan minutes-slow even at 2k
    vectors). Pass ``dim`` to unroll the dot into codegen arithmetic.

    Zero-norm vectors are excluded (cosine undefined; ANSI mode makes
    the division a hard error).
    """
    e = with_norm(embeddings, vec_col, dim).filter(F.col("_norm") > 0).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"), "_norm"
    )
    spark = embeddings.sparkSession
    a = e.repartition(spark.sparkContext.defaultParallelism).alias("a")
    b = e.alias("b")
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .withColumn(
            "cosine",
            F.round(
                _pair_dot(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a._norm") * F.col("b._norm")),
                COS_DECIMALS,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.vid").alias("vec_a"), F.col("b.vid").alias("vec_b"), "cosine")
    )


def srp_neardup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.42,
    n_planes: int = 6,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (the scale
    path for :func:`cosine_near_duplicates`).

    Candidates are pairs that collide in at least one SRP table (standard
    OR-amplification band join, same shape as MinHash-LSH in dedup.py);
    candidates are exact-verified with the rounded cosine. Cost is
    O(sum of bucket sizes squared) per table — never an all-pairs join —
    and at 100 TB the bucket join shuffles (table, bucket, id) triples
    only, with vectors joined back just for the surviving candidates.

    Recall is the standard SRP bound: a pair at cosine c collides per
    table with prob (1 - acos(c)/pi)^n_planes; raise n_tables (or lower
    n_planes) for more recall, exactly like the reference's lemma-bucket
    candidate generation. Deterministic hyperplanes → DuckDB-twin
    expressible (oracle replays the same bucket arithmetic on literals).

    Zero-norm vectors are excluded (cosine undefined; ANSI mode makes
    the division a hard error).
    """
    e = with_norm(embeddings, vec_col, dim).filter(F.col("_norm") > 0).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"), "_norm"
    )
    buckets = _with_table_buckets(e, dim, n_planes, n_tables, "vec", keep=["vid"])
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("va"), F.col("b.vid").alias("vb"))
        .distinct()
    )
    ea = e.select(
        F.col("vid").alias("va"), F.col("vec").alias("vec_a"),
        F.col("_norm").alias("norm_a"),
    )
    eb = e.select(
        F.col("vid").alias("vb"), F.col("vec").alias("vec_b"),
        F.col("_norm").alias("norm_b"),
    )
    return (
        cand.join(ea, "va").join(eb, "vb")
        .withColumn(
            "cosine",
            F.round(
                _pair_dot(F.col("vec_a"), F.col("vec_b"))
                / (F.col("norm_a") * F.col("norm_b")),
                COS_DECIMALS,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select(F.col("va").alias("vec_a"), F.col("vb").alias("vec_b"), "cosine")
    )


# ---------------------------------------------------------------------------
# Sign-random-projection LSH (scale path)
# ---------------------------------------------------------------------------
def _hyperplanes(dim: int, n_planes: int, table: int = 0) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: splitmix64 of
    (table, plane, dim) → uniform in [-1, 1). No RNG state; index and
    query sides always agree."""
    i = np.arange(n_planes, dtype=np.uint64)[:, None]
    j = np.arange(dim, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        x = (
            i * np.uint64(0x9E3779B97F4A7C15)
            + j * np.uint64(0xBF58476D1CE4E5B9)
            + np.uint64(42 + 1_000_003 * table)
        )
        x ^= x >> np.uint64(30)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return (x.astype(np.float64) / 2.0**63) - 1.0


def srp_bucket_expr(vec_col: str, dim: int, n_planes: int, table: int):
    """Column: bucket id = sign bits of <vec, plane_p> packed into a long,
    as a pure SQL expression (the shape the DuckDB oracle twin replays on
    literals). Uses the HOF fold, NOT the unrolled dot: n_planes unrolled
    64-dim dots in one expression blow Janino's 64 KB method limit and
    the whole stage falls back to interpretation (see _dot_sql). The fast
    engine path is :func:`_buckets_udf`."""
    planes = _hyperplanes(dim, n_planes, table)
    bits = []
    for p in range(n_planes):
        coeffs = "array(" + ", ".join(f"cast({c!r} as double)" for c in planes[p]) + ")"
        bits.append(
            f"(case when {_dot_sql(vec_col, coeffs)} >= 0 "
            f"then {1 << p} else 0 end)"
        )
    return F.expr(" + ".join(bits)).cast("long")


def _buckets_udf(dim: int, n_planes: int, n_tables: int):
    """pandas_udf: vector → array of n_tables SRP bucket ids, ONE Arrow
    pass for all tables (callers posexplode into (table, bucket) rows —
    one scan instead of n_tables unioned scans). Per-plane dots use the
    same batch-vectorized left-fold as :func:`_pair_dot`, so the sign
    bits match srp_bucket_expr / the DuckDB literal replay exactly."""
    plane_sets = [_hyperplanes(dim, n_planes, t) for t in range(n_tables)]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype="object")
        m = _stack(vecs)
        out = np.zeros((n, n_tables), dtype=np.int64)
        for t, planes in enumerate(plane_sets):
            for p in range(n_planes):
                acc = np.zeros(n, dtype=np.float64)
                row = planes[p]
                for i in range(dim):
                    acc = acc + m[:, i] * row[i]
                out[:, t] |= (acc >= 0).astype(np.int64) << p
        return pd.Series(list(out))

    return buckets


def _with_table_buckets(
    e: DataFrame, dim: int, n_planes: int, n_tables: int,
    vec_col: str, keep: list[str],
) -> DataFrame:
    """(keep..., table, bucket) rows: one vectorized bucket pass +
    posexplode, instead of n_tables unioned scans of the input."""
    b = _buckets_udf(dim, n_planes, n_tables)
    return e.select(
        *keep,
        F.posexplode(b(F.col(vec_col))).alias("table", "bucket"),
    )


def build_srp_index(
    embeddings: DataFrame, dim: int, n_planes: int = 8, n_tables: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table SRP index: one row per (vector, table) with that
    table's bucket id — OR-amplification (candidate if it collides in
    ANY table), the standard recall lever for sign-random-projection.

    Storage n_tables× the id column (vectors stored once per row here for
    simplicity; at scale store ids only and join back to the vector
    table). Repartitioned by (table, bucket) so one probe touches one
    partition-pruned slice. Bucket assignment is one vectorized Arrow
    pass for all tables + posexplode — one scan, not n_tables scans.
    NULL / zero-norm vectors are excluded (unusable for cosine probes;
    a NULL array would also crash the Arrow batch stack)."""
    e = with_norm(embeddings, vec_col, dim).filter(F.col("_norm") > 0)
    b = _buckets_udf(dim, n_planes, n_tables)
    out = e.select(
        F.col("*"), F.posexplode(b(F.col(vec_col))).alias("table", "bucket")
    )
    return out.repartition("table", "bucket")


def _query_signature(q: np.ndarray, n_planes: int, table: int) -> int:
    planes = _hyperplanes(len(q), n_planes, table)
    sig = 0
    for p in range(n_planes):
        acc = 0.0  # same left-fold order as _dot_sql for determinism
        for x, y in zip(q, planes[p]):
            acc += float(x) * float(y)
        if acc >= 0:
            sig |= 1 << p
    return sig


def _probe_condition(
    q: np.ndarray, n_planes: int, n_tables: int, multiprobe_hamming: int,
    group_shift: int | None = None,
) -> F.Column:
    """(table, bucket) predicate for the query's probe set — the query
    signature per table plus every bucket within Hamming distance
    ``multiprobe_hamming`` (Σ C(n_planes, i) probes per table; m=1 → 9
    buckets of 256 at 8 planes, m=2 → 37). With ``group_shift`` (the
    disk layout), an additional ``bgroup`` term is emitted so the
    PARTITION columns (table, bgroup) prune directories and the in-file
    ``bucket`` column prunes rows. (Round-3 fix: values ≥ 2 previously
    degraded silently to the 1-bit flip set.)"""
    from itertools import combinations

    cond = None
    for t in range(n_tables):
        sig = _query_signature(q, n_planes, t)
        probes = {int(sig)}
        for d in range(1, min(multiprobe_hamming, n_planes) + 1):
            for bits in combinations(range(n_planes), d):
                flip = 0
                for p in bits:
                    flip |= 1 << p
                probes.add(int(sig) ^ flip)
        c = (F.col("table") == t) & F.col("bucket").isin(sorted(probes))
        if group_shift is not None:
            groups = sorted({int(x) >> group_shift for x in probes})
            c = c & F.col("bgroup").isin(groups)
        cond = c if cond is None else (cond | c)
    return cond


def srp_query_topk(
    srp_index: DataFrame, query_vec: list[float], k: int = 10,
    n_planes: int = 8, n_tables: int = 4, multiprobe_hamming: int = 1,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: per table, probe the query's bucket plus buckets within
    Hamming distance ``multiprobe_hamming`` (1-bit flips), union
    candidates across tables, exact-rerank. Recall grows with n_tables
    and multiprobe; cost stays O(probed bucket sizes), never O(N).

    This variant filters an in-memory index DataFrame; the at-scale path
    is :func:`write_srp_index` + :func:`srp_query_topk_disk`, where the
    probe becomes a partition-pruned parquet read of id lists only."""
    q = np.asarray(query_vec, dtype=np.float64)
    cond = _probe_condition(q, n_planes, n_tables, multiprobe_hamming)
    cand = srp_index.filter(cond).dropDuplicates([id_col])
    return brute_force_topk(cand, [float(x) for x in q], k, id_col, vec_col)


def write_srp_index(
    embeddings: DataFrame, out_dir: str, dim: int,
    n_planes: int = 8, n_tables: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    group_bits: int = 5,
) -> None:
    """Persist the SRP index as (table, bucket-group) → (bucket, id)
    lists ONLY.

    The 100 TB layout: ``partitionBy(table, bgroup)`` directories of
    (bucket, id) rows, bucket-sorted within each file — the index costs
    n_tables × (one long + one small int) per vector (vectors are NOT
    duplicated per table), and a probe is a partition-pruned read of the
    probed GROUP directories plus a row-group-pruned ``bucket`` filter
    inside them (round-1 verdict: the OR-filter full scan was the
    scale-weak spot). Rerank joins the candidate ids back to the vector
    table. NULL / zero-norm vectors are excluded (see build_srp_index).

    Why groups, not one dir per bucket: dynamic-partition writes pay a
    fixed writer+commit cost PER DIRECTORY, so n_tables·2^n_planes dirs
    (1024 at the defaults) cost ~15 s even for a toy table — measured
    14.7 s at 1019 dirs vs ~2 s at 128. ``group_bits`` caps dirs at
    n_tables·2^group_bits while the sorted in-file ``bucket`` column
    keeps pruning exact via parquet min/max stats; raise it when bucket
    dirs grow past a few files each. The write also repartitions on the
    partition key first so each dir is written by exactly one task
    (otherwise every task opens a writer in every dir it touches)."""
    shift = max(n_planes - group_bits, 0)
    usable = with_norm(embeddings, vec_col, dim).filter(F.col("_norm") > 0)
    out = _with_table_buckets(
        usable, dim, n_planes, n_tables, vec_col, keep=[id_col]
    ).withColumn("bgroup", F.shiftright(F.col("bucket"), shift))
    (
        out.repartition("table", "bgroup")
        .sortWithinPartitions("bucket")
        .write.mode("overwrite")
        .partitionBy("table", "bgroup")
        .parquet(out_dir)
    )


def write_ivf_index(
    embeddings: DataFrame, out_dir: str, dim: int, n_clusters: int = 16,
    sample_size: int = 2048, id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: "np.ndarray | None" = None,
) -> "np.ndarray":
    """Persist the IVF index as ``partitionBy(cluster)`` id lists plus a
    ``_ivf_meta.json`` carrying the centroids (the query-side model —
    n_clusters·dim doubles, driver-sized by construction). The disk
    twin of :func:`build_ivf_index`, shaped like :func:`write_srp_index`:
    ids only, one directory per cluster, so a probe is a partition-
    pruned read of n_probe directories. Returns the centroids.

    Pass ``centroids`` (e.g. :func:`hash_centroids`) to skip the k-means
    fit and assign with :func:`ivf_assign` — the literal-replayable
    arithmetic the DuckDB equality oracle uses."""
    import json
    import os

    if centroids is not None:
        cent = np.asarray(centroids, dtype=np.float64)
        idx = ivf_assign(embeddings, cent, id_col=id_col, vec_col=vec_col)
    else:
        idx, cent = build_ivf_index(
            embeddings, dim=dim, n_clusters=n_clusters,
            sample_size=sample_size, id_col=id_col, vec_col=vec_col,
        )
    (
        idx.repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(out_dir)
    )
    meta = {
        "dim": dim,
        "n_clusters": int(cent.shape[0]),
        "centroids": [[float(x) for x in row] for row in cent],
    }
    # underscore prefix: parquet directory listing must ignore it
    meta_path = os.path.join(out_dir, "_ivf_meta.json")
    with open(meta_path + ".tmp", "w") as fh:
        json.dump(meta, fh)
    os.replace(meta_path + ".tmp", meta_path)
    return cent


def _swap_partition_dirs(
    combined: DataFrame, index_dir: str, partition_cols: list[str],
    affected: list[tuple], sort_col: str | None = None,
) -> None:
    """Replace ONLY the affected partition dirs of a partitioned ANN
    index with `combined` (which must be restricted to those partition
    values): one job writes the replacements to a HIDDEN sibling tmp
    dir, then each affected leaf dir is atomically swapped — untouched
    partitions' files are never read or rewritten (the same
    Iceberg-MERGE-shaped mutation bound as index_store._swap_buckets,
    whose dot-prefixed-sibling discipline this reuses: visible residue
    would be discovered as a bogus partition value)."""
    import shutil

    from search_engine_spark.sources.index_store import _swap_sibling

    tmp = os.path.join(
        os.path.dirname(index_dir.rstrip("/")),
        "." + os.path.basename(index_dir.rstrip("/")) + ".tmp_swap",
    )
    shutil.rmtree(tmp, ignore_errors=True)
    w = combined.repartition(*[F.col(c) for c in partition_cols])
    if sort_col is not None:
        w = w.sortWithinPartitions(sort_col)
    w.write.mode("overwrite").partitionBy(*partition_cols).parquet(tmp)
    # a previous delete-all left a flat empty placeholder (see below):
    # clear it before partition dirs return, or partition discovery
    # sees conflicting structures
    for f in os.listdir(index_dir):
        fp = os.path.join(index_dir, f)
        if os.path.isfile(fp) and (f.endswith(".parquet")
                                   or f == "_SUCCESS"):
            os.remove(fp)
    for values in affected:
        rel = os.path.join(
            *(f"{c}={v}" for c, v in zip(partition_cols, values))
        )
        src = os.path.join(tmp, rel)
        dst = os.path.join(index_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        old = _swap_sibling(dst, "old")
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(dst):
            os.replace(dst, old)
        if os.path.isdir(src):
            os.replace(src, dst)
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    if not any(
        "=" in d and os.path.isdir(os.path.join(index_dir, d))
        for d in os.listdir(index_dir)
    ):
        # the mutation emptied EVERY partition (delete of the whole
        # index): leave one flat empty parquet carrying the full schema
        # (partition cols as regular columns) so root reads keep
        # resolving — the placeholder is cleared by the next mutation
        # before partition dirs reappear (review r3)
        flat = tmp + "_flat"
        combined.limit(0).coalesce(1).write.mode("overwrite").parquet(flat)
        for f in os.listdir(flat):
            if f.endswith(".parquet") or f == "_SUCCESS":
                os.replace(os.path.join(flat, f),
                           os.path.join(index_dir, f))
        shutil.rmtree(flat, ignore_errors=True)


def _reject_duplicate_ids(
    index_dir: str, delta: DataFrame, id_col: str
) -> None:
    """Append-only contract: a vec_id already in the index means the
    caller wants an upsert (delete + re-add, which would have to touch
    the OLD assignment's partition too) — refuse loudly instead of
    silently double-serving the id from two lists. Cost: one ids-only
    column scan of the index, the price of a checked append; pass
    check_duplicates=False when the producer guarantees fresh ids."""
    spark = delta.sparkSession
    existing = spark.read.parquet(index_dir).select(id_col)
    dup = existing.join(
        F.broadcast(delta.select(id_col).distinct()), id_col
    ).limit(1).collect()
    if dup:
        raise ValueError(
            f"append: {id_col}={dup[0][0]} already indexed "
            "(append is insert-only; delete/rebuild to re-embed)"
        )


def append_ivf_index(
    embeddings_delta: DataFrame, index_dir: str,
    id_col: str = "vec_id", vec_col: str = "embedding",
    check_duplicates: bool = True,
) -> list[int]:
    """Fold NEW vectors into a :func:`write_ivf_index` directory without
    rebuilding it: assign the delta with the PERSISTED centroids (the
    model is frozen at build time — append never re-fits), then rewrite
    only the cluster partition dirs that received rows. Untouched
    clusters keep their exact files, so append cost is O(delta +
    affected clusters), not O(index). Returns the affected cluster ids.

    Result-identical to a from-scratch :func:`write_ivf_index` of the
    full corpus with the same centroids (pinned by test)."""
    cent = read_ivf_centroids(index_dir)
    delta = ivf_assign(
        embeddings_delta, cent, id_col=id_col, vec_col=vec_col
    ).localCheckpoint()
    if check_duplicates:
        _reject_duplicate_ids(index_dir, delta, id_col)
    spark = delta.sparkSession
    affected = sorted(
        int(r["cluster"]) for r in delta.select("cluster").distinct().collect()
    )
    if not affected:
        return []
    existing = (
        spark.read.parquet(index_dir)
        .filter(F.col("cluster").isin(affected))
        .select(id_col, "cluster")
    )
    combined = existing.unionByName(delta.select(id_col, "cluster"))
    _swap_partition_dirs(
        combined, index_dir, ["cluster"], [(c,) for c in affected]
    )
    return affected


def append_srp_index(
    embeddings_delta: DataFrame, index_dir: str, dim: int,
    n_planes: int = 8, n_tables: int = 4, group_bits: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    check_duplicates: bool = True,
) -> list[tuple[int, int]]:
    """SRP twin of :func:`append_ivf_index`: bucket the NEW vectors with
    the same deterministic hyperplanes (derived from (dim, n_planes,
    n_tables) — pass the parameters the index was written with, e.g.
    from the CLI's _ann_meta.json) and rewrite only the (table, bgroup)
    partition dirs that received rows, keeping the bucket-sorted in-file
    order the probe's row-group pruning relies on. Returns the affected
    (table, bgroup) pairs."""
    shift = max(n_planes - group_bits, 0)
    usable = with_norm(embeddings_delta, vec_col, dim).filter(
        F.col("_norm") > 0
    )
    delta = (
        _with_table_buckets(usable, dim, n_planes, n_tables, vec_col,
                            keep=[id_col])
        .withColumn("bgroup", F.shiftright(F.col("bucket"), shift))
        .localCheckpoint()
    )
    if check_duplicates:
        _reject_duplicate_ids(index_dir, delta, id_col)
    spark = delta.sparkSession
    affected = sorted(
        (int(r["table"]), int(r["bgroup"]))
        for r in delta.select("table", "bgroup").distinct().collect()
    )
    if not affected:
        return []
    pred = None
    for t, g in affected:
        leg = (F.col("table") == t) & (F.col("bgroup") == g)
        pred = leg if pred is None else (pred | leg)
    existing = (
        spark.read.parquet(index_dir)
        .filter(pred)
        .select("bucket", id_col, "table", "bgroup")
    )
    combined = existing.unionByName(
        delta.select("bucket", id_col, "table", "bgroup")
    )
    _swap_partition_dirs(
        combined, index_dir, ["table", "bgroup"], affected, sort_col="bucket"
    )
    return affected


def rebuild_ivf_index(
    embeddings: DataFrame, index_dir: str, n_clusters: int | None = None,
    sample_size: int = 2048, id_col: str = "vec_id", vec_col: str = "embedding",
    snapshot: bool = True,
) -> "np.ndarray":
    """Re-fit the IVF coarse quantizer over the CURRENT corpus and
    rewrite the index — the priced-O(index) remedy when the stats
    report's partition skew says the frozen centroids have drifted
    (appends assign with the build-time model and never re-fit).

    The fresh index is written to a hidden sibling dir first, then
    swapped in — a plain ``mode("overwrite")`` of ``index_dir`` would
    wipe ``_snapshots`` and the stream checkpoint along with the data.
    The pre-rebuild state is snapshotted by default (a bad re-fit, or a
    crash mid-swap, rolls back to ``as_of`` the last version).
    ``n_clusters`` defaults to the old model's count. Returns the new
    centroids."""
    import shutil

    old = read_ivf_centroids(index_dir)
    k = int(n_clusters) if n_clusters is not None else int(old.shape[0])
    dim = int(old.shape[1])
    if snapshot:
        from search_engine_spark.sources.index_store import create_snapshot

        create_snapshot(index_dir, note=f"pre-rebuild (k={k})")
    tmp = os.path.join(
        os.path.dirname(index_dir.rstrip("/")),
        "." + os.path.basename(index_dir.rstrip("/")) + ".tmp_rebuild",
    )
    shutil.rmtree(tmp, ignore_errors=True)
    cent = write_ivf_index(
        embeddings, tmp, dim=dim, n_clusters=k, sample_size=sample_size,
        id_col=id_col, vec_col=vec_col,
    )
    for name in list(os.listdir(index_dir)):
        if name.startswith((".", "_")) and name != "_ivf_meta.json":
            continue  # keep _snapshots / _ann_meta.json / checkpoint
        path = os.path.join(index_dir, name)
        (shutil.rmtree if os.path.isdir(path) else os.remove)(path)
    for name in os.listdir(tmp):
        os.replace(os.path.join(tmp, name), os.path.join(index_dir, name))
    shutil.rmtree(tmp, ignore_errors=True)
    return cent


def federated_ann_topk(
    shards: list,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    multiprobe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k across N shard indexes that stay separate — the vector
    twin of serving.federated_bm25_topk, and simpler: cosine is an
    ABSOLUTE metric (no corpus statistics in the score), so per-shard
    top-ks are comparable as-is and the global k is exactly the top-k
    of their union. Each shard is (embeddings_df, index_dir); the
    index's family and hashing parameters come from its _ann_meta.json,
    so heterogeneous fleets (IVF shard next to SRP shard) federate
    fine. Returns (shard, vec_id, cosine); ties (cosine, shard, id)
    asc — ids are per-shard namespaces."""
    import json

    per = []
    spark = None
    for i, (emb, index_dir) in enumerate(shards):
        spark = emb.sparkSession
        with open(os.path.join(index_dir, "_ann_meta.json")) as fh:
            meta = json.load(fh)
        if meta.get("method") == "ivf":
            hits = ivf_query_topk_disk(
                emb, index_dir, query_vec, k=k, n_probe=n_probe,
                id_col=id_col, vec_col=vec_col,
            )
        else:
            hits = srp_query_topk_disk(
                emb, index_dir, query_vec, k=k,
                n_planes=meta["n_planes"], n_tables=meta["n_tables"],
                group_bits=meta["group_bits"],
                multiprobe_hamming=multiprobe_hamming,
                id_col=id_col, vec_col=vec_col,
            )
        per.append(hits.withColumn("shard", F.lit(i).cast("int")))
    merged = per[0]
    for h in per[1:]:
        merged = merged.unionByName(h)
    return (
        merged.select("shard", id_col, "cosine")
        .orderBy(F.col("cosine").desc(), F.col("shard").asc(),
                 F.col(id_col).asc())
        .limit(k)
    )


def read_ivf_centroids(index_dir: str) -> "np.ndarray":
    import json
    import os

    with open(os.path.join(index_dir, "_ivf_meta.json")) as fh:
        return np.asarray(json.load(fh)["centroids"], dtype=np.float64)


def delete_from_ann_index(
    spark: SparkSession, index_dir: str, vec_ids: list[int],
    partition_cols: list[str] | None = None, id_col: str = "vec_id",
    snapshot: bool = True,
) -> list[tuple]:
    """Remove ids from a disk ANN index (either family) by rewriting
    ONLY the partition dirs that contain them — the delete twin of the
    appends, completing build/append/refresh/delete with the same
    O(affected partitions) mutation bound (the reference's single-page
    delete+reinsert, Parser.java:181-256, applied to vectors).

    Locating the ids costs one ids-only column scan (same price as the
    checked append — no stored vectors are needed, so this works even
    when the embedding rows are already gone, the usual reason for a
    delete). A partition whose rows are all deleted disappears from the
    directory tree (`_swap_partition_dirs` drops dirs with no
    replacement). Returns the affected partition keys; a no-op (none of
    the ids indexed) returns []. SRP indexes hold each id in n_tables
    partitions — all of them are cleaned.

    ``vec_ids`` is a driver-side list spliced into an IN predicate —
    right for mutation-sized deletes (up to ~10^4 ids); a bulk purge
    beyond that should join against an ids DataFrame instead (or
    rebuild). ``partition_cols`` defaults by sniffing the layout:
    ``[cluster]`` (IVF) vs ``[table, bgroup]`` (SRP). ``snapshot=True``
    freezes the
    pre-delete state as a hardlink-tree snapshot first (same undo
    contract as the fulltext index's mutations; the disk probes take
    ``as_of=`` to read one), skipped when the delete turns out to be a
    no-op."""
    if not vec_ids:
        return []
    ids = [int(i) for i in vec_ids]
    if partition_cols is None:
        entry = next(
            (d for d in sorted(os.listdir(index_dir)) if "=" in d), None
        )
        if entry is None:
            raise ValueError(f"{index_dir}: no partition dirs")
        partition_cols = (
            ["table", "bgroup"] if entry.startswith("table=") else ["cluster"]
        )
    full = spark.read.parquet(index_dir)
    hit = full.filter(F.col(id_col).isin(ids))
    affected = sorted(
        tuple(int(r[c]) for c in partition_cols)
        for r in hit.select(*partition_cols).distinct().collect()
    )
    if not affected:
        return []
    if snapshot:
        from search_engine_spark.sources.index_store import create_snapshot

        create_snapshot(index_dir, note=f"pre-delete of {len(ids)} ids")
    pred = None
    for values in affected:
        leg = None
        for c, v in zip(partition_cols, values):
            term = F.col(c) == v
            leg = term if leg is None else (leg & term)
        pred = leg if pred is None else (pred | leg)
    survivors = full.filter(pred).filter(~F.col(id_col).isin(ids))
    sort_col = "bucket" if "bucket" in full.columns else None
    _swap_partition_dirs(
        survivors, index_dir, partition_cols, affected, sort_col=sort_col
    )
    return affected


def ivf_query_topk_disk(
    embeddings: DataFrame, index_dir: str, query_vec: list[float],
    k: int = 10, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    as_of: int | None = None,
) -> DataFrame:
    """ANN top-k against a :func:`write_ivf_index` directory: the probe
    clusters are picked driver-side from the persisted centroids, the
    ``cluster`` predicate prunes PARTITION directories (plan-pinned),
    and the candidate ids broadcast-join back for the exact rerank —
    identical results to :func:`ivf_query_topk` on the same model.
    ``as_of=v`` probes snapshot v (centroids included — the meta is
    hardlinked into the snapshot tree) instead of the live index."""
    if as_of is not None:
        from search_engine_spark.sources.index_store import snapshot_path

        index_dir = snapshot_path(index_dir, as_of)
    spark = embeddings.sparkSession
    cent = read_ivf_centroids(index_dir)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (float(np.sqrt((q * q).sum())) or 1.0)
    dots = cent @ qn
    order = sorted(range(len(dots)), key=lambda c: (-dots[c], c))[:n_probe]
    cand_ids = (
        spark.read.parquet(index_dir)
        .filter(F.col("cluster").isin([int(c) for c in order]))
        .select(id_col)
    )
    cand = embeddings.join(F.broadcast(cand_ids), id_col)
    return brute_force_topk(cand, [float(x) for x in q], k, id_col, vec_col)


def _kmeans_centroids(
    sample: np.ndarray, k: int, iters: int = 10, seed: int = 7
) -> np.ndarray:
    """Deterministic k-means for the IVF coarse quantizer: splitmix-ish
    seeded init, fixed iteration count, pure numpy. Runs on a driver-side
    SAMPLE (a coarse quantizer needs only a sketch of the distribution —
    at 100 TB you sample ~100k vectors, never the full table)."""
    rs = np.random.RandomState(seed)
    cent = sample[rs.choice(sample.shape[0], size=k, replace=False)].copy()
    for _ in range(iters):
        d = sample @ cent.T  # cosine-ish assignment on normalized data
        assign = np.argmax(d, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if members.shape[0]:
                v = members.mean(axis=0)
                norm = float(np.sqrt((v * v).sum())) or 1.0
                cent[c] = v / norm
    return cent


def hash_centroids(dim: int, n_clusters: int, table: int = 101) -> np.ndarray:
    """Deterministic data-independent coarse quantizer: splitmix64-derived
    unit vectors (same generator as the SRP hyperplanes). Lower recall per
    probe than k-means centroids, but reproducible from (dim, n_clusters)
    alone — both the query side and the DuckDB differential oracle can
    replay the exact assignment arithmetic from literals, giving the IVF
    path a hard equality oracle (k-means quality is pytest-pinned via
    :func:`build_ivf_index` instead)."""
    c = _hyperplanes(dim, n_clusters, table)
    norms = np.sqrt((c * c).sum(axis=1))
    norms[norms == 0] = 1.0
    return c / norms[:, None]


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) assignment: one vectorized Arrow pass computing the
    per-centroid dots with the shared batch left-fold (exact same
    accumulation order as the DuckDB twin's list_dot_product on centroid
    literals) and taking the FIRST position of the max — np.argmax,
    DuckDB list_position(list_max) and Spark array_position(array_max)
    all agree on first-max. No shuffle; at scale this is a single narrow
    map over the vector table (write partitionBy("cluster") for
    partition-pruned probes, mirroring write_srp_index).

    Not a pure-SQL expression tree: n_clusters × dim unrolled terms blow
    Janino's 64 KB method limit and interpret ~25× slower (see _dot_sql).

    NULL / zero-norm vectors are excluded (no meaningful nearest centroid
    under cosine; a NULL array would also crash the Arrow batch stack) —
    mirrored by the DuckDB twin's norm predicate on its base CTE."""
    cent = np.asarray(centroids, dtype=np.float64)
    n_clusters, dim = cent.shape
    embeddings = with_norm(embeddings, vec_col, dim).filter(F.col("_norm") > 0)

    @F.pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype="int32")
        m = _stack(vecs)
        dots = np.empty((n_clusters, n), dtype=np.float64)
        for c in range(n_clusters):
            acc = np.zeros(n, dtype=np.float64)
            row = cent[c]
            for i in range(dim):
                acc = acc + m[:, i] * row[i]
            dots[c] = acc
        return pd.Series(np.argmax(dots, axis=0).astype(np.int32))

    return embeddings.select(
        F.col(id_col), assign(F.col(vec_col)).alias("cluster")
    )


def brute_force_topk_per_group(
    embeddings: DataFrame,
    query_vec: list[float],
    group_col: str,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k PER GROUP (per label/language/source shard) —
    the embedding twin of bm25_topk_per_scope: one scan scoring every
    vector, then a rank-over-window per group. Spark 4 pushes the
    rank <= k predicate into WindowGroupLimit, so each partition keeps
    a k-bounded heap per group instead of materializing the full sort —
    the property that makes "top-k similar per category" one pass at
    100 TB. Returns (group, id, cosine, rank), rank 1-based, ties by id
    asc (same cut rule as brute_force_topk)."""
    from pyspark.sql.window import Window

    q = [float(x) for x in query_vec]
    qnorm = float(np.sqrt(np.dot(q, q)))
    if qnorm == 0.0:
        raise ValueError("query_vec must be non-zero (cosine undefined)")
    q_sql = "array(" + ", ".join(f"cast({x!r} as double)" for x in q) + ")"
    dim = len(q)
    scored = (
        with_norm(embeddings, vec_col, dim)
        .filter(F.col("_norm") > 0)
        .withColumn(
            "cosine",
            F.round(
                F.expr(_dot_sql(vec_col, q_sql, dim))
                / (F.col("_norm") * F.lit(qnorm)),
                COS_DECIMALS,
            ),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, id_col, "cosine", "rank")
        .orderBy(group_col, "rank")
    )


def build_ivf_index(
    embeddings: DataFrame, dim: int, n_clusters: int = 16,
    sample_size: int = 2048, id_col: str = "vec_id", vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """IVF (inverted-file) ANN index: vectors are assigned to their
    nearest coarse centroid; a query probes only the closest n_probe
    cluster lists. The second scale path next to SRP-LSH (brief: "an IVF
    or LSH-bucketed variant"): assignment is one vectorized Pandas-UDF
    pass (matrix multiply per Arrow batch — no per-row Python), the
    index stores (cluster, vec_id) only, and at scale it is written
    partitionBy(cluster) for partition-pruned probes exactly like
    write_srp_index.

    Returns (assignments DataFrame, centroids) — centroids are the
    query-side model, deterministic given the corpus: the sample is the
    sample_size LOWEST ids (orderBy+limit = TakeOrderedAndProject, a
    k-bounded heap per partition — a bare limit() returns whichever
    partitions answer first, so "seeded" k-means still drifted across
    runs/partitionings), then fixed-iteration k-means. n_clusters is
    clamped to the sample size so a small corpus degrades to
    one-vector-per-cluster instead of crashing np.random.choice."""
    from pyspark.sql import types as T

    norm_sample = (
        with_norm(embeddings, vec_col, dim)
        .filter(F.col("_norm") > 0)
        .orderBy(id_col)
        .limit(sample_size)
        .select(vec_col, "_norm")
        .collect()
    )
    if not norm_sample:
        raise ValueError(
            "build_ivf_index: no vectors with non-zero norm to sample"
        )
    sample = np.array(
        [np.asarray(r[vec_col], dtype=np.float64) / float(r["_norm"])
         for r in norm_sample]
    )
    cent = _kmeans_centroids(sample, min(n_clusters, len(sample)))
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(cent)

    @F.pandas_udf(T.IntegerType())
    def assign_cluster(vecs: pd.Series) -> pd.Series:
        c = bc.value
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.sqrt((m * m).sum(axis=1))
        norms[norms == 0] = 1.0
        return pd.Series(np.argmax((m / norms[:, None]) @ c.T, axis=1).astype(np.int32))

    idx = embeddings.select(
        F.col(id_col), assign_cluster(F.col(vec_col)).alias("cluster")
    )
    return idx, cent


def ivf_query_topk(
    embeddings: DataFrame, ivf_index: DataFrame, centroids: np.ndarray,
    query_vec: list[float], k: int = 10, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: probe the n_probe clusters whose centroids are closest
    to the query, exact-rerank their members. Probe cost is
    O(n_probe/n_clusters) of the corpus; recall grows with n_probe."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (float(np.sqrt((q * q).sum())) or 1.0)
    dots = centroids @ qn
    # tie-stable probe order (dot desc, cluster asc) — matches the SQL twin
    order = sorted(range(len(dots)), key=lambda c: (-dots[c], c))[:n_probe]
    cand_ids = ivf_index.filter(
        F.col("cluster").isin([int(c) for c in order])
    ).select(id_col)
    cand = embeddings.join(cand_ids, id_col, "left_semi")
    return brute_force_topk(cand, [float(x) for x in q], k, id_col, vec_col)


def srp_query_topk_disk(
    embeddings: DataFrame, index_dir: str, query_vec: list[float], k: int = 10,
    n_planes: int = 8, n_tables: int = 4, multiprobe_hamming: int = 1,
    id_col: str = "vec_id", vec_col: str = "embedding",
    group_bits: int = 5, as_of: int | None = None,
) -> DataFrame:
    """ANN top-k against a :func:`write_srp_index` directory (pass the
    same ``group_bits`` it was written with).

    The (table, bgroup) predicate hits parquet PARTITION directories and
    the ``bucket`` predicate prunes row groups inside them (bucket-sorted
    files → exact min/max stats), so the scan touches only the probed
    groups (pinned by a plan test asserting PartitionFilters). Candidate
    ids are a tiny set → broadcast-joined back to the vector table for
    the exact rerank. ``as_of=v`` probes snapshot v (the pre-mutation
    state frozen by delete/upsert) instead of the live index."""
    if as_of is not None:
        from search_engine_spark.sources.index_store import snapshot_path

        index_dir = snapshot_path(index_dir, as_of)
    spark = embeddings.sparkSession
    q = np.asarray(query_vec, dtype=np.float64)
    cond = _probe_condition(
        q, n_planes, n_tables, multiprobe_hamming,
        group_shift=max(n_planes - group_bits, 0),
    )
    cand_ids = (
        spark.read.parquet(index_dir).filter(cond).select(id_col).distinct()
    )
    cand = embeddings.join(F.broadcast(cand_ids), id_col)
    return brute_force_topk(cand, [float(x) for x in q], k, id_col, vec_col)


# ---------------------------------------------------------------------------
# SQ8: scalar-quantized (uint8) similarity — the memory-bounded scale path
# ---------------------------------------------------------------------------
def sq8_params(
    embeddings: DataFrame, dim: int, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, 256/span) quantization parameters from ONE
    columnar aggregate over the table (the FAISS SQ8 'train' step).
    Driver-side output is 2·dim doubles — spliced as literals into both
    the Spark expression and the DuckDB oracle, so quantization is
    bit-identical across engines by construction (the SRP/IVF
    literal-replay pattern). A constant dimension (span 0) gets inv 0 —
    every value quantizes to code 0 and contributes nothing."""
    aggs = []
    for i in range(dim):
        v = f"cast(element_at({vec_col}, {i + 1}) as double)"
        aggs.append(F.expr(f"min({v})").alias(f"mn{i}"))
        aggs.append(F.expr(f"max({v})").alias(f"mx{i}"))
    row = embeddings.agg(*aggs).head()
    mins = [float(row[f"mn{i}"]) for i in range(dim)]
    invs = [
        (256.0 / (float(row[f"mx{i}"]) - mins[i]))
        if float(row[f"mx{i}"]) > mins[i] else 0.0
        for i in range(dim)
    ]
    return mins, invs


def _sq8_code_sql(v: str, mn: float, inv: float) -> str:
    """One dimension's uint8 code — shared TEXTUAL formula for Spark and
    DuckDB: clamp AFTER an explicit bigint floor so both engines do the
    identical double multiply, floor, and INTEGER clamp (Spark's floor
    returns bigint, DuckDB's returns double — the cast unifies them)."""
    return (
        f"least(255, greatest(0, cast(floor((cast({v} as double) - {mn!r}) "
        f"* {inv!r}) as bigint)))"
    )


def sq8_quantize_py(vec: list[float], mins: list[float], invs: list[float]) -> list[int]:
    """Python twin of :func:`_sq8_code_sql` for the query vector."""
    import math

    return [
        min(255, max(0, math.floor((float(v) - mn) * inv)))
        for v, mn, inv in zip(vec, mins, invs)
    ]


SQ8_W_SCALE = float(1 << 40)  # power of two: the scaling multiply is exact


def sq8_adc_weights_py(query_vec: list[float], invs: list[float]) -> list[int]:
    """Integer ADC weights W_d = floor(q_d/inv_d · 2⁴⁰ + 0.5) (0 for a
    constant dimension). floor(x + 0.5) is round-half-up — the one
    rounding rule Python, Spark, and DuckDB express identically (SQL
    round() and Python round() disagree on halves). The DuckDB twin
    recomputes this formula textually from the same double literals."""
    import math

    return [
        int(math.floor(float(q) / inv * SQ8_W_SCALE + 0.5)) if inv else 0
        for q, inv in zip(query_vec, invs)
    ]


def sq8_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    mins: list[float],
    invs: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k over uint8 scalar-quantized vectors — the scan
    you run when float embeddings don't fit the cluster's memory budget
    (4× smaller than float32; FAISS IndexScalarQuantizer SQ8).

    Ranking is ASYMMETRIC (ADC, the FAISS default): the FLOAT query
    scores each vector's decoded codes — dot(q, decode(x)) =
    Σ q_d·m_d (constant) + Σ (q_d/inv_d)·code_d — so ranking by the
    weighted code sum with weights w_d = q_d/inv_d is exact decoded-dot
    order. A symmetric quantized·quantized dot is NOT rank-safe here:
    expanding Σ inv²(x−m)(q−m) leaves a −Σ inv²·m_d·x_d bias whose
    per-dim weight (∝|m|) dominates the signal weight (∝|q_d|) for
    zero-centered data, collapsing recall to chance (measured 0.12 on
    clustered vectors before this fix; ≥0.9 after).

    Weights ride as integers W_d = floor(w_d·2⁴⁰ + 0.5) — 2⁴⁰ is a
    power of two so the scaling is exact, the same IEEE ops produce the
    same W_d in Python, Spark, and the DuckDB oracle, and the score
    stays an order-independent int64 (max |W|·255·dim ≪ 2⁶³).

    Plan: ONE scan, per-row O(dim) integer fold, TakeOrderedAndProject —
    no shuffle beyond the k-row merge, no Python. Scores are exact
    integers, so the DuckDB oracle hash-matches bit-for-bit. At 100 TB
    you'd persist the codes column once and scan uint8s; here the codes
    are computed in-flight to keep the operator self-contained.

    Returns (id_col, qdot) ordered qdot desc, id asc.
    """
    dim = len(query_vec)
    weights = sq8_adc_weights_py(query_vec, invs)
    codes = ", ".join(
        _sq8_code_sql(f"element_at({vec_col}, {i + 1})", mins[i], invs[i])
        for i in range(dim)
    )
    qlit = ", ".join(f"cast({w} as bigint)" for w in weights)
    dot = (
        f"aggregate(zip_with(array({codes}), array({qlit}), "
        f"(x, y) -> x * y), cast(0 as bigint), (acc, v) -> acc + v)"
    )
    return (
        embeddings.withColumn("qdot", F.expr(dot))
        .select(F.col(id_col), "qdot")
        .orderBy(F.col("qdot").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic deduplication via cluster-bounded cosine pairs
# ---------------------------------------------------------------------------
def _assign_with_cent_dot(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, cluster, cent_dot): nearest-centroid assignment PLUS the dot
    with that centroid, one vectorized Arrow pass (same per-centroid
    left-fold accumulation as :func:`ivf_assign`, so the DuckDB twin's
    ``list_dot_product`` on centroid literals replays it bit-for-bit).
    Keeps a ``_norm`` column for the caller's cosine division."""
    cent = np.asarray(centroids, dtype=np.float64)
    n_clusters, dim = cent.shape
    e = with_norm(embeddings, vec_col, dim).filter(F.col("_norm") > 0)

    @F.pandas_udf(T.StructType([
        T.StructField("cluster", T.IntegerType()),
        T.StructField("cent_dot", T.DoubleType()),
    ]))
    def assign(vecs: pd.Series) -> pd.DataFrame:
        n = len(vecs)
        if n == 0:
            return pd.DataFrame({"cluster": pd.Series([], dtype="int32"),
                                 "cent_dot": pd.Series([], dtype="float64")})
        m = _stack(vecs)
        dots = np.empty((n_clusters, n), dtype=np.float64)
        for c in range(n_clusters):
            acc = np.zeros(n, dtype=np.float64)
            row = cent[c]
            for i in range(dim):
                acc = acc + m[:, i] * row[i]
            dots[c] = acc
        best = np.argmax(dots, axis=0)
        return pd.DataFrame({
            "cluster": pd.Series(best.astype(np.int32)),
            "cent_dot": pd.Series(dots[best, np.arange(n)]),
        })

    return e.select(
        F.col(id_col), F.col(vec_col), F.col("_norm"),
        assign(F.col(vec_col)).alias("_a"),
    ).select(
        id_col, vec_col, "_norm",
        F.col("_a.cluster").alias("cluster"),
        F.col("_a.cent_dot").alias("cent_dot"),
    )


def semdedup_pairs(
    embeddings: DataFrame,
    dim: int,
    eps: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) candidate pairs:
    embeddings are clustered by nearest coarse centroid, and cosine is
    computed ONLY within a cluster — the published trick that turns the
    O(N²) semantic-near-dup search into O(N²/k) with negligible recall
    loss (semantic duplicates land in the same cluster by construction;
    the paper dedups LAION-scale corpora this way).

    Scale shape: the self-join shuffles on the cluster key, so cost is
    Σ per-cluster size² — at 100 TB you raise ``n_clusters`` so the
    expected cluster size stays bounded (SemDeDup uses k≈50k on LAION);
    a skewed giant cluster is the one hazard, handled the same way as a
    hot shingle (raise k, or cap-and-flag). Nothing here is all-pairs.

    ``centroids=None`` uses the deterministic :func:`hash_centroids`
    quantizer so the DuckDB oracle replays the exact assignment from
    literals (hard equality oracle, like `ivf_ann_topk`); pass k-means
    centroids from :func:`build_ivf_index` for production recall.

    Returns (vec_a, vec_b, cluster, cosine) with cosine rounded to 6
    decimals, pairs deduped by vec_a < vec_b. Reference analog: the
    pair-generation stage of the dedup family (SURVEY §2 LLM-ops);
    same verify arithmetic as :func:`cosine_near_duplicates`.
    """
    cent = hash_centroids(dim, n_clusters) if centroids is None else centroids
    v = _assign_with_cent_dot(embeddings, cent, id_col, vec_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
        "_norm", "cluster",
    )
    return _semdedup_pairs_from(v, eps)


def _semdedup_pairs_from(v: DataFrame, eps: float) -> DataFrame:
    """Cluster-bounded pair join over an already-assigned
    (vid, vec, _norm, cluster) frame — split out so semdedup_keepers
    can share ONE persisted assignment pass with the pair stage instead
    of re-running the Arrow assignment UDF on both join sides."""
    spark = v.sparkSession
    a = v.repartition(spark.sparkContext.defaultParallelism, "cluster").alias("a")
    b = v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .withColumn(
            "cosine",
            F.round(
                _pair_dot(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a._norm") * F.col("b._norm")),
                COS_DECIMALS,
            ),
        )
        .filter(F.col("cosine") >= eps)
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.col("a.cluster").alias("cluster"),
            "cosine",
        )
    )


def semdedup_keepers(
    embeddings: DataFrame,
    dim: int,
    eps: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup keeper selection: semantic-dup groups (transitive closure
    of :func:`semdedup_pairs`) keep the member with the LOWEST cosine to
    its cluster centroid — the paper's keep-farthest-from-centroid rule
    (retains the hardest / least prototypical example of each duplicate
    group; ties broken by min id). Docs in no pair keep themselves.

    Plan: pairs (cluster-bounded, above) → connected components (the
    size-gated union-find / label-propagation in dedup.py) → per-component
    argmin(cent_cos, id) via one window over the TINY component table →
    broadcast back onto the full id set. The assignment UDF output is
    PERSISTED and shared by the pair join (both sides), the cent_cos
    scoring, and the id projection — the Arrow pass over the corpus
    runs once, not ~4× (ADVICE r3). The cache is owned by the returned
    DataFrame's lineage (one-shot query shape, as elsewhere).

    Returns (vec_id, keeper_id, is_keeper) for every non-zero-norm row.
    """
    from search_engine_spark.operators.dedup import connected_components
    from pyspark.sql.window import Window

    cent = hash_centroids(dim, n_clusters) if centroids is None else centroids
    assigned = _assign_with_cent_dot(embeddings, cent, id_col, vec_col).persist()
    pairs = _semdedup_pairs_from(
        assigned.select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
            "_norm", "cluster",
        ),
        eps,
    )
    comp = connected_components(pairs, "vec_a", "vec_b")
    # cent_cos only needed for paired docs (the component table)
    scored = comp.join(
        assigned.select(
            F.col(id_col).alias("doc_id"),
            F.round(
                F.col("cent_dot") / F.col("_norm"), COS_DECIMALS
            ).alias("cent_cos"),
        ),
        "doc_id",
    )
    w = Window.partitionBy("component").orderBy(
        F.col("cent_cos").asc(), F.col("doc_id").asc()
    )
    per_doc = scored.select(
        "doc_id", F.first("doc_id").over(w).alias("keeper_id")
    )
    return (
        assigned.select(F.col(id_col).alias("vec_id"))
        .join(F.broadcast(per_doc), F.col("vec_id") == F.col("doc_id"), "left")
        .select(
            "vec_id",
            F.coalesce("keeper_id", F.col("vec_id")).alias("keeper_id"),
        )
        .withColumn("is_keeper", F.col("vec_id") == F.col("keeper_id"))
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ADC scan — FAISS IndexPQ analog
# ---------------------------------------------------------------------------

def pq_codebooks(
    dim: int, m: int = 8, ks: int = 16, table: int = 202
) -> np.ndarray:
    """Deterministic per-subspace codebooks, shape (m, ks, dim/m).

    The vector is split into ``m`` contiguous subspaces; each gets
    ``ks`` unit codewords from the splitmix64 generator (one table id
    per subspace). Data-independent like :func:`hash_centroids`, and
    for the same reason: both the query side and the DuckDB
    differential oracle replay the exact assignment arithmetic from
    literals, so the PQ MACHINERY (encode → ADC lookup ranking) gets a
    hard equality oracle. At 100 TB you would train k-means codebooks
    per subspace for recall — identical machinery, better centroids
    (the IVF path makes the same trade, documented at
    hash_centroids)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    dsub = dim // m
    return np.stack([hash_centroids(dsub, ks, table + s) for s in range(m)])


def _kmeans_l2(
    sample: np.ndarray, k: int, iters: int = 10, seed: int = 7
) -> np.ndarray:
    """Plain L2 k-means on a driver-side sample — the PQ codebook
    trainer (Jégou et al. 2011 §III: per-subspace k-means minimizes
    reconstruction MSE). Unlike :func:`_kmeans_centroids` the
    codewords are NOT renormalized: a PQ codeword must carry the
    subvector's magnitude or the ADC dot is systematically
    over/under-scaled (the exact failure the dirnorm ladder was built
    to dodge — measured recall 0.49 vs 0.53 for unit codewords on
    residuals). Deterministic: seeded init, fixed iterations,
    argmax(x·c − ‖c‖²/2) assignment (≡ argmin L2)."""
    rs = np.random.RandomState(seed)
    k = min(int(k), sample.shape[0])
    cent = sample[rs.choice(sample.shape[0], size=k, replace=False)].copy()
    for _ in range(iters):
        score = sample @ cent.T - 0.5 * (cent * cent).sum(axis=1)[None, :]
        assign = np.argmax(score, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if members.shape[0]:
                cent[c] = members.mean(axis=0)
    return cent


def pq_sample_parquet(
    sf_dir: str, sample_size: int = 2048,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> np.ndarray:
    """The canonical PQ training sample WITHOUT a SparkSession: the
    ``sample_size`` lowest-id non-zero vectors of
    ``{sf_dir}/embeddings.parquet``, read via pyarrow. Row-identical
    to the Spark-side ``with_norm(...).filter(>0).orderBy(id).limit``
    sample (ids are unique; the >0 norm filter is sign-exact under any
    summation order), so the Spark query path and the DuckDB oracle
    builder can train the SAME codebooks from the same bytes — the
    learned model flows to both engines as literals and the hash
    contract survives (VERDICT r4 "next #1"). A coarse quantizer /
    codebook only needs a sketch of the distribution: at 100 TB this
    stays a ~100k-row driver-side read."""
    import pyarrow.parquet as _pq

    tbl = _pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=[id_col, vec_col],
    )
    df = tbl.to_pandas().sort_values(id_col, kind="mergesort")
    out = []
    for v in df[vec_col]:
        arr = np.asarray(v, dtype=np.float64)
        if (arr != 0.0).any():
            out.append(arr)
        if len(out) == sample_size:
            break
    if not out:
        raise ValueError("pq_sample_parquet: no non-zero vectors")
    return np.array(out)


def _pq_spark_sample(
    embeddings: DataFrame, dim: int, sample_size: int = 2048,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> np.ndarray:
    """Spark-side twin of :func:`pq_sample_parquet`: the sample_size
    lowest-id non-zero RAW vectors (orderBy+limit =
    TakeOrderedAndProject — a k-bounded heap per partition, stable
    across partitionings; a bare limit() is not)."""
    rows = (
        with_norm(embeddings, vec_col, dim)
        .filter(F.col("_norm") > 0)
        .orderBy(id_col)
        .limit(sample_size)
        .select(vec_col)
        .collect()
    )
    if not rows:
        raise ValueError("_pq_spark_sample: no non-zero vectors")
    return np.array(
        [np.asarray(r[vec_col], dtype=np.float64) for r in rows]
    )


def pq_train_codebooks(
    sample: np.ndarray, m: int = 8, ks: int = 16,
    iters: int = 10, seed: int = 7,
    centroids: "np.ndarray | None" = None,
) -> np.ndarray:
    """Data-adapted per-subspace codebooks, shape (m, ks', dsub) with
    ks' = min(ks, len(sample)) — the recall path next to
    :func:`pq_codebooks`'s oracle path, mirroring build_ivf_index's
    `_kmeans_centroids` / `hash_centroids` dual exactly. ``sample`` is
    a driver-side matrix (use :func:`pq_sample_parquet` so Spark and
    oracle train identically). With ``centroids`` the codebooks are
    fit on COARSE RESIDUALS (sample − nearest centroid by argmax dot —
    the same assignment ivfpq_encode applies), i.e. IVF-PQ training.
    Pure numpy and deterministic, so both engines receive bit-identical
    codebook literals."""
    sample = np.asarray(sample, dtype=np.float64)
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    dsub = dim // m
    if centroids is not None:
        cent = np.asarray(centroids, dtype=np.float64)
        cl = np.argmax(sample @ cent.T, axis=1)
        sample = sample - cent[cl]
    return np.stack([
        _kmeans_l2(sample[:, s * dsub:(s + 1) * dsub], ks, iters, seed + s)
        for s in range(m)
    ])


def pq_halfsq(codebooks: np.ndarray) -> list[list[float]]:
    """Per-codeword L2 assignment biases ‖c‖²/2 as driver-side double
    literals: nearest-by-L2 over NON-unit codewords is
    argmax(x·c − ‖c‖²/2), and because both engines receive this exact
    double and apply it as ONE IEEE subtract after the shared-order
    dot fold, code assignment stays bit-identical cross-engine.
    Sequential Python fold — it only has to agree with itself."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, ks, dsub = cb.shape
    out: list[list[float]] = []
    for s in range(m):
        row = []
        for j in range(ks):
            acc = 0.0
            for i in range(dsub):
                acc += float(cb[s, j, i]) * float(cb[s, j, i])
            row.append(0.5 * acc)
        out.append(row)
    return out


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    biases: "list[list[float]] | None" = None,
) -> DataFrame:
    """(id, codes array<int>) — one vectorized Arrow pass, no shuffle.

    Unit codewords make nearest-by-L2 equal argmax-dot (‖c‖² is
    constant), so each subspace's code is FIRST-position-of-max over
    the per-codeword dots, accumulated in the shared batch left-fold
    order (bit-identical to the DuckDB twin's list_dot_product over
    the list_slice — same reasoning as ivf_assign). For TRAINED
    (non-unit) codebooks pass ``biases`` = :func:`pq_halfsq`: each dot
    gets one IEEE subtract of the shared ‖c‖²/2 literal, making the
    argmax a true nearest-by-L2 while keeping cross-engine
    bit-parity. Zero-norm vectors are excluded, mirroring every
    cosine path. At scale the codes column is persisted once (m bytes
    per vector at ks ≤ 256 — 32× smaller than float32 at m=8, dim=64)
    and scans read only it."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, ks, dsub = cb.shape
    dim = m * dsub
    bias = (np.asarray(biases, dtype=np.float64)
            if biases is not None else None)
    embeddings = with_norm(embeddings, vec_col, dim).filter(F.col("_norm") > 0)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype="object")
        mat = _stack(vecs)
        codes = np.empty((n, m), dtype=np.int32)
        for s in range(m):
            off = s * dsub
            dots = np.empty((ks, n), dtype=np.float64)
            for j in range(ks):
                acc = np.zeros(n, dtype=np.float64)
                cw = cb[s, j]
                for i in range(dsub):
                    acc = acc + mat[:, off + i] * cw[i]
                dots[j] = acc if bias is None else acc - bias[s, j]
            codes[:, s] = np.argmax(dots, axis=0).astype(np.int32)
        return pd.Series(list(codes))

    return embeddings.select(
        F.col(id_col), encode(F.col(vec_col)).alias("codes")
    )


def pq_adc_tables_py(
    query_vec: list[float], codebooks: np.ndarray
) -> list[list[int]]:
    """Integer ADC lookup tables T[s][j] = floor(q_sub·c_sj · 2⁴⁰ + .5).

    Same integer-exactness contract as sq8_adc_weights_py: the scale is
    a power of two, floor(x+0.5) is the one half-rounding Python /
    Spark / DuckDB express identically, and the summed score stays an
    order-independent int64 (|T|·m ≪ 2⁶³), so the oracle hash-matches
    bit-for-bit. The per-table dot is a sequential Python fold — it
    only needs to agree with ITSELF, since both engines receive T as
    literals."""
    import math

    cb = np.asarray(codebooks, dtype=np.float64)
    m, ks, dsub = cb.shape
    out = []
    for s in range(m):
        sub = [float(x) for x in query_vec[s * dsub:(s + 1) * dsub]]
        row = []
        for j in range(ks):
            acc = 0.0
            for i in range(dsub):
                acc += sub[i] * float(cb[s, j, i])
            row.append(int(math.floor(acc * SQ8_W_SCALE + 0.5)))
        out.append(row)
    return out


def pq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    biases: "list[list[float]] | None" = None,
    rerank_embeddings: DataFrame | None = None,
    rerank_factor: int = 4,
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance computation (ADC) —
    the classic memory-bound ANN scan (Jégou et al. 2011; FAISS
    IndexPQ): the FLOAT query builds one m×ks lookup table, and every
    vector is scored by m integer table lookups on its codes — no
    float math per row at all, 32× less memory than float32 at the
    default geometry.

    score = Σ_s T[s][code_s] ≈ dot(q, reconstruct(v))·2⁴⁰ — exact
    integer, so ranking is deterministic and the DuckDB twin (codebook
    + table literals) hash-matches. Plan: ONE scan (codes computed
    in-flight here to stay self-contained; persist pq_encode's output
    at scale and scan m bytes/vector), per-row O(m) integer adds,
    TakeOrderedAndProject — no shuffle beyond the k-row merge.

    With ``biases`` (trained codebooks: :func:`pq_halfsq`) encoding is
    nearest-by-L2; with ``rerank_embeddings`` the top k·rerank_factor
    ADC candidates are exactly reranked by cosine (the standard
    two-stage ADC → refine; returns (id, cosine) instead of (id,
    qdot)) — at scale the refine join touches k·factor rows of the
    vector table, not the corpus.

    Returns (id_col, qdot) ordered qdot desc, id asc."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, ks, dsub = cb.shape
    tables = pq_adc_tables_py(query_vec, cb)
    coded = pq_encode(embeddings, cb, id_col=id_col, vec_col=vec_col,
                      biases=biases)
    score = " + ".join(
        "element_at(array({lits}), element_at(codes, {s1}) + 1)".format(
            lits=", ".join(f"cast({t} as bigint)" for t in tables[s]),
            s1=s + 1,
        )
        for s in range(m)
    )
    cands = (
        coded.withColumn("qdot", F.expr(score))
        .select(F.col(id_col), "qdot")
        .orderBy(F.col("qdot").desc(), F.col(id_col).asc())
    )
    if rerank_embeddings is None:
        return cands.limit(k)
    pool = cands.limit(int(k) * int(rerank_factor)).select(id_col)
    exact = rerank_embeddings.join(F.broadcast(pool), id_col)
    return brute_force_topk(
        exact, [float(x) for x in query_vec], k, id_col, vec_col
    )



# ---------------------------------------------------------------------------
# IVF-PQ — coarse quantizer + direction/norm residual codes
# ---------------------------------------------------------------------------
# FAISS IndexIVFPQ analog under the engine's data-independent-codebook
# contract. A naive port (unit codewords on residuals) FAILS: residual
# subvector norms are ~0.05 while unit codewords pretend 1.0, so the
# overscaled ADC term swamps the correctly-scaled coarse term and
# recall lands BELOW raw PQ (measured 0.49 vs 0.71). K-means codebooks
# fix this by learning magnitudes; the deterministic equivalent here is
# DIRECTION × NORM product coding (the ScaNN/"PQ with norms" shape):
# each subspace stores a unit DIRECTION code (argmax residual dot, the
# scale-invariant assignment) plus a NORM-LEVEL code on a geometric
# ladder, and the ADC contribution is dot(q_sub, ĉ_dir)·level — an
# exact integer product of two 2²⁰-scaled int64s, so the oracle-hash
# contract survives intact.

PQ_LVL_SCALE = float(1 << 20)  # power of two: both factor scalings exact
PQ_N_LEVELS = 16


def pq_norm_levels(
    n_levels: int = PQ_N_LEVELS, lmax: float = 1.0, lmin: float = 0.005
) -> list[float]:
    """Geometric norm ladder, largest first: v_l = lmax·(lmin/lmax)^
    (l/(n−1)). Deterministic from the parameters alone — both engines
    receive the same double literals."""
    r = lmin / lmax
    return [
        float(lmax * r ** (l / (n_levels - 1))) for l in range(n_levels)
    ]


def ivfpq_encode(
    embeddings: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: list[float] | None = None,
    coding: str = "dirnorm",
    biases: "list[list[float]] | None" = None,
) -> DataFrame:
    """(id, cluster, codes): coarse-assign each vector, then code its
    RESIDUAL v − centroid[cluster] per subspace. Two codings:

    - ``"dirnorm"`` (deterministic-codebook oracle path): (direction,
      norm level) — ``codes`` has 2m entries: m direction codes then m
      level codes. Direction = first-position-of-max over unit-codeword
      dots on the residual (scale-invariant); level =
      first-position-of-min |‖r_sub‖ − v_l|.
    - ``"plain"`` (trained-codebook recall path — FAISS IndexIVFPQ
      proper): ``codes`` has m entries, each nearest-by-L2 over
      NON-unit k-means codewords via the ``biases`` (‖c‖²/2) literals
      — the codeword carries the residual's magnitude itself, so no
      norm ladder is needed.

    One vectorized Arrow pass, no shuffle; at scale persist
    partitionBy(cluster) for partition-pruned probes. Every fold
    (coarse dots, residual dots, the norm's self-dot) accumulates in
    the DuckDB twin's list_dot_product order."""
    cent = np.asarray(centroids, dtype=np.float64)
    cb = np.asarray(codebooks, dtype=np.float64)
    n_clusters, dim = cent.shape
    m, ks, dsub = cb.shape
    if m * dsub != dim:
        raise ValueError("codebook geometry does not cover dim")
    if coding not in ("dirnorm", "plain"):
        raise ValueError(f"unknown ivfpq coding {coding!r}")
    plain = coding == "plain"
    bias = (np.asarray(biases, dtype=np.float64)
            if biases is not None else None)
    lv = np.asarray(levels if levels is not None else pq_norm_levels(),
                    dtype=np.float64)
    n_lv = len(lv)
    embeddings = with_norm(embeddings, vec_col, dim).filter(F.col("_norm") > 0)

    out_t = T.StructType([
        T.StructField("cluster", T.IntegerType()),
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ])

    @F.pandas_udf(out_t)
    def encode(vecs: pd.Series) -> pd.DataFrame:
        n = len(vecs)
        if n == 0:
            return pd.DataFrame({"cluster": [], "codes": []})
        mat = _stack(vecs)
        dots = np.empty((n_clusters, n), dtype=np.float64)
        for c in range(n_clusters):
            acc = np.zeros(n, dtype=np.float64)
            row = cent[c]
            for i in range(dim):
                acc = acc + mat[:, i] * row[i]
            dots[c] = acc
        cl = np.argmax(dots, axis=0)
        res = mat - cent[cl]  # one IEEE subtract per element, both sides
        dirs = np.empty((n, m), dtype=np.int32)
        lvls = np.empty((n, m), dtype=np.int32)
        for s in range(m):
            off = s * dsub
            sdots = np.empty((ks, n), dtype=np.float64)
            for j in range(ks):
                acc = np.zeros(n, dtype=np.float64)
                cw = cb[s, j]
                for i in range(dsub):
                    acc = acc + res[:, off + i] * cw[i]
                sdots[j] = acc if bias is None else acc - bias[s, j]
            dirs[:, s] = np.argmax(sdots, axis=0).astype(np.int32)
            if plain:
                continue
            nacc = np.zeros(n, dtype=np.float64)
            for i in range(dsub):
                nacc = nacc + res[:, off + i] * res[:, off + i]
            norm_s = np.sqrt(nacc)
            dists = np.abs(norm_s[None, :] - lv[:, None])
            lvls[:, s] = np.argmin(dists, axis=0).astype(np.int32)
        codes = (list(dirs) if plain
                 else list(np.concatenate([dirs, lvls], axis=1)))
        return pd.DataFrame({
            "cluster": cl.astype(np.int32),
            "codes": codes,
        })

    enc = embeddings.select(
        F.col(id_col), encode(F.col(vec_col)).alias("_e")
    )
    return enc.select(
        id_col, F.col("_e.cluster").alias("cluster"),
        F.col("_e.codes").alias("codes"),
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: list[float] | None = None,
    coding: str = "dirnorm",
    biases: "list[list[float]] | None" = None,
    rerank_embeddings: DataFrame | None = None,
    rerank_factor: int = 4,
) -> DataFrame:
    """Probe-bounded residual-PQ scan (inner-product metric):
    dot(q, v) = dot(q, cᵢ) + dot(q, v − cᵢ) ≈ Q[cluster] + ADC(codes).
    ``"dirnorm"`` coding scores Q (2⁴⁰-scaled int) plus m exact int64
    PRODUCTS of the 2²⁰-scaled direction-dot and norm-level tables;
    ``"plain"`` (trained codebooks + ``biases``) scores Q plus m
    2⁴⁰-scaled dot-table lookups. Either way ranking is deterministic
    and the DuckDB twin hash-matches. The probe set is the top-n_probe
    clusters by the same sequential-fold dot both engines compute.

    Plan: one scan with a cluster-IN filter (partition pruning when
    codes are persisted partitionBy(cluster)), O(m) integer
    multiply-adds per surviving row, TakeOrderedAndProject."""
    cent = np.asarray(centroids, dtype=np.float64)
    cb = np.asarray(codebooks, dtype=np.float64)
    lv = levels if levels is not None else pq_norm_levels()
    probe, score = _ivfpq_query_model(query_vec, cent, cb, lv, n_probe,
                                      coding=coding)
    enc = ivfpq_encode(embeddings, cent, cb, id_col=id_col,
                       vec_col=vec_col, levels=levels, coding=coding,
                       biases=biases)
    cands = (
        enc.filter(F.col("cluster").isin(probe))
        .withColumn("qdot", F.expr(score))
        .select(F.col(id_col), "qdot")
        .orderBy(F.col("qdot").desc(), F.col(id_col).asc())
    )
    if rerank_embeddings is None:
        return cands.limit(k)
    pool = cands.limit(int(k) * int(rerank_factor)).select(id_col)
    exact = rerank_embeddings.join(F.broadcast(pool), id_col)
    return brute_force_topk(
        exact, [float(x) for x in query_vec], k, id_col, vec_col
    )


def _ivfpq_query_model(
    query_vec: list[float],
    cent: np.ndarray,
    cb: np.ndarray,
    lv: list[float],
    n_probe: int,
    coding: str = "dirnorm",
) -> tuple[list[int], str]:
    """(probe clusters, integer score SQL) for one query — the shared
    driver-side half of ivfpq_topk and the disk probe: sequential-fold
    coarse dots (oracle parity), 2⁴⁰-scaled Q table, then either the
    2²⁰-scaled direction-dot × level tables (``dirnorm``) or a single
    2⁴⁰-scaled dot table per subspace (``plain``)."""
    import math

    n_clusters, dim = cent.shape
    m, ks, dsub = cb.shape
    plain = coding == "plain"
    qdots = []
    for c in range(n_clusters):
        acc = 0.0
        for i in range(dim):
            acc += float(query_vec[i]) * float(cent[c, i])
        qdots.append(acc)
    probe = sorted(range(n_clusters), key=lambda c: (-qdots[c], c))[:n_probe]
    qterm = [int(math.floor(d * SQ8_W_SCALE + 0.5)) for d in qdots]
    dscale = SQ8_W_SCALE if plain else PQ_LVL_SCALE
    tdir: list[list[int]] = []
    for s in range(m):
        row = []
        for j in range(ks):
            acc = 0.0
            for i in range(dsub):
                acc += float(query_vec[s * dsub + i]) * float(cb[s, j, i])
            row.append(int(math.floor(acc * dscale + 0.5)))
        tdir.append(row)
    qlit = ", ".join(f"cast({t} as bigint)" for t in qterm)
    if plain:
        score = f"element_at(array({qlit}), cluster + 1) + " + " + ".join(
            "element_at(array({lits}), element_at(codes, {s1}) + 1)".format(
                lits=", ".join(f"cast({t} as bigint)" for t in tdir[s]),
                s1=s + 1,
            )
            for s in range(m)
        )
        return [int(c) for c in probe], score
    nv = [int(math.floor(float(v) * PQ_LVL_SCALE + 0.5)) for v in lv]
    nvlit = ", ".join(f"cast({t} as bigint)" for t in nv)
    score = f"element_at(array({qlit}), cluster + 1) + " + " + ".join(
        "element_at(array({lits}), element_at(codes, {s1}) + 1)"
        " * element_at(array({nvl}), element_at(codes, {l1}) + 1)".format(
            lits=", ".join(f"cast({t} as bigint)" for t in tdir[s]),
            nvl=nvlit,
            s1=s + 1,
            l1=m + s + 1,
        )
        for s in range(m)
    )
    return [int(c) for c in probe], score


def write_ivfpq_index(
    embeddings: DataFrame, out_dir: str, dim: int,
    n_clusters: int = 16, m: int = 8, ks: int = 16,
    centroids: "np.ndarray | None" = None,
    sample_size: int = 2048,
    id_col: str = "vec_id", vec_col: str = "embedding",
    codebooks: "np.ndarray | str | None" = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Persist an IVF-PQ index: (id, codes) rows ``partitionBy(cluster)``
    plus an ``_ivfpq_meta.json`` carrying centroids + codebooks +
    norm-level ladder (the full query-side model). Unlike the ids-only
    IVF/SRP dirs, a probe here needs NO join back to the vector table —
    the 2m-byte codes ARE the scan, which is the entire point of PQ at
    100 TB: the embedding table can live in cold storage while queries
    touch only n_probe directories of integer codes.

    ``centroids=None`` fits deterministic k-means on the lowest-id
    sample (build_ivf_index's model path — better residuals, no
    equality oracle); pass :func:`hash_centroids` for the
    literal-replayable arithmetic the oracle checks.

    ``codebooks``: ``None`` → the deterministic :func:`pq_codebooks`
    with dirnorm residual coding (the oracle path); ``"train"`` → fit
    per-subspace L2 k-means on the lowest-id sample's coarse RESIDUALS
    (:func:`pq_train_codebooks`) and use plain nearest-by-L2 coding —
    the recall default `jobs/ann.py --method pq` ships; or an explicit
    (m, ks, dsub) array (coded plain). The fitted model — codebooks
    and coding included — is persisted in the meta JSON, so appends
    and probes replay it exactly. Returns (centroids, codebooks)."""
    import json as _json

    if centroids is not None:
        cent = np.asarray(centroids, dtype=np.float64)
    else:
        _, cent = build_ivf_index(
            embeddings, dim=dim, n_clusters=n_clusters,
            sample_size=sample_size, id_col=id_col, vec_col=vec_col,
        )
    if codebooks is None:
        cb, coding = pq_codebooks(dim, m, ks), "dirnorm"
    elif isinstance(codebooks, str):
        if codebooks != "train":
            raise ValueError(f"unknown codebooks mode {codebooks!r}")
        sample = _pq_spark_sample(embeddings, dim, sample_size,
                                  id_col, vec_col)
        cb = pq_train_codebooks(sample, m=m, ks=ks, centroids=cent)
        coding = "plain"
    else:
        cb, coding = np.asarray(codebooks, dtype=np.float64), "plain"
    lv = pq_norm_levels()
    biases = pq_halfsq(cb) if coding == "plain" else None
    enc = ivfpq_encode(embeddings, cent, cb, id_col=id_col, vec_col=vec_col,
                       coding=coding, biases=biases)
    (
        enc.repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(out_dir)
    )
    meta = {
        "dim": dim,
        "n_clusters": int(cent.shape[0]),
        "m": int(cb.shape[0]),
        "ks": int(cb.shape[1]),
        "coding": coding,
        "centroids": [[float(x) for x in row] for row in cent],
        "levels": [float(x) for x in lv],
    }
    if coding == "plain":
        meta["codebooks"] = [
            [[float(x) for x in cw] for cw in sub] for sub in cb
        ]
    meta_path = os.path.join(out_dir, "_ivfpq_meta.json")
    with open(meta_path + ".tmp", "w") as fh:
        _json.dump(meta, fh)
    os.replace(meta_path + ".tmp", meta_path)
    return cent, cb


def read_ivfpq_meta(index_dir: str) -> dict:
    import json as _json

    with open(os.path.join(index_dir, "_ivfpq_meta.json")) as fh:
        meta = _json.load(fh)
    meta["centroids"] = np.asarray(meta["centroids"], dtype=np.float64)
    if "codebooks" in meta:
        meta["codebooks"] = np.asarray(meta["codebooks"], dtype=np.float64)
    return meta


def _ivfpq_model_from_meta(meta: dict) -> tuple:
    """(codebooks, coding, biases) from a persisted meta dict —
    pre-"coding" metas (round 4) are dirnorm with derived random
    codebooks; trained indexes carry the fitted codebooks inline."""
    coding = meta.get("coding", "dirnorm")
    cb = (meta["codebooks"] if "codebooks" in meta
          else pq_codebooks(meta["dim"], meta["m"], meta["ks"]))
    biases = pq_halfsq(cb) if coding == "plain" else None
    return cb, coding, biases


def append_ivfpq_index(
    embeddings_delta: DataFrame, index_dir: str,
    id_col: str = "vec_id", vec_col: str = "embedding",
    check_duplicates: bool = True,
) -> list[int]:
    """Fold NEW vectors into a :func:`write_ivfpq_index` directory:
    encode the delta with the PERSISTED model (frozen at build — append
    never re-fits) and rewrite only the cluster dirs that received
    rows; O(delta + affected clusters). Result-identical to a fresh
    build of the full corpus with the same model (test-pinned).
    Returns the affected cluster ids."""
    meta = read_ivfpq_meta(index_dir)
    cb, coding, biases = _ivfpq_model_from_meta(meta)
    delta = ivfpq_encode(
        embeddings_delta, meta["centroids"], cb,
        id_col=id_col, vec_col=vec_col, levels=meta["levels"],
        coding=coding, biases=biases,
    ).localCheckpoint()
    if check_duplicates:
        _reject_duplicate_ids(index_dir, delta, id_col)
    spark = delta.sparkSession
    affected = sorted(
        int(r["cluster"]) for r in delta.select("cluster").distinct().collect()
    )
    if not affected:
        return []
    existing = (
        spark.read.parquet(index_dir)
        .filter(F.col("cluster").isin(affected))
        .select(id_col, "codes", "cluster")
    )
    combined = existing.unionByName(delta.select(id_col, "codes", "cluster"))
    _swap_partition_dirs(
        combined, index_dir, ["cluster"], [(c,) for c in affected]
    )
    return affected


def ivfpq_query_topk_disk(
    spark: SparkSession, index_dir: str, query_vec: list[float],
    k: int = 10, n_probe: int = 4,
    id_col: str = "vec_id",
    as_of: int | None = None,
    rerank_embeddings: DataFrame | None = None,
    rerank_factor: int = 4,
) -> DataFrame:
    """Probe a persisted IVF-PQ index: partition-pruned read of the
    n_probe cluster dirs, integer ADC scoring on the codes alone — the
    vector table is NOT touched unless ``rerank_embeddings`` is given,
    in which case the top k·rerank_factor ADC candidates are exactly
    reranked by cosine (the standard two-stage refinement; returns
    (id, cosine) instead of (id, qdot)). ``as_of=v`` probes snapshot v.
    Scores are identical to :func:`ivfpq_topk` on the same model."""
    if as_of is not None:
        from search_engine_spark.sources.index_store import snapshot_path

        index_dir = snapshot_path(index_dir, as_of)
    meta = read_ivfpq_meta(index_dir)
    cb, coding, _ = _ivfpq_model_from_meta(meta)
    probe, score = _ivfpq_query_model(
        query_vec, meta["centroids"], cb, meta["levels"], n_probe,
        coding=coding,
    )
    cands = (
        spark.read.parquet(index_dir)
        .filter(F.col("cluster").isin(probe))
        .withColumn("qdot", F.expr(score))
        .select(F.col(id_col), "qdot")
        .orderBy(F.col("qdot").desc(), F.col(id_col).asc())
    )
    if rerank_embeddings is None:
        return cands.limit(k)
    pool = cands.limit(int(k) * int(rerank_factor)).select(id_col)
    exact = rerank_embeddings.join(F.broadcast(pool), id_col)
    return brute_force_topk(exact, [float(x) for x in query_vec], k, id_col)
