"""Graph analytics over derived interaction graphs — PageRank.

Connected components (the dedup keeper machinery) lives in
operators/dedup.py; this module adds the other canonical iterative
DataFrame algorithm, with the same hard-won execution rule: EVERY
round localCheckpoints, because a loop that references the prior
frame more than once doubles the logical plan per round and Catalyst
ANALYSIS goes exponential even under persist() (measured in round 3 —
see CLAUDE.md).

PageRank float contract (DuckDB oracle parity): per-edge
contributions are rounded to the 1e-10 grid and summed as
DECIMAL(28,10) — order-independent — and each round's rank is
re-rounded to 1e-10, so five unrolled CTE iterations in DuckDB
reproduce the Spark loop bit-for-bit.

Scale shape: ranks and degrees are node-bounded frames; each
iteration is one edges⋈rank join + one groupBy(dst) — the standard
distributed PageRank step (shuffle keyed on node id; skew follows
in-degree, salting applies as usual). The dangling-mass term is a
1-row aggregate crossJoined back (never collected).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_DECIMALS = 10


def event_handoff_edges(events: DataFrame) -> DataFrame:
    """(src, dst) DISTINCT user handoff edges: user A → user B when
    B's event immediately follows A's in the same calendar day's
    stream ((ts, event_id) order — deterministic under ts ties).
    The lag window is DAY-PARTITIONED on purpose: at 100 TB the
    global event order is never materialized; each day's partition
    sorts independently (the date_histogram partitioning)."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.to_date("ts")).orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        events.select(
            F.lag("user_id").over(w).alias("src"),
            F.col("user_id").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iters`` synchronous PageRank rounds over
    the directed ``edges`` frame. Nodes = every id appearing as src or
    dst; uniform init 1/N; dangling nodes (no out-edges) redistribute
    their mass uniformly each round — the textbook formulation
    (Brin & Page 1998), fixed iteration count for determinism (no
    convergence test, so both engines run the identical computation).

    rank_{i+1}(v) = (1−d)/N + d·(Σ_{u→v} rank_i(u)/deg(u) + D_i/N)

    with each contribution rounded to 1e-10 and decimal-summed, and
    each round's rank re-rounded to 1e-10. Output rank is rounded to
    6 decimals. ``iters`` is small by design — PageRank at this
    damping is near-converged in a handful of rounds and every round
    is one shuffle."""
    e = edges.select(
        F.col(src_col).alias("_es"), F.col(dst_col).alias("_ed")
    )
    nodes = (
        e.select(F.col("_es").alias("node"))
        .unionByName(e.select(F.col("_ed").alias("node")))
        .distinct()
    ).localCheckpoint(eager=True)
    deg = e.groupBy("_es").agg(F.count("*").alias("_deg"))
    n = nodes.count()
    if n == 0:
        return edges.sparkSession.createDataFrame(
            [], "node long, rank double"
        )
    d = float(damping)
    rank = nodes.select(
        "node",
        F.round(F.lit(1.0) / F.lit(float(n)), PR_DECIMALS).alias("rank"),
    ).localCheckpoint(eager=True)
    zero_dec = F.lit(0).cast("decimal(28,10)")
    for _ in range(int(iters)):
        contrib = (
            e.join(rank.withColumnRenamed("node", "_es"), "_es")
            .join(deg, "_es")
            .select(
                F.col("_ed").alias("node"),
                F.round(F.col("rank") / F.col("_deg").cast("double"),
                        PR_DECIMALS).cast("decimal(28,10)").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        dang = (
            rank.join(deg.withColumnRenamed("_es", "node"), "node",
                      "left_anti")
            .agg(F.coalesce(
                F.sum(F.col("rank").cast("decimal(28,10)")), zero_dec
            ).alias("_dang"))
        )
        rank = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                F.round(
                    F.lit((1.0 - d) / float(n))
                    + F.lit(d)
                    * (F.coalesce(F.col("_s"), zero_dec).cast("double")
                       + F.col("_dang").cast("double") / F.lit(float(n))),
                    PR_DECIMALS,
                ).alias("rank"),
            )
        ).localCheckpoint(eager=True)  # the CC lesson: checkpoint EVERY round
    return rank.select("node", F.round("rank", 6).alias("rank"))
