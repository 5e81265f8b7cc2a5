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
    # checkpoint the edge frame ONCE: every iteration joins it, and an
    # expensive upstream lineage (TextRank's corpus tokenize+aggregate)
    # must not re-execute per round
    e = edges.select(
        F.col(src_col).alias("_es"), F.col(dst_col).alias("_ed")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("_es").alias("node"))
        .unionByName(e.select(F.col("_ed").alias("node")))
        .distinct()
    ).localCheckpoint(eager=True)
    deg = e.groupBy("_es").agg(
        F.count("*").alias("_deg")
    ).localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        # schema-preserving empty frame (node type follows the edges —
        # long user ids, string lemmas, ...)
        return nodes.withColumn("rank", F.lit(0.0))
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


def textrank_keywords(
    docs: DataFrame,
    top_n: int = 20,
    iters: int = 5,
    damping: float = 0.85,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    PageRank over the corpus-level word co-occurrence graph — lemmas
    are nodes, ADJACENT lemma pairs (window 2, the collocations
    stream) are symmetric edges, and a lemma's rank is its structural
    centrality in the corpus vocabulary; the top-n ranked lemmas are
    the corpus keywords. The graph-centrality complement to RAKE's
    degree/frequency scores and PMI's association scores — all three
    ride the same one-tokenize bigram stream.

    ``min_count`` bounds the graph: only pairs seen at least that
    often become edges (vocabulary-bounded by construction, so the
    whole PageRank loop runs over a frame the size of the DICTIONARY,
    not the corpus — at 100 TB the edge list still fits comfortably).

    Returns (lemma, rank) ordered (rank desc, lemma asc), rank rounded
    to 6 decimals — :func:`pagerank`'s decimal-grid contract makes the
    unrolled DuckDB twin hash-exact."""
    from search_engine_spark.functions.text import lemmas_sql

    pairs = (
        docs.selectExpr(f"{lemmas_sql(text_col)} AS _ls")
        # the size guard must come BEFORE sequence(): sequence(1, 0)
        # steps DOWN to [1, 0] and the out-of-range index is a hard
        # ANSI error (the shingles_over_tokens_expr lesson)
        .filter(F.size("_ls") >= 2)
        .selectExpr(
            "explode(transform(sequence(1, size(_ls) - 1), "
            "i -> struct(_ls[i - 1] AS a, _ls[i] AS b))) AS p"
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= int(min_count))
        .select("a", "b")
    )
    # symmetric, distinct: the undirected TextRank graph
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .distinct()
    )
    ranked = pagerank(edges, damping=damping, iters=iters)
    return (
        ranked.select(F.col("node").alias("lemma"), "rank")
        .orderBy(F.col("rank").desc(), F.col("lemma").asc())
        .limit(int(top_n))
    )
