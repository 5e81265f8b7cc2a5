"""Distributed IR ranking-quality evaluation — nDCG / MRR / precision
/ recall over a (runs x qrels) join.

The reference engine exposes relevance numbers per result
(SearchService relevance columns; reference README "релевантность")
but has no offline evaluation loop; any team iterating on ranking
(BM25 parameters, boosts, synonyms, recency decay — everything
query.py grew this round) needs one. This is the trec_eval shape
re-expressed as two scans and one join:

- ``runs``:  (query_id, doc_id, rnk) — a ranked result list per query,
  1-based rank. :func:`query.bm25_topk_batch` produces exactly this
  for a whole query log in one postings pass.
- ``qrels``: (query_id, doc_id, rel) — graded relevance judgments,
  rel > 0 means relevant (TREC qrels file shape).

Metrics per query (all rounded to SCORE_DECIMALS for cross-engine
comparison):

- ``ndcg``      nDCG@k with LINEAR gain rel / log2(rank+1) (the
                trec_eval default, not the 2^rel-1 variant — pinned so
                the DuckDB twin is expression-identical).
- ``mrr``       reciprocal rank of the first rel>0 hit in the top-k,
                0.0 when none.
- ``precision`` rel>0 hits in the top-k / k.
- ``recall``    rel>0 hits in the top-k / total rel>0 judged docs,
                0.0 for queries with no relevant judgments.

Plan shape: the runs->qrels join broadcasts whichever side is small
(qrels are judgment files — human-bounded; runs are |queries| x k).
Both aggregates are single-shuffle partial-aggregated groupBys on
query_id; the ideal-DCG ranking is one window over the (tiny) rel>0
judgments. Everything is built-in codegen — no UDFs, no collect — so
the same job evaluates a 10^6-query click-log replay unchanged: the
scale axis is |queries|, and every stage partitions on query_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.operators.query import SCORE_DECIMALS


def ir_metrics(runs: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Per-query (query_id, ndcg, mrr, precision, recall) — see module
    docstring for definitions. Queries are reported iff they appear in
    ``runs``; judged-but-never-run queries are the caller's diff to
    take. ``rnk`` must be 1-based and unique per query (the contract
    :func:`query.bm25_topk_batch` pins)."""
    topk = runs.filter(F.col("rnk") <= int(k)).select(
        "query_id", "doc_id", F.col("rnk").cast("double").alias("rnk")
    )
    judged = qrels.select(
        "query_id", "doc_id", F.col("rel").cast("double").alias("rel")
    )
    hits = (
        topk.join(judged, ["query_id", "doc_id"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0.0)))
    )
    per = hits.groupBy("query_id").agg(
        F.sum(F.col("rel") / F.log2(F.col("rnk") + F.lit(1.0))).alias("dcg"),
        F.max(
            F.when(F.col("rel") > 0, F.lit(1.0) / F.col("rnk"))
        ).alias("mrr0"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias("hits"),
    )
    # ideal DCG: the same gain over the query's judgments sorted by
    # grade (tie order irrelevant — equal gains sum identically)
    w = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    )
    ideal = (
        judged.filter(F.col("rel") > 0)
        .withColumn("irnk", F.row_number().over(w).cast("double"))
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(
                    F.col("irnk") <= k,
                    F.col("rel") / F.log2(F.col("irnk") + F.lit(1.0)),
                )
            ).alias("idcg"),
            F.count("*").alias("n_rel"),
        )
    )
    return (
        per.join(ideal, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)),
                SCORE_DECIMALS,
            ).alias("ndcg"),
            F.round(
                F.coalesce(F.col("mrr0"), F.lit(0.0)), SCORE_DECIMALS
            ).alias("mrr"),
            F.round(F.col("hits") / F.lit(float(k)), SCORE_DECIMALS).alias(
                "precision"
            ),
            F.round(
                F.coalesce(F.col("hits") / F.col("n_rel"), F.lit(0.0)),
                SCORE_DECIMALS,
            ).alias("recall"),
        )
    )


def bm25_param_sweep(
    index,
    queries: dict[int, str],
    qrels: DataFrame,
    configs: list[tuple[float, float]],
    k: int = 10,
) -> DataFrame:
    """Grid-tune BM25's (k1, b) against judgments in ONE postings pass
    — the ranking-tuning loop :func:`ir_metrics` exists to serve,
    collapsed into a single job. A per-config rerun would scan the
    postings M times; here every config's per-posting weight rides the
    SAME IN-pruned scan as one extra column (the weight differs only
    in constants), the columns explode into (config_id, w) rows, and
    one (config, query, doc) aggregate + one rank window produce every
    config's full run list. M configs therefore cost one scan and one
    shuffle — the Spark-first shape for parameter search.

    nDCG@k uses :func:`ir_metrics`' exact gain expression
    (rel / log2(rank+1), linear trec_eval gain); the macro mean over
    queries sums 6-decimal-rounded per-query nDCGs as DECIMAL (exact,
    order-independent — the lm.py log-prob trick), so the result is
    engine/oracle hash-identical. AND match semantics, the engines'
    pinned (rounded score desc, doc_id asc) tie-break.

    Returns one row per config: (config_id, k1, b, mean_ndcg,
    n_queries), ordered by (mean_ndcg desc, config_id asc) — the
    winning parameters first."""
    from search_engine_spark.operators.index_build import (
        bm25_weight_col,
        idf_col,
    )
    from search_engine_spark.operators.query import parse_query

    spark = index.postings.sparkSession
    qlem: list[tuple[int, str]] = []
    arity: list[tuple[int, int]] = []
    for qid, text in sorted(queries.items()):
        lems = parse_query(text)
        if not lems:
            continue
        arity.append((int(qid), len(lems)))
        qlem.extend((int(qid), lem) for lem in lems)
    out_schema = ("config_id long, k1 double, b double, "
                  "mean_ndcg double, n_queries long")
    if not qlem or not configs:
        return spark.createDataFrame([], out_schema)
    all_lemmas = sorted({lem for _, lem in qlem})
    qdf = spark.createDataFrame(qlem, "query_id long, lemma string")
    adf = spark.createDataFrame(arity, "query_id long, n_lemmas int")
    stats = index.stats

    hits = (
        index.postings.filter(F.col("lemma").isin(all_lemmas))
        .join(F.broadcast(qdf), "lemma")
        .join(
            F.broadcast(
                index.terms.filter(F.col("lemma").isin(all_lemmas))
                .select("lemma", "df")
            ),
            "lemma",
        )
        .withColumn("_idf", idf_col(F.col("df").cast("double"), stats.n_docs))
    )
    # every config's weight as a struct element of ONE array -> explode
    # (one scan; the per-posting cost of an extra config is one fused
    # arithmetic expression inside codegen)
    arms = [
        F.struct(
            F.lit(i).cast("long").alias("config_id"),
            bm25_weight_col(
                F.col("tf").cast("double"), F.col("dl").cast("double"),
                F.col("_idf"), stats.avgdl, float(k1), float(b),
            ).alias("_w"),
        )
        for i, (k1, b) in enumerate(configs)
    ]
    exploded = hits.select(
        "query_id", "doc_id", F.explode(F.array(*arms)).alias("c")
    ).select("query_id", "doc_id", F.col("c.config_id").alias("config_id"),
             F.col("c._w").alias("_w"))
    scored = (
        exploded.groupBy("config_id", "query_id", "doc_id")
        .agg(F.count("*").alias("_nt"), F.sum("_w").alias("raw"))
        .join(F.broadcast(adf), "query_id")
        .filter(F.col("_nt") == F.col("n_lemmas"))  # AND semantics
        .withColumn("score", F.round(F.col("raw"), SCORE_DECIMALS))
    )
    w = Window.partitionBy("config_id", "query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    topk = (
        scored.withColumn("rnk", F.row_number().over(w).cast("double"))
        .filter(F.col("rnk") <= int(k))
        .select("config_id", "query_id", "doc_id", "rnk")
    )
    judged = qrels.select(
        "query_id", "doc_id", F.col("rel").cast("double").alias("rel")
    )
    dcg = (
        topk.join(judged, ["query_id", "doc_id"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0.0)))
        .groupBy("config_id", "query_id")
        .agg(F.sum(F.col("rel") / F.log2(F.col("rnk") + F.lit(1.0)))
             .alias("dcg"))
    )
    wi = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    )
    ideal = (
        judged.filter(F.col("rel") > 0)
        .withColumn("irnk", F.row_number().over(wi).cast("double"))
        .groupBy("query_id")
        .agg(F.sum(
            F.when(F.col("irnk") <= k,
                   F.col("rel") / F.log2(F.col("irnk") + F.lit(1.0)))
        ).alias("idcg"))
    )
    per_q = dcg.join(F.broadcast(ideal), "query_id", "left").select(
        "config_id", "query_id",
        F.round(
            F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)),
            SCORE_DECIMALS,
        ).alias("ndcg"),
    )
    cfg = spark.createDataFrame(
        [(i, float(k1), float(b)) for i, (k1, b) in enumerate(configs)],
        "config_id long, k1 double, b double",
    )
    return (
        per_q.groupBy("config_id")
        .agg(
            # exact order-independent macro mean: decimal sum of the
            # rounded per-query values, one double division at the end
            (F.sum(F.col("ndcg").cast("decimal(18,6)")).cast("double")
             / F.count("*")).alias("_mean"),
            F.count("*").alias("n_queries"),
        )
        .join(F.broadcast(cfg), "config_id")
        .select(
            "config_id", "k1", "b",
            F.round(F.col("_mean"), SCORE_DECIMALS).alias("mean_ndcg"),
            "n_queries",
        )
        .orderBy(F.col("mean_ndcg").desc(), F.col("config_id").asc())
    )


def hard_negatives(
    runs: DataFrame, qrels: DataFrame, n_neg: int = 5
) -> DataFrame:
    """Hard-negative mining for retrieval training (the DPR recipe —
    Karpukhin et al. 2020: negatives the CURRENT ranker finds plausible
    teach a bi-encoder/reranker far more than random ones): per query,
    the highest-ranked run documents that are NOT relevant (absent
    from qrels or graded 0), keeping run-rank order.

    ``runs``: (query_id, doc_id, rnk) — a bm25_topk_batch replay.
    ``qrels``: (query_id, doc_id, rel). Returns (query_id, doc_id,
    rnk, neg_rank) with neg_rank 1..n_neg per query.

    Plan: one anti-join against the rel>0 pairs, then a window over
    the K-BOUNDED per-query run slice (k rows per query by
    construction — the paginate/hybrid precedent, never corpus-sized).
    """
    from pyspark.sql import Window

    rel = qrels.filter(F.col("rel") > 0).select("query_id", "doc_id")
    neg = runs.join(rel, ["query_id", "doc_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.col("rnk").asc())
    return (
        neg.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("neg_rank") <= int(n_neg))
        .select("query_id", "doc_id", F.col("rnk").cast("long").alias("rnk"),
                "neg_rank")
    )
