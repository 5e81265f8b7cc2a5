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
