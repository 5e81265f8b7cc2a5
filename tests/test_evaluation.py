"""ir_metrics: hand-computed golden values + edge cases."""

import math

from search_engine_spark.operators.evaluation import ir_metrics


def test_ir_metrics_hand_computed(spark):
    # query 1: ranks 1..3 = rels (3, 0, 1); judged but unretrieved
    # doc 99 with rel 2 (hurts recall, enters ideal ranking)
    runs = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2)],
        "query_id long, doc_id long, rnk int",
    )
    qrels = spark.createDataFrame(
        [(1, 10, 3.0), (1, 12, 1.0), (1, 99, 2.0),
         (2, 21, 0.0)],  # query 2: judged only with rel 0 -> no rels
        "query_id long, doc_id long, rel double",
    )
    rows = {r["query_id"]: r for r in ir_metrics(runs, qrels, k=3).collect()}

    dcg = 3.0 / math.log2(2.0) + 0.0 + 1.0 / math.log2(4.0)
    idcg = 3.0 / math.log2(2.0) + 2.0 / math.log2(3.0) + 1.0 / math.log2(4.0)
    q1 = rows[1]
    assert math.isclose(q1["ndcg"], round(dcg / idcg, 6), abs_tol=1e-9)
    assert q1["mrr"] == 1.0          # rank-1 doc is relevant
    assert math.isclose(q1["precision"], round(2 / 3.0, 6), abs_tol=1e-9)
    assert math.isclose(q1["recall"], round(2 / 3.0, 6), abs_tol=1e-9)

    # query 2: zero relevant judgments -> all-zero metrics, no div/0
    q2 = rows[2]
    assert (q2["ndcg"], q2["mrr"], q2["precision"], q2["recall"]) == (
        0.0, 0.0, 0.0, 0.0
    )


def test_ir_metrics_k_truncates(spark):
    # the rel-3 doc sits at rank 3; with k=2 it must not count
    runs = spark.createDataFrame(
        [(7, 1, 1), (7, 2, 2), (7, 3, 3)],
        "query_id long, doc_id long, rnk int",
    )
    qrels = spark.createDataFrame(
        [(7, 3, 3.0)], "query_id long, doc_id long, rel double"
    )
    r = ir_metrics(runs, qrels, k=2).collect()[0]
    assert (r["ndcg"], r["mrr"], r["precision"], r["recall"]) == (
        0.0, 0.0, 0.0, 0.0
    )
    r3 = ir_metrics(runs, qrels, k=3).collect()[0]
    assert r3["recall"] == 1.0 and r3["mrr"] == round(1 / 3.0, 6)
    # perfect ranking of the only relevant doc would put it at rank 1:
    # ndcg = (3/log2(4)) / (3/log2(2)) = 0.5
    assert math.isclose(r3["ndcg"], 0.5, abs_tol=1e-9)


def test_param_sweep_matches_per_config_reruns(tiny_index, spark):
    """The one-pass sweep must equal M independent ir_metrics runs:
    for each (k1, b) config, rerun bm25_topk_batch with those params,
    score with ir_metrics, macro-average identically."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from search_engine_spark.operators.evaluation import (
        bm25_param_sweep,
        ir_metrics,
    )
    from search_engine_spark.operators.query import bm25_topk_batch

    qs = {0: "w00000s w00001", 1: "w00159 w00268", 2: "needlealpha"}
    configs = [(1.2, 0.75), (0.8, 0.2), (2.0, 1.0)]
    # deterministic graded qrels over each query's AND-match set
    parts = []
    for qid, q in qs.items():
        from search_engine_spark.operators.query import (
            docs_with_all_lemmas,
            parse_query,
        )

        cand = docs_with_all_lemmas(
            tiny_index.postings, parse_query(q)
        ).select(
            F.lit(qid).cast("long").alias("query_id"),
            "doc_id",
            (F.col("doc_id") % 3).cast("double").alias("rel"),
        )
        parts.append(cand)
    qrels = parts[0].unionByName(parts[1]).unionByName(parts[2]).cache()

    got = {
        int(r["config_id"]): (r["k1"], r["b"], r["mean_ndcg"], r["n_queries"])
        for r in bm25_param_sweep(
            tiny_index, qs, qrels, configs, k=10
        ).collect()
    }
    assert set(got) == {0, 1, 2}

    for ci, (k1, b) in enumerate(configs):
        runs = bm25_topk_batch(tiny_index, qs, k=10, k1=k1, b=b).select(
            "query_id", "doc_id", "rnk"
        )
        per_q = ir_metrics(runs, qrels, k=10).collect()
        mean = float(
            sum(Decimal(str(r["ndcg"])) for r in per_q) / len(per_q)
        )
        gk1, gb, gmean, gn = got[ci]
        assert (gk1, gb) == (k1, b)
        assert gn == len(per_q)
        assert abs(gmean - round(mean, 6)) <= 1e-9, (ci, gmean, mean)


def test_hard_negatives_mining(spark):
    """Per query: top-RANKED non-relevant docs only, rank order kept,
    bounded at n_neg, relevant docs never leak in."""
    from search_engine_spark.operators.evaluation import hard_negatives

    runs = spark.createDataFrame(
        [(0, d, r) for r, d in enumerate([10, 11, 12, 13, 14], 1)]
        + [(1, d, r) for r, d in enumerate([20, 21, 22], 1)],
        "query_id long, doc_id long, rnk long",
    )
    qrels = spark.createDataFrame(
        [(0, 10, 2.0), (0, 12, 1.0), (0, 99, 3.0), (1, 21, 0.0)],
        "query_id long, doc_id long, rel double",
    )
    got = sorted(
        (r["query_id"], r["doc_id"], r["rnk"], r["neg_rank"])
        for r in hard_negatives(runs, qrels, n_neg=2).collect()
    )
    # q0: 10 and 12 are relevant -> negatives are 11 (rnk2) then 13
    # (rnk4); q1: 21 has rel=0 so it IS a negative, order 20,21
    assert got == [
        (0, 11, 2, 1), (0, 13, 4, 2),
        (1, 20, 1, 1), (1, 21, 2, 2),
    ]
