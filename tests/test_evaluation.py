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
