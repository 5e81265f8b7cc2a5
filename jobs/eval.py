"""spark-submit entry point: offline ranking evaluation — replay a
query log against a written index and score it against graded
relevance judgments (the trec_eval loop for anyone iterating on
ranking: BM25 parameters, boosts, synonyms, recency decay).

Usage:
    python jobs/eval.py --index <index_dir> --queries queries.tsv \
        --qrels qrels.tsv [--k 10] [--or] [--local-cpus N]

File formats (TREC-flavored, tab- or space-separated):
    queries.tsv   <query_id> <query text ...>        one query per line
    qrels.tsv     <query_id> <doc_id> <rel>          graded, rel >= 0
                  (the 4-column TREC form <qid> <iter> <doc> <rel> is
                  accepted too — the iteration column is ignored)

The whole query log is replayed in ONE postings pass
(query.bm25_topk_batch: union-of-lemmas IN scan + one
groupBy(query_id, doc_id) shuffle), joined against the qrels, and
scored by evaluation.ir_metrics (nDCG@k linear gain / MRR / precision
/ recall). Prints one JSON line per query plus a final macro-average
line {"query_id": "macro", ...} over every runnable query (a query
that retrieved nothing scores zero — it stays in the denominator, the
trec_eval convention). Queries that parse to no indexable terms are
reported with "skipped": true (the reference's 'empty request' guard).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_queries(path: str) -> dict[int, str]:
    out: dict[int, str] = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            qid, _, text = line.partition("\t")
            if not text:  # space-separated fallback
                qid, _, text = line.partition(" ")
            out[int(qid)] = text.strip()
    return out


def _read_qrels(path: str) -> list[tuple[int, int, float]]:
    rows: list[tuple[int, int, float]] = []
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            if len(parts) == 4:  # TREC: qid iter doc rel
                qid, _, doc, rel = parts
            elif len(parts) == 3:
                qid, doc, rel = parts
            else:
                raise SystemExit(f"qrels line not 3/4 columns: {line!r}")
            rows.append((int(qid), int(doc), float(rel)))
    return rows


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--queries", required=True, help="query log TSV")
    p.add_argument("--qrels", required=True, help="graded judgments TSV")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--or", dest="match_any", action="store_true",
                   help="disjunctive retrieval (default: AND)")
    p.add_argument("--sweep", metavar="K1:B[,K1:B...]", default=None,
                   help="instead of a single eval, grid-tune BM25 over "
                        "these (k1, b) configs in ONE postings pass "
                        "(evaluation.bm25_param_sweep) and print one "
                        "line per config, best mean nDCG first")
    p.add_argument("--local-cpus", type=int, default=None,
                   help="build a local[N] session (omit under spark-submit)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from search_engine_spark.session import build_session

    if args.local_cpus is not None:
        spark = build_session("eval", cpus=args.local_cpus)
    else:
        spark = SparkSession.builder.appName("eval").getOrCreate()

    from search_engine_spark.operators.evaluation import ir_metrics
    from search_engine_spark.operators.query import (
        bm25_topk_batch,
        parse_query,
    )
    from search_engine_spark.sources.index_store import DiskIndex

    queries = _read_queries(args.queries)
    qrels_rows = _read_qrels(args.qrels)
    if not queries:
        raise SystemExit("empty query log")

    skipped = {qid for qid, q in queries.items() if not parse_query(q)}
    runnable = {qid: q for qid, q in queries.items() if qid not in skipped}

    ix = DiskIndex(spark, args.index).as_inverted_index()

    if args.sweep:
        from search_engine_spark.operators.evaluation import (
            bm25_param_sweep,
        )

        try:
            configs = [
                (float(part.split(":")[0]), float(part.split(":")[1]))
                for part in args.sweep.split(",") if part.strip()
            ]
        except (ValueError, IndexError):
            raise SystemExit("--sweep expects K1:B[,K1:B...]")
        qrels = spark.createDataFrame(
            qrels_rows, "query_id long, doc_id long, rel double"
        )
        for r in bm25_param_sweep(
            ix, runnable, qrels, configs, k=args.k
        ).collect():
            print(json.dumps(r.asDict()), flush=True)
        spark.stop()
        return

    runs = bm25_topk_batch(
        ix, runnable, k=args.k, match_all=not args.match_any
    ).select("query_id", "doc_id", "rnk")
    qrels = spark.createDataFrame(
        qrels_rows, "query_id long, doc_id long, rel double"
    )
    rows = sorted(
        ir_metrics(runs, qrels, k=args.k).collect(),
        key=lambda r: r["query_id"],
    )

    # trec_eval averages over every runnable query: one that retrieved
    # nothing scores zero, it doesn't vanish from the denominator
    out = [dict(r.asDict()) for r in rows]
    for qid in sorted(set(runnable) - {r["query_id"] for r in rows}):
        out.append({"query_id": qid, "ndcg": 0.0, "mrr": 0.0,
                    "precision": 0.0, "recall": 0.0})
    out.sort(key=lambda d: d["query_id"])

    for qid in sorted(skipped):
        print(json.dumps({"query_id": qid, "skipped": True}), flush=True)
    for d in out:
        print(json.dumps(d), flush=True)
    if out:
        macro = {
            m: round(sum(d[m] for d in out) / len(out), 6)
            for m in ("ndcg", "mrr", "precision", "recall")
        }
        print(json.dumps({"query_id": "macro", "n_queries": len(out),
                          "k": args.k, **macro}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
