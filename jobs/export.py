"""spark-submit entry point: export matching documents as JSONL.

The reverse of jobs/ingest.py and the ES scroll/_export shape: dump
EVERY document matching a query (or the whole corpus) from an index's
doc store to a JSONL dataset — feeding downstream pipelines that want
"all turns mentioning X" rather than a top-k page.

Usage:
    spark-submit --py-files engine.zip jobs/export.py \
        --index <index_dir> --output <dir> \
        [--query '...'] [--or] [--columns conv_id,turn_idx,text]

Scale shape: the match set comes from the engines' shared IN-pruned
AND/OR candidate aggregate (never a score/sort stage — export is
unordered by contract), the doc-store join is doc_id-keyed
(bucket-pruned in the v4 layout), and the write is a distributed
``df.write.json`` — no collect, no single-file bottleneck; the output
dir holds one JSONL part per partition. Omitting --query exports the
whole corpus (the doc-store dump).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--output", required=True, help="JSONL output dir")
    p.add_argument("--query", default=None,
                   help="export only docs matching this query "
                        "(omit to dump the whole doc store)")
    p.add_argument("--or", dest="match_any", action="store_true",
                   help="disjunctive match semantics")
    p.add_argument("--columns", default=None,
                   help="comma-separated doc columns (default: all)")
    p.add_argument("--local-cpus", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    if args.local_cpus:
        from search_engine_spark.session import build_session

        spark = build_session("export", cpus=args.local_cpus)
    else:
        spark = SparkSession.builder.appName("export").getOrCreate()

    from search_engine_spark.sources.index_store import DiskIndex

    disk = DiskIndex(spark, args.index)
    ix = disk.as_inverted_index()
    docs = ix.docs

    n_matched = None
    if args.query is not None:
        from search_engine_spark.operators.query import parse_query

        lemmas = parse_query(args.query)
        if not lemmas:
            print("invalid query: no indexable terms", file=sys.stderr)
            spark.stop()
            sys.exit(2)
        cand = (
            ix.postings.filter(F.col("lemma").isin(lemmas))
            .groupBy("doc_id")
            .agg(F.count("*").alias("_nt"))
        )
        if not args.match_any:
            cand = cand.filter(F.col("_nt") == len(lemmas))
        docs = docs.join(cand.select("doc_id"), "doc_id", "left_semi")

    if args.columns:
        cols = [c.strip() for c in args.columns.split(",") if c.strip()]
        missing = [c for c in cols if c not in docs.columns]
        if missing:
            print(f"unknown doc columns: {missing}", file=sys.stderr)
            spark.stop()
            sys.exit(2)
        docs = docs.select(*cols)

    # count from the same materialization that gets written (persist →
    # count → write): a zero-match query must still produce the empty
    # output dir AND the audit line — reading the dir back would crash
    # schema inference on an empty JSON directory
    docs = docs.persist()
    n_matched = docs.count()
    docs.write.mode("overwrite").json(args.output)
    docs.unpersist()
    print(json.dumps({
        "index": args.index, "query": args.query,
        "match_any": bool(args.match_any), "rows_exported": n_matched,
        "output": args.output,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
