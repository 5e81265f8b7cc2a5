"""spark-submit entry point: incremental index refresh + optional
compaction — the reference's `GET /api/startIndexing` re-index loop
(ApiService.java: start/stop indexing) as a batch-drain job.

Usage:
    python jobs/refresh_index.py --index <index_dir> --input <dir> \
        [--compact] [--local-cpus N]
    python jobs/refresh_index.py --index <dst> --merge-from <src_index> \
        [--local-cpus N]          # fold a parallel shard build into dst

Drains any NEW transcript parquet files from --input into the index's
streamed-delta tables (exactly-once per file via the stream checkpoint;
contract-violating rows go to the dead-letter registry, not the index),
then optionally folds the deltas back into the canonical dense index
(compact_index — the Lucene-merge analog). Prints ONE JSON line with
the delta/backlog state from the same scan-free report index_stats
uses.
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
    p.add_argument("--input", default=None,
                   help="directory of transcript parquet files to drain")
    p.add_argument("--merge-from", default=None, metavar="SRC_INDEX",
                   help="merge a complete index built over a disjoint "
                        "shard into --index (index_store.merge_indexes); "
                        "runs before the drain when --input is also given")
    p.add_argument("--compact", action="store_true",
                   help="fold streamed deltas into the dense index after "
                        "draining (compact_index)")
    p.add_argument("--expire-snapshots", type=int, default=None,
                   metavar="KEEP",
                   help="after the run, keep only the newest KEEP "
                        "snapshots (index_store.expire_snapshots)")
    p.add_argument("--alert-queries", default=None, metavar="QUERIES_TSV",
                   help="after the drain, percolate the SAME new turns "
                        "against these stored queries (qid<TAB>query "
                        "per line) and append hits to <index>/alerts "
                        "(exactly-once per input file)")
    p.add_argument("--alert-frac", type=float, default=1.0,
                   help="per-query minimum_should_match fraction for "
                        "--alert-queries (1.0 = strict AND)")
    p.add_argument("--delete-where", default=None, metavar="SQL_PRED",
                   help="delete-by-query over the doc-store columns "
                        "(e.g. \"ts < timestamp '2026-01-01'\" for "
                        "retention, \"role = 'tool'\"); runs before "
                        "drain/compact, auto-snapshots first")
    p.add_argument("--restore", type=int, default=None, metavar="VERSION",
                   help="roll the live index back to this snapshot "
                        "version before anything else runs (the "
                        "current state is auto-snapshotted first)")
    p.add_argument("--local-cpus", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from search_engine_spark.sources.index_store import compact_index
    from search_engine_spark.streaming.incremental import (
        incremental_index_refresh,
    )

    if args.local_cpus:
        from search_engine_spark.session import build_session

        spark = build_session("refresh_index", cpus=args.local_cpus)
    else:
        spark = SparkSession.builder.appName("refresh_index").getOrCreate()

    if not os.path.exists(os.path.join(args.index, "stats.json")):
        print(f"no index at {args.index} (stats.json missing)", file=sys.stderr)
        spark.stop()
        sys.exit(2)

    out: dict = {"drained": False, "compacted": False}
    # restore FIRST: a rollback defines the state every later stage
    # (merge/drain/compact) operates on
    if args.restore is not None:
        from search_engine_spark.sources.index_store import restore_snapshot

        out["restore"] = restore_snapshot(args.index, args.restore)
        spark.catalog.clearCache()
    if args.delete_where:
        from search_engine_spark.sources.index_store import delete_where

        out["delete"] = delete_where(spark, args.index, args.delete_where)
        spark.catalog.clearCache()
    if (not args.input and not args.merge_from and args.restore is None
            and not args.delete_where):
        print("nothing to do: pass --input, --merge-from, --restore "
              "and/or --delete-where", file=sys.stderr)
        spark.stop()
        sys.exit(2)
    # merge FIRST: merge_indexes refuses undrained stream deltas, and a
    # drain in the same invocation would create exactly those
    if args.merge_from:
        from search_engine_spark.sources.index_store import merge_indexes

        out["merge"] = merge_indexes(spark, args.index, args.merge_from)
    if args.input:
        incremental_index_refresh(spark, args.input, args.index)
        out["drained"] = True
    if args.alert_queries:
        if not args.input:
            print("--alert-queries needs --input (the turn feed)",
                  file=sys.stderr)
            spark.stop()
            sys.exit(2)
        from search_engine_spark.streaming.alerts import (
            load_stored_queries,
            streaming_percolate_alerts,
        )

        out["alerts_appended"] = streaming_percolate_alerts(
            spark, args.input, args.index,
            load_stored_queries(args.alert_queries),
            min_match_frac=args.alert_frac,
        )
    if args.compact:
        out["compaction"] = compact_index(spark, args.index)
        out["compacted"] = True
    if args.expire_snapshots is not None:
        from search_engine_spark.sources.index_store import expire_snapshots

        out["snapshots_expired"] = expire_snapshots(
            args.index, keep_last=args.expire_snapshots
        )

    # backlog state after the run (file metadata only)
    deltas = {}
    for d in ("postings_stream", "doclen_stream", "docs_stream", "terms_delta"):
        path = os.path.join(args.index, d)
        if os.path.isdir(path):
            n = sum(len(fs) for _, _, fs in os.walk(path))
            if n:
                deltas[d] = n
    out["stream_delta_files"] = deltas
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
