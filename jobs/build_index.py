"""spark-submit entry point: batch inverted-index build (north_rule
packaging: `spark-submit --py-files engine.zip jobs/build_index.py`).

Usage:
    spark-submit [--master ...] --py-files engine.zip jobs/build_index.py \
        --input <iceberg-table-or-parquet-path> --output <index_dir> \
        [--n-synthetic-convs N] [--bucket-width W] [--no-resume]

On a real cluster --input is the Iceberg transcript table identifier;
locally a parquet path or a synthetic corpus (--n-synthetic-convs).
The job is resumable: per-bucket manifests are consulted on restart and
only missing buckets are rebuilt (sources/index_store.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# driver-side import path when run as a bare script (python jobs/…);
# executors get the package via --py-files (scripts/submit_build.sh)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", default=None, help="Iceberg table id or parquet path")
    p.add_argument("--output", required=True, help="index directory")
    p.add_argument("--n-synthetic-convs", type=int, default=None)
    p.add_argument("--bucket-width", type=int, default=1 << 16)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--positional", action="store_true",
                   help="also persist the positional postings table "
                        "(span/phrase/NEAR without re-tokenizing)")
    p.add_argument("--fields", action="store_true",
                   help="also persist the per-field BM25F index "
                        "(fields/fieldlen tables + exact stats; "
                        "serves search.py --engine bm25f)")
    p.add_argument("--local-cpus", type=int, default=None,
                   help="build a local[N] session instead of spark-submit's")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from search_engine_spark.corpus import synthesize_transcripts
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.sources.index_store import write_index
    from search_engine_spark.sources.transcripts import read_transcripts

    if args.local_cpus:
        from search_engine_spark.session import build_session

        spark = build_session("build_index", cpus=args.local_cpus)
    else:
        spark = SparkSession.builder.appName("build_index").getOrCreate()

    if args.input:
        transcripts = read_transcripts(spark, args.input)
        desc = args.input
    elif args.n_synthetic_convs:
        transcripts = synthesize_transcripts(spark, args.n_synthetic_convs)
        desc = f"synthetic:{args.n_synthetic_convs}"
    else:
        p.error("need --input or --n-synthetic-convs")

    from search_engine_spark.sources.index_store import DiskIndex, load_stats

    # Resume gate BEFORE the build spills into --output (the build with
    # scratch_dir == output overwrites docs/postings unconditionally, so
    # the check must happen here, not inside write_index — ADVICE r1):
    # - complete index from the same input  → no-op re-run
    # - complete index from a DIFFERENT input → refuse (a silent rebuild
    #   would publish segments/stats from old postings next to new ones)
    # - incomplete index (dims written, some buckets missing) from the
    #   same input → reuse the spilled tables, rebuild only the missing
    #   buckets (the actual point of resume: the UDF pass does not rerun)
    resume = not args.no_resume
    stats = load_stats(args.output) if resume else None
    if stats is not None and stats.get("input") != desc:
        p.error(
            f"--output holds an index built from {stats.get('input')!r}, "
            f"not {desc!r}; pass --no-resume to rebuild from scratch"
        )
    if stats is not None and stats.get("complete"):
        print(json.dumps({"input": desc, "skipped": "index already complete",
                          "n_docs": stats["n_docs"]}), flush=True)
        spark.stop()
        return
    docid_path = "resume"
    if stats is not None:
        ix = DiskIndex(spark, args.output).as_inverted_index()
        ix.backing_dir = args.output
        n_dead = 0
    else:
        # dead-letter the rows violating the input contract instead of
        # letting them poison the build (ST5; reference keep_link
        # ERROR_LINK, Parser.java:285-292)
        from search_engine_spark.sources.dead_letter import (
            split_valid,
            write_dead_letters,
        )

        transcripts, dead = split_valid(transcripts)
        n_dead = dead.count()
        if n_dead:
            write_dead_letters(dead, args.output, run_id=desc)
        # Presorted fast path: a clean parquet corpus already globally
        # sorted by (conv_id, turn_idx) needs NO range exchange and NO
        # docs copy (doc_id = file offset + row_index; sortedness is
        # proven by a key-column scan, operators/docids.py). Dead-
        # lettered rows break row_index density → range-exchange path.
        pres = None
        if n_dead == 0 and args.input and os.path.isdir(args.input):
            from search_engine_spark.operators.docids import docs_from_sorted_dir

            pres = docs_from_sorted_dir(
                spark, args.input, ["conv_id", "turn_idx"]
            )
        if pres is not None:
            from search_engine_spark.operators.index_build import (
                build_index_presorted,
            )
            from search_engine_spark.sources.dead_letter import scrub_nulls_col

            ix = build_index_presorted(
                pres, use_arrow_udf=True, weighted=True,
                scratch_dir=args.output,
                text_transform=scrub_nulls_col("text"),
            )
        else:
            ix = build_index(transcripts, use_arrow_udf=True, weighted=True,
                             scratch_dir=args.output)
        docid_path = "presorted" if pres is not None else "range_exchange"
    metrics = write_index(ix, args.output, input_desc=desc,
                          bucket_width=args.bucket_width,
                          resume=resume)
    if args.positional:
        # persist the positional acceleration table beside the index
        # (span/phrase/NEAR positional queries without re-tokenizing;
        # derived — corpus mutations invalidate it)
        import time as _time

        from search_engine_spark.operators.positional import (
            build_positional_postings,
        )
        from search_engine_spark.sources.index_store import (
            write_positional_index,
        )

        t0 = _time.monotonic()
        write_positional_index(
            build_positional_postings(ix.docs, use_arrow_udf=True),
            args.output, bucket_width=args.bucket_width,
        )
        metrics["positional_sec"] = round(_time.monotonic() - t0, 3)
    if args.fields:
        # persist the per-field BM25F tables (derived — corpus
        # mutations invalidate them alongside positional)
        import time as _time

        from search_engine_spark.sources.index_store import (
            write_field_index,
        )

        t0 = _time.monotonic()
        write_field_index(ix.docs, args.output,
                          bucket_width=args.bucket_width)
        metrics["fields_sec"] = round(_time.monotonic() - t0, 3)
    metrics["n_docs"] = ix.stats.n_docs
    metrics["n_dead_lettered"] = n_dead
    metrics["docid_path"] = docid_path
    metrics["turns_per_sec"] = round(ix.stats.n_docs / metrics["elapsed_sec"], 1)
    print(json.dumps(metrics), flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
