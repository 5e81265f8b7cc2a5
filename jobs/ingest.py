"""spark-submit entry point: land a raw transcript export (JSONL / CSV
/ parquet) as the engine's canonical sorted corpus dir.

Usage:
    spark-submit --py-files engine.zip jobs/ingest.py \
        --input export.jsonl --format jsonl --output corpus_dir \
        [--dead-letter DIR] [--max-text-chars N] [--partitions N]

The output dir is directly consumable by jobs/build_index.py --input,
satisfies the transcript contract row-by-row, has a unique
(conv_id, turn_idx) key, and is globally sorted so the build takes the
zero-shuffle presorted docID path. Invalid input never fails the job:
malformed lines, contract violations and duplicate-key losers are
diverted to the dead-letter log with a reason (ST5), and the audit
counts print as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from search_engine_spark.sources.dead_letter import MAX_TEXT_CHARS
    from search_engine_spark.sources.ingest import FORMATS, ingest_transcripts

    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--format", choices=FORMATS, default="jsonl")
    p.add_argument("--output", required=True)
    p.add_argument("--dead-letter", default=None)
    p.add_argument("--max-text-chars", type=int, default=MAX_TEXT_CHARS)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--local-cpus", type=int, default=None,
                   help="build a local[N] session instead of spark-submit's")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    if args.local_cpus:
        from search_engine_spark.session import build_session

        spark = build_session("ingest", cpus=args.local_cpus)
    else:
        spark = SparkSession.builder.appName("ingest").getOrCreate()

    counts = ingest_transcripts(
        spark,
        args.input,
        args.output,
        fmt=args.format,
        dead_letter_dir=args.dead_letter,
        max_text_chars=args.max_text_chars,
        partitions=args.partitions,
    )
    print(json.dumps({"input": args.input, "format": args.format, **counts}))
    spark.stop()


if __name__ == "__main__":
    main()
