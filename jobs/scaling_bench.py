"""Scaling-efficiency evidence (north_rule: throughput scaling efficiency
≥ 0.8 growing from N to 4N executors).

No real cluster exists in this sandbox, so per the BASELINE protocol the
same index-build job runs at two parallelism levels — local[N] and
local[4N] cores — over the byte-identical synthetic corpus (corpus
generation is partition-invariant by construction, tests/test_corpus.py)
and reports throughput at both plus efficiency:

    efficiency = (T_N / T_4N) / 4

Usage: python jobs/scaling_bench.py [--n-conv 30000] [--base-cpus 8]
Writes one JSON line to stdout; details to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_build(cpus: int, n_conv: int, corpus_path: str) -> dict:
    import shutil
    import tempfile

    from search_engine_spark.operators.compression import build_segments
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.session import build_session

    spark = build_session(f"scaling_{cpus}", cpus=cpus)
    corpus = spark.read.parquet(corpus_path)
    n_turns = corpus.count()
    scratch = tempfile.mkdtemp(prefix=f"scaling_ix_{cpus}_")
    t0 = time.monotonic()
    # the full job: docID assign → lemmatize/postings (parquet-spilled,
    # the at-scale materialization) → dictionary → compressed segments
    ix = build_index(corpus, use_arrow_udf=True, weighted=True,
                     scratch_dir=scratch)
    segments = build_segments(ix, bucket_width=1 << 16)
    segments.write.mode("overwrite").parquet(f"{scratch}/segments")
    sec = time.monotonic() - t0
    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)
    return {"cpus": cpus, "n_turns": n_turns, "sec": round(sec, 2),
            "turns_per_sec": round(n_turns / sec, 1)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-conv", type=int, default=30000)
    p.add_argument("--base-cpus", type=int, default=8)
    p.add_argument("--corpus", default="/tmp/scaling_corpus")
    args = p.parse_args()

    # materialize the corpus once (identical input for both runs)
    if not os.path.isdir(args.corpus):
        from search_engine_spark.corpus import synthesize_transcripts
        from search_engine_spark.session import build_session

        spark = build_session("scaling_gen", cpus=args.base_cpus * 4)
        synthesize_transcripts(spark, args.n_conv).write.mode("overwrite").parquet(args.corpus)
        spark.stop()

    lo = run_build(args.base_cpus, args.n_conv, args.corpus)
    print(f"local[{args.base_cpus}]: {lo}", file=sys.stderr, flush=True)
    hi = run_build(args.base_cpus * 4, args.n_conv, args.corpus)
    print(f"local[{args.base_cpus * 4}]: {hi}", file=sys.stderr, flush=True)

    efficiency = (lo["sec"] / hi["sec"]) / 4.0
    out = {
        "metric": "index_build_scaling_efficiency_Nx4N",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "runs": [lo, hi],
        "pass_0.8": efficiency >= 0.8,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
