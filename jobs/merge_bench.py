"""Same-window A/B: monolithic index build vs shard builds + merge.

Evidence for the shard-merge scale story (index_store.merge_indexes):
at 100 TB the corpus is built as N independent shard jobs that run IN
PARALLEL on disjoint executors, then merged. This sandbox can't run
two isolated Spark clusters, so the legs run serially, taskset-pinned,
alternating, each with its own memory-bandwidth control — the same
methodology as jobs/adjudicate_bench.py (same-window A/B is valid even
on a starved host because both sides sample the same machine). What
the numbers show:

- ``merge_sec / mono_sec``: the merge step's cost as a fraction of a
  full build — the price of composing shards.
- ``est_parallel_sec`` = max(shard build) + merge: the wall-clock an
  actual 2-cluster parallel run would see, vs ``mono_sec`` on the same
  cores — the speedup a second cluster buys once merge is this cheap.

Usage:
    python jobs/merge_bench.py [--n-conv 10000] [--cpus 8] [--repeats 2]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _leg(leg: str, corpus_path: str, cpus: int) -> dict:
    from pyspark.sql import functions as F

    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.session import (
        build_session,
        memory_bandwidth_control,
    )
    from search_engine_spark.sources.index_store import (
        merge_indexes,
        write_index,
    )

    control = memory_bandwidth_control(min(cpus, 8))
    spark = build_session(f"merge_bench_{leg}", cpus=cpus)
    corpus = spark.read.parquet(corpus_path).cache()
    n_turns = corpus.count()
    # disjoint deterministic halves by conversation hash parity
    half_pred = F.abs(F.xxhash64("conv_id")) % 2 == 0
    out: dict = {"leg": leg, "n_turns": n_turns,
                 "control_pre": control["concurrency_ratio"]}
    work = tempfile.mkdtemp(prefix=f"merge_bench_{leg}_")
    try:
        if leg == "mono":
            t0 = time.monotonic()
            write_index(
                build_index(corpus, use_arrow_udf=True,
                            scratch_dir=os.path.join(work, "s")),
                os.path.join(work, "ix"), input_desc="mono",
            )
            out["sec"] = round(time.monotonic() - t0, 2)
        else:
            halves = [corpus.filter(half_pred), corpus.filter(~half_pred)]
            t0 = time.monotonic()
            shard_secs = []
            for i, half in enumerate(halves):
                t1 = time.monotonic()
                write_index(
                    build_index(half, use_arrow_udf=True,
                                scratch_dir=os.path.join(work, f"s{i}")),
                    os.path.join(work, f"ix{i}"), input_desc=f"shard{i}",
                )
                shard_secs.append(round(time.monotonic() - t1, 2))
            t2 = time.monotonic()
            merge_indexes(spark, os.path.join(work, "ix0"),
                          os.path.join(work, "ix1"), snapshot=False)
            out["merge_sec"] = round(time.monotonic() - t2, 2)
            out["sec"] = round(time.monotonic() - t0, 2)
            out["shard_secs"] = shard_secs
            # the wall-clock an actual 2-cluster parallel run would see
            out["est_parallel_sec"] = round(max(shard_secs) + out["merge_sec"], 2)
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-conv", type=int, default=10000)
    p.add_argument("--cpus", type=int, default=8)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--single-leg", default=None, help=argparse.SUPPRESS)
    p.add_argument("--corpus", default=None, help=argparse.SUPPRESS)
    args = p.parse_args()

    if args.single_leg:
        print(json.dumps(_leg(args.single_leg, args.corpus, args.cpus)),
              flush=True)
        return

    # synthesize the shared corpus once
    from search_engine_spark.corpus import synthesize_transcripts
    from search_engine_spark.session import build_session

    corpus_dir = tempfile.mkdtemp(prefix="merge_bench_corpus_")
    spark = build_session("merge_bench_corpus", cpus=args.cpus)
    synthesize_transcripts(spark, args.n_conv, partitions=args.cpus).write.mode(
        "overwrite"
    ).parquet(corpus_dir)
    spark.stop()

    pin = shutil.which("taskset") is not None
    legs: dict[str, list[dict]] = {"mono": [], "sharded": []}
    try:
        for _ in range(args.repeats):
            for leg in ("mono", "sharded"):  # alternate within the window
                cmd = ([f"taskset", "-c", f"0-{args.cpus - 1}"] if pin else []) + [
                    sys.executable, os.path.abspath(__file__),
                    "--single-leg", leg, "--corpus", corpus_dir,
                    "--cpus", str(args.cpus),
                ]
                res = subprocess.run(cmd, stdout=subprocess.PIPE,
                                     stderr=sys.stderr)
                res.check_returncode()
                legs[leg].append(
                    json.loads(res.stdout.decode().strip().splitlines()[-1])
                )
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)

    mono = min(l["sec"] for l in legs["mono"])
    shard_total = min(l["sec"] for l in legs["sharded"])
    best_shard = min(legs["sharded"], key=lambda l: l["sec"])
    out = {
        "metric": "merge_vs_monolithic_build",
        "n_conv": args.n_conv,
        "cpus": args.cpus,
        "repeats": args.repeats,
        "mono_sec": mono,
        "sharded_total_sec": shard_total,
        "merge_sec": best_shard["merge_sec"],
        "merge_over_mono": round(best_shard["merge_sec"] / mono, 3),
        "est_parallel_sec": best_shard["est_parallel_sec"],
        "est_parallel_speedup": round(mono / best_shard["est_parallel_sec"], 2),
        "legs": legs,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
