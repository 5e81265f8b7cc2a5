"""Same-window A/B adjudication of the BENCH_r02 regressions.

VERDICT r2 flagged two per-query regressions with identified suspects
but could not adjudicate them because BENCH_r02 was recorded in a
memory-bandwidth-starved window (host control ratio 0.088) and this
sandbox has not produced a healthy window since (>6 h of 0.01-0.07
readings). Cross-run wall-times are machine noise here, but RATIOS of
legs interleaved inside the SAME window are meaningful: both legs see
the same (starved) machine, so a suspect that is genuinely slower shows
up as a stable intra-window ratio.

Experiment A — segment encode codec (BENCH_r02 `segment_encode_sec`
20.1 → 79.7 s vs the round's "11× faster payload encoding" claim):
time `build_segments` with codec="auto" (PFor pricing, the default)
against codec="varbyte" (the pre-PFor path), interleaved A/B/A/B. If
auto ≈ varbyte the pricing pass is not the regression and the window
was; if auto ≫ varbyte the PFor auto-pricing is root-caused.

Experiment B — hot-term DF query layout (`bm25_df_q0` 2.79 → 19.53 s;
suspect: the r2 lemma-range-clustered publish concentrated the hottest
Zipf lemma into 1-2 files, killing scan parallelism — VERDICT r2
"what's wrong #2"): publish the SAME postings under the v4
bucket-partitioned layout (hot lemma spans ≥ one file per bucket by
construction, sources/index_store._publish_postings) and under the r2
global (lemma, doc_id) range-clustering, then interleave the hot-term
query against both.

Each leg records the memory-bandwidth control around it; the output is
one JSON line with per-leg times, mins, ratios and controls.

Usage:
    python jobs/adjudicate_bench.py [--n-conv 30000] [--cpus N]
                                    [--reps 2] [--output FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-conv", type=int, default=30000)
    p.add_argument("--cpus", type=int, default=0)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--hot-query", default="w00000")
    p.add_argument("--output", default="")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from search_engine_spark.corpus import synthesize_transcripts
    from search_engine_spark.operators.compression import build_segments
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.query import bm25_topk
    from search_engine_spark.session import (
        build_session,
        effective_cpu_count,
        memory_bandwidth_control,
    )
    from search_engine_spark.sources.index_store import (
        _publish_postings,
        _read_table,
        _swap_write,
    )

    cpus = args.cpus or effective_cpu_count()
    spark = build_session("adjudicate", cpus=cpus)
    work = tempfile.mkdtemp(prefix="adjudicate_")
    probe_workers = min(cpus, 8)

    def log(msg: str) -> None:
        print(f"[adjudicate] {msg}", file=sys.stderr, flush=True)

    corpus = synthesize_transcripts(spark, args.n_conv)
    ix = build_index(corpus, use_arrow_udf=True, weighted=True,
                     scratch_dir=f"{work}/index", materialize_postings=False)
    n_docs = ix.stats.n_docs
    log(f"index built: {n_docs} docs")

    out: dict = {
        "metric": "bench_regression_adjudication",
        "n_conv": args.n_conv,
        "n_docs": n_docs,
        "cpus": cpus,
        "reps": args.reps,
    }

    # ---- Experiment A: segment encode codec --------------------------------
    legs_a: dict[str, list[dict]] = {"auto": [], "varbyte": []}
    # one untimed warmup (JIT, Arrow init) outside the comparison
    build_segments(ix, codec="varbyte").count()
    for rep in range(args.reps):
        for codec in ("auto", "varbyte"):
            ctl = memory_bandwidth_control(probe_workers)
            t0 = time.monotonic()
            n_blocks = build_segments(ix, codec=codec).count()
            dt = round(time.monotonic() - t0, 3)
            legs_a[codec].append(
                {"sec": dt, "blocks": n_blocks,
                 "control_pre": round(ctl["concurrency_ratio"], 3)}
            )
            log(f"encode {codec} rep{rep}: {dt}s (ctl {ctl['concurrency_ratio']:.3f})")
    min_auto = min(l["sec"] for l in legs_a["auto"])
    min_vb = min(l["sec"] for l in legs_a["varbyte"])
    out["segment_encode"] = {
        "legs": legs_a,
        "min_auto_sec": min_auto,
        "min_varbyte_sec": min_vb,
        "auto_over_varbyte": round(min_auto / min_vb, 3) if min_vb else None,
    }

    # ---- Experiment B: hot-term query vs postings layout -------------------
    v4_dir = os.path.join(work, "postings_v4")
    global_dir = os.path.join(work, "postings_global")
    _publish_postings(ix.postings, work, bucket_width=1 << 16)
    os.rename(os.path.join(work, "postings"), v4_dir)
    # the r2 layout: ONE global (lemma, doc_id) range-clustering, no
    # bucket partitioning — hot lemma concentrated in few files
    _swap_write(
        ix.postings.repartitionByRange("lemma", "doc_id")
        .sortWithinPartitions("lemma", "doc_id"),
        global_dir,
    )

    import dataclasses

    ix_v4 = dataclasses.replace(ix, postings=_read_table(spark, v4_dir))
    ix_gl = dataclasses.replace(ix, postings=spark.read.parquet(global_dir))

    def n_files(d: str) -> int:
        return sum(
            1 for root, _, fs in os.walk(d) for f in fs if f.endswith(".parquet")
        )

    out["layout_files"] = {"v4": n_files(v4_dir), "global": n_files(global_dir)}

    legs_b: dict[str, list[dict]] = {"v4": [], "global": []}
    for variant, vix in (("v4", ix_v4), ("global", ix_gl)):
        bm25_topk(vix, "w00042", k=10).collect()  # per-variant warmup
    for rep in range(max(args.reps, 3)):
        for variant, vix in (("v4", ix_v4), ("global", ix_gl)):
            ctl = memory_bandwidth_control(probe_workers)
            t0 = time.monotonic()
            bm25_topk(vix, args.hot_query, k=10).collect()
            dt = round(time.monotonic() - t0, 3)
            legs_b[variant].append(
                {"sec": dt, "control_pre": round(ctl["concurrency_ratio"], 3)}
            )
            log(f"q0 {variant} rep{rep}: {dt}s (ctl {ctl['concurrency_ratio']:.3f})")
    min_v4 = min(l["sec"] for l in legs_b["v4"])
    min_gl = min(l["sec"] for l in legs_b["global"])
    out["hot_term_query"] = {
        "query": args.hot_query,
        "legs": legs_b,
        "min_v4_sec": min_v4,
        "min_global_sec": min_gl,
        "v4_over_global": round(min_v4 / min_gl, 3) if min_gl else None,
    }

    out["host_control_post"] = memory_bandwidth_control(probe_workers)
    line = json.dumps(out)
    print(line, flush=True)
    if args.output:
        with open(args.output, "w") as fh:
            fh.write(line + "\n")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
