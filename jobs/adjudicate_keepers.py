"""Same-window A/B adjudication of the BENCH_r03 `dedup_keepers`
anomaly (VERDICT r3 "what's wrong #1").

BENCH_r03 (driver, local[32], healthy window) read `dedup_keepers` at
31.6 s while the builder's healthy local[16] run read 2.7 s on the same
sf0.1 data — an unexplained 11×. Prime suspect: the documented
local[32] oversubscription collapse (this host backs 32 vCPUs with
~9-16 real cores of minute-to-minute varying capacity; CLAUDE.md), which
taxes many-small-job queries hardest — and dedup_keepers is exactly
that shape (MinHash banding shuffle + edge count + driver union-find
collect + keeper join = several small jobs back to back).

Protocol (same as jobs/adjudicate_bench.py, r3-adjudicated): wall-times
across windows are machine noise here, but RATIOS of legs interleaved
inside the SAME window are meaningful — both widths see the same
machine. Legs alternate 16/32/16/32…, each records the memory-bandwidth
control around it, and each leg phases the query so the slowdown can be
localized:

  pairs   — minhash_near_duplicates(...).count()  (banding shuffles)
  cc      — connected_components(pairs).count()   (collect+union-find)
  keepers — full dedup_keepers(docs, pairs) materialization

Output: one JSON line with per-leg phase times, per-width mins, the
32/16 ratio per phase, and per-leg host controls.

Usage:
    python jobs/adjudicate_keepers.py [--sf-dir /root/testdata/sf0.1]
                                      [--reps 2] [--output FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _one_leg(cpus: int, sf_dir: str) -> dict:
    from search_engine_spark.operators.dedup import (
        connected_components,
        dedup_keepers,
        minhash_near_duplicates,
    )
    from search_engine_spark.session import (
        build_session,
        memory_bandwidth_control,
    )

    ctl_pre = memory_bandwidth_control(8)["concurrency_ratio"]
    spark = build_session(cpus=cpus)
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        docs = docs.select("doc_id", "text").persist()
        docs.count()  # warm the input out of the timed region

        t0 = time.monotonic()
        pairs = minhash_near_duplicates(
            docs, threshold=0.7, num_hashes=32, bands=8, n=3,
        ).persist()
        n_pairs = pairs.count()
        t_pairs = time.monotonic() - t0

        t0 = time.monotonic()
        comp = connected_components(pairs)
        n_comp = comp.count()
        t_cc = time.monotonic() - t0

        t0 = time.monotonic()
        n_keep = dedup_keepers(docs, pairs).count()
        t_keepers = time.monotonic() - t0

        pairs.unpersist()
        docs.unpersist()
    finally:
        spark.stop()
    ctl_post = memory_bandwidth_control(8)["concurrency_ratio"]
    return {
        "cpus": cpus,
        "pairs_sec": round(t_pairs, 2),
        "cc_sec": round(t_cc, 2),
        "keepers_sec": round(t_keepers, 2),
        "total_sec": round(t_pairs + t_cc + t_keepers, 2),
        "n_pairs": n_pairs, "n_components": n_comp, "n_rows": n_keep,
        "host_control": {"pre": ctl_pre, "post": ctl_post},
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--widths", default="16,32")
    p.add_argument("--output", default="")
    args = p.parse_args()
    widths = [int(w) for w in args.widths.split(",")]

    legs = []
    for rep in range(args.reps):
        for w in widths:
            leg = _one_leg(w, args.sf_dir)
            leg["rep"] = rep
            print(f"  leg cpus={w} rep={rep}: {leg}", file=sys.stderr)
            legs.append(leg)

    by_w = {w: [l for l in legs if l["cpus"] == w] for w in widths}
    mins = {
        str(w): {
            ph: min(l[ph] for l in ls)
            for ph in ("pairs_sec", "cc_sec", "keepers_sec", "total_sec")
        }
        for w, ls in by_w.items()
    }
    lo, hi = str(min(widths)), str(max(widths))
    ratios = {
        ph: round(mins[hi][ph] / mins[lo][ph], 2) if mins[lo][ph] > 0 else None
        for ph in ("pairs_sec", "cc_sec", "keepers_sec", "total_sec")
    }
    out = {
        "experiment": "dedup_keepers width A/B (VERDICT r3 what's-wrong #1)",
        "sf_dir": args.sf_dir,
        "legs": legs,
        "min_by_width": mins,
        f"ratio_{hi}_over_{lo}": ratios,
        "controls_healthy": all(
            l["host_control"]["pre"] >= 5 and l["host_control"]["post"] >= 5
            for l in legs
        ),
    }
    line = json.dumps(out)
    print(line)
    if args.output:
        with open(args.output, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
