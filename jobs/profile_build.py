"""Phase-level profiling of the index build (scaling-efficiency work).

Times each build phase separately at one pinned core count so the
serial/fixed fraction is attributable. Usage:
    taskset -c 0-1 python jobs/profile_build.py --cpus 2 --corpus DIR
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpus", type=int, required=True)
    p.add_argument("--corpus", required=True)
    p.add_argument("--warmup", action="store_true",
                   help="run a small build first (JIT + python workers)")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from search_engine_spark.operators.compression import build_segments
    from search_engine_spark.operators.index_build import (
        build_terms,
        corpus_stats,
        doc_term_maps,
        doclen_from_term_maps,
        explode_doc_term_maps,
        role_weight_col,
    )
    from search_engine_spark.operators.docids import assign_dense_ids
    from search_engine_spark.session import build_session

    t_session = time.monotonic()
    spark = build_session(f"profile_{args.cpus}", cpus=args.cpus)
    phases: dict[str, float] = {}
    phases["session"] = time.monotonic() - t_session

    corpus = spark.read.parquet(args.corpus)
    n = corpus.count()
    scratch = tempfile.mkdtemp(prefix=f"profile_{args.cpus}_")

    def phase(name):
        class _P:
            def __enter__(self):
                self.t = time.monotonic()

            def __exit__(self, *a):
                phases[name] = round(time.monotonic() - self.t, 2)
                print(f"  {name}: {phases[name]}s", file=sys.stderr, flush=True)

        return _P()

    from search_engine_spark.operators.docids import assign_dense_ids_spilled

    if args.warmup:
        from search_engine_spark.operators.index_build import build_index

        with phase("warmup"):
            wdir = tempfile.mkdtemp(prefix="warm_")
            wix = build_index(corpus.limit(2000), use_arrow_udf=True,
                              weighted=True, scratch_dir=wdir)
            from search_engine_spark.operators.compression import (
                build_segments as _bs,
            )

            _bs(wix, bucket_width=1 << 16).count()
            import shutil

            shutil.rmtree(wdir, ignore_errors=True)

    t0 = time.monotonic()
    with phase("docid_assign_plus_docs_write"):
        docs, _adj = assign_dense_ids_spilled(
            corpus, ["conv_id", "turn_idx"], f"{scratch}/docs"
        )
    weight = role_weight_col("role")
    with phase("udf_doc_terms_write"):
        doc_term_maps(docs, text_col="text", weight_col=weight).write.mode(
            "overwrite"
        ).parquet(f"{scratch}/doc_terms")
    enriched = spark.read.parquet(f"{scratch}/doc_terms")
    postings = explode_doc_term_maps(enriched)  # view, not materialized
    with phase("doclen_persist"):
        doclen = doclen_from_term_maps(enriched).persist()
        doclen.count()
    with phase("terms_agg"):
        terms = build_terms(postings).persist()
        terms.count()
    with phase("corpus_stats"):
        stats = corpus_stats(doclen)
    with phase("segments_encode_write"):
        from search_engine_spark.operators.index_build import InvertedIndex

        ix = InvertedIndex(docs=docs, postings=postings, doclen=doclen,
                           terms=terms, stats=stats, backing_dir=scratch)
        build_segments(ix, bucket_width=1 << 16).write.mode("overwrite").parquet(
            f"{scratch}/segments"
        )
    total = time.monotonic() - t0
    print(json.dumps({"cpus": args.cpus, "n_turns": n,
                      "total_sec": round(total, 2),
                      "turns_per_sec": round(n / total, 1),
                      "phases": phases}), flush=True)
    spark.stop()
    import shutil

    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
