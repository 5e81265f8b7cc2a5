"""spark-submit entry point: one-shot training-dataset preparation —
the CLI face of the `training_prepare` pipeline (cleanse → split →
decontaminate → pack) so a user can turn a transcript table into
packed train/val/test parquet without writing code.

Usage:
    spark-submit [--master ...] --py-files engine.zip jobs/prepare_dataset.py \
        --input <table-or-parquet> | --n-synthetic-convs N \
        --output <dir> [--budget 2048] [--shards 64] \
        [--quality-floor 0.5] [--lang latin-script] [--no-dedup] \
        [--ppl-max 500] \
        [--no-decontaminate] [--train 0.8] [--val 0.1] [--seed split0]

Writes under --output:
    docs/   parquet (doc_id, text, split) for ALL surviving docs
    pack/   parquet packing map for the train split (sequence_pack cols)
and prints ONE JSON summary line with per-stage row counts — the
audit trail a pipeline operator reads before pointing a trainer at it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", default=None)
    p.add_argument("--n-synthetic-convs", type=int, default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--budget", type=int, default=2048)
    p.add_argument("--shards", type=int, default=64)
    p.add_argument("--quality-floor", type=float, default=0.5)
    p.add_argument("--lang", default="latin-script",
                   help="keep docs with this langid label ('' disables)")
    p.add_argument("--ppl-max", type=float, default=None,
                   help="CCNet-style model filter: after the heuristic "
                        "cleanse, train a bigram LM on the surviving docs "
                        "and drop docs whose perplexity exceeds this (also "
                        "drops <2-token docs, which have no perplexity)")
    p.add_argument("--token-budget", type=int, default=None,
                   help="cap the train split at this many tokens, "
                        "keeping the highest-quality docs first "
                        "(sampling.budget_sample approx path — "
                        "percentile cutoffs + whole quality buckets, "
                        "scan-shaped, no global sort)")
    p.add_argument("--budget-buckets", type=int, default=32,
                   help="token-budget selection granularity")
    p.add_argument("--no-dedup", action="store_true")
    p.add_argument("--no-decontaminate", action="store_true")
    p.add_argument("--train", type=float, default=0.8)
    p.add_argument("--val", type=float, default=0.1)
    p.add_argument("--seed", default="split0")
    p.add_argument("--resume", action="store_true",
                   help="restart from a leftover staged split (skips the "
                        "cleanse stages); opt-in because staging from a "
                        "different input cannot be detected")
    p.add_argument("--local-cpus", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from search_engine_spark.corpus import synthesize_transcripts
    from search_engine_spark.operators.docids import assign_doc_ids
    from search_engine_spark.operators.sampling import (
        dataset_split,
        decontaminate,
        sequence_pack,
        training_cleanse,
    )
    from search_engine_spark.sources.transcripts import read_transcripts

    if args.local_cpus:
        from search_engine_spark.session import build_session

        spark = build_session("prepare_dataset", cpus=args.local_cpus)
    else:
        spark = (
            SparkSession.builder.appName("prepare_dataset")
            # deep cleanse lineage stringifies to GBs in the event
            # listener and OOMs a default 1g spark-submit driver
            .config("spark.sql.maxPlanStringLength", str(1 << 20))
            .getOrCreate()
        )

    if args.input:
        transcripts = read_transcripts(spark, args.input)
    elif args.n_synthetic_convs:
        transcripts = synthesize_transcripts(spark, args.n_synthetic_convs)
    else:
        p.error("need --input or --n-synthetic-convs")

    staging = os.path.join(args.output, "_staging_split")
    staging_counts = os.path.join(args.output, "_staging_counts.json")
    resumed = (
        args.resume
        and os.path.exists(os.path.join(staging, "_SUCCESS"))
        and os.path.exists(staging_counts)
    )
    if resumed:
        # explicit opt-in restart from the staged split: skips the
        # expensive cleanse (minhash/quality/lang). Opt-in, not
        # automatic — stale staging from a DIFFERENT input would
        # silently produce wrong output (same reason build_index gates
        # resume on the recorded input)
        with open(staging_counts) as fh:
            counts = json.load(fh)
        counts["resumed_from_staging"] = True
    else:
        # persist BEFORE the first action: everything downstream
        # (counts, minhash, shingles, quality) reuses the id assignment
        # instead of re-running the read + dense-rank per action
        docs = assign_doc_ids(transcripts).select("doc_id", "text").persist()
        counts = {"input": docs.count()}

        # stage 1: shared cleanse operator — the SAME recipe the
        # oracle-checked training_prepare driver query runs
        cleansed = training_cleanse(
            docs,
            quality_floor=args.quality_floor,
            lang=args.lang or None,
            dedup=not args.no_dedup,
        ).persist()
        counts["cleansed"] = cleansed.count()

        # stage 1b (opt-in): LM perplexity filter — the model tier of
        # the cleanse. Trained on the heuristically-cleansed corpus
        # itself (one groupBy pair), scored in one broadcast join; the
        # semi join keeps the doc columns untouched.
        if args.ppl_max is not None:
            from search_engine_spark.operators.lm import (
                cross_entropy,
                train_bigram_lm,
            )

            ce = cross_entropy(cleansed, train_bigram_lm(cleansed))
            keep = ce.filter(F.col("perplexity") <= args.ppl_max)
            cleansed = cleansed.join(
                keep.select("doc_id"), "doc_id", "left_semi"
            ).persist()
            counts["ppl_filtered"] = cleansed.count()

        # stage 2: deterministic split, STAGED to parquet — the write
        # both checkpoints the expensive cleanse (a --resume restart
        # starts here, not at minhash) and resets lineage: without it
        # the decontaminate/pack plans embed the whole cleanse tree and
        # their plan STRINGS alone OOM a default-size spark-submit
        # driver
        dataset_split(cleansed, train=args.train, val=args.val,
                      seed=args.seed).write.mode("overwrite").parquet(staging)
        with open(staging_counts, "w") as fh:
            json.dump(counts, fh)
    split = spark.read.parquet(staging)
    by_split = {r["split"]: r["count"]
                for r in split.groupBy("split").count().collect()}
    for s in ("train", "val", "test"):
        counts[s] = by_split.get(s, 0)

    # stage 3: decontaminate train against the held-out test split
    train = split.filter(F.col("split") == "train")
    if not args.no_decontaminate:
        ev = split.filter(F.col("split") == "test")
        train = decontaminate(train, ev, n=3).persist()
        counts["train_decontaminated"] = train.count()

    # stage 3b (opt-in): token-budget cap — highest-quality prefix of
    # the (decontaminated) train split under the budget; approx path
    # keeps the pipeline scan-shaped at any scale
    if args.token_budget is not None:
        from search_engine_spark.operators.sampling import budget_sample

        kept = budget_sample(train, args.token_budget, method="approx",
                             n_buckets=args.budget_buckets)
        train = train.join(
            kept.select("doc_id"), "doc_id", "left_semi"
        ).persist()
        counts["budget_sampled"] = train.count()

    # stage 4: write outputs. docs/ must agree with pack/: the train
    # partition holds exactly the decontaminated docs the pack map
    # covers (writing pre-decontamination train docs would silently
    # hand a trainer the contaminated ones back)
    out_docs = os.path.join(args.output, "docs")
    out_pack = os.path.join(args.output, "pack")
    final_docs = split.filter(F.col("split") != "train").unionByName(train)
    final_docs.write.mode("overwrite").partitionBy("split").parquet(out_docs)
    pack = sequence_pack(train, budget=args.budget, n_shards=args.shards)
    pack.write.mode("overwrite").parquet(out_pack)
    packed = spark.read.parquet(out_pack)
    counts["packed_docs"] = packed.count()
    counts["n_sequences"] = (
        packed.select("shard", "end_pack_id")
        .groupBy("shard").agg(F.max("end_pack_id").alias("m"))
        .agg(F.coalesce(F.sum(F.col("m") + 1), F.lit(0))).head()[0]
    )
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    if os.path.exists(staging_counts):
        os.remove(staging_counts)
    print(json.dumps(counts), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
