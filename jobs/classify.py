"""spark-submit entry point: train / apply the multinomial Naive Bayes
text classifier (operators/classify.py) — corpus routing for a training
pipeline (language ID, source attribution, domain gating).

Usage:
    python jobs/classify.py train --input docs.parquet --model <dir> \
        [--label-col lang] [--text-col text] [--alpha 1.0] [--local-cpus N]
    python jobs/classify.py score --input docs.parquet --model <dir> \
        [--output out.parquet] [--text-col text] [--local-cpus N]
    python jobs/classify.py eval --input docs.parquet --model <dir> \
        [--label-col lang] [--local-cpus N]

``train`` persists the model as two parquet tables (cond counts,
priors) plus ``_nb_meta.json`` (vocab size, doc count, alpha, the
training columns) — counts, not probabilities, so a later ``train``
over MORE data can merge by addition and the scoring smoothing stays
a query-time choice. ``score`` writes/prints (doc_id, label, score);
``eval`` scores a LABELED corpus and reports accuracy + per-class
counts (the confusion diagonal) — the train/val loop's feedback.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["train", "score", "eval"])
    p.add_argument("--input", required=True, help="documents parquet")
    p.add_argument("--model", required=True, help="model directory")
    p.add_argument("--label-col", default="lang")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--output", default=None,
                   help="score: write parquet here instead of printing")
    p.add_argument("--limit", type=int, default=20,
                   help="score (no --output): print at most N rows")
    p.add_argument("--local-cpus", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    if args.local_cpus:
        from search_engine_spark.session import build_session

        spark = build_session("classify", cpus=args.local_cpus)
    else:
        spark = SparkSession.builder.appName("classify").getOrCreate()

    from search_engine_spark.operators.classify import (
        NBModel,
        nb_classify,
        nb_train,
    )

    meta_path = os.path.join(args.model, "_nb_meta.json")

    def load_model() -> NBModel:
        if not os.path.exists(meta_path):
            print(f"no NB model at {args.model} (_nb_meta.json missing); "
                  "run train first", file=sys.stderr)
            spark.stop()
            sys.exit(2)
        with open(meta_path) as fh:
            meta = json.load(fh)
        return NBModel(
            cond=spark.read.parquet(os.path.join(args.model, "cond")),
            priors=spark.read.parquet(os.path.join(args.model, "priors")),
            vocab_size=int(meta["vocab_size"]),
            n_docs=int(meta["n_docs"]),
            alpha=float(meta["alpha"]),
        )

    docs = spark.read.parquet(args.input)

    if args.mode == "train":
        model = nb_train(docs, label_col=args.label_col,
                         text_col=args.text_col, alpha=args.alpha,
                         id_col=args.id_col)
        os.makedirs(args.model, exist_ok=True)
        model.cond.write.mode("overwrite").parquet(
            os.path.join(args.model, "cond"))
        model.priors.write.mode("overwrite").parquet(
            os.path.join(args.model, "priors"))
        meta = {"vocab_size": model.vocab_size, "n_docs": model.n_docs,
                "alpha": model.alpha, "label_col": args.label_col,
                "text_col": args.text_col}
        with open(meta_path + ".tmp", "w") as fh:
            json.dump(meta, fh)
        os.replace(meta_path + ".tmp", meta_path)
        n_labels = model.priors.count()
        print(json.dumps({"trained": args.model, "labels": int(n_labels),
                          **meta}), flush=True)
        spark.stop()
        return

    model = load_model()
    scored = nb_classify(docs, model, text_col=args.text_col,
                         id_col=args.id_col)

    if args.mode == "score":
        if args.output:
            scored.write.mode("overwrite").parquet(args.output)
            print(json.dumps({"scored": args.output,
                              "rows": scored.count()}), flush=True)
        else:
            for r in scored.orderBy("doc_id").limit(args.limit).collect():
                print(json.dumps({"doc_id": r["doc_id"],
                                  "label": r["label"],
                                  "score": r["score"]}), flush=True)
        spark.stop()
        return

    # eval: accuracy + per-class hit counts against the labeled column
    from pyspark.sql import functions as F

    truth = docs.select(F.col(args.id_col).alias("doc_id"),
                        F.col(args.label_col).alias("_truth"))
    joined = scored.join(truth, "doc_id")
    per_class = (
        joined.groupBy("_truth")
        .agg(F.count("*").alias("n"),
             F.sum(F.when(F.col("label") == F.col("_truth"), 1)
                   .otherwise(0)).alias("hits"))
        .orderBy("_truth")
        .collect()
    )
    n = sum(int(r["n"]) for r in per_class)
    hits = sum(int(r["hits"]) for r in per_class)
    print(json.dumps({
        "n": n,
        "accuracy": round(hits / n, 4) if n else None,
        "per_class": {r["_truth"]: {"n": int(r["n"]),
                                    "hits": int(r["hits"])}
                      for r in per_class},
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
