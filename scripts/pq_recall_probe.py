"""Measure recall@k of the PQ family configurations against exact
cosine ground truth — the experiment harness behind the round-5
trained-codebook default (VERDICT r4 "what's wrong #1": random
codebooks measured 0.18-0.20 recall@10).

Usage: python scripts/pq_recall_probe.py [sf_dir] [n_queries]
Prints one JSON line per configuration.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    k = 10

    from search_engine_spark.operators.similarity import (
        brute_force_topk,
        build_ivf_index,
        hash_centroids,
        ivfpq_topk,
        pq_codebooks,
        pq_halfsq,
        pq_sample_parquet,
        pq_topk,
        pq_train_codebooks,
    )
    from search_engine_spark.session import build_session

    spark = build_session("pq-recall-probe", cpus=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_total = emb.count()
    rows = emb.orderBy("vec_id").limit(n_queries * 2).collect()
    queries = []
    for r in rows:
        vec = [float(x) for x in r["embedding"]]
        if float(np.dot(vec, vec)) > 0.0:
            queries.append((int(r["vec_id"]), vec))
        if len(queries) == n_queries:
            break
    dim = len(queries[0][1])
    truth = {
        vid: {r["vec_id"] for r in brute_force_topk(emb, vec, k=k).collect()}
        for vid, vec in queries
    }

    sample = pq_sample_parquet(sf_dir)
    _, kcents = build_ivf_index(emb, dim=dim, n_clusters=16)
    hcents = hash_centroids(dim, 16)

    configs: dict[str, dict] = {}

    def pq_cfg(name, m, ks, trained, rerank=None):
        cb = (pq_train_codebooks(sample, m=m, ks=ks) if trained
              else pq_codebooks(dim, m, ks))
        biases = pq_halfsq(cb) if trained else None
        configs[name] = dict(kind="pq", cb=cb, biases=biases, rerank=rerank)

    pq_cfg("pq_tr_m16k64", 16, 64, True)
    pq_cfg("pq_tr_m32k16", 32, 16, True)
    pq_cfg("pq_tr_m16k16_rr8", 16, 16, True, rerank=8)
    pq_cfg("pq_tr_m16k64_rr4", 16, 64, True, rerank=4)
    pq_cfg("pq_tr_m16k64_rr8", 16, 64, True, rerank=8)
    pq_cfg("pq_tr_m32k16_rr4", 32, 16, True, rerank=4)
    pq_cfg("pq_tr_m16k256", 16, 256, True)

    for name, cents, m, ks, np_ in (
        ("ivfpq_tr_km_m16k64_p8", kcents, 16, 64, 8),
    ):
        cb = pq_train_codebooks(sample, m=m, ks=ks, centroids=cents)
        configs[name] = dict(kind="ivfpq", cb=cb, biases=pq_halfsq(cb),
                             cents=cents, n_probe=np_)

    out = {}
    for name, cfg in configs.items():
        hits = []
        for vid, vec in queries:
            if cfg["kind"] == "pq":
                got = pq_topk(
                    emb, vec, cfg["cb"], k=k, biases=cfg["biases"],
                    rerank_embeddings=emb if cfg["rerank"] else None,
                    rerank_factor=cfg["rerank"] or 4,
                )
            else:
                got = ivfpq_topk(
                    emb, vec, cfg["cents"], cfg["cb"], k=k,
                    n_probe=cfg["n_probe"], coding="plain",
                    biases=cfg["biases"],
                )
            ids = {r["vec_id"] for r in got.collect()}
            hits.append(len(ids & truth[vid]) / k)
        out[name] = round(sum(hits) / len(hits), 4)
        print(json.dumps({"config": name, "recall": out[name],
                          "n": n_total}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
