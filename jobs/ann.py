"""spark-submit entry point: persistent ANN index over an embedding
table — build the partition-pruned SRP index once, probe it many times,
or run the exact brute-force baseline for recall spot-checks.

Usage:
    python jobs/ann.py build --embeddings <parquet> --index <dir> \
        [--method srp|ivf] [--planes 8] [--tables 4] [--group-bits 5] \
        [--clusters 16] [--local-cpus N]
    python jobs/ann.py append --embeddings <delta_parquet> --index <dir> \
        [--allow-duplicates] [--local-cpus N]
    python jobs/ann.py delete --embeddings <parquet> --index <dir> \
        --vec-ids "7,42,99" [--local-cpus N]
    python jobs/ann.py rebuild --embeddings <parquet> --index <dir> \
        [--clusters K] [--no-snapshot]   # IVF: re-fit drifted centroids
    python jobs/ann.py snapshots --embeddings <parquet> --index <dir> \
        [--expire-keep N]
    python jobs/ann.py query --embeddings <parquet> --index <dir> \
        (--vec-id ID | --vector "0.1,0.2,...") [--k 10] \
        [--multiprobe 1] [--n-probe 4] [--brute] [--local-cpus N]

``append`` folds NEW vectors into an existing index (either family)
using the parameters recorded in its meta, rewriting ONLY the partition
dirs that received rows — O(delta), not O(index).

``refresh`` is the STREAMING form of append: treat --embeddings as a
location where new files keep landing, drain whatever is new
(Trigger.AvailableNow + checkpoint → exactly-once per file), and fold
each micro-batch in with the same partition-bounded appends. Re-emitted
ids in new files are skipped, not fatal (--duplicates skip|error|allow).
Run it from cron / a scheduler and the ANN index tracks the embedding
table with no rebuilds.

``build`` persists ids-only (table, bucket-group)-partitioned lists
(similarity.write_srp_index) plus an ``_ann_meta.json`` (underscore-prefixed: parquet
directory listing ignores it, like _SUCCESS) recording the
hashing parameters, so ``query`` never needs the flags repeated — the
same contract as the search index's stats.json. ``query`` prints one
JSON line per hit {vec_id, cosine}; ``--brute`` bypasses the index for
the exact baseline (recall spot-check: compare the two outputs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("mode",
                   choices=["build", "append", "refresh", "delete", "query",
                            "snapshots", "rebuild"])
    p.add_argument("--embeddings", required=True,
                   help="parquet with (vec_id long, embedding array)")
    p.add_argument("--index", required=True, help="SRP index dir")
    p.add_argument("--method", choices=["srp", "ivf", "pq"], default="srp",
                   help="index family: SRP-LSH bucket tables, IVF "
                        "coarse-quantizer id lists, or IVF-PQ "
                        "direction/norm residual codes (codes-only "
                        "probes; --rerank for exact refinement)")
    p.add_argument("--planes", type=int, default=8)
    p.add_argument("--clusters", type=int, default=None,
                   help="IVF cluster count (build: default 16; "
                        "rebuild: default = the old model's count)")
    p.add_argument("--n-probe", type=int, default=4,
                   help="IVF probe width (query recall lever)")
    p.add_argument("--tables", type=int, default=4)
    p.add_argument("--group-bits", type=int, default=5)
    p.add_argument("--vec-id", type=int, default=None,
                   help="query by an existing vector's id")
    p.add_argument("--vector", default=None,
                   help="query by a literal comma-separated vector")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--multiprobe", type=int, default=1,
                   help="probe Hamming radius (recall lever)")
    p.add_argument("--rerank", action="store_true",
                   help="pq query: exact-rerank the top k*4 ADC "
                        "candidates against the embedding table")
    p.add_argument("--pq-codebooks", choices=["trained", "oracle"],
                   default="trained",
                   help="pq build: 'trained' (default) fits per-subspace "
                        "k-means codebooks on the lowest-id sample "
                        "(recall@10 ~0.86 with --rerank vs ~0.2 for "
                        "random codebooks — measured, scripts/"
                        "pq_recall_probe.py); 'oracle' keeps the "
                        "deterministic hash codebooks whose arithmetic "
                        "the DuckDB differential oracle replays")
    p.add_argument("--pq-m", type=int, default=16,
                   help="pq build: subspace count (trained default 16)")
    p.add_argument("--pq-ks", type=int, default=64,
                   help="pq build: codewords per subspace (trained "
                        "default 64 → 6-bit codes)")
    p.add_argument("--brute", action="store_true",
                   help="exact brute-force baseline (ignores the index)")
    p.add_argument("--allow-duplicates", action="store_true",
                   help="skip the already-indexed-id check on append")
    p.add_argument("--duplicates",
                   choices=["skip", "error", "allow", "upsert"],
                   default="skip",
                   help="refresh: policy for ids already in the index "
                        "(upsert = re-embedding: delete old, append new)")
    p.add_argument("--vec-ids", default=None,
                   help="delete: comma-separated ids to remove")
    p.add_argument("--no-snapshot", action="store_true",
                   help="delete: skip the automatic pre-state snapshot")
    p.add_argument("--as-of", type=int, default=None,
                   help="query: probe snapshot version v instead of live")
    p.add_argument("--expire-keep", type=int, default=None,
                   help="snapshots: drop all but the newest N")
    p.add_argument("--max-files-per-batch", type=int, default=None,
                   help="refresh: cap files per micro-batch "
                        "(maxFilesPerTrigger) — bound backfill batches, "
                        "required practice with --duplicates upsert")
    p.add_argument("--checkpoint", default=None,
                   help="refresh: stream checkpoint dir (default "
                        "<index>/_stream_checkpoint)")
    p.add_argument("--federate", default=None,
                   metavar="EMB:IDX[,EMB:IDX...]",
                   help="query: additional (embeddings, index) shard "
                        "pairs — per-shard probes, one cosine-ordered "
                        "merge (cosine is absolute, no global model)")
    p.add_argument("--local-cpus", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from search_engine_spark.operators.similarity import (
        append_ivf_index,
        append_srp_index,
        brute_force_topk,
        ivf_query_topk_disk,
        srp_query_topk_disk,
        write_ivf_index,
        write_srp_index,
    )

    if args.local_cpus:
        from search_engine_spark.session import build_session

        spark = build_session("ann", cpus=args.local_cpus)
    else:
        spark = SparkSession.builder.appName("ann").getOrCreate()

    meta_path = os.path.join(args.index, "_ann_meta.json")

    def read_emb():
        # lazy: refresh must no-op on an empty/initial incoming dir, and
        # delete/snapshots never need the vector table at all
        return spark.read.parquet(args.embeddings)


    if args.mode == "build":
        emb = read_emb()
        dim = len(emb.select("embedding").head()[0])
        if args.method == "pq":
            from search_engine_spark.operators.similarity import (
                write_ivfpq_index,
            )

            k_build = args.clusters or 16
            trained = args.pq_codebooks == "trained"
            m = args.pq_m if trained else 8
            ks = args.pq_ks if trained else 16
            write_ivfpq_index(
                emb, args.index, dim=dim, n_clusters=k_build, m=m, ks=ks,
                codebooks="train" if trained else None,
            )
            meta = {"method": "pq", "dim": dim, "n_clusters": k_build,
                    "m": m, "ks": ks, "codebooks": args.pq_codebooks,
                    "embeddings": os.path.abspath(args.embeddings)}
        elif args.method == "ivf":
            k_build = args.clusters or 16
            write_ivf_index(emb, args.index, dim=dim,
                            n_clusters=k_build)
            meta = {"method": "ivf", "dim": dim, "n_clusters": k_build,
                    "embeddings": os.path.abspath(args.embeddings)}
        else:
            write_srp_index(emb, args.index, dim=dim, n_planes=args.planes,
                            n_tables=args.tables, group_bits=args.group_bits)
            meta = {"method": "srp", "dim": dim, "n_planes": args.planes,
                    "n_tables": args.tables, "group_bits": args.group_bits,
                    "embeddings": os.path.abspath(args.embeddings)}
        with open(meta_path + ".tmp", "w") as fh:
            json.dump(meta, fh)
        os.replace(meta_path + ".tmp", meta_path)
        print(json.dumps({"built": args.index, **meta,
                          "n_vectors": emb.count()}), flush=True)
        spark.stop()
        return

    if args.mode == "append":
        if not os.path.exists(meta_path):
            print(f"no ANN index at {args.index} (_ann_meta.json missing); "
                  "run build first", file=sys.stderr)
            spark.stop()
            sys.exit(2)
        with open(meta_path) as fh:
            meta = json.load(fh)
        check = not args.allow_duplicates
        emb = read_emb()
        if meta.get("method") == "pq":
            from search_engine_spark.operators.similarity import (
                append_ivfpq_index,
            )

            affected = append_ivfpq_index(emb, args.index,
                                          check_duplicates=check)
        elif meta.get("method") == "ivf":
            affected = append_ivf_index(emb, args.index,
                                        check_duplicates=check)
        else:
            affected = append_srp_index(
                emb, args.index, dim=meta["dim"],
                n_planes=meta["n_planes"], n_tables=meta["n_tables"],
                group_bits=meta["group_bits"], check_duplicates=check,
            )
        print(json.dumps({"appended": emb.count(),
                          "affected_partitions": len(affected)}), flush=True)
        spark.stop()
        return

    if args.mode == "delete":
        if not args.vec_ids:
            print("delete needs --vec-ids", file=sys.stderr)
            spark.stop()
            sys.exit(2)
        from search_engine_spark.operators.similarity import (
            delete_from_ann_index,
        )

        ids = [int(x) for x in args.vec_ids.split(",")]
        affected = delete_from_ann_index(spark, args.index, ids,
                                         snapshot=not args.no_snapshot)
        print(json.dumps({"deleted_ids": len(ids),
                          "affected_partitions": len(affected)}), flush=True)
        spark.stop()
        return

    if args.mode == "rebuild":
        if not os.path.exists(meta_path):
            print(f"no ANN index at {args.index}", file=sys.stderr)
            spark.stop()
            sys.exit(2)
        with open(meta_path) as fh:
            meta = json.load(fh)
        if meta.get("method") != "ivf":
            print("rebuild re-fits IVF centroids; SRP hyperplanes are "
                  "data-independent (rebuild = build with new params)",
                  file=sys.stderr)
            spark.stop()
            sys.exit(2)
        from search_engine_spark.operators.similarity import (
            rebuild_ivf_index,
        )

        cent = rebuild_ivf_index(read_emb(), args.index,
                                 n_clusters=args.clusters,
                                 snapshot=not args.no_snapshot)
        meta["n_clusters"] = int(cent.shape[0])
        meta["embeddings"] = os.path.abspath(args.embeddings)
        with open(meta_path + ".tmp", "w") as fh:
            json.dump(meta, fh)
        os.replace(meta_path + ".tmp", meta_path)
        print(json.dumps({"rebuilt": args.index,
                          "n_clusters": meta["n_clusters"]}), flush=True)
        spark.stop()
        return

    if args.mode == "snapshots":
        from search_engine_spark.sources.index_store import (
            expire_snapshots,
            list_snapshots,
        )

        out = {"snapshots": list_snapshots(args.index)}
        if args.expire_keep is not None:
            out["expired"] = expire_snapshots(args.index,
                                              keep_last=args.expire_keep)
            out["snapshots"] = list_snapshots(args.index)
        print(json.dumps(out), flush=True)
        spark.stop()
        return

    if args.mode == "refresh":
        if not os.path.exists(meta_path):
            print(f"no ANN index at {args.index} (_ann_meta.json missing); "
                  "run build first", file=sys.stderr)
            spark.stop()
            sys.exit(2)
        from search_engine_spark.streaming.ann_refresh import (
            incremental_ann_refresh,
        )

        totals = incremental_ann_refresh(
            spark, args.embeddings, args.index,
            checkpoint_dir=args.checkpoint, on_duplicate=args.duplicates,
            max_files_per_batch=args.max_files_per_batch,
        )
        # O(delta) bookkeeping only — an index scan per cron tick would
        # betray the refresh's own never-O(index) contract; vector
        # counts come from index_stats' footer report when wanted
        print(json.dumps({"refreshed": args.index, **totals}), flush=True)
        spark.stop()
        return

    # query
    emb = read_emb()
    if (args.vec_id is None) == (args.vector is None):
        print("exactly one of --vec-id / --vector is required",
              file=sys.stderr)
        spark.stop()
        sys.exit(2)
    if args.vector is not None:
        qvec = [float(x) for x in args.vector.split(",")]
    else:
        row = emb.filter(F.col("vec_id") == args.vec_id).head()
        if row is None:
            print(f"vec_id {args.vec_id} not in {args.embeddings}",
                  file=sys.stderr)
            spark.stop()
            sys.exit(2)
        qvec = [float(x) for x in row["embedding"]]

    if args.federate:
        from search_engine_spark.operators.similarity import (
            federated_ann_topk,
        )

        shards = [(emb, args.index)]
        for pair in args.federate.split(","):
            e_path, i_path = pair.rsplit(":", 1)
            shards.append((spark.read.parquet(e_path), i_path))
        hits = federated_ann_topk(
            shards, qvec, k=args.k, n_probe=args.n_probe,
            multiprobe_hamming=args.multiprobe,
        ).collect()
        for r in hits:
            print(json.dumps({"shard": r["shard"], "vec_id": r["vec_id"],
                              "cosine": r["cosine"]}), flush=True)
        spark.stop()
        return

    if args.brute:
        hits = brute_force_topk(emb, qvec, k=args.k).collect()
    else:
        if not os.path.exists(meta_path):
            print(f"no ANN index at {args.index} (_ann_meta.json missing); "
                  "run build first", file=sys.stderr)
            spark.stop()
            sys.exit(2)
        with open(meta_path) as fh:
            meta = json.load(fh)
        if meta.get("method") == "pq":
            from search_engine_spark.operators.similarity import (
                ivfpq_query_topk_disk,
            )

            hits = ivfpq_query_topk_disk(
                spark, args.index, qvec, k=args.k, n_probe=args.n_probe,
                as_of=args.as_of,
                rerank_embeddings=emb if args.rerank else None,
            ).collect()
        elif meta.get("method") == "ivf":
            hits = ivf_query_topk_disk(
                emb, args.index, qvec, k=args.k, n_probe=args.n_probe,
                as_of=args.as_of,
            ).collect()
        else:
            hits = srp_query_topk_disk(
                emb, args.index, qvec, k=args.k,
                n_planes=meta["n_planes"], n_tables=meta["n_tables"],
                multiprobe_hamming=args.multiprobe,
                group_bits=meta["group_bits"], as_of=args.as_of,
            ).collect()
    for r in hits:
        out = {"vec_id": r["vec_id"]}
        out["cosine" if "cosine" in r else "qdot"] = (
            r["cosine"] if "cosine" in r else r["qdot"]
        )
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
