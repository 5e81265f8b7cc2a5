"""Benchmark harness (driver-run per round; BENCH_r{N}.json).

Measures the headline north_star metric — inverted-index build
throughput (turns/sec) over the synthetic transcript corpus, including
compressed-segment encoding — plus per-query latencies for the BM25
engines and the training-pipeline operators over $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "index_build": {...}}

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default: measured effective parallelism — see
session.effective_cpu_count; raw nproc thrashes on hosts whose vCPUs
are hypervisor-oversubscribed), BENCH_N_CONV (default 30000 convs
≈ 630k turns), BENCH_SKIP_SEGMENTS=1 to skip segment encoding.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# FROZEN cross-round headline subset (VERDICT r3 next-round #5): the
# full suite grows every round (92 -> 106 -> ...) so its total is not
# comparable across rounds; this named subset IS. Do not add to or
# remove from it — new operators belong in `suite` below, which feeds
# the full total, not the headline block.
HEADLINE_KEYS = (
    "index_build",
    "bm25_df_q0", "bm25_df_q1", "bm25_df_q2", "bm25_df_q3",
    "bm25_wand_q0", "bm25_wand_q1", "bm25_wand_q2", "bm25_wand_q3",
    "minhash_lsh_pairs", "ngram_jaccard_pairs", "dedup_keepers",
    "training_prepare",
)


def _ann_recall(spark, sf_dir: str, k: int = 10, n_queries: int = 15) -> dict:
    """Measured recall@k of every ANN path vs exact brute-force ground
    truth over the driver embeddings table — quality evidence beside
    the latency numbers (a fast ANN scan with unknown recall is not
    'done'). Deterministic: the query sample is the lowest non-zero
    vec_ids; ground truth and reranks share the pinned
    (cosine desc, vec_id asc) tie-break. SQ8 ranks by integer MIPS
    (documented metric trade), so its recall is the honest price of the
    4x memory cut."""
    import numpy as np
    from pyspark.sql import functions as F

    from search_engine_spark.operators.similarity import (
        brute_force_topk,
        build_ivf_index,
        build_srp_index,
        ivf_query_topk,
        sq8_params,
        sq8_topk,
        srp_query_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    rows = emb.orderBy("vec_id").limit(n_queries * 2).collect()
    queries = []
    for r in rows:
        vec = [float(x) for x in r["embedding"]]
        if float(np.dot(vec, vec)) > 0.0:  # cosine undefined for zero rows
            queries.append((int(r["vec_id"]), vec))
        if len(queries) == n_queries:
            break
    dim = len(queries[0][1])
    truth = {
        vid: {r["vec_id"] for r in brute_force_topk(emb, vec, k=k).collect()}
        for vid, vec in queries
    }
    srp = build_srp_index(emb, dim=dim, n_planes=8, n_tables=4).cache()
    srp.count()
    ivf_idx, cents = build_ivf_index(emb, dim=dim, n_clusters=16)
    ivf_idx = ivf_idx.cache()
    ivf_idx.count()
    mins, invs = sq8_params(emb, dim=dim)
    # Two knob settings per probe-bounded method: the driver embeddings
    # are UNSTRUCTURED random unit vectors (no neighborhood structure —
    # the worst case for bucketed ANN), so absolute recall is bounded by
    # probe coverage; what must show is the recall LEVER rising with
    # multiprobe/n_probe at proportional probe cost. SQ8 scans
    # everything (approximation is quantization only) — expect ~1.0.
    from search_engine_spark.operators.similarity import (
        hash_centroids,
        ivfpq_topk,
        pq_codebooks,
        pq_halfsq,
        pq_sample_parquet,
        pq_topk,
        pq_train_codebooks,
    )

    pq_cb = pq_codebooks(dim, 8, 16)
    coarse_cents = hash_centroids(dim, 16)
    # trained path (round-5 default for jobs/ann.py --method pq): data-
    # adapted per-subspace k-means codebooks at the shipped m=16/ks=64
    # geometry; ADC-only and the rerank-refined form the CLI exposes.
    # The r4 verdict's bar: the refined configuration must sit in IVF's
    # >= 0.8 recall band (random-codebook pq measured 0.18).
    sample = pq_sample_parquet(sf_dir)
    tr_cb = pq_train_codebooks(sample, m=16, ks=64)
    tr_biases = pq_halfsq(tr_cb)
    ivfpq_tr_cb = pq_train_codebooks(sample, m=16, ks=64, centroids=cents)
    ivfpq_tr_biases = pq_halfsq(ivfpq_tr_cb)
    hits: dict[str, list[float]] = {
        "srp_mp1": [], "srp_mp2": [], "ivf_p4": [], "ivf_p8": [],
        "sq8": [], "pq": [], "ivfpq_p4": [], "ivfpq_p8": [],
        "pq_tr": [], "pq_tr_rr4": [], "ivfpq_tr_p8_rr4": [],
    }
    for vid, vec in queries:
        for name, mp in (("srp_mp1", 1), ("srp_mp2", 2)):
            got = {r["vec_id"] for r in
                   srp_query_topk(srp, vec, k=k, n_planes=8, n_tables=4,
                                  multiprobe_hamming=mp).collect()}
            hits[name].append(len(got & truth[vid]) / k)
        for name, np_ in (("ivf_p4", 4), ("ivf_p8", 8)):
            got = {r["vec_id"] for r in
                   ivf_query_topk(emb, ivf_idx, cents, vec, k=k,
                                  n_probe=np_).collect()}
            hits[name].append(len(got & truth[vid]) / k)
        got = {r["vec_id"] for r in
               sq8_topk(emb, vec, mins, invs, k=k).collect()}
        hits["sq8"].append(len(got & truth[vid]) / k)
        got = {r["vec_id"] for r in
               pq_topk(emb, vec, pq_cb, k=k).collect()}
        hits["pq"].append(len(got & truth[vid]) / k)
        for name, np2 in (("ivfpq_p4", 4), ("ivfpq_p8", 8)):
            got = {r["vec_id"] for r in
                   ivfpq_topk(emb, vec, coarse_cents, pq_cb, k=k,
                              n_probe=np2).collect()}
            hits[name].append(len(got & truth[vid]) / k)
        got = {r["vec_id"] for r in
               pq_topk(emb, vec, tr_cb, k=k, biases=tr_biases).collect()}
        hits["pq_tr"].append(len(got & truth[vid]) / k)
        got = {r["vec_id"] for r in
               pq_topk(emb, vec, tr_cb, k=k, biases=tr_biases,
                       rerank_embeddings=emb, rerank_factor=4).collect()}
        hits["pq_tr_rr4"].append(len(got & truth[vid]) / k)
        got = {r["vec_id"] for r in
               ivfpq_topk(emb, vec, cents, ivfpq_tr_cb, k=k, n_probe=8,
                          coding="plain", biases=ivfpq_tr_biases,
                          rerank_embeddings=emb,
                          rerank_factor=4).collect()}
        hits["ivfpq_tr_p8_rr4"].append(len(got & truth[vid]) / k)
    srp.unpersist()
    ivf_idx.unpersist()
    emb.unpersist()
    out = {m: round(sum(v) / len(v), 4) for m, v in hits.items()}
    out.update({"k": k, "n_queries": len(queries)})
    return out


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from search_engine_spark.corpus import synthesize_transcripts
    from search_engine_spark.operators.compression import build_segments
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.query import bm25_topk
    from search_engine_spark.operators.wand import wand_topk
    from search_engine_spark.session import build_session

    from search_engine_spark.session import effective_cpu_count

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env_cpus = os.environ.get("SPARK_GRAFT_CPUS")
    # default: measured usable parallelism, not nproc — this host's 32
    # vCPUs carry ~16 cores of real capacity and a 32-thread session
    # thrashes (see session.effective_cpu_count)
    cpus = int(env_cpus) if env_cpus else effective_cpu_count()
    n_conv = int(os.environ.get("BENCH_N_CONV", "30000"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # ---- host-health PRECONDITION (VERDICT r2 "do this #1") -------------
    # BENCH_r02 was recorded in a starved window (concurrency_ratio
    # 0.088) and its regressions were unadjudicatable. Retry for up to
    # BENCH_HEALTH_TIMEOUT_SEC (default 15 min) waiting for a healthy
    # memory-bandwidth control; if the host never recovers, proceed but
    # stamp the output with `"starved_window": true` so the numbers are
    # explicitly self-invalidating (round-3 observation: this sandbox
    # has shown ratios of 0.01-0.04 for hours at a stretch — a hard
    # refusal would starve the driver of ANY per-round line).
    # BENCH_STRICT=1 restores the hard refusal; BENCH_MIN_HEALTH
    # overrides the ratio floor.
    from search_engine_spark.session import memory_bandwidth_control

    min_ratio = float(os.environ.get("BENCH_MIN_HEALTH", "5.0"))
    timeout_s = float(os.environ.get("BENCH_HEALTH_TIMEOUT_SEC", "900"))
    probe_workers = min(cpus, 8)
    t_gate = time.monotonic()
    pre_control = memory_bandwidth_control(probe_workers)
    while (
        pre_control["concurrency_ratio"] < min_ratio
        and time.monotonic() - t_gate < timeout_s
    ):
        log(
            f"host starved (control ratio "
            f"{pre_control['concurrency_ratio']} < {min_ratio}); waiting "
            f"{int(timeout_s - (time.monotonic() - t_gate))}s more for a "
            "healthy window..."
        )
        time.sleep(60)
        pre_control = memory_bandwidth_control(probe_workers)
    starved = pre_control["concurrency_ratio"] < min_ratio
    if starved:
        if os.environ.get("BENCH_STRICT") == "1":
            print(
                json.dumps(
                    {
                        "metric": "index_build_plus_query_suite",
                        "value": -1.0,
                        "unit": "sec",
                        "queries": {},
                        "sf": sf,
                        "error": "host starved past BENCH_HEALTH_TIMEOUT_SEC; "
                                 "wall-times would be machine noise "
                                 "(BENCH_STRICT=1)",
                        "host_control_pre": pre_control,
                    }
                ),
                flush=True,
            )
            return
        log(
            "WARNING: proceeding in a starved window — every wall-time "
            "below is machine noise; output carries starved_window=true"
        )

    spark = build_session("bench", cpus=cpus)
    timings: dict[str, float] = {}
    t_all = time.monotonic()

    # per-invocation scratch dirs: concurrent bench runs on one machine
    # must not overwrite each other's spilled tables (ADVICE r1)
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="bench_")

    # ---- headline: index build throughput (turns/sec) -------------------
    t0 = time.monotonic()
    transcripts = synthesize_transcripts(spark, n_conv)
    # materialize corpus first so generation cost isn't counted as build
    transcripts.write.mode("overwrite").parquet(f"{work}/corpus")
    corpus = spark.read.parquet(f"{work}/corpus")
    n_turns = corpus.count()
    gen_sec = time.monotonic() - t0
    log(f"corpus: {n_turns} turns in {gen_sec:.1f}s")

    t0 = time.monotonic()
    # headline = the at-scale build definition (same as scaling_bench):
    # docs + doc_terms + dictionary + doclen; compressed segments below.
    # The uncompressed postings copy is NOT part of the at-scale build
    # (the segments are the posting store) — it is materialized untimed
    # afterwards so the DataFrame-engine query latencies stay comparable.
    # Same auto-detection as jobs/build_index.py: a provably presorted
    # corpus dir takes the zero-shuffle docID path (the verification
    # scan is measured — it IS the assignment cost).
    from search_engine_spark.operators.docids import docs_from_sorted_dir
    from search_engine_spark.operators.index_build import build_index_presorted

    pres = docs_from_sorted_dir(spark, f"{work}/corpus", ["conv_id", "turn_idx"])
    if pres is not None:
        ix = build_index_presorted(pres, use_arrow_udf=True, weighted=True,
                                   scratch_dir=f"{work}/index",
                                   materialize_postings=False)
    else:
        ix = build_index(corpus, use_arrow_udf=True, weighted=True,
                         scratch_dir=f"{work}/index", materialize_postings=False)
    log(f"docid path: {'presorted' if pres is not None else 'range_exchange'}")
    core_sec = time.monotonic() - t0

    seg_sec = 0.0
    segments = None
    if os.environ.get("BENCH_SKIP_SEGMENTS") != "1":
        t0 = time.monotonic()
        segments = build_segments(ix, bucket_width=1 << 16).persist()
        n_blocks = segments.count()
        seg_sec = time.monotonic() - t0
        log(f"segments: {n_blocks} blocks in {seg_sec:.1f}s")

    build_sec = core_sec + seg_sec
    turns_per_sec = n_turns / build_sec if build_sec else 0.0
    timings["index_build"] = round(build_sec, 3)
    log(f"index build: {build_sec:.1f}s -> {turns_per_sec:.0f} turns/sec")

    # untimed: materialize the postings view for the DF-engine queries
    # (bucket-partitioned + lemma-clustered files -> min/max file
    # pruning on query terms AND >=n_buckets files for a Zipf-hot
    # lemma's scan parallelism — the same v4 layout write_index
    # publishes). _read_table strips the storage-only bucket column.
    from search_engine_spark.sources.index_store import (
        _publish_postings,
        _read_table,
    )

    _publish_postings(ix.postings, f"{work}/index", bucket_width=1 << 16)
    ix.postings = _read_table(spark, f"{work}/index/postings")

    # ---- query latency on the built transcript index --------------------
    bench_queries = ["w00000", "w00159 w00268", "needlealpha", "w00000s w00001"]
    # one untimed warmup query: steady-state latency, not first-query JIT
    bm25_topk(ix, "w00042", k=10).collect()
    for i, q in enumerate(bench_queries):
        t0 = time.monotonic()
        bm25_topk(ix, q, k=10).collect()
        timings[f"bm25_df_q{i}"] = round(time.monotonic() - t0, 3)
    if segments is not None:
        for i, q in enumerate(bench_queries):
            t0 = time.monotonic()
            wand_topk(segments, ix.terms, q, k=10, stats=ix.stats).collect()
            timings[f"bm25_wand_q{i}"] = round(time.monotonic() - t0, 3)

    # ---- operator suite over the driver testdata ------------------------
    suite = [
        "bm25_topk", "bm25_topk_sql", "bm25_topk_batch",
        "ngram_jaccard_pairs",
        "minhash_lsh_pairs", "dedup_keepers", "training_cleanse",
        "simhash_pairs", "embedding_topk", "embedding_topk_per_label",
        "srp_ann_topk", "srp_ann_topk_disk", "ivf_ann_topk",
        "ivf_ann_topk_disk", "ivf_ann_mutated_index",
        "bm25_topk_wand_tree", "embedding_neardup_pairs",
        "srp_neardup_pairs",
        "token_counts", "quality_scores", "fingerprints",
        "phrase_search", "phrase_search_positional", "near_search",
        "near_search_positional", "search_composed",
        "search_composed_not", "search_composed_or", "search_grouped",
        "search_scoped_field",
        "prefix_search", "fuzzy_search",
        "related_terms", "more_like_this", "facets",
        "bm25_topk_or", "bm25_topk_or_wand",
        "snippets", "multimodal_features", "dead_letters",
        "field_subtraction", "event_windows", "top_users_per_event",
        "dataset_split", "contamination", "pii_scrub",
        "duplicate_spans", "chunk_documents", "quality_resample",
        "exact_n_sample",
        "hybrid_rrf", "prf_search", "contamination_bloom", "bloom_bits",
        "semdedup_pairs", "semdedup_keepers",
        "lm_doc_perplexity", "dsir_resample_topk",
        # completeness sweep: every registered operator query except the
        # raw index-table dumps (postings/terms/doclen/titles — collect
        # volume, not operator latency)
        "and_search", "bm25_paginated", "bm25_topk_rare",
        "bm25_topk_scoped", "bm25_topk_wand", "cms_counters",
        "corpus_profile", "dedup_exact", "hll_registers", "langid",
        "lemma_frequency_top10", "lm_bigram_model", "reference_relevance",
        "repetition_signals", "result_merge", "search_wildcard",
        "sequence_pack", "sq8_topk", "pq_topk", "ivfpq_topk",
        "ivfpq_topk_disk", "statistics", "stratified_sample",
        "suggest_spelling", "training_prepare", "trending_events",
        "lm_ppl_buckets", "lm_ppl_buckets_approx", "bm25_topk_grouped",
        "bpe_merges", "bpe_token_counts",
        "qld_topk", "hybrid_linear", "collocations", "keyphrases", "bm25f_topk",
        "gopher_filter", "span_rewrite", "hard_negatives",
        "doclen_percentiles", "bm25_topk_collapsed",
        "date_histogram", "significant_terms", "doc_term_vector",
        "embedding_topk_filtered", "regexp_search", "latest_hits",
        "conversation_context", "bm25_param_sweep", "span_near_search",
        # round-5 additions
        "pq_topk_trained", "pq_topk_trained_rerank", "ivfpq_topk_trained",
        "bm25f_topk_indexed", "nb_classify", "budget_sample",
        "budget_sample_approx", "winnow_fingerprints",
        "bm25_topk_proximity", "event_pagerank", "mixture_sample",
        "term_drift", "pack_conversations", "textrank_keywords",
    ]
    qs = entrymod.queries()
    # the disk-ANN queries lazily build their persistent index on first
    # call (cached in entrymod._INDEX_CACHE); warm that construction OUTSIDE
    # the timed region so their numbers measure the PROBE (the operation
    # the name claims), not a one-time build — index construction cost
    # is reported separately (index_build / ann_index_build_sec below)
    ann_build_sec = {}
    for name in ("srp_ann_topk_disk", "ivf_ann_topk_disk",
                 "ivf_ann_mutated_index", "ivfpq_topk_disk",
                 "bm25f_topk_indexed"):  # field-index build warms here too
        if name in suite:
            t0 = time.monotonic()
            try:
                qs[name](spark, sf_dir).collect()
                ann_build_sec[name] = round(time.monotonic() - t0, 3)
            except Exception as exc:
                log(f"bench warmup {name} failed: {exc}")
    for name in suite:
        t0 = time.monotonic()
        try:
            qs[name](spark, sf_dir).collect()
            timings[name] = round(time.monotonic() - t0, 3)
        except Exception as exc:  # keep the bench line intact on failure
            log(f"bench query {name} failed: {exc}")
            timings[name] = -1.0

    # ---- ANN quality: recall@k vs exact ground truth ---------------------
    ann_recall = None
    if os.environ.get("BENCH_SKIP_RECALL") != "1":
        t0 = time.monotonic()
        ann_recall = _ann_recall(spark, sf_dir)
        ann_recall["wall_sec"] = round(time.monotonic() - t0, 3)
        log(f"ann recall@{ann_recall['k']}: {ann_recall}")

    total = round(time.monotonic() - t_all, 3)

    # untimed: host-capacity control (~5s), recorded so every wall-clock
    # number above carries the machine state it was measured under
    # (this sandbox's memory bandwidth drifts minute-to-minute —
    # BASELINE.md "drifted host"; ratio ~cpus = healthy, <2 = starved).
    # Both the pre-gate reading and this post-run reading are recorded:
    # a window that closed MID-run shows up as pre-healthy/post-starved.
    control = memory_bandwidth_control(probe_workers)
    log(f"host control: pre={pre_control} post={control}")

    out = {
        "metric": "index_build_plus_query_suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "index_build": {
            "n_turns": n_turns,
            "build_sec": round(build_sec, 3),
            "turns_per_sec": round(turns_per_sec, 1),
            "segment_encode_sec": round(seg_sec, 3),
            "cpus": cpus,
        },
        "ann_recall": ann_recall,
        # one-time disk-ANN index construction (warmed before the timed
        # loop so the query numbers measure the probe)
        "ann_index_build_sec": ann_build_sec,
        # frozen cross-round comparison block (see HEADLINE_KEYS)
        "headline": {
            k: timings[k] for k in HEADLINE_KEYS if k in timings
        },
        "headline_total_sec": round(
            sum(timings[k] for k in HEADLINE_KEYS
                if k in timings and timings[k] >= 0), 3
        ),
        "host_control": control,
        "host_control_pre": pre_control,
        # True when the pre-gate control never reached min_ratio: the
        # wall-times above measure the MACHINE, not the engine — compare
        # only against runs whose controls are healthy
        "starved_window": bool(starved),
    }
    print(json.dumps(out), flush=True)
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
