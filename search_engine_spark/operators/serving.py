"""Serving-side result shaping — the reference's API/UI surface
re-expressed as DataFrame operators.

Covers the SURVEY.md §2 rows that live between the scorer and the HTTP
response in the reference:

- U4  result merge        listMerge/listMergeEx outer-merge of two result
                          lists keyed by pageId (SearchService.java:162-190)
- J7  scope filter + join per-site search scoping and site-info join
                          (ApiService.java:36-47; SearchService.java:315-321)
- J8/A6 statistics        page/lemma/index counts per site joined to site
                          (SiteRepository.java:43-54)
- A4/O3 lemma frequency   all-site lemma frequency list ordered by df
                          (SearchService.java:289-296; SearchComponent.java:638-644)
- P6  title extract       substring-of-content title (ApiService.java:116-124)
- P8  snippet             ±window chars around the first match, <b>-wrapped
                          (ApiService.java:134-200) — lives in operators/query.py
- O2  offset/limit        pagination (ApiService.java:97-113) — query.paginate

All are built-ins only (no UDF) so every one is DuckDB-oracle checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_results(
    a: DataFrame,
    b: DataFrame,
    key: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Full-outer merge of two top-k result sets keyed by doc, keeping
    each side's score and a combined score (sum of present sides) —
    the reference's ``listMerge``/``listMergeEx`` (SearchService.java:
    162-190; there the second list's path wins, here both scores are
    kept explicitly). Both inputs are top-k sized → no shuffle concern.
    """
    left = a.select(F.col(key), F.col(score_col).alias("score_a"))
    right = b.select(F.col(key), F.col(score_col).alias("score_b"))
    return (
        left.join(right, key, "full_outer")
        .select(
            key,
            "score_a",
            "score_b",
            (F.coalesce("score_a", F.lit(0.0)) + F.coalesce("score_b", F.lit(0.0)))
            .alias("score_merged"),
        )
    )


def _global_bm25_model(disks: list, lemmas: list):
    """The shared cross-shard scoring model: global df for the query's
    lemmas (per-shard dictionary rows summed driver-side — a
    len(lemmas)-row lookup per shard), global n_docs, doc-weighted
    avgdl. Returns (terms_df, stats), or (None, None) when the query is
    empty or no shard knows any lemma."""
    from search_engine_spark.operators.index_build import CorpusStats

    if not lemmas:
        return None, None
    spark = disks[0].terms.sparkSession
    n_total = sum(d.stats.n_docs for d in disks)
    avgdl = (
        sum(d.stats.n_docs * d.stats.avgdl for d in disks) / n_total
        if n_total
        else 0.0
    )
    df_global: dict[str, int] = {}
    for d in disks:
        for r in (
            d.terms.filter(F.col("lemma").isin(lemmas))
            .select("lemma", "df")
            .collect()
        ):
            df_global[r["lemma"]] = df_global.get(r["lemma"], 0) + int(r["df"])
    if not df_global:
        return None, None
    terms_df = spark.createDataFrame(
        [(lem, df) for lem, df in sorted(df_global.items())],
        "lemma string, df long",
    )
    return terms_df, CorpusStats(n_docs=n_total, avgdl=avgdl)


def federated_wand_topk(
    disks: list,
    query: str,
    k: int = 10,
    match_all: bool = True,
) -> DataFrame:
    """Block-max WAND over every shard's compressed segments with the
    SAME global model as :func:`federated_bm25_topk` — the engine
    you'd actually federate at 100 TB (segments are the posting store;
    the DF copy exists for oracle parity). Rank-identical to the DF
    federation by construction: v2 segments store raw tf/dl, all BM25
    weights are computed query-side from (global df, global stats), so
    both engines evaluate the identical formula. Pinned by differential
    test. Returns (shard, doc_id, score, score_raw)."""
    from search_engine_spark.operators.query import parse_query
    from search_engine_spark.operators.wand import wand_topk

    lemmas = parse_query(query)
    spark = disks[0].terms.sparkSession
    terms_df, stats = _global_bm25_model(disks, lemmas)
    if terms_df is None:
        return spark.createDataFrame(
            [], "shard int, doc_id long, score double, score_raw double"
        )
    per_shard = []
    for i, d in enumerate(disks):
        per_shard.append(
            wand_topk(d.segments, terms_df, query, k=k, stats=stats,
                      match_all=match_all)
            .withColumn("shard", F.lit(i).cast("int"))
        )
    merged = per_shard[0]
    for h in per_shard[1:]:
        merged = merged.unionByName(h)
    return (
        merged.select("shard", "doc_id", "score", "score_raw")
        .orderBy(F.col("score").desc(), F.col("shard").asc(),
                 F.col("doc_id").asc())
        .limit(k)
    )


def federated_bm25_topk(
    disks: list,
    query: str,
    k: int = 10,
    match_all: bool = True,
) -> DataFrame:
    """Query-time federation over N shard indexes — the serving-side
    dual of ``index_store.merge_indexes`` (merge rewrites storage once;
    federation answers one query across shards that stay separate —
    how a 100 TB corpus is actually served: each shard index on its
    own executors, one small top-k merge at the coordinator).

    Correctness hinges on GLOBAL idf: scoring each shard with its local
    df would make scores incomparable across shards (a lemma rare in
    one shard but common overall would be over-weighted there). So:
    global df for the query's lemmas = sum of the per-shard dictionary
    rows (a len(lemmas)-row lookup per shard — driver-tiny), global
    n_docs/avgdl = summed/doc-weighted stats, every shard scored with
    that shared model. Each doc lives in exactly one shard, so the
    global top-k is exactly the top-k of the per-shard top-k union
    (pinned against a single merged index by test). Returns
    (shard, doc_id, score, score_raw); ties by (shard, doc_id) asc —
    doc ids are per-shard namespaces."""
    from search_engine_spark.operators.index_build import (
        CorpusStats,
        InvertedIndex,
    )
    from search_engine_spark.operators.query import (
        bm25_topk_lemmas,
        parse_query,
    )

    lemmas = parse_query(query)
    spark = disks[0].terms.sparkSession
    terms_df, stats = _global_bm25_model(disks, lemmas)
    if terms_df is None:
        return spark.createDataFrame(
            [], "shard int, doc_id long, score double, score_raw double"
        )
    per_shard = []
    for i, d in enumerate(disks):
        ix = d.as_inverted_index()
        patched = InvertedIndex(
            docs=ix.docs, postings=ix.postings, doclen=ix.doclen,
            terms=terms_df, stats=stats,
        )
        per_shard.append(
            bm25_topk_lemmas(patched, lemmas, k=k, match_all=match_all)
            .withColumn("shard", F.lit(i).cast("int"))
        )
    merged = per_shard[0]
    for h in per_shard[1:]:
        merged = merged.unionByName(h)
    return (
        merged.select("shard", "doc_id", "score", "score_raw")
        .orderBy(F.col("score").desc(), F.col("shard").asc(),
                 F.col("doc_id").asc())
        .limit(k)
    )


def nrt_wand_topk(
    disk,
    query: str,
    k: int = 10,
    match_all: bool = True,
) -> DataFrame:
    """Near-real-time top-k: block-max WAND over the compacted base
    segments PLUS DataFrame-engine scoring of the uncompacted streamed
    postings, both under the SAME NRT model (delta-merged dictionary,
    stream-adjusted stats — DiskIndex.nrt_terms/nrt_stats). The Lucene
    "search the in-memory segment too" analog: a turn is retrievable
    the moment the refresher drains it, with idf/avgdl already counting
    it, without waiting for compact_index to fold the deltas into
    segments.

    Rank-identical to ``bm25_topk(disk.as_inverted_index(nrt=True))``
    by construction (pinned in tests/test_nrt.py): streamed doc ids
    (streaming.incremental.streamed_doc_id_col) are disjoint from the
    dense base space, so every doc's full score lives entirely on one
    side, both sides compute the identical query-time BM25 formula from
    the same (terms, stats), and both round to SCORE_DECIMALS before
    the shared (score desc, doc_id asc) tie-break. match_all semantics
    also split cleanly: a base doc can never contain a streamed-only
    lemma, so the base-side arity filter over the segment hashes and
    the stream-side arity filter are each exact for their half.

    At scale the stream side is tiny (one refresh epoch of postings,
    re-read per query like Lucene's NRT reader) while the base side
    keeps the block-max skip behavior — this is the serving path for
    an index taking live writes between compactions."""
    import os

    from search_engine_spark.operators.index_build import InvertedIndex
    from search_engine_spark.operators.query import bm25_topk
    from search_engine_spark.operators.wand import wand_topk

    terms = disk.nrt_terms()
    stats = disk.nrt_stats()
    base = wand_topk(disk.segments, terms, query, k=k, stats=stats,
                     match_all=match_all)
    ps = os.path.join(disk.index_dir, "postings_stream")
    dls = os.path.join(disk.index_dir, "doclen_stream")
    dcs = os.path.join(disk.index_dir, "docs_stream")
    # gate on ALL three stream dirs: the refresher writes docs ->
    # postings -> doclen per epoch, so a query landing between the
    # first epoch's postings append and its doclen append must serve
    # base-only instead of crashing on the missing dir (review r3)
    if not (os.path.isdir(ps) and os.path.isdir(dls)
            and os.path.isdir(dcs)):
        return base
    spark = disk.spark
    mini = InvertedIndex(
        docs=spark.read.parquet(dcs),
        postings=spark.read.parquet(ps),
        doclen=spark.read.parquet(dls),
        terms=terms,
        stats=stats,
    )
    stream_hits = bm25_topk(mini, query, k=k, match_all=match_all)
    return (
        base.unionByName(stream_hits)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def scope_docs(docs: DataFrame, scope_col: str, scope_value: str) -> DataFrame:
    """Per-scope search restriction — the reference's per-site search
    (siteId != 0 path, ApiService.java:36-47). A plain pushed-down
    predicate: at scale the doc store is partitioned by the scope column
    so this prunes whole partitions."""
    return docs.filter(F.col(scope_col) == scope_value)


def corpus_statistics(
    docs: DataFrame,
    postings: DataFrame,
    scope_col: str = "source",
) -> DataFrame:
    """Per-scope corpus statistics — the reference /api/statistics
    3-way join (SiteRepository.java:43-54): doc count, distinct-lemma
    count, posting count per scope. Three partial-agg groupBys joined on
    the scope key; the scope dimension is tiny → broadcast joins."""
    d = docs.groupBy(scope_col).agg(F.count("*").alias("n_docs"))
    scoped = postings.join(
        docs.select("doc_id", scope_col), "doc_id"
    )
    p = scoped.groupBy(scope_col).agg(
        F.count("*").alias("n_postings"),
        F.countDistinct("lemma").alias("n_lemmas"),
    )
    return d.join(p, scope_col, "left").select(
        scope_col, "n_docs", "n_lemmas", "n_postings"
    )


def lemma_frequency(terms: DataFrame, limit: int | None = None) -> DataFrame:
    """All-site lemma frequency list ordered by ascending df then lemma —
    the reference's lemma grid ordering (Sort.by("frequency"),
    SearchComponent.java:638-644; SQL `order by frequency`,
    SearchService.java:289-296)."""
    out = terms.select("lemma", "df").orderBy(F.col("df").asc(), F.col("lemma").asc())
    return out.limit(limit) if limit is not None else out


def related_terms(
    postings: DataFrame,
    terms: DataFrame,
    n_docs: int,
    lemma: str,
    top: int = 10,
) -> DataFrame:
    """Co-occurrence "related terms" for one lemma: lemmas that share
    documents with it, ranked by co-document count with a PMI score.

        pmi = ln(n_pair · n_docs / (df_seed · df_other))

    Plan: the seed lemma's postings give the doc set (ONE lemma — a
    partition/zone-prunable scan on a lemma-keyed posting store), one
    join back to postings on doc_id, one aggregate. Linear in the seed
    lemma's df — no term×term pair explosion: the quadratic
    all-pairs co-occurrence matrix is never materialized.

    Returns (lemma, n_pair, pmi) ordered n_pair desc, lemma asc,
    top-`top`; the seed lemma itself is excluded.
    """
    seed_docs = postings.filter(F.col("lemma") == lemma).select("doc_id")
    # the seed's df rides along as a broadcast 1-row cross join (same
    # relational shape as the DuckDB twin's CROSS JOIN seed_df): the
    # plan stays fully lazy, and a missing seed yields the empty result
    # naturally through the empty cross join
    seed_df = F.broadcast(
        terms.filter(F.col("lemma") == lemma).select(
            F.col("df").alias("_df_seed")
        )
    )
    co = (
        postings.join(seed_docs, "doc_id")
        .filter(F.col("lemma") != lemma)
        .groupBy("lemma")
        .agg(F.count("*").alias("n_pair"))  # postings unique per (doc,lemma)
    )
    return (
        # co ≤ vocab rows; AQE broadcasts the measured-smaller side
        co.join(terms.select("lemma", "df"), "lemma")
        .crossJoin(seed_df)
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    F.col("n_pair").cast("double")
                    * float(n_docs)
                    / (F.col("_df_seed").cast("double") * F.col("df").cast("double"))
                ),
                6,
            ),
        )
        .select("lemma", F.col("n_pair").cast("long").alias("n_pair"), "pmi")
        .orderBy(F.col("n_pair").desc(), F.col("lemma").asc())
        .limit(top)
    )


def facets(
    postings: DataFrame,
    docs: DataFrame,
    lemmas: list[str],
    facet_col: str,
    top: int = 20,
) -> DataFrame:
    """Query-conditional facet counts: how many documents matching ALL
    the query lemmas fall under each value of ``facet_col`` — the
    per-site result breakdown the reference UI derives by re-running
    the search per site (ApiService.java:36-47 siteId loop), collapsed
    here into one aggregate.

    Plan: the AND-candidate set (lemma-IN-pruned postings scan + one
    groupBy — the shared :func:`~search_engine_spark.operators.query.
    docs_with_all_lemmas` shape) joins the doc store on doc_id with
    only the facet column projected, then ONE facet-cardinality-sized
    aggregate. No extra shuffle beyond the candidate groupBy: the
    doc-store join is keyed on doc_id (bucket-partitioned in the v4
    layout) and the final count is map-side combinable.

    Returns (facet, n_docs) ordered n_docs desc, facet asc, top-`top`.
    """
    from search_engine_spark.operators.query import docs_with_all_lemmas

    cand = docs_with_all_lemmas(postings, lemmas).select("doc_id")
    return (
        docs.select("doc_id", F.col(facet_col).alias("facet"))
        .join(cand, "doc_id")
        .groupBy("facet")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("facet").asc())
        .limit(top)
    )


def date_histogram(
    postings: DataFrame,
    doc_ts: DataFrame,
    lemmas: list[str],
    interval_s: int = 86400,
) -> DataFrame:
    """Query-conditional time histogram (Elasticsearch
    ``date_histogram`` aggregation): how many documents matching ALL
    the query lemmas fall into each fixed time bucket — the
    results-over-time sparkline beside a search page, and the
    time-facet dual of :func:`facets`.

    ``doc_ts`` is any (doc_id, ts:timestamp) DataFrame (pass
    ``index.docs.select("doc_id", "ts")``). Buckets are half-open
    ``[k·interval, (k+1)·interval)`` epochs — pure integer floor
    division, engine-identical (no timezone/calendar arithmetic; a
    calendar-aligned variant is date_trunc on the same plan).

    Plan: the shared AND-candidate aggregate (lemma-IN-pruned scan),
    one doc_id-keyed join to the column-pruned (doc_id, ts) scan —
    candidates only, never the corpus — then ONE bucket-cardinality
    aggregate, map-side combinable. Returns (bucket_start, n_docs)
    ordered bucket_start asc."""
    from search_engine_spark.operators.query import docs_with_all_lemmas

    cand = docs_with_all_lemmas(postings, lemmas).select("doc_id")
    iv = F.lit(int(interval_s))
    return (
        doc_ts.select("doc_id", F.unix_timestamp("ts").alias("_epoch"))
        .join(cand, "doc_id")
        # all-integer bucketing: epoch - (epoch mod interval) — no
        # float division anywhere, bit-identical in every engine
        .groupBy(
            (F.col("_epoch") - F.pmod(F.col("_epoch"), iv))
            .alias("bucket_start")
        )
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.col("bucket_start").asc())
    )


def significant_terms(
    postings: DataFrame,
    terms: DataFrame,
    n_docs: int,
    lemmas: list[str],
    min_fg_df: int = 2,
    top: int = 20,
) -> DataFrame:
    """Query-correlated vocabulary (Elasticsearch ``significant_terms``
    aggregation, JLH scoring): terms over-represented in the documents
    MATCHING the query relative to the whole corpus — "what words go
    with this query" analytics (the generalization of
    :func:`related_terms` from one seed lemma to a full query's match
    set). Per candidate lemma with foreground doc count ``fg_df`` over
    ``fg_n`` matching docs and background ``df`` over ``n_docs``:

        fg_pct = fg_df / fg_n ;  bg_pct = df / n_docs
        jlh    = (fg_pct - bg_pct) * (fg_pct / bg_pct)

    — ES's default significance heuristic (absolute lift × relative
    lift). The query's own lemmas are excluded (they are trivially
    significant); ``min_fg_df`` floors out one-off noise.

    Plan: the shared AND-candidate aggregate, ONE semi-joined postings
    pass over the matching docs (selectivity-bounded — the corpus is
    never rescanned), one vocabulary-bounded groupBy, an equi-join to
    the dictionary for background df (AQE picks broadcast when it
    fits), and the fg_n total rides a broadcast 1-row cross join so
    the whole thing stays one lineage (no driver collect). Float order
    pinned, round 6. Returns (lemma, fg_df, df, jlh) ordered
    (jlh desc, lemma asc), top-``top``."""
    from search_engine_spark.operators.query import docs_with_all_lemmas

    cand = docs_with_all_lemmas(postings, lemmas).select("doc_id")
    fg_n = cand.agg(F.count("*").alias("fg_n"))
    fg = (
        postings.join(cand, "doc_id", "left_semi")
        .filter(~F.col("lemma").isin(lemmas))
        .groupBy("lemma")
        .agg(F.count("*").alias("fg_df"))  # postings unique per (doc,lemma)
        .filter(F.col("fg_df") >= int(min_fg_df))
    )
    fg_pct = F.col("fg_df").cast("double") / F.col("fg_n").cast("double")
    bg_pct = F.col("df").cast("double") / F.lit(float(n_docs))
    return (
        fg.join(terms.select("lemma", "df"), "lemma")
        .crossJoin(F.broadcast(fg_n))
        .select(
            "lemma",
            F.col("fg_df").cast("long").alias("fg_df"),
            F.col("df").cast("long").alias("df"),
            F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6).alias("jlh"),
        )
        .orderBy(F.col("jlh").desc(), F.col("lemma").asc())
        .limit(int(top))
    )


def conversation_context(
    docs: DataFrame,
    hits: DataFrame,
    before: int = 1,
    after: int = 1,
) -> DataFrame:
    """Hit turns WITH their surrounding conversation turns — the
    transcript-native result view (a search hit mid-conversation is
    near-useless without the turns around it; chat UIs render exactly
    this window). For each hit doc, returns every doc of the same
    conversation whose turn_idx lies in [hit_turn − before,
    hit_turn + after], tagged with the hit it contextualizes and its
    signed offset.

    Plan: the k-row hit frame joins ``docs`` once for its own
    (conv_id, turn_idx), explodes the fixed offset range (k·(before+
    after+1) rows — still broadcast-sized), then ONE broadcast equi-
    join on (conv_id, turn_idx) back to the doc store: the corpus is
    scanned once, no shuffle of the big side, and conversation-
    partitioned doc stores prune to the hit conversations. Missing
    neighbors (window past either end of the conversation) simply
    don't join — no NULL rows. Output: (hit_doc, offset, doc_id,
    conv_id, turn_idx, role, text) ordered (hit_doc, offset)."""
    anchors = hits.select(F.col("doc_id").alias("hit_doc")).join(
        docs.select(F.col("doc_id").alias("hit_doc"), "conv_id",
                    F.col("turn_idx").alias("_hit_turn")),
        "hit_doc",
    )
    wanted = anchors.select(
        "hit_doc",
        "conv_id",
        F.explode(
            F.sequence(F.lit(-int(before)), F.lit(int(after)))
        ).alias("offset"),
        F.col("_hit_turn"),
    ).select(
        "hit_doc", "conv_id", "offset",
        (F.col("_hit_turn") + F.col("offset")).alias("turn_idx"),
    )
    return (
        F.broadcast(wanted)
        .join(docs.select("doc_id", "conv_id", "turn_idx", "role", "text"),
              ["conv_id", "turn_idx"])
        .select("hit_doc", "offset", "doc_id", "conv_id", "turn_idx",
                "role", "text")
        .orderBy("hit_doc", "offset")
    )


def doc_term_vector(
    postings: DataFrame,
    terms: DataFrame,
    doc_id: int,
) -> DataFrame:
    """Per-document term vector (the Elasticsearch ``_termvectors``
    endpoint / Lucene term-vector read): every lemma of ONE document
    with its within-doc tf and weighted rank plus the corpus-wide
    df/cf — the raw material of "why does this doc match" debugging
    and per-doc keyword extraction (its tf·idf ordering is exactly
    :func:`~search_engine_spark.operators.query.select_seed_terms`).

    Plan: a doc_id point predicate on the postings scan — partition-
    pruned to one bucket dir in the v4 layout, row-group-pruned by the
    doc_id min/max within it — then a dictionary equi-join over the
    doc's ≤|unique lemmas| rows. Returns (lemma, tf, rank, df, cf)
    ordered tf desc, lemma asc."""
    mine = postings.filter(F.col("doc_id") == int(doc_id)).select(
        "lemma", F.col("tf").cast("long").alias("tf"),
        F.col("rank").cast("double").alias("rank"),
    )
    return (
        mine.join(terms.select("lemma", "df", "cf"), "lemma")
        .select("lemma", "tf", "rank",
                F.col("df").cast("long").alias("df"),
                F.col("cf").cast("long").alias("cf"))
        .orderBy(F.col("tf").desc(), F.col("lemma").asc())
    )


def field_subtraction(
    docs: DataFrame,
    field_col: str,
    field_a: str,
    field_b: str,
    text_col: str = "text",
) -> DataFrame:
    """Per-lemma count difference between two document fields — the
    reference UI's body-minus-headers diagnostic (``SUB_LEMMA_PROPERTIES``
    merge, view/LemmaComponent.java:135-192; P5). Signed counts summed
    in ONE aggregate (no join of two per-field tables): each exploded
    lemma carries +1 for field_a rows and −1 for field_b rows, so the
    plan is scan → explode → single groupBy. Returns
    (lemma, cnt_a, cnt_b, diff) ordered by lemma."""
    from search_engine_spark.functions.text import lemmas_col

    sign = F.when(F.col(field_col) == field_a, F.lit(1)).otherwise(F.lit(-1))
    lem = docs.filter(F.col(field_col).isin([field_a, field_b])).select(
        F.explode(lemmas_col(text_col)).alias("lemma"), sign.alias("sign")
    )
    return (
        lem.groupBy("lemma")
        .agg(
            F.sum(F.when(F.col("sign") == 1, 1).otherwise(0)).alias("cnt_a"),
            F.sum(F.when(F.col("sign") == -1, 1).otherwise(0)).alias("cnt_b"),
            F.sum("sign").alias("diff"),
        )
        .orderBy("lemma")
    )


def extract_title(
    docs: DataFrame,
    text_col: str = "text",
    n_chars: int = 60,
) -> DataFrame:
    """Title extraction — the reference slices content between <title>
    tags (ApiService.java:116-124); transcripts/documents have no HTML,
    so the analog is the first sentence clipped to n_chars (regexp_extract
    + substring, both codegen built-ins)."""
    first_sentence = F.regexp_extract(F.col(text_col), r"^([^.!?]*)", 1)
    return docs.withColumn(
        "title",
        F.rtrim(F.substring(first_sentence, 1, n_chars)),
    )


def trending(
    counts: DataFrame, key_col: str = "lemma", top: int = 10
) -> DataFrame:
    """Per-window top risers over a (window_start, <key>, n) count
    table — the batch tier over the streamed windowed-count sink
    (streaming/incremental.windowed_term_counts), also applicable to
    any windowed count (driver query: hourly event-type trends).

    growth = n − n of the key's previous OBSERVED window (a key absent
    from the prior window grows from 0; gaps fall back to the last
    observed window — documented semantics, identical in the DuckDB
    twin's lag()). Rank per window by growth desc, key asc; rows with
    rank ≤ `top` survive.

    Plan: one lag window partitioned BY KEY (shuffle on the key — high
    cardinality, parallel) then the per-window rank partitioned by
    window_start (window count is small next to keys; the rank input
    is already count-aggregated, not raw rows). No joins, no Python.
    """
    from pyspark.sql import Window

    w_key = Window.partitionBy(key_col).orderBy("window_start")
    w_rank = Window.partitionBy("window_start").orderBy(
        F.col("growth").desc(), F.col(key_col).asc()
    )
    return (
        counts.withColumn(
            "growth",
            F.col("n") - F.coalesce(F.lag("n", 1).over(w_key), F.lit(0)),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= top)
        .select(
            "window_start", key_col,
            F.col("n").cast("long").alias("n"),
            F.col("growth").cast("long").alias("growth"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def corpus_profile(
    docs: DataFrame,
    scope_col: str = "source",
    text_col: str = "text",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-scope corpus length profile — the report you run over a
    training corpus before packing/filtering it: doc count, total
    tokens, and EXACT token-count quantiles (discrete: the value at
    rank ceil(p·n) in ascending order — percentile_disc semantics, so
    the number is an actual document's length and the DuckDB twin is
    bit-identical; interpolating/approximate quantiles differ across
    engines).

    Plan: one tokenize pass, one per-scope sort window (rank + count —
    the price of exact quantiles; at 100 TB you'd run approx_percentile
    for the dashboard and this exact path for audits), one combinable
    aggregate. Scope cardinality is small, but the window partitions by
    scope over all docs — the sort parallelizes per scope.
    """
    from pyspark.sql import Window

    from search_engine_spark.functions.analysis import token_count_col

    base = docs.select(
        F.col(scope_col).alias("scope"),
        F.col("doc_id"),
        token_count_col(text_col).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("scope").orderBy("n_tokens", "doc_id")
    ranked = base.select(
        "scope",
        "n_tokens",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(Window.partitionBy("scope")).alias("_n"),
    )
    aggs = [
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    ]
    for p in quantiles:
        name = f"p{int(p * 100)}_tokens"
        aggs.append(
            F.max(
                F.when(
                    F.col("_rn") == F.ceil(F.lit(p) * F.col("_n")).cast("long"),
                    F.col("n_tokens"),
                )
            ).cast("long").alias(name)
        )
    return ranked.groupBy("scope").agg(*aggs)


def corpus_profile_sql_duckdb(
    scope_col: str = "source",
    text_col: str = "text",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`corpus_profile` (same rank-at-ceil(p·n)
    discrete quantile selection)."""
    from search_engine_spark.functions.analysis import token_count_sql_duckdb

    ntok = token_count_sql_duckdb(text_col)
    qcols = ",\n               ".join(
        f"CAST(max(CASE WHEN rn = CAST(ceil({p!r} * n) AS BIGINT) "
        f"THEN n_tokens END) AS BIGINT) AS p{int(p * 100)}_tokens"
        for p in quantiles
    )
    return f"""
        WITH base AS (
            SELECT {scope_col} AS scope, doc_id,
                   CAST({ntok} AS BIGINT) AS n_tokens
            FROM {table}
        ),
        ranked AS (
            SELECT scope, n_tokens,
                   row_number() OVER (
                       PARTITION BY scope ORDER BY n_tokens, doc_id) AS rn,
                   count(*) OVER (PARTITION BY scope) AS n
            FROM base
        )
        SELECT scope, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               {qcols}
        FROM ranked GROUP BY scope
    """


def field_percentiles(
    df: DataFrame,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10000,
) -> DataFrame:
    """ES-style percentiles aggregation over a numeric column: one
    partial-aggregatable ``percentile_approx`` pass — no sort, no
    window, scan-shaped at any scale (the GK-sketch merges across
    partitions; ``accuracy`` bounds its rank error, exact when ≥ n).

    Value semantics: percentile_approx is VALUE-RETURNING — the
    quantile q maps to the actual data value at rank ceil(q·n)
    (pinned empirically and by the perplexity_buckets differential),
    so the result is oracle-comparable by rank selection rather than
    interpolation.

    Returns (quantile, value) rows ordered by quantile."""
    arr = F.percentile_approx(F.col(col), list(qs), int(accuracy))
    qlits = F.array(*[F.lit(float(q)) for q in qs])
    return (
        df.agg(arr.alias("_v"))
        .select(F.posexplode("_v").alias("_i", "value"))
        .select(
            F.element_at(qlits, F.col("_i") + 1).alias("quantile"),
            "value",
        )
        .orderBy("quantile")
    )
