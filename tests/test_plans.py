"""Physical-plan guardrails (SURVEY §4): the properties we rely on at
scale must actually appear in Catalyst's chosen plan — broadcast join
for query terms, no shuffle in the Arrow postings path, pushed filters
on parquet scans, whole-stage codegen on the JVM lemmatizer path."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.functions.text import lemmas_col
from search_engine_spark.operators.index_build import (
    build_postings_no_shuffle,
    role_weight_col,
)
from search_engine_spark.operators.query import bm25_topk
from search_engine_spark.plans.explain import (
    assert_broadcast_join,
    count_shuffles,
    physical_plan,
)


def test_bm25_plan_broadcasts_query_terms(tiny_index):
    plan_df = bm25_topk(tiny_index, "w00000 w00001s", k=10)
    assert_broadcast_join(plan_df)


def test_bm25_plan_single_aggregate_shuffle(tiny_index):
    """The doclen join must NOT add a shuffle join to the QUERY (dl is a
    postings column); only the broadcast dictionary join and the per-doc
    aggregate appear above the cached postings scan. (The build lineage
    stored inside InMemoryRelation is out of scope — cut it off.)"""
    plan = physical_plan(bm25_topk(tiny_index, "w00000", k=10))
    query_plan = plan.split("InMemoryRelation")[0]
    assert "SortMergeJoin" not in query_plan, query_plan
    assert "HashAggregate" in query_plan, query_plan
    assert "TakeOrderedAndProject" in query_plan, query_plan


def test_postings_build_is_shuffle_free(spark):
    docs = spark.createDataFrame(
        [(0, "user", "alpha beta"), (1, "tool", "beta gamma")],
        "doc_id long, role string, text string",
    )
    p = build_postings_no_shuffle(docs, weight_col=role_weight_col("role"))
    assert count_shuffles(p) == 0, physical_plan(p)


def test_jvm_lemma_path_has_no_python(tiny_index):
    """The JVM lemma expression must compile to pure Catalyst expressions
    (no Arrow/Python eval node anywhere in the plan); the Arrow UDF path
    must show exactly one ArrowEvalPython."""
    jvm = tiny_index.docs.select(F.explode(lemmas_col("text")).alias("lemma"))
    plan = physical_plan(jvm)
    assert "EvalPython" not in plan, plan

    from search_engine_spark.operators.index_build import (
        build_postings_no_shuffle,
    )

    arrow = build_postings_no_shuffle(tiny_index.docs)
    aplan = physical_plan(arrow)
    assert "ArrowEvalPython" in aplan, aplan       # vectorized Arrow transfer
    assert "BatchEvalPython" not in aplan, aplan   # never row-at-a-time Python


def test_colocated_segment_build_is_shuffle_and_join_free(spark, tiny_index, tmp_path):
    """The v2 segment encode over the at-scale (parquet-backed) postings
    must stay a single pipelined stage: no exchange (zero-shuffle claim)
    and no join (the xxhash64 term_key replaces the dictionary
    broadcast probe)."""
    from search_engine_spark.operators.compression import (
        build_segments_colocated,
    )
    from search_engine_spark.operators.index_build import InvertedIndex

    path = str(tmp_path / "postings")
    tiny_index.postings.write.parquet(path)
    ix = InvertedIndex(
        docs=tiny_index.docs, postings=spark.read.parquet(path),
        doclen=tiny_index.doclen, terms=tiny_index.terms,
        stats=tiny_index.stats,
    )
    seg = build_segments_colocated(ix, bucket_width=512)
    plan = physical_plan(seg)
    assert count_shuffles(seg) == 0, plan
    assert "Join" not in plan, plan
    assert (
        "MapInArrow" in plan or "ArrowEvalPython" in plan or "MapInPandas" in plan
    ), plan


def test_sql_engine_plans_like_dataframe(tiny_index):
    """Engine #3 hands the generated CTE join to Catalyst — the per-term
    CTE sides are tiny, so the N-way doc_id join must not degrade to a
    cartesian product and must end in TakeOrderedAndProject."""
    from search_engine_spark.operators.query import bm25_topk_sql

    plan = physical_plan(bm25_topk_sql(tiny_index, "w00000 w00001s", k=10))
    head = plan.split("InMemoryRelation")[0]
    assert "CartesianProduct" not in head, head
    assert "TakeOrderedAndProject" in head, head


def test_parquet_scan_prunes_columns(spark, tmp_path):
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "doc_id long, text string, extra string"
    ).write.parquet(path)
    df = spark.read.parquet(path).filter(F.col("doc_id") == 1).select("text")
    plan = physical_plan(df)
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,1)]" in plan, plan
    assert "extra" not in plan.split("ReadSchema")[1].splitlines()[0], plan


def test_phrase_and_near_verify_not_pushed_below_candidate_join(tiny_index):
    """The expensive lemma-stream verify (tokenize + count) must run on
    CANDIDATES only: Catalyst used to push the phrase_tf>0 / n_windows>0
    filter below the candidate join onto the full corpus scan. The
    `_nt`-guarded expression pins it above the Join (it references both
    join sides, so pushdown to either side is impossible)."""
    from search_engine_spark.operators.query import near_search, phrase_search

    for df in (
        phrase_search(tiny_index, tiny_index.docs, "w00000 w00001", k=10),
        near_search(tiny_index, tiny_index.docs, "w00000 w00001", window=6, k=10),
    ):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        i_verify = plan.find("replace(")   # tokenize/count expression
        i_join = plan.find("Join ")
        assert 0 <= i_verify < i_join, plan


def test_suggest_spelling_broadcasts_words_no_python(tiny_index):
    """The did-you-mean dictionary pass must broadcast the tiny query-
    words side (never shuffle the dictionary against it) and stay pure
    codegen (no Python eval node)."""
    from search_engine_spark.operators.query import suggest_spelling

    df = suggest_spelling(tiny_index.terms, "w0000q w00159")
    assert_broadcast_join(df)
    plan = physical_plan(df)
    assert "EvalPython" not in plan, plan


def test_repetition_signals_no_window_no_join_no_python(spark):
    """The repetition aggregate must reduce in combinable aggregates
    only: no Window node (the top-gram argmax is a struct-min), no join
    back to the doc table, no Python eval, and exactly the two
    aggregation exchanges ((doc_id, gram) then doc_id)."""
    from search_engine_spark.operators.dedup import repetition_signals

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "c d e")], "doc_id long, text string"
    )
    df = repetition_signals(docs, n=2)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan
    # formatted explain names each node twice (tree + details); the
    # detail header "(N) Exchange" appears once per physical node
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2, plan


def test_sequence_pack_single_exchange_no_join(spark):
    """Packing must cost exactly ONE exchange (the per-shard window
    sort) — no global sort, no join, no Python."""
    from search_engine_spark.operators.sampling import sequence_pack

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(20)], "doc_id long, text string"
    )
    df = sequence_pack(docs, budget=4, n_shards=4)
    plan = physical_plan(df)
    import re

    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_trending_no_join_no_python(spark):
    """The riser ranking is two windows over the already-aggregated
    count table — no join back to raw rows, no Python."""
    import datetime

    from search_engine_spark.operators.serving import trending

    base = datetime.datetime(2026, 1, 1)
    counts = spark.createDataFrame(
        [(base, "a", 3), (base, "b", 1)],
        "window_start timestamp, lemma string, n long",
    )
    plan = physical_plan(trending(counts))
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_chunk_documents_pure_projection(spark):
    """Chunking must be a zero-exchange projection: no shuffle, no join,
    no window, no Python eval — one tokenize, per-row transform."""
    from search_engine_spark.operators.sampling import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "g h")], "doc_id long, text string"
    )
    df = chunk_documents(docs, chunk=4, stride=3)
    plan = physical_plan(df)
    assert count_shuffles(df) == 0, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_quality_resample_pure_filter(spark):
    """Importance resampling is one scan + filter: no shuffle, no join,
    no Python."""
    from search_engine_spark.operators.sampling import quality_resample

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    df = quality_resample(docs)
    plan = physical_plan(df)
    assert count_shuffles(df) == 0, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_duplicate_spans_two_aggregate_exchanges_one_join(spark):
    """The span-dedup plan: span explode stays pipelined, ONE global
    span-count aggregate (two exchange-backed aggregates total with the
    final doc fold), one join back, no Python, no window."""
    from search_engine_spark.operators.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    df = duplicate_spans(docs, span=3)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert "EvalPython" not in plan, plan
