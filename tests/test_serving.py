"""Serving-side operators (SURVEY §2 U4/J7/J8/A4/P6/O2): result merge,
scope filter, statistics join, lemma-frequency ordering, title extract,
pagination — semantics pinned against hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.operators.query import bm25_topk, paginate
from search_engine_spark.operators.serving import (
    corpus_statistics,
    extract_title,
    lemma_frequency,
    merge_results,
    scope_docs,
)


def test_merge_results_full_outer(spark):
    a = spark.createDataFrame([(1, 2.0), (2, 1.0)], "doc_id long, score double")
    b = spark.createDataFrame([(2, 0.5), (3, 4.0)], "doc_id long, score double")
    got = {r["doc_id"]: (r["score_a"], r["score_b"], r["score_merged"])
           for r in merge_results(a, b).collect()}
    assert got == {
        1: (2.0, None, 2.0),
        2: (1.0, 0.5, 1.5),
        3: (None, 4.0, 4.0),
    }


def test_scope_docs_restricts_and_rescopes_stats(spark, tiny_transcripts):
    """Scoped search == building an index over only the scoped docs:
    df/N/avgdl all re-derive from the scope (reference one-site path)."""
    from search_engine_spark.operators.index_build import build_index

    scoped_rows = tiny_transcripts.filter(F.col("role") == "user")
    ix = build_index(scoped_rows, use_arrow_udf=True, weighted=False)
    assert ix.stats.n_docs == scoped_rows.count()
    # every result doc is a user turn
    top = bm25_topk(ix, "w00000", k=5)
    ids = [r["doc_id"] for r in top.collect()]
    roles = {r["doc_id"]: r["role"] for r in ix.docs.collect()}
    assert all(roles[i] == "user" for i in ids)


def test_corpus_statistics_counts(spark):
    docs = spark.createDataFrame(
        [(0, "s1"), (1, "s1"), (2, "s2")], "doc_id long, source string"
    )
    postings = spark.createDataFrame(
        [(0, "a", 1), (0, "b", 2), (1, "a", 1), (2, "c", 3)],
        "doc_id long, lemma string, tf int",
    )
    got = {r["source"]: (r["n_docs"], r["n_lemmas"], r["n_postings"])
           for r in corpus_statistics(docs, postings).collect()}
    assert got == {"s1": (2, 2, 3), "s2": (1, 1, 1)}


def test_lemma_frequency_order(spark):
    terms = spark.createDataFrame(
        [("b", 5), ("a", 5), ("z", 1)], "lemma string, df long"
    )
    rows = lemma_frequency(terms).collect()
    assert [(r["lemma"], r["df"]) for r in rows] == [("z", 1), ("a", 5), ("b", 5)]
    # limit=0 means zero rows, not "no limit" (review r3)
    assert lemma_frequency(terms, limit=0).count() == 0
    assert lemma_frequency(terms, limit=2).count() == 2


def test_extract_title(spark):
    docs = spark.createDataFrame(
        [(0, "Hello world. More text follows"), (1, "no sentence end here"),
         (2, "x" * 100 + ". tail")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["title"] for r in extract_title(docs).collect()}
    assert got[0] == "Hello world"
    assert got[1] == "no sentence end here"
    assert got[2] == "x" * 60


def test_paginate_slices_ordered_results(spark, tiny_index):
    top = bm25_topk(tiny_index, "w00000", k=10).select("doc_id", "score")
    full = [(r["doc_id"], r["score"]) for r in
            top.orderBy(F.desc("score"), F.asc("doc_id")).collect()]
    page = [(r["doc_id"], r["score"]) for r in
            paginate(top, offset=3, limit=4)
            .orderBy(F.desc("score"), F.asc("doc_id")).collect()]
    assert page == full[3:7]


def test_field_subtraction_matches_manual(spark):
    """P5 diagnostic: per-lemma signed-count difference between two
    fields equals hand-computed counts (serving.field_subtraction)."""
    from search_engine_spark.functions.text import lemmatize_text_py
    from search_engine_spark.operators.serving import field_subtraction

    rows = [
        (0, "a", "tables query fast"),
        (1, "a", "query filter"),
        (2, "b", "query query slow"),
        (3, "c", "ignored entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, src string, text string")
    got = {
        r["lemma"]: (r["cnt_a"], r["cnt_b"], r["diff"])
        for r in field_subtraction(docs, "src", "a", "b").collect()
    }
    from collections import Counter

    ca: Counter = Counter()
    cb: Counter = Counter()
    for _, src, text in rows:
        if src == "a":
            ca.update(lemmatize_text_py(text))
        elif src == "b":
            cb.update(lemmatize_text_py(text))
    want = {
        lem: (ca.get(lem, 0), cb.get(lem, 0), ca.get(lem, 0) - cb.get(lem, 0))
        for lem in set(ca) | set(cb)
    }
    assert got == want
    assert any(v[2] < 0 for v in got.values())  # subtraction goes negative


def test_related_terms_matches_bruteforce(tiny_index):
    import math as _math

    from search_engine_spark.operators.serving import related_terms

    seed = "w00005"
    got = [
        (r["lemma"], r["n_pair"], r["pmi"])
        for r in related_terms(
            tiny_index.postings, tiny_index.terms, tiny_index.stats.n_docs,
            seed, top=10,
        ).collect()
    ]
    # brute force over collected postings
    rows = tiny_index.postings.select("doc_id", "lemma").collect()
    by_doc: dict[int, set[str]] = {}
    df: dict[str, int] = {}
    for r in rows:
        by_doc.setdefault(int(r["doc_id"]), set()).add(r["lemma"])
        df[r["lemma"]] = df.get(r["lemma"], 0) + 1
    n_docs = tiny_index.stats.n_docs
    from collections import Counter

    co: Counter = Counter()
    for lemmas in by_doc.values():
        if seed in lemmas:
            co.update(l for l in lemmas if l != seed)
    want = sorted(
        (
            (l, n, round(_math.log(n * n_docs / (df[seed] * df[l])), 6))
            for l, n in co.items()
        ),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        assert _math.isclose(g[2], w[2], abs_tol=1e-6), (g, w)


def test_related_terms_missing_seed_empty(tiny_index):
    from search_engine_spark.operators.serving import related_terms

    out = related_terms(
        tiny_index.postings, tiny_index.terms, tiny_index.stats.n_docs,
        "zzznotaword", top=5,
    )
    assert out.collect() == []
    assert out.columns == ["lemma", "n_pair", "pmi"]


def test_snippets_wrap_every_matched_lemma(spark):
    """Multi-word highlight parity (reference ApiService.java:134-200
    wraps EVERY matched query word): a 2-term query renders BOTH terms
    <b>-wrapped, anchored on the earliest match, and the Spark
    expression equals the DuckDB-dialect twin byte-for-byte."""
    import duckdb

    from search_engine_spark.operators.query import snippet_sql, snippets

    rows = [
        (0, "the alpha filter beta join runs in every good plan today"),
        (1, "join first then filter is usually worse than filter then join"),
        (2, "neither term appears in this document at all honestly"),
        (3, "filter"),  # exact single-word doc (window edges degenerate)
        (4, "JOIN uppercase and Filter mixed-case must still be wrapped"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["snippet"]
        for r in snippets(df, "filter join", window=25).collect()
    }
    # both terms wrapped when both fall inside the window
    assert "<b>filter</b>" in got[0] and "<b>join</b>" in got[0], got[0]
    assert got[1].count("<b>") >= 2, got[1]
    assert "<b>" not in got[2]
    assert got[3] == "<b>filter</b>"
    # case-insensitive match, original case preserved
    assert "<b>JOIN</b>" in got[4] and "<b>Filter</b>" in got[4], got[4]

    # byte-identical to the DuckDB-dialect twin
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = (
        f"SELECT doc_id, {snippet_sql(['filter', 'join'], 25, dialect='duckdb')} "
        "AS snippet FROM documents"
    )
    want = {int(r[0]): r[1] for r in con.sql(sql).fetchall()}
    assert got == want


def test_facets_counts_and_order(tiny_index):
    """Facet counts == brute-force per-facet tally of AND-matching docs;
    ordering pinned (n_docs desc, facet asc)."""
    from search_engine_spark.operators.query import parse_query
    from search_engine_spark.operators.serving import facets

    lemmas = parse_query("w00000 w00001")
    got = [
        (r["facet"], r["n_docs"])
        for r in facets(
            tiny_index.postings, tiny_index.docs, lemmas, "role", top=10
        ).collect()
    ]
    rows = tiny_index.postings.select("doc_id", "lemma").collect()
    by_doc: dict[int, set[str]] = {}
    for r in rows:
        by_doc.setdefault(int(r["doc_id"]), set()).add(r["lemma"])
    roles = {int(r["doc_id"]): r["role"] for r in tiny_index.docs.collect()}
    from collections import Counter

    want_c: Counter = Counter(
        roles[d] for d, ls in by_doc.items() if all(l in ls for l in lemmas)
    )
    want = sorted(want_c.items(), key=lambda t: (-t[1], t[0]))[:10]
    assert got == want
    assert sum(n for _, n in got) > 0


def test_more_like_this_excludes_seed_and_matches_bruteforce(tiny_index):
    """MLT == brute-force: seed doc's top tf·idf lemmas (rounded cut,
    lemma-asc ties) scored disjunctively over all other docs."""
    import math as _math

    from search_engine_spark.config import BM25_B, BM25_K1
    from search_engine_spark.operators.query import (
        more_like_this,
        select_seed_terms,
    )

    seed_doc = 3
    max_terms = 5
    got = [
        (r["doc_id"], r["score"])
        for r in more_like_this(
            tiny_index, seed_doc, k=10, max_terms=max_terms
        ).collect()
    ]
    assert all(d != seed_doc for d, _ in got)
    assert len(got) == 10

    # brute-force twin over collected postings
    rows = tiny_index.postings.select("doc_id", "lemma", "tf", "dl").collect()
    n_docs, avgdl = tiny_index.stats.n_docs, tiny_index.stats.avgdl
    df: dict[str, int] = {}
    for r in rows:
        df[r["lemma"]] = df.get(r["lemma"], 0) + 1

    def idf(l: str) -> float:
        return _math.log(1.0 + (n_docs - df[l] + 0.5) / (df[l] + 0.5))

    seed_rows = [r for r in rows if int(r["doc_id"]) == seed_doc]
    sel = sorted(
        ((round(r["tf"] * idf(r["lemma"]), 6), r["lemma"]) for r in seed_rows),
        key=lambda t: (-t[0], t[1]),
    )[:max_terms]
    sel_lemmas = {l for _, l in sel}
    assert set(select_seed_terms(tiny_index, seed_doc, max_terms)) == sel_lemmas

    scores: dict[int, float] = {}
    for r in rows:
        d = int(r["doc_id"])
        if d == seed_doc or r["lemma"] not in sel_lemmas:
            continue
        w = idf(r["lemma"]) * (r["tf"] * (BM25_K1 + 1.0)) / (
            r["tf"] + BM25_K1 * (1.0 - BM25_B + BM25_B * r["dl"] / avgdl)
        )
        scores[d] = scores.get(d, 0.0) + w
    want = sorted(
        ((d, round(s, 6)) for d, s in scores.items()),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert got == want


def test_corpus_profile_exact_quantiles(spark):
    """Discrete quantiles: the value at rank ceil(p*n) ascending — an
    actual doc's length, cross-checked against a Python sort."""
    import math

    from search_engine_spark.operators.serving import corpus_profile

    lens = {"a": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10], "b": [5, 5, 7]}
    rows, i = [], 0
    for src, ls in lens.items():
        for n in ls:
            rows.append((i, src, "w " * n)); i += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["scope"]: r.asDict() for r in corpus_profile(docs).collect()}
    for src, ls in lens.items():
        s = sorted(ls)
        r = got[src]
        assert r["n_docs"] == len(ls) and r["total_tokens"] == sum(ls)
        for p in (0.5, 0.9, 0.99):
            want = s[math.ceil(p * len(s)) - 1]
            assert r[f"p{int(p*100)}_tokens"] == want, (src, p)


def test_date_histogram_hand_computed(tiny_index):
    """Bucket counts recomputed from the matching set + integer
    arithmetic; buckets are half-open [k*iv, (k+1)*iv)."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.query import parse_query
    from search_engine_spark.operators.serving import date_histogram

    lemmas = parse_query("w00000s w00001")
    iv = 3600
    doc_ts = tiny_index.docs.select(
        "doc_id",
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("doc_id") * 37) % 100000
        ).alias("ts"),
    )
    got = [
        (r["bucket_start"], r["n_docs"])
        for r in date_histogram(
            tiny_index.postings, doc_ts, lemmas, interval_s=iv
        ).collect()
    ]

    from search_engine_spark.operators.query import docs_with_all_lemmas

    cand = [
        int(r["doc_id"])
        for r in docs_with_all_lemmas(tiny_index.postings, lemmas).collect()
    ]
    assert cand, "fixture query must match"
    want: dict[int, int] = {}
    for d in cand:
        e = 1704067200 + (d * 37) % 100000
        b = e - (e % iv)
        want[b] = want.get(b, 0) + 1
    assert got == sorted(want.items())
    assert sum(n for _, n in got) == len(cand)


def test_significant_terms_hand_computed(tiny_index):
    """JLH recomputed from collected postings: fg from the AND-match
    set, bg from the dictionary, query lemmas excluded."""
    from search_engine_spark.operators.query import (
        docs_with_all_lemmas,
        parse_query,
    )
    from search_engine_spark.operators.serving import significant_terms

    lemmas = parse_query("w00000s w00001")
    got = [
        (r["lemma"], r["fg_df"], r["df"], r["jlh"])
        for r in significant_terms(
            tiny_index.postings, tiny_index.terms, tiny_index.stats.n_docs,
            lemmas, min_fg_df=2, top=15,
        ).collect()
    ]
    assert got, "fixture query must match docs"

    cand = {
        int(r["doc_id"])
        for r in docs_with_all_lemmas(tiny_index.postings, lemmas).collect()
    }
    fg: dict[str, int] = {}
    for r in tiny_index.postings.select("doc_id", "lemma").collect():
        if int(r["doc_id"]) in cand and r["lemma"] not in lemmas:
            fg[r["lemma"]] = fg.get(r["lemma"], 0) + 1
    df = {r["lemma"]: int(r["df"]) for r in tiny_index.terms.collect()}
    n, fg_n = tiny_index.stats.n_docs, len(cand)
    scored = []
    for lem, f in fg.items():
        if f < 2:
            continue
        fp, bp = f / float(fg_n), df[lem] / float(n)
        scored.append((lem, f, df[lem], round((fp - bp) * (fp / bp), 6)))
    want = sorted(scored, key=lambda t: (-t[3], t[0]))[:15]
    assert got == want
    # query's own lemmas never appear
    assert not ({g[0] for g in got} & set(lemmas))


def test_doc_term_vector_point_lookup(tiny_index):
    """One doc's term vector: tf values sum to the doc's dl, df/cf come
    from the dictionary, ordering tf desc / lemma asc."""
    from search_engine_spark.operators.serving import doc_term_vector

    doc = int(tiny_index.doclen.limit(1).collect()[0]["doc_id"])
    rows = doc_term_vector(tiny_index.postings, tiny_index.terms, doc).collect()
    assert rows
    dl = int(tiny_index.doclen.filter(F.col("doc_id") == doc)
             .collect()[0]["dl"])
    assert sum(r["tf"] for r in rows) == dl
    terms = {r["lemma"]: (int(r["df"]), int(r["cf"]))
             for r in tiny_index.terms.collect()}
    for r in rows:
        assert (r["df"], r["cf"]) == terms[r["lemma"]]
    assert rows == sorted(rows, key=lambda r: (-r["tf"], r["lemma"]))


def test_conversation_context_windows(tiny_index):
    """Hit turns ± neighbors over the REAL transcript structure:
    every returned row is in the same conversation within the offset
    window; hits at conversation edges return truncated windows."""
    from search_engine_spark.operators.serving import conversation_context

    hits = bm25_topk(tiny_index, "w00000s w00001", k=5).select("doc_id")
    rows = conversation_context(
        tiny_index.docs, hits, before=1, after=2
    ).collect()
    assert rows

    meta = {
        int(r["doc_id"]): (r["conv_id"], int(r["turn_idx"]))
        for r in tiny_index.docs.select("doc_id", "conv_id", "turn_idx")
        .collect()
    }
    hit_ids = {int(r["doc_id"]) for r in hits.collect()}
    by_hit: dict[int, list] = {}
    for r in rows:
        h = int(r["hit_doc"])
        assert h in hit_ids
        hc, ht = meta[h]
        assert r["conv_id"] == hc                      # same conversation
        assert r["turn_idx"] == ht + r["offset"]       # exact offset
        assert -1 <= r["offset"] <= 2
        by_hit.setdefault(h, []).append(r["offset"])
    # every hit contextualizes itself (offset 0 always joins)
    assert set(by_hit) == hit_ids
    for offs in by_hit.values():
        assert 0 in offs
    # full recomputation: expected rows = every (hit, offset) whose
    # target turn exists
    turns = {(c, t) for c, t in meta.values()}
    want = sum(
        1
        for h in hit_ids
        for off in (-1, 0, 1, 2)
        if (meta[h][0], meta[h][1] + off) in turns
    )
    assert len(rows) == want


def test_field_percentiles_rank_convention(spark):
    """percentile_approx at exact accuracy returns the value at rank
    ceil(q·n) — pinned against an explicit sort (the convention the
    DuckDB oracle's rank join and perplexity_buckets both rely on)."""
    import math

    from search_engine_spark.operators.serving import field_percentiles

    vals = [7, 1, 13, 5, 3, 11, 2, 17, 19, 23, 29]  # n=11, distinct
    df = spark.createDataFrame([(v,) for v in vals], "dl long")
    got = {r["quantile"]: r["value"]
           for r in field_percentiles(df, "dl").collect()}
    ordered = sorted(vals)
    want = {q: ordered[math.ceil(q * len(vals)) - 1]
            for q in (0.25, 0.5, 0.75, 0.95)}
    assert got == want
