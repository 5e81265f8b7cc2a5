"""Rank identity across the three scorers (the reference's own
differential design, README.md:224-228): DataFrame BM25 == block-max
WAND == single-node Python golden — docIDs AND scores (north_rule)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import pytest

from search_engine_spark.operators.compression import build_segments
from search_engine_spark.operators.query import (
    bm25_topk,
    paginate,
    parse_query,
    reference_relevance,
)
from search_engine_spark.operators.wand import wand_topk
from search_engine_spark.oracle import bm25_topk_py, reference_relevance_py

# Queries mix hot Zipf-head terms, mid-df terms, a planted needle, a
# missing term, and a stopword-only query (FIXTURES.md query set).
QUERIES = [
    "w00000",                    # hottest lemma (df ~ all docs)
    "w00000s w00001",            # two hot terms, suffix folds to stems
    "w00159 w00268",             # mid-df conjunction
    "needlealpha",               # planted needle (df = 1)
    "w00000 zzznotaword",        # one term missing -> empty
    "the and of",                # all stopwords -> invalid
    "X-w00011ing w00002ies",     # decorated + suffixed surface forms
]


@pytest.fixture(scope="module")
def segments(tiny_index):
    return build_segments(tiny_index, bucket_width=512).cache()


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.mark.parametrize("query", QUERIES)
def test_dataframe_scorer_matches_golden(tiny_index, py_twin, query):
    got = _rows(bm25_topk(tiny_index, query, k=10))
    want = [(d, round(s, 6)) for d, s in bm25_topk_py(py_twin, query, k=10)]
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (gd, gs), (wd, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-6, abs_tol=1e-6), (query, gd)


@pytest.mark.parametrize("query", QUERIES)
def test_wand_scorer_matches_dataframe(tiny_index, segments, query):
    a = _rows(bm25_topk(tiny_index, query, k=10))
    b = _rows(wand_topk(segments, tiny_index.terms, query, k=10,
                        stats=tiny_index.stats))
    assert [d for d, _ in a] == [d for d, _ in b], query
    for (ad, asc), (_, bs) in zip(a, b):
        assert math.isclose(asc, bs, rel_tol=1e-6, abs_tol=1e-6), (query, ad)


@pytest.mark.parametrize("query", QUERIES)
def test_sql_scorer_matches_dataframe(tiny_index, query):
    """Engine #3 (generated-SQL CTE join) — the reference's 3-way
    equivalence harness completed (README.md:224-228)."""
    from search_engine_spark.operators.query import bm25_topk_sql

    a = _rows(bm25_topk(tiny_index, query, k=10))
    c = _rows(bm25_topk_sql(tiny_index, query, k=10))
    assert [d for d, _ in a] == [d for d, _ in c], query
    for (ad, asc), (_, cs) in zip(a, c):
        assert math.isclose(asc, cs, rel_tol=1e-6, abs_tol=1e-6), (query, ad)


def test_needle_is_found(tiny_index, py_twin):
    got = _rows(bm25_topk(tiny_index, "needlealpha", k=10))
    if not got:
        pytest.skip("no needlealpha in 200-conv corpus slice")
    want = bm25_topk_py(py_twin, "needlealpha", k=10)
    assert got[0][0] == want[0][0]


@pytest.mark.parametrize("query", ["w00000", "w00159 w00268"])
def test_reference_relevance_matches_golden(tiny_index, py_twin, query):
    got = [(r["doc_id"], r["abs_rel"], r["rel_rel"])
           for r in reference_relevance(tiny_index, query, k=20).collect()]
    want = reference_relevance_py(py_twin, query)[:20]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert math.isclose(g[1], w[1], rel_tol=1e-6)
        assert math.isclose(g[2], w[2], rel_tol=1e-6)


def test_pagination(tiny_index):
    full = _rows(bm25_topk(tiny_index, "w00000", k=30))
    page = _rows(paginate(bm25_topk(tiny_index, "w00000", k=30), offset=10, limit=5))
    assert page == full[10:15]


def test_search_after_walks_pages_identically(tiny_index):
    """Cursor deep paging: walking pages via (score, doc_id) cursors
    reproduces the global top-k order exactly — page boundaries fall on
    the pinned rounded-score tie-break, so consecutive pages tile the
    full ranking with no dup and no gap (incl. across rounded ties,
    which the hot w00000 query has in abundance)."""
    from search_engine_spark.operators.query import bm25_topk_after

    full = _rows(bm25_topk(tiny_index, "w00000", k=30))
    walked, cur = [], None
    for _ in range(6):
        if cur is None:
            page = _rows(bm25_topk(tiny_index, "w00000", k=5))
        else:
            page = _rows(
                bm25_topk_after(tiny_index, "w00000", cur[1], cur[0], k=5)
            )
        if not page:
            break
        walked.extend(page)
        cur = page[-1]
    assert walked == full


def test_search_after_empty_and_exhausted(tiny_index):
    from search_engine_spark.operators.query import bm25_topk_after

    assert bm25_topk_after(tiny_index, "the and of", 1.0, 0).count() == 0
    # cursor past the last result -> empty page, not an error
    assert bm25_topk_after(tiny_index, "needlealpha", -1e9, 1 << 60).count() == 0


def test_parse_query_dedupes_and_orders():
    assert parse_query("tables table the tables") == ["table"]
    assert parse_query("") == []


def test_synonym_group_scores_match_python_golden(tiny_index):
    """SynonymQuery golden: one group {a, b} scores as a single
    pseudo-term — per-doc tf = member sum, df = docs holding ANY
    member, idf from that union df — recomputed exactly in Python from
    the collected postings."""
    from search_engine_spark.operators.index_build import idf_py
    from search_engine_spark.operators.query import bm25_topk_synonyms
    from search_engine_spark.config import BM25_B, BM25_K1

    a_lem, b_lem = "w00159", "w00268"
    rows = tiny_index.postings.filter(
        F.col("lemma").isin([a_lem, b_lem])
    ).select("doc_id", "tf", "dl").collect()
    tf: dict[int, int] = {}
    dl: dict[int, int] = {}
    for r in rows:
        tf[r["doc_id"]] = tf.get(r["doc_id"], 0) + r["tf"]
        dl[r["doc_id"]] = r["dl"]
    idf = idf_py(len(tf), tiny_index.stats.n_docs)
    avgdl = tiny_index.stats.avgdl
    want = sorted(
        (
            (
                d,
                round(
                    idf * (tf[d] * (BM25_K1 + 1.0))
                    / (tf[d] + BM25_K1 * (1.0 - BM25_B + BM25_B * dl[d] / avgdl)),
                    6,
                ),
            )
            for d in tf
        ),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    got = _rows(bm25_topk_synonyms(
        tiny_index, a_lem, {a_lem: [b_lem]}, k=10
    ))
    assert got == want
    # a doc holding ONLY the synonym must match (the OR-expansion
    # equivalence on the match set)
    only_b = {r["doc_id"] for r in tiny_index.postings.filter(
        F.col("lemma") == b_lem).select("doc_id").collect()}
    assert only_b <= {d for d, _ in
                      _rows(bm25_topk_synonyms(
                          tiny_index, a_lem, {a_lem: [b_lem]}, k=100000))}


def test_synonym_singletons_equal_plain_bm25(tiny_index):
    from search_engine_spark.operators.query import bm25_topk_synonyms

    q = "w00159 w00268"
    assert _rows(bm25_topk_synonyms(tiny_index, q, {}, k=10)) == _rows(
        bm25_topk(tiny_index, q, k=10)
    )
    with pytest.raises(ValueError, match="overlapping"):
        bm25_topk_synonyms(tiny_index, "w00159 w00268",
                           {"w00159": ["w00268"]})


def test_count_hits_matches_scorer_cardinality(tiny_index):
    from search_engine_spark.operators.query import count_hits

    q = "w00159 w00268"
    n_and = count_hits(tiny_index, q).head()["n"]
    n_or = count_hits(tiny_index, q, match_all=False).head()["n"]
    assert n_and == bm25_topk(tiny_index, q, k=10**5).count()
    assert n_or == bm25_topk(tiny_index, q, k=10**5, match_all=False).count()
    assert 0 < n_and <= n_or
    assert count_hits(tiny_index, "the and of").head()["n"] == 0


def test_explain_score_rows_sum_to_score(tiny_index):
    """Lucene-explain analog: per-term weights of the top doc sum to
    its score_raw; idf/df come from the same dictionary rows."""
    from search_engine_spark.operators.query import explain_score

    q = "w00159 w00268"
    top = bm25_topk(tiny_index, q, k=1).head()
    rows = explain_score(tiny_index, q, int(top["doc_id"])).collect()
    assert sorted(r["lemma"] for r in rows) == ["w00159", "w00268"]
    assert math.isclose(sum(r["weight"] for r in rows),
                        top["score_raw"], abs_tol=2e-6)
    for r in rows:
        assert r["tf"] >= 1 and r["df"] >= 1 and r["idf"] > 0


def test_search_relaxed_cascade_stages(tiny_index):
    from search_engine_spark.operators.query import search_relaxed

    strict = search_relaxed(tiny_index, "w00159 w00268", k=10).collect()
    assert strict and all(r["stage"] == "and" for r in strict)
    assert [(r["doc_id"], r["score"]) for r in strict] == _rows(
        bm25_topk(tiny_index, "w00159 w00268", k=10)
    )

    relaxed = search_relaxed(tiny_index, "w00159 zzznotaword", k=10).collect()
    assert relaxed and all(r["stage"] == "or" for r in relaxed)
    assert [(r["doc_id"], r["score"]) for r in relaxed] == _rows(
        bm25_topk(tiny_index, "w00159 zzznotaword", k=10, match_all=False)
    )

    # every term OOV -> fuzzy expansion finds the 1-edit neighbor
    fz = search_relaxed(tiny_index, "needlealphaz", k=10).collect()
    assert fz and all(r["stage"] == "fuzzy" for r in fz)
    needle = _rows(bm25_topk(tiny_index, "needlealpha", k=10))
    assert {r["doc_id"] for r in fz} == {d for d, _ in needle}


def test_recency_decay_zero_age_is_plain_bm25(tiny_index):
    """All docs stamped at the anchor -> pow(0.5, 0) = 1 exactly: the
    decayed ranking must equal plain BM25 bit-for-bit."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.query import bm25_topk_recency

    q = "w00159 w00268"
    anchor = float(
        tiny_index.docs.agg(F.max(F.unix_timestamp("ts"))).head()[0]
    )
    const_ts = tiny_index.docs.select(
        "doc_id", F.timestamp_seconds(F.lit(int(anchor))).alias("ts")
    )
    got = bm25_topk_recency(tiny_index, q, const_ts, anchor, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == _rows(
        bm25_topk(tiny_index, q, k=10)
    )


def test_recency_decay_reorders_by_age(tiny_index):
    """ts = anchor - doc_id days: expected order recomputed in python
    from the plain raw scores and the same decay formula."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.query import bm25_topk_recency

    q = "w00159"  # single common term: enough matches to reorder
    hl = 2.0
    anchor = 1_700_000_000.0
    aged_ts = tiny_index.docs.select(
        "doc_id",
        F.timestamp_seconds(
            F.lit(int(anchor)) - F.col("doc_id") * 86400
        ).alias("ts"),
    )
    plain = bm25_topk(tiny_index, q, k=10**5).collect()
    expect = sorted(
        (
            (r["doc_id"],
             round(r["score_raw"] * 0.5 ** ((r["doc_id"] * 86400 / 86400.0) / hl), 6))
            for r in plain
        ),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    got = bm25_topk_recency(
        tiny_index, q, aged_ts, anchor, half_life_days=hl, k=10
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == expect
    # the decay actually changed the order vs plain BM25
    assert [d for d, _ in expect] != [r["doc_id"] for r in plain[:10]]


def test_docs_in_time_range_filters_hits(tiny_index):
    from pyspark.sql import functions as F

    from search_engine_spark.operators.query import docs_in_time_range

    q = "w00159"
    lo = tiny_index.docs.agg(F.min(F.unix_timestamp("ts"))).head()[0]
    hi = tiny_index.docs.agg(F.max(F.unix_timestamp("ts"))).head()[0]
    mid = (lo + hi) / 2.0
    flt = docs_in_time_range(tiny_index.docs, until_epoch_s=mid)
    res = bm25_topk(tiny_index, q, k=10**5, doc_filter=flt).collect()
    assert res
    allowed = {
        r["doc_id"]
        for r in tiny_index.docs.filter(F.unix_timestamp("ts") < mid)
        .select("doc_id").collect()
    }
    assert all(r["doc_id"] in allowed for r in res)
    plain = _rows(bm25_topk(tiny_index, q, k=10**5))
    assert [(r["doc_id"], r["score"]) for r in res] == [
        t for t in plain if t[0] in allowed
    ]


def test_min_match_brackets_and_and_or(tiny_index):
    """min_match=1 == OR, min_match=n == AND, 2 sits between — scores
    for any shared doc are identical (the sum never depended on the
    arity filter)."""
    q = "w00159 w00268"
    or_rows = _rows(bm25_topk(tiny_index, q, k=10**5, match_all=False))
    and_rows = _rows(bm25_topk(tiny_index, q, k=10**5))
    m1 = _rows(bm25_topk(tiny_index, q, k=10**5, min_match=1))
    m2 = _rows(bm25_topk(tiny_index, q, k=10**5, min_match=2))
    assert m1 == or_rows
    assert m2 == and_rows  # 2 lemmas: >=2 is AND
    three = "w00159 w00268 w00100"
    mm = {d for d, _ in _rows(bm25_topk(tiny_index, three, k=10**5,
                                        min_match=2))}
    allm = {d for d, _ in _rows(bm25_topk(tiny_index, three, k=10**5,
                                          match_all=False))}
    andm = {d for d, _ in _rows(bm25_topk(tiny_index, three, k=10**5))}
    assert andm <= mm <= allm


def test_percolate_matches_stored_queries(tiny_index):
    from search_engine_spark.operators.query import percolate

    stored = {0: "w00159 w00268", 1: "w00100", 2: "the and of"}
    got = percolate(tiny_index.postings, stored).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    # strict AND (frac 1.0) == each stored query's AND match set
    assert by_q.get(0, set()) == {
        d for d, _ in _rows(bm25_topk(tiny_index, "w00159 w00268", k=10**5))
    }
    assert by_q.get(1, set()) == {
        d for d, _ in _rows(bm25_topk(tiny_index, "w00100", k=10**5))
    }
    assert 2 not in by_q  # unparseable stored query skipped
    assert all(r["n_matched"] >= 1 for r in got)

    # frac 0.5 on a 2-lemma query -> >= 1 lemma == the OR match set
    loose = percolate(
        tiny_index.postings, {0: "w00159 w00268"}, min_match_frac=0.5
    ).collect()
    assert {r["doc_id"] for r in loose} == {
        d for d, _ in _rows(
            bm25_topk(tiny_index, "w00159 w00268", k=10**5, match_all=False)
        )
    }

    # doc_filter: percolate only a doc subset (the streaming-alert path)
    sub = tiny_index.docs.select("doc_id").limit(50)
    flt = percolate(tiny_index.postings, stored, doc_filter=sub).collect()
    allowed = {r["doc_id"] for r in sub.collect()}
    assert {r["doc_id"] for r in flt} <= allowed


def test_complete_prefix_popularity_order(tiny_index):
    from search_engine_spark.operators.query import complete_prefix

    rows = complete_prefix(tiny_index.terms, "w0", n=5).collect()
    assert 0 < len(rows) <= 5
    assert all(r["lemma"].startswith("w0") for r in rows)
    cfs = [r["cf"] for r in rows]
    assert cfs == sorted(cfs, reverse=True)
    # case-normalized prefix; no-match prefix returns empty, no error
    assert ([r["lemma"] for r in complete_prefix(tiny_index.terms, "W0", 5)
             .collect()] == [r["lemma"] for r in rows])
    assert complete_prefix(tiny_index.terms, "zzzz", 5).count() == 0


def test_extract_boosts():
    from search_engine_spark.operators.query import extract_boosts

    q, b = extract_boosts("query filter join^3")
    assert q == "query filter join" and b == {"join": 3.0}
    # surface form lemmatizes: tables^2 boosts the 'table' postings
    assert extract_boosts("tables^2")[1] == {"table": 2.0}
    # stopword boost vanishes; negation/phrase/wildcard boosts are
    # left alone (negated docs are never scored)
    q, b = extract_boosts('the^4 -bad^2 "a b"^2')
    assert b == {} and "-bad^2" in q


def test_boosted_scores_match_per_term_golden(tiny_index):
    """term^N golden check: the boosted doc score must equal
    sum(per-term unboosted raw weight x that term's boost), recombined
    driver-side from independent single-term scoring runs."""
    from search_engine_spark.operators.query import _bm25_scored

    t1, t2, w2 = "w00159", "w00268", 2.5
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(tiny_index, f"{t1} {t2}", k=1000,
                           boosts={t2: w2}).collect()
    }
    raw1 = {r["doc_id"]: r["score_raw"]
            for r in _bm25_scored(tiny_index, [t1], match_all=False).collect()}
    raw2 = {r["doc_id"]: r["score_raw"]
            for r in _bm25_scored(tiny_index, [t2], match_all=False).collect()}
    both = set(raw1) & set(raw2)  # AND semantics
    assert set(got) == both and both
    for d in both:
        assert math.isclose(got[d], raw1[d] + raw2[d] * w2,
                            rel_tol=1e-9, abs_tol=1e-6), d
    # boost of 1.0 is a no-op — identical rounded scores, same order
    base = _rows(bm25_topk(tiny_index, f"{t1} {t2}", k=10))
    noop = _rows(bm25_topk(tiny_index, f"{t1} {t2}", k=10, boosts={t2: 1.0}))
    assert base == noop


@pytest.mark.parametrize("match_all", [True, False])
def test_boosted_wand_matches_boosted_dataframe(tiny_index, segments,
                                                match_all):
    """Engine parity under boosts: the WAND scorer applies each term's
    boost to decoded weights AND block-max bounds (same positive
    factor — pruning proof unchanged), so boosted ranks and scores
    must equal the DataFrame engine's exactly."""
    q = "w00000s w00001"
    boosts = {"w00001": 2.5}
    a = _rows(bm25_topk(tiny_index, q, k=10, match_all=match_all,
                        boosts=boosts))
    w = _rows(wand_topk(segments, tiny_index.terms, q, k=10,
                        stats=tiny_index.stats, match_all=match_all,
                        boosts=boosts))
    assert a == w and a
    # boosting must actually change something vs unboosted
    base = _rows(bm25_topk(tiny_index, q, k=10, match_all=match_all))
    assert a != base
    with pytest.raises(ValueError, match="positive"):
        wand_topk(segments, tiny_index.terms, q, k=10,
                  stats=tiny_index.stats, boosts={"w00001": -1.0})


def test_mini_ql_boost_routes_to_scorer(tiny_index):
    """search('a b^2') == bm25_topk(boosts={b:2}) — the mini-QL suffix
    is pure syntax over the same scoring path, match set unchanged."""
    from search_engine_spark.operators.query import search

    via_ql = _rows(search(tiny_index, tiny_index.docs, "w00159 w00268^2", k=10))
    direct = _rows(bm25_topk(tiny_index, "w00159 w00268", k=10,
                             boosts={"w00268": 2.0}))
    unboosted = _rows(bm25_topk(tiny_index, "w00159 w00268", k=1000))
    assert via_ql == direct
    assert {d for d, _ in via_ql} <= {d for d, _ in unboosted}


@pytest.mark.parametrize("query", ["w00000", "w00159 w00268", "zzznot"])
def test_treeaggregate_merge_matches_wand(tiny_index, segments, query):
    """UD4: the explicit treeAggregate heap merge returns rank-identical
    results to the TakeOrderedAndProject path."""
    from search_engine_spark.operators.wand import wand_topk_tree

    want = _rows(wand_topk(segments, tiny_index.terms, query, k=10,
                           stats=tiny_index.stats))
    got = wand_topk_tree(segments, tiny_index.terms, query, k=10,
                         stats=tiny_index.stats)
    assert got == want, query


# ---------------------------------------------------------------------------
# phrase search (index-pruned candidates + codegen substring verify)
# ---------------------------------------------------------------------------
def _phrase_count_py(seq, phrase):
    """Non-overlapping left-to-right occurrence count (str.count shape)."""
    n = i = 0
    while i + len(phrase) <= len(seq):
        if seq[i : i + len(phrase)] == phrase:
            n += 1
            i += len(phrase)
        else:
            i += 1
    return n


def test_phrase_search_matches_bruteforce(tiny_index):
    from search_engine_spark.functions.text import lemmatize_text_py
    from search_engine_spark.operators.query import phrase_search

    rows = tiny_index.docs.select("doc_id", "text").collect()
    seqs = {int(r["doc_id"]): lemmatize_text_py(r["text"]) for r in rows}
    # pick the corpus's most document-frequent bigram (self-calibrating)
    from collections import Counter

    df = Counter()
    for seq in seqs.values():
        df.update(set(zip(seq, seq[1:])))
    (a, b), n_docs = df.most_common(1)[0]
    assert n_docs >= 3
    phrase = [a, b]
    expected = sorted(
        (
            (doc, c)
            for doc, seq in seqs.items()
            if (c := _phrase_count_py(seq, phrase)) > 0
        ),
        key=lambda t: (-t[1], t[0]),
    )[:25]
    got = [
        (int(r["doc_id"]), int(r["phrase_tf"]))
        for r in phrase_search(
            tiny_index, tiny_index.docs, f"{a} {b}", k=25
        ).collect()
    ]
    assert got == expected


def test_phrase_search_counting_semantics(spark):
    from search_engine_spark.operators.index_build import build_index_from_docs
    from search_engine_spark.operators.query import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "zig zag zig zag"),        # back-to-back: counts 2
            (2, "zig zig zig"),            # overlapping "zig zig": counts 1
            (3, "zigzag zig nope zag"),    # non-adjacent: 0 (pruned by verify)
            (4, "the zig and zag"),        # stopwords dropped -> adjacent: 1
            (5, "zag zig"),                # wrong order: 0
        ],
        "doc_id long, text string",
    )
    ix = build_index_from_docs(docs, use_arrow_udf=False)
    got = {
        int(r["doc_id"]): int(r["phrase_tf"])
        for r in phrase_search(ix, docs, "zig zag", k=10).collect()
    }
    assert got == {1: 2, 4: 1}
    got2 = {
        int(r["doc_id"]): int(r["phrase_tf"])
        for r in phrase_search(ix, docs, "zig zig", k=10).collect()
    }
    assert got2 == {2: 1}
    # stopword-filtered phrase text maps onto the same lemma stream
    got3 = {
        int(r["doc_id"]): int(r["phrase_tf"])
        for r in phrase_search(ix, docs, "the zig of zag", k=10).collect()
    }
    assert got3 == got


def test_phrase_search_empty_inputs(tiny_index):
    from search_engine_spark.operators.query import phrase_search

    # stopword-only phrase lemmatizes to nothing -> empty result
    out = phrase_search(tiny_index, tiny_index.docs, "the and of", k=10)
    assert out.collect() == []
    assert out.columns == ["doc_id", "phrase_tf"]
    # absent vocabulary -> no candidates
    assert (
        phrase_search(tiny_index, tiny_index.docs, "qqqqx zzzzw", k=10).count()
        == 0
    )


def test_near_search_matches_bruteforce(tiny_index):
    from search_engine_spark.functions.text import lemmatize_text_py
    from search_engine_spark.operators.query import near_search

    rows = tiny_index.docs.select("doc_id", "text").collect()
    seqs = {int(r["doc_id"]): lemmatize_text_py(r["text"]) for r in rows}
    # two fairly common lemmas from the corpus
    from collections import Counter

    df = Counter()
    for seq in seqs.values():
        df.update(set(seq))
    (a, _), (b, _) = df.most_common(2)
    W = 6
    qset = {a, b}
    expected = sorted(
        (
            (doc, n)
            for doc, seq in seqs.items()
            if (
                n := sum(
                    1
                    for i in range(max(len(seq) - W + 1, 1))
                    if qset <= set(seq[i : i + W])
                )
            )
            > 0
        ),
        key=lambda t: (-t[1], t[0]),
    )[:25]
    got = [
        (int(r["doc_id"]), int(r["n_windows"]))
        for r in near_search(
            tiny_index, tiny_index.docs, f"{a} {b}", window=W, k=25
        ).collect()
    ]
    assert got == expected


def test_near_search_short_doc_whole_window(spark):
    from search_engine_spark.operators.index_build import build_index_from_docs
    from search_engine_spark.operators.query import near_search

    docs = spark.createDataFrame(
        [
            (1, "zig zag"),                       # shorter than W: one window
            (2, "zig nope nope nope nope zag"),   # spread beyond W=4
            (3, "nope zig nope zag nope"),        # covered by two W=4 windows
        ],
        "doc_id long, text string",
    )
    ix = build_index_from_docs(docs, use_arrow_udf=False)
    got = {
        int(r["doc_id"]): int(r["n_windows"])
        for r in near_search(ix, docs, "zig zag", window=4, k=10).collect()
    }
    assert got == {1: 1, 3: 2}


@pytest.mark.parametrize("query", QUERIES)
def test_or_scorer_matches_golden(tiny_index, py_twin, query):
    got = _rows(bm25_topk(tiny_index, query, k=10, match_all=False))
    want = [
        (d, round(s, 6))
        for d, s in bm25_topk_py(py_twin, query, k=10, match_all=False)
    ]
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (gd, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-6, abs_tol=1e-6), (query, gd)


def test_or_superset_of_and(tiny_index):
    # every AND hit appears in OR results with the identical score
    q = QUERIES[0]
    and_rows = dict(_rows(bm25_topk(tiny_index, q, k=10)))
    or_rows = dict(_rows(bm25_topk(tiny_index, q, k=200, match_all=False)))
    for d, s in and_rows.items():
        assert d in or_rows and math.isclose(or_rows[d], s, abs_tol=1e-6)


def test_parse_search_query():
    from search_engine_spark.operators.query import parse_search_query

    def norm(q):
        ph, free, neg, neg_ph, scopes, _wilds = parse_search_query(q)
        return ph, free.split(), neg.split(), neg_ph, scopes

    assert norm('"table hash" join') == (["table hash"], ["join"], [], [], [])
    assert norm("no quotes") == ([], ["no", "quotes"], [], [], [])
    assert norm('"a b" "c d" e') == (["a b", "c d"], ["e"], [], [], [])
    assert norm('""  x') == ([], ["x"], [], [], [])
    assert norm('"a b" c -d -e2') == (["a b"], ["c"], ["d", "e2"], [], [])
    assert norm("alpha-beta") == ([], ["alpha-beta"], [], [], [])  # infix dash kept
    # negated phrases are NOT positive constraints
    assert norm('a -"b c"') == ([], ["a"], [], ["b c"], [])
    assert norm('"x y" -"b c" -d') == (["x y"], [], ["d"], ["b c"], [])
    # field:value scopes are extracted after quotes (colon in a phrase
    # stays literal) and removed from the free text
    assert norm("role:user w1") == ([], ["w1"], [], [], [("role", "user")])
    assert norm('"a:b c" source:s1 -d') == (
        ["a:b c"], [], ["d"], [], [("source", "s1")]
    )

    from search_engine_spark.operators.query import split_or_branches

    assert split_or_branches("a b | c") == ["a b", "c"]
    assert split_or_branches("a OR b") == ["a", "b"]
    assert split_or_branches('x "a OR b" | y') == ['x "a OR b"', "y"]
    assert split_or_branches("plain query") == ["plain query"]


def test_search_without_quotes_equals_bm25(tiny_index):
    from search_engine_spark.operators.query import search

    q = "w00000s w00001"
    a = _rows(bm25_topk(tiny_index, q, k=10))
    b = _rows(search(tiny_index, tiny_index.docs, q, k=10))
    assert a == b


def test_search_composed_is_phrase_constrained_bm25(tiny_index):
    from search_engine_spark.functions.text import lemmatize_text_py
    from search_engine_spark.operators.query import phrase_match_docs, search

    rows = tiny_index.docs.select("doc_id", "text").collect()
    seqs = {int(r["doc_id"]): lemmatize_text_py(r["text"]) for r in rows}
    from collections import Counter

    df = Counter()
    for seq in seqs.values():
        df.update(set(zip(seq, seq[1:])))
    (a, b), n_docs = df.most_common(1)[0]
    assert n_docs >= 3
    q = f'"{a} {b}"'
    got = _rows(search(tiny_index, tiny_index.docs, q, k=50))
    phrase_docs = {
        int(r["doc_id"])
        for r in phrase_match_docs(tiny_index, tiny_index.docs, f"{a} {b}").collect()
    }
    assert got, "composed search found nothing"
    assert {d for d, _ in got} <= phrase_docs
    # ranking equals AND-BM25 over the phrase lemmas restricted to them
    full = _rows(bm25_topk(tiny_index, f"{a} {b}", k=10_000))
    want = [(d, s) for d, s in full if d in phrase_docs][:50]
    assert got == want


def test_search_vacuous_phrase_constrains_nothing(tiny_index):
    from search_engine_spark.operators.query import search

    q = "w00000s w00001"
    base = _rows(search(tiny_index, tiny_index.docs, q, k=10))
    with_vacuous = _rows(
        search(tiny_index, tiny_index.docs, f'"the it" {q}', k=10)
    )
    assert with_vacuous == base


# ---------------------------------------------------------------------------
# prefix (wildcard) + fuzzy search via dictionary expansion
# ---------------------------------------------------------------------------
def test_prefix_search_matches_or_bm25_over_expansion(tiny_index, py_twin):
    from search_engine_spark.operators.query import expand_prefix, prefix_search

    lemmas = expand_prefix(tiny_index.terms, "w0000", max_expansions=8)
    assert len(lemmas) == 8  # vocab has many w0000x lemmas -> cap binds
    got = _rows(prefix_search(tiny_index, "w0000", k=10, max_expansions=8))
    want = [
        (d, round(s, 6))
        for d, s in bm25_topk_py(py_twin, " ".join(lemmas), k=10, match_all=False)
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-6, abs_tol=1e-6), gd


def test_expand_prefix_cap_orders_by_df(tiny_index):
    from search_engine_spark.operators.query import expand_prefix

    rows = {
        r["lemma"]: r["df"]
        for r in tiny_index.terms.filter("lemma LIKE 'w0000%'").collect()
    }
    got = expand_prefix(tiny_index.terms, "w0000", max_expansions=4)
    want = sorted(rows, key=lambda l: (-rows[l], l))[:4]
    assert got == want


def test_fuzzy_search_finds_typo(tiny_index, py_twin):
    from search_engine_spark.operators.query import expand_fuzzy, fuzzy_search

    # 'w0000z' is one substitution from w00000..w00009 stems
    lemmas = expand_fuzzy(tiny_index.terms, "w0000z", max_dist=1,
                          max_expansions=8)
    assert lemmas and all(len(l) == 6 for l in lemmas)
    got = _rows(fuzzy_search(tiny_index, "w0000z", k=10, max_dist=1,
                             max_expansions=8))
    want = [
        (d, round(s, 6))
        for d, s in bm25_topk_py(py_twin, " ".join(lemmas), k=10, match_all=False)
    ]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_prefix_and_fuzzy_absent_are_empty(tiny_index):
    from search_engine_spark.operators.query import fuzzy_search, prefix_search

    assert prefix_search(tiny_index, "zzzz", k=5).collect() == []
    assert fuzzy_search(tiny_index, "zzzzzzzzzz", k=5, max_dist=1).collect() == []


@pytest.mark.parametrize("query", QUERIES)
def test_wand_or_matches_dataframe_or(tiny_index, segments, query):
    a = _rows(bm25_topk(tiny_index, query, k=10, match_all=False))
    b = _rows(wand_topk(segments, tiny_index.terms, query, k=10,
                        stats=tiny_index.stats, match_all=False))
    assert [d for d, _ in a] == [d for d, _ in b], query
    for (ad, asc), (_, bs) in zip(a, b):
        assert math.isclose(asc, bs, rel_tol=1e-6, abs_tol=1e-6), (query, ad)


def test_search_not_excludes_docs(tiny_index):
    from search_engine_spark.operators.query import search

    q = "w00159 w00268"
    base = _rows(search(tiny_index, tiny_index.docs, q, k=200))
    banned = {
        int(r["doc_id"])
        for r in tiny_index.postings.filter("lemma = 'w00000'")
        .select("doc_id").distinct().collect()
    }
    got = _rows(search(tiny_index, tiny_index.docs, f"{q} -w00000", k=200))
    want = [(d, s) for d, s in base if d not in banned][:200]
    assert got == want
    assert not ({d for d, _ in got} & banned)


def test_search_negated_phrase_excludes(tiny_index):
    from search_engine_spark.functions.text import lemmatize_text_py
    from search_engine_spark.operators.query import phrase_match_docs, search

    rows = tiny_index.docs.select("doc_id", "text").collect()
    seqs = {int(r["doc_id"]): lemmatize_text_py(r["text"]) for r in rows}
    from collections import Counter

    df = Counter()
    for seq in seqs.values():
        df.update(set(zip(seq, seq[1:])))
    (a, b), _ = df.most_common(1)[0]
    phrase_docs = {
        int(r["doc_id"])
        for r in phrase_match_docs(tiny_index, tiny_index.docs, f"{a} {b}").collect()
    }
    base = _rows(search(tiny_index, tiny_index.docs, f"{a} {b}", k=500))
    got = _rows(search(tiny_index, tiny_index.docs, f'{a} {b} -"{a} {b}"', k=500))
    want = [(d, s) for d, s in base if d not in phrase_docs][: len(got) or None]
    assert not ({d for d, _ in got} & phrase_docs)
    assert got == [(d, s) for d, s in base if d not in phrase_docs][:500]


def test_search_field_scope_restricts_to_column_value(spark, tiny_index):
    """mini-QL `role:user`: hits are exactly the BM25 AND hits that are
    user turns, with unchanged (full-corpus-stats) scores."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.query import bm25_topk, search

    docs = tiny_index.docs
    got = {
        r["doc_id"]: r["score"]
        for r in search(tiny_index, docs, "role:user w00000 w00001",
                        k=10**6).collect()
    }
    assert got
    user_ids = {
        r["doc_id"]
        for r in docs.filter(F.col("role") == "user").select("doc_id").collect()
    }
    base = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(tiny_index, "w00000 w00001", k=10**6).collect()
    }
    want = {d: s for d, s in base.items() if d in user_ids}
    assert got == want


def test_search_unknown_scope_field_raises(tiny_index):
    import pytest

    from search_engine_spark.operators.query import search

    with pytest.raises(ValueError, match="unknown scope field"):
        search(tiny_index, tiny_index.docs, "nosuchcol:x w00000", k=5)


def test_search_or_unions_branch_constraints(spark, tiny_index):
    """mini-QL OR: the accepted doc set is the union of each branch's
    conjunctive constraint set (AND arity, NOTs honored per branch)."""
    from search_engine_spark.operators.query import search

    docs = tiny_index.docs
    K = 10**6
    a = {r["doc_id"] for r in
         search(tiny_index, docs, "w00000 w00001", k=K).collect()}
    b = {r["doc_id"] for r in
         search(tiny_index, docs, "w00005 -w00001", k=K).collect()}
    u = {r["doc_id"] for r in
         search(tiny_index, docs, "w00000 w00001 | w00005 -w00001", k=K).collect()}
    assert a and b
    assert u == a | b
    # OR keyword spelling is equivalent to the pipe
    u2 = {r["doc_id"] for r in
          search(tiny_index, docs, "w00000 w00001 OR w00005 -w00001",
                 k=K).collect()}
    assert u2 == u


def test_suggest_spelling_argmin_and_edges(tiny_index):
    """Did-you-mean: per-word argmin over the dictionary by
    (levenshtein, -df, lemma); in-dictionary words suggest themselves
    at dist 0; words with no neighbour within max_dist emit no row."""
    from search_engine_spark.operators.query import suggest_spelling

    vocab = [(r["lemma"], r["df"])
             for r in tiny_index.terms.select("lemma", "df").collect()]

    def lev(a, b):
        # classic DP, unit costs — the semantics both engines implement
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def best(word, max_dist=2):
        cand = [(lev(l, word), -df, l, df) for l, df in vocab]
        cand = [c for c in cand if c[0] <= max_dist]
        if not cand:
            return None
        d, _, l, df = min(cand)
        return (word, l, d, df)

    got = [(r["word"], r["suggestion"], r["dist"], r["df"])
           for r in suggest_spelling(
               tiny_index.terms, "w0000q w00159 zzzzzzzzzz", max_dist=2
           ).collect()]
    want = sorted(w for w in (best("w0000q"), best("w00159"),
                              best("zzzzzzzzzz")) if w)
    assert got == want
    # the in-dictionary word is its own suggestion at dist 0
    assert ("w00159", "w00159", 0) in {(w, s, d) for w, s, d, _ in got}
    # the garbage word produced no row
    assert all(w != "zzzzzzzzzz" for w, *_ in got)

    # invalid query (stopwords only) -> empty, stable schema
    empty = suggest_spelling(tiny_index.terms, "the and of")
    assert empty.columns == ["word", "suggestion", "dist", "df"]
    assert empty.count() == 0


def test_search_wildcard_terms(tiny_index):
    """Mini-QL wildcard: 'p*' expands via the df-capped dictionary walk;
    a wildcard-only query equals prefix_search; mixed queries AND the
    exact terms with the >=1-expansion constraint and score
    disjunctively over the pooled vocabulary."""
    from search_engine_spark.operators.query import (
        bm25_topk_lemmas,
        docs_with_all_lemmas,
        expand_prefix,
        prefix_search,
        search,
    )

    docs = tiny_index.docs
    K = 10**6

    # wildcard-only == prefix_search (same expansion, same OR scoring)
    got = [(r["doc_id"], r["score"])
           for r in search(tiny_index, docs, "w0000*", k=20).collect()]
    want = [(r["doc_id"], r["score"])
            for r in prefix_search(tiny_index, "w0000", k=20).collect()]
    assert got and got == want

    # mixed: every hit holds the exact term AND >=1 expansion; equal to
    # the manually-composed constraint + disjunctive scorer
    res = search(tiny_index, docs, "w0000* w00159", k=K).collect()
    exps = expand_prefix(tiny_index.terms, "w0000")
    from pyspark.sql import functions as F

    has_exp = (tiny_index.postings.filter(F.col("lemma").isin(exps))
               .select("doc_id").distinct())
    accepted = (docs_with_all_lemmas(tiny_index.postings, ["w00159"])
                .select("doc_id").join(has_exp, "doc_id"))
    want_rows = bm25_topk_lemmas(
        tiny_index, ["w00159"] + exps, k=K, match_all=False,
        doc_filter=accepted,
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in res] == \
        [(r["doc_id"], r["score"]) for r in want_rows]
    assert res

    # zero-expansion wildcard is unsatisfiable
    assert search(tiny_index, docs, "zzz* w00159", k=10).count() == 0
    # negated wildcard is dropped with its token (documented)
    a = [(r["doc_id"], r["score"])
         for r in search(tiny_index, docs, "-zzz* w00159", k=10).collect()]
    b = [(r["doc_id"], r["score"])
         for r in search(tiny_index, docs, "w00159", k=10).collect()]
    assert a == b


def test_prf_search_expands_and_composes(tiny_index):
    """PRF == (conjunctive top-fb pool -> feedback-term expansion ->
    disjunctive rank over query+expansion), composed manually; the
    expansion never re-selects a query lemma and stays within budget."""
    from search_engine_spark.operators.query import (
        bm25_topk_lemmas,
        parse_query,
        prf_search,
        select_feedback_terms,
    )

    q = "w00000 w00159"
    lemmas = parse_query(q)
    got = [(r["doc_id"], r["score"])
           for r in prf_search(tiny_index, q, k=10, fb_docs=4,
                               fb_terms=3).collect()]

    base = bm25_topk_lemmas(tiny_index, lemmas, k=4)
    fb_ids = [int(r.doc_id) for r in base.select("doc_id").collect()]
    exp = select_feedback_terms(tiny_index, fb_ids, 3, exclude=lemmas)
    assert len(exp) == 3
    assert not set(exp) & set(lemmas)
    want = [(r["doc_id"], r["score"])
            for r in bm25_topk_lemmas(tiny_index, lemmas + exp, k=10,
                                      match_all=False).collect()]
    assert got == want and got

    # empty query stays empty; unmatched query falls back to plain OR
    assert prf_search(tiny_index, "", k=5).count() == 0


def test_grouped_topk_matches_global_scores(tiny_index):
    """bm25_topk_per_scope == per-scope top-3 of the GLOBAL score set
    (global idf — scores comparable across scopes), pinned tie-break."""
    from search_engine_spark.operators.query import bm25_topk_per_scope

    got = [
        (r["scope"], r["doc_id"], r["score"], r["rnk"])
        for r in bm25_topk_per_scope(
            tiny_index, tiny_index.docs, "w00000",
            scope_col="role", n_per_scope=3,
        ).orderBy("scope", "rnk").collect()
    ]
    all_scores = bm25_topk(tiny_index, "w00000", k=10**6).collect()
    roles = {
        int(r["doc_id"]): r["role"]
        for r in tiny_index.docs.select("doc_id", "role").collect()
    }
    by_scope: dict = {}
    for r in all_scores:
        by_scope.setdefault(roles[int(r["doc_id"])], []).append(
            (r["score"], r["doc_id"])
        )
    want = []
    for scope in sorted(by_scope):
        ranked = sorted(by_scope[scope], key=lambda t: (-t[0], t[1]))[:3]
        want += [(scope, d, s, i + 1) for i, (s, d) in enumerate(ranked)]
    assert got == want
    assert len({s for s, *_ in got}) > 1  # fixture really has >1 scope


def test_batch_topk_matches_per_query(tiny_index):
    """bm25_topk_batch over the whole QUERIES log == per-query bm25_topk
    (docIDs AND rounded scores, rnk = position); queries that parse
    empty yield no rows."""
    from search_engine_spark.operators.query import bm25_topk_batch

    batch = bm25_topk_batch(
        tiny_index, list(enumerate(QUERIES)), k=10
    ).orderBy("query_id", "rnk").collect()
    got: dict = {}
    for r in batch:
        got.setdefault(int(r["query_id"]), []).append(
            (r["doc_id"], r["score"], r["rnk"])
        )
    for qid, query in enumerate(QUERIES):
        want = [(d, s, i + 1) for i, (d, s) in
                enumerate(_rows(bm25_topk(tiny_index, query, k=10)))]
        assert got.get(qid, []) == want, query
    assert set(got) == {
        qid for qid, q in enumerate(QUERIES) if parse_query(q)
        and _rows(bm25_topk(tiny_index, q, k=10))
    }


def test_batch_topk_or_mode_and_empty_log(tiny_index):
    from search_engine_spark.operators.query import bm25_topk_batch

    rows = bm25_topk_batch(
        tiny_index, {7: "w00000 zzznotaword"}, k=5, match_all=False
    ).collect()
    want = _rows(bm25_topk(tiny_index, "w00000 zzznotaword", k=5,
                           match_all=False))
    assert [(r["doc_id"], r["score"]) for r in
            sorted(rows, key=lambda r: r["rnk"])] == want

    empty = bm25_topk_batch(tiny_index, {1: "the and of"}, k=5)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "doc_id", "score", "rnk"]


def test_qld_topk_matches_python_golden(tiny_index):
    """LM-Dirichlet query likelihood vs an independent single-node
    recomputation from the collected postings: same matched-term
    decomposition ln(1 + tf/(mu*(cf/C))) + ln(mu/(dl+mu)), AND arity,
    (score desc, doc_id asc) tie-break."""
    from search_engine_spark.operators.query import (
        collection_tokens,
        parse_query,
        qld_topk,
    )

    mu = 500.0
    query = "w00000s w00001"
    lemmas = parse_query(query)
    got = [
        (r["doc_id"], r["score"])
        for r in qld_topk(tiny_index, query, k=10, mu=mu).collect()
    ]

    c_total = float(collection_tokens(tiny_index))
    cf = {
        r["lemma"]: int(r["cf"])
        for r in tiny_index.terms.filter(F.col("lemma").isin(lemmas)).collect()
    }
    posts = tiny_index.postings.filter(F.col("lemma").isin(lemmas)).collect()
    per_doc: dict[int, list[float]] = {}
    arity: dict[int, int] = {}
    for r in posts:
        w = math.log(
            1.0 + float(r["tf"]) / (mu * (float(cf[r["lemma"]]) / c_total))
        ) + math.log(mu / (float(r["dl"]) + mu))
        per_doc.setdefault(int(r["doc_id"]), []).append(w)
        arity[int(r["doc_id"])] = arity.get(int(r["doc_id"]), 0) + 1
    scored = [
        (d, round(math.fsum(ws), 6))
        for d, ws in per_doc.items()
        if arity[d] == len(lemmas)
    ]
    want = sorted(scored, key=lambda t: (-t[1], t[0]))[:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) <= 1e-6

    # dl-penalty sanity: identical tf/cf but longer doc scores lower
    assert all(s == sorted((s for _, s in got), reverse=True)[i]
               for i, (_, s) in enumerate(got))


def test_qld_topk_empty_and_or_mode(tiny_index):
    from search_engine_spark.operators.query import qld_topk

    assert qld_topk(tiny_index, "the and of", k=5).count() == 0
    got_or = qld_topk(
        tiny_index, "w00000 zzznotaword", k=5, match_all=False
    )
    got_and = qld_topk(tiny_index, "w00000 zzznotaword", k=5)
    assert got_and.count() == 0          # AND: missing term kills all
    assert got_or.count() == 5           # OR: surviving term matches


def test_collapse_topk_best_per_group(tiny_index):
    """Field collapsing: one representative per group (the group's
    best (score desc, doc_id asc) hit), groups competing globally —
    recomputed from the full scored list + a doc->group map."""
    from search_engine_spark.operators.query import collapse_topk

    query = "w00000s w00001"
    all_hits = _rows(bm25_topk(tiny_index, query, k=100000))
    groups = {
        int(r["doc_id"]): r["conv_id"]
        for r in tiny_index.docs.select("doc_id", "conv_id").collect()
    }
    best: dict[str, tuple] = {}
    for d, s in all_hits:  # already (score desc, doc_id asc) ordered
        g = groups[d]
        if g not in best:
            best[g] = (d, s)
    want = sorted(
        ((g, d, s) for g, (d, s) in best.items()),
        key=lambda t: (-t[2], t[1]),
    )[:10]
    got = [
        (r["group"], r["doc_id"], r["score"])
        for r in collapse_topk(
            tiny_index, tiny_index.docs, query, collapse_col="conv_id", k=10
        ).collect()
    ]
    assert got == want
    # collapsing really deduped: no group twice, and fewer-or-equal
    # rows than plain top-k over the same matches
    assert len({g for g, _, _ in got}) == len(got)


def test_collapse_topk_empty_query(tiny_index):
    from search_engine_spark.operators.query import collapse_topk

    out = collapse_topk(tiny_index, tiny_index.docs, "the and of", k=5)
    assert out.count() == 0
    assert out.columns == ["group", "doc_id", "score"]


def test_regexp_search_expansion_and_scoring(tiny_index):
    """Whole-term-anchored regex expansion == manual dictionary filter;
    scoring equals disjunctive BM25 over the expanded lemmas."""
    from search_engine_spark.operators.query import (
        bm25_topk_lemmas,
        expand_regex,
        regexp_search,
    )

    pat = "w0000[0-2]"
    lemmas = expand_regex(tiny_index.terms, pat, max_expansions=16)
    vocab = [r["lemma"] for r in tiny_index.terms.collect()]
    import re

    want_set = {v for v in vocab if re.fullmatch(pat, v)}
    assert set(lemmas) == want_set and want_set
    # partial matches (suffixed forms like w00000s) are NOT whole-term
    # matches — the anchoring contract
    assert not any(l.endswith("s") and len(l) > 6 for l in lemmas)

    got = regexp_search(tiny_index, pat, k=10).collect()
    want = bm25_topk_lemmas(tiny_index, lemmas, k=10, match_all=False).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_latest_hits_newest_matching_docs(tiny_index):
    from pyspark.sql import functions as F

    from search_engine_spark.operators.query import (
        docs_with_all_lemmas,
        latest_hits,
        parse_query,
    )

    query = "w00000s w00001"
    doc_ts = tiny_index.docs.select(
        "doc_id",
        F.timestamp_seconds(
            F.lit(1000000) + (F.col("doc_id") * 101) % 99991
        ).alias("ts"),
    )
    got = [
        (r["doc_id"], r["ts"])
        for r in latest_hits(tiny_index, doc_ts, query, k=5).collect()
    ]
    cand = [
        int(r["doc_id"])
        for r in docs_with_all_lemmas(
            tiny_index.postings, parse_query(query)
        ).collect()
    ]
    want_ids = sorted(
        cand, key=lambda d: (-(1000000 + (d * 101) % 99991), d)
    )[:5]
    assert [d for d, _ in got] == want_ids
    # ordered newest-first
    ts_list = [t for _, t in got]
    assert ts_list == sorted(ts_list, reverse=True)

    assert latest_hits(tiny_index, doc_ts, "the and of", k=5).count() == 0


def test_flatten_grouped_query_dnf():
    """Grouped mini-QL compiles to the flat OR-of-conjunctions form:
    Lucene precedence (parens > NOT > AND > OR), De Morgan on -(...),
    lenient stray parens, hard errors where no flat form exists."""
    from search_engine_spark.operators.query import flatten_grouped_query

    assert flatten_grouped_query("(a OR b) -c") == "a -c OR b -c"
    assert flatten_grouped_query('x (y OR "z w")') == 'x y OR x "z w"'
    assert flatten_grouped_query("-(a OR b) c") == "-a -b c"
    assert flatten_grouped_query("(a OR b) (c OR d)") == (
        "a c OR a d OR b c OR b d"
    )
    assert flatten_grouped_query("-(-a OR b)") == "a -b"
    assert flatten_grouped_query("((a))") == "a"
    # flat queries pass through token-identical
    assert flatten_grouped_query(
        'plain -neg "ph r" role:user pre* t^2'
    ) == 'plain -neg "ph r" role:user pre* t^2'
    # unbalanced parens degrade leniently, like unbalanced quotes
    assert flatten_grouped_query("(a") == "a"
    assert flatten_grouped_query("a ) b") == "a b"
    with pytest.raises(ValueError, match="conjunctive group"):
        flatten_grouped_query("-(a b)")
    with pytest.raises(ValueError, match="scope"):
        flatten_grouped_query("-(role:user OR a)")
    with pytest.raises(ValueError, match="wildcard"):
        flatten_grouped_query("-(w00000* OR a)")


def test_search_grouped_equals_flat_or(tiny_index):
    """search() on a grouped query must rank identically to search()
    on its hand-flattened form — grouping is pure compilation, zero new
    execution machinery."""
    from search_engine_spark.operators.query import search

    grouped = search(
        tiny_index, tiny_index.docs, "(w00000s OR w00159) w00268 -w00001",
        k=10,
    )
    flat = search(
        tiny_index, tiny_index.docs,
        "w00000s w00268 -w00001 OR w00159 w00268 -w00001", k=10,
    )
    g, f = _rows(grouped), _rows(flat)
    assert g == f
    assert g  # the fixture corpus must actually produce hits
