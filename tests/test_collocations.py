"""Corpus collocation mining (operators/collocations.py)."""

from __future__ import annotations

import math

import pytest

from search_engine_spark.operators.collocations import collocations


def test_collocations_hand_computed(spark):
    """PMI against hand arithmetic on a corpus where 'new york' is a
    strong collocation and 'the the' is not."""
    docs = spark.createDataFrame(
        [
            (1, "new york new york new york"),
            (2, "the cat the dog the bird new york"),
            (3, "york new has low affinity the the"),
        ],
        "doc_id long, text string",
    )
    rows = collocations(docs, min_count=3, top_n=10).collect()
    got = {(r["w1"], r["w2"]): r for r in rows}
    assert ("new", "york") in got
    r = got[("new", "york")]
    assert r["pair_count"] == 4
    # totals: tokens and bigrams counted over every doc
    toks = ("new york new york new york the cat the dog the bird "
            "new york york new has low affinity the the").split()
    t_total = float(len(toks))          # 21
    b_total = float((6 - 1) + (8 - 1) + (7 - 1))  # 18
    c_new, c_york, c_ab = 5.0, 5.0, 4.0
    want = round(
        math.log((c_ab / b_total) / ((c_new / t_total) * (c_york / t_total))),
        6,
    )
    assert r["pmi"] == pytest.approx(want, abs=1e-9)
    # min_count floor: 'the cat' (1x) excluded; 'york new' (3x) kept
    assert ("the", "cat") not in got
    assert got[("york", "new")]["pair_count"] == 3


def test_collocations_single_token_docs_guard(spark):
    """1-token docs contribute unigrams but no (descending-sequence)
    bigram garbage; a corpus of only 1-token docs yields no pairs."""
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")],
        "doc_id long, text string",
    )
    assert collocations(docs, min_count=1, top_n=10).count() == 0

    mixed = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha beta"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    rows = collocations(mixed, min_count=2, top_n=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["pair_count"]) == ("alpha", "beta", 2)
    # the 1-token doc's 'alpha' occurrence must count toward T and c_a
    want = round(math.log((2 / 2.0) / ((3 / 5.0) * (2 / 5.0))), 6)
    assert r["pmi"] == pytest.approx(want, abs=1e-9)


def test_collocations_ordering_and_topn(spark):
    docs = spark.createDataFrame(
        [(i, "aa bb cc dd") for i in range(5)], "doc_id long, text string"
    )
    rows = collocations(docs, min_count=1, top_n=2).collect()
    assert len(rows) == 2
    # all three pairs have identical counts/PMI → lexicographic order
    assert [(r["w1"], r["w2"]) for r in rows] == [("aa", "bb"), ("bb", "cc")]


def test_keyphrases_rake_scores(spark):
    """RAKE on a toy corpus with hand-computed deg/freq scores:
    'quick brown fox' ×3 → each word freq=3, deg=9 → score 9.0;
    two-word phrases score 4.0; stopwords delimit candidates."""
    from search_engine_spark.operators.collocations import keyphrases

    docs = spark.createDataFrame(
        [(1, "the quick brown fox and a lazy dog in the quick brown fox"),
         (2, "quick brown fox is it or lazy dog"),
         (3, "deep learning of neural networks and deep learning")],
        "doc_id long, text string",
    )
    rows = keyphrases(docs, top_n=10, min_count=1).collect()
    got = {r["phrase"]: (r["n_words"], r["phrase_count"], r["score"])
           for r in rows}
    assert got["quick brown fox"] == (3, 3, 9.0)
    assert got["deep learning"] == (2, 2, 4.0)
    assert got["lazy dog"] == (2, 2, 4.0)
    assert got["neural networks"] == (2, 1, 4.0)
    # ordered by (score desc, phrase asc)
    assert [r["phrase"] for r in rows] == [
        "quick brown fox", "deep learning", "lazy dog", "neural networks"
    ]
    # min_count floor removes singletons
    counted = {r["phrase"]
               for r in keyphrases(docs, top_n=10, min_count=2).collect()}
    assert "neural networks" not in counted and "deep learning" in counted


def test_keyphrases_max_words_cap(spark):
    from search_engine_spark.operators.collocations import keyphrases

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    # the 6-word run exceeds max_words=4 -> no phrases at all
    assert keyphrases(docs, top_n=5, min_count=1, max_words=4).count() == 0
    assert keyphrases(docs, top_n=5, min_count=1, max_words=6).count() == 1
