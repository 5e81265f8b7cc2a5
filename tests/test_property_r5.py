"""Hypothesis property pins for the round-5 operators: the winnowing
guarantee and budget-sample invariants hold for ARBITRARY corpora, not
just the hand-built fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

WORDS = [f"w{i:02d}" for i in range(40)]


@st.composite
def _corpus_with_shared_run(draw):
    """Two docs with independent random prefixes/suffixes around ONE
    shared token run of length >= window + k - 1 (k=3, w=4 -> 6)."""
    run = draw(st.lists(st.sampled_from(WORDS), min_size=6, max_size=10))
    pre_a = draw(st.lists(st.sampled_from(WORDS), min_size=0, max_size=8))
    suf_a = draw(st.lists(st.sampled_from(WORDS), min_size=0, max_size=8))
    pre_b = draw(st.lists(st.sampled_from(WORDS), min_size=0, max_size=8))
    suf_b = draw(st.lists(st.sampled_from(WORDS), min_size=0, max_size=8))
    return (" ".join(pre_a + run + suf_a), " ".join(pre_b + run + suf_b))


@settings(max_examples=10, deadline=None)
@given(_corpus_with_shared_run())
def test_winnowing_guarantee_property(spark, pair):
    """Schleimer et al. theorem, as a property: ANY shared run of
    length >= w + k - 1 yields >= 1 shared fingerprint."""
    from search_engine_spark.operators.dedup import winnow_fingerprints

    docs = spark.createDataFrame(
        [(0, pair[0]), (1, pair[1])], "doc_id long, text string"
    )
    fps = {0: set(), 1: set()}
    for r in winnow_fingerprints(docs, k=3, window=4).collect():
        fps[r["doc_id"]].add(r["fp"])
    assert fps[0] & fps[1], pair


@st.composite
def _docs_and_budget(draw):
    n = draw(st.integers(min_value=3, max_value=20))
    rows = []
    for i in range(n):
        nw = draw(st.integers(min_value=1, max_value=25))
        rows.append((i, " ".join(
            draw(st.sampled_from(WORDS)) for _ in range(nw)
        )))
    budget = draw(st.integers(min_value=0, max_value=300))
    return rows, budget


@settings(max_examples=10, deadline=None)
@given(_docs_and_budget())
def test_budget_sample_invariants_property(spark, case):
    """For ANY corpus/budget: kept token mass never exceeds the budget
    (both methods), the approx kept set is a subset of some exact kept
    set at the same budget when qualities are used as tie-free keys is
    NOT guaranteed under ties — so the property pinned here is the
    mass bound plus monotonicity: a larger budget never keeps fewer
    docs (exact path)."""
    from search_engine_spark.operators.sampling import budget_sample

    rows, budget = case
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = budget_sample(docs, budget, method="exact").collect()
    approx = budget_sample(docs, budget, method="approx",
                           n_buckets=4).collect()
    assert sum(r["n_tokens"] for r in exact) <= budget
    assert sum(r["n_tokens"] for r in approx) <= budget
    bigger = budget_sample(docs, budget + 50, method="exact").collect()
    assert len(bigger) >= len(exact)
