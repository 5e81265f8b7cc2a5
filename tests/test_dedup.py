"""Dedup operators: exact, n-gram Jaccard, MinHash+LSH, SimHash
(operators/dedup.py; training-pipeline charter beyond the reference)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.dedup import (
    drop_exact_duplicates,
    exact_duplicates,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
    simhash_signatures,
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
NEAR = BASE.replace("theta", "thorn")          # one token changed
FAR = "one two three four five six seven eight nine ten eleven twelve"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),            # exact dup of 0
        (2, NEAR),            # near dup of 0/1
        (3, FAR),
        (4, "alpha beta"),    # too short for 3-shingles
        (5, FAR),             # exact dup of 3
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicates(docs):
    got = {(r["keeper_id"], r["dup_count"]) for r in exact_duplicates(docs).collect()}
    assert (0, 2) in got and (3, 2) in got
    assert all(c == 1 for k, c in got if k not in (0, 3))


def test_drop_exact_duplicates(docs):
    kept = sorted(r["doc_id"] for r in drop_exact_duplicates(docs).collect())
    assert kept == [0, 2, 3, 4]


def test_ngram_jaccard(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs
    # jaccard(0,2): 10 shingles each, changed token kills 3 shingles
    # -> inter=7, union=13
    assert abs(pairs[(0, 2)] - 7 / 13) < 1e-6


def test_minhash_lsh_finds_near_dups(docs):
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in minhash_near_duplicates(docs, threshold=0.5).collect()}
    # exact dups always collide in every band
    assert got[(0, 1)] == 1.0
    assert got[(3, 5)] == 1.0
    # verification step = exact jaccard -> any reported value is exact
    for (a, b), j in got.items():
        assert j >= 0.5


def test_minhash_subset_of_exact_jaccard(docs):
    exact = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(docs, 0.5).collect()}
    lsh = {(r["doc_a"], r["doc_b"]) for r in minhash_near_duplicates(docs, 0.5).collect()}
    assert lsh <= exact  # no false positives (exact verify)


def test_simhash_identical_docs(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[3] == sigs[5]
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_near_duplicates(docs, max_hamming=3).collect()}
    assert pairs[(0, 1)] == 0
    assert pairs[(3, 5)] == 0
    assert (0, 3) not in pairs


def test_connected_components_chain_and_clusters(spark):
    """Min-label propagation: a 4-hop chain (multi-round convergence),
    a separate triangle, and a disjoint pair each collapse to their min
    doc_id; singletons are absent from the component table."""
    from search_engine_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [
            # chain 10-11-12-13-14 (diameter forces >1 round)
            (10, 11), (11, 12), (12, 13), (13, 14),
            # triangle 20-21-22
            (20, 21), (21, 22), (20, 22),
            # isolated pair
            (30, 31),
        ],
        "doc_a long, doc_b long",
    )
    got = {
        int(r["doc_id"]): int(r["component"])
        for r in connected_components(pairs).collect()
    }
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
                   20: 20, 21: 20, 22: 20, 30: 30, 31: 30}


def test_dedup_keepers_assigns_singletons_to_self(spark):
    from search_engine_spark.operators.dedup import dedup_keepers

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 3), (3, 5)], "doc_a long, doc_b long")
    rows = {
        int(r["doc_id"]): (int(r["keeper_id"]), bool(r["is_keeper"]))
        for r in dedup_keepers(docs, pairs).collect()
    }
    assert rows == {
        0: (0, True), 1: (1, True), 2: (2, True),
        3: (1, False), 4: (4, True), 5: (1, False),
    }


def test_repetition_signals_hand_computed(spark):
    """Gopher-style repetition stats on hand-checkable fixtures:
    overlapping bigram counts, struct-min tie-break, short-doc dropout."""
    from search_engine_spark.operators.dedup import repetition_signals

    docs = spark.createDataFrame(
        [
            # bigrams: (a b)x3, (b a)x2 -> top "a b", dup 1-2/5, norm len 11
            (1, "a b a b a b"),
            # all bigrams distinct -> dup 0; tie on count 1 -> lexic. min
            (2, "c d e"),
            (3, "solo"),          # < 2 tokens: drops out
            (4, "x x x x"),       # one gram repeated: dup 1-1/3, top x x
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r.asDict()
           for r in repetition_signals(docs, n=2).collect()}
    assert set(got) == {1, 2, 4}

    assert got[1]["top_gram"] == "a b" and got[1]["top_gram_count"] == 3
    assert got[1]["dup_gram_frac"] == round(1 - 2 / 5, 6)
    assert got[1]["top_char_frac"] == round(3 * 3 / 11, 6)
    assert got[1]["n_tokens"] == 6

    assert got[2]["top_gram"] == "c d"  # tie: lexicographically smallest
    assert got[2]["top_gram_count"] == 1 and got[2]["dup_gram_frac"] == 0.0

    assert got[4]["top_gram"] == "x x" and got[4]["top_gram_count"] == 3
    assert got[4]["dup_gram_frac"] == round(1 - 1 / 3, 6)
    # norm text "x x x x" len 7, covered 3*3
    assert got[4]["top_char_frac"] == round(9 / 7, 6)


def test_duplicate_spans_hand_computed(spark):
    """Substring-level dedup on a hand fixture (span=3): cross-doc and
    within-doc repeats both count, short docs drop out."""
    from search_engine_spark.operators.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [
            (0, "a b c d e"),        # spans: abc bcd cde
            (1, "x y a b c"),        # spans: xya yab abc -> shares abc with 0
            (2, "p q p q p q"),      # spans: pqp qpq pqp qpq -> all repeats
            (3, "m n"),              # < span tokens: dropped
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["total_spans"], r["dup_spans"], r["dup_frac"])
        for r in duplicate_spans(docs, span=3).collect()
    }
    assert got == {
        0: (3, 1, round(1 / 3, 6)),
        1: (3, 1, round(1 / 3, 6)),
        2: (4, 4, 1.0),
    }


def test_connected_components_fast_path_equals_distributed(spark):
    """The driver union-find (small graphs) and the iterative
    propagation loop must produce identical (doc_id, component) labels
    on a graph with chains, cliques and singleton-free edges."""
    import random

    from search_engine_spark.operators.dedup import connected_components

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(0, 30, 3)]           # short chains
    edges += [(100 + a, 100 + b) for a in range(5) for b in range(a)]  # clique
    edges += [(rng.randrange(200, 260), rng.randrange(200, 260))
              for _ in range(40)]                            # random blob
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    fast = {(r["doc_id"], r["component"])
            for r in connected_components(pairs).collect()}
    dist = {(r["doc_id"], r["component"])
            for r in connected_components(
                pairs, driver_max_edges=0).collect()}
    assert fast == dist and fast
    # label == min id of the component (spot-check the clique)
    comp_of = dict(fast)
    assert all(comp_of[100 + i] == 100 for i in range(5))


def test_shingles_short_rows_yield_empty_array(spark):
    """shingles_over_tokens_expr must be safe on UNFILTERED rows: a row
    with fewer than n tokens yields an EMPTY array. The old guard
    sequence(0, greatest(size-n, -1)) produced [0,-1] (Spark's sequence
    steps -1 when start > stop) and the -1 index made slice() throw —
    one short row aborted the whole job (ADVICE r3, confirmed repro)."""
    from search_engine_spark.operators.dedup import shingles_over_tokens_expr

    df = spark.createDataFrame(
        [(0, ["a", "b"]), (1, []), (2, ["a", "b", "c", "d"])],
        "doc_id long, _toks array<string>",
    )
    got = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", shingles_over_tokens_expr("_toks", 3).alias("sh")
        ).collect()
    }
    assert got[0] == [] and got[1] == []
    assert got[2] == ["a b c", "b c d"]


def test_lsh_rejects_degenerate_banding(spark, docs):
    """bands > num_hashes makes every band hash the SAME empty slice —
    every doc lands in every bucket and the band join silently
    degenerates to the all-pairs O(N²) blowup LSH exists to prevent;
    a non-dividing bands silently drops trailing hashes. Both must be
    rejected loudly (ADVICE r3)."""
    from search_engine_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures)

    with pytest.raises(ValueError, match="bands"):
        minhash_near_duplicates(docs, num_hashes=16, bands=32)
    sigs = minhash_signatures(docs, num_hashes=32)
    with pytest.raises(ValueError, match="divide"):
        lsh_candidate_pairs(sigs, bands=5, num_hashes=32)
    # dividing banding still works
    assert lsh_candidate_pairs(sigs, bands=8, num_hashes=32).count() >= 0


def test_connected_components_string_ids(spark):
    """The driver union-find fast path must support any id type whose
    Python ordering matches Spark's least/greatest — string ids crashed
    the old int() cast below the size gate while the distributed loop
    handled them (ADVICE r3). Both paths must agree and preserve the
    id type."""
    from search_engine_spark.operators.dedup import connected_components

    edges = [("conv-2:1", "conv-9:0"), ("conv-9:0", "conv-5:3"),
             ("x:1", "x:2")]
    pairs = spark.createDataFrame(edges, "doc_a string, doc_b string")
    fast = {(r["doc_id"], r["component"])
            for r in connected_components(pairs).collect()}
    dist = {(r["doc_id"], r["component"])
            for r in connected_components(pairs, driver_max_edges=0).collect()}
    assert fast == dist
    comp_of = dict(fast)
    assert comp_of["conv-9:0"] == "conv-2:1" == comp_of["conv-5:3"]
    assert comp_of["x:2"] == "x:1"


def test_duplicate_span_rewrite_surgery(spark):
    """The Lee-et-al rewrite: tokens covered by any globally duplicated
    span window vanish, unique content survives verbatim, short docs
    pass through untouched, and a fully-duplicated doc empties."""
    from search_engine_spark.operators.dedup import duplicate_span_rewrite

    docs = spark.createDataFrame([
        (0, "alpha beta gamma delta epsilon unique tail words here"),
        (1, "prefix words alpha beta gamma delta epsilon closing remark"),
        (2, "totally different content with no overlap whatsoever at all"),
        (3, "tiny doc"),                         # shorter than span
        (4, "alpha beta gamma delta epsilon"),   # nothing but the clone
        (5, "alpha beta gamma delta epsilon"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
           for r in duplicate_span_rewrite(docs, span=5).collect()}
    assert got[0] == (9, 5, "unique tail words here")
    assert got[1] == (9, 5, "prefix words closing remark")
    assert got[2][1] == 0 and got[2][2].startswith("totally different")
    assert got[3] == (2, 0, "tiny doc")
    assert got[4] == (5, 5, "") and got[5] == (5, 5, "")
    # consistency with the audit view: a doc whose dup_frac is 0 loses
    # nothing here
    from search_engine_spark.operators.dedup import duplicate_spans

    frac = {r["doc_id"]: r["dup_frac"]
            for r in duplicate_spans(docs, span=5).collect()}
    assert frac[2] == 0.0 and got[2][1] == 0
    assert frac[0] > 0 and got[0][1] > 0


def test_span_exchange_key_is_hashed_long(spark):
    """The 100 TB shuffle contract (VERDICT r4 'wrong #2'): the global
    span-occurrence aggregate and the count join key on
    xxhash64(span) — every exchange row carries an 8-byte long, and
    the ~8-token span STRING never appears in any Exchange
    (hashpartitioning) clause of either plan."""
    import re

    from search_engine_spark.operators.dedup import (
        duplicate_span_rewrite,
        duplicate_spans,
    )
    from search_engine_spark.plans.explain import physical_plan

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    for frame in (duplicate_spans(docs, span=8),
                  duplicate_span_rewrite(docs, span=8)):
        plan = physical_plan(frame)
        keys = re.findall(r"hashpartitioning\(([^)#]+)#", plan)
        assert any(k.strip() == "span_h" for k in keys), plan
        assert not any(k.strip() == "span" for k in keys), plan


def test_winnow_fingerprints_guarantee_and_edges(spark):
    """The winnowing guarantee (Schleimer et al. 2003): two documents
    sharing a token run of length >= window + k - 1 share at least one
    fingerprint; unrelated docs (distinct vocab) share none. Edge
    cases: < k tokens -> no rows; k <= tokens < k+window-1 grams ->
    one global-min fingerprint."""
    from search_engine_spark.operators.dedup import winnow_fingerprints

    k, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
    docs = spark.createDataFrame(
        [
            (0, "one two " + shared + " three four"),
            (1, "five six seven " + shared),
            (2, "red orange yellow green blue indigo violet"),
            (3, "aa bb"),                # < k tokens: nothing
            (4, "cc dd ee"),             # exactly k: one fingerprint
        ],
        "doc_id long, text string",
    )
    fps = {}
    for r in winnow_fingerprints(docs, k=k, window=w).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] & fps[1], (fps[0], fps[1])
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])
    assert 3 not in fps
    assert len(fps[4]) == 1
