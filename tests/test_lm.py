"""Bigram-LM perplexity + DSIR resampling (operators/lm.py) vs a pure
pandas/math reference implementation on a tiny deterministic corpus."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.text import tokenize_py
from search_engine_spark.operators.lm import (
    LM_ALPHA,
    cross_entropy,
    doc_bigrams,
    dsir_resample,
    train_bigram_lm,
)

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the cat ate the fish", "en"),
    (2, "the dog sat on the log", "en"),
    (3, "le chat et le chien", "fr"),
    (4, "le chien mange le poisson", "fr"),
    (5, "single", "en"),  # 1 token -> no transitions, dropped
    (6, "", "en"),  # empty -> dropped
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"]).cache()


def _py_model(rows):
    bi, ctx, vocab = {}, {}, set()
    for _id, text, _lang in rows:
        t = tokenize_py(text)
        for a, b in zip(t, t[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
            vocab.add(a)
            vocab.add(b)
    return bi, ctx, len(vocab)


def _py_ce(rows, model, alpha=LM_ALPHA):
    bi, ctx, v = model
    out = {}
    for _id, text, _lang in rows:
        t = tokenize_py(text)
        if len(t) < 2:
            continue
        # decimal-grid sum like the engine: round each lp to 1e-10
        s = 0
        n = 0
        for a, b in zip(t, t[1:]):
            p = (bi.get((a, b), 0) + alpha) / (ctx.get(a, 0) + alpha * v)
            s += round(round(math.log(p), 10) * 10**10)
            n += 1
        out[_id] = (n, round(-(s / 10**10) / n, 6))
    return out


def test_doc_bigrams_every_transition(docs):
    rows = doc_bigrams(docs).collect()
    got = sorted((r.doc_id, r.w1, r.w2) for r in rows)
    want = []
    for _id, text, _lang in DOCS:
        t = tokenize_py(text)
        if len(t) >= 2:
            want += [(_id, a, b) for a, b in zip(t, t[1:])]
    assert got == sorted(want)


def test_model_counts_match_python(docs):
    lm = train_bigram_lm(docs)
    bi, ctx, v = _py_model(DOCS)
    assert {(r.w1, r.w2): r.c for r in lm.bigrams.collect()} == bi
    assert {r.w1: r.ctx for r in lm.contexts.collect()} == ctx
    assert lm.vocab.collect()[0].v == v


def test_cross_entropy_matches_python(docs):
    lm = train_bigram_lm(docs)
    got = {r.doc_id: (r.n_bigrams, r.cross_entropy, r.perplexity)
           for r in cross_entropy(docs, lm).collect()}
    want = _py_ce(DOCS, _py_model(DOCS))
    assert set(got) == set(want)  # short docs dropped
    for d, (n, ce) in want.items():
        assert got[d][0] == n
        assert got[d][1] == pytest.approx(ce, abs=2e-6)
        assert got[d][2] == pytest.approx(round(math.exp(got[d][1]), 6),
                                          abs=1e-6)


def test_unseen_context_scores_vocab_floor(spark, docs):
    """A doc whose w1 the model never saw gets P = 1/V exactly."""
    lm = train_bigram_lm(docs.filter(F.col("lang") == "en"))
    _, _, v = _py_model([r for r in DOCS if r[2] == "en"])
    new = spark.createDataFrame([(99, "zzz qqq", "xx")],
                                ["doc_id", "text", "lang"])
    row = cross_entropy(new, lm).collect()[0]
    assert row.n_bigrams == 1
    assert row.cross_entropy == pytest.approx(round(math.log(v), 6), abs=1e-6)


def test_min_count_prune_only_lowers_probability(docs):
    """Pruned bigrams fall to the smoothing floor; ce never decreases."""
    full = {r.doc_id: r.cross_entropy
            for r in cross_entropy(docs, train_bigram_lm(docs)).collect()}
    pruned = {r.doc_id: r.cross_entropy
              for r in cross_entropy(
                  docs, train_bigram_lm(docs, min_count=2)).collect()}
    assert set(full) == set(pruned)
    assert all(pruned[d] >= full[d] - 1e-9 for d in full)
    assert any(pruned[d] > full[d] for d in full)  # something was pruned


def test_dsir_gumbel_topk_matches_python(docs):
    """Selection = top-k of round(logw + gumbel(md5), 6) computed in
    pure python from the engine's own ce outputs."""
    tgt = docs.filter(F.col("lang") == "en")
    got = dsir_resample(docs, tgt, k=3, seed="s1").collect()

    ce_raw = {r.doc_id: (r.n_bigrams, r.cross_entropy)
              for r in cross_entropy(docs, train_bigram_lm(docs)).collect()}
    ce_tgt = {r.doc_id: r.cross_entropy
              for r in cross_entropy(docs, train_bigram_lm(tgt)).collect()}
    keys = {}
    for d, (n, cer) in ce_raw.items():
        h = int(hashlib.md5(f"{d}:s1".encode()).hexdigest()[:15], 16)
        u = (h + 1) / (2**60 + 1)
        g = -math.log(-math.log(u))
        lw = round((cer - ce_tgt[d]) * n, 6)
        keys[d] = (round(lw + g, 6), lw)
    want = sorted(keys.items(), key=lambda kv: (-kv[1][0], kv[0]))[:3]
    assert [(r.doc_id, r.key, r.log_weight) for r in got] == [
        (d, pytest.approx(k, abs=2e-6), pytest.approx(lw, abs=2e-6))
        for d, (k, lw) in want
    ]
    # en-trained target model must prefer en docs on weight
    en_w = [kv[1][1] for kv in keys.items() if DOCS[kv[0]][2] == "en"]
    fr_w = [kv[1][1] for kv in keys.items() if DOCS[kv[0]][2] == "fr"]
    assert min(en_w) > max(fr_w)


def test_scoring_plan_is_broadcast_and_python_free(docs):
    plan = cross_entropy(docs, train_bigram_lm(docs))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan  # model joins must not shuffle


def test_perplexity_buckets_integer_cut(docs):
    """CCNet tiers: bucket = ((rank-1)*3) div n over (perplexity,
    doc_id) ascending — engine-identical integer arithmetic, labels
    aligned; short/empty docs (no transitions) never appear."""
    from search_engine_spark.operators.lm import perplexity_buckets

    ce = cross_entropy(docs, train_bigram_lm(docs))
    got = {
        r["doc_id"]: (r["bucket"], r["label"])
        for r in perplexity_buckets(ce).collect()
    }
    rows = sorted((r["perplexity"], r["doc_id"]) for r in ce.collect())
    n = len(rows)
    labels = ("head", "middle", "tail")
    want = {d: ((i * 3) // n, labels[(i * 3) // n]) for i, (_p, d) in enumerate(rows)}
    assert got == want
    assert n == 5 and set(got) == {0, 1, 2, 3, 4}


def test_perplexity_buckets_approx_matches_exact(spark):
    """The 100 TB plan (percentile_approx cutoffs + comparison filter)
    must agree with the exact rank path on distinct-valued frames —
    pinned across remainder cases (n % n_buckets in {0,1,2})."""
    import random

    from search_engine_spark.operators.lm import perplexity_buckets

    rng = random.Random(7)
    for n in (9, 10, 11, 30, 100):
        vals = rng.sample(range(1, 100000), n)
        ce = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)],
            "doc_id long, perplexity double",
        )
        exact = {(r["doc_id"], r["bucket"], r["label"])
                 for r in perplexity_buckets(ce).collect()}
        approx = {(r["doc_id"], r["bucket"], r["label"])
                  for r in perplexity_buckets(ce, method="approx").collect()}
        assert exact == approx, f"n={n}"


def test_perplexity_buckets_approx_plan_has_no_window(spark):
    """The approx path must be scan-shaped: no Window operator, no
    global sort of the doc frame — the whole point of the method."""
    from search_engine_spark.operators.lm import perplexity_buckets

    ce = spark.createDataFrame(
        [(i, float(i * 7 % 23)) for i in range(40)],
        "doc_id long, perplexity double",
    )
    plan = perplexity_buckets(ce, method="approx")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" not in plan
    exact_plan = perplexity_buckets(ce)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" in exact_plan  # the audit path is the windowed one


def test_perplexity_buckets_tie_on_cutoff_goes_low(spark):
    """Boundary semantics: a doc EQUAL to a cutoff value lands in the
    LOWER bucket (ties collapse down instead of splitting by doc_id)."""
    from search_engine_spark.operators.lm import perplexity_buckets

    # n=6, n_buckets=3 -> cutoffs = values at ranks ceil(n/3)=2 and
    # ceil(2n/3)=4, i.e. [2.0, 2.0]: the tie group spans both cutoffs
    ce = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 2.0), (3, 2.0), (4, 5.0), (5, 6.0)],
        "doc_id long, perplexity double",
    )
    got = {r["doc_id"]: r["bucket"]
           for r in perplexity_buckets(ce, method="approx").collect()}
    # every 2.0 ties DOWN into bucket 0 (bucket 1 ends up empty);
    # the exact path would instead split docs 1-3 across buckets 0/1
    # by doc_id — this is the documented divergence under ties
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 2, 5: 2}
    exact = {r["doc_id"]: r["bucket"]
             for r in perplexity_buckets(ce).collect()}
    assert exact == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2}
