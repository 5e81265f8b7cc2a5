"""Multinomial Naive Bayes train/classify (operators/classify.py)."""

from __future__ import annotations

import math


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lab) for i, (t, lab) in enumerate(rows)],
        "doc_id long, text string, lang string",
    )


def test_nb_recovers_separable_labels(spark):
    """On vocabulary-separable classes the argmax label must equal the
    training label for every document (self-classification)."""
    from search_engine_spark.operators.classify import nb_classify, nb_train

    rows = (
        [("apfel birne kirsche traube", "de")] * 4
        + [("apple pear cherry grape", "en")] * 4
        + [("pomme poire cerise raisin", "fr")] * 4
    )
    docs = _docs(spark, rows)
    model = nb_train(docs, label_col="lang")
    got = {r["doc_id"]: r["label"] for r in nb_classify(docs, model).collect()}
    want = {i: lab for i, (_, lab) in enumerate(rows)}
    assert got == want


def test_nb_scores_match_hand_computation(spark):
    """score(d, l) = log_prior + Σ tf·llh on a 2-label corpus, with the
    decimal-grid contract (per-term round 10, sum, +prior, round 6)."""
    from search_engine_spark.operators.classify import nb_classify, nb_train

    rows = [("cat cat dog", "a"), ("dog dog bird", "b")]
    docs = _docs(spark, rows)
    model = nb_train(docs, label_col="lang", alpha=1.0)
    assert model.vocab_size == 3 and model.n_docs == 2

    # label a: counts cat=2 dog=1, T=3; label b: dog=2 bird=1, T=3; V=3
    def llh(c, t):
        return math.log((c + 1.0) / (t + 3.0))

    def dec(x):
        return round(x, 10)

    # doc 0 = cat:2 dog:1
    s0a = round(dec(2 * llh(2, 3)) + dec(1 * llh(1, 3)) + math.log(0.5), 6)
    s0b = round(dec(2 * llh(0, 3)) + dec(1 * llh(2, 3)) + math.log(0.5), 6)
    got = {(r["doc_id"], r["label"]): r["score"]
           for r in nb_classify(docs, model).collect()}
    assert set(got) == {(0, "a"), (1, "b")}
    assert abs(got[(0, "a")] - s0a) < 1e-9
    assert s0a > s0b  # the winning margin the argmax rode


def test_nb_unseen_lemma_uses_label_default(spark):
    """A lemma absent from a label's training counts contributes the
    per-label unseen llh (ln(α/(T+αV))) — never a null/dropped term."""
    from search_engine_spark.operators.classify import nb_classify, nb_train

    train = _docs(spark, [("cat cat cat", "a"), ("dog dog dog", "b")])
    model = nb_train(train, label_col="lang")
    probe = spark.createDataFrame(
        [(99, "cat dog")], "doc_id long, text string"
    )
    rows = nb_classify(probe, model).collect()
    assert len(rows) == 1
    # symmetric evidence -> tie on score, label asc wins
    assert rows[0]["label"] == "a"


def test_classify_cli_train_score_eval(tmp_path):
    """jobs/classify.py end-to-end: train persists a count-based model
    (merge-friendly), score applies it, eval reports accuracy — 1.0 on
    a vocabulary-separable corpus."""
    import json as _json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    import pandas as pd

    rows = ([{"doc_id": i, "text": "apfel birne kirsche", "lang": "de"}
             for i in range(5)]
            + [{"doc_id": 5 + i, "text": "apple pear cherry", "lang": "en"}
               for i in range(5)])
    src = str(tmp_path / "docs.parquet")
    pd.DataFrame(rows).to_parquet(src)
    model = str(tmp_path / "nb")

    def run(*a):
        return subprocess.run(
            [sys.executable, os.path.join(repo, "jobs", "classify.py"),
             *a, "--local-cpus", "2"],
            capture_output=True, text=True, cwd=repo, timeout=300, env=env,
        )

    t = run("train", "--input", src, "--model", model)
    assert t.returncode == 0, t.stderr[-2000:]
    assert _json.loads(t.stdout.strip().splitlines()[-1])["labels"] == 2

    s = run("score", "--input", src, "--model", model, "--limit", "20")
    assert s.returncode == 0, s.stderr[-2000:]
    hits = [_json.loads(l) for l in s.stdout.strip().splitlines() if l]
    assert {h["doc_id"]: h["label"] for h in hits} == {
        i: ("de" if i < 5 else "en") for i in range(10)
    }

    e = run("eval", "--input", src, "--model", model)
    assert e.returncode == 0, e.stderr[-2000:]
    rep = _json.loads(e.stdout.strip().splitlines()[-1])
    assert rep["accuracy"] == 1.0 and rep["n"] == 10
