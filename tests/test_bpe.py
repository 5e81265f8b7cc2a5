"""BPE trainer (operators/bpe.py) vs a pure-Python canonical BPE on a
tiny corpus: merge table identity, encoded token counts, greedy
left-to-right overlap semantics, and the zero-shuffle encode plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.text import tokenize_py
from search_engine_spark.operators.bpe import (
    bpe_token_counts,
    train_bpe,
    word_counts,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the hat and the cat and a rat"),
    (2, "that hat is the fat cat hat"),
    (3, "aaaa baa aab"),  # overlap-greedy stress
    (4, ""),              # empty doc -> 0 tokens
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


def _py_word_counts(rows):
    wc: dict[str, int] = {}
    for _id, text in rows:
        for w in tokenize_py(text):
            wc[w] = wc.get(w, 0) + 1
    return wc


def _py_apply(sym: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _py_train(wc: dict[str, int], k: int):
    symbols = {w: list(w) for w in wc}
    merges = []
    for r in range(k):
        pc: dict[tuple[str, str], int] = {}
        for w, sym in symbols.items():
            for x, y in zip(sym, sym[1:]):
                pc[(x, y)] = pc.get((x, y), 0) + wc[w]
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, a + b, c))
        symbols = {w: _py_apply(sym, a, b) for w, sym in symbols.items()}
    return merges, symbols


def test_merge_table_matches_python(docs):
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in train_bpe(docs, n_merges=6).orderBy("merge_rank").collect()
    ]
    want, _ = _py_train(_py_word_counts(DOCS), 6)
    assert got == want
    assert len(got) == 6


def test_token_counts_match_python_encode(docs):
    k = 6
    merges = [
        (r["lhs"], r["rhs"])
        for r in train_bpe(docs, n_merges=k).orderBy("merge_rank").collect()
    ]
    got = {
        r["doc_id"]: r["n_tokens_bpe"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    _, symbols = _py_train(_py_word_counts(DOCS), k)
    want = {
        _id: sum(len(symbols[w]) for w in tokenize_py(text))
        for _id, text in DOCS
    }
    assert got == want
    assert got[4] == 0  # empty doc


def test_greedy_overlap_is_canonical(spark):
    # "aaaaa" under (a,a): greedy left-to-right -> aa aa a (3 pieces)
    d = spark.createDataFrame([(0, "aaaaa")], ["doc_id", "text"])
    got = bpe_token_counts(d, [("a", "a")]).head()["n_tokens_bpe"]
    assert got == 3


def test_word_boundaries_never_merge(spark):
    # (a,b) merges inside words only: "ab ab" -> 2 pieces, "a b" -> 2
    d = spark.createDataFrame([(0, "ab ab"), (1, "a b")], ["doc_id", "text"])
    got = {
        r["doc_id"]: r["n_tokens_bpe"]
        for r in bpe_token_counts(d, [("a", "b")]).collect()
    }
    assert got == {0: 2, 1: 2}


def test_encode_plan_is_shuffle_free_and_python_free(docs):
    plan = bpe_token_counts(docs, [("t", "h"), ("th", "e")])._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_exhaustion_stops_early(spark):
    # one single-char word: zero pairs -> empty merge table, no error
    d = spark.createDataFrame([(0, "a a a")], ["doc_id", "text"])
    assert train_bpe(d, n_merges=4).count() == 0
    wc = word_counts(d)
    assert [(r["word"], r["cnt"]) for r in wc.collect()] == [("a", 3)]
