"""Tokenizer/lemmatizer: four synchronized implementations stay in
lock-step (functions/text.py docstring contract; reference semantics
HtmlParsing.java:147-153 + Lemmatization.java:48-126 on our alphabet)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.text import (
    duckdb_lemma_rows_sql,
    lemmas_col,
    lemmatize_py,
    lemmatize_text_py,
    lemmatize_text_udf,
    tokenize_py,
)

GOLDEN_TOKENS = [
    ("Hello, World!", ["hello", "world"]),
    ("X-w00017ing  \t spaces", ["x", "w00017ing", "spaces"]),
    ("", []),
    (None, []),
    ("...!!!", []),
    ("MiXeD CaSe123abc", ["mixed", "case123abc"]),
]

def test_tokenize_py_golden():
    for text, want in GOLDEN_TOKENS:
        assert tokenize_py(text) == want, text


def test_lemmatize_py_golden():
    assert lemmatize_py("running") == "runn"
    assert lemmatize_py("ring") == "ring"
    assert lemmatize_py("studies") == "study"
    assert lemmatize_py("tries") == "try"
    assert lemmatize_py("ties") == "tie"       # falls through to plural-s
    assert lemmatize_py("walked") == "walk"
    assert lemmatize_py("bed") == "bed"
    assert lemmatize_py("glass") == "glass"
    assert lemmatize_py("tables") == "table"
    assert lemmatize_py("gas") == "gas"        # len 3, no strip
    assert lemmatize_py("w00017ed") == "w00017"


@pytest.fixture(scope="module")
def sample_texts(spark, tiny_transcripts):
    rows = tiny_transcripts.limit(300).collect()
    extra = [t for t, _ in GOLDEN_TOKENS if t]
    return [r["text"] for r in rows] + extra + ["the and of to is it", "Glass glasses GLASS!"]


def test_jvm_equals_python(spark, sample_texts):
    df = spark.createDataFrame([(t,) for t in sample_texts], "text string")
    got = [r["lem"] for r in df.select(lemmas_col("text").alias("lem")).collect()]
    want = [lemmatize_text_py(t) for t in sample_texts]
    assert got == want


def test_arrow_udf_equals_jvm(spark, sample_texts):
    df = spark.createDataFrame([(t,) for t in sample_texts], "text string")
    both = df.select(
        lemmas_col("text").alias("jvm"),
        lemmatize_text_udf(F.col("text")).alias("arrow"),
    ).collect()
    for r in both:
        assert r["jvm"] == r["arrow"]


def test_duckdb_sql_equals_python(sample_texts):
    con = duckdb.connect()
    import pandas as pd

    docs = pd.DataFrame({"doc_id": range(len(sample_texts)), "text": sample_texts})
    con.register("documents", docs)
    got = con.sql(
        duckdb_lemma_rows_sql("documents") + " ORDER BY doc_id"
    ).fetchall()
    want = [
        (i, lemma)
        for i, t in enumerate(sample_texts)
        for lemma in lemmatize_text_py(t)
    ]
    # duckdb preserves unnest order within a row; compare per-doc multisets
    from collections import Counter, defaultdict

    g = defaultdict(list)
    for d, l in got:
        g[d].append(l)
    w = defaultdict(list)
    for d, l in want:
        w[d].append(l)
    for d in set(g) | set(w):
        assert Counter(g[d]) == Counter(w[d]), d
