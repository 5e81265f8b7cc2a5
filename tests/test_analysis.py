"""Text-analysis functions (functions/analysis.py): token counts,
fingerprints, quality + langid features."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.functions.analysis import (
    bpe_ish_token_count_col,
    content_fingerprint_col,
    langid_features,
    langid_label_col,
    quality_features,
    quality_score_col,
    token_count_col,
)
from search_engine_spark.functions.text import tokenize_py


def test_token_counts(spark):
    texts = ["one two three", "  padded   spaces ", "", "Hello, world!"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["n"] for r in df.select(token_count_col("text").alias("n")).collect()]
    assert got == [len(tokenize_py(t)) for t in texts]


def test_bpe_ish_splits_letter_digit(spark):
    df = spark.createDataFrame([("w00017ing",), ("abc123",)], "text string")
    got = [r["n"] for r in df.select(bpe_ish_token_count_col("text").alias("n")).collect()]
    assert got == [3, 2]  # w|00017|ing, abc|123


def test_fingerprint_normalization_invariant(spark):
    df = spark.createDataFrame(
        [("Hello,   WORLD!",), ("hello world",), ("different text",)],
        "text string",
    )
    fps = [r["fp"] for r in df.select(content_fingerprint_col("text").alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_quality_and_langid(spark):
    rows = [
        ("a good long sentence with plenty of distinct words here",),
        ("!!! ??? ### $$$",),
        ("Привет мир это русский текст",),
    ]
    df = spark.createDataFrame(rows, "text string")
    feat = df.select("text", *quality_features("text"), *langid_features("text"))
    out = feat.withColumn("q", quality_score_col()).withColumn("lang", langid_label_col()).collect()
    good, junk, ru = out
    assert good["q"] > junk["q"]
    assert good["lang"] == "latin-script"
    assert ru["lang"] == "ru-script"
    assert junk["punct_ratio"] > 0.5
    assert 0.0 <= good["q"] <= 1.0


def test_term_drift_ranks_drifted_terms(spark):
    """The drifted term (frequent in A, absent in B) tops the KL(A||B)
    contribution list with a positive log-ratio; a term with identical
    counts sits at ~zero; B-only terms get negative log_ratio."""
    from search_engine_spark.functions.analysis import term_drift

    a = spark.createDataFrame(
        [(0, "zulu zulu zulu alpha beta"),
         (1, "zulu alpha beta")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(2, "alpha beta omega"), (3, "alpha beta omega")],
        "doc_id long, text string",
    )
    rows = {r["lemma"]: r for r in term_drift(a, b, top_n=10).collect()}
    assert rows["zulu"]["cf_a"] == 4 and rows["zulu"]["cf_b"] == 0
    assert rows["zulu"]["log_ratio"] > 0
    top = term_drift(a, b, top_n=1).collect()[0]
    assert top["lemma"] == "zulu"
    assert rows["omega"]["log_ratio"] < 0
    assert abs(rows["alpha"]["kl_term"]) < 0.1
