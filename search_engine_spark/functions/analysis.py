"""Text-analysis functions for training-data pipelines: language-ID
heuristic, quality scoring, token counting, document fingerprinting.

All JVM-side column expressions (codegen'd; no UDFs), each with a
matching ANSI-SQL builder the DuckDB oracle runs — the same dual-impl
discipline as functions/text.py.

Reference analog: the reference filters "Russian-looking" content lines
(HtmlParsing.java:156-169) and counts words per page — these operators
generalize that into the standard pretraining quality/langid/token
stack (task brief: first-class beyond-reference components).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from search_engine_spark.config import STOPWORDS
from search_engine_spark.functions.text import STOPWORDS_SQL, tokens_sql

# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------
def token_count_col(text_col: str) -> Column:
    """Whitespace-word count after normalization (size of token array)."""
    return F.expr(f"size({tokens_sql(text_col)})")


def token_count_sql_duckdb(text_col: str = "text") -> str:
    """DuckDB twin: count non-empty normalized tokens."""
    return (
        f"length(list_filter(string_split(trim(regexp_replace(lower({text_col}), "
        f"'[^a-z0-9]+', ' ', 'g')), ' '), t -> t <> ''))"
    )


def bpe_ish_token_count_col(text_col: str) -> Column:
    """Sub-word-ish count: splits on whitespace AND letter/digit
    boundaries (a cheap BPE proxy: 'w00017ing' → w, 00017, ing = 3)."""
    return F.size(
        F.filter(
            F.split(
                F.regexp_replace(
                    F.lower(F.col(text_col)),
                    "([a-z])([0-9])|([0-9])([a-z])",
                    "$1$3 $2$4",
                ),
                "[^a-z0-9]+",
            ),
            lambda t: t != F.lit(""),
        )
    )


# ---------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword ratios)
# ---------------------------------------------------------------------------
def quality_features(text_col: str = "text") -> list[Column]:
    """Feature columns: n_chars, n_tokens, mean token length,
    punct_ratio, digit_ratio, stopword_ratio, uniq_token_ratio."""
    toks = f"{tokens_sql(text_col)}"
    n_toks = f"size({toks})"
    return [
        F.length(F.col(text_col)).alias("n_chars"),
        F.expr(n_toks).alias("n_tokens"),
        F.expr(
            f"CASE WHEN {n_toks} > 0 THEN "
            f"round(aggregate({toks}, cast(0.0 as double), (acc, t) -> acc + length(t)) "
            f"/ {n_toks}, 6) ELSE 0.0 END"
        ).alias("mean_token_len"),
        F.expr(
            f"round(length(regexp_replace({text_col}, '[a-zA-Z0-9 ]', '')) "
            f"/ cast(greatest(length({text_col}), 1) as double), 6)"
        ).alias("punct_ratio"),
        F.expr(
            f"round(length(regexp_replace({text_col}, '[^0-9]', '')) "
            f"/ cast(greatest(length({text_col}), 1) as double), 6)"
        ).alias("digit_ratio"),
        F.expr(
            f"CASE WHEN {n_toks} > 0 THEN "
            f"round(size(filter({toks}, t -> t IN {STOPWORDS_SQL})) "
            f"/ cast({n_toks} as double), 6) ELSE 0.0 END"
        ).alias("stopword_ratio"),
        F.expr(
            f"CASE WHEN {n_toks} > 0 THEN "
            f"round(size(array_distinct({toks})) / cast({n_toks} as double), 6) "
            f"ELSE 0.0 END"
        ).alias("uniq_token_ratio"),
    ]


def quality_score_col() -> Column:
    """Scalar quality score ∈ [0,1] from the feature columns (pinned
    linear mix; deterministic, documented — not a learned model).

    Computed in DECIMAL, not double: the inputs are 6-decimal-rounded
    ratios, so 0.3·ratio can land EXACTLY on a .5 boundary at the 7th
    decimal, where Spark's and DuckDB's double round() disagree by one
    ulp (observed at sf0.1). Exact decimal arithmetic makes both engines
    produce the identical value, bit-for-bit after the final double
    cast."""
    # the punct clamp is a CASE, not least(): DuckDB's least() returns
    # DOUBLE even for two identical DECIMAL arguments, which reintroduces
    # the boundary problem in the oracle twin
    return F.expr(
        "CAST(round("
        "  0.4 * (CASE WHEN n_tokens >= 5 AND n_tokens <= 5000"
        "              THEN 1.0 ELSE 0.0 END)"
        "  + 0.3 * (CAST(1.0 AS DECIMAL(13,7)) -"
        "           (CASE WHEN CAST(punct_ratio AS DECIMAL(10,6)) * 4.0 > 1.0"
        "                 THEN CAST(1.0 AS DECIMAL(13,7))"
        "                 ELSE CAST(CAST(punct_ratio AS DECIMAL(10,6)) * 4.0"
        "                           AS DECIMAL(13,7)) END))"
        "  + 0.3 * CAST(uniq_token_ratio AS DECIMAL(10,6))"
        ", 6) AS DOUBLE)"
    )


# ---------------------------------------------------------------------------
# Language-ID heuristic (n-gram/character-class evidence)
# ---------------------------------------------------------------------------
def langid_features(text_col: str = "text") -> list[Column]:
    """Character-class evidence columns: ascii_letter_ratio, vowel_ratio,
    cyrillic_ratio, cjk_ratio — enough to route docs to per-script
    pipelines. (A real model is out of scope; the reference's analog is
    its binary [ЁёА-я] 'is Russian' test, HtmlParsing.java:156-169.)"""
    def ratio(pattern: str, name: str) -> Column:
        return F.expr(
            f"round(length(regexp_replace({text_col}, '{pattern}', '')) "
            f"/ cast(greatest(length({text_col}), 1) as double), 6)"
        ).alias(name)

    return [
        ratio("[^a-zA-Z]", "ascii_letter_ratio"),
        ratio("[^aeiouAEIOU]", "vowel_ratio"),
        ratio("[^\\u0400-\\u04FF]", "cyrillic_ratio"),
        ratio("[^\\u4e00-\\u9fff]", "cjk_ratio"),
    ]


def langid_label_col() -> Column:
    """Route by dominant script, 'en'-ish if ascii-letter dominated."""
    return (
        F.when(F.col("cyrillic_ratio") > 0.3, "ru-script")
        .when(F.col("cjk_ratio") > 0.3, "cjk-script")
        .when(F.col("ascii_letter_ratio") > 0.3, "latin-script")
        .otherwise("unknown")
    )


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------
def content_fingerprint_col(text_col: str = "text") -> Column:
    """md5 of the normalized token stream — whitespace/case/punct-
    insensitive content identity (md5 exists in Spark AND DuckDB →
    oracle-checkable)."""
    return F.md5(F.expr(f"array_join({tokens_sql(text_col)}, ' ')"))


def content_fingerprint_sql_duckdb(text_col: str = "text") -> str:
    return (
        f"md5(array_to_string(list_filter(string_split(trim(regexp_replace("
        f"lower({text_col}), '[^a-z0-9]+', ' ', 'g')), ' '), t -> t <> ''), ' '))"
    )


# ---------------------------------------------------------------------------
# PII scrubbing (regex redaction)
# ---------------------------------------------------------------------------
# Pattern order matters: emails go first (their local part may contain
# digits), hex secrets second (an md5/token can embed a long digit run
# the phone pattern would otherwise bite into). Patterns stay inside
# the Java-regex ∩ RE2 common subset (char classes, bounded/greedy
# quantifiers, no backrefs/lookaround) so the DuckDB oracle replays
# them byte-for-byte.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("secret", r"[0-9a-fA-F]{32,}", "<SECRET>"),
    ("phone", r"\+?[0-9][0-9()\-. ]{5,}[0-9]", "<PHONE>"),
]


def pii_scrub_col(text_col: str = "text") -> Column:
    """Text with every PII_PATTERNS match replaced by its placeholder,
    applied in PII_PATTERNS order (all JVM-side regexp_replace — one
    codegen'd projection, no UDF)."""
    col = F.col(text_col)
    for _, pattern, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pattern, repl)
    return col


def pii_count_cols(text_col: str = "text") -> list[Column]:
    """Per-pattern match counts over the ORIGINAL text (n_email,
    n_secret, n_phone) — the audit trail a scrub job reports."""
    return [
        F.regexp_count(F.col(text_col), F.lit(pattern))
        .cast("long")  # match DuckDB length() → BIGINT for oracle parity
        .alias(f"n_{name}")
        for name, pattern, _ in PII_PATTERNS
    ]


def _sql_quote(pattern: str) -> str:
    return pattern.replace("'", "''")


def pii_scrub_sql_duckdb(text_col: str = "text") -> str:
    """DuckDB twin of :func:`pii_scrub_col` (needs the 'g' flag —
    DuckDB's regexp_replace is first-match-only by default, Spark's is
    global)."""
    expr = text_col
    for _, pattern, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{_sql_quote(pattern)}', '{repl}', 'g')"
    return expr


def pii_count_sql_duckdb(text_col: str = "text") -> list[str]:
    """DuckDB twins of :func:`pii_count_cols`."""
    return [
        f"length(regexp_extract_all({text_col}, '{_sql_quote(pattern)}')) "
        f"AS n_{name}"
        for name, pattern, _ in PII_PATTERNS
    ]


def rolling_fingerprints_col(text_col: str, window: int = 8) -> Column:
    """Winnowing-style shingle fingerprints: xxhash64 of each ``window``-
    token shingle (array<long>). Min-sampled per doc for compact sketches."""
    toks = tokens_sql(text_col)
    return F.expr(
        f"transform(sequence(0, greatest(size({toks}) - {window}, -1)), "
        f"i -> xxhash64(array_join(slice({toks}, i + 1, {window}), ' ')))"
    )


def term_drift(
    docs_a: "DataFrame", docs_b: "DataFrame",
    alpha: float = 0.5, top_n: int = 50,
    text_col: str = "text",
) -> "DataFrame":
    """Per-term distribution drift between two corpora — the training-
    pipeline drift monitor (did this month's crawl change the token
    distribution? is split A representative of split B?): smoothed
    unigram probabilities over the UNION vocabulary,

        p_x(t) = (cf_x(t) + α) / (T_x + α·V)

    with per-term ``log_ratio`` = ln(p_a/p_b) and ``kl_term`` =
    p_a·ln(p_a/p_b) — the term's contribution to KL(A‖B), so the
    output ranks WHICH terms drive the divergence, not just how much.

    Plan: one tokenize+count aggregate per side (map-side combinable),
    a full outer join on the lemma (vocab-bounded), two 1-row total
    frames crossJoined back. Returns top_n rows
    (lemma, cf_a, cf_b, log_ratio, kl_term) by (kl_term desc, lemma
    asc), values rounded to 6 decimals."""
    from search_engine_spark.functions.text import lemmas_sql

    def counts(d, name):
        return (
            d.selectExpr(f"explode({lemmas_sql(text_col)}) AS lemma")
            .groupBy("lemma")
            .agg(F.count("*").cast("long").alias(name))
        )

    ca = counts(docs_a, "cf_a")
    cb = counts(docs_b, "cf_b")
    joined = ca.join(cb, "lemma", "full_outer").select(
        "lemma",
        F.coalesce("cf_a", F.lit(0)).cast("long").alias("cf_a"),
        F.coalesce("cf_b", F.lit(0)).cast("long").alias("cf_b"),
    )
    tot = joined.agg(
        F.sum("cf_a").cast("double").alias("_ta"),
        F.sum("cf_b").cast("double").alias("_tb"),
        F.count("*").cast("double").alias("_v"),
    )
    a = float(alpha)
    pa = ((F.col("cf_a").cast("double") + F.lit(a))
          / (F.col("_ta") + F.lit(a) * F.col("_v")))
    pb = ((F.col("cf_b").cast("double") + F.lit(a))
          / (F.col("_tb") + F.lit(a) * F.col("_v")))
    return (
        joined.crossJoin(F.broadcast(tot))
        .withColumn("_lr", F.log(pa / pb))
        .select(
            "lemma", "cf_a", "cf_b",
            F.round("_lr", 6).alias("log_ratio"),
            F.round(pa * F.col("_lr"), 6).alias("kl_term"),
        )
        .orderBy(F.col("kl_term").desc(), F.col("lemma").asc())
        .limit(int(top_n))
    )
