"""Corpus-wide collocation mining: top adjacent-bigram PMI.

The corpus-analysis dual of :func:`serving.related_terms` (which is
seeded by ONE lemma and linear in its df): this ranks EVERY adjacent
word pair in the corpus by pointwise mutual information —

    pmi(a, b) = ln( (c_ab / B) / ((c_a / T) * (c_b / T)) )

with c_ab the corpus bigram count, c_a/c_b corpus token counts, B/T
the bigram/token totals — the classic collocation statistic (Church &
Hanks 1990), the standard first pass for phrase vocabulary induction
in tokenizer/embedding pipelines ("new york"-style units). A
``min_count`` floor removes the low-frequency PMI explosion (a pair
seen once between two rare words maxes the statistic).

Plan shape (100 TB): tokens are projected ONCE per doc (Catalyst does
not CSE repeated tokenizes — project first), then unigram and bigram
streams ride ONE explode of a combined struct array (kind tag), so
the corpus is scanned and tokenized exactly once. Counts reduce in one
map-side-combinable groupBy(kind, gram); everything after operates on
the VOCABULARY-BOUNDED counts table (persisted — it feeds the totals
aggregate and both sides of the pair join), with unigram lookups as
aggregate-to-aggregate equi-joins (AQE broadcasts them when the vocab
fits) and the final top-n a TakeOrderedAndProject.
Float order pinned ((c_ab/B) / ((c_a/T) * (c_b/T)), ln from the JVM,
round 6) so the DuckDB twin hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.functions.text import tokenize_expr


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    top_n: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_n`` adjacent-token collocations by PMI.

    Returns (w1, w2, pair_count, pmi) ordered by (pmi desc, w1 asc,
    w2 asc); only pairs with ``pair_count >= min_count`` qualify."""
    toks = docs.select(tokenize_expr(F.col(text_col)).alias("_toks")).filter(
        F.size("_toks") >= 1
    )
    # one explode carrying both streams: (kind=0, token) for every
    # token, (kind=1, "a b") for every adjacent pair
    grams = toks.select(
        F.explode(
            F.concat(
                F.expr("transform(_toks, t -> struct(0 AS kind, t AS gram))"),
                # guard: sequence(0, -1) would run DESCENDING for a
                # 1-token doc (Spark picks step -1), so short docs get
                # an explicit empty bigram stream
                F.expr(
                    "IF(size(_toks) < 2, "
                    "CAST(array() AS array<struct<kind:int,gram:string>>), "
                    "transform(sequence(0, size(_toks) - 2), "
                    "i -> struct(1 AS kind, "
                    "array_join(slice(_toks, i + 1, 2), ' ') AS gram)))"
                ),
            )
        ).alias("g")
    ).select(F.col("g.kind").alias("kind"), F.col("g.gram").alias("gram"))
    counts = grams.groupBy("kind", "gram").agg(F.count("*").alias("cnt"))
    counts = counts.persist()  # vocabulary-bounded; feeds totals + joins
    totals = counts.groupBy().pivot("kind", [0, 1]).sum("cnt").select(
        F.col("0").cast("double").alias("t_total"),
        F.col("1").cast("double").alias("b_total"),
    )
    uni = counts.filter(F.col("kind") == 0).select(
        F.col("gram").alias("w"), F.col("cnt").alias("c_uni")
    )
    pairs = (
        counts.filter((F.col("kind") == 1) & (F.col("cnt") >= int(min_count)))
        .select(
            F.split_part(F.col("gram"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("gram"), F.lit(" "), F.lit(2)).alias("w2"),
            F.col("cnt").alias("pair_count"),
        )
    )
    ranked = (
        # unigram lookups: plain equi-joins between two
        # vocabulary-bounded aggregates — AQE broadcasts when the vocab
        # fits, shuffles when a 100 TB junk-heavy vocab doesn't (a
        # forced broadcast would be the scale risk here)
        pairs.join(uni.withColumnRenamed("w", "w1")
                   .withColumnRenamed("c_uni", "_c1"), "w1")
        .join(uni.withColumnRenamed("w", "w2")
              .withColumnRenamed("c_uni", "_c2"), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            F.col("pair_count").cast("long").alias("pair_count"),
            F.round(
                F.log(
                    (F.col("pair_count").cast("double") / F.col("b_total"))
                    / (
                        (F.col("_c1").cast("double") / F.col("t_total"))
                        * (F.col("_c2").cast("double") / F.col("t_total"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(int(top_n))
    )
    # materialize the top_n-bounded result eagerly so the persisted
    # counts table can be released HERE — returning a lazy frame over
    # a persist the caller can't unpersist leaks a cached dataset per
    # call for the life of the session
    rows = ranked.collect()
    counts.unpersist()
    return docs.sparkSession.createDataFrame(rows, schema=ranked.schema)


def keyphrases(
    docs: DataFrame,
    top_n: int = 20,
    min_count: int = 2,
    max_words: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level RAKE keyphrase extraction (Rose et al. 2010).

    Candidate phrases are the maximal stopword-free token runs (RAKE's
    defining move: stopwords and punctuation are the phrase
    delimiters); each word accumulates freq (occurrences) and deg
    (Σ length of the phrases it occurs in), and a phrase scores
    Σ_w deg(w)/freq(w) — degree rewards words that travel in long
    phrases, the ratio damps ubiquitous ones. The classic cheap
    keyphrase miner next to :func:`collocations` (PMI bigrams):
    RAKE returns multi-word phrases of any length ≤ ``max_words``.

    Plan shape (100 TB): one corpus scan — tokens are projected once,
    stopwords are replaced by a '|' sentinel and the array re-split so
    phrase extraction is pure codegen string work (no Python) — then
    TWO vocabulary-bounded aggregates (word stats, phrase counts) and
    one word-stats join back onto the exploded phrase words. Word
    scores are rounded to the 1e-10 grid and summed as DECIMAL(28,10)
    (order-independent — the lm.py contract) so the DuckDB twin
    hash-matches; final score = round(double, 6).

    Returns (phrase, n_words, phrase_count, score) ordered by
    (score desc, phrase asc), ``min_count`` floor on occurrences."""
    from search_engine_spark.config import STOPWORDS
    from search_engine_spark.functions.text import tokenize_expr

    stops = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    toks = docs.select(tokenize_expr(F.col(text_col)).alias("_toks")).filter(
        F.size("_toks") >= 1
    )
    marked = F.array_join(
        F.expr(f"transform(_toks, t -> IF(t IN ({stops}), '|', t))"), " "
    )
    occ = (
        toks.select(F.explode(F.split(marked, r"\s*\|\s*")).alias("phrase"))
        .filter(F.col("phrase") != "")
        .withColumn("words", F.split(F.col("phrase"), " "))
        .withColumn("n_words", F.size("words"))
        .filter(F.col("n_words") <= int(max_words))
        .persist()  # feeds word stats AND phrase counts; released below
    )
    word_stats = (
        occ.select(F.explode("words").alias("word"), "n_words")
        .groupBy("word")
        .agg(
            F.count("*").alias("freq"),
            F.sum("n_words").alias("deg"),
        )
    )
    phrase_counts = (
        occ.groupBy("phrase", "n_words")
        .agg(F.count("*").alias("phrase_count"))
        .filter(F.col("phrase_count") >= int(min_count))
    )
    # per-(phrase, word-position) rows join the vocabulary-bounded word
    # stats; the decimal sum makes the per-phrase reduction
    # order-independent, so groupBy needs no ordered fold
    scored = (
        phrase_counts.select(
            "phrase", "n_words", "phrase_count",
            F.posexplode(F.split(F.col("phrase"), " "))
            .alias("pos", "word"),
        )
        .join(word_stats, "word")
        .groupBy("phrase", "n_words", "phrase_count")
        .agg(
            F.sum(
                F.round(
                    F.col("deg").cast("double") / F.col("freq").cast("double"),
                    10,
                ).cast("decimal(28,10)")
            ).alias("_s")
        )
        .select(
            "phrase",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("phrase_count").cast("long").alias("phrase_count"),
            F.round(F.col("_s").cast("double"), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("phrase").asc())
        .limit(int(top_n))
    )
    rows = scored.collect()
    occ.unpersist()
    return docs.sparkSession.createDataFrame(rows, schema=scored.schema)
