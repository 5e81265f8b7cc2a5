"""Distributed BPE tokenizer training — learn byte-pair merge rules
from the corpus, then count tokens under the learned vocabulary.

The scale shape is the one every real BPE trainer uses (Sennrich et al.
2016; HF tokenizers): ONE corpus scan builds the (word, count) table,
and every merge iteration runs over that VOCABULARY-bounded table, never
the corpus — at 100 TB the word table is ~10^8 rows while the corpus is
~10^12, so k merge rounds cost k tiny aggregations, not k scans.

Both the trainer and the DuckDB oracle twin express the merge step as a
plain string ``replace`` over a 2-space-separated symbol encoding:

    "hello" -> "  h  e  l  l  o  "     (2-space bounds + separators)
    merge (l,l): replace(repr, " l  l ", " ll ")

A match consumes ONE space from each side boundary and the replacement
restores it, so every remaining separator/bound keeps width 2 — the
representation invariant holds across rounds — and ``replace``'s
left-to-right non-overlapping scan IS canonical greedy BPE application
(verified: "aaaaa" under (a,a) -> "aa aa a"). Spark's ``replace`` and
DuckDB's ``replace`` share these semantics exactly, which is what makes
the data-dependent training loop hash-checkable: the oracle unrolls the
same k rounds as CTEs with scalar-subquery best-pair selection.

Driver-loop shape: each round collects exactly ONE row (the argmax
pair — count desc, pair asc tie-break) and the symbol table is
localCheckpoint-ed every round (repo invariant: iterative DataFrame
loops must truncate lineage per round, or round r re-executes rounds
0..r-1 and Catalyst analysis grows with the chain).

Reference analog: the tokenizer family (SURVEY §2 P1/token_counts)
— this learns the subword vocabulary those operators would consume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_spark.functions.text import tokenize_expr

BPE_MERGES_SCHEMA = (
    "merge_rank long, lhs string, rhs string, merged string, "
    "pair_count long"
)


def char_spaced(word: Column) -> Column:
    """word -> the 2-space symbol encoding: '  h  i  ' for 'hi'."""
    return F.concat(F.lit("  "), F.regexp_replace(word, "(.)", "$1  "))


def word_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) over the repo tokenizer — the single corpus scan all
    merge iterations amortize."""
    return (
        docs.select(F.explode(tokenize_expr(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _pair_counts(symbols: DataFrame) -> DataFrame:
    """(a, b, c): adjacent-symbol pair counts (with within-word
    multiplicity) weighted by word frequency. Pure codegen — the
    symbol array is projected once (Catalyst does not CSE a repeated
    split across transform bound and body)."""
    toks = symbols.select(
        F.split(F.trim(F.col("repr")), "  ").alias("_t"), "cnt"
    ).filter(F.size("_t") >= 2)
    return (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_t) - 2),"
                    " i -> struct(_t[i] AS a, _t[i + 1] AS b))"
                )
            ).alias("_p"),
            "cnt",
        )
        .select("_p.a", "_p.b", "cnt")
        .groupBy("a", "b")
        .agg(F.sum("cnt").alias("c"))
    )


def _merge_pattern(a: str, b: str) -> tuple[str, str]:
    return f" {a}  {b} ", f" {a}{b} "


def train_bpe(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    words: DataFrame | None = None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules; returns the merge table
    (merge_rank, lhs, rhs, merged, pair_count) in training order.

    Argmax tie-break is (count desc, lhs asc, rhs asc) — deterministic
    and engine-identical. Stops early if no pair remains (every word
    fused to one symbol). Pass ``words`` to reuse a precomputed
    (word, cnt) table."""
    spark = docs.sparkSession
    w = words if words is not None else word_counts(docs, text_col)
    cur = w.select(
        char_spaced(F.col("word")).alias("repr"), "cnt"
    ).localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(n_merges):
        top = (
            _pair_counts(cur)
            .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
        merges.append((r, a, b, a + b, c))
        pat, rep = _merge_pattern(a, b)
        cur = cur.select(
            F.replace(F.col("repr"), F.lit(pat), F.lit(rep)).alias("repr"),
            "cnt",
        ).localCheckpoint()
    return spark.createDataFrame(merges, BPE_MERGES_SCHEMA)


def _encode_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """word -> its symbol encoding after applying the merge list in
    training order (chained literal replaces — JVM-side, no Python)."""
    expr = char_spaced(word)
    for a, b in merges:
        pat, rep = _merge_pattern(a, b)
        expr = F.replace(expr, F.lit(pat), F.lit(rep))
    return expr


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens_bpe): per-doc token count under the learned
    merges. Zero-exchange projection: the merge chain runs inside a
    ``transform`` lambda over the token array and an ``aggregate``
    sums piece counts — no explode, no shuffle, empty docs count 0.
    Word boundaries are never merged across (each word encodes
    independently), matching the trainer's word-table granularity."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize_expr(F.col(text_col)).alias("_t")
    )
    pieces = F.transform(
        F.col("_t"),
        lambda w: F.size(F.split(F.trim(_encode_expr(w, merges)), "  ")),
    )
    return toks.select(
        "doc_id",
        F.aggregate(
            pieces, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("n_tokens_bpe"),
    )
