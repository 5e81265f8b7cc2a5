"""Hybrid lexical + vector retrieval via reciprocal-rank fusion.

Modern search stacks run BM25 and embedding-ANN side by side and fuse
the two result lists; RRF (Cormack et al., SIGIR 2009) is the standard
score-free fusion — each list contributes 1/(k0 + rank), so the fused
order depends only on RANKS, never on incomparable score scales. The
reference engine is lexical-only (ApiService.java search path); the
embedding leg comes from this engine's similarity operators, and the
fusion is the composition layer between them.

Scale shape: both inputs are ALREADY top-k-bounded retrieval outputs
(tens of rows), so the rank windows and the fusion join run over
k-sized frames — the heavy lifting happened inside the two retrieval
engines (block-max WAND / partition-pruned ANN probe), and fusion adds
no corpus-sized stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    lexical: DataFrame,
    vector: DataFrame,
    id_lex: str = "doc_id",
    score_lex: str = "score",
    id_vec: str = "vec_id",
    score_vec: str = "cosine",
    k0: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of a BM25 top-k list and an embedding
    top-k list over a shared document id space:

        rrf(d) = 1/(k0 + rank_lex(d)) + 1/(k0 + rank_vec(d))

    with a missing list contributing 0. Ranks are 1-based row numbers
    over each list's own (rounded score DESC, id ASC) order — the same
    total order the lists are emitted in, so fusion sees exactly what a
    caller paging either list would see. Output: top-``k`` by
    (rrf DESC, doc_id ASC) with both ranks kept for display; a doc
    absent from one list carries rank 0 there (sentinel, not NULL — the
    cross-engine comparison treats NULL-able integer columns as floats
    on the pandas side).

    Cross-engine float parity: each fused score is a FIXED two-term sum
    of 1.0/(k0+rank) doubles (lexical term first), so Spark and the
    DuckDB twin compute bit-identical values before the 6-decimal
    round.

    The un-partitioned rank windows are deliberate: the inputs are
    top-k-bounded (k-row frames), so a single-partition window costs
    k·log k on one core — NOT a corpus-sized sort (never feed an
    unbounded scored table through this)."""
    w_lex = Window.orderBy(F.col(score_lex).desc(), F.col(id_lex).asc())
    w_vec = Window.orderBy(F.col(score_vec).desc(), F.col(id_vec).asc())
    a = lexical.select(
        F.col(id_lex).cast("long").alias("doc_id"),
        F.row_number().over(w_lex).alias("lex_rank"),
    )
    b = vector.select(
        F.col(id_vec).cast("long").alias("doc_id"),
        F.row_number().over(w_vec).alias("vec_rank"),
    )
    return (
        a.join(b, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (F.lit(k0) + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(k0) + F.col("vec_rank")), F.lit(0.0)),
                6,
            ).alias("rrf"),
            F.coalesce(F.col("lex_rank"), F.lit(0)).cast("long").alias("lex_rank"),
            F.coalesce(F.col("vec_rank"), F.lit(0)).cast("long").alias("vec_rank"),
        )
        .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def linear_fuse(
    lexical: DataFrame,
    vector: DataFrame,
    alpha: float = 0.5,
    id_lex: str = "doc_id",
    score_lex: str = "score",
    id_vec: str = "vec_id",
    score_vec: str = "cosine",
    k: int = 10,
) -> DataFrame:
    """Score-based hybrid fusion — the other standard beside RRF
    (Elasticsearch/Vespa "normalized linear combination"): each pool's
    scores are min-max normalized WITHIN the pool to [0, 1], then

        fused(d) = alpha * lex_norm(d) + (1 - alpha) * vec_norm(d)

    with a missing list contributing 0. Min-max (not z-score) because
    it is closed-form replayable cross-engine and monotone — each
    pool's internal order is preserved, only the scales become
    comparable. A single-score pool (max == min) normalizes to 1.0 for
    its one doc (it IS that pool's best hit).

    Same scale shape as :func:`rrf_fuse`: both inputs are top-k-bounded
    retrieval outputs, so the two min/max window aggregates and the
    full-outer fusion join run over k-sized frames — no corpus-sized
    stage. Float order pinned: normalize each side as (s - min)/(max -
    min) in doubles, one two-term weighted add (lexical first), one
    6-decimal round — the DuckDB twin computes the identical
    expression. Tie-break: fused desc, doc_id asc."""
    w_all = Window.partitionBy()  # k-row frame: global min/max per pool
    a = lexical.select(
        F.col(id_lex).cast("long").alias("doc_id"),
        F.col(score_lex).cast("double").alias("_s"),
    ).withColumn(
        "lex_norm",
        F.when(
            F.max("_s").over(w_all) == F.min("_s").over(w_all), F.lit(1.0)
        ).otherwise(
            (F.col("_s") - F.min("_s").over(w_all))
            / (F.max("_s").over(w_all) - F.min("_s").over(w_all))
        ),
    ).drop("_s")
    b = vector.select(
        F.col(id_vec).cast("long").alias("doc_id"),
        F.col(score_vec).cast("double").alias("_s"),
    ).withColumn(
        "vec_norm",
        F.when(
            F.max("_s").over(w_all) == F.min("_s").over(w_all), F.lit(1.0)
        ).otherwise(
            (F.col("_s") - F.min("_s").over(w_all))
            / (F.max("_s").over(w_all) - F.min("_s").over(w_all))
        ),
    ).drop("_s")
    al = F.lit(float(alpha))
    return (
        a.join(b, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                al * F.coalesce(F.col("lex_norm"), F.lit(0.0))
                + (F.lit(1.0) - al) * F.coalesce(F.col("vec_norm"), F.lit(0.0)),
                6,
            ).alias("fused"),
            F.round(F.coalesce(F.col("lex_norm"), F.lit(0.0)), 6).alias("lex_norm"),
            F.round(F.coalesce(F.col("vec_norm"), F.lit(0.0)), 6).alias("vec_norm"),
        )
        .orderBy(F.col("fused").desc(), F.col("doc_id").asc())
        .limit(k)
    )
