"""Multinomial Naive Bayes text classification — train + classify as
pure DataFrame aggregates.

The supervised complement to the heuristic language scorer
(functions/analysis.langid): fastText-style corpus routing (language
ID, source/domain attribution, quality-domain gating a training
pipeline runs before mixing) expressed Spark-first:

- TRAIN is two map-side-combinable aggregates over one tokenized scan:
  per-label doc counts (priors) and per-(label, lemma) token counts
  (conditionals). The model is vocabulary-bounded — labels × vocab
  rows — so at 100 TB it BROADCASTS; no iterative optimization, no
  driver loop, and adding a month of new labeled data is a count merge
  (the aggregates are associative).
- CLASSIFY is one lemma explode joined against the broadcast model:
  score(d, l) = log P(l) + Σ_t tf·log P(t|l) with Laplace smoothing,
  argmax by (score desc, label asc). Per-term contributions are
  rounded to the 1e-10 grid and summed as DECIMAL(28,10) (the lm.py
  order-independence contract), so the DuckDB oracle hash-matches.

Smoothing: log P(t|l) = ln((c(t,l) + α) / (T_l + α·V)) with V = corpus
vocabulary size; unseen (t, l) pairs take the same formula at c = 0
(the per-label default the classify join coalesces to).

Reference scope note: the reference engine has no classifier — this
extends the training-data-pipeline surface (brief: "the operations a
large-scale training-data pipeline would need"), next to langid /
quality gates / DSIR.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.functions.text import lemmas_sql
from search_engine_spark.operators.index_build import explode_lemmas

SCORE_DECIMALS = 6


@dataclass(frozen=True)
class NBModel:
    """Trained multinomial NB model.

    ``cond``: (label, lemma, c long) observed token counts;
    ``priors``: (label, n_docs long, total_tf long);
    ``vocab_size``/``n_docs``: corpus constants; ``alpha``: Laplace α.
    All label-bounded / vocab-bounded — broadcastable."""

    cond: DataFrame
    priors: DataFrame
    vocab_size: int
    n_docs: int
    alpha: float


def nb_train(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    alpha: float = 1.0,
    id_col: str = "doc_id",
) -> NBModel:
    """Fit multinomial NB: one tokenize pass, two combinable
    aggregates, one 1-row vocab count. Deterministic — counts only."""
    rows = docs.selectExpr(
        f"{id_col} AS doc_id",
        f"{label_col} AS label",
        f"explode({lemmas_sql(text_col)}) AS lemma",
    )
    cond = (
        rows.groupBy("label", "lemma")
        .agg(F.count("*").cast("long").alias("c"))
    )
    priors = (
        rows.groupBy("label")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("total_tf"),
        )
    )
    agg = rows.agg(
        F.countDistinct("lemma").alias("v"),
        F.countDistinct("doc_id").alias("n"),
    ).head()
    return NBModel(cond=cond, priors=priors, vocab_size=int(agg["v"]),
                   n_docs=int(agg["n"]), alpha=float(alpha))


def nb_classify(
    docs: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, label, score): the argmax label per document under the
    trained model, with the decimal-grid score (ln-domain, rounded to
    6). Plan: one lemma explode → per-(doc, lemma) tf → ×|labels|
    broadcast join against the model (llh coalesces to the per-label
    unseen default) → one groupBy(doc, label) decimal sum → per-doc
    argmax via a doc-partitioned window (hash-partitioned by doc_id —
    never a global sort)."""
    a = float(model.alpha)
    v = float(model.vocab_size)
    # vocab-bounded llh frame; F.log = JVM Math.log (the idf_col rule:
    # doubles must come from the JVM so DuckDB's ln agrees post-round)
    llh = model.cond.join(model.priors, "label").select(
        "label", "lemma",
        F.log((F.col("c").cast("double") + F.lit(a))
              / (F.col("total_tf").cast("double") + F.lit(a * v)))
        .alias("llh"),
    )
    lab = model.priors.select(
        "label",
        F.log(F.col("n_docs").cast("double")
              / F.lit(float(model.n_docs))).alias("log_prior"),
        F.log(F.lit(a)
              / (F.col("total_tf").cast("double") + F.lit(a * v)))
        .alias("llh0"),
    )
    tf = (
        explode_lemmas(docs.select(F.col(id_col).alias("doc_id"), text_col),
                       text_col=text_col)
        .groupBy("doc_id", "lemma")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    scored = (
        tf.crossJoin(F.broadcast(lab))
        .join(F.broadcast(llh), ["label", "lemma"], "left")
        .withColumn(
            "_term",
            F.round(
                F.col("tf").cast("double")
                * F.coalesce(F.col("llh"), F.col("llh0")),
                10,
            ).cast("decimal(28,10)"),
        )
        .groupBy("doc_id", "label", "log_prior")
        .agg(F.sum("_term").alias("_s"))
        .withColumn(
            "score",
            F.round(F.col("_s").cast("double") + F.col("log_prior"),
                    SCORE_DECIMALS),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "label", "score")
    )


def nb_classify_sql_duckdb(
    toks_expr: str,
    stops_in: str,
    case_expr_fmt: str,
    label_col: str = "lang",
    alpha: float = 1.0,
) -> str:
    """DuckDB twin of nb_train + nb_classify over the ``documents``
    view — same counts, same ln-domain smoothing, same decimal-grid
    per-term rounding and (score desc, label asc) argmax."""
    case = case_expr_fmt.format(tok="token")
    rows = f"""
        SELECT doc_id, {label_col} AS label, {case} AS lemma
        FROM (
            SELECT doc_id, {label_col}, unnest({toks_expr}) AS token
            FROM documents
        )
        WHERE token <> '' AND ({case}) NOT IN {stops_in}"""
    return f"""
    WITH rows_l AS ({rows}),
    cond AS (
        SELECT label, lemma, count(*) AS c
        FROM rows_l GROUP BY label, lemma
    ),
    priors AS (
        SELECT label, count(DISTINCT doc_id) AS n_docs,
               count(*) AS total_tf
        FROM rows_l GROUP BY label
    ),
    consts AS (
        SELECT count(DISTINCT lemma) AS v, count(DISTINCT doc_id) AS n
        FROM rows_l
    ),
    llh AS (
        SELECT c.label, c.lemma,
               ln((CAST(c.c AS DOUBLE) + {alpha!r})
                  / (CAST(p.total_tf AS DOUBLE)
                     + {alpha!r} * CAST(k.v AS DOUBLE))) AS llh
        FROM cond c JOIN priors p USING (label) CROSS JOIN consts k
    ),
    lab AS (
        SELECT p.label,
               ln(CAST(p.n_docs AS DOUBLE) / CAST(k.n AS DOUBLE))
                   AS log_prior,
               ln({alpha!r} / (CAST(p.total_tf AS DOUBLE)
                               + {alpha!r} * CAST(k.v AS DOUBLE))) AS llh0
        FROM priors p CROSS JOIN consts k
    ),
    tf AS (
        SELECT doc_id, lemma, count(*) AS tf
        FROM rows_l GROUP BY doc_id, lemma
    ),
    scored AS (
        SELECT t.doc_id, lab.label,
               round(CAST(sum(CAST(round(
                   CAST(t.tf AS DOUBLE) * COALESCE(l.llh, lab.llh0), 10)
                   AS DECIMAL(28,10))) AS DOUBLE) + lab.log_prior, 6)
                   AS score
        FROM tf t
        CROSS JOIN lab
        LEFT JOIN llh l ON l.label = lab.label AND l.lemma = t.lemma
        GROUP BY t.doc_id, lab.label, lab.log_prior
    )
    SELECT doc_id, label, score
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, label ASC) AS rn
        FROM scored
    ) WHERE rn = 1
    """
