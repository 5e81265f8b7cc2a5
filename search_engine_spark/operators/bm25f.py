"""BM25F — field-weighted BM25 with per-field length normalization.

The reference ranks one concatenated content stream with per-role
weights folded into tf at BUILD time (Parser.java lemma ranks; our
index_build's weighted path mirrors it). BM25F (Robertson, Zaragoza &
Taylor, CIKM 2004) is the principled generalization a search engine
grows next: each field f gets its own length normalization BEFORE the
saturation,

    tf̃(t, d) = Σ_f  w_f · tf(t, f, d) / (1 − b_f + b_f·len_f/avglen_f)
    score(d) = Σ_t  idf(t) · tf̃ / (k1 + tf̃)

so a short title mention is worth more than the same tf buried in a
long body, and the saturation applies ONCE to the combined evidence —
the property per-field-BM25-summing ("most fields" scoring) lacks.

Fields here: ``title`` (serving.extract_title's first-sentence clip —
the reference's <title> analog) and ``body`` (the full text). The
title is a prefix of the body, so doc-level df/candidate semantics
come from the body field alone (presence in title implies presence in
body), exactly the ES "boosted duplicate field" mapping.

Plan shape (100 TB): ONE scan of the doc table projects both fields'
lemma streams through a single kind-tagged explode (the collocations
trick — tokenize runs once per field, never per use), then
map-side-combinable aggregates: per-(doc, field, lemma) tf, per-(doc,
field) length, a 2-row per-field avglen frame and a query-bounded df
frame (both broadcast). The final score is one groupBy(doc) over
query-term rows with the order-independent DECIMAL(28,10) per-term
sum (the lm.py contract), TakeOrderedAndProject for top-k. At index
scale you would persist per-field postings exactly like the main
index's weighted build; this operator pins the RANKING semantics the
build would have to reproduce.

Float-order contract (oracle hash parity): the two field terms of tf̃
are summed title-then-body in one fixed expression; idf is
ln(1 + (N − df + .5)/(df + .5)) on exact integer operands; each term
score is rounded to the 1e-10 grid before the decimal sum; final
round 6. Tie-break (score desc, doc_id asc), as everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import BM25_B, BM25_K1
from search_engine_spark.functions.text import lemmas_sql
from search_engine_spark.operators.query import parse_query

DEFAULT_FIELD_WEIGHTS = {"title": 2.0, "body": 1.0}
TITLE_EXPR = "rtrim(substring(regexp_extract(text, '^([^.!?]*)', 1), 1, 60))"


def bm25f_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    field_weights: dict[str, float] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` (doc_id, score) by BM25F over the title/body fields.

    AND match semantics on the body field (title ⊆ body, so this is
    doc-level AND), disjoint from ranking — identical to bm25_topk's
    candidate contract. Empty/stop-only queries return an empty frame.
    """
    fw = dict(DEFAULT_FIELD_WEIGHTS, **(field_weights or {}))
    lemmas = parse_query(query)
    spark = docs.sparkSession
    if not lemmas:
        return spark.createDataFrame([], "doc_id long, score double")

    base = docs.selectExpr(
        "doc_id",
        f"{lemmas_sql(text_col)} AS _body",
        f"{lemmas_sql(TITLE_EXPR)} AS _title",
    )
    rows = base.selectExpr(
        "doc_id",
        "explode(concat("
        " transform(_title, l -> struct('t' AS field, l AS lemma)),"
        " transform(_body,  l -> struct('b' AS field, l AS lemma))"
        ")) AS fl"
    ).select("doc_id", F.col("fl.field").alias("field"),
             F.col("fl.lemma").alias("lemma"))
    rows = rows.persist()  # feeds tf, lengths, df; released before return

    tf = rows.groupBy("doc_id", "field", "lemma").agg(
        F.count("*").alias("tf")
    )
    flen = rows.groupBy("doc_id", "field").agg(F.count("*").alias("len"))
    avg = flen.groupBy("field").agg(
        F.avg("len").alias("avglen"), F.count("*").alias("n_docs")
    )
    # body-field df per query lemma + N (docs with a non-empty body)
    df_t = (
        tf.filter((F.col("field") == "b") & F.col("lemma").isin(lemmas))
        .groupBy("lemma").agg(F.count("*").alias("df"))
    )
    # candidates: docs holding ALL query lemmas in the body
    cand = (
        tf.filter((F.col("field") == "b") & F.col("lemma").isin(lemmas))
        .groupBy("doc_id").agg(F.count("*").alias("_nt"))
        .filter(F.col("_nt") == len(lemmas))
        .select("doc_id")
    )

    wt, wb = float(fw["title"]), float(fw["body"])
    per_field = (
        tf.filter(F.col("lemma").isin(lemmas))
        .join(F.broadcast(cand), "doc_id")
        .join(flen, ["doc_id", "field"])
        .join(F.broadcast(avg.select("field", "avglen")), "field")
        .withColumn(
            "_w", F.when(F.col("field") == "t", F.lit(wt)).otherwise(F.lit(wb))
        )
        .withColumn(
            "_norm",
            F.col("_w") * F.col("tf").cast("double")
            / (F.lit(1.0 - b) + F.lit(b) * F.col("len").cast("double")
               / F.col("avglen")),
        )
    )
    # tf̃: title term then body term, one fixed-order sum per (doc, lemma)
    tft = (
        per_field.groupBy("doc_id", "lemma")
        .agg(
            F.sum(F.when(F.col("field") == "t", F.col("_norm"))).alias("_t"),
            F.sum(F.when(F.col("field") == "b", F.col("_norm"))).alias("_b"),
        )
        .withColumn(
            "_tft", F.coalesce("_t", F.lit(0.0)) + F.coalesce("_b", F.lit(0.0))
        )
    )
    n_docs_body = avg.filter(F.col("field") == "b").select(
        F.col("n_docs").cast("double").alias("_n")
    )
    scored = (
        tft.join(F.broadcast(df_t), "lemma")
        .crossJoin(F.broadcast(n_docs_body))
        .withColumn(
            "_term",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * F.col("_tft") / (F.lit(float(k1)) + F.col("_tft")),
                10,
            ).cast("decimal(28,10)"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("_term").cast("double"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(int(k))
    )
    out = scored.collect()
    rows.unpersist()
    return spark.createDataFrame(out, schema=scored.schema)


def bm25f_sql_duckdb(
    query: str,
    toks_expr: str,
    stops_in: str,
    case_expr_fmt: str,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    wt: float = 2.0,
    wb: float = 1.0,
) -> str:
    """DuckDB twin: same field streams (title expr shared with the
    `titles` oracle), same fixed-order tf̃, same rounded-decimal
    per-term sum. ``toks_expr``/``stops_in``/``case_expr_fmt`` are the
    caller's dialect pieces (the entry module owns them)."""
    lemmas = parse_query(query)
    in_list = "(" + ", ".join(f"'{l}'" for l in lemmas) + ")"
    title = ("rtrim(substr(regexp_extract(text, '^([^.!?]*)', 1), 1, 60))")
    case = case_expr_fmt.format(tok="token")

    def lemma_rows(src_expr: str, tag: str) -> str:
        # toks_expr tokenizes a column named `text`; aliasing the field
        # AS text in the inner projection reuses it verbatim
        return f"""
        SELECT doc_id, '{tag}' AS field, {case} AS lemma
        FROM (
            SELECT doc_id, unnest({toks_expr}) AS token
            FROM (SELECT doc_id, {src_expr} AS text FROM documents)
        )
        WHERE token <> '' AND ({case}) NOT IN {stops_in}"""

    return f"""
    WITH rows_f AS ({lemma_rows(title, 't')} UNION ALL {lemma_rows('text', 'b')}),
    tf AS (
        SELECT doc_id, field, lemma, count(*) AS tf
        FROM rows_f GROUP BY doc_id, field, lemma
    ),
    flen AS (
        SELECT doc_id, field, count(*) AS len FROM rows_f GROUP BY doc_id, field
    ),
    favg AS (
        SELECT field, avg(len) AS avglen, count(*) AS n_docs
        FROM flen GROUP BY field
    ),
    df_t AS (
        SELECT lemma, count(*) AS df FROM tf
        WHERE field = 'b' AND lemma IN {in_list} GROUP BY lemma
    ),
    cand AS (
        SELECT doc_id FROM tf WHERE field = 'b' AND lemma IN {in_list}
        GROUP BY doc_id HAVING count(*) = {len(lemmas)}
    ),
    perf AS (
        SELECT t.doc_id, t.lemma, t.field,
               (CASE WHEN t.field = 't' THEN {wt!r} ELSE {wb!r} END)
               * CAST(t.tf AS DOUBLE)
               / ({1.0 - b!r} + {b!r} * CAST(l.len AS DOUBLE) / a.avglen)
                   AS nrm
        FROM tf t
        JOIN cand USING (doc_id)
        JOIN flen l ON l.doc_id = t.doc_id AND l.field = t.field
        JOIN favg a ON a.field = t.field
        WHERE t.lemma IN {in_list}
    ),
    tft AS (
        SELECT doc_id, lemma,
               COALESCE(sum(nrm) FILTER (WHERE field = 't'), 0.0)
               + COALESCE(sum(nrm) FILTER (WHERE field = 'b'), 0.0) AS tft
        FROM perf GROUP BY doc_id, lemma
    ),
    n AS (SELECT CAST(n_docs AS DOUBLE) AS n FROM favg WHERE field = 'b')
    SELECT doc_id,
           round(CAST(sum(CAST(round(
               ln(1.0 + (n.n - d.df + 0.5) / (d.df + 0.5))
               * t.tft / ({float(k1)!r} + t.tft), 10) AS DECIMAL(28,10)))
               AS DOUBLE), 6) AS score
    FROM tft t JOIN df_t d USING (lemma) CROSS JOIN n
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC LIMIT {k}
    """
