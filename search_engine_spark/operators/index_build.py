"""Inverted-index construction: docs → lemma rows → postings → terms → stats.

Reference pipeline being re-expressed (crawler thread → lemmatizer →
staging table → plpgsql trigger explode → page/lemma/index upserts,
reference DBWriter.java:44-79 + PageContainerRepository.java:89-144):
here it is ONE declarative lineage —

    read → lemmatize (codegen or Arrow UDF) → explode →
    groupBy(doc,lemma) tf/rank → groupBy(lemma) df/cf →
    BM25 idf/doclen stats

so Catalyst fuses the scan+tokenize+explode into one stage and the two
aggregations are the only shuffles. All aggregates benefit from map-side
partial aggregation; the genuinely skew-prone shapes additionally get an
explicit salted two-stage variant (north_rule requirement; see
``term_df_salted``).

Semantics preserved:
- tf  = per-(doc,term) occurrence count  (reference Lemmatization.java:104-129)
- rank = tf × field weight, summed across fields (Lemmatization.java:131-141;
  fields → transcript roles, config.ROLE_WEIGHTS)
- df  = TRUE document frequency (countDistinct docs). The reference's
  trigger seeds frequency with the first page's tf (quirk,
  PageContainerRepository.java:116-123); documented, NOT reproduced.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import (
    BM25_B,
    BM25_K1,
    DEFAULT_FIELD_WEIGHT,
    ROLE_WEIGHTS,
    SALT_FACTOR,
)
from search_engine_spark.functions.text import (
    doc_term_counts_udf,
    lemmas_col,
    lemmatize_text_udf,
)
from search_engine_spark.operators.docids import assign_dense_ids


def role_weight_col(role_col: str = "role") -> F.Column:
    """CASE role → field weight (reference Field defaults analog)."""
    expr = F.lit(DEFAULT_FIELD_WEIGHT)
    c = None
    for role, w in ROLE_WEIGHTS.items():
        c = F.when(F.col(role_col) == role, F.lit(w)) if c is None else c.when(
            F.col(role_col) == role, F.lit(w)
        )
    return c.otherwise(expr)


def explode_lemmas(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_arrow_udf: bool = False,
    weight_col: F.Column | None = None,
) -> DataFrame:
    """docs → one row per (doc_id, lemma[, weight]).

    ``use_arrow_udf=True`` routes lemmatization through the vectorized
    pandas UDF (north_star Arrow path); default is the pure-JVM
    codegen expression — both produce identical rows (tested).
    """
    lem = lemmatize_text_udf(F.col(text_col)) if use_arrow_udf else lemmas_col(text_col)
    cols = [F.col(id_col), F.explode(lem).alias("lemma")]
    out = docs.select(*cols, *( [weight_col.alias("weight")] if weight_col is not None else [] ))
    return out


def build_postings_no_shuffle(
    docs: DataFrame,
    text_col: str = "text",
    weight_col: F.Column | None = None,
) -> DataFrame:
    """docs → postings(doc_id, lemma, tf, rank, dl) with ZERO shuffles.

    The (doc_id, lemma) grouping unit is the doc itself, so per-doc tf
    maps computed inside the Arrow UDF (doc_term_counts_udf) make the
    groupBy(doc_id, lemma) shuffle of the exploded path unnecessary —
    postings are a pure explode pipelined into the scan stage, and the
    doc length rides along as a column (so query-time scoring needs no
    doclen join either). rank = tf × field weight (the weight is a
    per-doc role attribute, applied post-explode JVM-side).
    Identical rows to explode_lemmas→build_postings (tested).
    """
    enriched = doc_term_maps(docs, text_col=text_col, weight_col=weight_col)
    return explode_doc_term_maps(enriched)


def doc_term_maps(
    docs: DataFrame,
    text_col: str = "text",
    weight_col: F.Column | None = None,
) -> DataFrame:
    """docs → (doc_id, lemmas array, tfs array, dl, _w) — the per-doc
    term map straight off the Arrow UDF, one row per doc. This is the
    stage worth spilling to parquet at scale: the ONLY pass that runs
    Python, and every downstream table (postings via explode, doclen via
    projection) derives from it JVM-side."""
    w = weight_col if weight_col is not None else F.lit(1.0)
    return docs.select(
        F.col("doc_id"),
        doc_term_counts_udf(F.col(text_col)).alias("_tc"),
        w.alias("_w"),
    ).select(
        "doc_id",
        F.col("_tc.lemmas").alias("lemmas"),
        F.col("_tc.tfs").alias("tfs"),
        F.col("_tc.dl").alias("dl"),
        "_w",
    )


def explode_doc_term_maps(enriched: DataFrame) -> DataFrame:
    """(doc_id, lemmas, tfs, dl, _w) → postings rows. Pure JVM explode."""
    return enriched.select(
        "doc_id",
        F.explode(F.arrays_zip("lemmas", "tfs")).alias("_z"),
        "_w",
        "dl",
    ).select(
        "doc_id",
        F.col("_z.lemmas").alias("lemma"),
        F.col("_z.tfs").alias("tf"),
        (F.col("_z.tfs").cast("double") * F.col("_w")).alias("rank"),
        "dl",
    )


def doclen_from_term_maps(enriched: DataFrame) -> DataFrame:
    """(doc_id, …, dl) projection — doclen WITHOUT any aggregation (the
    groupBy(doc_id) variant anti-scaled with task concurrency). Docs
    whose text produced zero lemmas are excluded, matching the
    explode+groupBy path's doclen."""
    return enriched.filter(F.col("dl") > 0).select("doc_id", "dl")


def build_postings(lemma_rows: DataFrame) -> DataFrame:
    """(doc_id, lemma[, weight]) → postings(doc_id, lemma, tf, rank).

    One shuffle on (doc_id, lemma). Key cardinality ≈ corpus size × avg
    distinct terms — high and well-spread, so no salting needed here
    (the map-side partial agg already collapses in-partition repeats).
    """
    has_w = "weight" in lemma_rows.columns
    rank_expr = F.sum("weight") if has_w else F.count("*").cast("double")
    return (
        lemma_rows.groupBy("doc_id", "lemma")
        .agg(F.count("*").cast("int").alias("tf"), rank_expr.alias("rank"))
    )


def build_doclen(postings: DataFrame) -> DataFrame:
    """doc_id → dl (post-filter token count = Σ tf)."""
    return postings.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))


def build_terms(postings: DataFrame, assign_ids: bool = True) -> DataFrame:
    """terms(term_id, lemma, df, cf) — the dictionary (reference ``lemma``
    table analog, entity/Lemma.java:14-27).

    df via count(*) over postings (already unique per (doc,lemma)) — this
    is a plain partial+final agg, NOT a countDistinct expand, so hot
    terms cost O(#partitions) rows in the final stage.
    """
    terms = postings.groupBy("lemma").agg(
        F.count("*").alias("df"), F.sum("tf").cast("long").alias("cf")
    )
    if assign_ids:
        terms = assign_dense_ids(terms, ["lemma"], "term_id")
    return terms


def term_df_salted(lemma_rows: DataFrame, salt: int = SALT_FACTOR) -> DataFrame:
    """Document frequency straight from exploded lemma rows with an
    EXPLICIT salted two-stage aggregation (north_rule skew handling).

    Needed when df is computed as countDistinct(doc_id) over raw lemma
    rows: a Zipf-head term routes its billions of rows to one reducer.
    Stage 1 groups by (lemma, salt=doc_id%S) — hot keys split S ways and
    dedup happens inside each salt bucket; stage 2 sums S partial
    distinct-counts (buckets partition doc space, so counts add exactly).
    Tested equal to the unsalted aggregate (tests/test_index_build.py).
    """
    stage1 = (
        lemma_rows.withColumn("_salt", (F.col("doc_id") % salt).cast("int"))
        .groupBy("lemma", "_salt")
        .agg(F.countDistinct("doc_id").alias("_pdf"))
    )
    return stage1.groupBy("lemma").agg(F.sum("_pdf").alias("df"))


@dataclass(frozen=True)
class CorpusStats:
    n_docs: int
    avgdl: float


def corpus_stats(doclen: DataFrame) -> CorpusStats:
    row = doclen.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return CorpusStats(n_docs=int(row["n"]), avgdl=float(row["avgdl"]))


def idf_col(df_col: F.Column, n_docs: int) -> F.Column:
    """BM25 idf = ln(1 + (N - df + 0.5)/(df + 0.5)) — always positive."""
    return F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def idf_py(df: int, n_docs: int) -> float:
    return math.log(1.0 + (float(n_docs) - df + 0.5) / (df + 0.5))


def bm25_weight_col(tf_col: F.Column, dl_col: F.Column, idf: F.Column,
                    avgdl: float, k1: float = BM25_K1, b: float = BM25_B) -> F.Column:
    """Per-posting BM25 weight; op order pinned — the numpy twin in
    operators/compression.py and the DuckDB oracle replicate it exactly."""
    return idf * (tf_col * F.lit(k1 + 1.0)) / (
        tf_col + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_col / F.lit(avgdl))
    )


@dataclass
class InvertedIndex:
    """Handle on the index DataFrames (pre-segment form).

    ``backing_dir`` is set when the build spilled docs/postings to
    parquet (the at-scale path) — consumers like write_index skip
    re-writing tables that already live there."""

    docs: DataFrame        # doc_id, conv_id, turn_idx, role, text, tool, ts
    postings: DataFrame    # doc_id, lemma, tf, rank, dl
    doclen: DataFrame      # doc_id, dl
    terms: DataFrame       # term_id, lemma, df, cf
    stats: CorpusStats
    backing_dir: str | None = None
    # set when the spilled docs table stores _mid instead of doc_id
    # (operators/docids.assign_dense_ids_spilled); persisted in stats.json
    # so DiskIndex re-derives identical ids on read
    docid_adjust: dict[int, int] | None = None
    # set when docs live in the (presorted) INPUT dir instead of a copy
    # under the index dir: (input_dir, {file basename → first doc_id}).
    # Persisted in stats.json; DiskIndex re-derives doc_id on read
    # (operators/docids.docs_from_sorted_dir).
    docs_source: tuple[str, dict[str, int]] | None = None


def build_index_from_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_arrow_udf: bool = True,
    weighted: bool = False,
    scratch_dir: str | None = None,
) -> InvertedIndex:
    """Index build over a generic document table that already carries a
    unique integer id (e.g. the driver's ``documents`` parquet) — same
    lineage as :func:`build_index` minus docID assignment/role weights."""
    if id_col != "doc_id":
        docs = docs.withColumnRenamed(id_col, "doc_id")
    weight = role_weight_col("role") if (weighted and "role" in docs.columns) else None
    return _assemble_index(docs, text_col, use_arrow_udf, weight, scratch_dir)


def _assemble_index(
    docs: DataFrame,
    text_col: str,
    use_arrow_udf: bool,
    weight: F.Column | None,
    scratch_dir: str | None = None,
    docs_spilled: bool = False,
    docid_adjust: dict[int, int] | None = None,
    materialize_postings: bool = True,
    docs_source: tuple[str, dict[str, int]] | None = None,
) -> InvertedIndex:
    """Shared tail of the two build entry points.

    Arrow path: per-doc tf aggregation inside the UDF → zero-shuffle
    postings with dl attached (the lemma-dictionary groupBy is the only
    shuffle in the whole build; the UDF runs exactly once). JVM
    expression path: explode + groupBy + dl join — kept as the
    differential twin (identical rows, tested). Both paths emit the
    SAME postings schema (doc_id, lemma, tf, rank, dl).

    ``scratch_dir``: spill docs + doc_terms to compressed parquet and
    read them back instead of caching. Measured 3× faster than a
    deserialized-row persist at 131M postings on local[32] — object
    caching anti-scales with task concurrency (GC pressure), columnar
    writes don't — and it is the only strategy whose memory footprint
    is flat at 10^12 turns. Tests/small corpora keep the persist path
    (scratch_dir=None). doclen/terms are small per-doc/per-term
    dimensions → always persisted.

    ``materialize_postings``: with False (the at-scale default used by
    the scaling/bench jobs) the uncompressed postings table is NOT
    written — the compressed segments are the posting store, and
    ``postings`` is the exploded view over doc_terms (identical rows,
    re-derived per read)."""
    spark = docs.sparkSession
    if scratch_dir and not docs_spilled:
        docs.write.mode("overwrite").parquet(f"{scratch_dir}/docs")
        docs = spark.read.parquet(f"{scratch_dir}/docs")
    if use_arrow_udf:
        if scratch_dir:
            # spill the per-doc term maps (the only Python pass), then
            # derive postings (JVM explode) and doclen (projection — NO
            # aggregation; the groupBy variant anti-scaled) from it
            doc_term_maps(docs, text_col=text_col, weight_col=weight).write.mode(
                "overwrite"
            ).parquet(f"{scratch_dir}/doc_terms")
            enriched = spark.read.parquet(f"{scratch_dir}/doc_terms")
            if materialize_postings:
                explode_doc_term_maps(enriched).write.mode("overwrite").parquet(
                    f"{scratch_dir}/postings"
                )
                postings = spark.read.parquet(f"{scratch_dir}/postings")
            else:
                # at 100 TB the compressed segments ARE the posting store
                # — writing an uncompressed postings copy doubles the
                # biggest table's IO for nothing. The exploded view over
                # doc_terms serves every consumer (terms agg, segment
                # scoring, the differential DataFrame engine) with the
                # identical rows, re-deriving the explode per read.
                postings = explode_doc_term_maps(enriched)
            doclen = doclen_from_term_maps(enriched).persist()
        else:
            postings = build_postings_no_shuffle(
                docs, text_col=text_col, weight_col=weight
            ).persist()
            doclen = (
                postings.groupBy("doc_id").agg(F.first("dl").alias("dl")).persist()
            )
    else:
        lemma_rows = explode_lemmas(docs, text_col=text_col, use_arrow_udf=False,
                                    weight_col=weight)
        bare = build_postings(lemma_rows)
        postings = bare.join(build_doclen(bare), "doc_id")
        if scratch_dir:
            postings.write.mode("overwrite").parquet(f"{scratch_dir}/postings")
            postings = spark.read.parquet(f"{scratch_dir}/postings")
        else:
            postings = postings.persist()
        doclen = (
            postings.groupBy("doc_id").agg(F.first("dl").alias("dl")).persist()
        )
    terms = build_terms(postings).persist()
    stats = corpus_stats(doclen)
    return InvertedIndex(docs=docs, postings=postings, doclen=doclen,
                         terms=terms, stats=stats, backing_dir=scratch_dir,
                         docid_adjust=docid_adjust, docs_source=docs_source)


def build_index_presorted(
    pres,  # operators.docids.PresortedDocs
    use_arrow_udf: bool = True,
    weighted: bool = True,
    scratch_dir: str | None = None,
    materialize_postings: bool = True,
    text_transform: F.Column | None = None,
) -> InvertedIndex:
    """Index build over a PROVEN-presorted input dir
    (operators/docids.docs_from_sorted_dir): docID assignment costs zero
    shuffles and the corpus is never copied — the input files are the
    docs table, published by reference (stats.json docs_source).

    ``text_transform``: optional replacement text column (e.g. the
    dead-letter 0x00 scrub) applied before lemmatization. It must be a
    pure projection — it cannot drop rows (dropping would break the
    row_index→doc_id density; callers with rows to drop must use
    :func:`build_index`'s range-exchange path)."""
    docs = pres.docs
    if text_transform is not None:
        docs = docs.withColumn("text", text_transform)
    weight = role_weight_col("role") if (weighted and "role" in docs.columns) else None
    return _assemble_index(
        docs, "text", use_arrow_udf, weight, scratch_dir,
        docs_spilled=True,  # never copy the corpus — served from source
        materialize_postings=materialize_postings,
        docs_source=(pres.input_dir, pres.file_offsets),
    )


def build_index(
    transcripts: DataFrame,
    use_arrow_udf: bool = True,
    weighted: bool = True,
    scratch_dir: str | None = None,
    materialize_postings: bool = True,
) -> InvertedIndex:
    """Full batch index build over a transcript table (the reference's
    /api/startIndexing analog, ApiService.java:260-292 — minus the crawl).
    Pass ``scratch_dir`` (usually the index output dir) to spill docs +
    postings to parquet — the at-scale materialization path. The spilled
    path fuses docID assignment with the docs write (one shuffle + one
    materialization; see docids.assign_dense_ids_spilled) — id values are
    identical to :func:`assign_dense_ids` (tested)."""
    adjust = None
    if scratch_dir:
        from search_engine_spark.operators.docids import assign_dense_ids_spilled

        docs, adjust = assign_dense_ids_spilled(
            transcripts, ["conv_id", "turn_idx"], f"{scratch_dir}/docs"
        )
    else:
        docs = assign_dense_ids(transcripts, ["conv_id", "turn_idx"], "doc_id")
    weight = role_weight_col("role") if (weighted and "role" in docs.columns) else None
    return _assemble_index(docs, "text", use_arrow_udf, weight, scratch_dir,
                           docs_spilled=scratch_dir is not None,
                           docid_adjust=adjust,
                           materialize_postings=materialize_postings)
