"""Deterministic dataset sampling, splitting, and eval decontamination —
the slicing stage of a training-data pipeline (task brief: first-class
beyond-reference components; the reference's closest analog is its
per-site scoping, ApiService.java:36-47, generalized here to
content-independent, reproducible corpus partitioning).

Design for 100 TB:

- Splits and samples are PURE COLUMN EXPRESSIONS over a portable hash —
  no shuffle, no state, no sampling RNG whose output depends on
  partitioning. The same row lands in the same split on any cluster
  size, any run, any engine (the md5-prefix hash is replayable in
  DuckDB, so every operator here has a hard equality oracle).
- Decontamination broadcasts the EVAL side (eval sets are tiny next to
  a 100 TB train corpus) and semi-joins the train shingle stream —
  one scan of train, no train-side shuffle before the per-doc count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_spark.operators.dedup import doc_shingles

# granularity of the split hash: fractions are exact multiples of 1e-6
SPLIT_BUCKETS = 1_000_000


# ---------------------------------------------------------------------------
# Portable deterministic hash bucket
# ---------------------------------------------------------------------------
def split_bucket_col(id_col: str = "doc_id", seed: str = "split0") -> Column:
    """Uniform bucket in [0, SPLIT_BUCKETS) from a 60-bit md5 prefix of
    ``"<id>:<seed>"``. md5, not xxhash64: both Spark and DuckDB compute
    it, so split membership is engine-independent (same trick as the
    SimHash token hash, operators/dedup.py). Changing ``seed`` re-deals
    every row independently."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return h % SPLIT_BUCKETS


def split_bucket_sql_duckdb(id_col: str = "doc_id", seed: str = "split0") -> str:
    """DuckDB twin of :func:`split_bucket_col`."""
    return (
        f"(('0x' || substring(md5(CAST({id_col} AS VARCHAR) || ':{seed}'), 1, 15))"
        f"::BIGINT % {SPLIT_BUCKETS})"
    )


# ---------------------------------------------------------------------------
# Train / val / test split
# ---------------------------------------------------------------------------
def dataset_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
    seed: str = "split0",
) -> DataFrame:
    """Add a ``split`` column ('train' / 'val' / 'test') by hash bucket.

    Reproducible across runs, engines and cluster sizes; rows never
    migrate between splits when the corpus grows (membership depends
    only on the row's own id). The remainder after train+val is test."""
    b = split_bucket_col(id_col, seed)
    t_hi = int(round(train * SPLIT_BUCKETS))
    v_hi = t_hi + int(round(val * SPLIT_BUCKETS))
    return docs.withColumn(
        "split",
        F.when(b < t_hi, "train").when(b < v_hi, "val").otherwise("test"),
    )


def dataset_split_sql_duckdb(
    id_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
    seed: str = "split0",
) -> str:
    """DuckDB CASE expression matching :func:`dataset_split`."""
    b = split_bucket_sql_duckdb(id_col, seed)
    t_hi = int(round(train * SPLIT_BUCKETS))
    v_hi = t_hi + int(round(val * SPLIT_BUCKETS))
    return (
        f"CASE WHEN {b} < {t_hi} THEN 'train' "
        f"WHEN {b} < {v_hi} THEN 'val' ELSE 'test' END"
    )


# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------
def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: str = "sample0",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows (e.g. language
    rebalancing before training). Pure filter — no shuffle, no count
    pass, no RNG: row keep/drop depends only on (id, seed), so two jobs
    sampling different fractions of the same corpus agree on the shared
    prefix (fractions are nested: a 1% sample is a subset of a 10%
    sample under the same seed)."""
    b = split_bucket_col(id_col, seed)
    thresh: Column = F.lit(int(round(default_fraction * SPLIT_BUCKETS)))
    for stratum in sorted(fractions):
        thresh = F.when(
            F.col(stratum_col) == stratum,
            int(round(fractions[stratum] * SPLIT_BUCKETS)),
        ).otherwise(thresh)
    return docs.filter(b < thresh)


def stratified_sample_sql_duckdb(
    fractions: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: str = "sample0",
) -> str:
    """DuckDB WHERE predicate matching :func:`stratified_sample`."""
    b = split_bucket_sql_duckdb(id_col, seed)
    cases = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN {int(round(fractions[s] * SPLIT_BUCKETS))}"
        for s in sorted(fractions, reverse=True)
    )
    return (
        f"{b} < (CASE {cases} "
        f"ELSE {int(round(default_fraction * SPLIT_BUCKETS))} END)"
    )


# ---------------------------------------------------------------------------
# Eval decontamination (n-gram overlap against a held-out set)
# ---------------------------------------------------------------------------
def contamination(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_shared_shingles) for every TRAIN doc sharing ≥1 word
    ``n``-gram with any EVAL doc — the standard pretraining
    decontamination test (an eval answer leaked into train shows up as
    long shared n-grams).

    Plan: distinct eval shingles are broadcast (eval benchmarks are
    KBs-to-MBs against a 100 TB train side), train shingles stream
    through one scan + broadcast semi-join, and the only shuffle is the
    per-doc count aggregate over matching rows — already filtered down
    to hits, so skew follows contamination (rare), not corpus size."""
    ev = F.broadcast(
        doc_shingles(eval_docs, id_col, text_col, n)
        .select("shingle")
        .distinct()
    )
    tr = doc_shingles(train_docs, id_col, text_col, n)
    return (
        tr.join(ev, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_shingles"))
    )


def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train docs with every row sharing ≥``min_shared`` eval n-grams
    removed (left_anti against :func:`contamination`)."""
    hits = contamination(train_docs, eval_docs, n, id_col, text_col).filter(
        F.col("n_shared_shingles") >= min_shared
    )
    return train_docs.join(
        hits, train_docs[id_col] == hits["doc_id"], "left_anti"
    )
