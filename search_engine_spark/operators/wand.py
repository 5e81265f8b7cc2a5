"""Query engine #2: block-max AND/WAND over compressed segments.

The reference's third strategy scans postings sorted by page_id and
merges group boundaries in one pass (plpgsql
``get_pages_index_page_lemma``, reference ConfigRepository.java:271-325).
Our distributed equivalent: doc-space is range-bucketed, every bucket
holds ALL query terms' blocks for its doc range, so each bucket is an
independent document-at-a-time scorer → per-bucket top-k heap → tiny
global merge (the north_star "per-partition heaps + treeAggregate"
design; expressed as applyInPandas + TakeOrderedAndProject which is the
DataFrame-native same thing).

Plan shape:
- query terms resolved against the dictionary on the driver (a handful
  of rows — reference J5 broadcast lookup, LemmaRepository.java:14-16),
- segment scan filtered by term_id ∈ query (parquet min/max pruning;
  segments are written sorted by term_id),
- groupBy(bucket) applyInPandas — shuffle moves only the few query
  terms' blocks, never the whole index,
- intersection runs rarest-term-first (reference selectivity ordering
  O4, SearchService.java:226-229) and skips blocks whose
  [first_doc, last_doc] cannot overlap the running candidate range
  (block-max metadata: range + max-score upper bounds).

AND semantics (docs must contain every query lemma) matches the
reference's retainAll intersection (SearchService.java:192-209).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import DEFAULT_TOP_K
from search_engine_spark.operators.compression import decode_block
from search_engine_spark.operators.query import SCORE_DECIMALS, parse_query

RESULT_SCHEMA = "doc_id long, score_raw double"


def _bucket_scorer(n_terms: int, term_order: list[int], k: int):
    """applyInPandas closure: one doc-range bucket → ≤k (doc, score) rows."""
    order_index = {t: i for i, t in enumerate(term_order)}

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "score_raw": pd.Series(dtype="float64")})
        present = pdf["term_id"].unique()
        if len(present) < n_terms:
            return empty  # some query term absent in this doc range → AND fails
        groups = dict(tuple(pdf.sort_values("block_id").groupby("term_id", sort=False)))
        # rarest-first intersection
        cand: np.ndarray | None = None
        decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for t in sorted(present, key=lambda t: order_index[int(t)]):
            g = groups[t]
            if cand is not None and cand.size == 0:
                return empty
            if cand is not None:
                lo, hi = int(cand[0]), int(cand[-1])
                g = g[(g["last_doc"] >= lo) & (g["first_doc"] <= hi)]
                if g.empty:
                    return empty
            docs_parts, score_parts = [], []
            for r in g.itertuples(index=False):
                d, s = decode_block(r.doc_ids, r.scores)
                docs_parts.append(d)
                score_parts.append(s)
            docs = np.concatenate(docs_parts)
            scores = np.concatenate(score_parts)
            decoded[int(t)] = (docs, scores)
            cand = docs if cand is None else cand[np.isin(cand, docs, assume_unique=True)]
        if cand is None or cand.size == 0:
            return empty
        # sum per-term weights in ascending term_id order (pinned for
        # reproducible float accumulation)
        total = np.zeros(cand.size, dtype=np.float64)
        for t in sorted(decoded):
            docs, scores = decoded[t]
            pos = np.searchsorted(docs, cand)
            total += scores[pos]
        if cand.size > k:  # per-bucket top-k heap
            top = np.argpartition(-total, k - 1)[:k]
            cand, total = cand[top], total[top]
        return pd.DataFrame({"doc_id": cand.astype(np.int64), "score_raw": total})

    return score_bucket


def wand_topk(
    segments: DataFrame,
    terms: DataFrame,
    query: str,
    k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """Top-k (doc_id, score) by BM25 over compressed segments."""
    spark = segments.sparkSession
    lemmas = parse_query(query)
    empty = spark.createDataFrame([], "doc_id long, score double, score_raw double")
    if not lemmas:
        return empty
    qrows = (
        terms.filter(F.col("lemma").isin(lemmas))
        .select("term_id", "lemma", "df")
        .collect()
    )
    if len(qrows) < len(lemmas):
        # a query lemma missing from the dictionary → empty result without
        # launching the scan (reference early-exit, ApiService.java:83-85)
        return empty
    by_df = sorted(qrows, key=lambda r: (r["df"], r["term_id"]))
    term_order = [int(r["term_id"]) for r in by_df]
    scorer = _bucket_scorer(len(term_order), term_order, k)
    seg = segments.filter(F.col("term_id").isin(term_order))
    per_bucket = seg.groupBy("bucket").applyInPandas(
        lambda pdf: scorer(pdf), RESULT_SCHEMA
    )
    return (
        per_bucket.withColumn("score", F.round(F.col("score_raw"), SCORE_DECIMALS))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .select("doc_id", "score", "score_raw")
        .limit(k)
    )
