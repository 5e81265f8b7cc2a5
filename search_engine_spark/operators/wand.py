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
  O4, SearchService.java:226-229) with TWO pruning levels per rarest
  block [lo, hi]:
    1. range:   other-term blocks outside [lo, hi] are never decoded;
    2. block-max score: the block's best-possible total
       ``block_max(rarest) + Σ_t max(block_max of t's overlapping
       blocks)`` is compared against the running kth score θ of the
       bucket's top-k heap — blocks that cannot beat θ are skipped
       WITHOUT decoding (true block-max WAND; the upper bound is exact
       because every candidate in the block scores ≤ each term's
       block-max).
  Pruning is score-safe: a skipped block cannot contain a top-k doc,
  so results are exactly the unpruned top-k (differential-tested
  against the DataFrame engine and pinned by a skip-count pytest).

AND semantics (docs must contain every query lemma) matches the
reference's retainAll intersection (SearchService.java:192-209).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import DEFAULT_TOP_K
from search_engine_spark.operators.compression import decode_block
from search_engine_spark.operators.query import SCORE_DECIMALS, parse_query

RESULT_SCHEMA = "doc_id long, score_raw double"

_EMPTY = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                       "score_raw": pd.Series(dtype="float64")})


class _TermBlocks:
    """One term's blocks in a bucket: sorted metadata + lazy decode."""

    def __init__(self, g: pd.DataFrame):
        g = g.sort_values("first_doc").reset_index(drop=True)
        self.first = g["first_doc"].to_numpy(np.int64)
        self.last = g["last_doc"].to_numpy(np.int64)
        self.bmax = g["block_max_score"].to_numpy(np.float64)
        self.doc_bytes = g["doc_ids"].to_list()
        self.score_bytes = g["scores"].to_list()
        self._decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def overlapping(self, lo: int, hi: int) -> range:
        """Index range of blocks intersecting [lo, hi] (doc-sorted)."""
        start = int(np.searchsorted(self.last, lo, side="left"))
        stop = int(np.searchsorted(self.first, hi, side="right"))
        return range(start, stop)

    def max_bound(self, idxs: range) -> float:
        if idxs.start >= idxs.stop:
            return float("-inf")
        return float(self.bmax[idxs.start : idxs.stop].max())

    def decode(self, idxs: range, counters: dict | None):
        docs_parts, score_parts = [], []
        for i in idxs:
            cached = self._decoded.get(i)
            if cached is None:
                cached = decode_block(self.doc_bytes[i], self.score_bytes[i])
                self._decoded[i] = cached
                if counters is not None:
                    counters["blocks_decoded"] += 1
            docs_parts.append(cached[0])
            score_parts.append(cached[1])
        if not docs_parts:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return np.concatenate(docs_parts), np.concatenate(score_parts)


def score_bucket_pd(
    pdf: pd.DataFrame,
    term_order: list[int],
    k: int,
    counters: dict | None = None,
) -> pd.DataFrame:
    """One doc-range bucket → ≤k (doc_id, score_raw) rows.

    Pure-pandas core (directly testable; the Spark path wraps it in
    applyInPandas). ``counters``: optional dict accumulating
    blocks_decoded / blocks_skipped for the pruning pytest.
    """
    if counters is not None:
        for key in ("blocks_decoded", "blocks_skipped_range", "blocks_skipped_bound"):
            counters.setdefault(key, 0)
    n_terms = len(term_order)
    present = set(int(t) for t in pdf["term_id"].unique())
    if len(present) < n_terms:
        return _EMPTY  # some query term absent in this doc range → AND fails
    terms = {
        int(t): _TermBlocks(g)
        for t, g in pdf.groupby("term_id", sort=False)
    }
    rarest = term_order[0]
    others = term_order[1:]
    r = terms[rarest]
    # ascending-term_id accumulation order, pinned for reproducible float
    # sums across engines (SURVEY.md §7 hard-part (b))
    sum_order = sorted(term_order)

    heap: list[tuple[float, int]] = []  # min-heap of (score, doc_id)
    theta = float("-inf")

    for bi in range(len(r.first)):
        lo, hi = int(r.first[bi]), int(r.last[bi])
        overlaps = {t: terms[t].overlapping(lo, hi) for t in others}
        if any(o.start >= o.stop for o in overlaps.values()):
            if counters is not None:
                counters["blocks_skipped_range"] += 1
            continue  # a required term has no docs in this range
        # block-max upper bound for any doc in this rarest block
        bound = float(r.bmax[bi]) + sum(
            terms[t].max_bound(overlaps[t]) for t in others
        )
        # strict <: at bound == theta an equal-score doc with a smaller
        # doc_id could still win the global (score desc, doc_id asc)
        # tie-break, and identical duplicate docs make exact score ties
        # real — so only skip blocks that provably cannot tie
        if len(heap) >= k and bound < theta:
            if counters is not None:
                counters["blocks_skipped_bound"] += 1
            continue  # cannot reach the running kth score — skip decode
        cand, _ = r.decode(range(bi, bi + 1), counters)
        per_term: dict[int, np.ndarray] = {}
        rd, rs = r._decoded[bi]
        per_term[rarest] = rs
        alive = np.ones(cand.size, dtype=bool)
        for t in others:
            docs, scores = terms[t].decode(overlaps[t], counters)
            pos = np.searchsorted(docs, cand)
            pos_c = np.clip(pos, 0, max(docs.size - 1, 0))
            hit = (docs.size > 0) & (docs[pos_c] == cand)
            alive &= hit
            if not alive.any():
                break
            sc = np.zeros(cand.size, dtype=np.float64)
            sc[hit] = scores[pos_c[hit]]
            per_term[t] = sc
        if not alive.any():
            continue
        idx = np.flatnonzero(alive)
        total = np.zeros(idx.size, dtype=np.float64)
        for t in sum_order:
            total += per_term[t][idx]
        docs_alive = cand[idx]
        for d, s in zip(docs_alive.tolist(), total.tolist()):
            if len(heap) < k:
                heapq.heappush(heap, (s, -d))
                if len(heap) == k:
                    theta = heap[0][0]
            elif s > theta or (s == theta and -d > heap[0][1]):
                heapq.heapreplace(heap, (s, -d))
                theta = heap[0][0]
    if not heap:
        return _EMPTY
    return pd.DataFrame({
        "doc_id": np.array([-d for _, d in heap], dtype=np.int64),
        "score_raw": np.array([s for s, _ in heap], dtype=np.float64),
    })


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

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        return score_bucket_pd(pdf, term_order, k)

    seg = segments.filter(F.col("term_id").isin(term_order))
    per_bucket = seg.groupBy("bucket").applyInPandas(score_bucket, RESULT_SCHEMA)
    return (
        per_bucket.withColumn("score", F.round(F.col("score_raw"), SCORE_DECIMALS))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .select("doc_id", "score", "score_raw")
        .limit(k)
    )
