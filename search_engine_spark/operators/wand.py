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

Blocks store raw (tf, dl) keyed by xxhash64(lemma) (compression.py v2):
per-term BM25 weights are computed here at query time — idf doubles are
collected from the JVM (idf_col) and the numpy formula replicates
bm25_weight_col's exact operation order, so scores are bit-identical to
the DataFrame engine's.

Plan shape:
- query terms resolved against the dictionary on the driver (a handful
  of rows — reference J5 broadcast lookup, LemmaRepository.java:14-16),
- segment scan filtered by term_key ∈ query (parquet min/max pruning;
  segments are written sorted by term_key),
- groupBy(bucket) applyInPandas — shuffle moves only the few query
  terms' blocks, never the whole index,
- intersection runs rarest-term-first (reference selectivity ordering
  O4, SearchService.java:226-229) with TWO pruning levels per rarest
  block [lo, hi]:
    1. range:   other-term blocks outside [lo, hi] are never decoded;
    2. block-max score: the block's best-possible total
       ``ub(rarest) + Σ_t max(ub of t's overlapping blocks)`` — where a
       block's ub = idf·w(max_tf, min_dl), a true bound because the
       BM25 weight is monotone ↑ in tf and ↓ in dl — is compared
       against the running kth score θ of the bucket's top-k heap;
       blocks that cannot beat θ are skipped WITHOUT decoding (true
       block-max WAND).
  Pruning is score-safe: a skipped block cannot contain a top-k doc,
  so results are exactly the unpruned top-k (differential-tested
  against the DataFrame engine and pinned by a skip-count pytest).

AND semantics (docs must contain every query lemma) matches the
reference's retainAll intersection (SearchService.java:192-209);
``match_all=False`` switches to disjunctive block-max WAND
(score_bucket_or_pd) — the classic WAND setting — rank-identical to
the DataFrame engine's OR mode.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import BM25_B, BM25_K1, DEFAULT_TOP_K
from search_engine_spark.operators.compression import (
    bm25_scores_np,
    decode_block,
    term_key_col,
)
from search_engine_spark.operators.index_build import CorpusStats, idf_col
from search_engine_spark.operators.query import SCORE_DECIMALS, parse_query

RESULT_SCHEMA = "doc_id long, score_raw double"

_EMPTY = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                       "score_raw": pd.Series(dtype="float64")})


class _TermBlocks:
    """One term's blocks in a bucket: sorted metadata, per-block score
    upper bounds, lazy decode + on-decode scoring."""

    def __init__(self, g: pd.DataFrame, idf: float, avgdl: float,
                 k1: float, b: float, boost: float = 1.0):
        g = g.sort_values("first_doc").reset_index(drop=True)
        self.first = g["first_doc"].to_numpy(np.int64)
        self.last = g["last_doc"].to_numpy(np.int64)
        max_tf = g["block_max_tf"].to_numpy(np.float64)
        min_dl = g["block_min_dl"].to_numpy(np.float64)
        # true per-block weight bound: monotone ↑ tf, ↓ dl
        self.ub = idf * (max_tf * (k1 + 1.0)) / (
            max_tf + k1 * ((1.0 - b) + b * min_dl / avgdl)
        )
        if boost != 1.0:
            # per-term boost scales weight AND bound by the same
            # positive factor (validated in _per_bucket_scores), so the
            # block-max proof is unchanged; applied AFTER the weight —
            # the DataFrame engine's `_w * boost` op order, keeping
            # boosted scores bit-identical across engines
            self.ub = self.ub * boost
        self.doc_bytes = g["doc_ids"].to_list()
        self.tf_bytes = g["tfs"].to_list()
        self.dl_bytes = g["dls"].to_list()
        self.idf, self.avgdl, self.k1, self.b = idf, avgdl, k1, b
        self.boost = boost
        self._decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def overlapping(self, lo: int, hi: int) -> np.ndarray:
        """Indices of blocks intersecting [lo, hi]. A mask, not a
        searchsorted range: block ranges may OVERLAP when the encode
        input was not doc-ordered, so ``last`` isn't monotone."""
        return np.flatnonzero((self.last >= lo) & (self.first <= hi))

    def max_bound(self, idxs: np.ndarray) -> float:
        if idxs.size == 0:
            return float("-inf")
        return float(self.ub[idxs].max())

    def decode(self, idxs, counters: dict | None):
        docs_parts, score_parts = [], []
        for i in idxs:
            cached = self._decoded.get(i)
            if cached is None:
                d, tf, dl = decode_block(
                    self.doc_bytes[i], self.tf_bytes[i], self.dl_bytes[i]
                )
                s = bm25_scores_np(tf, dl, self.idf, self.avgdl, self.k1, self.b)
                if self.boost != 1.0:
                    s = s * self.boost
                cached = (d, s)
                self._decoded[i] = cached
                if counters is not None:
                    counters["blocks_decoded"] += 1
            docs_parts.append(cached[0])
            score_parts.append(cached[1])
        if not docs_parts:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        docs = np.concatenate(docs_parts)
        scores = np.concatenate(score_parts)
        if docs.size > 1 and (docs[1:] < docs[:-1]).any():
            # blocks of one (term, bucket) may carry OVERLAPPING doc
            # ranges when the encode input was not doc-ordered (e.g. the
            # shuffle-built postings path) — the first_doc sort then
            # doesn't yield globally ascending docs, and searchsorted
            # intersection requires it
            order = np.argsort(docs, kind="stable")
            docs, scores = docs[order], scores[order]
        return docs, scores


def score_bucket_pd(
    pdf: pd.DataFrame,
    term_order: list[int],
    idf_by_key: dict[int, float],
    avgdl: float,
    k: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
    counters: dict | None = None,
    boost_by_key: dict[int, float] | None = None,
) -> pd.DataFrame:
    """One doc-range bucket → ≤k (doc_id, score_raw) rows.

    Pure-pandas core (directly testable; the Spark path wraps it in
    applyInPandas). ``term_order``: query term_keys rarest-first.
    ``counters``: optional dict accumulating blocks_decoded /
    blocks_skipped_* for the pruning pytest.
    """
    if counters is not None:
        for key in ("blocks_decoded", "blocks_skipped_range", "blocks_skipped_bound"):
            counters.setdefault(key, 0)
    n_terms = len(term_order)
    present = set(int(t) for t in pdf["term_key"].unique())
    if len(present) < n_terms:
        return _EMPTY  # some query term absent in this doc range → AND fails
    bb = boost_by_key or {}
    terms = {
        int(t): _TermBlocks(g, idf_by_key[int(t)], avgdl, k1, b,
                            boost=bb.get(int(t), 1.0))
        for t, g in pdf.groupby("term_key", sort=False)
    }
    rarest = term_order[0]
    others = term_order[1:]
    r = terms[rarest]
    # ascending-key accumulation order, pinned for reproducible float
    # sums across engines (SURVEY.md §7 hard-part (b))
    sum_order = sorted(term_order)

    # Vectorized top-k: survivors accumulate in numpy buffers and are
    # consolidated to k rows (score desc, doc asc) whenever they grow
    # past a threshold — a per-element Python heap was measured 6×
    # slower on a 600k-candidate hot-term query. θ (the running kth
    # score) updates at consolidation; it is a valid pruning threshold
    # at every point because it is the kth-best of a SUBSET seen so far.
    buf_d: list[np.ndarray] = []
    buf_s: list[np.ndarray] = []
    buf_n = 0
    consolidate_at = max(4 * k, 1024)
    theta = float("-inf")

    def consolidate() -> None:
        nonlocal buf_d, buf_s, buf_n, theta
        if not buf_d:
            return
        d = np.concatenate(buf_d)
        s = np.concatenate(buf_s)
        if d.size > k:
            # cut by ROUNDED score + doc_id — the global tie-break —
            # so k-boundary near-ties can't rank-diverge vs the
            # DataFrame engine; θ stays the raw min of the kept set
            # (≤ true kth: still a safe pruning threshold)
            order = np.lexsort((d, -np.round(s, SCORE_DECIMALS)))[:k]
            d, s = d[order], s[order]
        buf_d, buf_s, buf_n = [d], [s], d.size
        if d.size >= k:
            theta = float(s.min())

    for bi in range(len(r.first)):
        lo, hi = int(r.first[bi]), int(r.last[bi])
        overlaps = {t: terms[t].overlapping(lo, hi) for t in others}
        if any(o.size == 0 for o in overlaps.values()):
            if counters is not None:
                counters["blocks_skipped_range"] += 1
            continue  # a required term has no docs in this range
        # block-max upper bound for any doc in this rarest block
        bound = float(r.ub[bi]) + sum(
            terms[t].max_bound(overlaps[t]) for t in others
        )
        # strict <: at bound == theta an equal-score doc with a smaller
        # doc_id could still win the global (score desc, doc_id asc)
        # tie-break, and identical duplicate docs make exact score ties
        # real — so only skip blocks that provably cannot tie
        if bound < theta:
            if counters is not None:
                counters["blocks_skipped_bound"] += 1
            continue  # cannot reach the running kth score — skip decode
        cand, _ = r.decode(range(bi, bi + 1), counters)
        per_term: dict[int, np.ndarray] = {}
        per_term[rarest] = r._decoded[bi][1]
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
        if theta > float("-inf"):
            # >= keeps exact-θ ties (smaller doc_id may win the global
            # tie-break); dropping < θ is safe — k survivors ≥ θ exist
            keep = total >= theta
            if not keep.all():
                docs_alive, total = docs_alive[keep], total[keep]
        if docs_alive.size:
            buf_d.append(docs_alive)
            buf_s.append(total)
            buf_n += docs_alive.size
            # consolidate early the first time k candidates exist (θ
            # arms the bound pruning), then in batches
            if buf_n >= consolidate_at or (
                theta == float("-inf") and buf_n >= k
            ):
                consolidate()
    consolidate()
    if not buf_d or buf_d[0].size == 0:
        return _EMPTY
    return pd.DataFrame({
        "doc_id": buf_d[0].astype(np.int64),
        "score_raw": buf_s[0].astype(np.float64),
    })


def _union_sum(
    acc: dict[int, tuple[np.ndarray, np.ndarray]],
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc sum over all terms' (docs, scores) arrays, accumulated
    in ascending term_key order — the engine-wide pinned float order
    (one copy of the summation, shared by θ arming and final output)."""
    all_docs = np.concatenate([d for d, _ in acc.values()])
    uniq = np.unique(all_docs)
    total = np.zeros(uniq.size, dtype=np.float64)
    for t in sorted(acc):
        d, s = acc[t]
        # np.add.at (not fancy-index +=): accumulates repeated indices
        # instead of silently dropping them. Blocks partition each
        # (term, bucket) posting list so a doc appears at most once per
        # term today, but that invariant lives in the encoder — this
        # must not corrupt scores if it ever changes (ADVICE r2). Same
        # float accumulation order (per sorted-term loop, ascending doc).
        np.add.at(total, np.searchsorted(uniq, d), s)
    return uniq, total


def _partial_theta(acc: dict[int, tuple[np.ndarray, np.ndarray]], k: int) -> float:
    """kth-best of the per-doc PARTIAL sums accumulated so far — a valid
    (conservative) pruning threshold for OR: final scores only grow as
    more terms decode, so the true kth-best ≥ this."""
    if not acc:
        return float("-inf")
    uniq, total = _union_sum(acc)
    if uniq.size < k:
        return float("-inf")
    return float(np.partition(total, total.size - k)[total.size - k])


def score_bucket_or_pd(
    pdf: pd.DataFrame,
    term_order: list[int],
    idf_by_key: dict[int, float],
    avgdl: float,
    k: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
    counters: dict | None = None,
    boost_by_key: dict[int, float] | None = None,
) -> pd.DataFrame:
    """Disjunctive (OR) bucket scorer: every doc in ANY query term's
    blocks is a candidate; its score sums the decoded contributions of
    all terms that contain it.

    Block-max pruning stays score-safe under OR with a subtle twist:
    skipping block B (range bound < θ) is valid because bound ≥ the
    FULL score of every doc in B's range — so such a doc can never
    reach the top-k even though other terms' kept blocks may still
    contribute it a partial sum (that partial ≤ full < θ loses to the
    ≥k docs that defined θ). θ is armed from the kth-best PARTIAL sum
    after each term (valid since final sums only grow); terms decode in
    descending best-block-ub order so θ arms against the heavy hitters
    first. Missing terms in a bucket simply contribute nothing (no AND
    arity gate).

    Rounding-tie caveat (ADVICE r2): the θ-pruning proof holds on RAW
    scores, but the final top-k cut sorts by the 6-decimal ROUNDED
    score. A doc emitted with an underestimated partial sum (one of its
    terms' blocks was bound-skipped) provably loses on raw score, yet if
    its rounded partial exactly ties the kth rounded score the doc_id
    tie-break could order it differently than its exact score would. In
    practice unreachable on this engine's data (a partial sum landing on
    the same 1e-6-rounded value as the exact kth score requires the
    skipped contribution to be < 5e-7 while idf·tf contributions are
    O(0.1+)), and the cross-engine differential tests would catch it;
    documented rather than paid for with always-decode-on-tie.
    """
    if counters is not None:
        for key in ("blocks_decoded", "blocks_skipped_range", "blocks_skipped_bound"):
            counters.setdefault(key, 0)
    if not len(pdf):
        return _EMPTY
    # pdf is pre-filtered to query terms (_per_bucket_scores); groupby
    # yields exactly the PRESENT subset — absent terms contribute nothing
    bb = boost_by_key or {}
    terms = {
        int(t): _TermBlocks(g, idf_by_key[int(t)], avgdl, k1, b,
                            boost=bb.get(int(t), 1.0))
        for t, g in pdf.groupby("term_key", sort=False)
    }
    tkeys = list(terms)
    acc: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    theta = float("-inf")
    rearm_at = max(4 * k, 1024)
    for t in sorted(tkeys, key=lambda u: -float(terms[u].ub.max())):
        tb = terms[t]
        d_parts: list[np.ndarray] = []
        s_parts: list[np.ndarray] = []
        n_seen = 0
        since_rearm = 0
        # highest-upper-bound blocks first: θ arms against the heavy
        # hitters before the long weak tail is examined (doc order is
        # irrelevant here — OR accumulation is order-free, and the
        # final union-sum runs in pinned ascending-term order)
        for bi in np.argsort(-tb.ub, kind="stable"):
            lo, hi = int(tb.first[bi]), int(tb.last[bi])
            # upper bound on the FULL score of any doc in [lo, hi]
            # (overlapping() computed once per (block, term))
            ovs = {u: terms[u].overlapping(lo, hi) for u in tkeys}
            bound = sum(
                terms[u].max_bound(o) for u, o in ovs.items() if o.size
            )
            # strict <: equal-score ties can still win on doc_id
            if bound < theta:
                if counters is not None:
                    counters["blocks_skipped_bound"] += 1
                continue
            d, s = tb.decode(np.asarray([bi], dtype=np.int64), counters)
            d_parts.append(d)
            s_parts.append(s)
            n_seen += d.size
            since_rearm += d.size
            if (theta == float("-inf") and n_seen >= k) or since_rearm >= rearm_at:
                tmp = dict(acc)
                tmp[t] = (np.concatenate(d_parts), np.concatenate(s_parts))
                theta = max(theta, _partial_theta(tmp, k))
                since_rearm = 0
        if d_parts:
            acc[t] = (np.concatenate(d_parts), np.concatenate(s_parts))
        theta = max(theta, _partial_theta(acc, k))
    if not acc:
        return _EMPTY
    uniq, total = _union_sum(acc)
    if uniq.size > k:
        # cut by the ROUNDED score then doc_id — the same tie-break the
        # global merge and the DataFrame engine use, so near-tie docs
        # at the k boundary cannot rank-diverge across engines
        order = np.lexsort((uniq, -np.round(total, SCORE_DECIMALS)))[:k]
        uniq, total = uniq[order], total[order]
    return pd.DataFrame({
        "doc_id": uniq.astype(np.int64),
        "score_raw": total.astype(np.float64),
    })


def _per_bucket_scores(
    segments: DataFrame,
    terms: DataFrame,
    query: str,
    k: int,
    stats: CorpusStats,
    match_all: bool = True,
    boosts: dict[str, float] | None = None,
) -> DataFrame | None:
    """Shared front half of both WAND variants: resolve query terms on
    the driver, filter the segment scan, run the bucket scorers.
    Returns None for an invalid query, or (match_all only) when a query
    term is missing from the dictionary (reference early-exit,
    ApiService.java:83-85); OR mode keeps going with the present
    terms."""
    lemmas = parse_query(query)
    if not lemmas:
        return None
    if boosts and any(w <= 0 for w in boosts.values()):
        # non-positive boosts invalidate the block-max upper bounds
        raise ValueError(f"boosts must be positive: {boosts}")
    qrows = (
        terms.filter(F.col("lemma").isin(lemmas))
        .select(
            "lemma",
            term_key_col("lemma").alias("term_key"),
            "df",
            # idf computed JVM-side → bit-identical to the DataFrame
            # engine (np.log differs in the last ulp)
            idf_col(F.col("df").cast("double"), stats.n_docs).alias("idf"),
        )
        .collect()
    )
    if not qrows or (match_all and len(qrows) < len(lemmas)):
        return None
    by_df = sorted(qrows, key=lambda r: (r["df"], r["term_key"]))
    term_order = [int(r["term_key"]) for r in by_df]
    idf_by_key = {int(r["term_key"]): float(r["idf"]) for r in qrows}
    boost_by_key = {
        int(r["term_key"]): float(boosts[r["lemma"]])
        for r in qrows
        if boosts and r["lemma"] in boosts
    } or None
    avgdl = stats.avgdl
    scorer = score_bucket_pd if match_all else score_bucket_or_pd

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        return scorer(pdf, term_order, idf_by_key, avgdl, k,
                      boost_by_key=boost_by_key)

    seg = segments.filter(F.col("term_key").isin(term_order))
    return seg.groupBy("bucket").applyInPandas(score_bucket, RESULT_SCHEMA)


def wand_topk(
    segments: DataFrame,
    terms: DataFrame,
    query: str,
    k: int = DEFAULT_TOP_K,
    stats: CorpusStats | None = None,
    match_all: bool = True,
    boosts: dict[str, float] | None = None,
) -> DataFrame:
    """Top-k (doc_id, score) by BM25 over compressed segments.

    ``boosts`` (lemma → positive multiplier) applies Lucene term^N
    weighting: each boosted term's decoded weights AND its block-max
    bounds scale by the same factor, so the pruning proof is
    unchanged and results stay rank-identical to
    ``bm25_topk(boosts=...)`` (differential-tested).

    ``stats`` (n_docs, avgdl) is required: blocks store raw tf/dl and
    the BM25 weights are computed here (segments are stats-independent,
    compression.py v2). ``match_all=False`` is disjunctive block-max
    WAND (:func:`score_bucket_or_pd`), rank-identical to
    ``bm25_topk(match_all=False)``. The global merge is
    TakeOrderedAndProject (the DataFrame-native per-partition-heap
    merge); :func:`wand_topk_tree` is the explicit treeAggregate
    formulation for very large k."""
    if stats is None:
        raise ValueError("wand_topk requires CorpusStats (index.stats)")
    spark = segments.sparkSession
    per_bucket = _per_bucket_scores(segments, terms, query, k, stats,
                                    match_all=match_all, boosts=boosts)
    if per_bucket is None:
        return spark.createDataFrame(
            [], "doc_id long, score double, score_raw double"
        )
    return (
        per_bucket.withColumn("score", F.round(F.col("score_raw"), SCORE_DECIMALS))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .select("doc_id", "score", "score_raw")
        .limit(k)
    )


def wand_topk_tree(
    segments: DataFrame,
    terms: DataFrame,
    query: str,
    k: int = DEFAULT_TOP_K,
    stats: CorpusStats | None = None,
    depth: int = 2,
) -> list[tuple[int, float]]:
    """The north_star's literal ``treeAggregate`` top-k heap merge
    (UD4): per-partition top-k lists combine through an executor tree
    before one driver-side merge — the shape that wins over
    TakeOrderedAndProject when k is large (top-10k over 1000 executors:
    the driver merges depth-combined partials, not P heaps). Returns
    [(doc_id, score)] rank-identical to :func:`wand_topk` (tested)."""
    if stats is None:
        raise ValueError("wand_topk_tree requires CorpusStats (index.stats)")
    per_bucket = _per_bucket_scores(segments, terms, query, k, stats)
    if per_bucket is None:
        return []

    def key(item: tuple[int, float]) -> tuple[float, int]:
        doc, raw = item
        return (-round(raw, SCORE_DECIMALS), doc)

    def seq(acc: list, row) -> list:
        acc.append((int(row["doc_id"]), float(row["score_raw"])))
        if len(acc) > 4 * k:
            acc.sort(key=key)
            del acc[k:]
        return acc

    def comb(a: list, b: list) -> list:
        a.extend(b)
        a.sort(key=key)
        return a[:k]

    merged = per_bucket.rdd.treeAggregate([], seq, comb, depth)
    merged.sort(key=key)
    return [(d, round(raw, SCORE_DECIMALS)) for d, raw in merged[:k]]
