"""Compressed posting segments: docID-delta + varbyte blocks with
per-block max-score metadata (north_star physical layout).

The reference materializes one posting ROW per (term, doc) in a
PostgreSQL ``index`` table with B-tree indexes (reference
entity/Index.java:12-24, IndexRepository.java:28-37) — fine for 64
pages, hopeless at 10^12 turns. Here each term's posting list is packed
into ≤BLOCK_SIZE-posting blocks:

    doc_ids : varbyte(delta(sorted doc_ids))       (binary)
    scores  : float64 LE array of BM25 weights      (binary)
    block_max_score, first_doc, last_doc            (pruning metadata)

Doc-space is range-bucketed (bucket = doc_id // DOC_BUCKET_WIDTH) BEFORE
the per-term grouping, so a Zipf-head term's postings are split across
buckets and no single applyInPandas group can exceed
DOC_BUCKET_WIDTH postings — bounded executor memory at any scale (the
skew story for the encode stage; the aggregation skew story is
index_build.term_df_salted). Blocks never span buckets; block-max WAND
correctness only needs (first_doc, last_doc, block_max) per block, which
bucketing preserves.

Encode/decode are numpy-vectorized (no per-element Python in the varint
loop beyond the ≤10-round byte-peel, each round a whole-array op).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import (
    BLOCK_SIZE,
    BM25_B,
    BM25_K1,
    DOC_BUCKET_WIDTH,
)
from search_engine_spark.operators.index_build import (
    CorpusStats,
    InvertedIndex,
    bm25_weight_col,
    idf_col,
)

SEGMENT_SCHEMA = (
    "term_id long, bucket long, block_id int, doc_count int, "
    "first_doc long, last_doc long, block_max_score double, "
    "doc_ids binary, scores binary"
)


# ---------------------------------------------------------------------------
# varbyte codec (numpy-vectorized)
# ---------------------------------------------------------------------------
def varbyte_encode(values: np.ndarray) -> bytes:
    """LEB128-style varbyte: 7 payload bits/byte, high bit = continuation."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    with np.errstate(over="ignore"):
        # bytes needed per value: ceil(bit_length/7), min 1
        nbytes = np.ones(v.size, dtype=np.int64)
        tmp = v >> np.uint64(7)
        while tmp.any():
            nbytes += (tmp > 0)
            tmp >>= np.uint64(7)
        total = int(nbytes.sum())
        out = np.empty(total, dtype=np.uint8)
        ends = np.cumsum(nbytes)
        starts = ends - nbytes
        rest = v.copy()
        offset = np.zeros(v.size, dtype=np.int64)
        alive = np.ones(v.size, dtype=bool)
        while alive.any():
            pos = starts[alive] + offset[alive]
            byte = (rest[alive] & np.uint64(0x7F)).astype(np.uint8)
            more = offset[alive] + 1 < nbytes[alive]
            out[pos] = byte | (more.astype(np.uint8) << 7)
            rest[alive] >>= np.uint64(7)
            offset[alive] += 1
            alive = offset < nbytes
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Inverse of :func:`varbyte_encode` → uint64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0
    value_idx = np.cumsum(np.concatenate(([True], is_last[:-1])))  # 1-based id per byte
    n_values = int(is_last.sum())
    # position of each byte within its value
    first_byte_pos = np.flatnonzero(np.concatenate(([True], is_last[:-1])))
    byte_in_value = np.arange(raw.size) - first_byte_pos[value_idx - 1]
    with np.errstate(over="ignore"):
        contrib = (raw & 0x7F).astype(np.uint64) << (np.uint64(7) * byte_in_value.astype(np.uint64))
    out = np.zeros(n_values, dtype=np.uint64)
    np.add.at(out, value_idx - 1, contrib)
    return out


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    d = np.asarray(sorted_ids, dtype=np.uint64)
    out = d.copy()
    out[1:] = d[1:] - d[:-1]
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.uint64), dtype=np.uint64)


def encode_block(doc_ids: np.ndarray, scores: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted doc_ids, aligned float64 scores) → (docs varbyte, raw scores)."""
    return varbyte_encode(delta_encode(doc_ids)), np.asarray(scores, dtype=np.float64).tobytes()


def decode_block(doc_bytes: bytes, score_bytes: bytes) -> tuple[np.ndarray, np.ndarray]:
    return (
        delta_decode(varbyte_decode(doc_bytes)).astype(np.int64),
        np.frombuffer(score_bytes, dtype=np.float64),
    )


# ---------------------------------------------------------------------------
# Segment build (applyInPandas per (term_id, bucket))
# ---------------------------------------------------------------------------
def scored_postings(index: InvertedIndex) -> DataFrame:
    """postings + doclen + terms → (term_id, doc_id, score) with the BM25
    per-posting weight computed ONCE, JVM-side, with the exact same
    column expression the DataFrame scorer uses (rank-identity by
    construction; SURVEY.md §7 hard-part (b))."""
    stats = index.stats
    terms_b = F.broadcast(
        index.terms.withColumn(
            "_idf", idf_col(F.col("df").cast("double"), stats.n_docs)
        ).select("lemma", "term_id", "_idf")
    )
    return (
        index.postings.join(index.doclen, "doc_id")
        .join(terms_b, "lemma")
        .select(
            "term_id",
            "doc_id",
            bm25_weight_col(
                F.col("tf").cast("double"), F.col("dl").cast("double"),
                F.col("_idf"), stats.avgdl, BM25_K1, BM25_B,
            ).alias("score"),
        )
    )


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    term_id = int(pdf["term_id"].iloc[0])
    bucket = int(pdf["bucket"].iloc[0])
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
    scores = pdf["score"].to_numpy()[order].astype(np.float64)
    rows = []
    for b0 in range(0, len(doc_ids), BLOCK_SIZE):
        d = doc_ids[b0 : b0 + BLOCK_SIZE]
        s = scores[b0 : b0 + BLOCK_SIZE]
        docs_b, scores_b = encode_block(d.astype(np.uint64), s)
        rows.append(
            (
                term_id,
                bucket,
                b0 // BLOCK_SIZE,
                len(d),
                int(d[0]),
                int(d[-1]),
                float(s.max()),
                docs_b,
                scores_b,
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "term_id", "bucket", "block_id", "doc_count", "first_doc",
            "last_doc", "block_max_score", "doc_ids", "scores",
        ],
    )


def build_segments(
    index: InvertedIndex, bucket_width: int = DOC_BUCKET_WIDTH
) -> DataFrame:
    """Compressed segment blocks for the whole index.

    One shuffle: groupBy(term_id, bucket). Group size ≤ bucket_width
    postings regardless of term hotness."""
    sp = scored_postings(index).withColumn(
        "bucket", (F.col("doc_id") / F.lit(bucket_width)).cast("long")
    )
    return sp.groupBy("term_id", "bucket").applyInPandas(_encode_group, SEGMENT_SCHEMA)


def decode_segments_pd(segment_rows: pd.DataFrame) -> pd.DataFrame:
    """Utility: blocks → exploded (term_id, doc_id, score) pandas frame
    (tests/round-trip verification)."""
    parts = []
    for r in segment_rows.itertuples(index=False):
        docs, scores = decode_block(r.doc_ids, r.scores)
        parts.append(pd.DataFrame({"term_id": r.term_id, "doc_id": docs, "score": scores}))
    if not parts:
        return pd.DataFrame(columns=["term_id", "doc_id", "score"])
    return pd.concat(parts, ignore_index=True)
