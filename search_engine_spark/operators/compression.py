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
def varbyte_encode_with_lengths(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-style varbyte of a whole array at once; returns
    (byte buffer as uint8 array, per-value byte count) so callers can
    slice the buffer at arbitrary value boundaries (block splitting
    without re-encoding)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    with np.errstate(over="ignore"):
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
    return out, nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """LEB128-style varbyte: 7 payload bits/byte, high bit = continuation."""
    return varbyte_encode_with_lengths(values)[0].tobytes()


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
    """postings + terms → (term_id, doc_id, score) with the BM25
    per-posting weight computed ONCE, JVM-side, with the exact same
    column expression the DataFrame scorer uses (rank-identity by
    construction; SURVEY.md §7 hard-part (b)). Doc length comes from the
    dl column the build attached to every posting — no doclen join."""
    stats = index.stats
    terms_b = F.broadcast(
        index.terms.withColumn(
            "_idf", idf_col(F.col("df").cast("double"), stats.n_docs)
        ).select("lemma", "term_id", "_idf")
    )
    return (
        index.postings
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


_SEG_COLUMNS = [
    "term_id", "bucket", "block_id", "doc_count", "first_doc",
    "last_doc", "block_max_score", "doc_ids", "scores",
]


def _encode_sorted_run(
    term_ids: np.ndarray,
    buckets: np.ndarray,
    doc_ids: np.ndarray,
    scores: np.ndarray,
) -> pd.DataFrame:
    """Encode a run of postings sorted by (term_id, bucket, doc_id) —
    possibly MANY (term,bucket) groups — into block rows, fully
    numpy-vectorized: one varbyte pass over the whole run, then blocks
    are byte-range slices of that single buffer.

    Delta chains restart at every block start (each block's first value
    is the absolute doc_id), so slicing at block boundaries yields
    exactly the bytes :func:`encode_block` would have produced and
    :func:`decode_block` round-trips each block independently.
    """
    n = doc_ids.size
    if n == 0:
        return pd.DataFrame({c: [] for c in _SEG_COLUMNS})
    change = (term_ids[1:] != term_ids[:-1]) | (buckets[1:] != buckets[:-1])
    group_starts = np.flatnonzero(np.concatenate(([True], change)))
    group_id = np.cumsum(np.concatenate(([0], change.astype(np.int64))))
    idx_in_group = np.arange(n, dtype=np.int64) - group_starts[group_id]
    block_starts = np.flatnonzero(idx_in_group % BLOCK_SIZE == 0)
    block_ends = np.concatenate((block_starts[1:], [n]))

    d64 = doc_ids.astype(np.uint64)
    deltas = d64.copy()
    deltas[1:] -= d64[:-1]
    deltas[block_starts] = d64[block_starts]  # absolute at block start
    buf, nbytes = varbyte_encode_with_lengths(deltas)
    byte_off = np.concatenate(([0], np.cumsum(nbytes)))

    block_max = np.maximum.reduceat(scores, block_starts)
    buf_bytes = buf.tobytes()
    scores64 = np.ascontiguousarray(scores, dtype=np.float64)
    sbytes = scores64.tobytes()

    rows = {
        "term_id": term_ids[block_starts],
        "bucket": buckets[block_starts],
        "block_id": (idx_in_group[block_starts] // BLOCK_SIZE).astype(np.int32),
        "doc_count": (block_ends - block_starts).astype(np.int32),
        "first_doc": doc_ids[block_starts],
        "last_doc": doc_ids[block_ends - 1],
        "block_max_score": block_max,
        "doc_ids": [
            buf_bytes[byte_off[s] : byte_off[e]]
            for s, e in zip(block_starts, block_ends)
        ],
        "scores": [
            sbytes[8 * s : 8 * e] for s, e in zip(block_starts, block_ends)
        ],
    }
    return pd.DataFrame(rows)


def _encode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: encode a whole sorted partition, carrying the
    trailing (possibly batch-split) group over between Arrow batches so
    no group is ever encoded twice. ONE Python call per Arrow batch —
    not per (term,bucket) group (the applyInPandas-per-group version was
    measured 6× slower on 385k small groups)."""
    pend: pd.DataFrame | None = None
    for pdf in batches:
        if pend is not None:
            pdf = pd.concat([pend, pdf], ignore_index=True)
            pend = None
        if pdf.empty:
            continue
        t = pdf["term_id"].to_numpy()
        b = pdf["bucket"].to_numpy()
        change = (t[1:] != t[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(np.concatenate(([True], change)))
        if starts.size <= 1:
            pend = pdf  # whole batch is one (possibly incomplete) group
            continue
        cut = int(starts[-1])
        head = pdf.iloc[:cut]
        pend = pdf.iloc[cut:].reset_index(drop=True)
        yield _encode_sorted_run(
            head["term_id"].to_numpy(np.int64),
            head["bucket"].to_numpy(np.int64),
            head["doc_id"].to_numpy(np.int64),
            head["score"].to_numpy(np.float64),
        )
    if pend is not None and not pend.empty:
        yield _encode_sorted_run(
            pend["term_id"].to_numpy(np.int64),
            pend["bucket"].to_numpy(np.int64),
            pend["doc_id"].to_numpy(np.int64),
            pend["score"].to_numpy(np.float64),
        )


def build_segments(
    index: InvertedIndex,
    bucket_width: int = DOC_BUCKET_WIDTH,
    num_partitions: int | None = None,
) -> DataFrame:
    """Compressed segment blocks for the whole index.

    One shuffle: hash-repartition on (term_id, bucket) + in-partition
    sort — the exact layout applyInPandas would shuffle to, but encoded
    via mapInPandas so the Python boundary is crossed once per Arrow
    batch instead of once per group. Group size stays ≤ bucket_width
    postings regardless of term hotness (bounded memory at any scale);
    a group never spans partitions because the partitioner hashes the
    full (term_id, bucket) key."""
    sp = scored_postings(index).withColumn(
        "bucket", (F.col("doc_id") / F.lit(bucket_width)).cast("long")
    )
    if num_partitions is None:
        # 4 waves/core: small-enough tasks that stragglers don't idle
        # the tail of the stage (2/core measurably lost ~15% to skew)
        num_partitions = sp.sparkSession.sparkContext.defaultParallelism * 4
    shaped = (
        sp.repartition(num_partitions, "term_id", "bucket")
        .sortWithinPartitions("term_id", "bucket", "doc_id")
    )
    return shaped.mapInPandas(_encode_partition, SEGMENT_SCHEMA)


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
