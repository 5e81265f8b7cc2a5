"""Compressed posting segments: docID-delta + varbyte/PForDelta blocks
carrying raw (tf, dl) with per-block (max_tf, min_dl) pruning metadata
(north_star physical layout: "varbyte/PForDelta compressed").

The reference materializes one posting ROW per (term, doc) in a
PostgreSQL ``index`` table with B-tree indexes (reference
entity/Index.java:12-24, IndexRepository.java:28-37) — fine for 64
pages, hopeless at 10^12 turns. Here each term's posting list is packed
into ≤BLOCK_SIZE-posting blocks:

    doc_ids : codec(delta(sorted doc_ids))          (binary, tagged)
    tfs     : codec(term frequencies)               (binary, tagged)
    dls     : codec(doc lengths)                    (binary, tagged)
    block_max_tf, block_min_dl, first_doc, last_doc (pruning metadata)

Every payload buffer is SELF-DESCRIBING: byte 0 is a codec tag —
``0x00`` varbyte (LEB128), ``0x01`` PForDelta (fixed-width bit packing
of the low ``w`` bits of every value + patched exceptions carrying the
high bits, NewPFD-style). The encoder prices both codecs per block and
keeps the smaller buffer (``codec="auto"``): tf/dl values are tiny
(2-5 bits), so packing beats varbyte's 8-bit floor ~2-3×, while sparse
terms' large doc deltas stay varbyte. Exception patching also absorbs
the absolute doc_id that restarts each block's delta chain (one 20-40
bit outlier must not widen the whole block). Width selection prices two
candidates per block — max bit length (zero exceptions) and the 90th
percentile (NewPFD's ≤10%-exceptions rule) — exactly, then takes the
cheaper; packing is batched across blocks GROUPED BY WIDTH so the
encode stays numpy-vectorized (no per-block packing calls).

Blocks are keyed by ``term_key = xxhash64(lemma)`` and store RAW tf/dl,
not precomputed BM25 weights — a round-2 redesign with three wins:

1. **No dictionary join in the build.** Scoring needs idf(df)/avgdl;
   storing tf/dl instead defers that to query time, so segment encode
   is a single self-contained pass over the postings stream (the
   broadcast-join probe on the lemma string cost ~5s/13s at 8/2 pinned
   cores and capped scaling). At 100 TB a 100M-term dictionary could
   not be broadcast at all; xxhash64 keys need no dictionary ever
   (collision odds ~(V^2)/2^64 — negligible at any realistic vocab).
2. **Stats-independent segments.** df/avgdl drift (e.g. single-doc
   re-index, sources/index_store.reindex_turn) never stales block
   contents — the authoritative dictionary is consulted per query.
3. **Smaller blocks.** tf+dl varbytes are ~2-3 bytes/posting vs 8-byte
   float64 weights.

Per-term BM25 weights are computed at query time in numpy with the
EXACT operation order of index_build.bm25_weight_col and idf doubles
collected from the JVM (bit-identical float64 — np.log and Math.log
differ in the last ulp, so idf is never recomputed Python-side); the
block upper bound is idf·f(max_tf, min_dl), valid because the weight is
monotone increasing in tf and decreasing in dl.

Doc-space is range-bucketed (bucket = doc_id // DOC_BUCKET_WIDTH) so a
Zipf-head term's postings split across buckets and no encode group can
exceed DOC_BUCKET_WIDTH postings — bounded executor memory at any scale
(the skew story for the encode stage; the aggregation skew story is
index_build.term_df_salted). Blocks never span buckets.

Two encode strategies, identical decoded content (differential-tested):
- colocated (default): ZERO shuffle — postings arrive doc-ordered from
  the build, buckets are doc ranges, so each scan task encodes whole
  buckets in one numeric-only mapInPandas pass.
- shuffled: (term_key, bucket) exchange + sort, for inputs without doc
  order.

Encode/decode are numpy-vectorized (no per-element Python in the varint
loop beyond the ≤10-round byte-peel, each round a whole-array op).
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import partial

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
    InvertedIndex,
)

SEGMENT_SCHEMA = (
    "term_key long, bucket long, block_id int, doc_count int, "
    "first_doc long, last_doc long, block_max_tf int, block_min_dl int, "
    "doc_ids binary, tfs binary, dls binary"
)


def term_key_col(lemma_col: str | F.Column = "lemma") -> F.Column:
    """64-bit segment key for a lemma — the same xxhash64 both the build
    and the query side compute (seed 42, Spark default)."""
    return F.xxhash64(lemma_col)


def bm25_scores_np(
    tfs: np.ndarray,
    dls: np.ndarray,
    idf: float,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> np.ndarray:
    """numpy twin of index_build.bm25_weight_col — IDENTICAL operation
    order, so float64 results are bit-equal to the DataFrame engine's
    given the same (JVM-computed) idf."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))


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
        nbytes = _varbyte_size(_bit_lengths(v))
        if v.max() < 128:
            # single-byte fast path (tf columns and most delta blocks):
            # byte == value, no continuation bit, no gather/repeat pass
            return v.astype(np.uint8), nbytes
        ends = np.cumsum(nbytes)
        starts = ends - nbytes
        total = int(ends[-1])
        # byte-parallel: one gather per OUTPUT byte (value id + byte slot),
        # then a single shift/mask — no masked while-loop over byte slots
        # (the old formulation re-scanned and fancy-assigned full-size
        # temporaries per iteration; 5-7x slower and 3x the DRAM traffic,
        # which is the scarce resource on this host)
        vidx = np.repeat(np.arange(v.size, dtype=np.int64), nbytes)
        bin_ = (np.arange(total, dtype=np.int64) - np.repeat(starts, nbytes)).astype(
            np.uint64
        )
        out = ((v[vidx] >> (np.uint64(7) * bin_)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (bin_ + np.uint64(1)) < nbytes[vidx].astype(np.uint64)
        out |= cont.astype(np.uint8) << 7
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


# ---------------------------------------------------------------------------
# PForDelta codec (per-block fixed-width packing + patched exceptions)
# ---------------------------------------------------------------------------
TAG_VARBYTE = 0x00
TAG_PFOR = 0x01

# powers[k] = 2^k; bit_length(v) = searchsorted(powers, v, 'right')
_POW2 = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def _bit_lengths(v: np.ndarray) -> np.ndarray:
    """Per-value bit length (0 for value 0), vectorized."""
    return np.searchsorted(_POW2, v, side="right").astype(np.int64)


def _varbyte_size(nbits: np.ndarray) -> np.ndarray:
    """Varbyte byte count for values of the given bit lengths."""
    return np.maximum((nbits + 6) // 7, 1)


def _varbyte_scalar(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        out.append(b | (0x80 if x else 0))
        if not x:
            return bytes(out)


def _read_varbyte(buf: bytes, pos: int) -> tuple[int, int]:
    out, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not (b & 0x80):
            return out, pos
        shift += 7


def _pack_width_group(vals_low: np.ndarray, sizes: np.ndarray, w: int):
    """Bit-pack the concatenated low-``w``-bit values of several blocks,
    each block padded to a byte boundary so its packed bytes slice out
    independently. Returns (bytes, per-block byte offsets)."""
    packed_bytes = (sizes * w + 7) // 8
    byte_off = np.concatenate(([0], np.cumsum(packed_bytes)))
    if w == 0 or vals_low.size == 0:
        return b"", byte_off
    # value-major / bit-minor flat bit stream via unpackbits on the
    # little-endian uint64 byte view (bit k of the value IS bit k of the
    # LE byte stream): ~100x faster than a broadcast shift matrix, which
    # materializes (n, w) uint64 temporaries. Within a block the packed
    # bits are CONTIGUOUS (padding only at block tails), so packing is a
    # per-block packbits over a contiguous slice — no giant int64 index
    # matrix + scatter (8x the bit matrix in DRAM traffic, the old cost)
    le_bytes = np.ascontiguousarray(vals_low.astype("<u8", copy=False)).view(np.uint8)
    flat = np.unpackbits(
        le_bytes.reshape(-1, 8), axis=1, bitorder="little", count=w
    ).ravel()
    starts = np.concatenate(([0], np.cumsum(sizes)))
    out = np.empty(int(byte_off[-1]), dtype=np.uint8)
    for i in range(len(sizes)):
        seg = flat[starts[i] * w: starts[i + 1] * w]
        out[byte_off[i]: byte_off[i + 1]] = np.packbits(seg, bitorder="little")
    return out.tobytes(), byte_off


def _pfor_cost(
    n: np.ndarray,
    w: np.ndarray,
    nb: np.ndarray,
    block_of_value: np.ndarray,
    idx_in_block: np.ndarray,
) -> np.ndarray:
    """Exact per-block PFor buffer size in bytes for candidate widths
    ``w`` (one per block): tag + varbyte(n) + width byte + packed bits +
    varbyte(n_exc) + exception positions + exception high bits."""
    n_blocks = n.size
    wv = w[block_of_value]
    exc = nb > wv
    bexc = block_of_value[exc]
    n_exc = np.bincount(bexc, minlength=n_blocks)
    if n.size == 0 or int(n.max()) <= 128:
        # ≤128-value blocks (the BLOCK_SIZE invariant): every exception
        # position fits one varbyte byte — exact, no per-value pricing pass
        pos_bytes = n_exc
    else:
        pos_bytes = np.bincount(
            bexc,
            weights=_varbyte_size(_bit_lengths(idx_in_block[exc].astype(np.uint64))),
            minlength=n_blocks,
        ).astype(np.int64)
    high_bytes = np.bincount(
        bexc,
        weights=(nb[exc] - wv[exc] + 6) // 7,
        minlength=n_blocks,
    ).astype(np.int64)
    return (
        1
        + _varbyte_size(_bit_lengths(n.astype(np.uint64)))
        + 1
        + (n * w + 7) // 8
        + _varbyte_size(_bit_lengths(n_exc.astype(np.uint64)))
        + pos_bytes
        + high_bytes
    )


def encode_payload_blocks(
    v: np.ndarray,
    block_starts: np.ndarray,
    block_ends: np.ndarray,
    codec: str | None = None,
) -> list[bytes]:
    """Encode value runs ``v[s:e]`` per block into tagged payload buffers,
    choosing the cheaper of varbyte and PForDelta per block
    (``codec="auto"``). Fully batched, and priced WITHOUT encoding: both
    codec sizes are closed-form from per-value bit lengths, so only the
    winning codec's bytes are ever materialized per block (the old path
    paid a full varbyte pass + an O(n log n) value sort up front — the
    1.5x encode overhead the round-2 bench flagged)."""
    if codec is None:
        from search_engine_spark.config import SEGMENT_CODEC

        codec = SEGMENT_CODEC
    v = np.asarray(v, dtype=np.uint64)
    n_blocks = len(block_starts)
    sizes = (block_ends - block_starts).astype(np.int64)
    if codec == "varbyte" or v.size == 0:
        vbuf, vnbytes = varbyte_encode_with_lengths(v)
        voff = np.concatenate(([0], np.cumsum(vnbytes)))
        vbytes = vbuf.tobytes()
        return [
            b"\x00" + vbytes[voff[s]: voff[e]]
            for s, e in zip(block_starts, block_ends)
        ]

    nb = _bit_lengths(v)
    # varbyte size is closed-form from bit lengths — price it, don't encode
    voff = np.concatenate(([0], np.cumsum(_varbyte_size(nb))))
    vb_sizes = voff[block_ends] - voff[block_starts]
    ar = np.arange(v.size, dtype=np.int64)
    bs = np.asarray(block_starts, dtype=np.int64)
    be = np.asarray(block_ends, dtype=np.int64)
    tiled = (
        int(bs[0]) == 0
        and int(be[-1]) == v.size
        and np.array_equal(bs[1:], be[:-1])
    )
    if tiled:
        block_of_value = np.repeat(np.arange(n_blocks, dtype=np.int64), sizes)
    else:
        block_of_value = np.searchsorted(bs, ar, side="right") - 1
    idx_in_block = ar - bs[block_of_value]
    # candidate 1: max bit length (pure FOR, zero exceptions) — cost is
    # closed-form (no exception streams to price), skip the generic pass
    w_hi = np.maximum.reduceat(nb, block_starts)
    # candidate 2: 90th-percentile bit length (NewPFD ≤10% exceptions),
    # via per-block bit-length histograms (O(n + 65·blocks)) instead of
    # sorting every value (O(n log n) lexsort, the old hot spot)
    hist = np.bincount(
        block_of_value * 65 + nb, minlength=n_blocks * 65
    ).reshape(n_blocks, 65)
    rank = (9 * (sizes - 1)) // 10 + 1  # 1-based rank of the percentile value
    w_90 = (np.cumsum(hist, axis=1) < rank[:, None]).sum(axis=1)
    cost_hi = (
        1
        + _varbyte_size(_bit_lengths(sizes.astype(np.uint64)))
        + 1
        + (sizes * w_hi + 7) // 8
        + 1  # varbyte(n_exc = 0)
    )
    cost_90 = _pfor_cost(sizes, w_90, nb, block_of_value, idx_in_block)
    w_sel = np.where(cost_90 < cost_hi, w_90, w_hi)
    cost_pfor = np.minimum(cost_hi, cost_90)
    use_pfor = cost_pfor < (vb_sizes + 1)

    out: list[bytes | None] = [None] * n_blocks
    pidx = np.flatnonzero(use_pfor)
    if pidx.size:
        wv = np.where(use_pfor, w_sel, 64)[block_of_value]
        in_pfor = use_pfor[block_of_value]
        # exception streams (global order = (block, position) ascending)
        exc = in_pfor & (nb > wv)
        n_exc = np.bincount(block_of_value[exc], minlength=n_blocks)
        pos_buf, pos_len = varbyte_encode_with_lengths(
            idx_in_block[exc].astype(np.uint64)
        )
        high_buf, high_len = varbyte_encode_with_lengths(
            v[exc] >> wv[exc].astype(np.uint64)
        )
        pos_bytes_all, high_bytes_all = pos_buf.tobytes(), high_buf.tobytes()
        exc_cnt_cum = np.concatenate(([0], np.cumsum(n_exc)))
        pos_off = np.concatenate(([0], np.cumsum(pos_len)))
        high_off = np.concatenate(([0], np.cumsum(high_len)))

        for w in np.unique(w_sel[pidx]):
            w = int(w)
            bidx = pidx[w_sel[pidx] == w]
            sel_vals_mask = in_pfor & (w_sel[block_of_value] == w)
            low = v[sel_vals_mask]
            if w < 64:
                low = low & ((np.uint64(1) << np.uint64(w)) - np.uint64(1))
            packed, byte_off = _pack_width_group(low, sizes[bidx], w)
            hdr_w = bytes([w])
            for i, j in enumerate(bidx):
                e0, e1 = exc_cnt_cum[j], exc_cnt_cum[j + 1]
                out[j] = (
                    b"\x01"
                    + _varbyte_scalar(int(sizes[j]))
                    + hdr_w
                    + packed[byte_off[i]: byte_off[i + 1]]
                    + _varbyte_scalar(int(n_exc[j]))
                    + pos_bytes_all[pos_off[e0]: pos_off[e1]]
                    + high_bytes_all[high_off[e0]: high_off[e1]]
                )
    vb_blocks = np.flatnonzero(~use_pfor)
    if vb_blocks.size:
        if tiled:
            # one varbyte pass over ONLY the losing blocks' values
            vbuf_sub, vnb_sub = varbyte_encode_with_lengths(
                v[~use_pfor[block_of_value]]
            )
            sub_off = np.concatenate(([0], np.cumsum(vnb_sub)))
            sub_ends = np.cumsum(sizes[vb_blocks])
            sub_starts = sub_ends - sizes[vb_blocks]
            vb_bytes = vbuf_sub.tobytes()
            for k, j in enumerate(vb_blocks):
                out[j] = (
                    b"\x00" + vb_bytes[sub_off[sub_starts[k]]: sub_off[sub_ends[k]]]
                )
        else:
            for j in vb_blocks:
                out[j] = b"\x00" + varbyte_encode(v[bs[j]: be[j]])
    return out  # type: ignore[return-value]


def encode_payload(values: np.ndarray, codec: str | None = None) -> bytes:
    """Single-block convenience wrapper over :func:`encode_payload_blocks`."""
    v = np.asarray(values, dtype=np.uint64)
    return encode_payload_blocks(
        v, np.array([0], dtype=np.int64), np.array([v.size], dtype=np.int64),
        codec,
    )[0]


def decode_payload(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_payload` — dispatches on the tag byte."""
    if len(buf) == 0:
        return np.empty(0, dtype=np.uint64)
    tag = buf[0]
    if tag == TAG_VARBYTE:
        return varbyte_decode(buf[1:])
    if tag != TAG_PFOR:
        raise ValueError(f"unknown payload codec tag {tag:#x}")
    n, pos = _read_varbyte(buf, 1)
    w = buf[pos]
    pos += 1
    nb_packed = (n * w + 7) // 8
    if w:
        packed = np.frombuffer(buf, dtype=np.uint8, count=nb_packed, offset=pos)
        bits = np.unpackbits(packed, count=n * w, bitorder="little")
        # repack each value's w bits into a 64-bit lane and view as LE
        # uint64 — no (n, w) uint64 multiply matrix (8x the temporaries)
        lanes = np.zeros((n, 64), dtype=np.uint8)
        lanes[:, :w] = bits.reshape(n, w)
        vals = (
            np.packbits(lanes, axis=1, bitorder="little")
            .view("<u8")
            .ravel()
            .astype(np.uint64, copy=False)
        )
    else:
        vals = np.zeros(n, dtype=np.uint64)
    pos += nb_packed
    n_exc, pos = _read_varbyte(buf, pos)
    if n_exc:
        rest = varbyte_decode(buf[pos:])
        positions = rest[:n_exc].astype(np.int64)
        vals[positions] |= rest[n_exc:] << np.uint64(w)
    return vals


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    d = np.asarray(sorted_ids, dtype=np.uint64)
    out = d.copy()
    out[1:] = d[1:] - d[:-1]
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.uint64), dtype=np.uint64)


def encode_block(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray
) -> tuple[bytes, bytes, bytes]:
    """(sorted doc_ids, aligned tfs, aligned dls) → tagged payload
    buffers (docs codec-of-deltas, tfs codec, dls codec)."""
    return (
        encode_payload(delta_encode(doc_ids)),
        encode_payload(np.asarray(tfs, dtype=np.uint64)),
        encode_payload(np.asarray(dls, dtype=np.uint64)),
    )


def decode_block(
    doc_bytes: bytes, tf_bytes: bytes, dl_bytes: bytes
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    return (
        delta_decode(decode_payload(doc_bytes)).astype(np.int64),
        decode_payload(tf_bytes).astype(np.int64),
        decode_payload(dl_bytes).astype(np.int64),
    )


# ---------------------------------------------------------------------------
# Segment build
# ---------------------------------------------------------------------------
def keyed_postings(index: InvertedIndex) -> DataFrame:
    """postings → (term_key, doc_id, tf, dl), all numeric, no join —
    the encode input stream. xxhash64 is codegen'd JVM-side; nothing
    else is computed here (scores are a query-time concern)."""
    return index.postings.select(
        term_key_col("lemma").alias("term_key"),
        "doc_id",
        F.col("tf").cast("int").alias("tf"),
        F.col("dl").cast("int").alias("dl"),
    )


_SEG_COLUMNS = [
    "term_key", "bucket", "block_id", "doc_count", "first_doc",
    "last_doc", "block_max_tf", "block_min_dl", "doc_ids", "tfs", "dls",
]


def _encode_sorted_run(
    term_keys: np.ndarray,
    buckets: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    codec: str | None = None,
) -> pd.DataFrame:
    """Encode a run of postings sorted by (term_key, bucket, doc_id) —
    possibly MANY (term,bucket) groups — into block rows, fully
    numpy-vectorized: per-payload batched codec passes over the whole
    run (varbyte slicing + width-grouped PFor packing,
    :func:`encode_payload_blocks`).

    Delta chains restart at every block start (each block's first value
    is the absolute doc_id), so every block payload is exactly the bytes
    :func:`encode_block` would have produced and :func:`decode_block`
    round-trips each block independently.
    """
    n = doc_ids.size
    if n == 0:
        return pd.DataFrame({c: [] for c in _SEG_COLUMNS})
    change = (term_keys[1:] != term_keys[:-1]) | (buckets[1:] != buckets[:-1])
    group_starts = np.flatnonzero(np.concatenate(([True], change)))
    group_id = np.cumsum(np.concatenate(([0], change.astype(np.int64))))
    idx_in_group = np.arange(n, dtype=np.int64) - group_starts[group_id]
    block_starts = np.flatnonzero(idx_in_group % BLOCK_SIZE == 0)
    block_ends = np.concatenate((block_starts[1:], [n]))

    d64 = doc_ids.astype(np.uint64)
    deltas = d64.copy()
    deltas[1:] -= d64[:-1]
    deltas[block_starts] = d64[block_starts]  # absolute at block start

    block_max_tf = np.maximum.reduceat(tfs, block_starts)
    block_min_dl = np.minimum.reduceat(dls, block_starts)

    rows = {
        "term_key": term_keys[block_starts],
        "bucket": buckets[block_starts],
        "block_id": (idx_in_group[block_starts] // BLOCK_SIZE).astype(np.int32),
        "doc_count": (block_ends - block_starts).astype(np.int32),
        "first_doc": doc_ids[block_starts],
        "last_doc": doc_ids[block_ends - 1],
        "block_max_tf": block_max_tf.astype(np.int32),
        "block_min_dl": block_min_dl.astype(np.int32),
        "doc_ids": encode_payload_blocks(deltas, block_starts, block_ends, codec),
        "tfs": encode_payload_blocks(
            tfs.astype(np.uint64), block_starts, block_ends, codec
        ),
        "dls": encode_payload_blocks(
            dls.astype(np.uint64), block_starts, block_ends, codec
        ),
    }
    return pd.DataFrame(rows)


def _run_from_pdf(
    pdf: pd.DataFrame,
    order: np.ndarray | None = None,
    codec: str | None = None,
) -> pd.DataFrame:
    cols = (
        pdf["term_key"].to_numpy(np.int64),
        pdf["bucket"].to_numpy(np.int64),
        pdf["doc_id"].to_numpy(np.int64),
        pdf["tf"].to_numpy(np.int64),
        pdf["dl"].to_numpy(np.int64),
    )
    if order is not None:
        cols = tuple(c[order] for c in cols)
    return _encode_sorted_run(*cols, codec=codec)


def _encode_partition(
    batches: Iterator[pd.DataFrame], codec: str | None = None
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for the SHUFFLED strategy: encode a whole
    (term_key, bucket, doc_id)-sorted partition, carrying the trailing
    (possibly batch-split) group over between Arrow batches so no group
    is ever encoded twice. ONE Python call per Arrow batch — not per
    (term,bucket) group (the applyInPandas-per-group version was
    measured 6× slower on 385k small groups)."""
    pend: pd.DataFrame | None = None
    for pdf in batches:
        if pend is not None:
            pdf = pd.concat([pend, pdf], ignore_index=True)
            pend = None
        if pdf.empty:
            continue
        t = pdf["term_key"].to_numpy()
        b = pdf["bucket"].to_numpy()
        change = (t[1:] != t[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(np.concatenate(([True], change)))
        if starts.size <= 1:
            pend = pdf  # whole batch is one (possibly incomplete) group
            continue
        cut = int(starts[-1])
        head = pdf.iloc[:cut]
        pend = pdf.iloc[cut:].reset_index(drop=True)
        yield _run_from_pdf(head, codec=codec)
    if pend is not None and not pend.empty:
        yield _run_from_pdf(pend, codec=codec)


def build_segments(
    index: InvertedIndex,
    bucket_width: int = DOC_BUCKET_WIDTH,
    num_partitions: int | None = None,
    strategy: str = "colocated",
    codec: str | None = None,
) -> DataFrame:
    """Compressed segment blocks for the whole index.

    ``strategy="colocated"`` (default): zero-shuffle encode over the
    doc-ordered postings stream — see :func:`build_segments_colocated`.
    ``strategy="shuffled"``: the (term_key, bucket) exchange + sort
    variant (kept as the differential twin and for inputs that are not
    doc-ordered)."""
    if strategy == "colocated":
        return build_segments_colocated(index, bucket_width, codec=codec)
    return build_segments_shuffled(index, bucket_width, num_partitions, codec=codec)


def build_segments_shuffled(
    index: InvertedIndex,
    bucket_width: int = DOC_BUCKET_WIDTH,
    num_partitions: int | None = None,
    codec: str | None = None,
) -> DataFrame:
    """Shuffle-based segment build.

    One shuffle: hash-repartition on (term_key, bucket) + in-partition
    sort. Group size stays ≤ bucket_width postings regardless of term
    hotness (bounded memory at any scale); a group never spans
    partitions because the partitioner hashes the full key."""
    sp = keyed_postings(index).withColumn(
        "bucket", (F.col("doc_id") / F.lit(bucket_width)).cast("long")
    )
    if num_partitions is None:
        # 4 waves/core: small-enough tasks that stragglers don't idle
        # the tail of the stage (2/core measurably lost ~15% to skew)
        num_partitions = sp.sparkSession.sparkContext.defaultParallelism * 4
    shaped = (
        sp.repartition(num_partitions, "term_key", "bucket")
        .sortWithinPartitions("term_key", "bucket", "doc_id")
    )
    return shaped.mapInPandas(
        partial(_encode_partition, codec=codec), SEGMENT_SCHEMA
    )


# ---------------------------------------------------------------------------
# Zero-shuffle segment build (co-located encode over doc-ordered postings)
# ---------------------------------------------------------------------------
def build_segments_colocated(
    index: InvertedIndex,
    bucket_width: int = DOC_BUCKET_WIDTH,
    codec: str | None = None,
) -> DataFrame:
    """Compressed segment blocks with NO shuffle and NO join.

    The postings stream is already DOC-ORDERED (docs were range-sorted
    for id assignment and the per-doc term maps inherit that order), and
    a bucket IS a doc range — so each scan task holds whole buckets
    already: term_key hashing happens JVM-side, then per-bucket stable
    sort by term + block encode run inside ONE numeric-only mapInPandas
    pass. Per-flush memory is bounded by one bucket's postings (the same
    DOC_BUCKET_WIDTH bound the shuffled path guarantees).

    Layout differences vs the shuffled path are benign: a bucket whose
    doc range spans two scan splits emits two block runs for the same
    (term_key, bucket) — the WAND scorer merges blocks by doc range, not
    block_id, and decoded postings are identical (differential-tested).
    """
    width = bucket_width

    def encode(batches):
        import pyarrow as pa

        out_schema = pa.schema([
            ("term_key", pa.int64()), ("bucket", pa.int64()),
            ("block_id", pa.int32()), ("doc_count", pa.int32()),
            ("first_doc", pa.int64()), ("last_doc", pa.int64()),
            ("block_max_tf", pa.int32()), ("block_min_dl", pa.int32()),
            ("doc_ids", pa.binary()), ("tfs", pa.binary()),
            ("dls", pa.binary()),
        ])

        def to_np(batch: pa.RecordBatch) -> tuple[np.ndarray, ...]:
            # zero-copy for non-null int columns
            return tuple(
                batch.column(name).to_numpy(zero_copy_only=False)
                for name in ("term_key", "doc_id", "tf", "dl")
            )

        def emit(run: pd.DataFrame) -> pa.RecordBatch:
            return pa.RecordBatch.from_arrays(
                [pa.array(run[f.name], type=f.type) for f in out_schema],
                schema=out_schema,
            )

        def flush(chunks: list[tuple[np.ndarray, ...]]):
            if len(chunks) == 1:
                tk, doc, tf, dl = chunks[0]
            else:
                tk, doc, tf, dl = (
                    np.concatenate([c[i] for c in chunks]) for i in range(4)
                )
            if doc.size == 0:
                return
            buckets = doc // width
            # bucket runs are change-delimited (docs usually ascend, but
            # Spark may bin-pack file splits out of order — runs, not
            # sort positions, so correctness never assumes monotonicity)
            edges = np.flatnonzero(
                np.concatenate(([True], buckets[1:] != buckets[:-1]))
            )
            edges = np.concatenate((edges, [doc.size]))
            for s, e in zip(edges[:-1], edges[1:]):
                d = doc[s:e]
                if d.size > 1 and (d[1:] < d[:-1]).any():
                    # out-of-order run (packed splits): full (term, doc)
                    # lexsort; otherwise the cheap stable term sort keeps
                    # the existing doc order
                    order = np.lexsort((d, tk[s:e])) + s
                else:
                    order = np.argsort(tk[s:e], kind="stable") + s
                yield emit(_encode_sorted_run(
                    tk[order], buckets[order], doc[order],
                    tf[order].astype(np.int64), dl[order].astype(np.int64),
                    codec=codec,
                ))

        pend: list[tuple[np.ndarray, ...]] = []
        pend_bucket = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            cols = to_np(batch)
            db = cols[1] // width
            last_bucket = int(db[-1])
            # rows of the trailing bucket stay pending (the next batch
            # usually continues it); everything before is flushed
            not_last = db != last_bucket
            cut = int(np.flatnonzero(not_last).max() + 1) if not_last.any() else 0
            if pend and int(db[0]) != pend_bucket:
                yield from flush(pend)
                pend = []
            if cut > 0:
                yield from flush(pend + [tuple(c[:cut] for c in cols)])
                pend = []
            if cut < cols[1].size:
                pend.append(tuple(c[cut:] for c in cols))
                pend_bucket = last_bucket
        if pend:
            yield from flush(pend)

    # numeric-only stream into Python (no strings, no join, no pandas —
    # mapInArrow hands the worker zero-copy int columns); the scan order
    # survives projection, so no exchange is introduced
    return keyed_postings(index).mapInArrow(encode, SEGMENT_SCHEMA)


def decode_segments_pd(segment_rows: pd.DataFrame) -> pd.DataFrame:
    """Utility: blocks → exploded (term_key, doc_id, tf, dl) pandas frame
    (tests/round-trip verification)."""
    parts = []
    for r in segment_rows.itertuples(index=False):
        docs, tfs, dls = decode_block(r.doc_ids, r.tfs, r.dls)
        parts.append(pd.DataFrame({
            "term_key": r.term_key, "doc_id": docs, "tf": tfs, "dl": dls,
        }))
    if not parts:
        return pd.DataFrame(columns=["term_key", "doc_id", "tf", "dl"])
    return pd.concat(parts, ignore_index=True)
