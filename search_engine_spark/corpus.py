"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Produces the exact input_hint schema:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Every value is a pure function of (conv_index, turn_idx, slot) through a
splitmix64-style integer mix — NO wall-clock, NO RNG state — so the
corpus is byte-identical regardless of partition count, run order, or
parallelism level (a requirement for the resume + scaling tests).

Generation is distributed: ``spark.range(n_conv)`` fans conversations
across partitions; a ``mapInPandas`` stage expands each batch fully
vectorized in numpy (token sampling is one array op per batch, not a
Python loop per row). Token frequencies are Zipf-shaped (inverse-CDF
``V**u``) so a handful of hot terms exercise the skew-salting path, and
a suffix mix ('', -s, -ing, -ed, -ies) exercises the lemmatizer.

Reference analog: this replaces the reference's crawler as the document
source (reference Parser.java:258-382 built the ``page`` table by
crawling; our documents arrive as a table, per BASELINE.json input_hint).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
VOCAB_SIZE = 20_000
SUFFIXES = ("", "s", "ing", "ed", "ies")
ROLES = ("user", "assistant", "tool")
TOOLS = tuple(f"tool_{i:02d}" for i in range(12))
BASE_TS = np.datetime64("2025-01-01T00:00:00")

# Rare "needle" terms planted at known turns for top-k assertions
# (FIXTURES.md §3). Planted verbatim; they lemmatize to themselves.
NEEDLES = ("needlealpha", "needlebravo", "needlecharlie")
NEEDLE_CONV_STRIDE = 997  # conv indices ≡ 17 (mod stride) get a needle at turn 1

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _mix64(*parts: np.ndarray | int) -> np.ndarray:
    """Vectorized splitmix64-style mixer over uint64 arrays."""
    acc = np.uint64(SEED * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
    x = None
    with np.errstate(over="ignore"):
        for p in parts:
            arr = np.asarray(p, dtype=np.uint64)
            x = (arr + acc) if x is None else (x * np.uint64(0x9E3779B97F4A7C15) + arr + acc)
        x = x.astype(np.uint64, copy=False)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def _build_vocab() -> np.ndarray:
    """Deterministic vocabulary: stem × suffix, plus punctuation-bearing
    and mixed-case variants (tokenizer stress)."""
    idx = np.arange(VOCAB_SIZE, dtype=np.uint64)
    stems = np.array([f"w{i:05d}" for i in range(VOCAB_SIZE)], dtype=object)
    suff = np.array(SUFFIXES, dtype=object)[( _mix64(idx, 1) % len(SUFFIXES)).astype(np.int64)]
    words = stems + suff
    # every 97th vocab slot gets decoration the tokenizer must strip
    deco = (_mix64(idx, 2) % np.uint64(97)) == 0
    words[deco] = "X-" + words[deco]  # object-dtype elementwise concat
    return words


_VOCAB: np.ndarray | None = None


def _vocab() -> np.ndarray:
    global _VOCAB
    if _VOCAB is None:
        _VOCAB = _build_vocab()
    return _VOCAB


def turns_for_conv(conv_idx: np.ndarray) -> np.ndarray:
    """2..40 turns per conversation, hash-derived (FIXTURES.md)."""
    return (2 + (_mix64(conv_idx, 3) % np.uint64(39))).astype(np.int64)


def _generate_batch(conv_idx: np.ndarray) -> pd.DataFrame:
    vocab = _vocab()
    n_turns_per = turns_for_conv(conv_idx)
    conv_rep = np.repeat(conv_idx, n_turns_per)
    # turn_idx = positional index within each conversation
    total_turns = int(n_turns_per.sum())
    ends = np.cumsum(n_turns_per)
    starts = ends - n_turns_per
    turn_idx = np.arange(total_turns, dtype=np.int64) - np.repeat(starts, n_turns_per)

    # tokens per turn: 5..120
    n_tok = (5 + (_mix64(conv_rep, turn_idx, 4) % np.uint64(116))).astype(np.int64)
    tok_ends = np.cumsum(n_tok)
    tok_starts = tok_ends - n_tok
    total_tok = int(tok_ends[-1]) if total_turns else 0
    tok_turn = np.repeat(np.arange(total_turns, dtype=np.int64), n_tok)
    slot = np.arange(total_tok, dtype=np.int64) - np.repeat(tok_starts, n_tok)

    # Zipf-ish rank via inverse CDF: rank = V**u, u uniform in [0,1)
    u = _mix64(conv_rep[tok_turn], turn_idx[tok_turn], slot + 7).astype(np.float64) / 2.0**64
    ranks = np.minimum((VOCAB_SIZE ** u).astype(np.int64), VOCAB_SIZE) - 1
    words = vocab[ranks]

    # join tokens into per-turn text
    text = pd.Series(words).groupby(tok_turn).agg(" ".join).to_numpy(dtype=object)

    # plant needles: conv ≡ 17 (mod stride), turn 1
    needle_mask = (conv_rep % NEEDLE_CONV_STRIDE == 17) & (turn_idx == 1)
    if needle_mask.any():
        which = (_mix64(conv_rep[needle_mask], 9) % np.uint64(len(NEEDLES))).astype(np.int64)
        planted = np.array(NEEDLES, dtype=object)[which]
        text[needle_mask] = text[needle_mask] + " " + planted

    role_i = ((turn_idx + (conv_rep % 3)) % 3).astype(np.int64)
    roles = np.array(ROLES, dtype=object)[role_i]
    tool = np.where(
        roles == "tool",
        np.array(TOOLS, dtype=object)[(_mix64(conv_rep, turn_idx, 5) % np.uint64(len(TOOLS))).astype(np.int64)],
        None,
    )
    ts = BASE_TS + (conv_rep * 1000 + turn_idx * 7).astype("timedelta64[s]")

    return pd.DataFrame(
        {
            "conv_id": pd.Series([f"conv-{i:08d}" for i in conv_rep], dtype=object),
            "turn_idx": turn_idx.astype(np.int32),
            "role": roles,
            "text": text,
            "tool": tool,
            "ts": pd.Series(ts),
        }
    )


def synthesize_transcripts(
    spark: SparkSession, n_conv: int, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic transcript table of ~n_conv*21 turns."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _generate_batch(pdf["id"].to_numpy(dtype=np.uint64))

    return (
        spark.range(0, n_conv, 1, partitions)
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )


def synthesize_transcripts_pd(n_conv: int) -> pd.DataFrame:
    """Single-node twin of :func:`synthesize_transcripts` (oracle side)."""
    return _generate_batch(np.arange(n_conv, dtype=np.uint64))


def write_transcripts(spark: SparkSession, n_conv: int, path: str) -> None:
    """Materialize the corpus as parquet (stand-in for the Iceberg table;
    see sources/transcripts.py for the format shim)."""
    synthesize_transcripts(spark, n_conv).write.mode("overwrite").parquet(path)
