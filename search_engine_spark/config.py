"""Engine-wide pinned constants.

The reference keeps runtime knobs in a ``config`` KV table
(reference entity/Config.java:13-37, ConfigRepository.java:15-22) and
per-field weights in a ``field`` table (entity/Field.java:16-34,
FieldRepository.java:15-19: title=1.0, body=0.8). We pin the analogous
constants in code: one source of truth shared by the Spark engine, the
single-node Python oracle, and the DuckDB oracle SQL.
"""

from __future__ import annotations

from dataclasses import dataclass

# ---------------------------------------------------------------------------
# BM25 (FIXTURES.md §3: k1=1.2, b=0.75, pinned)
# ---------------------------------------------------------------------------
BM25_K1: float = 1.2
BM25_B: float = 0.75

# ---------------------------------------------------------------------------
# Field weights: the reference weights per-document HTML fields
# (title=1.0, body=0.8 — FieldRepository.java:15-19). Transcripts have no
# HTML fields; the analogous per-turn "field" is the speaker role.
# rank(doc, term) = tf * weight(role)  (reference Lemmatization.java:104-129:
# rank = count × weight, merged across fields by summation).
# ---------------------------------------------------------------------------
ROLE_WEIGHTS: dict[str, float] = {
    "user": 1.0,
    "assistant": 0.8,
    "tool": 0.5,
}
DEFAULT_FIELD_WEIGHT: float = 1.0  # plain documents (no role column)

# ---------------------------------------------------------------------------
# Stopwords: analog of the reference's excluded parts-of-speech list
# (prepositions/conjunctions/particles — PartOfSpeechRepository.java:15-33,
# Lemmatization.java:48-60). Our corpus is ASCII English-ish, so the stop
# set is a small pinned function-word list applied AFTER lemmatization,
# mirroring "drop a normal form whose morph info is an excluded POS".
# ---------------------------------------------------------------------------
STOPWORDS: tuple[str, ...] = ("a", "an", "the", "and", "or", "of", "to", "in", "is", "it")

# ---------------------------------------------------------------------------
# Tokenizer: the reference lowercases, strips every non-letter (Cyrillic
# [ЁёА-я] for its corpus), and splits on whitespace
# (HtmlParsing.java:147-153). Same semantics on our corpus alphabet:
# ---------------------------------------------------------------------------
TOKEN_KEEP_REGEX: str = "[^a-z0-9]+"  # applied after lower(); replaced by space

# ---------------------------------------------------------------------------
# Posting-segment layout (north_star: docID-delta + varbyte blocks with
# per-block max score). BLOCK_SIZE postings per block; doc-space is range-
# bucketed so one hot term's postings never land in a single applyInPandas
# group (bounded memory per group at 10^12-doc scale).
# ---------------------------------------------------------------------------
BLOCK_SIZE: int = 128
DOC_BUCKET_WIDTH: int = 1 << 16  # docs per doc-range bucket (tunable per scale)
# Segment payload codec: "auto" prices varbyte vs PForDelta per block and
# keeps the smaller buffer; "varbyte" pins the LEB128 path (debug/compat).
SEGMENT_CODEC: str = "auto"

# Salting for skewed term-keyed aggregation (north_rule requirement):
# terms with df above this threshold get SALT_FACTOR-way two-stage aggs.
SALT_FACTOR: int = 16

# Reference serving defaults (ApiService.java:97-113: offset=0, limit=20).
DEFAULT_TOP_K: int = 10
DEFAULT_PAGE_LIMIT: int = 20

# Snippet window: ±25 chars around a match, reference ApiService.java:134-200.
SNIPPET_WINDOW: int = 25


@dataclass(frozen=True)
class BM25Params:
    k1: float = BM25_K1
    b: float = BM25_B


def role_weight_sql_case(col: str = "role") -> str:
    """ANSI-SQL CASE expression for role weights — shared with DuckDB oracles."""
    whens = " ".join(
        f"WHEN '{role}' THEN {weight!r}" for role, weight in ROLE_WEIGHTS.items()
    )
    return f"CASE {col} {whens} ELSE {DEFAULT_FIELD_WEIGHT!r} END"
