"""Single-node pure-Python reference implementation (the golden oracle).

SURVEY.md §5 item 3: an independent, trivially-auditable implementation
of the EXACT pipeline semantics — same tokenizer/lemmatizer
(functions/text.py twins), same BM25 constants and op order, same
tie-breaks (score desc, doc_id asc) — used by tests to pin the Spark
engines (DataFrame scorer and block-max WAND scorer) to rank identity.

This mirrors the reference repo's own differential-test design: three
interchangeable search strategies documented to return identical results
(reference SearchComponent.java:450-551, README.md:224-228).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from search_engine_spark.config import (
    BM25_B,
    BM25_K1,
    DEFAULT_FIELD_WEIGHT,
    ROLE_WEIGHTS,
)
from search_engine_spark.functions.text import lemmatize_text_py


@dataclass
class PyIndex:
    """In-memory index: everything the scorers need, plain dicts."""

    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # lemma -> doc -> tf
    ranks: dict[str, dict[int, float]] = field(default_factory=dict)   # lemma -> doc -> rank
    doclen: dict[int, int] = field(default_factory=dict)               # doc -> dl
    df: dict[str, int] = field(default_factory=dict)                   # lemma -> doc freq
    cf: dict[str, int] = field(default_factory=dict)                   # lemma -> coll freq
    n_docs: int = 0
    avgdl: float = 0.0


def build_index_py(
    docs: dict[int, str],
    roles: dict[int, str] | None = None,
) -> PyIndex:
    """docs: doc_id -> text. roles: optional doc_id -> role for weighting
    (rank = tf × role weight, reference Lemmatization.java:104-129)."""
    ix = PyIndex()
    for doc_id, text in docs.items():
        lemmas = lemmatize_text_py(text)
        if not lemmas:
            ix.doclen[doc_id] = 0
            continue
        w = DEFAULT_FIELD_WEIGHT
        if roles is not None:
            w = ROLE_WEIGHTS.get(roles.get(doc_id, ""), DEFAULT_FIELD_WEIGHT)
        counts = Counter(lemmas)
        ix.doclen[doc_id] = sum(counts.values())
        for lemma, tf in counts.items():
            ix.postings.setdefault(lemma, {})[doc_id] = tf
            ix.ranks.setdefault(lemma, {})[doc_id] = tf * w
            ix.df[lemma] = ix.df.get(lemma, 0) + 1
            ix.cf[lemma] = ix.cf.get(lemma, 0) + tf
    # Align with the Spark build: doclen/stats derive from postings, so
    # docs with zero surviving lemmas don't count (operators/index_build
    # build_doclen + corpus_stats see only docs that produced postings).
    nonzero = [v for v in ix.doclen.values() if v > 0]
    ix.doclen = {d: v for d, v in ix.doclen.items() if v > 0}
    ix.n_docs = len(nonzero)
    ix.avgdl = (sum(nonzero) / len(nonzero)) if nonzero else 0.0
    return ix


def idf_py(df: int, n_docs: int) -> float:
    return math.log(1.0 + (float(n_docs) - df + 0.5) / (df + 0.5))


def bm25_weight_py(tf: int, dl: int, idf: float, avgdl: float,
                   k1: float = BM25_K1, b: float = BM25_B) -> float:
    """Op order pinned identical to operators/index_build.bm25_weight_col."""
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))


def parse_query_py(query: str) -> list[str]:
    seen: dict[str, None] = {}
    for lemma in lemmatize_text_py(query):
        seen.setdefault(lemma)
    return list(seen)


def bm25_topk_py(ix: PyIndex, query: str, k: int = 10,
                 k1: float = BM25_K1, b: float = BM25_B,
                 match_all: bool = True) -> list[tuple[int, float]]:
    """BM25 top-k: (doc_id, raw score), tie-break (score desc, doc_id
    asc). match_all=True is AND semantics (returns [] for
    invalid/missing-term queries, like the engines' empty
    intersection); match_all=False is disjunctive OR — any present
    lemma contributes, absent lemmas contribute nothing."""
    lemmas = parse_query_py(query)
    if not lemmas:
        return []
    if match_all:
        if any(l not in ix.postings for l in lemmas):
            return []
        docs = set(ix.postings[lemmas[0]])
        for l in lemmas[1:]:
            docs &= set(ix.postings[l])
    else:
        docs = set()
        for l in lemmas:
            docs |= set(ix.postings.get(l, ()))
    scored = []
    for d in docs:
        s = 0.0
        for l in lemmas:  # accumulate per query-lemma order… but engines
            # accumulate in unspecified shuffle order; the rounding at 6
            # decimals absorbs the 1-ulp reorder noise (SURVEY §7 (b)).
            if d in ix.postings.get(l, ()):
                s += bm25_weight_py(ix.postings[l][d], ix.doclen[d], idf_py(ix.df[l], ix.n_docs), ix.avgdl, k1, b)
        scored.append((d, s))
    scored.sort(key=lambda t: (-round(t[1], 6), t[0]))
    return scored[:k]


def reference_relevance_py(ix: PyIndex, query: str) -> list[tuple[int, float, float]]:
    """The reference's abs/rel relevance (SearchService.java:95-131):
    abs = Σ rank, rel = abs / max rank, order (abs desc, rel desc, doc asc)."""
    lemmas = parse_query_py(query)
    if not lemmas or any(l not in ix.ranks for l in lemmas):
        return []
    docs = set(ix.ranks[lemmas[0]])
    for l in lemmas[1:]:
        docs &= set(ix.ranks[l])
    out = []
    for d in docs:
        rs = [ix.ranks[l][d] for l in lemmas]
        ab = sum(rs)
        out.append((d, round(ab, 6), round(ab / max(rs), 6)))
    out.sort(key=lambda t: (-t[1], -t[2], t[0]))
    return out
