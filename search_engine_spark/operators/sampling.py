"""Deterministic dataset sampling, splitting, and eval decontamination —
the slicing stage of a training-data pipeline (task brief: first-class
beyond-reference components; the reference's closest analog is its
per-site scoping, ApiService.java:36-47, generalized here to
content-independent, reproducible corpus partitioning).

Design for 100 TB:

- Splits and samples are PURE COLUMN EXPRESSIONS over a portable hash —
  no shuffle, no state, no sampling RNG whose output depends on
  partitioning. The same row lands in the same split on any cluster
  size, any run, any engine (the md5-prefix hash is replayable in
  DuckDB, so every operator here has a hard equality oracle).
- Decontamination broadcasts the EVAL side (eval sets are tiny next to
  a 100 TB train corpus) and semi-joins the train shingle stream —
  one scan of train, no train-side shuffle before the per-doc count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_spark.operators.dedup import doc_shingles

# granularity of the split hash: fractions are exact multiples of 1e-6
SPLIT_BUCKETS = 1_000_000


# ---------------------------------------------------------------------------
# Portable deterministic hash bucket
# ---------------------------------------------------------------------------
def split_bucket_col(id_col: str = "doc_id", seed: str = "split0") -> Column:
    """Uniform bucket in [0, SPLIT_BUCKETS) from a 60-bit md5 prefix of
    ``"<id>:<seed>"``. md5, not xxhash64: both Spark and DuckDB compute
    it, so split membership is engine-independent (same trick as the
    SimHash token hash, operators/dedup.py). Changing ``seed`` re-deals
    every row independently."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return h % SPLIT_BUCKETS


def split_bucket_sql_duckdb(id_col: str = "doc_id", seed: str = "split0") -> str:
    """DuckDB twin of :func:`split_bucket_col`."""
    return (
        f"(('0x' || substring(md5(CAST({id_col} AS VARCHAR) || ':{seed}'), 1, 15))"
        f"::BIGINT % {SPLIT_BUCKETS})"
    )


# ---------------------------------------------------------------------------
# Train / val / test split
# ---------------------------------------------------------------------------
def dataset_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
    seed: str = "split0",
) -> DataFrame:
    """Add a ``split`` column ('train' / 'val' / 'test') by hash bucket.

    Reproducible across runs, engines and cluster sizes; rows never
    migrate between splits when the corpus grows (membership depends
    only on the row's own id). The remainder after train+val is test."""
    b = split_bucket_col(id_col, seed)
    t_hi = int(round(train * SPLIT_BUCKETS))
    v_hi = t_hi + int(round(val * SPLIT_BUCKETS))
    return docs.withColumn(
        "split",
        F.when(b < t_hi, "train").when(b < v_hi, "val").otherwise("test"),
    )


def dataset_split_sql_duckdb(
    id_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
    seed: str = "split0",
) -> str:
    """DuckDB CASE expression matching :func:`dataset_split`."""
    b = split_bucket_sql_duckdb(id_col, seed)
    t_hi = int(round(train * SPLIT_BUCKETS))
    v_hi = t_hi + int(round(val * SPLIT_BUCKETS))
    return (
        f"CASE WHEN {b} < {t_hi} THEN 'train' "
        f"WHEN {b} < {v_hi} THEN 'val' ELSE 'test' END"
    )


# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------
def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: str = "sample0",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows (e.g. language
    rebalancing before training). Pure filter — no shuffle, no count
    pass, no RNG: row keep/drop depends only on (id, seed), so two jobs
    sampling different fractions of the same corpus agree on the shared
    prefix (fractions are nested: a 1% sample is a subset of a 10%
    sample under the same seed)."""
    b = split_bucket_col(id_col, seed)
    thresh: Column = F.lit(int(round(default_fraction * SPLIT_BUCKETS)))
    for stratum in sorted(fractions):
        thresh = F.when(
            F.col(stratum_col) == stratum,
            int(round(fractions[stratum] * SPLIT_BUCKETS)),
        ).otherwise(thresh)
    return docs.filter(b < thresh)


def stratified_sample_sql_duckdb(
    fractions: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: str = "sample0",
) -> str:
    """DuckDB WHERE predicate matching :func:`stratified_sample`."""
    b = split_bucket_sql_duckdb(id_col, seed)
    cases = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN {int(round(fractions[s] * SPLIT_BUCKETS))}"
        for s in sorted(fractions, reverse=True)
    )
    return (
        f"{b} < (CASE {cases} "
        f"ELSE {int(round(default_fraction * SPLIT_BUCKETS))} END)"
    )


def exact_n_sample(
    docs: DataFrame,
    n: int,
    id_col: str = "doc_id",
    seed: str = "sample0",
) -> DataFrame:
    """Deterministic EXACT-N sample — the budget-exact complement to
    the fraction samplers ("give me exactly 10k eval docs", where a
    fraction over an unknown count over- or under-shoots): rank every
    row by the same portable md5 bucket the split/sample family uses
    (ties by id — a total order) and keep the first ``n``. Same
    stability contract: under one seed the N-sample is a PREFIX of the
    (N+k)-sample, and membership is engine/cluster-size independent.

    Plan: TakeOrderedAndProject over (bucket, id) — one scan, a top-N
    merge, no full sort and no count pass. Returns the sampled rows
    with their ``_rank`` (1-based) kept for audit."""
    from pyspark.sql import Window

    b = split_bucket_col(id_col, seed)
    w = Window.orderBy(b.asc(), F.col(id_col).asc())
    # row_number over an un-partitioned window would single-task the
    # corpus; orderBy().limit() compiles to TakeOrderedAndProject
    # (per-partition heaps + driver merge), so rank is re-derived on
    # the n-row result instead
    top = docs.withColumn("_b", b).orderBy(
        F.col("_b").asc(), F.col(id_col).asc()
    ).limit(int(n))
    wr = Window.orderBy(F.col("_b").asc(), F.col(id_col).asc())
    return top.withColumn("_rank", F.row_number().over(wr).cast("long")).drop(
        "_b"
    )


# ---------------------------------------------------------------------------
# Eval decontamination (n-gram overlap against a held-out set)
# ---------------------------------------------------------------------------
def contamination(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bloom_bits_prefilter: set[int] | None = None,
    bloom_params: tuple[int, int, str] = (1 << 16, 4, "bloom0"),
) -> DataFrame:
    """(doc_id, n_shared_shingles) for every TRAIN doc sharing ≥1 word
    ``n``-gram with any EVAL doc — the standard pretraining
    decontamination test (an eval answer leaked into train shows up as
    long shared n-grams).

    Plan: distinct eval shingles are broadcast (eval benchmarks are
    KBs-to-MBs against a 100 TB train side), train shingles stream
    through one scan + broadcast semi-join, and the only shuffle is the
    per-doc count aggregate over matching rows — already filtered down
    to hits, so skew follows contamination (rare), not corpus size.

    ``bloom_bits_prefilter``: a collected Bloom bit set over the eval
    shingles (sketches.bloom_bits + the matching (m_bits, k, seed)).
    When the eval shingle set outgrows the broadcast-hash budget, the
    exact join's build side can't be a hashmap any more — the Bloom
    predicate (a few KB of literal array, pure codegen) drops the
    definitely-clean shingles BEFORE the join, and zero false negatives
    means the result is IDENTICAL (differential-tested); false
    positives only cost a little extra join input."""
    ev = F.broadcast(
        doc_shingles(eval_docs, id_col, text_col, n)
        .select("shingle")
        .distinct()
    )
    tr = doc_shingles(train_docs, id_col, text_col, n)
    if bloom_bits_prefilter is not None:
        from search_engine_spark.operators.sketches import (
            bloom_maybe_contains_col,
        )

        m_bits, k, seed = bloom_params
        tr = tr.filter(
            bloom_maybe_contains_col(
                "shingle", bloom_bits_prefilter, m_bits, k, seed
            )
        )
    return (
        tr.join(ev, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_shingles"))
    )


def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train docs with every row sharing ≥``min_shared`` eval n-grams
    removed (left_anti against :func:`contamination`)."""
    hits = contamination(train_docs, eval_docs, n, id_col, text_col).filter(
        F.col("n_shared_shingles") >= min_shared
    )
    return train_docs.join(
        hits, train_docs[id_col] == hits["doc_id"], "left_anti"
    )


# ---------------------------------------------------------------------------
# Sequence packing (training-batch assembly)
# ---------------------------------------------------------------------------
def sequence_pack(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style sequence packing: documents are concatenated in a
    deterministic order and split into fixed `budget`-token training
    sequences; each doc learns which sequence(s) it lands in. This is
    the batch-assembly step between a cleaned corpus and a trainer —
    the packed stream wastes no pad tokens and is reproducible row-for-
    row across runs and engines.

    Scale design (100 TB): there is NO global ordered cumulative sum
    (a single range-sorted window over the corpus is the classic
    packing scale-killer). Docs are sharded by ``pmod(doc_id,
    n_shards)`` and each shard packs independently in ``doc_id`` order
    — the cumulative-offset window partitions by shard, so the sort is
    per-shard and fully parallel, and a sequence is globally addressed
    as (shard, pack_id). Real pipelines shard exactly this way (per-
    worker packing); determinism comes from the dense docID contract
    (sources/docids.py), not from arrival order.

    Per input doc (empty docs drop out — nothing to pack):
      shard, n_tokens, start_off (token offset in the shard's stream),
      pack_id = floor(start_off / budget),
      end_pack_id = floor((start_off + n_tokens - 1) / budget),
      is_split = doc straddles a sequence boundary.
    """
    from pyspark.sql import Window

    from search_engine_spark.functions.analysis import token_count_col

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("long").alias("shard"),
        token_count_col(text_col).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = Window.partitionBy("shard").orderBy("doc_id")
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_off")
    out = base.select("doc_id", "shard", "n_tokens", start)
    return out.select(
        "doc_id",
        "shard",
        "n_tokens",
        "start_off",
        F.floor(F.col("start_off") / budget).cast("long").alias("pack_id"),
        F.floor((F.col("start_off") + F.col("n_tokens") - 1) / budget)
        .cast("long")
        .alias("end_pack_id"),
        (
            F.floor(F.col("start_off") / budget)
            != F.floor((F.col("start_off") + F.col("n_tokens") - 1) / budget)
        ).alias("is_split"),
    )


def sequence_pack_sql_duckdb(
    budget: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`sequence_pack` (same shard, order, and
    offset arithmetic — floor division on BIGINTs both sides)."""
    from search_engine_spark.functions.analysis import token_count_sql_duckdb

    ntok = token_count_sql_duckdb(text_col)
    return f"""
        WITH base AS (
            SELECT {id_col} AS doc_id,
                   CAST({id_col} % {n_shards} AS BIGINT) AS shard,
                   CAST({ntok} AS BIGINT) AS n_tokens
            FROM {table}
        ),
        pos AS (
            SELECT doc_id, shard, n_tokens,
                   CAST(sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                   ) - n_tokens AS BIGINT) AS start_off
            FROM base WHERE n_tokens > 0
        )
        SELECT doc_id, shard, n_tokens, start_off,
               CAST(floor(start_off / {budget}) AS BIGINT) AS pack_id,
               CAST(floor((start_off + n_tokens - 1) / {budget}) AS BIGINT)
                   AS end_pack_id,
               floor(start_off / {budget})
                   <> floor((start_off + n_tokens - 1) / {budget}) AS is_split
        FROM pos
    """


# ---------------------------------------------------------------------------
# Composed cleanse (shared by the driver query and jobs/prepare_dataset.py)
# ---------------------------------------------------------------------------
def training_cleanse(
    docs: DataFrame,
    quality_floor: float = 0.5,
    lang: str | None = "latin-script",
    dedup: bool = True,
    minhash_threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Docs surviving the standard training cleanse: near-dup keeper
    selection (MinHash-LSH, component-min keeper) ∩ quality floor ∩
    language filter. One definition shared by the oracle-checked driver
    query and the prepare_dataset CLI so the recipe cannot drift
    between them. Returns the input docs filtered (all columns kept).
    """
    from search_engine_spark.functions.analysis import (
        langid_features,
        langid_label_col,
        quality_features,
        quality_score_col,
    )
    from search_engine_spark.operators.dedup import (
        dedup_keepers,
        minhash_near_duplicates,
    )

    out = docs
    if dedup:
        # minhash_near_duplicates reads the standard (doc_id, text)
        # columns; rename-compat callers pass id_col/text_col for the
        # quality/lang stages only
        pairs = minhash_near_duplicates(
            docs, threshold=minhash_threshold, num_hashes=num_hashes,
            bands=bands, n=shingle_n,
        )
        out = (
            dedup_keepers(docs, pairs, id_col=id_col)
            .filter(F.col("is_keeper"))
            .select(id_col)
            .join(out, id_col)
        )
    qual = out.select(id_col, *quality_features(text_col)).select(
        id_col, quality_score_col().alias("_qs")
    )
    out = out.join(qual, id_col).filter(
        F.col("_qs") >= quality_floor
    ).drop("_qs")
    if lang:
        lg = out.select(id_col, *langid_features(text_col)).select(
            id_col, langid_label_col().alias("_lang")
        )
        out = out.join(lg, id_col).filter(F.col("_lang") == lang).drop("_lang")
    return out


# ---------------------------------------------------------------------------
# Token-window chunking (RAG / embedding-pipeline shaping)
# ---------------------------------------------------------------------------
def chunk_documents(
    docs: DataFrame,
    chunk: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split every document into overlapping fixed-token-window chunks —
    the shaping step between a cleaned corpus and an embedding model /
    RAG retriever (each chunk becomes one embedding row; ``stride`` <
    ``chunk`` keeps boundary context shared between neighbours).

    Per non-empty doc: ``1 + ceil(max(n_tokens − chunk, 0) / stride)``
    chunks, chunk *i* covering tokens ``[i·stride+1, i·stride+chunk]``
    (the final chunk may be shorter — tails are kept, not padded).
    Output: (doc_id, chunk_idx, n_tokens, chunk_text).

    Plan shape (100 TB): one projected tokenize → per-row transform +
    posexplode. Pure projection — NO shuffle, no window, no join; chunk
    identity is (doc_id, chunk_idx), so downstream embedding jobs shard
    arbitrarily. The ceil is integer arithmetic (`div`), replayed
    exactly by the DuckDB twin."""
    from search_engine_spark.functions.text import tokenize_expr

    n_chunks = (
        f"1 + (greatest(size(_toks) - {chunk}, 0) + {stride - 1}) div {stride}"
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_expr(F.col(text_col)).alias("_toks"),
    ).filter(F.size("_toks") > 0)
    return toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {n_chunks} - 1), "
                f"i -> slice(_toks, i * {stride} + 1, {chunk}))"
            )
        ).alias("chunk_idx", "_chunk"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("_chunk").cast("long").alias("n_tokens"),
        F.array_join("_chunk", " ").alias("chunk_text"),
    )


def chunk_documents_sql_duckdb(
    chunk: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`chunk_documents` (same tokenizer, same
    integer ceil, same 1-based inclusive slicing)."""
    from search_engine_spark.functions.text import TOKEN_KEEP_REGEX

    toks = (
        f"list_filter(string_split(trim(regexp_replace(lower({text_col}), "
        f"'{TOKEN_KEEP_REGEX}', ' ', 'g')), ' '), t -> t <> '')"
    )
    return f"""
        WITH toks AS (
            SELECT {id_col} AS doc_id, {toks} AS tok FROM {table}
        ),
        chunks AS (
            SELECT doc_id,
                   CAST(i AS BIGINT) AS chunk_idx,
                   tok[i * {stride} + 1 : i * {stride} + {chunk}] AS chunk
            FROM toks,
                 LATERAL unnest(generate_series(
                     0, (greatest(len(tok) - {chunk}, 0) + {stride - 1})
                        // {stride}
                 )) AS g(i)
            WHERE len(tok) > 0
        )
        SELECT doc_id, chunk_idx,
               CAST(len(chunk) AS BIGINT) AS n_tokens,
               array_to_string(chunk, ' ') AS chunk_text
        FROM chunks
    """


# ---------------------------------------------------------------------------
# Quality-weighted importance resampling
# ---------------------------------------------------------------------------
def quality_resample(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "resample0",
) -> DataFrame:
    """Keep each doc with probability equal to its quality score —
    importance resampling (the DSIR-family move: instead of a hard
    quality floor, sample proportionally so mid-quality mass survives
    at reduced rate and the kept corpus's quality distribution shifts
    up without a cliff). Deterministic: keep iff
    ``hash_bucket(id, seed) < quality_score · SPLIT_BUCKETS`` — no RNG,
    so membership is reproducible across runs/engines/cluster sizes and
    re-running with a larger corpus never flips existing rows.

    The comparison is done in DOUBLE with no extra rounding: both
    engines compute the identical IEEE product from the identical
    6-decimal score, so whichever side of an integer the product lands
    on, they agree. Returns (doc_id, quality_score) for kept docs.

    Plan: pure projection + filter — no shuffle, no count pass; the
    quality features come from one text scan."""
    from search_engine_spark.functions.analysis import (
        quality_features,
        quality_score_col,
    )

    scored = docs.select(
        F.col(id_col).alias("doc_id"), *quality_features(text_col)
    ).select("doc_id", quality_score_col().alias("quality_score"))
    b = split_bucket_col("doc_id", seed)
    return scored.filter(
        b.cast("double") < F.col("quality_score") * float(SPLIT_BUCKETS)
    )


def gopher_filter(
    docs: DataFrame,
    min_tokens: int = 8,
    max_tokens: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_punct_ratio: float = 0.1,
    min_stop_ratio: float = 0.01,
    max_top_char_frac: float = 0.2,
    max_dup_frac: float = 0.3,
    rep_n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style document quality gate (Rae et al. 2021, A1.1-A1.3)
    — the DECISION step a training pipeline runs over the signal
    operators: every doc gets a verdict and the ordered list of rules
    it failed, so filtering is auditable (why did this doc drop?)
    rather than a silent predicate.

    Rules, in fixed report order (thresholds parameterized; defaults
    scaled to the fixture corpus — production uses the paper's 50/
    100k/0.2/…):

      word_count           n_tokens within [min_tokens, max_tokens]
      mean_word_length     mean token length within [min, max]
      symbol_ratio         punct_ratio ≤ max_punct_ratio
      stopword_ratio       stopword_ratio ≥ min_stop_ratio
      top_ngram_char_frac  top rep_n-gram char coverage ≤ max
      dup_ngram_frac       duplicate rep_n-gram fraction ≤ max

    Docs too short for an n-gram stream (< rep_n tokens) pass the two
    repetition rules vacuously — they are already rejected by
    word_count whenever min_tokens ≥ rep_n.

    Every compared value is a 6-decimal-rounded double from the signal
    operators and every threshold a literal, so the verdict needs NO
    new float arithmetic — cross-engine parity is inherited. Plan:
    the quality features are a pure projection; the repetition frame
    joins back on doc_id (one shuffle at corpus scale, or zero with
    both sides bucketed on doc_id).

    Returns (doc_id, keep boolean, reasons comma-joined string —
    '' when the doc passes; a string, not an array, so the oracle's
    value comparison stays scalar).
    """
    from search_engine_spark.functions.analysis import quality_features
    from search_engine_spark.operators.dedup import repetition_signals

    feats = docs.select(F.col(id_col).alias("doc_id"),
                        *quality_features(text_col))
    rep = repetition_signals(docs, n=rep_n, id_col=id_col,
                             text_col=text_col).select(
        "doc_id", "top_char_frac", "dup_gram_frac"
    )
    j = feats.join(rep, "doc_id", "left")
    reasons = F.expr(
        "filter(array("
        f" IF(n_tokens < {int(min_tokens)} OR n_tokens > {int(max_tokens)},"
        "    'word_count', NULL),"
        f" IF(mean_token_len < {float(min_mean_len)!r}"
        f"    OR mean_token_len > {float(max_mean_len)!r},"
        "    'mean_word_length', NULL),"
        f" IF(punct_ratio > {float(max_punct_ratio)!r}, 'symbol_ratio', NULL),"
        f" IF(stopword_ratio < {float(min_stop_ratio)!r},"
        "    'stopword_ratio', NULL),"
        f" IF(top_char_frac IS NOT NULL"
        f"    AND top_char_frac > {float(max_top_char_frac)!r},"
        "    'top_ngram_char_frac', NULL),"
        f" IF(dup_gram_frac IS NOT NULL"
        f"    AND dup_gram_frac > {float(max_dup_frac)!r},"
        "    'dup_ngram_frac', NULL)"
        "), x -> x IS NOT NULL)"
    )
    return j.select(
        "doc_id",
        reasons.alias("_r"),
    ).select(
        "doc_id",
        (F.size("_r") == 0).alias("keep"),
        F.array_join("_r", ",").alias("reasons"),
    )


def budget_sample(
    docs: DataFrame,
    token_budget: int,
    method: str = "exact",
    n_buckets: int = 32,
    accuracy: int = 10000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget selection: keep the HIGHEST-quality documents whose
    cumulative token count fits ``token_budget`` — the "fill a 500B-
    token training mix from the best data first" operation, the budget-
    constrained dual of quality_resample's probabilistic thinning.

    Two selectable plans (the perplexity_buckets exact/approx pattern):

    - ``method="exact"`` — order by (quality desc, doc_id asc), running
      cumulative token sum, keep rows with cumsum ≤ budget. ONE global
      un-partitioned sort window: the small-frame audit path only.
    - ``method="approx"`` — THE 100 TB plan: quality cutoffs once via
      ``percentile_approx`` (one partial-agg pass), assign each doc a
      quality bucket with a pure comparison, aggregate per-bucket token
      mass (n_buckets rows), take whole buckets greedily from the top
      until the next would overflow the budget, filter. Scan-shaped —
      no global sort, no window over the doc frame; selection
      granularity is one bucket (undershoots by at most one bucket's
      mass, tightened by raising n_buckets). With ``accuracy`` ≥ the
      frame size the cutoffs are exact rank statistics, so the kept
      set is a deterministic quality-prefix (differential-tested
      against the exact path on distinct qualities).

    Returns (doc_id, quality_score, n_tokens) of kept docs.
    """
    if method not in ("exact", "approx"):
        raise ValueError("method must be 'exact' or 'approx'")
    from search_engine_spark.functions.analysis import (
        quality_features,
        quality_score_col,
    )

    scored = docs.select(
        F.col(id_col).alias("doc_id"), *quality_features(text_col)
    ).select(
        "doc_id",
        quality_score_col().alias("quality_score"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )
    if method == "exact":
        from pyspark.sql import Window

        w = (
            Window.orderBy(F.col("quality_score").desc(),
                           F.col("doc_id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            scored.withColumn("_cum", F.sum("n_tokens").over(w))
            .filter(F.col("_cum") <= int(token_budget))
            .select("doc_id", "quality_score", "n_tokens")
        )
    qs = [b / n_buckets for b in range(1, n_buckets)]
    cuts = scored.agg(
        F.percentile_approx("quality_score", qs, int(accuracy)).alias("_cuts")
    )
    bucketed = scored.crossJoin(F.broadcast(cuts)).withColumn(
        "_bucket",
        F.expr(
            "CAST(aggregate(_cuts, 0, "
            "(acc, c) -> acc + IF(quality_score > c, 1, 0)) AS INT)"
        ),
    )
    mass = (
        bucketed.groupBy("_bucket")
        .agg(F.sum("n_tokens").cast("long").alias("_mass"))
        .collect()
    )
    by_bucket = {int(r["_bucket"]): int(r["_mass"]) for r in mass}
    total, min_bucket = 0, None
    for bkt in sorted(by_bucket, reverse=True):
        if total + by_bucket[bkt] > int(token_budget):
            break
        total += by_bucket[bkt]
        min_bucket = bkt
    if min_bucket is None:  # even the top bucket overflows the budget
        return scored.filter(F.lit(False)).select(
            "doc_id", "quality_score", "n_tokens"
        )
    return (
        bucketed.filter(F.col("_bucket") >= int(min_bucket))
        .select("doc_id", "quality_score", "n_tokens")
    )


def mixture_sample(
    docs: DataFrame,
    proportions: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix0",
) -> DataFrame:
    """Domain-mixture sampling: thin each source deterministically so
    the kept corpus matches the target ``proportions`` (the Dolma /
    DataComp "mixing weights" step — a training mix is a RATIO
    contract, not a per-source quota). The total is maximized subject
    to never oversampling: T = min_s floor-free n_s / p_s, keep-rate
    r_s = p_s·T/n_s ≤ 1, membership = portable md5 hash bucket <
    r_s·BUCKETS — reproducible across runs/engines/cluster sizes, and
    growing one source never flips another source's kept rows.

    Sources absent from ``proportions`` are dropped (rate 0).
    Proportions must be positive; they are normalized to sum 1.

    Plan: one count-by-source aggregate (|sources| rows, collected),
    then a pure hash filter — no shuffle of the doc frame. Returns
    (doc_id, source). Exact ratios are approached in expectation; the
    hash keeps per-doc membership stable (quality_resample's
    contract)."""
    tot = float(sum(proportions.values()))
    if tot <= 0 or any(v <= 0 for v in proportions.values()):
        raise ValueError("proportions must be positive")
    p = {s: v / tot for s, v in proportions.items()}
    counts = {
        r["source"]: int(r["n"])
        for r in docs.filter(F.col(source_col).isin(list(p)))
        .groupBy(F.col(source_col).alias("source"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    missing = [s for s in p if s not in counts]
    if missing:
        raise ValueError(f"no rows for sources {missing}")
    t_max = min(counts[s] / p[s] for s in p)
    rates = {s: p[s] * t_max / counts[s] for s in p}
    rate_arms = None
    for s, r in sorted(rates.items()):
        cond = F.col(source_col) == s
        lit = F.lit(float(r))
        rate_arms = (F.when(cond, lit) if rate_arms is None
                     else rate_arms.when(cond, lit))
    b = split_bucket_col(id_col, seed)
    return (
        docs.filter(F.col(source_col).isin(list(p)))
        .withColumn("_rate", rate_arms)
        .filter(b.cast("double") < F.col("_rate") * float(SPLIT_BUCKETS))
        .select(F.col(id_col).alias("doc_id"),
                F.col(source_col).alias("source"))
    )


def pack_conversations(
    transcripts: DataFrame, budget: int = 2048
) -> DataFrame:
    """Turn-boundary-respecting packing of CONVERSATIONS into training
    sequences — the transcript-native sibling of :func:`sequence_pack`
    (chat SFT data is packed per dialogue, with role framing, never
    splitting a turn mid-utterance): within each conversation the
    turns concatenate in ``turn_idx`` order as ``"<role> <text>"``,
    and a turn is assigned to pack ``floor(start_off / budget)`` of
    ITS OWN conversation. A turn whose tail crosses the boundary stays
    whole in its pack (``overflows`` flags it — packs may exceed the
    budget by less than one turn; the split-is-forbidden dual of
    sequence_pack's ``is_split``).

    Scale: the cumulative-offset window partitions by conv_id — fully
    parallel, no global sort (conversations are the natural packing
    shard for dialogue data). Empty turns drop out.

    Returns (conv_id, turn_idx, n_tokens, start_off, pack_id,
    overflows).
    """
    from pyspark.sql import Window

    from search_engine_spark.functions.analysis import token_count_col

    base = (
        transcripts.select(
            "conv_id", "turn_idx",
            F.concat_ws(" ", "role", "text").alias("_framed"),
        )
        .withColumn("n_tokens", token_count_col("_framed").cast("long"))
        .filter(F.col("n_tokens") > 0)
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        base.withColumn(
            "start_off",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"),
        )
        .select(
            "conv_id", "turn_idx", "n_tokens", "start_off",
            F.floor(F.col("start_off") / budget).cast("long")
            .alias("pack_id"),
            (
                F.floor((F.col("start_off") + F.col("n_tokens") - 1)
                        / budget)
                != F.floor(F.col("start_off") / budget)
            ).alias("overflows"),
        )
    )
