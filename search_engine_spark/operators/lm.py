"""N-gram language-model perplexity scoring and DSIR importance
resampling — the model-based quality tier of a training-data pipeline.

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of an
n-gram LM trained on a trusted corpus and keeps the low-perplexity
head; DSIR (Xie et al. 2023, arXiv:2302.03169) resamples raw data
toward a target distribution using importance weights from two hashed
n-gram LMs, selected via deterministic Gumbel top-k. Both are
re-expressed here Spark-first:

- **Model training is two groupBys** (bigram counts + context counts)
  over one exploded token-transition stream — one shuffle each, both
  map-side combined. The model is vocabulary-bounded, NOT corpus-
  bounded: at 100 TB you add a ``min_count`` prune so the table stays
  broadcastable (CCNet's KenLM models are likewise pruned).
- **Scoring is one join + one groupBy.** Doc bigrams join the model
  (broadcast when it fits — the default; shuffle-join on the bigram
  key otherwise) and aggregate per doc. No Python in the plan: the
  whole pipeline is codegen'd expressions.
- **Cross-engine float parity** (the DuckDB oracle hashes values
  exactly): per-bigram log-probs are rounded to a 1e-10 grid and
  summed as DECIMAL — decimal addition is exact and order-independent,
  so Spark's and DuckDB's different accumulation orders cannot drift
  the sum, and a last-ulp `ln` disagreement shifts the total by at
  most n·1e-10 instead of amplifying (same trick as the event-window
  decimal avg, __spark_entry__.py q_event_windows).
- **Resampling is collect-free**: Gumbel keys are pure column
  expressions over the portable md5 hash (operators/sampling.py), so
  the top-k is one TakeOrderedAndProject and membership is
  engine/cluster-size independent.

Smoothing: add-alpha (Lidstone) — P(w2|w1) = (c(w1,w2) + a) /
(ctx(w1) + a·V). Exactly replayable (no backoff state), and the
division's operands are bit-identical across engines (counts are
integers, a·V is exact for a = 0.5), so p itself is bit-identical;
only ln's last ulp differs, which the decimal sum absorbs.

Reference analog: the quality-scoring family (SURVEY §2 LLM-ops,
beside Gopher repetition signals and the heuristic quality score).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_spark.functions.text import tokenize_expr

# Lidstone smoothing mass; 0.5 keeps a·V exactly representable.
LM_ALPHA = 0.5
# decimal grid for the order-independent log-prob sum
_LP_DECIMALS = 10
_LP_DECIMAL_T = "decimal(28,10)"


class BigramLM(NamedTuple):
    """A trained add-alpha bigram model: three small tables.

    ``bigrams``  — (w1, w2, c): transition counts.
    ``contexts`` — (w1, ctx): count of transitions leaving w1.
    ``vocab``    — 1 row (v): |distinct tokens seen in the model|,
                   the smoothing denominator's vocabulary size.
    """

    bigrams: DataFrame
    contexts: DataFrame
    vocab: DataFrame


def doc_bigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token transition (every
    occurrence counts; this is an LM stream, not a shingle SET). Docs
    with fewer than 2 tokens drop out. Tokens are projected once before
    the transform (Catalyst does not CSE a repeated tokenize — see
    shingles_over_tokens_expr)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize_expr(F.col(text_col)).alias("_t")
    ).filter(F.size("_t") >= 2)
    return toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(_t) - 2),"
                " i -> struct(_t[i] AS w1, _t[i + 1] AS w2))"
            )
        ).alias("_bi"),
    ).select("doc_id", "_bi.w1", "_bi.w2")


def train_bigram_lm(
    train_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int | None = None,
    transitions: DataFrame | None = None,
) -> BigramLM:
    """Count-based bigram model from a training corpus: two groupBys
    over one transition stream. ``min_count`` prunes rare bigrams
    (CCNet-style) so the model stays broadcastable at scale — contexts
    and vocab are computed BEFORE the prune so pruning only moves mass
    into the smoothing floor, never invents probability.

    Pass ``transitions`` (a — typically persisted — doc_bigrams frame
    for the same corpus) to share one tokenize+explode scan with other
    stages; see dsir_resample."""
    bi = (transitions if transitions is not None
          else doc_bigrams(train_docs, id_col, text_col))
    bigrams = bi.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    contexts = bi.groupBy("w1").agg(F.count("*").alias("ctx"))
    # vocab from the model tables (w1 ∪ w2), not a second corpus scan
    vocab = (
        bigrams.select("w1")
        .union(bigrams.select(F.col("w2").alias("w1")))
        .agg(F.count_distinct("w1").alias("v"))
    )
    if min_count is not None:
        bigrams = bigrams.filter(F.col("c") >= min_count)
    return BigramLM(bigrams, contexts, vocab)


def _logprob_col(alpha: float) -> Column:
    """ln P(w2|w1) under add-alpha smoothing; operands are integer
    counts + exact a·V, so the quotient is bit-identical across
    engines."""
    return F.log(
        (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(alpha))
        / (
            F.coalesce(F.col("ctx"), F.lit(0)).cast("double")
            + F.lit(alpha) * F.col("v").cast("double")
        )
    )


def cross_entropy(
    docs: DataFrame,
    lm: BigramLM,
    alpha: float = LM_ALPHA,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
    transitions: DataFrame | None = None,
) -> DataFrame:
    """Per-doc cross-entropy (nats/transition) and perplexity under the
    model: (doc_id, n_bigrams, cross_entropy, perplexity).

    ce = round(-(Σ round(ln p, 10) as DECIMAL) / n, 6) — the decimal
    sum makes the value independent of partitioning/accumulation order
    (see module docstring); ppl = round(e^ce, 6). Unseen transitions
    get the smoothing floor; a w1 the model never saw scores 1/V.

    Plan shape: doc transitions join the model on (w1, w2) then w1 —
    broadcast by default (models are vocab-bounded); set
    ``broadcast_model=False`` to shuffle-join when a giant unpruned
    model is deliberately kept. ``transitions`` shares a persisted
    doc_bigrams frame, as in train_bigram_lm."""
    hint = F.broadcast if broadcast_model else (lambda d: d)
    bi = (transitions if transitions is not None
          else doc_bigrams(docs, id_col, text_col))
    scored = (
        bi.join(hint(lm.bigrams), ["w1", "w2"], "left")
        .join(hint(lm.contexts), ["w1"], "left")
        .crossJoin(F.broadcast(lm.vocab))
        .select(
            "doc_id",
            F.round(_logprob_col(alpha), _LP_DECIMALS)
            .cast(_LP_DECIMAL_T)
            .alias("_lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("_lp").alias("_s"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                -F.col("_s").cast("double") / F.col("n_bigrams"), 6
            ).alias("cross_entropy"),
        )
        .withColumn("perplexity", F.round(F.exp("cross_entropy"), 6))
    )


def perplexity_buckets(
    ce: DataFrame, n_buckets: int = 3,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    method: str = "exact",
    accuracy: int = 10000,
) -> DataFrame:
    """CCNet-style quality tiers: rank docs by perplexity ascending and
    cut into ``n_buckets`` equal slices — bucket 0 ("head") is the
    lowest-perplexity (most in-domain) third, the slice CCNet keeps.

    Two selectable plans:

    - ``method="exact"`` — bucket = ((rank − 1) · n_buckets) div n,
      pure INTEGER arithmetic over a dense rank, so membership is
      engine-identical (ntile() is avoided on purpose: its remainder
      distribution is implementation-defined; ties broken by doc_id as
      everywhere). ONE global un-partitioned sort window — every doc
      through a single task. This is the small-frame audit path only.
    - ``method="approx"`` — THE 100 TB plan: compute the n_buckets−1
      cutoff values once with ``percentile_approx`` (one partial-agg
      pass, no sort, no window), broadcast the tiny cutoff array, and
      assign buckets with a pure comparison filter
      (bucket = #cutoffs strictly below the doc's perplexity) — fully
      parallel, scan-shaped, no shuffle of the doc frame at all.

    Boundary semantics of the approx path: cutoffs are actual data
    values (percentile_approx is value-returning); a doc EQUAL to a
    cutoff lands in the LOWER bucket. With ``accuracy`` ≥ the frame
    size the cutoff for q = b/n_buckets is the value at rank
    ceil(q·n) — exactly the exact rule's last rank of bucket b−1 —
    so on DISTINCT perplexities the two methods agree for every n
    (differential-tested across n % n_buckets ∈ {0,1,2}). They diverge
    only when docs TIE on a cutoff value: the exact path splits the
    tie group across the boundary by doc_id, the approx path collapses
    the whole tie group into the lower bucket (test-pinned). At lower
    ``accuracy`` the cutoff is approximate within percentile_approx's
    published rank-error bound and bucket sizes drift accordingly.

    Returns (doc_id, perplexity, bucket, label).
    """
    if len(labels) != n_buckets:
        raise ValueError("labels must have n_buckets entries")
    if method not in ("exact", "approx"):
        raise ValueError("method must be 'exact' or 'approx'")
    lab = F.array(*[F.lit(s) for s in labels])
    if method == "approx":
        qs = [b / n_buckets for b in range(1, n_buckets)]
        cuts = ce.agg(
            F.percentile_approx(
                "perplexity", qs, int(accuracy)
            ).alias("_cuts")
        )
        bucket = F.expr(
            "CAST(aggregate(_cuts, 0, "
            "(acc, c) -> acc + IF(perplexity > c, 1, 0)) AS INT)"
        )
        return ce.crossJoin(F.broadcast(cuts)).select(
            "doc_id", "perplexity", bucket.alias("bucket"),
            F.element_at(lab, bucket + F.lit(1)).alias("label"),
        )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("perplexity").asc(), F.col("doc_id").asc())
    ranked = ce.select(
        "doc_id",
        "perplexity",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(Window.partitionBy()).alias("_n"),
    )
    bucket = F.expr(f"CAST(((_rn - 1) * {n_buckets}) div _n AS INT)")
    return ranked.select(
        "doc_id", "perplexity", bucket.alias("bucket"),
        F.element_at(lab, bucket + F.lit(1)).alias("label"),
    )


def _gumbel_col(id_col: str, seed: str) -> Column:
    """Deterministic standard-Gumbel noise from the portable 60-bit
    md5 prefix of "<id>:<seed>" (split_bucket_col's hash, full width):
    u = (h+1)/(2^60+1) ∈ (0,1), g = -ln(-ln u). Engine-replayable, so
    the resample has a hard equality oracle."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(2**60 + 1))
    return -F.log(-F.log(u))


def dsir_gumbel_sql_duckdb(id_col: str = "doc_id", seed: str = "dsir0") -> str:
    """DuckDB twin of :func:`_gumbel_col`."""
    h = (
        f"(('0x' || substring(md5(CAST({id_col} AS VARCHAR) || ':{seed}'), "
        f"1, 15))::BIGINT)"
    )
    return f"(-ln(-ln((CAST({h} AS DOUBLE) + 1.0) / {float(2**60 + 1)!r})))"


def dsir_resample(
    docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    alpha: float = LM_ALPHA,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "dsir0",
) -> DataFrame:
    """DSIR (Xie et al. 2023): select the k raw docs whose hashed-n-gram
    LM importance weight, perturbed by Gumbel noise, is largest —
    exactly sampling k docs without replacement with probability ∝
    exp(log w) (the Gumbel top-k identity the paper uses).

    log w(x) = log p_target(x) - log p_raw(x) = n·(ce_raw - ce_target)
    — computed from the SAME per-transition decimal sums the
    cross-entropy query pins, so the weight inherits the
    order-independence guarantee. key = round(log w + g, 6); top-k by
    (key desc, doc_id asc) is one TakeOrderedAndProject — no full sort,
    no collect.

    Both models score every raw doc (two broadcast joins over one
    transition stream). The raw-side transition stream is PERSISTED and
    shared by raw-model training, raw-model scoring, and target-model
    scoring; the target stream is persisted for its model's two
    groupBys + vocab — one tokenize+explode per corpus total (ADVICE
    r3: without this, one action re-tokenized the raw corpus ~5×). The
    caches are owned by the returned DataFrame's lineage (one-shot
    query shape).

    Returns (doc_id, n_bigrams, log_weight, key).
    """
    bi_raw = doc_bigrams(docs, id_col, text_col).persist()
    bi_tgt = doc_bigrams(target_docs, id_col, text_col).persist()
    lm_raw = train_bigram_lm(docs, id_col, text_col, transitions=bi_raw)
    lm_tgt = train_bigram_lm(target_docs, id_col, text_col, transitions=bi_tgt)
    ce_raw = cross_entropy(docs, lm_raw, alpha, id_col, text_col,
                           transitions=bi_raw)
    ce_tgt = cross_entropy(docs, lm_tgt, alpha, id_col, text_col,
                           transitions=bi_raw)
    joined = (
        ce_raw.select("doc_id", "n_bigrams",
                      F.col("cross_entropy").alias("_ce_raw"))
        .join(
            ce_tgt.select("doc_id", F.col("cross_entropy").alias("_ce_tgt")),
            "doc_id",
        )
        .withColumn(
            "log_weight",
            F.round(
                (F.col("_ce_raw") - F.col("_ce_tgt")) * F.col("n_bigrams"), 6
            ),
        )
        .withColumn(
            "key", F.round(F.col("log_weight") + _gumbel_col("doc_id", seed), 6)
        )
    )
    return (
        joined.select("doc_id", "n_bigrams", "log_weight", "key")
        .orderBy(F.col("key").desc(), F.col("doc_id").asc())
        .limit(k)
    )
