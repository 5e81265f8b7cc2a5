"""Deterministic cardinality sketches — HyperLogLog with a PORTABLE
hash so the sketch is engine-replayable.

Spark's built-in ``approx_count_distinct`` (HLL++) is the production
one-liner, but its sketch is opaque: registers can't be checked against
another engine, merged outside Spark, or stored as an auditable
artifact. This HLL uses the repo's portable 60-bit md5-prefix hash
(operators/sampling.split_bucket_col trick), so the register table is
EXACT integers — DuckDB derives the identical registers from the same
SQL and the driver's hash comparison is bit-for-bit, while the estimate
is a closed-form scalar computed from them (Flajolet et al. 2007, with
the small-range linear-counting correction).

At 100 TB: one scan, one groupBy(bucket) over at most 2^p rows out —
the classic mergeable-sketch shape (per-partition partial maxes combine
map-side; register tables from different corpora merge by max)."""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 60  # md5 15-hex-digit prefix — portable across engines


def _hash60_col(col: str, seed: str) -> Column:
    """60-bit integer hash of the column value (md5 prefix, as in
    sampling.split_bucket_col — portable to DuckDB)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.col(col).cast("string"), F.lit(":" + seed))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def hll_registers(
    df: DataFrame, col: str, p: int = 12, seed: str = "hll0"
) -> DataFrame:
    """HLL register table for the distinct values of ``col``:
    (bucket, max_rank), bucket in [0, 2^p), max_rank = max over values
    in the bucket of (leading zero count of the (60-p)-bit hash suffix
    + 1). Duplicates are harmless (max is idempotent) — no distinct
    pass needed. Exact integers → hard cross-engine oracle."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    m = 1 << p
    h = _hash60_col(col, seed)
    w_bits = HASH_BITS - p
    # w = the (60-p)-bit suffix via INTEGER division (h div m — a double
    # `/` would round h's low bits away past 2^53 and flip floor by ±1);
    # rank = leading zeros + 1 = w_bits - bit_length(w) + 1, with
    # bit_length via length(bin(w)) for w > 0; w = 0 -> w_bits + 1
    out = df.select(
        (h % m).cast("long").alias("bucket"),
        h.alias("_h"),
    ).select(
        "bucket",
        F.expr(f"_h div {m}").alias("_w"),
    ).select(
        "bucket",
        F.expr(
            f"CASE WHEN _w = 0 THEN CAST({w_bits + 1} AS BIGINT) "
            f"ELSE CAST({w_bits} - length(bin(_w)) + 1 AS BIGINT) END"
        ).alias("rank"),
    )
    return out.groupBy("bucket").agg(F.max("rank").alias("max_rank"))


def hll_registers_sql_duckdb(
    col: str, p: int = 12, seed: str = "hll0", table: str = "documents"
) -> str:
    """DuckDB twin of :func:`hll_registers` (same hash, same split,
    same bit_length-via-bin arithmetic)."""
    m = 1 << p
    w_bits = HASH_BITS - p
    h = (
        f"(('0x' || substring(md5(CAST({col} AS VARCHAR) || ':{seed}'), "
        f"1, 15))::BIGINT)"
    )
    return f"""
        WITH hashed AS (
            SELECT {h} % {m} AS bucket, {h} // {m} AS w FROM {table}
        ),
        ranked AS (
            SELECT bucket,
                   CASE WHEN w = 0 THEN CAST({w_bits + 1} AS BIGINT)
                        ELSE CAST({w_bits} - length(bin(w)) + 1 AS BIGINT)
                   END AS rank
            FROM hashed
        )
        SELECT bucket, max(rank) AS max_rank FROM ranked GROUP BY bucket
    """


def hll_estimate(registers: list[tuple[int, int]], p: int = 12) -> float:
    """Cardinality estimate from a collected register table (driver-side
    scalar — kept OUT of the distributed query so cross-engine float
    accumulation order can't perturb the hash-checked result).
    Standard HLL with the linear-counting small-range correction;
    relative error ≈ 1.04/sqrt(2^p)."""
    m = 1 << p
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    by_bucket = dict(registers)
    z = sum(2.0 ** -r for r in by_bucket.values()) + (m - len(by_bucket))
    e = alpha * m * m / z
    v = m - len(by_bucket)  # empty registers
    if e <= 2.5 * m and v > 0:
        e = m * math.log(m / v)
    return e


# ---------------------------------------------------------------------------
# Count-Min Sketch: heavy-hitter counts with a provable overestimate bound
# ---------------------------------------------------------------------------
def cms_counters(
    df: DataFrame,
    col: str,
    width: int = 2048,
    depth: int = 4,
    seed: str = "cms0",
) -> DataFrame:
    """Count-Min Sketch counter table for the values of ``col``:
    (row, bucket, cnt) with depth rows of width buckets, each row keyed
    by an independent portable hash (seed-suffixed md5 — same
    engine-replayable trick as :func:`hll_registers`). Counters are
    exact integers → hard cross-engine oracle; sketches over disjoint
    corpora merge by summing counters (pytest-pinned).

    Plan: the d row-hashes are a LITERAL explode (d tiny rows per input
    row via posexplode over the d hashes computed in one projection),
    then ONE combinable groupBy((row, bucket)) — output is d·width rows
    regardless of input size, the mergeable-sketch shape.
    """
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1, width >= 2")
    hashes = F.array(*[
        _hash60_col(col, f"{seed}:{d}") % width for d in range(depth)
    ])
    return (
        df.select(F.posexplode(hashes).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("row").cast("long").alias("row"),
            F.col("bucket").cast("long").alias("bucket"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )


def cms_counters_sql_duckdb(
    col: str,
    width: int = 2048,
    depth: int = 4,
    seed: str = "cms0",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`cms_counters` (same seed-suffixed hashes)."""
    rows = " UNION ALL ".join(
        f"SELECT {d} AS row, "
        f"(('0x' || substring(md5(CAST({col} AS VARCHAR) || ':{seed}:{d}'), "
        f"1, 15))::BIGINT % {width}) AS bucket FROM {table}"
        for d in range(depth)
    )
    return f"""
        SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM ({rows}) GROUP BY row, bucket
    """


# ---------------------------------------------------------------------------
# Bloom filter: mergeable set membership with zero false negatives
# ---------------------------------------------------------------------------
def bloom_bits(
    df: DataFrame,
    col: str,
    m_bits: int = 4096,
    k: int = 4,
    seed: str = "bloom0",
) -> DataFrame:
    """Bloom-filter set-bit table for the values of ``col``: the DISTINCT
    bit positions lit by ``k`` independent portable hashes per value
    (seed-suffixed md5 — the same engine-replayable trick as
    :func:`hll_registers` / :func:`cms_counters`). Exact integers →
    hard cross-engine oracle; filters over disjoint corpora merge by
    UNION of their bit tables (pytest-pinned), and membership has zero
    false negatives by construction.

    The 100 TB use: materialize the EVAL-set filter once (≤ m_bits
    rows), splice it as a literal predicate over the train scan
    (:func:`bloom_maybe_contains_col`) and run the exact contamination
    join only on the maybe-hits — the classic broadcast-prefilter that
    turns a shuffle of every train shingle into a shuffle of the ~fpp
    fraction that might match.

    Plan: one projection computing all k hashes, posexplode-free
    explode, ONE distinct — output ≤ m_bits rows regardless of input."""
    if k < 1 or m_bits < 2:
        raise ValueError("need k >= 1, m_bits >= 2")
    hashes = F.array(*[
        _hash60_col(col, f"{seed}:{i}") % m_bits for i in range(k)
    ])
    return (
        df.select(F.explode(hashes).alias("bit"))
        .distinct()
        .select(F.col("bit").cast("long").alias("bit"))
    )


def bloom_bits_sql_duckdb(
    col: str,
    m_bits: int = 4096,
    k: int = 4,
    seed: str = "bloom0",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`bloom_bits` (same seed-suffixed hashes)."""
    rows = " UNION ALL ".join(
        f"SELECT (('0x' || substring(md5(CAST({col} AS VARCHAR) "
        f"|| ':{seed}:{i}'), 1, 15))::BIGINT % {m_bits}) AS bit FROM {table}"
        for i in range(k)
    )
    return f"SELECT DISTINCT bit FROM ({rows})"


def bloom_contains(
    bits: set[int],
    value: str,
    m_bits: int = 4096,
    k: int = 4,
    seed: str = "bloom0",
) -> bool:
    """Driver-side membership probe against a collected bit set: True =
    maybe present (fp rate ≈ (1−e^{−kn/m})^k), False = DEFINITELY
    absent."""
    import hashlib

    for i in range(k):
        h = int(
            hashlib.md5(f"{value}:{seed}:{i}".encode()).hexdigest()[:15], 16
        )
        if h % m_bits not in bits:
            return False
    return True


def bloom_maybe_contains_col(
    col: str,
    bits: set[int],
    m_bits: int = 4096,
    k: int = 4,
    seed: str = "bloom0",
) -> Column:
    """Boolean Column: the Bloom membership probe as a pure-codegen
    expression over a LITERAL bitmap (the collected filter spliced in,
    the SRP/SQ8 literal-replay pattern) — the broadcast prefilter shape
    for 100 TB decontamination. False ⇒ definitely not in the filtered
    set; rows passing still need the exact join.

    The bitmap is packed into m_bits/64 longs probed with
    element_at + shift — O(1) per probe. (The first version spliced the
    set-bit LIST and probed with array_contains: an O(|bits|) linear
    scan per probe per row, measured 27 s on the sf0.1 contamination
    prefilter where the bitmap probe is sub-second; a flat 8192-element
    literal would also flirt with Janino's 64 KB method limit, the
    packed form is 128 longs.)"""
    words = [0] * ((m_bits + 63) // 64)
    for b in bits:
        words[int(b) >> 6] |= 1 << (int(b) & 63)
    # Spark longs are signed 64-bit
    lits = ", ".join(
        f"{w - (1 << 64) if w >= (1 << 63) else w}L" for w in words
    )
    arr = f"array({lits})"
    cond = None
    for i in range(k):
        # SQL text throughout: pyspark's shiftrightunsigned wrapper
        # rejects a per-row numBits Column, the SQL function takes one
        h = (
            f"cast(conv(substring(md5(concat(cast({col} as string), "
            f"':{seed}:{i}')), 1, 15), 16, 10) as bigint)"
        )
        p = f"pmod({h}, {m_bits})"
        word = f"element_at({arr}, cast(({p} div 64) as int) + 1)"
        c = F.expr(
            f"(shiftrightunsigned({word}, cast(pmod({p}, 64) as int)) & 1) = 1"
        )
        cond = c if cond is None else (cond & c)
    return cond


def cms_estimate(
    counters: list[tuple[int, int, int]],
    value: str,
    width: int = 2048,
    depth: int = 4,
    seed: str = "cms0",
) -> int:
    """Point estimate for one value from a collected counter table:
    min over rows of that value's counter (never underestimates; over
    by at most e·N/width with prob 1−e^−depth). Driver-side — the
    distributed artifact is the exact counter table."""
    import hashlib

    table: dict[tuple[int, int], int] = {
        (r, b): c for r, b, c in counters
    }
    est = None
    for d in range(depth):
        h = int(
            hashlib.md5(f"{value}:{seed}:{d}".encode()).hexdigest()[:15], 16
        )
        c = table.get((d, h % width), 0)
        est = c if est is None else min(est, c)
    return int(est or 0)
