"""Transcript ingestion: JSONL / CSV / parquet → the canonical corpus dir.

LLM-transcript corpora arrive as JSON-lines exports (one turn per
line) or CSV dumps far more often than as ready parquet; this module
is the landing zone that turns any of them into the engine's canonical
input — the TRANSCRIPT_SCHEMA parquet dir the build job consumes
(reference analog: the crawler's staging write into ``page_container``,
DBWriter.java:86-138, generalized to file formats; invalid rows follow
the ST5 dead-letter path instead of poisoning the build).

What one ingest run guarantees about its output dir:

- schema == sources/transcripts.TRANSCRIPT_SCHEMA exactly;
- every row satisfies the transcript contract (non-null key, non-empty
  bounded text, 0x00-scrubbed — sources/dead_letter.split_valid);
- (conv_id, turn_idx) is UNIQUE — the docID bijection invariant the
  index build depends on. Duplicate keys keep one deterministic winner
  (earliest ts, then lexicographic text/role — re-running ingest over
  the same input picks the same rows); losers are dead-lettered with
  reason ``duplicate_key``;
- files are globally sorted by (conv_id, turn_idx), so
  docids.docs_from_sorted_dir PROVES the layout sorted and the build
  takes the zero-shuffle presorted docID path.

Scale shape: malformed-record capture and contract classification are
projections on the scan; the dedup window and the sorted write share
ONE range exchange on the sort key (RangePartitioning satisfies the
window's clustering requirement, so Catalyst inserts no second
shuffle). Dead letters append per-run parquet files, never rewritten.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_spark.sources.dead_letter import (
    MAX_TEXT_CHARS,
    split_valid,
)
from search_engine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

_CORRUPT = "_corrupt_record"

# reader-facing schema: every data field nullable (missing fields are a
# CONTRACT failure diverted with a reason, not a reader crash) plus the
# malformed-record capture column
_READ_SCHEMA = T.StructType(
    [T.StructField(f.name, f.dataType, True) for f in TRANSCRIPT_SCHEMA]
    + [T.StructField(_CORRUPT, T.StringType(), True)]
)

FORMATS = ("jsonl", "csv", "parquet")


def read_raw(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    """Format-specific permissive read: structurally broken lines land
    in ``_corrupt_record`` instead of failing the job (the JSON/CSV
    readers' PERMISSIVE mode), typed fields that fail conversion
    likewise. Parquet is already typed — no corrupt column."""
    if fmt == "jsonl":
        return spark.read.schema(_READ_SCHEMA).option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", _CORRUPT
        ).json(path)
    if fmt == "csv":
        return spark.read.schema(_READ_SCHEMA).option("header", "true").option(
            "mode", "PERMISSIVE"
        ).option("columnNameOfCorruptRecord", _CORRUPT).csv(path)
    if fmt == "parquet":
        return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path).withColumn(
            _CORRUPT, F.lit(None).cast("string")
        )
    raise ValueError(f"unknown ingest format {fmt!r} (one of {FORMATS})")


def ingest_transcripts(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    fmt: str = "jsonl",
    dead_letter_dir: str | None = None,
    max_text_chars: int = MAX_TEXT_CHARS,
    partitions: int | None = None,
) -> dict:
    """Land a raw transcript export as the canonical sorted parquet dir.

    Returns a counts dict ``{rows_in, rows_out, dead_malformed,
    dead_contract, dead_duplicate}`` — the audit line a pipeline run
    records. ``partitions`` overrides the range-exchange width (default:
    session shuffle partitions)."""
    raw = read_raw(spark, input_path, fmt)
    # One pass, three-way split. The corrupt column may only be
    # referenced alongside the full row (Spark guards against
    # corrupt-column-only plans), which this projection satisfies.
    raw = raw.withColumn(
        "_malformed",
        F.col(_CORRUPT).isNotNull()
        # a JSONL line that is valid JSON but not an object parses to
        # all-null fields with no corrupt record on some reader paths —
        # treat all-null rows as malformed, not as a null-key contract
        # violation
        | (
            F.col("conv_id").isNull()
            & F.col("turn_idx").isNull()
            & F.col("text").isNull()
        ),
    )
    malformed = raw.filter(F.col("_malformed")).select(
        F.coalesce(F.col(_CORRUPT), F.to_json(F.struct(
            *[F.col(f.name) for f in TRANSCRIPT_SCHEMA]
        ))).alias("raw_record"),
        F.lit("malformed_record").alias("reason"),
    )
    shaped = raw.filter(~F.col("_malformed")).select(
        *[F.col(f.name).cast(f.dataType) for f in TRANSCRIPT_SCHEMA]
    )
    valid, dead_contract = split_valid(shaped, max_text_chars=max_text_chars)

    # Deterministic duplicate-key resolution: winner = earliest ts
    # (nulls last), then lexicographic text/role — stable under re-runs
    # and reader parallelism. The window's clustering requirement is
    # satisfied by the range exchange below, so dedup + sorted write
    # cost one shuffle total.
    n_parts = partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = valid.repartitionByRange(n_parts, "conv_id", "turn_idx")
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("ts").asc_nulls_last(),
        F.col("text").asc_nulls_last(),
        F.col("role").asc_nulls_last(),
    )
    tagged = ranged.withColumn("_rn", F.row_number().over(w))
    winners = (
        tagged.filter(F.col("_rn") == 1)
        .drop("_rn")
        .sortWithinPartitions("conv_id", "turn_idx")
    )
    dupes = tagged.filter(F.col("_rn") > 1).drop("_rn").withColumn(
        "reason", F.lit("duplicate_key")
    )

    winners.write.mode("overwrite").parquet(output_dir)

    # Audit counts without extra input scans: the good sink's count
    # comes from the written parquet footers; the dead side is one
    # second pass over the input (one pass per sink — at 100 TB you'd
    # persist the tagged scan or drive both sinks from foreachBatch),
    # and rows_in is derived, never re-scanned.
    run_id = f"ingest_{int(time.time() * 1000)}"
    # one append-only parquet log per run: contract + duplicate rows
    # keep their fields (as JSON), malformed rows carry the raw record
    dead_rows = (
        dead_contract.select(
            F.to_json(F.struct(
                *[F.col(f.name) for f in TRANSCRIPT_SCHEMA]
            )).alias("raw_record"),
            "reason",
        )
        .unionByName(dupes.select(
            F.to_json(F.struct(
                *[F.col(f.name) for f in TRANSCRIPT_SCHEMA]
            )).alias("raw_record"),
            "reason",
        ))
        .unionByName(malformed)
        .withColumn("run_id", F.lit(run_id))
    )
    if dead_letter_dir is not None:
        dead_rows.write.mode("append").parquet(dead_letter_dir)
        logged = spark.read.parquet(dead_letter_dir).filter(
            F.col("run_id") == run_id
        )
        by_reason = {
            r["reason"]: int(r["n"])
            for r in logged.groupBy("reason").agg(
                F.count("*").alias("n")
            ).collect()
        }
    else:
        by_reason = {
            r["reason"]: int(r["n"])
            for r in dead_rows.groupBy("reason").agg(
                F.count("*").alias("n")
            ).collect()
        }
    out = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(output_dir)
    counts = {
        "rows_out": out.count(),
        "dead_malformed": by_reason.get("malformed_record", 0),
        "dead_duplicate": by_reason.get("duplicate_key", 0),
    }
    counts["dead_contract"] = sum(
        n for r, n in by_reason.items()
        if r not in ("malformed_record", "duplicate_key")
    )
    counts["rows_in"] = (
        counts["rows_out"] + counts["dead_malformed"]
        + counts["dead_contract"] + counts["dead_duplicate"]
    )
    return counts
