"""Incremental index refresh via Structured Streaming.

Reference analog: the reference supports continuous crawl + single-page
re-index (/api/indexPage deletes and re-inserts one URL's postings —
Parser.java:181-256) and resumable indexing via its keep_link state
table (ST1-ST4 in SURVEY.md §2.7). The exact single-doc delete+reinsert
(ST4) lives in sources/index_store.reindex_turn; this module covers the
append-only streaming refresh. Our input is a table, so "new pages
arrive" = new files/snapshots in the transcript location. The stream:

    readStream(new transcript files)
      → same tokenize/explode/aggregate lineage as the batch build
      → foreachBatch: append postings + doclen increments, then
        merge the term dictionary (df/cf adds)

``Trigger.AvailableNow`` drains whatever is new and stops — the
batch-incremental pattern (Iceberg incremental scans between snapshots
would slot in the same place). Checkpointing makes re-runs exactly-once
per input file; doc ids for streamed docs are allocated from a
collision-free high bit-range keyed by (conv_id, turn_idx) hash since a
global rank over an unbounded stream is ill-defined.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import (
    build_postings_no_shuffle,
    role_weight_col,
)
from search_engine_spark.sources.transcripts import TRANSCRIPT_SCHEMA


# streamed ids live in [2^62, 2^63) — disjoint from any dense batch id.
# sources/index_store.compact_index folds them back into the dense space.
STREAM_ID_BASE = 1 << 62


def streamed_doc_id_col() -> F.Column:
    """Stable 63-bit id for streamed docs: top bit set + xxhash64 of the
    natural key (avoids coordinating with the batch dense-id space)."""
    return (
        F.shiftrightunsigned(F.xxhash64("conv_id", "turn_idx"), 1)
        .bitwiseOR(F.lit(STREAM_ID_BASE).cast("long"))
        .alias("doc_id")
    )


def dedup_streamed_turns(
    stream: DataFrame,
    watermark: str = "10 minutes",
    keys: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Streaming exact dedup: drop turns whose ``keys`` (content by
    default) already arrived within the watermark horizon —
    ``dropDuplicatesWithinWatermark``, the stateful streaming analog of
    the batch :func:`~search_engine_spark.operators.dedup.
    drop_exact_duplicates`. State is bounded by the watermark (entries
    expire once late data can no longer collide), which is the property
    that makes content dedup feasible on an unbounded 100 TB ingest —
    an unwindowed distinct would grow state forever. Exactly-one-
    SURVIVOR semantics per key per horizon; which duplicate survives is
    arrival order (the streaming contract), so this is an ingest
    throttle, not the deterministic batch keeper selection."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def incremental_index_refresh(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str | None = None,
    dedupe: bool = False,
    dedup_watermark: str = "10 minutes",
) -> None:
    """Drain new transcript parquet files into postings/doclen/terms
    deltas. ``dedupe=True`` inserts the streaming content dedup
    (:func:`dedup_streamed_turns`) before indexing, so byte-identical
    turns arriving within the watermark index once."""
    checkpoint_dir = checkpoint_dir or os.path.join(index_dir, "_stream_checkpoint")
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    )
    if dedupe:
        stream = dedup_streamed_turns(stream, dedup_watermark)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # contract-violating rows → dead-letter registry, not the index
        # (ST5; reference ERROR_LINK parking, Parser.java:285-292)
        from search_engine_spark.sources.dead_letter import (
            split_valid,
            write_dead_letters,
        )

        batch_df, dead = split_valid(batch_df)
        if not dead.isEmpty():
            write_dead_letters(dead, index_dir, run_id=f"epoch_{epoch_id}")
        docs = batch_df.withColumn("doc_id", streamed_doc_id_col())
        # doc store for streamed turns (content lookup pre-compaction).
        # A separate dir: the main docs table may store _mid (spilled
        # build) or live by reference in the input dir (presorted build)
        # — appending doc_id-schema rows there would mix schemas.
        docs.write.mode("append").parquet(os.path.join(index_dir, "docs_stream"))
        postings = build_postings_no_shuffle(
            docs, weight_col=role_weight_col("role")
        )
        # sibling delta dirs, NOT the base tables: the v4 base tables
        # are bucket-partitioned by dense doc range (index_store) —
        # appending loose hash-range-id files there would corrupt
        # partition discovery. DiskIndex serves base ∪ stream until
        # compact_index folds the deltas back.
        postings.write.mode("append").parquet(
            os.path.join(index_dir, "postings_stream")
        )
        postings.groupBy("doc_id").agg(F.first("dl").alias("dl")).write.mode(
            "append"
        ).parquet(os.path.join(index_dir, "doclen_stream"))
        # dictionary delta: df/cf adds for this epoch (merged on read or
        # by a periodic compaction — MERGE INTO once Iceberg is present)
        delta = postings.groupBy("lemma").agg(
            F.count("*").alias("df"), F.sum("tf").cast("long").alias("cf")
        )
        delta.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(
            os.path.join(index_dir, "terms_delta")
        )

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def merged_terms(spark: SparkSession, index_dir: str) -> DataFrame:
    """Dictionary view folding streamed deltas into the base terms table."""
    base = spark.read.parquet(os.path.join(index_dir, "terms")).select(
        "lemma", "df", "cf"
    )
    delta_path = os.path.join(index_dir, "terms_delta")
    if not os.path.isdir(delta_path):
        return base
    delta = spark.read.parquet(delta_path).select("lemma", "df", "cf")
    return (
        base.unionByName(delta)
        .groupBy("lemma")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
    )


def windowed_turn_rates(transcripts_stream: DataFrame) -> DataFrame:
    """Streaming ops coverage: event-time windowed turn counts per role
    with late-data watermarking (10 min) — the standard watermark +
    window aggregation shape over the ts column."""
    return (
        transcripts_stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "role")
        .agg(F.count("*").alias("n_turns"))
    )


def windowed_term_counts(
    transcripts_stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming per-window LEMMA counts — what terms the corpus is
    talking about, per event-time window, tolerant of late arrivals:
    explode the JVM lemma stream (pure codegen, no Python in the
    streaming hot path) under a watermark, then the standard windowed
    count. In append mode each (window, lemma, n) row is emitted
    exactly once, when the watermark passes the window end — the sink
    feeds :func:`~search_engine_spark.operators.serving.trending` for
    rising-term ranking (rank-over-window is not expressible inside a
    streaming agg; the split is the standard two-tier design)."""
    from search_engine_spark.functions.text import lemmas_col

    return (
        transcripts_stream.withWatermark("ts", watermark)
        .select("ts", F.explode(lemmas_col("text")).alias("lemma"))
        .groupBy(F.window("ts", window), "lemma")
        .agg(F.count("*").alias("n"))
    )
