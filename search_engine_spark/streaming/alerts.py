"""Streaming saved-search alerts: percolate new turns as they arrive.

The end-to-end composition of the two halves the engine already has —
the Structured-Streaming drain (streaming/incremental.py, ST1) and the
percolator reverse search (operators/query.percolate) — into the
standard alerting shape: users STORE queries ("tell me when a turn
matching X arrives"), a stream job matches every NEW turn against all
stored queries, and hits append to a durable alert log
(Elasticsearch's percolator + watcher pattern).

Scale shape: each micro-batch builds its postings with the refresher's
zero-shuffle per-partition transform, then percolate runs ONE
IN-pruned aggregate over the BATCH's postings only — cost is
O(new turns × stored-query vocabulary), never the corpus and never
the index. The alert log is an append-only parquet dir (per-epoch
files, exactly-once via the streaming checkpoint). Alert rows carry
the turn's (conv_id, turn_idx, role, ts) so a consumer never needs a
doc-store lookup.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import (
    build_postings_no_shuffle,
)
from search_engine_spark.operators.query import percolate
from search_engine_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from search_engine_spark.streaming.incremental import streamed_doc_id_col

ALERTS_DIR = "alerts"


def load_stored_queries(path: str) -> dict[int, str]:
    """Parse a stored-query file: one ``qid<TAB>query`` (or
    ``qid query``) per line, ``#`` comments — the format
    ``search.py --percolate`` and ``refresh_index.py --alert-queries``
    share."""
    stored: dict[int, str] = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            qid, _, text = line.partition("\t")
            if not text:
                qid, _, text = line.partition(" ")
            stored[int(qid)] = text.strip()
    return stored


def percolate_batch(
    turns: DataFrame,
    stored: dict[int, str],
    min_match_frac: float = 1.0,
) -> DataFrame:
    """Match one batch of transcript turns against the stored queries.
    Returns (query_id, conv_id, turn_idx, role, ts, n_matched) — one
    row per (stored query, matching turn)."""
    docs = turns.withColumn("doc_id", streamed_doc_id_col())
    postings = build_postings_no_shuffle(docs)
    hits = percolate(postings, stored, min_match_frac=min_match_frac)
    return hits.join(
        docs.select("doc_id", "conv_id", "turn_idx", "role", "ts"), "doc_id"
    ).select("query_id", "conv_id", "turn_idx", "role", "ts", "n_matched")


def streaming_percolate_alerts(
    spark: SparkSession,
    input_dir: str,
    alert_root: str,
    stored: dict[int, str],
    min_match_frac: float = 1.0,
    checkpoint_dir: str | None = None,
) -> int:
    """Drain new transcript parquet files from ``input_dir``
    (Trigger.AvailableNow — run it from cron/the refresher loop; a
    continuous trigger is the same code) and append percolator matches
    to ``<alert_root>/alerts``. The streaming checkpoint makes the
    drain exactly-once per input file; the sink partitions by
    ``epoch`` with dynamic partition overwrite so a crash between the
    write and the checkpoint commit replays the SAME epoch onto the
    SAME partition instead of appending duplicates — the output is
    idempotent per epoch, i.e. effectively exactly-once end to end.
    Returns the number of alert rows written this run."""
    checkpoint_dir = checkpoint_dir or os.path.join(
        alert_root, "_alerts_checkpoint"
    )
    out_dir = os.path.join(alert_root, ALERTS_DIR)
    appended = {"n": 0}

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        alerts = percolate_batch(
            batch_df, stored, min_match_frac=min_match_frac
        ).withColumn("epoch", F.lit(int(epoch_id)))
        # idempotent sink: dynamic partition overwrite touches ONLY
        # this epoch's partition, so a post-write pre-commit crash
        # replays onto the same partition instead of duplicating rows
        alerts = alerts.persist()
        (alerts.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("epoch").parquet(out_dir))
        appended["n"] += alerts.count()
        alerts.unpersist()

    q = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .parquet(input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return appended["n"]
