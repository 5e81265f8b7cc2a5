"""Streaming ANN index refresh via Structured Streaming.

The vector twin of :mod:`incremental` (which keeps the FULLTEXT index
fresh): embeddings arrive continuously — new files land in the
embedding table's location — and the persistent disk ANN index
(:func:`~search_engine_spark.operators.similarity.write_srp_index` /
``write_ivf_index``) must stay queryable without a rebuild. Reference
analog: the reference's continuous crawl keeps its postings fresh per
page (Parser.java:181-256); here the continuously-arriving unit is a
vector and the index is the partition-pruned ANN directory.

Shape::

    readStream(new embedding parquet files)
      → foreachBatch: partition-bounded append
        (append_srp_index / append_ivf_index — only the (table, bgroup)
         or cluster dirs that received rows are rewritten)

``Trigger.AvailableNow`` drains whatever is new and stops; the stream
checkpoint makes re-runs exactly-once per input FILE. Exactly-once per
VECTOR additionally needs duplicate handling, because a producer may
re-emit an id in a later file: ``on_duplicate="skip"`` anti-joins the
batch against the index's ids-only column scan (the checked-append
price), ``"error"`` fails the stream loudly (the batch append's
default contract), ``"allow"`` trusts the producer, and ``"upsert"``
treats a re-emitted id as a RE-EMBEDDING (delete the old assignment,
append the new — both partition-bounded). The append path is
O(delta + affected partition dirs), never O(index) — the property that
makes continuous refresh viable on a 100 TB vector table where a
rebuild is a day-scale job.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_spark.operators.similarity import (
    append_ivf_index,
    append_srp_index,
    delete_from_ann_index,
)

# (vec_id, embedding) is the index contract; label rides along unused.
EMBEDDING_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def read_ann_meta(index_dir: str) -> dict:
    """The index's recorded build parameters (_ann_meta.json, written by
    jobs/ann.py build) — method + hashing params, so the refresh never
    needs them repeated and can't silently bucket with the wrong
    hyperplanes."""
    with open(os.path.join(index_dir, "_ann_meta.json")) as fh:
        return json.load(fh)


def _drop_already_indexed(batch: DataFrame, index_dir: str) -> DataFrame:
    """Keep only ids the index has never seen: ids-only column scan of
    the index, broadcast-anti-joined against the (small) batch. The
    batch side broadcasts, not the index side — the index's id column
    is unbounded."""
    spark = batch.sparkSession
    existing = spark.read.parquet(index_dir).select("vec_id").distinct()
    # broadcast the batch ids into the index scan, collect the hits,
    # then anti-join those hits (tiny) back: two small driver-safe steps
    hits = existing.join(
        F.broadcast(batch.select("vec_id").distinct()), "vec_id"
    )
    return batch.join(F.broadcast(hits), "vec_id", "left_anti")


def append_ann_batch(
    batch: DataFrame, index_dir: str, meta: dict,
    on_duplicate: str = "skip",
) -> list:
    """One micro-batch into the disk index: within-batch id dedup, then
    the duplicate policy, then the partition-bounded append for the
    index's recorded family. Returns the affected partition keys
    (cluster ids for IVF, (table, bgroup) pairs for SRP)."""
    if on_duplicate not in ("skip", "error", "allow", "upsert"):
        raise ValueError(f"on_duplicate={on_duplicate!r}")
    if on_duplicate == "upsert":
        return upsert_ann_batch(batch, index_dir, meta)
    batch = batch.dropDuplicates(["vec_id"])
    if on_duplicate == "skip":
        batch = _drop_already_indexed(batch, index_dir).localCheckpoint()
        if batch.isEmpty():
            return []
    check = on_duplicate == "error"
    if meta["method"] == "pq":
        from search_engine_spark.operators.similarity import (
            append_ivfpq_index,
        )

        return append_ivfpq_index(batch, index_dir, check_duplicates=check)
    if meta["method"] == "ivf":
        return append_ivf_index(batch, index_dir, check_duplicates=check)
    return append_srp_index(
        batch, index_dir, dim=meta["dim"], n_planes=meta["n_planes"],
        n_tables=meta["n_tables"], group_bits=meta["group_bits"],
        check_duplicates=check,
    )


def upsert_ann_batch(
    batch: DataFrame, index_dir: str, meta: dict, snapshot: bool = True,
) -> list:
    """Re-embedded vectors: delete the ids' OLD assignments, then append
    the new ones — both halves partition-bounded, so an upsert costs
    O(old partitions + new partitions), never O(index). The window
    between the two swaps serves neither version (an id briefly absent
    beats briefly double-served: ANN probes tolerate a missing
    candidate, not a stale duplicate outranking the fresh one). The
    delete half snapshots the pre-state by default — a continuously
    upserting stream should pair this with periodic
    ``index_store.expire_snapshots`` (or pass snapshot=False)."""
    batch = batch.dropDuplicates(["vec_id"])
    ids = [int(r["vec_id"]) for r in batch.select("vec_id").collect()]
    if len(ids) > 20_000:
        raise ValueError(
            f"upsert batch of {len(ids)} ids exceeds the delete IN-list "
            "bound (~10^4) — bound micro-batches with max_files_per_batch "
            "(maxFilesPerTrigger), or rebuild instead of upserting a bulk "
            "re-embed"
        )
    spark = batch.sparkSession
    delete_from_ann_index(spark, index_dir, ids, snapshot=snapshot)
    return append_ann_batch(batch, index_dir, meta, on_duplicate="allow")


def incremental_ann_refresh(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str | None = None,
    on_duplicate: str = "skip",
    max_files_per_batch: int | None = None,
) -> dict:
    """Drain new embedding parquet files into the ANN index. The
    checkpoint lives OUTSIDE the index dir's partition tree (sibling
    ``_stream_checkpoint`` — underscore-prefixed so parquet directory
    listing ignores it, same convention as _ann_meta.json).
    ``max_files_per_batch`` caps each micro-batch (maxFilesPerTrigger —
    AvailableNow still drains EVERYTHING, in bounded batches): set it
    when draining a large backfill, mandatory territory for the upsert
    policy whose per-batch delete is IN-list-bounded. Returns
    {"batches": n, "affected_partitions": total} — O(delta) bookkeeping
    only, no index scans."""
    meta = read_ann_meta(index_dir)
    checkpoint_dir = checkpoint_dir or os.path.join(
        index_dir, "_stream_checkpoint"
    )
    # streams need an explicit schema; take it from the files already in
    # the location (float32 and float64 embedding tables both occur) and
    # fall back to the canonical shape for an initially-empty dir.
    try:
        schema = spark.read.parquet(input_dir).schema
    except Exception:
        schema = EMBEDDING_STREAM_SCHEMA
    reader = spark.readStream.schema(schema)
    if max_files_per_batch:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_batch))
    stream = reader.parquet(input_dir)
    totals = {"batches": 0, "affected_partitions": 0}

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        affected = append_ann_batch(
            batch_df, index_dir, meta, on_duplicate=on_duplicate
        )
        totals["batches"] += 1
        totals["affected_partitions"] += len(affected)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return totals
