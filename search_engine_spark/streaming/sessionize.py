"""Custom stateful streaming operator: conversation sessionization via
``applyInPandasWithState``.

Reference analog: the crawler declares a site DONE when its frontier
goes quiescent (no in-flight links left — Parser.java:350-381). For an
unbounded stream of transcript turns the same idea is an EVENT-TIME
session: per-conversation state folds arriving turns, and when the
watermark passes ``last_ts + gap`` the conversation is declared complete
and ONE summary row is emitted (then the state is dropped — bounded
memory regardless of stream length).

This is the engine's arbitrary-stateful-processing surface (beyond the
watermark+window aggregations in incremental.py): per-key mutable state,
event-time timeouts, Arrow-batched. At scale state is partitioned by
conv_id across executors and checkpointed by Structured Streaming.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "conv_id string, n_turns long, n_user long, n_assistant long, "
    "total_chars long, first_ts long, last_ts long"
)
_STATE_SCHEMA = (
    "n_turns long, n_user long, n_assistant long, total_chars long, "
    "first_ts long, last_ts long"
)


def _fold(pdfs: Iterator[pd.DataFrame], prev: tuple | None) -> tuple:
    n, nu, na, chars = 0, 0, 0, 0
    first_ts, last_ts = None, None
    if prev is not None:
        n, nu, na, chars, first_ts, last_ts = prev
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        nu += int((pdf["role"] == "user").sum())
        na += int((pdf["role"] == "assistant").sum())
        chars += int(pdf["text"].str.len().fillna(0).sum())
        ts_ms = (pdf["ts"].astype("int64") // 1_000_000)
        lo, hi = int(ts_ms.min()), int(ts_ms.max())
        first_ts = lo if first_ts is None else min(first_ts, lo)
        last_ts = hi if last_ts is None else max(last_ts, hi)
    return n, nu, na, chars, first_ts, last_ts


def sessionize_conversations(
    turns_stream: DataFrame, gap_seconds: int = 600
) -> DataFrame:
    """Streaming turns → one summary row per conversation, emitted when
    the event-time watermark passes its last turn + gap (quiescence)."""
    gap_ms = gap_seconds * 1000

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            n, nu, na, chars, first_ts, last_ts = state.get
            state.remove()
            yield pd.DataFrame([{
                "conv_id": conv_id, "n_turns": n, "n_user": nu,
                "n_assistant": na, "total_chars": chars,
                "first_ts": first_ts, "last_ts": last_ts,
            }])
            return
        prev = state.get if state.exists else None
        folded = _fold(pdfs, prev)
        state.update(folded)
        # complete when no new turn arrives within gap (event time)
        state.setTimeoutTimestamp(folded[5] + gap_ms)
        yield pd.DataFrame(
            columns=["conv_id", "n_turns", "n_user", "n_assistant",
                     "total_chars", "first_ts", "last_ts"]
        )

    return (
        turns_stream.withWatermark("ts", f"{gap_seconds} seconds")
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessionize_batchwise(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 600,
) -> None:
    """Drain available input files through the sessionizer, appending
    completed-conversation rows to ``output_dir`` (foreachBatch sink:
    update-mode stateful output + parquet append)."""
    from search_engine_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    sessions = sessionize_conversations(stream, gap_seconds)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.isEmpty():
            batch_df.write.mode("append").parquet(output_dir)

    q = (
        sessions.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
