"""Incremental refresh (streaming/incremental.py): AvailableNow drain is
exactly-once per file; merged dictionary == batch rebuild over the union."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.corpus import synthesize_transcripts
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.sources.index_store import write_index
from search_engine_spark.streaming.incremental import (
    incremental_index_refresh,
    merged_terms,
)


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    input_dir = str(base / "incoming")
    index_dir = str(base / "index")
    # batch build over convs [0, 60)
    batch = synthesize_transcripts(spark, 60, partitions=2)
    write_index(build_index(batch, use_arrow_udf=False), index_dir,
                input_desc="convs<60", bucket_width=512)
    # stream in convs [60, 90) as a new parquet file
    delta = synthesize_transcripts(spark, 90, partitions=2).filter(
        F.col("conv_id") >= "conv-00000060"
    )
    delta.write.mode("overwrite").parquet(input_dir)
    incremental_index_refresh(spark, input_dir, index_dir)
    return input_dir, index_dir


def test_stream_appends_postings(spark, dirs):
    _, index_dir = dirs
    assert os.path.isdir(os.path.join(index_dir, "terms_delta"))


def test_rerun_is_exactly_once(spark, dirs):
    input_dir, index_dir = dirs
    # streamed postings land in the sibling delta dir (v4 layout)
    n1 = spark.read.parquet(os.path.join(index_dir, "postings_stream")).count()
    assert n1 > 0
    incremental_index_refresh(spark, input_dir, index_dir)  # no new files
    n2 = spark.read.parquet(os.path.join(index_dir, "postings_stream")).count()
    assert n1 == n2


def test_merged_terms_equals_batch_rebuild(spark, dirs):
    _, index_dir = dirs
    merged = {r["lemma"]: (r["df"], r["cf"]) for r in merged_terms(spark, index_dir).collect()}
    full = build_index(synthesize_transcripts(spark, 90, partitions=2),
                       use_arrow_udf=False)
    want = {r["lemma"]: (r["df"], r["cf"]) for r in full.terms.collect()}
    assert merged == want


def test_sessionize_stateful_timeout(spark, tmp_path):
    """applyInPandasWithState sessionizer: a conversation's summary row
    is emitted only after the watermark passes its last turn + gap, and
    its counts match the raw turns (streaming/sessionize.py)."""
    import datetime

    from search_engine_spark.streaming.sessionize import (
        run_sessionize_batchwise,
    )

    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def rows(conv, ts_offsets, role="user"):
        return [
            (conv, i, role if i % 2 == 0 else "assistant", f"turn {i} text",
             None, base + datetime.timedelta(seconds=off))
            for i, off in enumerate(ts_offsets)
        ]

    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    # batch 1: conv A finishes early; conv B still active
    spark.createDataFrame(
        rows("conv-A", [0, 10, 20]) + rows("conv-B", [500]), schema
    ).write.mode("overwrite").parquet(input_dir)
    run_sessionize_batchwise(spark, input_dir, out_dir, ckpt, gap_seconds=60)

    # batch 2: much later turns for conv B → watermark passes A's gap
    spark.createDataFrame(
        rows("conv-B", [900, 950]), schema
    ).write.mode("append").parquet(input_dir)
    run_sessionize_batchwise(spark, input_dir, out_dir, ckpt, gap_seconds=60)

    import os

    assert os.path.isdir(out_dir)
    got = {r["conv_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert "conv-A" in got  # quiesced → emitted exactly once
    a = got["conv-A"]
    assert a["n_turns"] == 3 and a["n_user"] == 2 and a["n_assistant"] == 1
    assert a["last_ts"] - a["first_ts"] == 20_000  # ms
    assert a["total_chars"] == sum(len(f"turn {i} text") for i in range(3))
    # conv B's last turn is within the gap of the final watermark → open
    assert "conv-B" not in got


def test_windowed_term_counts_and_trending(spark, tmp_path):
    """Streaming windowed lemma counts (availableNow drain) must equal
    the batch groupBy over the same files; trending over the sink ranks
    the rising term first (growth vs previous observed window)."""
    import datetime

    from search_engine_spark.operators.serving import trending
    from search_engine_spark.streaming.incremental import (
        windowed_term_counts,
    )

    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    input_dir = str(tmp_path / "in")
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    rows = []
    # window 1 (12:00-12:05): alpha x2, beta x1 ; window 2: alpha x1, beta x4
    for i, (off, text) in enumerate(
        [(0, "alpha alpha beta"), (60, "alpha"),
         (300, "beta beta"), (360, "beta beta alpha")]
    ):
        rows.append(("conv-X", i, "user", text, None,
                     base + datetime.timedelta(seconds=off)))
    spark.createDataFrame(rows, schema).write.parquet(input_dir)

    stream = spark.readStream.schema(schema).parquet(input_dir)
    sink = str(tmp_path / "sink")
    (windowed_term_counts(stream, window="5 minutes", watermark="0 seconds")
     .writeStream.format("parquet")
     .option("path", sink)
     .option("checkpointLocation", str(tmp_path / "ckpt"))
     .trigger(availableNow=True)
     .outputMode("append").start().awaitTermination())

    got = {(r["window"]["start"].minute, r["lemma"]): r["n"]
           for r in spark.read.parquet(sink).collect()}
    # append mode only emits windows the final watermark has passed;
    # with a 0s watermark the last event (12:06) closes window 1 only
    assert got == {(0, "alpha"): 3, (0, "beta"): 1}

    # batch tier: counts from BOTH windows (batch groupBy), trending
    # ranks beta (growth 4-1=3) over alpha (1-3=-2) in window 2
    batch = spark.read.parquet(input_dir)
    counts = windowed_term_counts(batch.withWatermark("ts", "0 seconds"),
                                  window="5 minutes").select(
        F.col("window.start").alias("window_start"), "lemma", "n")
    top = trending(counts, key_col="lemma", top=2).collect()
    w2 = [r for r in top if r["window_start"].minute == 5]
    assert [(r["lemma"], r["growth"], r["rank"]) for r in w2] == [
        ("beta", 3, 1), ("alpha", -2, 2)]
    w1 = [r for r in top if r["window_start"].minute == 0]
    # first window: growth == n (no prior window)
    assert [(r["lemma"], r["growth"]) for r in w1] == [("alpha", 3), ("beta", 1)]


def test_streaming_dedup_drops_duplicate_content(spark, tmp_path):
    """dedupe=True: byte-identical turn texts arriving in one horizon
    index exactly once; distinct texts all survive."""
    import datetime

    from search_engine_spark.streaming.incremental import (
        incremental_index_refresh,
    )

    input_dir = str(tmp_path / "in")
    index_dir = str(tmp_path / "idx")
    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("c1", 0, "user", "alpha beta gamma", "", base),
        ("c2", 0, "user", "alpha beta gamma", "", base),  # exact dup
        ("c3", 0, "user", "delta epsilon zeta", "", base),
        ("c3", 1, "tool", "alpha beta gamma", "", base),  # dup again
    ]
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    spark.createDataFrame(rows, schema).write.parquet(input_dir)
    incremental_index_refresh(spark, input_dir, index_dir, dedupe=True)

    docs = spark.read.parquet(os.path.join(index_dir, "docs_stream"))
    texts = [r["text"] for r in docs.collect()]
    assert sorted(set(texts)) == ["alpha beta gamma", "delta epsilon zeta"]
    assert len(texts) == 2  # one survivor per distinct content
    # postings cover exactly the surviving docs
    p = spark.read.parquet(os.path.join(index_dir, "postings_stream"))
    assert p.select("doc_id").distinct().count() == 2
