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
    n1 = spark.read.parquet(os.path.join(index_dir, "postings")).count()
    incremental_index_refresh(spark, input_dir, index_dir)  # no new files
    n2 = spark.read.parquet(os.path.join(index_dir, "postings")).count()
    assert n1 == n2


def test_merged_terms_equals_batch_rebuild(spark, dirs):
    _, index_dir = dirs
    merged = {r["lemma"]: (r["df"], r["cf"]) for r in merged_terms(spark, index_dir).collect()}
    full = build_index(synthesize_transcripts(spark, 90, partitions=2),
                       use_arrow_udf=False)
    want = {r["lemma"]: (r["df"], r["cf"]) for r in full.terms.collect()}
    assert merged == want
