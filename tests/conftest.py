"""Shared fixtures: one session-scoped local SparkSession + tiny corpora."""

from __future__ import annotations

import pytest

from search_engine_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        "tests",
        cpus=4,
        shuffle_partitions=8,
        extra_conf={
            "spark.driver.memory": "4g",
            "spark.sql.warehouse.dir": "/tmp/se_spark_test_wh",
        },
    )
    yield s


@pytest.fixture(scope="session")
def tiny_transcripts(spark):
    """Deterministic 200-conversation corpus (~4k turns) with hot terms
    and planted needles — shared by index/query/invariant tests."""
    from search_engine_spark.corpus import synthesize_transcripts

    return synthesize_transcripts(spark, 200, partitions=4).cache()


@pytest.fixture(scope="session")
def tiny_index(spark, tiny_transcripts):
    from search_engine_spark.operators.index_build import build_index

    return build_index(tiny_transcripts, use_arrow_udf=False, weighted=True)


@pytest.fixture(scope="session")
def py_twin(tiny_index):
    """Single-node golden index over the same docs (id -> text/role)."""
    from search_engine_spark.oracle import build_index_py

    rows = tiny_index.docs.select("doc_id", "text", "role").collect()
    docs = {int(r["doc_id"]): r["text"] for r in rows}
    roles = {int(r["doc_id"]): r["role"] for r in rows}
    return build_index_py(docs, roles)
