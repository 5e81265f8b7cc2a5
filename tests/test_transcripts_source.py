"""Transcript-source shim (sources/transcripts.py): Iceberg identifier
handling today (no runtime jar in this image) and the integration test
that activates the day a jar appears (VERDICT r3 next-round #6)."""

from __future__ import annotations

import pytest

from search_engine_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    read_transcripts,
)


def _iceberg_available(spark) -> bool:
    """True when an Iceberg runtime is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def test_parquet_path_reads_with_pinned_schema(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [("c1", 0, "user", "hello", None, None)], TRANSCRIPT_SCHEMA
    ).write.parquet(p)
    df = read_transcripts(spark, p)
    # parquet read-back relaxes nullability; names + types are the pin
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in TRANSCRIPT_SCHEMA.fields
    ]
    assert df.count() == 1


def test_catalog_identifier_without_runtime_is_a_clean_error(spark):
    """A catalog identifier on a jar-less session must raise the
    documented RuntimeError naming the fix — not an opaque Py4J
    stack."""
    if _iceberg_available(spark):
        pytest.skip("Iceberg runtime present; the error path is dead here")
    with pytest.raises(RuntimeError, match="no Iceberg runtime"):
        read_transcripts(spark, "catalog.db.transcripts")


def test_iceberg_round_trip_when_runtime_present(spark, tmp_path):
    """Real Iceberg integration — skipped until a runtime jar is on the
    classpath, wired so the code path has coverage the day one appears:
    write the transcript schema as an Iceberg table, read it back via
    the catalog-identifier branch, assert schema + rows survive."""
    if not _iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar in this image (documented gap)")
    wh = str(tmp_path / "warehouse")
    spark.conf.set("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", wh)
    spark.createDataFrame(
        [("c1", 0, "user", "hello", None, None)], TRANSCRIPT_SCHEMA
    ).writeTo("it.db.transcripts").create()
    df = read_transcripts(spark, "it.db.transcripts")
    assert df.count() == 1
    assert {f.name for f in df.schema.fields} == {
        f.name for f in TRANSCRIPT_SCHEMA.fields
    }
