"""Transcript-table source shim: Iceberg when available, Parquet otherwise.

BASELINE.json's input is "an Iceberg table of multi-turn transcripts".
This container has no Iceberg runtime jar, so the source is isolated
behind one function: ``read_transcripts`` tries the Iceberg format and
falls back to Parquet with the identical schema. All engine code
consumes the returned DataFrame only — swapping in a real Iceberg
catalog changes this file alone.

(The reference's source was a live HTTP crawl into a ``page`` table —
Parser.java:258-382; our source is the table itself, per input_hint.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def read_transcripts(spark: SparkSession, location: str) -> DataFrame:
    """Load the transcript table from an Iceberg identifier or a path."""
    if "/" not in location:
        # catalog identifier → Iceberg table (needs the runtime jar)
        try:
            return spark.read.format("iceberg").load(location)
        except Exception as exc:  # pragma: no cover - jar not in this image
            raise RuntimeError(
                f"Iceberg table {location!r} requested but no Iceberg runtime "
                "is on the classpath; pass a parquet path instead"
            ) from exc
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(location)
