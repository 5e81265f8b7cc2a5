"""Dead-letter registry for failed/invalid inputs (ST5).

Reference analog: crawl failures are parked in ``keep_link`` with
status ERROR_LINK and an HTTP code, and the UI re-drags them into the
frontier for retry (reference Parser.java:285-292;
view/IndexingComponent.java:360-380). Our input is a table, so "failed
input" = a row violating the transcript contract (null key, null/empty
text, oversized text — the reference's 255-char URL truncation guard
P10 generalized). Invalid rows are DIVERTED with a reason code instead
of poisoning the build, appended to ``<index_dir>/dead_letters`` with
the run id, and can be re-submitted after repair.

Everything is a plain filter/projection — classification is one
codegen'd CASE expression, the split costs no extra pass (both sides
prune from the same scan), and the registry is an append-only parquet
log (per-run files, never rewritten).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# reference truncation guard is 255 chars for URLs (DBWriter.java:102-106);
# for transcript text the contract bound is generous but finite
MAX_TEXT_CHARS = 1_000_000

REASON_OK = "ok"


def contract_reason_col(
    max_text_chars: int = MAX_TEXT_CHARS,
    text_col: str = "text",
    key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
) -> F.Column:
    """Reason code per row; REASON_OK for rows satisfying the contract.
    First violation wins (null key > null text > empty > oversized)."""
    k1, k2 = key_cols
    return (
        F.when(F.col(k1).isNull() | F.col(k2).isNull(), "null_key")
        .when(F.col(text_col).isNull(), "null_text")
        .when(F.length(F.trim(F.col(text_col))) == 0, "empty_text")
        .when(F.length(F.col(text_col)) > max_text_chars, "oversized_text")
        .otherwise(REASON_OK)
    )


def scrub_nulls_col(text_col: str = "text") -> F.Column:
    """Strip 0x00 bytes — PostgreSQL rejects them, and the reference
    retries failed batch writes with exactly this scrub (P11,
    DBWriter.java:111-112). Codegen'd regexp_replace."""
    return F.regexp_replace(F.col(text_col), "\\u0000", "")


def split_valid(
    transcripts: DataFrame,
    max_text_chars: int = MAX_TEXT_CHARS,
    text_col: str = "text",
    scrub_nulls: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """(valid rows, dead rows + reason). Both sides share one scan.
    Valid rows get the 0x00 scrub applied (reference P11)."""
    if scrub_nulls:
        transcripts = transcripts.withColumn(
            text_col,
            F.when(F.col(text_col).isNotNull(), scrub_nulls_col(text_col)),
        )
    tagged = transcripts.withColumn(
        "_reason", contract_reason_col(max_text_chars, text_col)
    )
    valid = tagged.filter(F.col("_reason") == REASON_OK).drop("_reason")
    dead = tagged.filter(F.col("_reason") != REASON_OK).withColumnRenamed(
        "_reason", "reason"
    )
    return valid, dead


def write_dead_letters(dead: DataFrame, index_dir: str, run_id: str) -> None:
    """Append this run's failures to the registry (reference keep_link
    insert, ImplRepository.java:53-91)."""
    out = os.path.join(index_dir, "dead_letters")
    (
        dead.withColumn("run_id", F.lit(run_id))
        .withColumn("dead_at", F.lit(time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())))
        .write.mode("append").parquet(out)
    )


def read_dead_letters(spark: SparkSession, index_dir: str) -> DataFrame:
    out = os.path.join(index_dir, "dead_letters")
    if not os.path.isdir(out):
        return spark.createDataFrame([], "conv_id string, turn_idx int, reason string")
    return spark.read.parquet(out)


def retry_candidates(spark: SparkSession, index_dir: str) -> DataFrame:
    """Rows to re-submit after repair — the reference's UI re-drag of
    ERROR_LINK rows back into the crawl frontier. Returns the original
    columns (reason/run_id/dead_at stripped) deduplicated by key, latest
    run wins."""
    dead = read_dead_letters(spark, index_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.col("run_id").desc())
    return (
        dead.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "reason", "run_id", "dead_at")
    )
