"""SparkSession factory tuned for this engine.

Local-mode sessions are used for tests/bench (local[N], one JVM); the
same builder settings are what we'd ship to a real multi-executor
cluster via spark-submit --py-files (jobs/build_index.py), minus the
local master.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "search_engine_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
    max_partition_bytes: int | None = None,
) -> SparkSession:
    """``master`` overrides the default ``local[cpus]`` — e.g.
    ``local-cluster[N,1,6144]`` for N separate 1-core executor JVMs (the
    closest single-box analog of an N-executor cluster: per-executor GC,
    python workers, and shuffle clients, used by jobs/scaling_bench.py)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # 4 waves/core: task granularity fine enough that one straggler
        # doesn't idle the rest of the stage (1 task/core measurably
        # loses ~25% of stage time to the tail).
        shuffle_partitions = max(cpus * 4, 16)
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesce targets: small enough to keep multiple waves/core
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(16 * 1024 * 1024))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # cap scan splits so a small-corpus file scan never degenerates to
        # ~one wave (Spark's bytesPerCore heuristic would): event-log
        # analysis showed 1.25-wave stages idling 23% of an 8-core run.
        # Scaled with core count rather than a flat 16MB: on genuinely
        # large inputs a tiny cap inflates task counts ~8× over the 128MB
        # default and the scheduler overhead dominates (ADVICE r1) —
        # callers with big inputs pass max_partition_bytes explicitly.
        .config(
            "spark.sql.files.maxPartitionBytes",
            str(max_partition_bytes or 16 * 1024 * 1024),
        )
        # zstd for shuffle/spill and parquet: ~2-3x fewer bytes through
        # memory and disk than lz4/snappy for this text-heavy workload —
        # measured BOTH faster (8-core build 83s -> 73s) and far stabler
        # (run variance collapsed from +/-30% to +/-2%; writeback bursts
        # of the bigger streams were the noise source). CPU cost scales
        # with cores; bandwidth doesn't — exactly the trade a scale-out
        # engine wants.
        .config("spark.io.compression.codec", "zstd")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
