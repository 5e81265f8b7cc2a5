"""Dense docID assignment over a stable total order — scale-safe.

The reference gets doc ids for free from a PostgreSQL sequence
(reference entity/Page.java:21-24, serial PK). At 10^12 rows a global
``row_number()`` window would funnel everything through ONE partition,
so we use the classic two-pass zipWithIndex pattern instead:

1. range-repartition + sort by the ordering key (one shuffle, already
   needed to establish order),
2. count rows per partition (cheap metadata-sized aggregate),
3. driver computes cumulative offsets (P integers),
4. doc_id = per-partition row_number + partition offset.

The result is a bijection doc_id ↔ rank over (conv_id, turn_idx)
regardless of partition boundaries (input_hint invariant: per-turn text
equality under stable turn ordering — tests/test_docids.py).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = 0-based dense rank over ``order_cols`` (unique key)."""
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 8)

    parted = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    # Persist so the per-partition counts and the final pass see the
    # same partitioning (repartitionByRange samples; don't recompute).
    # Serialized level: deserialized row caches anti-scale with task
    # concurrency (GC pressure measured on local[32]); UnsafeRow bytes
    # cost one memcpy and stay flat.
    parted = parted.persist(StorageLevel.MEMORY_AND_DISK)
    counts = {r["_pid"]: r["cnt"] for r in
              parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offsets_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        parted.join(offsets_df, "_pid")
        .withColumn(id_col, F.row_number().over(w).cast("long") + F.col("_offset") - 1)
        .drop("_pid", "_offset")
    )
    return out


def assign_doc_ids(transcripts: DataFrame) -> DataFrame:
    """docs table: doc_id + original transcript columns (FIXTURES.md §2)."""
    return assign_dense_ids(transcripts, ["conv_id", "turn_idx"], "doc_id")


# --------------------------------------------------------------------------
# Spilled variant: fuse id assignment with the docs materialization
# --------------------------------------------------------------------------
# monotonically_increasing_id() layout: (partition index << 33) + row index
# in evaluation order. After sortWithinPartitions the projection runs in
# sorted order, so (_mid - (pid << 33)) IS the 0-based rank within the
# range partition. Partitions hold < 2^33 rows each at any sane
# partitioning (enforced below).
MID_PARTITION_SHIFT = 33


def assign_dense_ids_spilled(
    df: DataFrame,
    order_cols: list[str],
    out_dir: str,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[int, int]]:
    """Dense-id assignment fused with the scratch-parquet spill.

    The classic two-pass pattern (module docstring) costs, as separate
    steps: range shuffle + full-data persist + a count pass over the
    persist + a SECOND full shuffle for the per-partition row_number
    window + the docs write. Profiled at 2-vs-8 pinned cores this phase
    alone carried ~6s of fixed/serial time (round-2 scaling work). Fused:

    1. range-repartition + in-partition sort (the one required shuffle),
    2. project ``_mid = monotonically_increasing_id()`` and write the
       docs parquet directly — ONE materialization, no persist,
    3. per-partition row counts from the parquet FOOTERS (driver-side
       pyarrow metadata read, milliseconds, no Spark job),
    4. ``doc_id = _mid + adjust[pid]`` where
       ``adjust[pid] = cumulative_offset[pid] - (pid << 33)`` — a literal
       map lookup, pure JVM, evaluated lazily by every consumer.

    Returns (docs DataFrame with id_col, adjust map). The adjust map is
    persisted in stats.json by write_index so DiskIndex can re-derive
    doc_id when reading the spilled docs table.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 8)
    parted = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    parted.write.mode("overwrite").parquet(out_dir)
    counts = _partition_counts_from_footers(out_dir)
    adjust = mid_adjust_map(counts)
    docs = spark.read.parquet(out_dir)
    return with_derived_doc_id(docs, adjust, id_col), adjust


def _partition_counts_from_footers(out_dir: str) -> dict[int, int]:
    """pid → row count, read from parquet file footers (no Spark job).

    Each task writes exactly one file; the file's min(_mid) >> 33 is its
    partition index and its row count is the partition's row count.
    Multiple row groups per file are summed via the file-level num_rows.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    counts: dict[int, int] = {}
    for path in glob.glob(os.path.join(out_dir, "*.parquet")):
        md = pq.ParquetFile(path).metadata
        if md.num_rows == 0:
            continue
        col = md.schema.names.index("_mid")
        first_mid = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            if st is not None and st.has_min_max:
                m = int(st.min)
                first_mid = m if first_mid is None else min(first_mid, m)
        if first_mid is None:  # stats disabled — fall back to a tiny scan
            import pyarrow.parquet as _pq

            first_mid = int(_pq.read_table(path, columns=["_mid"])["_mid"][0].as_py())
        pid = first_mid >> MID_PARTITION_SHIFT
        counts[pid] = counts.get(pid, 0) + md.num_rows
    return counts


def mid_adjust_map(counts: dict[int, int]) -> dict[int, int]:
    """pid → (cumulative offset − (pid << 33)); doc_id = _mid + adjust[pid]."""
    adjust: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        if counts[pid] >= (1 << MID_PARTITION_SHIFT):
            raise ValueError(f"partition {pid} exceeds 2^33 rows; repartition finer")
        adjust[pid] = acc - (pid << MID_PARTITION_SHIFT)
        acc += counts[pid]
    return adjust


def with_derived_doc_id(
    docs: DataFrame, adjust: dict[int, int], id_col: str = "doc_id"
) -> DataFrame:
    """Attach id_col = _mid + adjust[_mid >> 33] (literal-map lookup,
    fully codegen'd — no join, no shuffle)."""
    pairs: list[F.Column] = []
    for pid, adj in sorted(adjust.items()):
        pairs.append(F.lit(int(pid)).cast("long"))
        pairs.append(F.lit(int(adj)).cast("long"))
    amap = F.create_map(*pairs) if pairs else F.create_map()
    pid_col = F.shiftright(F.col("_mid"), MID_PARTITION_SHIFT).cast("long")
    return docs.withColumn(
        id_col, (F.col("_mid") + F.element_at(amap, pid_col)).cast("long")
    ).drop("_mid")
