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

from dataclasses import dataclass

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
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


# --------------------------------------------------------------------------
# Presorted-input fast path: ZERO-shuffle id assignment + zero docs copy
# --------------------------------------------------------------------------
# The range exchange exists only to establish the (conv_id, turn_idx)
# total order. When the input parquet is ALREADY globally sorted by the
# ordering key — the common case for a corpus written by a partitioned
# pipeline (spark.range partitions are contiguous conv ranges; log
# compaction jobs sort on write) — the order is free:
#
#     doc_id = file_offset[file] + _metadata.row_index
#
# where file_offset is the cumulative row count of all earlier files in
# key order (driver-side parquet-footer read). No exchange, no second
# copy of the corpus: the input files ARE the docs table, and the index
# records {file basename → offset} so readers re-derive the same ids.
#
# Sortedness is PROVEN, not assumed, by one distributed scan of only the
# key columns (column-pruned — a few % of corpus bytes vs shuffling 100%
# of them): each task emits per contiguous (file, row-range) run its
# first/last key and an in-run violation count; the driver checks runs
# tile each file exactly ([0, num_rows), no gaps), chain in order inside
# each file, and chain across files. Any violation → return None and the
# caller falls back to the range-exchange path. Verification is exact —
# parquet footer min/max stats alone can't see inside a row group and
# falsely reject sorted files whose row-group boundary splits a
# conversation, so stats are used only for row counts.


@dataclass
class PresortedDocs:
    """Docs table derived from a sorted input dir (no copy, no shuffle)."""

    docs: DataFrame                 # input columns + doc_id
    input_dir: str
    file_offsets: dict[str, int]    # file basename → first doc_id


def derive_ids_from_offsets(
    spark: SparkSession,
    input_dir: str,
    file_offsets: dict[str, int],
    id_col: str = "doc_id",
) -> DataFrame:
    """Read ``input_dir`` with ``id_col = offset[basename] + row_index``.

    A broadcast join on the file basename (not a literal map — 100 TB is
    ~10^6 files and a million-entry literal breaks codegen). Basenames
    make the mapping relocatable across schemes/mount points; parquet
    part-file names are unique per directory (asserted at offset build).
    """
    offsets_df = spark.createDataFrame(
        [(b, int(o)) for b, o in file_offsets.items()], "_file string, _off long"
    )
    docs = spark.read.parquet(input_dir).select(
        "*",
        F.substring_index(F.col("_metadata.file_path"), "/", -1).alias("_file"),
        F.col("_metadata.row_index").alias("_ridx"),
    )
    return (
        docs.join(F.broadcast(offsets_df), "_file")
        .withColumn(id_col, (F.col("_off") + F.col("_ridx")).cast("long"))
        .drop("_file", "_off", "_ridx")
    )


def _file_row_counts(input_dir: str) -> dict[str, int]:
    """basename → num_rows from parquet footers (driver-side, no job)."""
    import glob
    import os

    import pyarrow.parquet as pq

    counts: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(input_dir, "*.parquet"))):
        n = pq.ParquetFile(path).metadata.num_rows
        if n:
            counts[os.path.basename(path)] = n
    return counts


def _collect_sorted_runs(
    spark: SparkSession, input_dir: str, order_cols: list[str]
) -> list:
    """One column-pruned scan emitting, per contiguous (file, row-range)
    run inside each task, the run's bounds, first/last key, and the
    count of in-run order violations (key < previous key, or null key).
    Output is O(#file-splits), collected to the driver."""
    import numpy as np
    import pandas as pd

    src = spark.read.parquet(input_dir)
    key_fields = {f.name: f.dataType.simpleString() for f in src.schema.fields}
    meta = src.select(
        F.substring_index(F.col("_metadata.file_path"), "/", -1).alias("_file"),
        F.col("_metadata.row_index").alias("_ridx"),
        *[F.col(c) for c in order_cols],
    )
    out_schema = "file string, lo long, hi long, viol long, " + ", ".join(
        f"f_{c} {key_fields[c]}, l_{c} {key_fields[c]}" for c in order_cols
    )

    def runs(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            f = pdf["_file"].to_numpy()
            r = pdf["_ridx"].to_numpy()
            is_start = np.concatenate(
                ([True], (f[1:] != f[:-1]) | (r[1:] != r[:-1] + 1))
            )
            prev = pdf[order_cols].shift(1)
            lt = pd.Series(False, index=pdf.index)
            eq = pd.Series(True, index=pdf.index)
            for c in order_cols:
                lt = lt | (eq & (pdf[c] < prev[c]))
                eq = eq & (pdf[c] == prev[c])
            viol = (
                (lt.to_numpy() & ~is_start)
                | pdf[order_cols].isnull().any(axis=1).to_numpy()
            )
            starts = np.flatnonzero(is_start)
            ends = np.append(starts[1:], len(pdf))
            rows = {
                "file": f[starts],
                "lo": r[starts],
                "hi": r[ends - 1] + 1,
                "viol": np.add.reduceat(viol.astype(np.int64), starts),
            }
            for c in order_cols:
                rows[f"f_{c}"] = pdf[c].to_numpy()[starts]
                rows[f"l_{c}"] = pdf[c].to_numpy()[ends - 1]
            yield pd.DataFrame(rows)

    return meta.mapInPandas(runs, out_schema).collect()


def docs_from_sorted_dir(
    spark: SparkSession,
    input_dir: str,
    order_cols: list[str],
    id_col: str = "doc_id",
) -> PresortedDocs | None:
    """Zero-shuffle dense-id assignment over an already-sorted parquet
    dir, or None when the layout cannot be proven globally sorted by
    ``order_cols`` (the caller falls back to the range-exchange path).

    The returned ids are the SAME bijection doc_id ↔ rank over
    ``order_cols`` that :func:`assign_dense_ids` produces (pinned by
    tests/test_docids.py), so the two paths are interchangeable."""
    counts = _file_row_counts(input_dir)
    if not counts:
        return None
    rows = _collect_sorted_runs(spark, input_dir, order_cols)
    if any(r["viol"] for r in rows):
        return None
    key_f = lambda r: tuple(r[f"f_{c}"] for c in order_cols)  # noqa: E731
    key_l = lambda r: tuple(r[f"l_{c}"] for c in order_cols)  # noqa: E731
    by_file: dict[str, list] = {}
    for r in rows:
        by_file.setdefault(r["file"], []).append(r)
    file_keys: list[tuple[tuple, tuple, str]] = []
    for fname, fruns in by_file.items():
        if fname not in counts:
            return None  # scan saw a file the footer pass didn't
        fruns.sort(key=lambda r: r["lo"])
        pos = 0
        for i, r in enumerate(fruns):
            if r["lo"] != pos:
                return None  # gap/overlap — split accounting broken
            if i and key_l(fruns[i - 1]) > key_f(r):
                return None  # out of order across a split boundary
            pos = r["hi"]
        if pos != counts[fname]:
            return None
        file_keys.append((key_f(fruns[0]), key_l(fruns[-1]), fname))
    if len(file_keys) != len(counts):
        return None
    file_keys.sort(key=lambda t: t[0])
    offsets: dict[str, int] = {}
    acc = 0
    for i, (first, last, fname) in enumerate(file_keys):
        if i and file_keys[i - 1][1] > first:
            return None  # files overlap in key space
        offsets[fname] = acc
        acc += counts[fname]
    return PresortedDocs(
        docs=derive_ids_from_offsets(spark, input_dir, offsets, id_col),
        input_dir=input_dir,
        file_offsets=offsets,
    )
