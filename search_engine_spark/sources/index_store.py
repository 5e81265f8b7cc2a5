"""On-disk index layout + per-partition lineage manifests + resume.

Reference analog: the crawl checkpoints its frontier into ``keep_link``
on stop and re-seeds from it on restart (reference Parser.java:303-322,
150-169; KeepLinkRepository.java:24-25). Our unit of recovery is the
doc-range BUCKET: segment encoding is deterministic per bucket, each
completed bucket writes a manifest (rows, term range, checksum, input
lineage), and a resumed build processes only buckets without manifests —
idempotent, never double-counts (SURVEY.md §7 hard-part (d)).

Layout under <index_dir>/ (format v4: the big per-doc tables are
partitioned by doc-range bucket so single-doc/scope mutations rewrite
O(affected buckets), never the whole table — the parquet stand-in for
Iceberg MERGE/DELETE file-level rewrites):
    docs/        parquet   bucket=<n>/ doc store (doc_id, conv_id, turn_idx, role, text, tool, ts)
    postings/    parquet   bucket=<n>/ (doc_id, lemma, tf, rank, dl)  [DataFrame scorer]
                           files lemma-range-clustered WITHIN each bucket
    doclen/      parquet   bucket=<n>/ (doc_id, dl)
    terms/       parquet   (term_id, lemma, df, cf)
    segments/    parquet   bucket=<n>/ partitions, rows sorted by term_key
    stats.json             {n_docs, avgdl}
    manifests/bucket=<n>.json   lineage per completed bucket
Streamed (not-yet-compacted) deltas live in SEPARATE sibling dirs
(docs_stream/, postings_stream/, doclen_stream/, terms_delta/) — their
hash-range ids don't fit the dense bucket space, and appending loose
files into a partitioned dir would corrupt partition discovery.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.config import DOC_BUCKET_WIDTH
from search_engine_spark.operators.compression import build_segments
from search_engine_spark.operators.index_build import CorpusStats, InvertedIndex


# bumped when the on-disk schema changes (v2: postings carry a dl
# column; the query engines no longer join doclen. v3: segment payload
# buffers are tag-prefixed varbyte/PForDelta — untagged v2 buffers are
# not decodable by the v3 reader. v4: docs/postings/doclen are
# partitioned by doc-range bucket — readers that don't strip the bucket
# partition column would leak it into query schemas). v3 dirs stay fully
# readable (the mutation paths fall back to whole-table swaps on
# unpartitioned tables); loads of NEWER dirs fail with a clear message
# instead of an AnalysisException/garbage at query time.
INDEX_FORMAT_VERSION = 4
# oldest format whose SEGMENTS this reader can decode (dimension tables
# stay readable further back: v1 postings fall back to the doclen join)
MIN_SEGMENT_FORMAT = 3


def _manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "manifests")


class IndexWriteLockError(RuntimeError):
    """Another process holds the index's single-writer lock."""


class index_write_lock:
    """Single-writer guard for index mutations (context manager).

    Every mutation (reindex_turn / delete_where / compact_index /
    merge_indexes / restore_snapshot) assumes it is the only writer —
    two concurrent mutations would interleave table swaps and corrupt
    the journal contract. This is the fail-fast guard: an exclusive
    ``flock`` on ``<index>/.write_lock``, non-blocking with a bounded
    retry (``timeout_s``), raising :class:`IndexWriteLockError` with
    the holder's pid/op instead of deadlocking or silently racing.
    flock releases automatically when the holder dies, so a crashed
    mutation never wedges the index (its journal replay does the
    repair). READERS take no lock — serving stays lock-free (swaps
    are atomic renames).

    On an object store with no flock the same contract is a
    conditional-put lease object; this is the filesystem stand-in."""

    # (path, thread_ident) pairs already held — composed mutations
    # (delete_where -> compact_index) re-enter without self-deadlock
    # (flock conflicts across fds even within one process). Keyed on
    # the OWNING THREAD, not just the path: a second mutation started
    # from another thread of the same process must NOT be treated as
    # re-entrant — it falls through to the flock, conflicts, and gets
    # the fail-fast IndexWriteLockError like any other writer.
    _held: set = set()

    def __init__(self, index_dir: str, op: str = "mutation",
                 timeout_s: float = 10.0):
        self.path = os.path.abspath(os.path.join(index_dir, ".write_lock"))
        self.op = op
        self.timeout_s = timeout_s
        self._fh = None
        self._reentrant = False

    @property
    def _key(self):
        import threading

        return (self.path, threading.get_ident())

    def __enter__(self):
        import fcntl

        if self._key in index_write_lock._held:
            self._reentrant = True
            return self
        self._fh = open(self.path, "a+")
        deadline = time.monotonic() + self.timeout_s
        while True:
            try:
                fcntl.flock(self._fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                if time.monotonic() >= deadline:
                    self._fh.seek(0)
                    holder = self._fh.read(200).strip() or "unknown"
                    self._fh.close()
                    self._fh = None
                    raise IndexWriteLockError(
                        f"index write lock held by {holder}; refusing to "
                        f"run {self.op!r} concurrently"
                    ) from None
                time.sleep(0.2)
        self._fh.truncate(0)
        self._fh.write(f"pid={os.getpid()} op={self.op}")
        self._fh.flush()
        index_write_lock._held.add(self._key)
        return self

    def __exit__(self, *exc):
        import fcntl

        if self._reentrant:
            return False
        if self._fh is not None:
            index_write_lock._held.discard(self._key)
            fcntl.flock(self._fh, fcntl.LOCK_UN)
            self._fh.close()
            self._fh = None
        return False


def _single_writer(op: str, dir_arg: str):
    """Decorator: run the mutation under the index's single-writer
    lock (``dir_arg`` names the function's index-dir parameter)."""
    import functools
    import inspect

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            ba = sig.bind(*args, **kwargs)
            with index_write_lock(ba.arguments[dir_arg], op=op):
                return fn(*args, **kwargs)

        return wrapper

    return deco


def load_stats(index_dir: str) -> dict | None:
    """stats.json payload, or None if absent (no/partial index)."""
    path = os.path.join(index_dir, "stats.json")
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def completed_buckets(index_dir: str) -> set[int]:
    mdir = _manifest_dir(index_dir)
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for name in os.listdir(mdir):
        if name.startswith("bucket=") and name.endswith(".json"):
            out.add(int(name[len("bucket="):-len(".json")]))
    return out


def _write_manifest(index_dir: str, bucket: int, payload: dict) -> None:
    mdir = _manifest_dir(index_dir)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".bucket={bucket}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(payload, fh, sort_keys=True)
    os.replace(tmp, os.path.join(mdir, f"bucket={bucket}.json"))  # atomic commit


# ---------------------------------------------------------------------------
# Snapshots: time-travel reads + expiry (the Iceberg-snapshot half of
# the parquet stand-in; the MERGE/DELETE half is the bucket-bounded
# mutation machinery below)
# ---------------------------------------------------------------------------
SNAPSHOT_DIR = "_snapshots"


def _is_side_state(name: str) -> bool:
    """Non-derived operational state living inside an index dir: the
    percolator alert log and Structured-Streaming checkpoints. Excluded
    from snapshot capture AND from restore_snapshot's removal loop —
    rolling an index back must not rewind alert history or a streaming
    checkpoint (re-delivering every already-drained turn)."""
    return name == "alerts" or name.endswith("_checkpoint")


def _snap_root(index_dir: str) -> str:
    return os.path.join(index_dir, SNAPSHOT_DIR)


def _link_tree(src: str, dst: str) -> None:
    """Hardlink-copy a directory tree: O(#files) metadata ops, ZERO data
    bytes — sound because parquet files are immutable once written (the
    mutation paths below always publish NEW files and swap directories,
    never write into an existing file). Falls back to a real copy when
    the filesystem refuses links (cross-device). On an object store the
    equivalent is recording the file LIST in the snapshot manifest —
    same immutability argument, no links needed."""
    import shutil

    for root, dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(out, exist_ok=True)
        # hidden leaf dirs are in-flight swap residue, never snapshot them
        dirs[:] = [d for d in dirs if not d.startswith(".")]
        for f in files:
            if f.startswith("."):
                continue
            s, d = os.path.join(root, f), os.path.join(out, f)
            try:
                os.link(s, d)
            except OSError:  # pragma: no cover - cross-device fallback
                shutil.copy2(s, d)


def list_snapshots(index_dir: str) -> list[dict]:
    """Snapshot log, oldest first: [{version, ts, note}]. Versions are
    listed from the snapshot DIRECTORIES (the source of truth — a crash
    between dir publish and log append must not hide a usable
    snapshot); notes come from the log when present."""
    root = _snap_root(index_dir)
    if not os.path.isdir(root):
        return []
    notes = {}
    log_path = os.path.join(root, "log.json")
    if os.path.exists(log_path):
        with open(log_path) as fh:
            notes = {int(e["version"]): e for e in json.load(fh)}
    out = []
    for name in os.listdir(root):
        if name.startswith("v") and not name.startswith(".") and name[1:].isdigit():
            v = int(name[1:])
            e = notes.get(v, {})
            out.append({"version": v, "ts": e.get("ts"),
                        "note": e.get("note", "")})
    return sorted(out, key=lambda e: e["version"])


def create_snapshot(index_dir: str, note: str = "") -> int:
    """Freeze the CURRENT index state as a new snapshot version and
    return it. The snapshot is a hardlink tree of every published table
    (docs/postings/doclen/terms/segments/stats.json/manifests + any
    streamed-delta sibling dirs), published atomically via a hidden tmp
    dir. Readers time-travel with ``DiskIndex(spark, dir, as_of=v)``;
    mutations call this automatically before touching the live tables,
    so every destructive operation is undoable until
    :func:`expire_snapshots` garbage-collects."""
    root = _snap_root(index_dir)
    os.makedirs(root, exist_ok=True)
    versions = [s["version"] for s in list_snapshots(index_dir)]
    v = (max(versions) + 1) if versions else 1
    tmp = os.path.join(root, f".v{v}.tmp")
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    for name in os.listdir(index_dir):
        if name == SNAPSHOT_DIR or name.startswith(".") \
                or _is_side_state(name):
            continue
        src = os.path.join(index_dir, name)
        dst = os.path.join(tmp, name)
        if os.path.isdir(src):
            _link_tree(src, dst)
        else:
            try:
                os.link(src, dst)
            except OSError:  # pragma: no cover
                shutil.copy2(src, dst)
    os.replace(tmp, os.path.join(root, f"v{v}"))
    log_path = os.path.join(root, "log.json")
    entries = []
    if os.path.exists(log_path):
        with open(log_path) as fh:
            entries = json.load(fh)
    entries.append({"version": v, "ts": time.time(), "note": note})
    tmp_log = log_path + ".tmp"
    with open(tmp_log, "w") as fh:
        json.dump(entries, fh, indent=1)
    os.replace(tmp_log, log_path)
    return v


def expire_snapshots(index_dir: str, keep_last: int = 3) -> list[int]:
    """Drop all but the newest ``keep_last`` snapshots (Iceberg's
    expire_snapshots maintenance op) and return the expired versions.
    Unlinking a snapshot tree only decrements hardlink refcounts —
    data files still referenced by the live table or a kept snapshot
    survive untouched."""
    import shutil

    snaps = list_snapshots(index_dir)
    drop = snaps[:-keep_last] if keep_last > 0 else snaps
    dropped = []
    for s in drop:
        shutil.rmtree(os.path.join(_snap_root(index_dir), f"v{s['version']}"),
                      ignore_errors=True)
        dropped.append(s["version"])
    if dropped:
        log_path = os.path.join(_snap_root(index_dir), "log.json")
        if os.path.exists(log_path):
            with open(log_path) as fh:
                entries = json.load(fh)
            entries = [e for e in entries if e["version"] not in set(dropped)]
            tmp_log = log_path + ".tmp"
            with open(tmp_log, "w") as fh:
                json.dump(entries, fh, indent=1)
            os.replace(tmp_log, log_path)
    return dropped


def snapshot_path(index_dir: str, version: int) -> str:
    p = os.path.join(_snap_root(index_dir), f"v{version}")
    if not os.path.isdir(p):
        known = [s["version"] for s in list_snapshots(index_dir)]
        raise ValueError(
            f"no snapshot v{version} under {index_dir} (have {known})"
        )
    return p


@_single_writer("restore_snapshot", "index_dir")
def restore_snapshot(
    index_dir: str, version: int, snapshot: bool = True
) -> dict:
    """Roll the LIVE index back to snapshot ``version`` (Iceberg's
    ``rollback_to_snapshot`` — the missing verb beside
    create/list/expire/``as_of`` time travel): every live table is
    replaced with a hardlink tree of the frozen version, and live
    entries that did not exist at freeze time (e.g. stream-delta dirs
    appended since) are removed. O(#files) metadata and ZERO data
    bytes, for the same reason snapshots are cheap: published parquet
    files are immutable.

    The current live state is auto-snapshotted first (note
    ``pre-restore``, ``snapshot=False`` opts out), so a restore is
    itself undoable by another restore. Crash safety: the new state is
    fully staged as hidden ``.restore_tmp`` links before ANY live
    entry moves, and the pre-restore snapshot exists before that — a
    crash mid-swap loses no data and is repaired by re-running the
    restore (every step is idempotent)."""
    import shutil

    src = snapshot_path(index_dir, version)
    pre = create_snapshot(index_dir, note=f"pre-restore(v{version})") \
        if snapshot else None
    stage = os.path.join(index_dir, ".restore_tmp")
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    for name in sorted(os.listdir(src)):
        s, d = os.path.join(src, name), os.path.join(stage, name)
        if os.path.isdir(s):
            _link_tree(s, d)
        else:
            try:
                os.link(s, d)
            except OSError:  # pragma: no cover - cross-device fallback
                shutil.copy2(s, d)
    restored, removed = [], []
    # remove live entries first (snapshot-absent ones permanently) —
    # EXCEPT non-derived side-state (alerts log, streaming
    # checkpoints): it belongs to the operational timeline, not the
    # index version being rolled back, and deleting a streaming
    # checkpoint would re-alert every already-drained turn
    for name in sorted(os.listdir(index_dir)):
        if name == SNAPSHOT_DIR or name.startswith(".") \
                or _is_side_state(name):
            continue
        live = os.path.join(index_dir, name)
        if os.path.isdir(live):
            shutil.rmtree(live)
        else:
            os.remove(live)
        (restored if os.path.exists(os.path.join(stage, name))
         else removed).append(name)
    for name in sorted(os.listdir(stage)):
        os.replace(os.path.join(stage, name), os.path.join(index_dir, name))
        if name not in restored:
            restored.append(name)
    shutil.rmtree(stage, ignore_errors=True)
    return {
        "restored_version": int(version),
        "pre_restore_snapshot": pre,
        "entries_restored": sorted(set(restored)),
        "entries_removed": sorted(
            n for n in removed if n not in set(restored)
        ),
    }


def _bucket_col(bucket_width: int) -> F.Column:
    """Doc-range bucket of a doc_id — the storage partition key shared
    by the per-doc tables and the segment encoder."""
    return F.floor(F.col("doc_id") / F.lit(int(bucket_width))).cast("int")


def _is_bucketed(path: str) -> bool:
    """True iff `path` is a bucket-partitioned parquet dir (v4 layout)."""
    if not os.path.isdir(path):
        return False
    return any(n.startswith("bucket=") for n in os.listdir(path))


def _read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a per-doc table regardless of layout vintage, with the
    storage-only `bucket` partition column stripped (it must never leak
    into query schemas)."""
    df = spark.read.parquet(path)
    return df.drop("bucket") if "bucket" in df.columns else df


def _publish_postings(
    postings: DataFrame, index_dir: str, bucket_width: int = DOC_BUCKET_WIDTH
) -> None:
    """Publish the DataFrame-engine postings copy bucket-partitioned by
    doc range and lemma-range-clustered WITHIN each bucket:

    - ``bucket=<n>/`` partition dirs (doc_id // bucket_width) make
      single-doc/scope mutations O(affected buckets) file replacements
      (reindex_turn / delete_scope / compact_index) — the parquet
      stand-in for Iceberg MERGE INTO.
    - within a bucket, files get DISJOINT lemma ranges (query-term
      IN-list filters prune whole files via parquet min/max — the
      DataFrame engine's analog of the segments' term_key sort), with
      doc_id as the tertiary range key.
    - a Zipf-hot lemma's postings now span ≥ n_buckets files BY
      CONSTRUCTION (one-plus per bucket), so the hot-term scan keeps
      file-level parallelism that a global (lemma, doc_id) clustering
      concentrates into one file (BENCH_r02 `bm25_df_q0` suspect,
      VERDICT r2 "what's wrong #2") — rare terms still prune to
      n_buckets-bounded file sets.

    The one-time publish shuffle is OUTSIDE the at-scale build path
    (the compressed segments are the posting store; this copy exists
    for the DF engine / oracle parity). Tmp+swap write: for spilled
    builds the input of this plan IS the postings dir being replaced."""
    _swap_write(
        postings.withColumn("bucket", _bucket_col(bucket_width))
        .repartitionByRange("bucket", "lemma", "doc_id")
        .sortWithinPartitions("bucket", "lemma", "doc_id"),
        os.path.join(index_dir, "postings"),
        partition_by="bucket",
    )


def write_index(
    index: InvertedIndex,
    index_dir: str,
    input_desc: str = "",
    bucket_width: int = DOC_BUCKET_WIDTH,
    resume: bool = True,
) -> dict:
    """Persist the full index; segment buckets are checkpointed + resumable.

    Returns run metrics (rows per table, buckets built/skipped, seconds) —
    the reference's timing/statistics surface analog (TimeMeasure.java:74-115,
    /api/statistics)."""
    t0 = time.monotonic()
    metrics: dict = {"input": input_desc}

    docs_path = os.path.join(index_dir, "docs")
    stats_path = os.path.join(index_dir, "stats.json")
    # a build with scratch_dir == index_dir already wrote docs/postings
    # here — don't copy a table onto itself (stats.json marks a complete
    # dimension-table write, so spilled-but-incomplete dirs still finish).
    # realpath on both sides: a relative scratch_dir vs absolute index_dir
    # (or a symlink) naming the same directory must not trigger a
    # self-overwriting parquet write (ADVICE r1).
    spilled_here = os.path.realpath(
        os.path.abspath(index.backing_dir or "/nonexistent")
    ) == os.path.realpath(os.path.abspath(index_dir))
    if spilled_here and os.path.isdir(os.path.join(index_dir, "postings")):
        # refresh the postings lineage from the dir as it is NOW: a
        # previous write_index call on this handle swapped the dir for
        # the published (clustered) copy, so the handle's captured file
        # listing may name deleted files — a resumed segment re-encode
        # would die on FILE_NOT_EXIST (caught by the /verify drive).
        # Content is identical either way (the publish is a re-layout).
        index.postings = _read_table(
            index.postings.sparkSession, os.path.join(index_dir, "postings")
        )
    if not resume or not os.path.exists(stats_path):
        if not spilled_here and index.docs_source is None:
            # presorted builds never copy the corpus — the docs table is
            # served from the input files by reference. Copied docs are
            # bucket-partitioned (v4) when they carry explicit doc_ids
            # (spilled _mid layouts derive ids on read; they get
            # bucketed on their first mutation's materialization).
            if "doc_id" in index.docs.columns:
                index.docs.withColumn(
                    "bucket", _bucket_col(bucket_width)
                ).write.mode("overwrite").partitionBy("bucket").parquet(docs_path)
            else:
                index.docs.write.mode("overwrite").parquet(docs_path)
        index.doclen.withColumn(
            "bucket", _bucket_col(bucket_width)
        ).write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(index_dir, "doclen")
        )
        index.terms.write.mode("overwrite").parquet(os.path.join(index_dir, "terms"))
        # tmp+replace (snapshot hardlinks must never see a truncation)
        with open(stats_path + ".tmp2", "w") as fh:
            json.dump(
                {
                    "n_docs": index.stats.n_docs,
                    "avgdl": index.stats.avgdl,
                    "format": INDEX_FORMAT_VERSION,
                    "input": input_desc,
                    "complete": False,
                    # docs spilled with fused id assignment store _mid;
                    # doc_id = _mid + adjust[_mid >> 33] on read
                    "docid_adjust": {
                        str(k): int(v) for k, v in (index.docid_adjust or {}).items()
                    },
                    # presorted build: docs live in the input dir;
                    # doc_id = file_offsets[basename] + row_index
                    "docs_source": (
                        {
                            "dir": index.docs_source[0],
                            "file_offsets": {
                                k: int(v)
                                for k, v in index.docs_source[1].items()
                            },
                        }
                        if index.docs_source
                        else None
                    ),
                },
                fh,
            )
        os.replace(stats_path + ".tmp2", stats_path)

    all_buckets = set(range((index.stats.n_docs + bucket_width - 1) // bucket_width or 1))
    done = completed_buckets(index_dir) if resume else set()
    todo = sorted(all_buckets - done)
    metrics["buckets_total"] = len(all_buckets)
    metrics["buckets_skipped_resume"] = len(all_buckets) - len(todo)

    seg_metrics = (
        _write_segment_buckets(index, index_dir, todo, bucket_width, input_desc)
        if todo
        else {}
    )
    # publish (or, for spilled builds, re-cluster in place) the
    # DF-engine postings copy, bucket-partitioned + lemma-clustered —
    # LAST, after every other consumer of index.postings' lineage has
    # run: the swap invalidates file listings captured by plans that
    # read the spilled postings dir (doclen/terms/segments above).
    # Skipped only when resuming an index whose postings table already
    # exists AND no segment bucket was rebuilt; a missing table always
    # forces the publish (a non-spilled build that crashed after the
    # last bucket manifest but before this publish must not resume into
    # a "complete" index with no postings dir — ADVICE r2). A crash
    # between here and the marker flip leaves a valid (merely
    # unclustered or already-clustered) table.
    if (
        not resume
        or todo
        or not os.path.isdir(os.path.join(index_dir, "postings"))
    ):
        _publish_postings(index.postings, index_dir, bucket_width)
    # all buckets committed → flip the completeness marker (consulted by
    # jobs/build_index.py's resume gate so a re-run never clobbers a
    # finished index, ADVICE r1)
    stats = load_stats(index_dir) or {}
    stats["complete"] = True
    tmp = stats_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(stats, fh)
    os.replace(tmp, stats_path)
    metrics.update(seg_metrics)
    metrics["buckets_built"] = len(todo)
    metrics["elapsed_sec"] = time.monotonic() - t0
    return metrics


def _write_segment_buckets(
    index: InvertedIndex,
    index_dir: str,
    todo: list[int],
    bucket_width: int,
    input_desc: str,
) -> dict:
    """Encode + append the given segment buckets and commit one manifest
    per bucket. Shared by write_index (fresh/resumed builds) and
    rebuild_segments (format migration).

    Crash-residue guard (review r3): the parquet append can commit and
    the process die BEFORE the bucket's manifest lands — the bucket
    then stays in ``todo`` on resume and a blind re-append would
    duplicate every block (duplicate doc_ids in WAND top-k). Each todo
    bucket's full block set is recomputed here, so the manifestless
    residue dir is simply deleted before the write — per-bucket
    idempotence restored, completed (manifested) buckets untouched."""
    import shutil

    removed = False
    for b in todo:
        residue = os.path.join(index_dir, "segments", f"bucket={int(b)}")
        if os.path.isdir(residue):
            shutil.rmtree(residue)
            removed = True
    if removed:
        # the files vanished behind Spark's back: drop the session's
        # cached file listing or a same-session read serves the stale
        # list beside the re-appended blocks
        index.postings.sparkSession.catalog.refreshByPath(
            os.path.join(index_dir, "segments")
        )
    seg = build_segments(index, bucket_width).filter(
        F.col("bucket").isin([int(b) for b in todo])
    )
    # run totals via observe() — the reference's sequence-counter
    # surface (counters without a second scan,
    # ConfigRepository.java:64-83): metrics ride on the write job
    from pyspark.sql import Observation

    obs = Observation("segment_write")
    seg = seg.observe(
        obs,
        F.count(F.lit(1)).alias("blocks"),
        F.sum("doc_count").alias("postings"),
        F.sum(
            F.length("doc_ids") + F.length("tfs") + F.length("dls")
        ).alias("payload_bytes"),
    )
    # one output dir per bucket → per-bucket atomicity; rows sorted by
    # term_key so parquet rowgroup min/max prune query-term scans
    seg = seg.repartition("bucket").sortWithinPartitions("term_key", "block_id").persist()
    stats_rows = (
        seg.groupBy("bucket").agg(
            F.count("*").alias("blocks"),
            F.sum("doc_count").alias("postings"),
            F.min("term_key").alias("term_min"),
            F.max("term_key").alias("term_max"),
            # bit_xor: order-insensitive, overflow-free under ANSI mode
            F.expr("bit_xor(xxhash64(term_key, block_id, doc_ids, tfs, dls))").alias("checksum"),
        )
    ).collect()
    by_bucket = {int(r["bucket"]): r for r in stats_rows}
    seg.write.mode("append").partitionBy("bucket").parquet(os.path.join(index_dir, "segments"))
    seg.unpersist()
    for b in todo:
        r = by_bucket.get(b)
        _write_manifest(
            index_dir,
            b,
            {
                "bucket": b,
                "blocks": int(r["blocks"]) if r else 0,
                "postings": int(r["postings"]) if r else 0,
                "term_key_min": int(r["term_min"]) if r else None,
                "term_key_max": int(r["term_max"]) if r else None,
                "checksum": int(r["checksum"]) if r else 0,
                "input_splits": [input_desc],
                "bucket_width": bucket_width,
            },
        )
    return {"observed": {k: int(v) for k, v in obs.get.items()}}


def rebuild_segments(
    spark: SparkSession,
    index_dir: str,
    bucket_width: int = DOC_BUCKET_WIDTH,
) -> dict:
    """Re-encode ALL segment buckets from the persisted postings tables
    (codec/format migration — e.g. v2 untagged varbyte → v3 tagged
    varbyte/PForDelta). Dimension tables (docs/postings/doclen/terms)
    are untouched; segments + manifests are replaced and stats.json's
    format is bumped. Not checkpointed mid-flight: a crash leaves the
    old format marker in place, so queries keep failing cleanly and the
    fix is to re-run the rebuild."""
    import shutil

    stats = load_stats(index_dir)
    if stats is None:
        raise ValueError(f"no index at {index_dir} (stats.json missing)")
    disk = DiskIndex(spark, index_dir)
    ix = disk.as_inverted_index()
    ix.backing_dir = index_dir
    seg_dir = os.path.join(index_dir, "segments")
    shutil.rmtree(seg_dir, ignore_errors=True)
    shutil.rmtree(_manifest_dir(index_dir), ignore_errors=True)
    metrics = _write_segment_buckets(
        ix,
        index_dir,
        todo=sorted(
            range((ix.stats.n_docs + bucket_width - 1) // bucket_width or 1)
        ),
        bucket_width=bucket_width,
        input_desc=str(stats.get("input", "")),
    )
    stats["format"] = INDEX_FORMAT_VERSION
    tmp = os.path.join(index_dir, "stats.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(stats, fh)
    os.replace(tmp, os.path.join(index_dir, "stats.json"))
    return metrics


@_single_writer("compact_index", "index_dir")
def compact_index(
    spark: SparkSession,
    index_dir: str,
    bucket_width: int = DOC_BUCKET_WIDTH,
    snapshot: bool = True,
) -> dict:
    """Fold streamed deltas back into the canonical dense index — the
    Lucene-merge analog closing the streaming lifecycle
    (streaming/incremental.py appends postings_stream/doclen_stream/
    terms_delta/docs_stream with hash-range ids; until compaction those
    docs are served only by the delta-aware views).

    1. Streamed docs get DENSE ids continuing the batch space, ordered
       by (conv_id, turn_idx); a streamed turn whose key already exists
       in the batch docs is DROPPED (batch-wins — updates go through
       reindex_turn), its postings deleted.
    2. postings / doclen / docs are rewritten with the remapped ids
       (broadcast remap join). At test scale this is a table swap; at
       100 TB only the delta files appended since the last compaction
       contain streamed ids, so a table format with file-level rewrite
       (Iceberg MERGE) touches nothing else.
    3. The dictionary is rebuilt EXACTLY from the rewritten postings
       (one aggregate — the same shuffle the batch build pays), keeping
       existing term_ids via a lemma join; terms_delta is discarded
       (delta arithmetic cannot see dropped duplicates).
    4. stats.json is refreshed and only the tail doc-range buckets
       covering the new ids are (re-)encoded into segments.

    After compaction all three engines serve batch+streamed docs with
    scores identical to a from-scratch build over the merged corpus
    (ids may differ — batch docs keep theirs; pinned by
    tests/test_compaction.py)."""
    import shutil

    from pyspark.sql import Window

    from search_engine_spark.streaming.incremental import STREAM_ID_BASE

    stats = load_stats(index_dir)
    if stats is None:
        raise ValueError(f"no index at {index_dir} (stats.json missing)")
    stream_docs_path = os.path.join(index_dir, "docs_stream")
    delta_path = os.path.join(index_dir, "terms_delta")
    if not os.path.isdir(stream_docs_path) and not os.path.isdir(delta_path):
        # no-op check BEFORE the snapshot: a periodic refresh loop with
        # nothing pending must not accumulate a hardlink tree per cycle
        # and push real pre-mutation snapshots out of the GC keep
        # window (review r3)
        return {"compacted": False, "reason": "no streamed deltas"}
    if snapshot:
        create_snapshot(index_dir, note="pre compact_index")
    # folding streamed turns changes the corpus -> derived positional
    # table goes stale; drop it (re-derivable, snapshot keeps history)
    invalidate_derived(index_dir)
    disk = DiskIndex(spark, index_dir)

    # docs with explicit ids, materialized locally if mapped (_mid /
    # by-reference) — same copy-on-first-write as reindex_turn
    docs_path = os.path.join(index_dir, "docs")
    base_docs = disk._base_docs
    if disk.docs_source or "doc_id" not in (
        spark.read.parquet(docs_path).columns
        if os.path.isdir(docs_path)
        else []
    ):
        _swap_write_bucketed(base_docs, docs_path, bucket_width)
        stats["docs_source"] = None
        stats["docid_adjust"] = {}
        base_docs = _read_table(spark, docs_path)

    if not os.path.isdir(stream_docs_path):
        # delta-only layout (stream store predates this feature or was
        # already folded): nothing to remap — rebuild the dictionary
        # from postings and refresh stats, then drop the delta log
        _compact_terms_and_stats(spark, index_dir, stats)
        shutil.rmtree(delta_path, ignore_errors=True)
        return {"compacted": True, "n_streamed": 0, "n_dup_dropped": 0}

    # a key re-delivered across epochs appears multiple times in the
    # stream store (same hash id) — keep one version; exact-duplicate
    # postings rows below collapse the same way. Re-streaming a key
    # with DIFFERENT text is not an update mechanism (use reindex_turn).
    streamed = spark.read.parquet(stream_docs_path)
    key = ["conv_id", "turn_idx"]
    streamed = streamed.dropDuplicates(key)
    dup = streamed.join(base_docs.select(*key), key, "left_semi")
    fresh = streamed.join(base_docs.select(*key), key, "left_anti")
    n_dup = dup.count()
    base_max = base_docs.agg(F.max("doc_id")).collect()[0][0]
    next_id = int(base_max) + 1 if base_max is not None else 0

    # dense tail ids for the fresh streamed docs. Streamed volume per
    # compaction cycle is bounded (it is the un-merged delta, not the
    # corpus), so a single-partition window is fine here; a huge
    # backlog would swap in operators/docids.assign_dense_ids.
    w = Window.orderBy(*key)
    remap = (
        fresh.select(F.col("doc_id").alias("_old"), *key)
        .withColumn(
            "_new", F.row_number().over(w).cast("long") + F.lit(next_id - 1)
        )
        .select("_old", "_new")
    ).persist()
    n_new = remap.count()

    # fold streamed postings/doclen/docs deltas into the base tables
    # with remapped dense ids. Exact-duplicate delta rows (re-delivered
    # identical content) are collapsed before the remap; the remap
    # INNER join both renumbers fresh docs and drops dup-key docs
    # (batch-wins). The fresh dense ids are CONTIGUOUS past next_id, so
    # on a v4 (bucket-partitioned) table only the TAIL buckets they
    # land in are rewritten — every pre-existing bucket's files are
    # untouched (the Iceberg-MERGE mutation bound); v3 unpartitioned
    # dirs fall back to a whole-table rewrite that upgrades them to v4.
    postings_path = os.path.join(index_dir, "postings")
    doclen_path = os.path.join(index_dir, "doclen")
    lo_b = next_id // bucket_width
    hi_b = (next_id + max(n_new, 1) - 1) // bucket_width
    tail_buckets = list(range(lo_b, hi_b + 1))

    def remapped(df: DataFrame) -> DataFrame:
        d = df.dropDuplicates()
        joined = d.join(F.broadcast(remap), d["doc_id"] == F.col("_old"), "inner")
        return joined.withColumn("doc_id", F.col("_new")).drop("_old", "_new")

    def fold(base_path: str, stream_path: str, cluster: bool = False) -> None:
        if not os.path.isdir(stream_path) or n_new == 0:
            return  # nothing to fold (dup-only delta rows die with the dir)
        add = remapped(spark.read.parquet(stream_path)).withColumn(
            "bucket", _bucket_col(bucket_width)
        )
        if _is_bucketed(base_path):
            base_part = spark.read.parquet(base_path).filter(
                F.col("bucket").isin(tail_buckets)
            )
            out = base_part.unionByName(add)
            if cluster:  # keep the postings lemma-file-clustering invariant
                out = out.repartitionByRange(
                    "bucket", "lemma", "doc_id"
                ).sortWithinPartitions("bucket", "lemma", "doc_id")
            _swap_buckets(spark, base_path, out, tail_buckets, schema_src=add)
        else:
            _swap_write_bucketed(
                _read_table(spark, base_path).unionByName(add.drop("bucket")),
                base_path,
                bucket_width,
            )

    fold(postings_path, os.path.join(index_dir, "postings_stream"), cluster=True)
    fold(doclen_path, os.path.join(index_dir, "doclen_stream"))
    if n_new and _is_bucketed(docs_path):
        add_docs = remapped(fresh).withColumn("bucket", _bucket_col(bucket_width))
        base_part = spark.read.parquet(docs_path).filter(
            F.col("bucket").isin(tail_buckets)
        )
        _swap_buckets(
            spark,
            docs_path,
            base_part.unionByName(add_docs, allowMissingColumns=True),
            tail_buckets,
            schema_src=add_docs,
        )
    else:
        _swap_write_bucketed(
            base_docs.unionByName(remapped(fresh), allowMissingColumns=True),
            docs_path,
            bucket_width,
        )
    # the stream checkpoint SURVIVES compaction — already-drained input
    # files must not re-ingest on the next refresh
    shutil.rmtree(stream_docs_path, ignore_errors=True)
    shutil.rmtree(os.path.join(index_dir, "postings_stream"), ignore_errors=True)
    shutil.rmtree(os.path.join(index_dir, "doclen_stream"), ignore_errors=True)

    # exact dictionary rebuild + stats refresh, then drop the delta log
    _compact_terms_and_stats(spark, index_dir, stats)
    shutil.rmtree(delta_path, ignore_errors=True)

    # (re-)encode only the tail buckets covering the new dense ids
    metrics: dict = {"compacted": True, "n_streamed": n_new, "n_dup_dropped": n_dup}
    if n_new:
        lo_b = next_id // bucket_width
        hi_b = (next_id + n_new - 1) // bucket_width
        affected = list(range(lo_b, hi_b + 1))
        for b in affected:
            shutil.rmtree(
                os.path.join(index_dir, "segments", f"bucket={b}"),
                ignore_errors=True,
            )
            try:
                os.remove(os.path.join(_manifest_dir(index_dir), f"bucket={b}.json"))
            except FileNotFoundError:
                pass
        disk2 = DiskIndex(spark, index_dir)
        ix = disk2.as_inverted_index()
        ix.backing_dir = index_dir
        lo_doc = lo_b * bucket_width
        ix.postings = ix.postings.filter(F.col("doc_id") >= lo_doc)
        metrics.update(
            _write_segment_buckets(
                ix, index_dir, affected, bucket_width,
                input_desc=f"compaction:+{n_new}",
            )
        )
        metrics["buckets_reencoded"] = len(affected)
    remap.unpersist()
    return metrics


def _compact_terms_and_stats(
    spark: SparkSession, index_dir: str, stats: dict
) -> None:
    """Exact dictionary rebuild from the (rewritten) postings table,
    term_id-stable via a lemma join (reindex_turn pattern), plus a
    stats.json refresh from doclen."""
    from pyspark.sql import Window

    from search_engine_spark.operators.index_build import build_terms

    old_terms = spark.read.parquet(os.path.join(index_dir, "terms")).select(
        "term_id", "lemma"
    )
    fresh_terms = build_terms(
        spark.read.parquet(os.path.join(index_dir, "postings")),
        assign_ids=False,
    )
    max_id = old_terms.agg(F.max("term_id")).collect()[0][0] or 0
    new_id_w = Window.orderBy("lemma")
    merged = (
        fresh_terms.join(old_terms, "lemma", "left")
        .withColumn(
            "term_id",
            F.coalesce(
                "term_id", F.row_number().over(new_id_w) + F.lit(int(max_id))
            ),
        )
        .select("term_id", "lemma", "df", "cf")
    )
    _swap_write(merged, os.path.join(index_dir, "terms"))

    dstats = spark.read.parquet(os.path.join(index_dir, "doclen")).agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    # avg over zero rows is NULL — a delete_scope can legitimately
    # empty the index (single-scope corpus)
    stats["n_docs"] = int(dstats["n"])
    stats["avgdl"] = float(dstats["avgdl"]) if dstats["avgdl"] is not None else 0.0
    tmp = os.path.join(index_dir, "stats.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(stats, fh)
    os.replace(tmp, os.path.join(index_dir, "stats.json"))


def _swap_sibling(path: str, suffix: str) -> str:
    """Transient sibling dir for a swap of `path`, with a DOT-prefixed
    leaf name: when `path` is a partition dir inside a live table
    (e.g. postings/bucket=3), the in-flight copy and crash residue must
    be INVISIBLE to Hadoop file listing / partition discovery — a
    visible `bucket=3.tmp_swap` dir would be discovered as a partition
    (value "3.tmp_swap", forcing the bucket column to string) and its
    stale rows served next to the live ones."""
    head, leaf = os.path.split(path)
    return os.path.join(head, f".{leaf}.{suffix}")


def _swap_write(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    """Rewrite a parquet dir we may be reading from: write to a hidden
    sibling tmp dir, then atomically swap (Spark refuses to overwrite
    an input of a running plan, and a crash mid-write must not clobber
    the old table — nor leave residue that partition discovery would
    read, see _swap_sibling)."""
    import shutil

    tmp = _swap_sibling(path, "tmp_swap")
    shutil.rmtree(tmp, ignore_errors=True)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(tmp)
    old = _swap_sibling(path, "old")
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(path):
        os.replace(path, old)
    os.replace(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def _swap_write_bucketed(df: DataFrame, path: str, bucket_width: int) -> None:
    """Whole-table rewrite in the v4 bucket-partitioned layout (the
    bucket column is derived from doc_id, stripped again on read)."""
    _swap_write(
        df.withColumn("bucket", _bucket_col(bucket_width)),
        path,
        partition_by="bucket",
    )


def _swap_buckets(
    spark: SparkSession,
    path: str,
    out: DataFrame,
    buckets: list[int],
    schema_src: DataFrame,
) -> None:
    """Replace ONLY the given bucket partition dirs of a v4 table with
    `out` (which must carry a `bucket` column restricted to `buckets`):
    one job writes the replacement partitions to a tmp dir, then each
    affected bucket dir is swapped in place — untouched buckets' files
    are never read or rewritten (the Iceberg-MERGE-shaped mutation
    bound). A bucket with no surviving rows is removed; if the table
    would end up with no buckets at all (scope == whole corpus), an
    empty unpartitioned parquet with the original schema is written so
    readers keep resolving the schema."""
    import shutil

    # DOT-prefixed sibling of the TABLE dir: crash residue must be
    # invisible to create_snapshot's tree walk too (a visible
    # postings.tmp_swap would be hardlinked into every later snapshot
    # forever — review r3)
    tmp = _swap_sibling(path, "tmp_swap")
    shutil.rmtree(tmp, ignore_errors=True)
    out.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    for b in buckets:
        src_b = os.path.join(tmp, f"bucket={b}")
        dst_b = os.path.join(path, f"bucket={b}")
        # the retired partition parks INSIDE the live table until the
        # rmtree below — hide it from partition discovery (a visible
        # `bucket=3.old` would be read as partition value "3.old",
        # forcing the bucket column to string and double-serving rows)
        old = _swap_sibling(dst_b, "old")
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(dst_b):
            os.replace(dst_b, old)
        if os.path.isdir(src_b):
            os.replace(src_b, dst_b)
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    if not _is_bucketed(path):
        # every bucket deleted: leave a readable empty table
        _swap_write(schema_src.drop("bucket").limit(0).coalesce(1), path)


POSITIONAL_DIR = "positional"


def write_positional_index(
    pos_postings: DataFrame,
    index_dir: str,
    bucket_width: int = DOC_BUCKET_WIDTH,
) -> None:
    """Persist the positional postings (doc_id, lemma, positions
    sorted-array<int> — operators/positional.build_positional_postings)
    beside the other index tables, bucket-partitioned by doc range
    like every v4 table, so span/phrase/NEAR positional queries read
    a partition-prunable table instead of recomputing positions from
    text per run — the at-scale form of the positional option
    (VERDICT r2 missing #3).

    The positional table is a DERIVED acceleration structure: corpus
    mutations (reindex_turn / delete_where / compact_index folding
    streamed turns) INVALIDATE it by dropping the dir — always
    correct, never stale; rebuild with ``build_index --positional``
    or this function. (A future increment can rewrite affected
    buckets instead, exactly like the per-doc tables.) Coverage
    contract: the table describes the BASE docs only — streamed turns
    pending compaction are not in it (same base/stream split as the
    segments; compaction's invalidation forces the rebuild that folds
    them in)."""
    _swap_write_bucketed(
        pos_postings, os.path.join(index_dir, POSITIONAL_DIR), bucket_width
    )


def invalidate_positional(index_dir: str) -> bool:
    """Drop the derived positional table (called by every corpus
    mutation). Returns True if one existed."""
    import shutil

    p = os.path.join(index_dir, POSITIONAL_DIR)
    if os.path.isdir(p):
        shutil.rmtree(p)
        return True
    return False


FIELDS_DIR = "fields"
FIELDLEN_DIR = "fieldlen"
FIELD_STATS = "_bm25f_stats.json"


def write_field_index(
    docs: DataFrame,
    index_dir: str,
    bucket_width: int = DOC_BUCKET_WIDTH,
    text_col: str = "text",
    fields=None,
) -> dict:
    """Persist the per-field BM25F index beside the other v4 tables:
    ``fields`` (doc_id, field, lemma, tf) and ``fieldlen`` (doc_id,
    field, len), both bucket-partitioned by doc range, plus exact
    integer field statistics (Σlen, n_docs per field) in
    ``fields/_bm25f_stats.json`` — so bm25f_topk_indexed scores from a
    lemma-pruned postings scan without ever touching the corpus text
    (the r4 verdict's "index-backed BM25F", reference field weights
    FieldRepository.java:15-19).

    DERIVED table, same contract as positional/: every corpus
    mutation invalidates it (invalidate_derived); rebuild with
    ``build_index --fields`` or this function. Stats are integers so
    avglen is the exact CAST(total)/CAST(n) double division every
    consumer (Spark scorer, DuckDB twin) reproduces bit-identically.
    Returns the stats dict."""
    import json as _json

    from search_engine_spark.operators.bm25f import (
        build_field_postings,
        default_fields,
    )

    specs = tuple(fields) if fields else default_fields(text_col=text_col)
    tf, flen = build_field_postings(docs, text_col=text_col, fields=specs)
    _swap_write_bucketed(tf, os.path.join(index_dir, FIELDS_DIR),
                         bucket_width)
    _swap_write_bucketed(flen, os.path.join(index_dir, FIELDLEN_DIR),
                         bucket_width)
    spark = docs.sparkSession
    stats_rows = (
        spark.read.parquet(os.path.join(index_dir, FIELDLEN_DIR))
        .groupBy("field")
        .agg(F.sum("len").alias("total_len"), F.count("*").alias("n_docs"))
        .collect()
    )
    stats = {r["field"]: {"total_len": int(r["total_len"]),
                          "n_docs": int(r["n_docs"])} for r in stats_rows}
    # the spec list rides along so bucket-bounded refreshes replay the
    # exact field configuration the index was built with
    stats["_specs"] = [[f.name, f.expr, float(f.weight)] for f in specs]
    sp = os.path.join(index_dir, FIELDS_DIR, FIELD_STATS)
    with open(sp + ".tmp", "w") as fh:
        _json.dump(stats, fh)
    os.replace(sp + ".tmp", sp)
    return stats


def snapshot_diff(
    spark: SparkSession,
    index_dir: str,
    v_old: int,
    v_new: int | None = None,
    sample: int = 10,
) -> dict:
    """What changed between two index versions — the audit an operator
    runs before expiring a snapshot or after an incident ("what did
    yesterday's mutations touch?"): docs ADDED (id only in new),
    REMOVED (id only in old), and TEXT-CHANGED (same id, different
    text), computed from the two as_of docs frames (hardlink snapshot
    trees — reading them costs no extra storage). ``v_new=None``
    diffs against the LIVE index.

    Plan: two doc scans + one full outer join on doc_id (the per-doc
    dimension, not postings) — O(docs), never O(postings); counts via
    one aggregate, plus a ``sample``-bounded id list per category for
    the report. Returns {added, removed, changed, n_old, n_new,
    added_ids, removed_ids, changed_ids}."""
    old_docs = DiskIndex(spark, index_dir, as_of=v_old).docs.select(
        "doc_id", F.col("text").alias("_t_old")
    )
    new_docs = DiskIndex(spark, index_dir, as_of=v_new).docs.select(
        "doc_id", F.col("text").alias("_t_new")
    )
    j = old_docs.join(new_docs, "doc_id", "full_outer").select(
        "doc_id",
        F.col("_t_old").isNull().alias("_added"),
        F.col("_t_new").isNull().alias("_removed"),
        (F.col("_t_old").isNotNull() & F.col("_t_new").isNotNull()
         & (F.col("_t_old") != F.col("_t_new"))).alias("_changed"),
    ).localCheckpoint(eager=True)
    agg = j.agg(
        F.sum(F.col("_added").cast("long")).alias("a"),
        F.sum(F.col("_removed").cast("long")).alias("r"),
        F.sum(F.col("_changed").cast("long")).alias("c"),
        F.count("*").alias("n"),
    ).head()

    def ids(col):
        return [int(x["doc_id"]) for x in
                j.filter(F.col(col)).orderBy("doc_id").limit(sample).collect()]

    return {
        "v_old": int(v_old),
        "v_new": None if v_new is None else int(v_new),
        "added": int(agg["a"]), "removed": int(agg["r"]),
        "changed": int(agg["c"]),
        "n_old": int(agg["n"]) - int(agg["a"]),
        "n_new": int(agg["n"]) - int(agg["r"]),
        "added_ids": ids("_added"),
        "removed_ids": ids("_removed"),
        "changed_ids": ids("_changed"),
    }


def _load_field_stats(index_dir: str, raw: bool = False) -> dict:
    """Field statistics from write_field_index's JSON; ``raw=True``
    keeps the ``_specs`` meta entry (consumers of per-field numbers
    must not see it)."""
    import json as _json

    with open(os.path.join(index_dir, FIELDS_DIR, FIELD_STATS)) as fh:
        stats = _json.load(fh)
    if raw:
        return stats
    return {k: v for k, v in stats.items() if not k.startswith("_")}


def refresh_field_bucket(
    spark: SparkSession, index_dir: str, bucket: int,
    bucket_width: int = DOC_BUCKET_WIDTH,
) -> bool:
    """Bucket-bounded maintenance of the per-field BM25F tables after
    a single-doc mutation: recompute the field rows for the AFFECTED
    doc-range bucket only (a partition-pruned read of the updated docs
    bucket), swap just that bucket's dirs in ``fields``/``fieldlen``,
    and delta-update the exact integer stats — O(1 bucket) of IO, the
    same mutation bound every other v4 table already honors (so
    reindex_turn no longer has to invalidate the whole field index).
    The field configuration is replayed from the ``_specs`` the build
    recorded. Returns False (caller should invalidate instead) when no
    field index exists or it predates the spec record."""
    from search_engine_spark.operators.bm25f import (
        FieldSpec,
        build_field_postings,
    )

    fdir = os.path.join(index_dir, FIELDS_DIR)
    ldir = os.path.join(index_dir, FIELDLEN_DIR)
    if not (os.path.isdir(fdir) and os.path.isdir(ldir)):
        return False
    stats = _load_field_stats(index_dir, raw=True)
    if "_specs" not in stats:
        return False
    specs = tuple(FieldSpec(n, e, w) for n, e, w in stats["_specs"])

    docs_path = os.path.join(index_dir, "docs")
    if _is_bucketed(docs_path):
        bdocs = spark.read.parquet(
            os.path.join(docs_path, f"bucket={bucket}")
        )
    else:
        lo, hi = bucket * bucket_width, (bucket + 1) * bucket_width
        bdocs = _read_table(spark, docs_path).filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )

    old_bdir = os.path.join(ldir, f"bucket={bucket}")
    old = {}
    if os.path.isdir(old_bdir):
        for r in (
            spark.read.parquet(old_bdir).groupBy("field")
            .agg(F.sum("len").alias("t"), F.count("*").alias("n"))
            .collect()
        ):
            old[r["field"]] = (int(r["t"]), int(r["n"]))

    tf, flen = build_field_postings(bdocs, fields=specs)
    tf_b = tf.withColumn("bucket", _bucket_col(bucket_width))
    flen_b = flen.withColumn("bucket", _bucket_col(bucket_width))
    flen_b = flen_b.localCheckpoint(eager=True)  # read before any swap
    new = {}
    for r in (
        flen_b.groupBy("field")
        .agg(F.sum("len").alias("t"), F.count("*").alias("n"))
        .collect()
    ):
        new[r["field"]] = (int(r["t"]), int(r["n"]))
    _swap_buckets(spark, fdir, tf_b, [bucket],
                  schema_src=spark.read.parquet(fdir))
    _swap_buckets(spark, ldir, flen_b, [bucket],
                  schema_src=spark.read.parquet(ldir))

    import json as _json

    for fname in set(old) | set(new):
        ot, on = old.get(fname, (0, 0))
        nt, nn = new.get(fname, (0, 0))
        cur = stats.get(fname, {"total_len": 0, "n_docs": 0})
        stats[fname] = {
            "total_len": int(cur["total_len"]) - ot + nt,
            "n_docs": int(cur["n_docs"]) - on + nn,
        }
    sp = os.path.join(index_dir, FIELDS_DIR, FIELD_STATS)
    with open(sp + ".tmp", "w") as fh:
        _json.dump(stats, fh)
    os.replace(sp + ".tmp", sp)
    return True


class _FieldIndexHandle:
    """Minimal serving handle over a field-index dir — same duck type
    as DiskIndex's fields/fieldlen/field_stats surface, for callers
    that built ONLY the BM25F tables (write_field_index over a bare
    documents table, no full index)."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir

    @property
    def fields(self) -> DataFrame | None:
        p = os.path.join(self.index_dir, FIELDS_DIR)
        return _read_table(self.spark, p) if os.path.isdir(p) else None

    @property
    def fieldlen(self) -> DataFrame | None:
        p = os.path.join(self.index_dir, FIELDLEN_DIR)
        return _read_table(self.spark, p) if os.path.isdir(p) else None

    @property
    def field_stats(self) -> dict:
        return _load_field_stats(self.index_dir)


def open_field_index(spark: SparkSession, index_dir: str) -> _FieldIndexHandle:
    return _FieldIndexHandle(spark, index_dir)


def invalidate_fields(index_dir: str) -> bool:
    """Drop the derived per-field BM25F tables (called by every corpus
    mutation via invalidate_derived). Returns True if one existed."""
    import shutil

    hit = False
    for d in (FIELDS_DIR, FIELDLEN_DIR):
        p = os.path.join(index_dir, d)
        if os.path.isdir(p):
            shutil.rmtree(p)
            hit = True
    return hit


def invalidate_derived(index_dir: str) -> bool:
    """Drop EVERY derived acceleration table (positional + per-field)
    — the one call corpus mutations make; a mutation that leaves any
    derived table in place serves stale results."""
    a = invalidate_positional(index_dir)
    b = invalidate_fields(index_dir)
    return a or b


def delete_scope(
    spark: SparkSession,
    index_dir: str,
    scope_col: str,
    scope_value: str,
    bucket_width: int = DOC_BUCKET_WIDTH,
    snapshot: bool = True,
) -> dict:
    """Bulk delete of one scope's documents — the reference's
    ``delete_site_information`` / ``delete_function`` (plpgsql cascade
    wired from ConfigRepository.java:339-388: drop the site's pages,
    their index rows, and now-orphaned lemmas).

    Surviving docs KEEP their doc_ids (the docID space stays a stable
    bijection, now with holes — same contract as reindex_turn). On the
    v4 bucket-partitioned layout, postings/doclen/docs are rewritten
    per AFFECTED BUCKET only (one partition-pruned anti-join job per
    table, then bucket-dir swaps — untouched buckets' files are never
    read or written, matching what the segment re-encode already
    achieves); v3 unpartitioned dirs fall back to whole-table swaps
    that upgrade them to v4. The dictionary is rebuilt exactly from the
    surviving postings (orphaned lemmas disappear because build_terms
    only sees df>0), stats.json refreshes n_docs/avgdl, and ONLY
    segment buckets that contained a deleted doc are re-encoded. After
    deletion both engines score identically to a from-scratch build
    over the remaining corpus (pinned by tests/test_reindex.py).

    Pending streamed deltas are folded in first (compact_index) so the
    scope's streamed turns are deleted too and the delta log can't
    double-count the rebuilt dictionary. Crash-safety: the scope AND
    the affected bucket list are journaled to ``delete_pending.json``
    BEFORE any table swap; the NEXT delete_scope call (or any call
    after restart) replays the WHOLE journaled delete — the anti-join
    bucket rewrites are idempotent on already-deleted docs, the
    dictionary/stats rebuild recomputes from whatever table state the
    crash left, and the segment re-encode runs from the repaired
    tables — so a crash at ANY point between the journal write and the
    journal removal converges to the consistent post-delete index
    (ADVICE r2: a replay that only re-ran the re-encode left a crash
    between the first swap and the stats rebuild permanently
    inconsistent)."""
    esc = str(scope_value).replace("'", "''")
    return delete_where(
        spark, index_dir, f"{scope_col} = '{esc}'",
        bucket_width=bucket_width, snapshot=snapshot,
        _note=f"delete_scope {scope_col}={scope_value}",
    )


@_single_writer("delete_where", "index_dir")
def delete_where(
    spark: SparkSession,
    index_dir: str,
    pred_sql: str,
    bucket_width: int = DOC_BUCKET_WIDTH,
    snapshot: bool = True,
    _note: str | None = None,
) -> dict:
    """Delete-by-query (the Elasticsearch ``_delete_by_query`` / SQL
    ``DELETE WHERE`` primitive): remove every document whose doc-store
    row satisfies ``pred_sql`` — an arbitrary SQL predicate over the
    transcript columns (``role = 'tool'``, ``ts < timestamp
    '2026-01-01'``, ``conv_id LIKE 'batch7%'`` …). Time-based
    RETENTION is exactly a ts predicate here
    (``refresh_index.py --delete-where``). :func:`delete_scope` is the
    single-equality wrapper.

    Same machinery and guarantees as delete_scope (it is the
    generalization): bucket-bounded anti-join rewrites, exact
    dictionary/stats rebuild, surgical segment re-encode, pre-delete
    auto-snapshot, and the whole-delete crash journal — the PREDICATE
    STRING is what's journaled, so replay-after-crash re-derives the
    doomed set from whatever table state the crash left (idempotent:
    already-deleted docs no longer match)."""
    stats = load_stats(index_dir)
    if stats is None:
        raise ValueError(f"no index at {index_dir} (stats.json missing)")

    # fold pending streamed deltas first: the deletion must see the
    # streamed turns, and the delta log must not survive the exact
    # dictionary rebuild below (it would double-count df/cf)
    if os.path.isdir(os.path.join(index_dir, "docs_stream")) or os.path.isdir(
        os.path.join(index_dir, "terms_delta")
    ):
        # the explicit pre-delete snapshot below covers this fold too
        compact_index(spark, index_dir, bucket_width, snapshot=False)

    pending_path = os.path.join(index_dir, "delete_pending.json")
    if os.path.isfile(pending_path):
        # a previous delete crashed mid-flight: replay the WHOLE
        # journaled delete (idempotent) before doing new work
        with open(pending_path) as fh:
            pending = json.load(fh)
        # legacy journals recorded ["scope_col", "scope_value"]
        old_pred = pending.get("pred") or (
            "{} = '{}'".format(
                pending["scope"][0],
                str(pending["scope"][1]).replace("'", "''"),
            )
        )
        _run_scope_delete(
            spark, index_dir, old_pred,
            pending["buckets"], int(pending["bucket_width"]),
        )

    if snapshot:
        # freeze the (now-consistent: deltas folded, crashes replayed)
        # pre-delete state — time-travel readable via DiskIndex(as_of=v)
        create_snapshot(index_dir, note=f"pre {_note or f'delete_where {pred_sql}'}")

    disk = DiskIndex(spark, index_dir)
    # _base_docs resolves every layout (local parquet, by-reference
    # docs_source, spilled _mid + docid_adjust) to explicit doc_ids
    docs_raw = disk._base_docs
    doomed = (
        docs_raw.filter(F.expr(pred_sql))
        .select("doc_id")
        .persist()
    )
    n_deleted = doomed.count()
    if n_deleted == 0:
        doomed.unpersist()
        return {"deleted": 0, "buckets_reencoded": []}
    buckets = sorted(
        int(r[0])
        for r in doomed.select(
            (F.col("doc_id") / bucket_width).cast("long")
        ).distinct().collect()
    )
    # journal predicate + buckets BEFORE any table swap (crash repair)
    tmp = pending_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"buckets": buckets, "bucket_width": bucket_width,
                   "pred": pred_sql}, fh)
    os.replace(tmp, pending_path)
    _run_scope_delete(
        spark, index_dir, pred_sql, buckets, bucket_width,
        doomed=doomed,
    )
    doomed.unpersist()
    return {"deleted": int(n_deleted), "buckets_reencoded": buckets}


def _anti_delete_table(
    spark: SparkSession,
    path: str,
    doomed: DataFrame,
    buckets: list[int],
    bucket_width: int,
    source: DataFrame | None = None,
    cluster: bool = False,
) -> None:
    """Remove `doomed` doc_ids from one per-doc table. v4 layout: only
    the affected bucket dirs are read (partition-pruned) and swapped;
    legacy layouts rewrite the whole table (via `source` when the table
    needs id derivation) and upgrade it to v4."""
    if _is_bucketed(path):
        src = spark.read.parquet(path).filter(F.col("bucket").isin(buckets))
        out = src.join(F.broadcast(doomed), "doc_id", "left_anti")
        if cluster:  # preserve the postings lemma-file-clustering
            out = out.repartitionByRange(
                "bucket", "lemma", "doc_id"
            ).sortWithinPartitions("bucket", "lemma", "doc_id")
        _swap_buckets(spark, path, out, buckets, schema_src=src)
    else:
        base = source if source is not None else _read_table(spark, path)
        _swap_write_bucketed(
            base.join(F.broadcast(doomed), "doc_id", "left_anti"),
            path,
            bucket_width,
        )


def _run_scope_delete(
    spark: SparkSession,
    index_dir: str,
    pred_sql: str,
    buckets: list[int],
    bucket_width: int,
    doomed: DataFrame | None = None,
) -> None:
    """The journaled (replayable) body of :func:`delete_where`: bucket
    anti-join rewrites → dictionary/stats rebuild → segment re-encode →
    journal removal. Every step is idempotent, so a crash anywhere in
    here is repaired by running it again with the journaled predicate
    (the doomed set is recomputed from the CURRENT docs table — empty
    if the docs swap already happened, making the rewrites no-ops)."""
    import shutil

    stats = load_stats(index_dir) or {}
    pending_path = os.path.join(index_dir, "delete_pending.json")
    disk = DiskIndex(spark, index_dir)
    docs_raw = disk._base_docs
    doomed_local = doomed is None
    # corpus shrinks -> the derived positional table goes stale
    invalidate_derived(index_dir)
    if doomed is None:
        doomed = (
            docs_raw.filter(F.expr(pred_sql))
            .select("doc_id")
            .persist()
        )
    if doomed.limit(1).count() > 0:
        docs_path = os.path.join(index_dir, "docs")
        _anti_delete_table(
            spark, os.path.join(index_dir, "postings"), doomed, buckets,
            bucket_width, cluster=True,
        )
        _anti_delete_table(
            spark, os.path.join(index_dir, "doclen"), doomed, buckets,
            bucket_width,
        )
        _anti_delete_table(
            spark, docs_path, doomed, buckets, bucket_width, source=docs_raw,
        )
        # by-reference/spilled docs were materialized locally with
        # explicit ids by the whole-table fallback above
        stats["docs_source"] = None
        stats["docid_adjust"] = {}
    if doomed_local:
        doomed.unpersist()
    # exact dictionary rebuild from surviving postings + stats refresh
    _compact_terms_and_stats(spark, index_dir, stats)
    # surgically re-encode only the buckets that lost docs
    disk2 = DiskIndex(spark, index_dir)
    ix = disk2.as_inverted_index()
    ix.backing_dir = index_dir
    for b in buckets:
        shutil.rmtree(
            os.path.join(index_dir, "segments", f"bucket={b}"),
            ignore_errors=True,
        )
    _write_segment_buckets(
        ix, index_dir, todo=list(buckets), bucket_width=bucket_width,
        input_desc=f"delete_where:{pred_sql}",
    )
    os.remove(pending_path)


@_single_writer("reindex_turn", "index_dir")
def reindex_turn(
    spark: SparkSession,
    index_dir: str,
    conv_id: str,
    turn_idx: int,
    new_text: str,
    bucket_width: int = DOC_BUCKET_WIDTH,
    snapshot: bool = True,
) -> dict:
    """Single-document delete + reinsert — the reference's
    ``/api/indexPage`` (Parser.java:181-256: remove the page's postings,
    re-lemmatize, re-insert, adjust the lemma dictionary).

    The turn keeps its doc_id (the docID space is a stable bijection);
    its postings/doclen rows are replaced, the dictionary is updated by
    DELTA arithmetic (df -= old-presence, += new-presence; cf -= old-tf,
    += new-tf; brand-new lemmas get fresh ids past the current max — no
    full dictionary rebuild), stats.json's avgdl is recomputed from the
    updated doclen, and ONLY the affected doc-range segment bucket is
    re-encoded + its manifest rewritten. Because segments store raw
    tf/dl (stats-independent, compression.py v2), the untouched buckets
    stay EXACT under the new df/avgdl — after a reindex, both engines
    equal a from-scratch build immediately (pinned by
    tests/test_reindex.py). On the v4 bucket-partitioned layout the
    postings/doclen/docs rewrites read and swap ONLY the affected
    bucket's partition dir — a 1-turn edit is O(1 bucket) of IO on
    every table, never a whole-table rewrite (the parquet stand-in for
    Iceberg MERGE INTO; v3 unpartitioned dirs fall back to whole-table
    swaps that upgrade them to v4). The small terms table and the
    one-bucket segment re-encode are unchanged."""
    from search_engine_spark.operators.compression import build_segments
    from search_engine_spark.operators.index_build import (
        InvertedIndex,
        build_postings_no_shuffle,
        role_weight_col,
    )
    from search_engine_spark.streaming.incremental import STREAM_ID_BASE

    if snapshot:
        create_snapshot(
            index_dir, note=f"pre reindex_turn ({conv_id}, {turn_idx})"
        )
    # the derived positional table would go stale — drop it (snapshot
    # above still serves it as_of the pre-mutation version); the FIELD
    # tables are instead maintained bucket-bounded at the end of this
    # mutation (refresh_field_bucket) — invalidation is the fallback
    invalidate_positional(index_dir)
    had_fields = os.path.isdir(os.path.join(index_dir, FIELDS_DIR))

    disk = DiskIndex(spark, index_dir)
    docs = disk.docs
    hit = docs.filter(
        (F.col("conv_id") == conv_id) & (F.col("turn_idx") == turn_idx)
    ).collect()
    if len(hit) != 1:
        raise ValueError(f"({conv_id!r}, {turn_idx}) matches {len(hit)} docs")
    row = hit[0]
    d = int(row["doc_id"])
    if d >= STREAM_ID_BASE:
        raise ValueError(
            f"({conv_id!r}, {turn_idx}) is a streamed (not-yet-compacted) "
            "turn — run compact_index first, then reindex"
        )
    bucket = d // bucket_width

    # new postings for the one replaced doc (same Arrow UDF lineage)
    one = docs.filter(F.col("doc_id") == d).drop("text").withColumn(
        "text", F.lit(new_text)
    )
    weight = role_weight_col("role") if "role" in docs.columns else None
    new_post = build_postings_no_shuffle(one, weight_col=weight).persist()

    postings_path = os.path.join(index_dir, "postings")
    post_bucketed = _is_bucketed(postings_path)
    postings = (
        # v4: the only postings rows this mutation reads are the
        # affected bucket's dir (a leaf read — no partition column)
        spark.read.parquet(os.path.join(postings_path, f"bucket={bucket}"))
        if post_bucketed
        else spark.read.parquet(postings_path)
    )
    old_post = postings.filter(F.col("doc_id") == d).persist()
    # materialize BOTH deltas before any table swap — their plans read
    # the very dirs the swaps replace, and persist() alone is lazy
    old_post.count()
    new_post.count()

    # dictionary delta (no rebuild): df/cf adjusted per lemma
    terms = spark.read.parquet(os.path.join(index_dir, "terms"))
    oldc = old_post.groupBy("lemma").agg(F.sum("tf").alias("_otf"))
    newc = new_post.groupBy("lemma").agg(F.sum("tf").alias("_ntf"))
    max_id = terms.agg(F.max("term_id")).collect()[0][0] or 0
    merged = (
        terms.join(oldc, "lemma", "full_outer")
        .join(newc, "lemma", "full_outer")
        .withColumn(
            "df",
            F.coalesce("df", F.lit(0))
            - F.when(F.col("_otf").isNotNull(), 1).otherwise(0)
            + F.when(F.col("_ntf").isNotNull(), 1).otherwise(0),
        )
        .withColumn(
            "cf",
            F.coalesce("cf", F.lit(0)).cast("long")
            - F.coalesce("_otf", F.lit(0)).cast("long")
            + F.coalesce("_ntf", F.lit(0)).cast("long"),
        )
        .filter(F.col("df") > 0)
    )
    from pyspark.sql import Window

    new_id_w = Window.orderBy("lemma")
    merged = merged.withColumn(
        "term_id",
        F.coalesce(
            "term_id",
            F.row_number().over(new_id_w) + F.lit(int(max_id)),
        ),
    ).select("term_id", "lemma", "df", "cf")

    new_postings = (
        postings.filter(F.col("doc_id") != d)
        .unionByName(new_post.select(*postings.columns))
        # keep the per-bucket lemma-file-clustering invariant
        .repartitionByRange("lemma", "doc_id")
        .sortWithinPartitions("lemma", "doc_id")
    )
    if post_bucketed:
        _swap_write(new_postings, os.path.join(postings_path, f"bucket={bucket}"))
    else:
        _swap_write_bucketed(new_postings, postings_path, bucket_width)
    doclen_path = os.path.join(index_dir, "doclen")
    new_dl = new_post.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    if not new_dl.head(1):
        # new_text lemmatizes to NOTHING (empty/stopword-only): the doc
        # keeps its dense id with dl=0 — dropping its doclen row would
        # desync stats.n_docs from the dense doc_id space (merge offset
        # collisions) and NULL avgdl on a single-doc index (review r3)
        new_dl = spark.range(1).select(
            F.lit(int(d)).cast("long").alias("doc_id"),
            F.lit(0).cast("long").alias("dl"),
        )
    if _is_bucketed(doclen_path):
        bdir = os.path.join(doclen_path, f"bucket={bucket}")
        doclen_b = spark.read.parquet(bdir)
        _swap_write(
            doclen_b.filter(F.col("doc_id") != d)
            .unionByName(new_dl.select(*doclen_b.columns)),
            bdir,
        )
    else:
        _swap_write_bucketed(
            _read_table(spark, doclen_path)
            .filter(F.col("doc_id") != d)
            .unionByName(new_dl),
            doclen_path,
            bucket_width,
        )
    _swap_write(merged, os.path.join(index_dir, "terms"))
    # Presorted indexes serve docs from the immutable input files —
    # a reindex is the first write, so materialize the docs table into
    # the index dir (copy-on-first-write) with explicit doc_id and drop
    # the by-reference mapping from stats below. A v4 docs table only
    # rewrites the affected bucket's dir.
    docs_path = os.path.join(index_dir, "docs")
    key = F.col("conv_id") == conv_id
    new_text_col = F.when(
        key & (F.col("turn_idx") == turn_idx), new_text
    ).otherwise(F.col("text"))
    docs_materialized = False
    if not disk.docs_source and _is_bucketed(docs_path):
        bdir = os.path.join(docs_path, f"bucket={bucket}")
        _swap_write(
            spark.read.parquet(bdir).withColumn("text", new_text_col), bdir
        )
    else:
        # _base_docs resolves by-reference/spilled-_mid layouts to
        # explicit doc_ids; materialize bucketed (copy-on-first-write)
        _swap_write_bucketed(
            disk._base_docs.withColumn("text", new_text_col),
            docs_path,
            bucket_width,
        )
        docs_materialized = True
    old_post.unpersist()
    new_post.unpersist()

    # exact stats refresh (doclen is the small per-doc dimension)
    dstats = spark.read.parquet(doclen_path).agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    stats = load_stats(index_dir) or {}
    stats["n_docs"] = int(dstats["n"])
    stats["avgdl"] = (
        0.0 if dstats["avgdl"] is None else float(dstats["avgdl"])
    )
    if docs_materialized:
        # docs were materialized locally with explicit ids above
        stats["docs_source"] = None
        stats["docid_adjust"] = {}
    # tmp+replace, NEVER truncate in place: stats.json's inode is shared
    # with the pre-mutation snapshot's hardlink (create_snapshot above)
    stats_path = os.path.join(index_dir, "stats.json")
    with open(stats_path + ".tmp", "w") as fh:
        json.dump(stats, fh)
    os.replace(stats_path + ".tmp", stats_path)

    # re-encode ONLY the affected bucket from the updated tables (on a
    # v4 layout the encode input is the bucket's own partition dir — a
    # partition-pruned read, not a full-scan + filter)
    disk2 = DiskIndex(spark, index_dir)
    ix = disk2.as_inverted_index()
    lo, hi = bucket * bucket_width, (bucket + 1) * bucket_width
    ix_b = InvertedIndex(
        docs=ix.docs,
        postings=(
            spark.read.parquet(os.path.join(postings_path, f"bucket={bucket}"))
            if _is_bucketed(postings_path)
            else ix.postings.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
        ),
        doclen=ix.doclen,
        terms=ix.terms,
        stats=disk2.stats,
    )
    seg_b = build_segments(ix_b, bucket_width).sortWithinPartitions(
        "term_key", "block_id"
    )
    _swap_write(
        seg_b.drop("bucket"),
        os.path.join(index_dir, "segments", f"bucket={bucket}"),
    )
    n_blocks = spark.read.parquet(
        os.path.join(index_dir, "segments", f"bucket={bucket}")
    ).count()
    _write_manifest(
        index_dir, bucket,
        {"bucket": bucket, "blocks": int(n_blocks), "reindexed": [conv_id, turn_idx],
         "bucket_width": bucket_width},
    )
    if had_fields:
        # bucket-bounded field-index maintenance from the UPDATED docs
        # bucket; any failure (or a pre-spec-record index) falls back
        # to invalidation — stale is never served
        try:
            if not refresh_field_bucket(spark, index_dir, bucket,
                                        bucket_width):
                invalidate_fields(index_dir)
        except Exception:
            invalidate_fields(index_dir)
            raise
    return {"doc_id": d, "bucket": bucket, "blocks": int(n_blocks)}


def materialize_docs(
    spark: SparkSession, index_dir: str, bucket_width: int = DOC_BUCKET_WIDTH
) -> bool:
    """Resolve an indirected docs layout (by-reference ``docs_source``
    or spilled ``_mid`` + ``docid_adjust``) to an explicit
    bucket-partitioned table with real doc_ids — the copy-on-first-write
    step compact_index/delete_scope already perform before mutating.
    Returns True if a rewrite happened (one O(docs) narrow job), False
    if the layout was already materialized."""
    stats = load_stats(index_dir) or {}
    disk = DiskIndex(spark, index_dir)
    docs_path = os.path.join(index_dir, "docs")
    explicit = (
        not disk.docs_source
        and not disk.docid_adjust
        and os.path.isdir(docs_path)
        and "doc_id" in spark.read.parquet(docs_path).columns
        and _is_bucketed(docs_path)
    )
    if explicit:
        return False
    _swap_write_bucketed(disk._base_docs, docs_path, bucket_width)
    stats["docs_source"] = None
    stats["docid_adjust"] = {}
    stats_path = os.path.join(index_dir, "stats.json")
    with open(stats_path + ".tmp", "w") as fh:
        json.dump(stats, fh)
    os.replace(stats_path + ".tmp", stats_path)
    return True


@_single_writer("merge_indexes", "dst_dir")
def merge_indexes(
    spark: SparkSession,
    dst_dir: str,
    src_dir: str,
    snapshot: bool = True,
) -> dict:
    """Fold a complete index built over a DISJOINT corpus shard into
    ``dst_dir`` — the Lucene segment-merge analog for PARALLEL SHARD
    BUILDS: at 100 TB you run N independent build jobs (each one
    shuffle over its shard) and merge, instead of one global build.
    Merge cost is O(src) narrow work + a dictionary-sized aggregate;
    dst's existing bucket dirs and segments are NEVER read or
    rewritten.

    Mechanics: src doc ids are shifted by a BUCKET-ALIGNED offset
    (ceil(n_dst/width)·width), so src bucket b lands as dst bucket
    b+offset/width — postings/doclen/docs move in as brand-new
    partition dirs (tmp + rename, no existing dir touched), the
    dictionary merges by lemma (dst term_ids stable, src-only lemmas
    get fresh ids above dst's max), stats sum (avgdl
    doc-count-weighted), and only the NEW buckets' segments are
    encoded (the same tail re-encode compact_index uses). The merged
    index must equal a from-scratch build of the concatenated corpus
    up to doc-id naming — pinned by test via natural-key comparison.

    Both indexes must be complete, stream-delta free, and share
    bucket_width/format. Indirected docs layouts are handled: dst's is
    materialized in place first (:func:`materialize_docs`, the same
    copy-on-first-write every other mutation performs), src's is read
    resolved without mutating src. ``snapshot=True`` freezes
    dst's pre-merge state (a crash mid-merge is recovered by restoring
    that version; fsck detects the partial state)."""
    import shutil

    if os.path.realpath(dst_dir) == os.path.realpath(src_dir):
        raise ValueError("merge_indexes: dst and src are the same index")
    sides = {}
    for name, d in (("dst", dst_dir), ("src", src_dir)):
        s = load_stats(d)
        if not s or not s.get("complete"):
            raise ValueError(f"merge_indexes: {name} index incomplete ({d})")
        for delta in ("postings_stream", "doclen_stream", "docs_stream",
                      "terms_delta"):
            if os.path.isdir(os.path.join(d, delta)):
                raise ValueError(
                    f"merge_indexes: {name} has undrained stream deltas "
                    f"({delta}) — run compact_index first"
                )
        mdir = _manifest_dir(d)
        ms = sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []
        if not ms:
            raise ValueError(f"merge_indexes: {name} has no manifests")
        with open(os.path.join(mdir, ms[0])) as fh:
            width = json.load(fh).get("bucket_width", DOC_BUCKET_WIDTH)
        sides[name] = (s, int(width))
    (dst_stats, w_dst), (src_stats, w_src) = sides["dst"], sides["src"]
    if w_dst != w_src:
        raise ValueError(
            f"merge_indexes: bucket_width mismatch dst={w_dst} src={w_src}"
        )
    if int(dst_stats.get("format", 1)) != int(src_stats.get("format", 1)):
        raise ValueError("merge_indexes: index format mismatch")
    width = w_dst
    n_dst, n_src = int(dst_stats["n_docs"]), int(src_stats["n_docs"])
    b_off = (n_dst + width - 1) // width
    offset = b_off * width

    if snapshot:
        create_snapshot(dst_dir, note=f"pre-merge of {src_dir}")
    # merged-in docs make the derived positional table stale
    invalidate_derived(dst_dir)
    # dst docs must hold explicit bucketed ids before new bucket dirs
    # land beside them (an indirected _mid / by-reference layout would
    # mix schemas); src is never mutated — its docs are read resolved
    materialize_docs(spark, dst_dir, width)
    dst_stats = load_stats(dst_dir)  # materialize may rewrite markers

    # 1. move the shifted per-doc tables in as NEW bucket dirs
    new_buckets: list[int] = []
    for table, sort_cols in (
        ("postings", ["bucket", "lemma", "doc_id"]),
        ("doclen", ["doc_id"]),
        ("docs", ["doc_id"]),
    ):
        if table == "docs":
            # resolves every src layout (local, by-reference docs_source,
            # spilled _mid) to explicit doc_ids without touching src
            raw = DiskIndex(spark, src_dir)._base_docs.withColumn(
                "bucket", _bucket_col(width)
            )
        else:
            raw = spark.read.parquet(os.path.join(src_dir, table))
        if "bucket" not in raw.columns or not _is_bucketed(
            os.path.join(dst_dir, table)
        ):
            raise ValueError(
                f"merge_indexes: {table} is not v4 bucket-partitioned on "
                "both sides — rebuild or compact to the current layout"
            )
        shifted = (
            raw
            .withColumn("doc_id", F.col("doc_id") + F.lit(offset))
            .withColumn("bucket", (F.col("bucket") + F.lit(b_off)).cast("int"))
        )
        if table == "postings":  # keep the lemma-file-clustering invariant
            shifted = shifted.repartitionByRange(*[F.col(c) for c in sort_cols])
        else:
            shifted = shifted.repartition("bucket")
        shifted = shifted.sortWithinPartitions(*sort_cols)
        tmp = _swap_sibling(os.path.join(dst_dir, table), "merge_tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        shifted.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
        for d in sorted(os.listdir(tmp)):
            if d.startswith("bucket="):
                os.replace(os.path.join(tmp, d),
                           os.path.join(dst_dir, table, d))
                if table == "postings":
                    new_buckets.append(int(d.split("=")[1]))
        shutil.rmtree(tmp, ignore_errors=True)

    # 2. dictionary merge by lemma — dst ids stable, new lemmas above max
    from pyspark.sql import Window

    dst_terms = spark.read.parquet(os.path.join(dst_dir, "terms"))
    src_terms = spark.read.parquet(os.path.join(src_dir, "terms"))
    counts = (
        dst_terms.select("lemma", "df", "cf")
        .unionByName(src_terms.select("lemma", "df", "cf"))
        .groupBy("lemma")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
    )
    max_id = dst_terms.agg(F.max("term_id")).collect()[0][0] or 0
    with_ids = counts.join(dst_terms.select("lemma", "term_id"), "lemma", "left")
    fresh = with_ids.filter(F.col("term_id").isNull()).withColumn(
        "term_id",
        F.row_number().over(Window.orderBy("lemma")) + F.lit(int(max_id)),
    )
    merged_terms_df = (
        with_ids.filter(F.col("term_id").isNotNull())
        .unionByName(fresh)
        .select("term_id", "lemma", "df", "cf")
    )
    _swap_write(merged_terms_df, os.path.join(dst_dir, "terms"))

    # 3. stats: counts sum, avgdl doc-weighted
    a_dst, a_src = float(dst_stats["avgdl"]), float(src_stats["avgdl"])
    dst_stats["n_docs"] = n_dst + n_src
    dst_stats["avgdl"] = (n_dst * a_dst + n_src * a_src) / (n_dst + n_src)
    dst_stats["input"] = f"{dst_stats.get('input', '')}+merge:{src_stats.get('input', src_dir)}"
    stats_path = os.path.join(dst_dir, "stats.json")
    with open(stats_path + ".tmp", "w") as fh:
        json.dump(dst_stats, fh)
    os.replace(stats_path + ".tmp", stats_path)

    # 4. encode segments for the NEW buckets only (tail re-encode —
    # same path compact_index takes; writes their manifests)
    disk = DiskIndex(spark, dst_dir)
    ix = disk.as_inverted_index()
    ix.backing_dir = dst_dir
    ix.postings = ix.postings.filter(F.col("doc_id") >= offset)
    seg_metrics = _write_segment_buckets(
        ix, dst_dir, new_buckets, width,
        input_desc=f"merge:{src_dir}",
    )
    return {
        "merged_from": src_dir,
        "doc_id_offset": offset,
        "new_buckets": len(new_buckets),
        "n_docs": dst_stats["n_docs"],
        **seg_metrics,
    }


class DiskIndex:
    """Handle on a persisted index (serving side).

    ``as_of`` time-travels: pass a snapshot version from
    :func:`list_snapshots` and every table/stat resolves against that
    frozen hardlink tree — queries over a pre-mutation state run
    unchanged (the Iceberg snapshot-read analog). The live index is
    ``as_of=None``."""

    def __init__(
        self, spark: SparkSession, index_dir: str, as_of: int | None = None
    ):
        self.spark = spark
        self.as_of = as_of
        if as_of is not None:
            index_dir = snapshot_path(index_dir, as_of)
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "stats.json")) as fh:
            s = json.load(fh)
        fmt = int(s.get("format", 1))
        if fmt > INDEX_FORMAT_VERSION:
            raise ValueError(
                f"index at {index_dir} has format v{fmt}, newer than this "
                f"engine's v{INDEX_FORMAT_VERSION} — upgrade the library"
            )
        self.format = fmt
        self.stats = CorpusStats(n_docs=int(s["n_docs"]), avgdl=float(s["avgdl"]))
        self.docid_adjust = {
            int(k): int(v) for k, v in (s.get("docid_adjust") or {}).items()
        }
        self.docs_source = s.get("docs_source") or None

    @property
    def docs(self) -> DataFrame:
        base = self._base_docs
        stream_path = os.path.join(self.index_dir, "docs_stream")
        if os.path.isdir(stream_path):
            # streamed turns not yet folded back by compact_index
            base = base.unionByName(
                self.spark.read.parquet(stream_path), allowMissingColumns=True
            )
        return base

    @property
    def positional(self) -> DataFrame | None:
        """The persisted positional postings (doc_id, lemma,
        positions), or None when the index was built without
        ``--positional`` / the table was invalidated by a mutation —
        callers fall back to computing positions from the docs table
        (operators/positional.build_positional_postings)."""
        p = os.path.join(self.index_dir, POSITIONAL_DIR)
        if not os.path.isdir(p):
            return None
        return _read_table(self.spark, p)

    @property
    def fields(self) -> DataFrame | None:
        """Persisted per-field BM25F postings (doc_id, field, lemma,
        tf), or None when the index was built without ``--fields`` /
        the table was invalidated by a mutation — callers fall back to
        the corpus-scan bm25f_topk."""
        p = os.path.join(self.index_dir, FIELDS_DIR)
        if not os.path.isdir(p):
            return None
        return _read_table(self.spark, p)

    @property
    def fieldlen(self) -> DataFrame | None:
        """Persisted per-(doc, field) lengths for BM25F, or None."""
        p = os.path.join(self.index_dir, FIELDLEN_DIR)
        if not os.path.isdir(p):
            return None
        return _read_table(self.spark, p)

    @property
    def field_stats(self) -> dict:
        """Exact integer field statistics written by write_field_index
        ({field: {total_len, n_docs}}; meta keys stripped)."""
        return _load_field_stats(self.index_dir)

    @property
    def _base_docs(self) -> DataFrame:
        if self.docs_source:
            # presorted build: the input files ARE the docs table
            # (never copied); ids re-derived from the persisted offsets
            from search_engine_spark.operators.docids import (
                derive_ids_from_offsets,
            )

            return derive_ids_from_offsets(
                self.spark,
                self.docs_source["dir"],
                {k: int(v) for k, v in self.docs_source["file_offsets"].items()},
            )
        docs = _read_table(self.spark, os.path.join(self.index_dir, "docs"))
        if "doc_id" not in docs.columns:
            from search_engine_spark.operators.docids import with_derived_doc_id

            docs = with_derived_doc_id(docs, self.docid_adjust)
        return docs

    @property
    def terms(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.index_dir, "terms"))

    def nrt_terms(self) -> DataFrame:
        """Near-real-time dictionary view: the base terms table with the
        per-epoch df/cf deltas the streaming refresher appended
        (terms_delta/) folded in — so a lemma first seen in a streamed
        turn is retrievable BEFORE compact_index runs, and idf for
        existing lemmas counts the streamed docs (the Lucene
        in-memory-segment dictionary analog; the reference's serving
        side always sees the live word table, Parser.java one-row
        upserts). Streamed-only lemmas carry a NULL term_id until
        compaction assigns a dense one — no query path consumes
        term_id, it exists for admin joins. Without terms_delta/ this
        IS the base table (no extra scan, no plan change)."""
        delta_path = os.path.join(self.index_dir, "terms_delta")
        if not os.path.isdir(delta_path):
            return self.terms
        delta = (
            self.spark.read.parquet(delta_path)
            .groupBy("lemma")
            .agg(F.sum("df").alias("_df_d"), F.sum("cf").alias("_cf_d"))
        )
        base = self.terms
        return base.join(delta, "lemma", "full_outer").select(
            "term_id",
            "lemma",
            (
                F.coalesce(F.col("df"), F.lit(0))
                + F.coalesce(F.col("_df_d"), F.lit(0))
            ).cast("long").alias("df"),
            (
                F.coalesce(F.col("cf"), F.lit(0))
                + F.coalesce(F.col("_cf_d"), F.lit(0))
            ).cast("long").alias("cf"),
        )

    def nrt_stats(self) -> CorpusStats:
        """Corpus stats with the uncompacted streamed docs folded in:
        n_docs counts them, avgdl is recomputed from the EXACT base
        doclen sum — dl is integral and the corpus sum is far below
        2^53, so ``round(n_docs * avgdl)`` recovers the integer sum the
        persisted average was derived from, and the folded avgdl is
        bit-identical to a full recount over base ∪ stream (which is
        what the DuckDB oracle computes; the 6-decimal score round
        never sees a difference). Scan-free on the base: only the
        (small) stream doclen is aggregated. Cached per handle; a
        refresh that lands after construction needs a new DiskIndex.
        A re-streamed (conv_id, turn_idx) that already exists in the
        base is counted twice here, exactly as its postings are served
        twice pre-compaction — compact_index dedups both."""
        if getattr(self, "_nrt_stats", None) is not None:
            return self._nrt_stats
        dls = os.path.join(self.index_dir, "doclen_stream")
        if not os.path.isdir(dls):
            self._nrt_stats = self.stats
            return self._nrt_stats
        row = (
            self.spark.read.parquet(dls)
            .agg(F.count("*").alias("n"), F.sum("dl").alias("s"))
            .collect()[0]
        )
        n_s, dl_s = int(row["n"]), int(row["s"] or 0)
        if n_s == 0:
            self._nrt_stats = self.stats
            return self._nrt_stats
        n = self.stats.n_docs + n_s
        base_dl_sum = round(self.stats.n_docs * self.stats.avgdl)
        avgdl = (base_dl_sum + dl_s) / n
        self._nrt_stats = CorpusStats(n_docs=n, avgdl=avgdl)
        return self._nrt_stats

    @property
    def segments(self) -> DataFrame:
        if self.format < MIN_SEGMENT_FORMAT:
            raise ValueError(
                f"index at {self.index_dir} stores format-v{self.format} "
                "segments (untagged payload buffers); rebuild them — "
                "rebuild_segments(spark, index_dir) — or query via the "
                "DataFrame engine (as_inverted_index)"
            )
        return self.spark.read.parquet(os.path.join(self.index_dir, "segments"))

    def as_inverted_index(self, nrt: bool = False) -> InvertedIndex:
        """DataFrame-engine view of the index. Streamed posting/doclen
        rows are always unioned in (they're real docs); ``nrt=True``
        additionally serves the delta-merged dictionary and
        stream-adjusted stats so retrieval over uncompacted streamed
        docs is COMPLETE and correctly weighted — a streamed-only lemma
        resolves, idf/avgdl count the streamed docs, and ranks equal the
        post-compaction index (pinned in tests/test_nrt.py). Serving
        paths (jobs/search.py, serving.nrt_wand_topk) pass nrt=True;
        the default stays base-stats because the mutation internals
        (segment re-encode, dictionary compaction) derive bucket counts
        from stats.n_docs and must see only the DENSE id space."""
        postings = _read_table(self.spark, os.path.join(self.index_dir, "postings"))
        doclen = _read_table(self.spark, os.path.join(self.index_dir, "doclen"))
        # streamed (not-yet-compacted) delta rows live in sibling dirs
        # (v4 — appending loose files into a bucket-partitioned dir
        # would corrupt partition discovery); serve them unioned in
        ps = os.path.join(self.index_dir, "postings_stream")
        if os.path.isdir(ps):
            postings = postings.unionByName(self.spark.read.parquet(ps))
        dls = os.path.join(self.index_dir, "doclen_stream")
        if os.path.isdir(dls):
            doclen = doclen.unionByName(self.spark.read.parquet(dls))
        if "dl" not in postings.columns:
            # format-v1 dirs (pre-dl postings): fall back to the doclen
            # join so old indexes stay queryable (ADVICE r1)
            postings = postings.join(doclen, "doc_id")
        return InvertedIndex(
            docs=self.docs,
            postings=postings,
            doclen=doclen,
            terms=self.nrt_terms() if nrt else self.terms,
            stats=self.nrt_stats() if nrt else self.stats,
        )
