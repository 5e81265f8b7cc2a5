"""On-disk index layout + per-partition lineage manifests + resume.

Reference analog: the crawl checkpoints its frontier into ``keep_link``
on stop and re-seeds from it on restart (reference Parser.java:303-322,
150-169; KeepLinkRepository.java:24-25). Our unit of recovery is the
doc-range BUCKET: segment encoding is deterministic per bucket, each
completed bucket writes a manifest (rows, term range, checksum, input
lineage), and a resumed build processes only buckets without manifests —
idempotent, never double-counts (SURVEY.md §7 hard-part (d)).

Layout under <index_dir>/:
    docs/        parquet   doc store (doc_id, conv_id, turn_idx, role, text, tool, ts)
    postings/    parquet   (doc_id, lemma, tf, rank)         [DataFrame scorer]
    doclen/      parquet   (doc_id, dl)
    terms/       parquet   (term_id, lemma, df, cf)
    segments/    parquet   bucket=<n>/ partitions, rows sorted by term_id
    stats.json             {n_docs, avgdl}
    manifests/bucket=<n>.json   lineage per completed bucket
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
# column; the query engines no longer join doclen). Loads of older dirs
# fail with a clear message instead of an AnalysisException at query time.
INDEX_FORMAT_VERSION = 2


def _manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "manifests")


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
    if not resume or not os.path.exists(stats_path):
        if not spilled_here:
            index.docs.write.mode("overwrite").parquet(docs_path)
            index.postings.write.mode("overwrite").parquet(os.path.join(index_dir, "postings"))
        index.doclen.write.mode("overwrite").parquet(os.path.join(index_dir, "doclen"))
        index.terms.write.mode("overwrite").parquet(os.path.join(index_dir, "terms"))
        with open(stats_path, "w") as fh:
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
                },
                fh,
            )

    all_buckets = set(range((index.stats.n_docs + bucket_width - 1) // bucket_width or 1))
    done = completed_buckets(index_dir) if resume else set()
    todo = sorted(all_buckets - done)
    metrics["buckets_total"] = len(all_buckets)
    metrics["buckets_skipped_resume"] = len(all_buckets) - len(todo)

    if todo:
        seg = build_segments(index, bucket_width).filter(F.col("bucket").isin([int(b) for b in todo]))
        # one output dir per bucket → per-bucket atomicity; rows sorted by
        # term_id so parquet rowgroup min/max prune query-term scans
        seg = seg.repartition("bucket").sortWithinPartitions("term_id", "block_id").persist()
        stats_rows = (
            seg.groupBy("bucket").agg(
                F.count("*").alias("blocks"),
                F.sum("doc_count").alias("postings"),
                F.min("term_id").alias("term_min"),
                F.max("term_id").alias("term_max"),
                # bit_xor: order-insensitive, overflow-free under ANSI mode
                F.expr("bit_xor(xxhash64(term_id, block_id, doc_ids, scores))").alias("checksum"),
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
                    "term_id_min": int(r["term_min"]) if r else None,
                    "term_id_max": int(r["term_max"]) if r else None,
                    "checksum": int(r["checksum"]) if r else 0,
                    "input_splits": [input_desc],
                    "bucket_width": bucket_width,
                },
            )
    # all buckets committed → flip the completeness marker (consulted by
    # jobs/build_index.py's resume gate so a re-run never clobbers a
    # finished index, ADVICE r1)
    stats = load_stats(index_dir) or {}
    stats["complete"] = True
    tmp = stats_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(stats, fh)
    os.replace(tmp, stats_path)
    metrics["buckets_built"] = len(todo)
    metrics["elapsed_sec"] = time.monotonic() - t0
    return metrics


class DiskIndex:
    """Handle on a persisted index (serving side)."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
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

    @property
    def docs(self) -> DataFrame:
        docs = self.spark.read.parquet(os.path.join(self.index_dir, "docs"))
        if "doc_id" not in docs.columns:
            from search_engine_spark.operators.docids import with_derived_doc_id

            docs = with_derived_doc_id(docs, self.docid_adjust)
        return docs

    @property
    def terms(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.index_dir, "terms"))

    @property
    def segments(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.index_dir, "segments"))

    def as_inverted_index(self) -> InvertedIndex:
        postings = self.spark.read.parquet(os.path.join(self.index_dir, "postings"))
        doclen = self.spark.read.parquet(os.path.join(self.index_dir, "doclen"))
        if "dl" not in postings.columns:
            # format-v1 dirs (pre-dl postings): fall back to the doclen
            # join so old indexes stay queryable (ADVICE r1)
            postings = postings.join(doclen, "doc_id")
        return InvertedIndex(
            docs=self.docs,
            postings=postings,
            doclen=doclen,
            terms=self.terms,
            stats=self.stats,
        )
