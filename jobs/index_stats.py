"""spark-submit entry point: index inspection report — the admin's view
of a written index (the reference UI's statistics page shows per-site
doc/lemma/posting counts, SiteRepository.java:43-54; this adds the
storage-level facts an operator needs before reindexing or capacity
planning: per-bucket balance, segment bytes by codec, compression
ratio, streamed-delta backlog).

Usage:
    python jobs/index_stats.py --index <index_dir> [--local-cpus N]

Prints ONE JSON line; everything except the dictionary size comes from
manifests and file metadata (no table scans), so the report is O(files)
— safe against a 100 TB index.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _ann_report(index_dir: str) -> dict:
    """ANN-index flavor of the report: per-partition row counts straight
    from parquet FOOTERS (pyarrow metadata — zero data pages read), so
    balance/skew over a 100 TB vector index costs one footer per file.
    Skew is the capacity-planning number: IVF clusters drift as appends
    accumulate, and max/mean ≫ 1 means the hot cluster bounds probe
    latency — time to re-fit centroids (a rebuild, priced O(index))."""
    import pyarrow.parquet as pq

    with open(os.path.join(index_dir, "_ann_meta.json")) as fh:
        meta = json.load(fh)
    parts: dict[str, int] = {}
    for root, dirs, files in os.walk(index_dir):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        rel = os.path.relpath(root, index_dir)
        if "=" not in os.path.basename(root):
            continue
        n = 0
        has = False
        for f in files:
            if not f.endswith(".parquet"):
                continue
            has = True
            n += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        if has:
            parts[rel] = parts.get(rel, 0) + n
    report: dict = {"ann_meta": meta, "n_partitions": len(parts)}
    if parts:
        rows = list(parts.values())
        total = sum(rows)
        mean = total / len(rows)
        report.update({
            # IVF and IVF-PQ hold each vector exactly once (one row per
            # id); SRP holds it n_tables times, so entries ≠ vectors
            "n_vectors": total if meta.get("method") in ("ivf", "pq")
            else None,
            "n_entries": total,
            "partition_rows_min": min(rows),
            "partition_rows_max": max(rows),
            "partition_skew": round(max(rows) / mean, 3) if mean else None,
            "hottest_partition": max(parts, key=parts.get),
        })
    report["index_bytes"] = _du(index_dir)

    from search_engine_spark.sources.index_store import list_snapshots

    report["snapshots"] = [
        {"version": s["version"], "note": s["note"]}
        for s in list_snapshots(index_dir)
    ]
    return report


def _fsck(index_dir: str) -> list[str]:
    """Structural integrity check, footers + file metadata only (no
    data pages): manifest↔segment-bucket bijection, manifest block
    counts vs parquet footer row counts, bucket-set agreement across
    the per-doc tables, interrupted-swap residue, snapshot-log vs
    snapshot-dir agreement. Returns a list of problems (empty = clean).
    The check an operator runs after a crash mid-mutation, before
    trusting resume/replay did its job."""
    import pyarrow.parquet as pq

    problems: list[str] = []
    mdir = os.path.join(index_dir, "manifests")
    manifest_buckets = set()
    manifest_blocks: dict[int, int] = {}
    if os.path.isdir(mdir):
        for f in os.listdir(mdir):
            if f.startswith("bucket=") and f.endswith(".json"):
                b = int(f[len("bucket="):-len(".json")])
                manifest_buckets.add(b)
                with open(os.path.join(mdir, f)) as fh:
                    manifest_blocks[b] = json.load(fh).get("blocks", 0)
    seg_root = os.path.join(index_dir, "segments")
    seg_buckets = set()
    if os.path.isdir(seg_root):
        for d in os.listdir(seg_root):
            if d.startswith("bucket="):
                seg_buckets.add(int(d.split("=")[1]))
    for b in sorted(manifest_buckets - seg_buckets):
        problems.append(f"manifest bucket={b} has no segments dir")
    for b in sorted(seg_buckets - manifest_buckets):
        problems.append(f"segments bucket={b} has no manifest (resume "
                        "will re-encode it)")
    for b in sorted(manifest_buckets & seg_buckets):
        rows = 0
        d = os.path.join(seg_root, f"bucket={b}")
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                rows += pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
        if rows != manifest_blocks[b]:
            problems.append(
                f"segments bucket={b}: {rows} block rows on disk vs "
                f"{manifest_blocks[b]} in manifest"
            )
    # the per-doc tables must agree on the bucket universe (a partial
    # swap leaves one table missing a bucket the others have)
    table_buckets: dict[str, set] = {}
    for table in ("postings", "doclen", "docs"):
        root = os.path.join(index_dir, table)
        if os.path.isdir(root):
            bs = {d for d in os.listdir(root)
                  if d.startswith("bucket=") and d.split("=")[1].isdigit()}
            if bs:
                table_buckets[table] = bs
    if len({frozenset(v) for v in table_buckets.values()}) > 1:
        problems.append(
            "bucket sets disagree across tables: "
            + ", ".join(f"{t}={len(v)}" for t, v in sorted(table_buckets.items()))
        )
    # per-doc tables must also agree with the SEGMENT universe: a crash
    # mid-merge (tables moved in, segments not yet encoded) leaves the
    # DF engine serving docs WAND cannot see — rank-identity silently
    # broken unless this is flagged
    if table_buckets and manifest_buckets:
        doc_b = {
            int(x.split("=")[1]) for x in next(iter(table_buckets.values()))
        }
        only_docs = sorted(doc_b - manifest_buckets)
        if only_docs:
            problems.append(
                f"doc-table buckets {only_docs} have no segment manifest "
                "(crash mid-merge/compaction? WAND cannot serve them)"
            )
    # interrupted-swap residue: visible *.old / tmp dirs inside the
    # index would be discovered as bogus partition values
    for root, dirs, _files in os.walk(index_dir):
        if "_snapshots" in root:
            continue
        for d in dirs:
            if d.endswith(".old") or ".tmp" in d:
                if not d.startswith("."):
                    problems.append(
                        f"visible swap residue: {os.path.relpath(os.path.join(root, d), index_dir)}"
                    )
    # snapshot log entries must have backing dirs
    snap_root = os.path.join(index_dir, "_snapshots")
    log_path = os.path.join(snap_root, "log.json")
    if os.path.exists(log_path):
        with open(log_path) as fh:
            for e in json.load(fh):
                if not os.path.isdir(os.path.join(snap_root, f"v{e['version']}")):
                    problems.append(
                        f"snapshot log lists v{e['version']} but the dir is gone"
                    )
    return problems


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--local-cpus", type=int, default=None)
    p.add_argument("--fsck", action="store_true",
                   help="structural integrity check (footers only); "
                        "exit 1 and report problems if any")
    p.add_argument("--diff", default=None, metavar="V_OLD[:V_NEW]",
                   help="doc-level diff between two snapshot versions "
                        "(omit V_NEW to diff against the live index): "
                        "added/removed/text-changed counts + sample ids")
    args = p.parse_args()

    if args.diff is not None:
        from search_engine_spark.session import build_session
        from search_engine_spark.sources.index_store import snapshot_diff

        old_s, _, new_s = args.diff.partition(":")
        try:
            v_old = int(old_s)
            v_new = int(new_s) if new_s else None
        except ValueError:
            print(f"--diff: bad spec {args.diff!r} (want V_OLD[:V_NEW])",
                  file=sys.stderr)
            sys.exit(2)
        spark = build_session("index_stats", cpus=args.local_cpus or 4)
        try:
            print(json.dumps(snapshot_diff(spark, args.index, v_old, v_new)),
                  flush=True)
        finally:
            spark.stop()
        return

    if args.fsck:
        if os.path.exists(os.path.join(args.index, "_ann_meta.json")):
            print("fsck covers fulltext indexes; for ANN dirs use the "
                  "default report", file=sys.stderr)
            sys.exit(2)
        if not os.path.exists(os.path.join(args.index, "stats.json")):
            print(f"no index at {args.index} (stats.json missing)",
                  file=sys.stderr)
            sys.exit(2)
        problems = _fsck(args.index)
        print(json.dumps({"fsck": "clean" if not problems else "problems",
                          "problems": problems}), flush=True)
        sys.exit(1 if problems else 0)

    if os.path.exists(os.path.join(args.index, "_ann_meta.json")):
        print(json.dumps(_ann_report(args.index)), flush=True)
        return

    stats_path = os.path.join(args.index, "stats.json")
    if not os.path.exists(stats_path):
        print(f"no index at {args.index} (stats.json missing)", file=sys.stderr)
        sys.exit(2)
    with open(stats_path) as fh:
        stats = json.load(fh)

    report: dict = {
        "n_docs": stats.get("n_docs"),
        "avgdl": stats.get("avgdl"),
        "format": stats.get("format"),
        "complete": stats.get("complete"),
        "input": stats.get("input"),
    }

    # per-bucket manifests: postings rows, blocks, balance (no scans)
    manifests = sorted(glob.glob(os.path.join(args.index, "manifests", "*.json")))
    buckets = []
    for m in manifests:
        with open(m) as fh:
            buckets.append(json.load(fh))
    if buckets:
        post = [b.get("postings", 0) for b in buckets]
        report["n_buckets"] = len(buckets)
        report["postings_rows"] = sum(post)
        report["blocks"] = sum(b.get("blocks", 0) for b in buckets)
        report["bucket_postings_min"] = min(post)
        report["bucket_postings_max"] = max(post)
        # balance: max/mean — 1.0 is perfectly even; >2 means one bucket
        # dominates the mutation/scan cost
        mean = sum(post) / len(post)
        report["bucket_skew"] = round(max(post) / mean, 3) if mean else None

    # on-disk bytes per table (file metadata only) — including the
    # DERIVED acceleration tables (positional, per-field BM25F), whose
    # presence tells the operator which engines are servable right now
    for table in ("docs", "postings", "doclen", "segments", "terms",
                  "positional", "fields", "fieldlen"):
        d = os.path.join(args.index, table)
        if os.path.isdir(d):
            report[f"{table}_bytes"] = _du(d)
    report["bm25f_servable"] = bool(
        os.path.isdir(os.path.join(args.index, "fields"))
        and os.path.isdir(os.path.join(args.index, "fieldlen"))
    )
    report["positional_servable"] = os.path.isdir(
        os.path.join(args.index, "positional")
    )
    if report.get("segments_bytes") and report.get("postings_bytes"):
        report["segment_to_postings_ratio"] = round(
            report["segments_bytes"] / report["postings_bytes"], 4
        )

    # streamed-delta backlog (compaction pending?)
    deltas = {}
    for d in ("postings_stream", "doclen_stream", "docs_stream", "terms_delta"):
        path = os.path.join(args.index, d)
        if os.path.isdir(path):
            deltas[d] = _du(path)
    report["stream_delta_bytes"] = deltas
    report["compaction_pending"] = bool(deltas)

    # snapshots: versions + the TRUE extra bytes they pin (hardlink
    # trees share data files with the live table — only inodes no
    # longer referenced by it cost storage, so count distinct inodes
    # with link-count == their in-snapshot occurrence count)
    from search_engine_spark.sources.index_store import list_snapshots

    snaps = list_snapshots(args.index)
    report["snapshots"] = [
        {"version": s["version"], "note": s["note"]} for s in snaps
    ]
    snap_root = os.path.join(args.index, "_snapshots")
    if os.path.isdir(snap_root):
        seen: dict = {}
        for root, _dirs, files in os.walk(snap_root):
            for f in files:
                try:
                    st = os.stat(os.path.join(root, f))
                except OSError:
                    continue
                seen.setdefault(st.st_ino, [st.st_size, st.st_nlink, 0])
                seen[st.st_ino][2] += 1
        # an inode whose every link lives under _snapshots is retained
        # ONLY by snapshots: expiring them frees it
        report["snapshot_only_bytes"] = sum(
            sz for sz, nlink, inside in seen.values() if inside >= nlink
        )
        report["snapshot_shared_bytes"] = sum(
            sz for sz, nlink, inside in seen.values() if inside < nlink
        )

    # dictionary size needs one tiny parquet read — the only Spark use;
    # skipped (reported null) when --local-cpus is not given and no
    # session is ambient, keeping the default path scan-free
    report["n_terms"] = None
    if args.local_cpus:
        from search_engine_spark.session import build_session

        spark = build_session("index_stats", cpus=args.local_cpus)
        report["n_terms"] = spark.read.parquet(
            os.path.join(args.index, "terms")
        ).count()
        spark.stop()

    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
