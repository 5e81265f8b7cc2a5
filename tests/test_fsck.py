"""Index fsck (jobs/index_stats.py --fsck): structural integrity from
footers/file metadata only — clean on a healthy index, and each
corruption class is detected."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from search_engine_spark.corpus import synthesize_transcripts
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.sources.index_store import create_snapshot, write_index


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fsck") / "index")
    write_index(build_index(synthesize_transcripts(spark, 40),
                            use_arrow_udf=False),
                d, input_desc="convs<40", bucket_width=256)
    return d


def _fsck(d):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "index_stats",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "jobs", "index_stats.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._fsck(d)


def test_healthy_index_is_clean(idx):
    assert _fsck(idx) == []


def test_corruptions_detected(idx, tmp_path):
    d = str(tmp_path / "broken")
    shutil.copytree(idx, d)

    # 1. segments dir without a manifest (crash before manifest write)
    m = sorted(os.listdir(os.path.join(d, "manifests")))[0]
    os.remove(os.path.join(d, "manifests", m))
    probs = _fsck(d)
    assert any("no manifest" in p for p in probs)
    shutil.copy(os.path.join(idx, "manifests", m),
                os.path.join(d, "manifests", m))

    # 2. manifest block count vs footer rows (truncated segment files)
    b = m[len("bucket="):-len(".json")]
    seg = os.path.join(d, "segments", f"bucket={b}")
    victim = [f for f in os.listdir(seg) if f.endswith(".parquet")][0]
    os.remove(os.path.join(seg, victim))
    probs = _fsck(d)
    assert any("block rows on disk" in p for p in probs)
    shutil.copy(os.path.join(idx, "segments", f"bucket={b}", victim),
                os.path.join(seg, victim))
    assert _fsck(d) == []

    # 3. partial swap: one table missing a bucket the others have
    post_b = sorted(
        x for x in os.listdir(os.path.join(d, "postings"))
        if x.startswith("bucket=")
    )[0]
    shutil.rmtree(os.path.join(d, "postings", post_b))
    probs = _fsck(d)
    assert any("bucket sets disagree" in p for p in probs)
    shutil.copytree(os.path.join(idx, "postings", post_b),
                    os.path.join(d, "postings", post_b))
    assert _fsck(d) == []

    # 4. visible swap residue
    os.makedirs(os.path.join(d, "postings", "bucket=0.old"), exist_ok=True)
    probs = _fsck(d)
    assert any("swap residue" in p for p in probs)
    shutil.rmtree(os.path.join(d, "postings", "bucket=0.old"))

    # 5b. crash mid-merge: ALL per-doc tables carry a new bucket that
    # has no segment manifest — tables agree with each other, so only
    # the doc-vs-manifest check can catch it
    for t in ("postings", "doclen", "docs"):
        src_b = sorted(x for x in os.listdir(os.path.join(d, t))
                       if x.startswith("bucket="))[0]
        shutil.copytree(os.path.join(d, t, src_b),
                        os.path.join(d, t, "bucket=99"))
    probs = _fsck(d)
    assert any("no segment manifest" in p for p in probs)
    for t in ("postings", "doclen", "docs"):
        shutil.rmtree(os.path.join(d, t, "bucket=99"))
    assert _fsck(d) == []

    # 5. snapshot log pointing at a vanished dir
    v = create_snapshot(d, note="fsck test")
    shutil.rmtree(os.path.join(d, "_snapshots", f"v{v}"))
    probs = _fsck(d)
    assert any(f"v{v}" in p and "gone" in p for p in probs)


def test_fsck_cli(idx):
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "index_stats.py"),
         "--index", idx, "--fsck"],
        capture_output=True, text=True, cwd=repo, timeout=120,
        env=dict(os.environ, PYTHONPATH=repo),
    )
    assert r.returncode == 0, r.stderr[-1000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["fsck"] == "clean"
