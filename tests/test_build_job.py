"""jobs/build_index.py CLI: resume gate semantics (ADVICE r1) driven
through the real entry point in subprocesses."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str) -> subprocess.CompletedProcess:
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "build_index.py"),
         "--local-cpus", "4", *args],
        capture_output=True, text=True, cwd=REPO, timeout=300, env=env,
    )


def test_build_rerun_and_input_mismatch(tmp_path):
    out = str(tmp_path / "idx")
    r1 = _run("--n-synthetic-convs", "40", "--output", out,
              "--bucket-width", "1024")
    assert r1.returncode == 0, r1.stderr[-2000:]
    m1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert m1["buckets_built"] > 0 and m1["n_dead_lettered"] == 0

    # same input, complete index → no-op (nothing rebuilt or clobbered)
    stats_before = open(os.path.join(out, "stats.json")).read()
    r2 = _run("--n-synthetic-convs", "40", "--output", out,
              "--bucket-width", "1024")
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert m2.get("skipped") == "index already complete"
    assert open(os.path.join(out, "stats.json")).read() == stats_before

    # different input into the same output → refuse unless --no-resume
    r3 = _run("--n-synthetic-convs", "60", "--output", out,
              "--bucket-width", "1024")
    assert r3.returncode != 0
    assert "pass --no-resume" in (r3.stderr + r3.stdout)
