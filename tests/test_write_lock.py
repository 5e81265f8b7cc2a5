"""Single-writer mutation lock (index_store.index_write_lock)."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

from search_engine_spark.sources.index_store import (
    IndexWriteLockError,
    index_write_lock,
)


def test_lock_reentrant_within_process(tmp_path):
    d = str(tmp_path)
    with index_write_lock(d, op="outer", timeout_s=1):
        # composed mutations (delete_where -> compact_index) re-enter
        with index_write_lock(d, op="inner", timeout_s=1):
            pass
        # still held by the outer frame after the inner exit
        # (re-entrancy key is per (path, owning thread))
        import threading

        key = (
            os.path.abspath(os.path.join(d, ".write_lock")),
            threading.get_ident(),
        )
        assert key in index_write_lock._held
    assert not index_write_lock._held


def test_lock_blocks_other_thread(tmp_path):
    """Re-entrancy is per-THREAD: a mutation started from another
    thread of the same process is a genuine second writer and must get
    the fail-fast IndexWriteLockError, not a silent re-entrant pass."""
    import threading

    d = str(tmp_path)
    result: dict = {}

    def attacker():
        try:
            with index_write_lock(d, op="thread2", timeout_s=0.5):
                result["outcome"] = "acquired"
        except IndexWriteLockError as e:
            result["outcome"] = f"blocked: {e}"

    with index_write_lock(d, op="holder", timeout_s=1):
        t = threading.Thread(target=attacker)
        t.start()
        t.join(timeout=30)
    assert result["outcome"].startswith("blocked"), result
    # and after release the other thread acquires cleanly
    t2 = threading.Thread(target=attacker)
    t2.start()
    t2.join(timeout=30)
    assert result["outcome"] == "acquired", result


def test_lock_blocks_other_process(tmp_path):
    """A second PROCESS must fail fast with the holder identity while
    the lock is held, and succeed after release."""
    d = str(tmp_path)
    child = textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {os.getcwd()!r})
        from search_engine_spark.sources.index_store import (
            IndexWriteLockError, index_write_lock)
        try:
            with index_write_lock({d!r}, op="child", timeout_s=0.5):
                print("ACQUIRED")
        except IndexWriteLockError as e:
            print("BLOCKED:", e)
    """)
    with index_write_lock(d, op="holder", timeout_s=1):
        out = subprocess.run(
            [sys.executable, "-c", child], capture_output=True, text=True,
            timeout=60,
        ).stdout
        assert "BLOCKED" in out and "op=holder" in out
    out2 = subprocess.run(
        [sys.executable, "-c", child], capture_output=True, text=True,
        timeout=60,
    ).stdout
    assert "ACQUIRED" in out2


def test_mutations_refuse_concurrent_writer(spark, tiny_transcripts,
                                            tmp_path):
    """A held lock makes a real mutation fail fast instead of racing."""
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.sources.index_store import (
        delete_where,
        write_index,
    )

    idx_dir = str(tmp_path / "idx")
    ix = build_index(tiny_transcripts, use_arrow_udf=False, weighted=True)
    write_index(ix, idx_dir, input_desc="tiny", bucket_width=512)

    # simulate another process's lock: hold a raw flock on the file
    # from a subprocess that stays alive during the mutation attempt
    hold = subprocess.Popen(
        [sys.executable, "-c", (
            "import fcntl, sys, time, os\n"
            f"fh = open(os.path.join({idx_dir!r}, '.write_lock'), 'a+')\n"
            "fcntl.flock(fh, fcntl.LOCK_EX)\n"
            "fh.truncate(0); fh.write('pid=999 op=other'); fh.flush()\n"
            "print('HELD', flush=True)\n"
            "time.sleep(30)\n"
        )],
        stdout=subprocess.PIPE, text=True,
    )
    try:
        assert hold.stdout.readline().strip() == "HELD"
        with pytest.raises(IndexWriteLockError, match="op=other"):
            delete_where(spark, idx_dir, "role = 'tool'", bucket_width=512)
    finally:
        hold.kill()
        hold.wait()
