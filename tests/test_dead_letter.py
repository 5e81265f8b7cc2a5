"""Dead-letter registry (ST5, reference keep_link ERROR_LINK):
contract-violating rows are diverted with reasons, logged per run, and
re-draggable (sources/dead_letter.py)."""

from __future__ import annotations

import datetime

from search_engine_spark.sources.dead_letter import (
    REASON_OK,
    read_dead_letters,
    retry_candidates,
    split_valid,
    write_dead_letters,
)

TS = datetime.datetime(2026, 1, 1)


def _mixed(spark):
    rows = [
        ("c1", 0, "user", "hello world", None, TS),
        ("c1", 1, "assistant", "", None, TS),           # empty
        ("c2", None, "user", "fine text", None, TS),    # null key
        ("c2", 1, "user", None, None, TS),              # null text
        ("c3", 0, "user", "x" * 2000, None, TS),        # oversized (cap 1000)
        ("c3", 1, "tool", "   ", "grep", TS),           # whitespace-only
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def test_split_valid_reasons(spark):
    valid, dead = split_valid(_mixed(spark), max_text_chars=1000)
    assert [(r["conv_id"], r["turn_idx"]) for r in valid.collect()] == [("c1", 0)]
    reasons = {
        (r["conv_id"], r["turn_idx"]): r["reason"] for r in dead.collect()
    }
    assert reasons == {
        ("c1", 1): "empty_text",
        ("c2", None): "null_key",
        ("c2", 1): "null_text",
        ("c3", 0): "oversized_text",
        ("c3", 1): "empty_text",
    }
    assert REASON_OK not in reasons.values()


def test_registry_append_and_retry(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _, dead = split_valid(_mixed(spark), max_text_chars=1000)
    write_dead_letters(dead, idx, run_id="run_a")
    write_dead_letters(dead.limit(2), idx, run_id="run_b")  # second run appends
    reg = read_dead_letters(spark, idx)
    assert reg.count() == dead.count() + 2
    assert set(r["run_id"] for r in reg.select("run_id").distinct().collect()) == {
        "run_a", "run_b"
    }
    # re-drag: one row per key, registry columns stripped
    retry = retry_candidates(spark, idx)
    assert retry.count() == dead.count()  # deduped by (conv_id, turn_idx)
    assert "reason" not in retry.columns and "run_id" not in retry.columns


def test_null_byte_scrub(spark):
    """P11: 0x00 bytes are scrubbed from valid rows' text (reference
    DBWriter.java retry scrub)."""
    df = spark.createDataFrame(
        [("c1", 0, "user", "he\x00llo\x00", None, TS)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    valid, dead = split_valid(df)
    assert dead.count() == 0
    assert valid.collect()[0]["text"] == "hello"
