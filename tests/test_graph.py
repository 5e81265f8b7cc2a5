"""PageRank over derived interaction graphs (operators/graph.py)."""

from __future__ import annotations


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_cycle_is_uniform_and_mass_conserved(spark):
    """A 3-cycle is perfectly symmetric: every node holds exactly 1/3
    at every iteration; total mass stays 1 (dangling-free graph)."""
    from search_engine_spark.operators.graph import pagerank

    rows = pagerank(
        _edges(spark, [(1, 2), (2, 3), (3, 1)]), iters=5
    ).collect()
    assert len(rows) == 3
    for r in rows:
        assert abs(r["rank"] - 1 / 3) < 1e-6
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-5


def test_pagerank_star_center_dominates_and_dangling_redistributes(spark):
    """Star 1..4 -> 0: the center outranks every leaf; node 0 is
    DANGLING (no out-edges) so its mass redistributes uniformly —
    total mass still ~1 and leaves stay equal by symmetry."""
    from search_engine_spark.operators.graph import pagerank

    rows = {r["node"]: r["rank"] for r in pagerank(
        _edges(spark, [(1, 0), (2, 0), (3, 0), (4, 0)]), iters=5
    ).collect()}
    assert rows[0] > max(rows[i] for i in (1, 2, 3, 4))
    assert len({round(rows[i], 9) for i in (1, 2, 3, 4)}) == 1
    assert abs(sum(rows.values()) - 1.0) < 1e-5


def test_event_handoff_edges_day_partitioned(spark):
    """Consecutive-event edges never cross the day boundary, ties
    break on event_id, and self-handoffs are dropped."""
    import datetime as dt

    from search_engine_spark.operators.graph import event_handoff_edges

    d1 = dt.datetime(2024, 1, 1, 23, 59)
    d2 = dt.datetime(2024, 1, 2, 0, 1)
    ev = spark.createDataFrame(
        [
            (0, d1, 10), (1, d1, 11),             # same ts: id order
            (2, dt.datetime(2024, 1, 1, 23, 59, 30), 10),  # self after 11
            (3, d2, 99),                          # next day: no edge from 10
        ],
        "event_id long, ts timestamp, user_id long",
    )
    got = {(r["src"], r["dst"]) for r in event_handoff_edges(ev).collect()}
    assert got == {(10, 11), (11, 10)}


def test_textrank_hub_word_tops(spark):
    """A word adjacent to many distinct words (a hub in the
    co-occurrence graph) outranks words seen only in one context;
    short docs (< 2 lemmas) are ignored, not fatal."""
    from search_engine_spark.operators.graph import textrank_keywords

    docs = spark.createDataFrame(
        [
            (0, "hub alpha hub beta hub gamma hub delta"),
            (1, "hub alpha hub beta hub gamma"),
            (2, "alpha beta"),
            (3, "epsilon"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = textrank_keywords(docs, top_n=10, min_count=2).collect()
    assert rows and rows[0]["lemma"] == "hub"
    assert all(rows[0]["rank"] >= r["rank"] for r in rows)
