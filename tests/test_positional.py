"""Positional phrase/NEAR engine (operators/positional.py): value-
identical to the string-verify engine — including greedy non-overlap
edge cases — and its query plan never touches the text column."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.operators.positional import (
    build_positional_postings,
    near_search_positional,
    phrase_match_docs_positional,
    phrase_search_positional,
)
from search_engine_spark.operators.query import (
    near_search,
    phrase_match_docs,
    phrase_search,
)


def _pairs(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_phrase_positional_equals_string_verify(spark, tiny_index, tiny_transcripts):
    pos = build_positional_postings(tiny_index.docs).cache()
    for phrase in ("w00000 w00001", "w00001 w00000", "w00000s w00003ing"):
        a = _pairs(phrase_match_docs(tiny_index, tiny_index.docs, phrase),
                   ["doc_id", "phrase_tf"])
        b = _pairs(phrase_match_docs_positional(pos, phrase),
                   ["doc_id", "phrase_tf"])
        assert a == b, phrase
        ta = _pairs(phrase_search(tiny_index, tiny_index.docs, phrase, k=10),
                    ["doc_id", "phrase_tf"])
        tb = _pairs(phrase_search_positional(pos, phrase, k=10),
                    ["doc_id", "phrase_tf"])
        assert ta == tb, phrase


def test_phrase_positional_nonoverlap_edge_cases(spark):
    """Greedy non-overlap parity with str.count on the lemma stream:
    'a a a' contains 'a a' ONCE (not twice), back-to-back 'a b a b'
    contains 'a b' twice, and duplicate-lemma phrases resolve by
    per-offset position checks."""
    from search_engine_spark.operators.index_build import build_index_from_docs

    rows = [
        (0, "xx yy xx yy"),          # back-to-back: "xx yy" x2
        (1, "xx xx xx"),             # self-overlap: "xx xx" counts 1
        (2, "xx yy zz xx yy"),       # two non-adjacent occurrences
        (3, "yy xx"),                # reversed — no match for "xx yy"
        (4, "xx zz yy"),             # gap — no adjacency
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ix = build_index_from_docs(docs)
    pos = build_positional_postings(docs)
    for phrase, want in [
        ("xx yy", {0: 2, 2: 2}),
        ("xx xx", {1: 1}),
        ("xx yy zz", {2: 1}),
    ]:
        a = {int(r["doc_id"]): int(r["phrase_tf"])
             for r in phrase_match_docs(ix, docs, phrase).collect()}
        b = {int(r["doc_id"]): int(r["phrase_tf"])
             for r in phrase_match_docs_positional(pos, phrase).collect()}
        assert a == want, (phrase, a)
        assert b == want, (phrase, b)


def test_near_positional_equals_string_verify(spark, tiny_index):
    pos = build_positional_postings(tiny_index.docs).cache()
    for q, w in (("w00000 w00001", 8), ("w00000 w00002 w00005", 6)):
        a = _pairs(near_search(tiny_index, tiny_index.docs, q, window=w, k=10),
                   ["doc_id", "n_windows"])
        b = _pairs(
            near_search_positional(pos, tiny_index.doclen, q, window=w, k=10),
            ["doc_id", "n_windows"])
        assert a == b, (q, w)


def test_positional_verify_never_reads_text(spark, tiny_transcripts, tmp_path):
    """The at-scale claim: the positional phrase plan reads ONLY the
    positional postings table — no text column in any scan's
    ReadSchema, no Python/Arrow eval (pure codegen array ops)."""
    docs_path = str(tmp_path / "docs")
    tiny_transcripts.write.parquet(docs_path)
    docs = spark.read.parquet(docs_path).withColumn(
        "doc_id", F.xxhash64("conv_id", "turn_idx")
    )
    pos_path = str(tmp_path / "pos")
    build_positional_postings(docs).write.parquet(pos_path)
    pos = spark.read.parquet(pos_path)

    plan = phrase_search_positional(pos, "w00000 w00001", k=10)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "text" not in line, line
    assert "EvalPython" not in plan and "ArrowEval" not in plan, plan
    assert docs_path not in plan  # only the positional table is scanned


def test_span_near_matches_python_recomputation(spark, tiny_index):
    """Ordered span proximity vs a per-doc python recount over the
    same lemma stream; slop 0 equals the exact bigram phrase count."""
    from search_engine_spark.functions.text import lemmatize_text_py
    from search_engine_spark.operators.positional import (
        span_near_search_positional,
    )

    pos = build_positional_postings(tiny_index.docs).cache()
    query, slop = "w00000 w00001", 3
    got = {
        r["doc_id"]: r["n_spans"]
        for r in span_near_search_positional(
            pos, query, slop=slop, k=100000
        ).collect()
    }
    assert got

    a, b = "w00000", "w00001"
    want: dict[int, int] = {}
    for r in tiny_index.docs.select("doc_id", "text").collect():
        stream = lemmatize_text_py(r["text"])
        pa = [i + 1 for i, l in enumerate(stream) if l == a]
        pb = [i + 1 for i, l in enumerate(stream) if l == b]
        n = sum(1 for p in pa if any(p < q <= p + slop + 1 for q in pb))
        if n:
            want[int(r["doc_id"])] = n
    assert got == want

    # slop 0 == adjacent ordered bigram; compare against a direct
    # bigram recount over the stream (NOT greedy phrase_tf — spans
    # count every qualifying start, e.g. 'a a b' yields 1 span but
    # greedy phrase_tf also 1; 'a b a b' gives 2 both ways)
    got0 = {
        r["doc_id"]: r["n_spans"]
        for r in span_near_search_positional(pos, query, slop=0,
                                             k=100000).collect()
    }
    want0: dict[int, int] = {}
    for r in tiny_index.docs.select("doc_id", "text").collect():
        stream = lemmatize_text_py(r["text"])
        n = sum(
            1 for i in range(len(stream) - 1)
            if stream[i] == a and stream[i + 1] == b
        )
        if n:
            want0[int(r["doc_id"])] = n
    assert got0 == want0

    # order matters: reversed query scans different spans
    rev = {
        r["doc_id"]: r["n_spans"]
        for r in span_near_search_positional(
            pos, "w00001 w00000", slop=slop, k=100000
        ).collect()
    }
    assert rev != got

    # degenerate queries return the empty frame
    assert span_near_search_positional(pos, "w00000", slop=slop).count() == 0
    assert span_near_search_positional(pos, "the and", slop=slop).count() == 0
    pos.unpersist()


def test_persisted_positional_index_and_invalidation(spark, tiny_transcripts,
                                                     tmp_path):
    """write_positional_index round-trips (disk table == freshly built
    one), and every corpus mutation drops the derived table."""
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.positional import (
        span_near_search_positional,
    )
    from search_engine_spark.sources.index_store import (
        DiskIndex,
        reindex_turn,
        write_index,
        write_positional_index,
    )

    idx_dir = str(tmp_path / "idx")
    ix = build_index(tiny_transcripts, use_arrow_udf=False, weighted=True)
    write_index(ix, idx_dir, input_desc="tiny", bucket_width=512)
    disk = DiskIndex(spark, idx_dir)
    assert disk.positional is None  # optional table, not built yet

    fresh = build_positional_postings(disk.as_inverted_index().docs)
    write_positional_index(fresh, idx_dir, bucket_width=512)
    ondisk = DiskIndex(spark, idx_dir).positional
    assert ondisk is not None
    assert "bucket" not in ondisk.columns  # storage col stripped

    q = "w00000 w00001"
    a = sorted(
        (r["doc_id"], r["n_spans"])
        for r in span_near_search_positional(ondisk, q, slop=3,
                                             k=100000).collect()
    )
    b = sorted(
        (r["doc_id"], r["n_spans"])
        for r in span_near_search_positional(fresh, q, slop=3,
                                             k=100000).collect()
    )
    assert a == b and a

    # a single-turn reindex invalidates the derived table
    row = tiny_transcripts.orderBy("conv_id", "turn_idx").limit(1).collect()[0]
    reindex_turn(spark, idx_dir, row["conv_id"], row["turn_idx"],
                 "w00000 w00009 w00001", bucket_width=512)
    assert DiskIndex(spark, idx_dir).positional is None
    # ...but the pre-mutation snapshot still serves it (as_of)
    assert DiskIndex(spark, idx_dir, as_of=1).positional is not None


def test_bm25_proximity_reorders_equal_bm25_docs(spark):
    """Two docs with identical tf/dl (equal BM25) must be reordered by
    term proximity: adjacent terms outrank scattered ones; min_dist is
    the true minimum pair distance in the lemma stream."""
    from search_engine_spark.operators.index_build import (
        build_index_from_docs,
    )
    from search_engine_spark.operators.positional import (
        bm25_topk_proximity,
        build_positional_postings,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha join beta database gamma"),
            (1, "join alpha beta gamma database"),
            (2, "alpha beta gamma delta epsilon"),
        ],
        "doc_id long, text string",
    )
    ix = build_index_from_docs(docs)
    pos = build_positional_postings(docs)
    rows = bm25_topk_proximity(ix, pos, "database join", k=5).collect()
    assert [r["doc_id"] for r in rows] == [0, 1]
    assert rows[0]["min_dist"] == 2 and rows[1]["min_dist"] == 4
    assert rows[0]["score"] > rows[1]["score"]
