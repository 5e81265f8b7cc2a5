"""Index-build semantics vs the single-node golden twin (SURVEY §5):
tf/rank per (doc,lemma), true df/cf, doclen, salted df == unsalted."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from search_engine_spark.config import ROLE_WEIGHTS
from search_engine_spark.operators.index_build import (
    build_index,
    explode_lemmas,
    role_weight_col,
    term_df_salted,
)


def test_postings_match_python_twin(tiny_index, py_twin):
    got = {
        (r["doc_id"], r["lemma"]): (r["tf"], r["rank"])
        for r in tiny_index.postings.collect()
    }
    want = {}
    for lemma, by_doc in py_twin.postings.items():
        for d, tf in by_doc.items():
            want[(d, lemma)] = (tf, py_twin.ranks[lemma][d])
    assert set(got) == set(want)
    for k, (tf, rank) in want.items():
        gtf, grank = got[k]
        assert gtf == tf, k
        assert math.isclose(grank, rank, rel_tol=1e-9), k


def test_terms_df_cf_match(tiny_index, py_twin):
    got = {r["lemma"]: (r["df"], r["cf"]) for r in tiny_index.terms.collect()}
    want = {l: (py_twin.df[l], py_twin.cf[l]) for l in py_twin.df}
    assert got == want


def test_term_ids_dense_unique(tiny_index):
    ids = [r["term_id"] for r in tiny_index.terms.select("term_id").collect()]
    assert sorted(ids) == list(range(len(ids)))


def test_doclen_and_stats(tiny_index, py_twin):
    got = {r["doc_id"]: r["dl"] for r in tiny_index.doclen.collect()}
    assert got == py_twin.doclen
    assert tiny_index.stats.n_docs == py_twin.n_docs
    assert math.isclose(tiny_index.stats.avgdl, py_twin.avgdl, rel_tol=1e-9)


def test_salted_df_equals_unsalted(spark, tiny_index, tiny_transcripts):
    """north_rule skew requirement: salted two-stage distinct == plain."""
    from search_engine_spark.operators.docids import assign_dense_ids

    docs = assign_dense_ids(tiny_transcripts, ["conv_id", "turn_idx"], "doc_id")
    lemma_rows = explode_lemmas(docs)
    for salt in (4, 16):
        salted = {r["lemma"]: r["df"] for r in term_df_salted(lemma_rows, salt).collect()}
        plain = {r["lemma"]: r["df"] for r in tiny_index.terms.select("lemma", "df").collect()}
        assert salted == plain


def test_role_weights_applied(spark):
    df = spark.createDataFrame(
        [("c", 0, "user", "alpha alpha"), ("c", 1, "assistant", "alpha alpha"),
         ("c", 2, "tool", "alpha alpha"), ("c", 3, "mystery", "alpha alpha")],
        "conv_id string, turn_idx int, role string, text string",
    )
    ix = build_index(df, use_arrow_udf=False, weighted=True)
    ranks = {r["doc_id"]: r["rank"] for r in ix.postings.collect()}
    docs = {r["turn_idx"]: r["doc_id"] for r in ix.docs.collect()}
    assert ranks[docs[0]] == 2 * ROLE_WEIGHTS["user"]
    assert ranks[docs[1]] == 2 * ROLE_WEIGHTS["assistant"]
    assert ranks[docs[2]] == 2 * ROLE_WEIGHTS["tool"]
    assert ranks[docs[3]] == 2 * 1.0  # default weight


def test_arrow_udf_path_equals_jvm_path(spark, tiny_transcripts):
    """The zero-shuffle Arrow path (per-doc tf maps inside the UDF) must
    produce byte-identical postings/doclen/terms to the explode+groupBy
    JVM-expression path, including role-weighted ranks."""
    for weighted in (False, True):
        a = build_index(tiny_transcripts, use_arrow_udf=False, weighted=weighted)
        b = build_index(tiny_transcripts, use_arrow_udf=True, weighted=weighted)
        pa = {(r["doc_id"], r["lemma"], r["tf"], round(r["rank"], 9))
              for r in a.postings.collect()}
        pb = {(r["doc_id"], r["lemma"], r["tf"], round(r["rank"], 9))
              for r in b.postings.collect()}
        assert pa == pb, f"postings diverge (weighted={weighted})"
        da = {r["doc_id"]: r["dl"] for r in a.doclen.collect()}
        db = {r["doc_id"]: r["dl"] for r in b.doclen.collect()}
        assert da == db
        ta = {r["lemma"]: (r["df"], r["cf"]) for r in a.terms.collect()}
        tb = {r["lemma"]: (r["df"], r["cf"]) for r in b.terms.collect()}
        assert ta == tb
        assert a.stats == b.stats
