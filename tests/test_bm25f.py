"""BM25F field-weighted ranking (operators/bm25f.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src_a", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_title_field_boost_changes_rank(spark):
    """A title mention must outrank the same tf buried in a long body
    (per-field normalization + weight) — the property that motivates
    BM25F over concatenated scoring."""
    from search_engine_spark.operators.bm25f import bm25f_topk

    filler = " ".join(f"filler{i:03d}" for i in range(60))
    docs = _docs(spark, [
        # doc 0: query term leads the first sentence (title field)
        "database join basics. " + filler,
        # doc 1: same single occurrence, deep in the body only
        "completely unrelated opening sentence. " + filler + " join",
        # background docs so idf/avglen are non-degenerate
        "alpha beta gamma delta. more words here",
        "epsilon zeta eta theta. other words entirely",
    ])
    got = bm25f_topk(docs, "join", k=4)
    rows = got.collect()
    assert [r["doc_id"] for r in rows[:2]] == [0, 1]
    assert rows[0]["score"] > rows[1]["score"]


def test_zero_title_weight_is_rank_identical_to_bm25(spark):
    """With w_title = 0 the BM25F term reduces to idf·u/(k1+u) with
    u = tf/B — a monotone transform of classic BM25's
    idf·(k1+1)·u/(u+k1) per term... and with a single-term query the
    per-doc ORDER must match bm25_topk exactly (same tokenize, same
    doclen, same idf operands)."""
    from search_engine_spark.operators.bm25f import bm25f_topk
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.query import bm25_topk

    texts = [
        "join the table join the hash",
        "join once among many other words in a longer document body",
        "hash table scan merge",
        "join join join short",
        "irrelevant content entirely",
    ]
    docs = _docs(spark, texts)
    ix = build_index(
        docs.select(
            F.format_string("c%03d", F.col("doc_id")).alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.lit("user").alias("role"),
            "text",
            F.lit(None).cast("string").alias("tool"),
            F.lit(None).cast("timestamp").alias("ts"),
        ),
        use_arrow_udf=False,
    )
    want = [r["doc_id"] for r in bm25_topk(ix, "join", k=10).collect()]
    got = [r["doc_id"] for r in
           bm25f_topk(docs, "join", k=10,
                      field_weights={"title": 0.0, "body": 1.0}).collect()]
    assert got == want and got


def test_empty_and_stopword_queries_are_empty(spark):
    from search_engine_spark.operators.bm25f import bm25f_topk

    docs = _docs(spark, ["the quick brown fox", "lazy dog sleeps"])
    assert bm25f_topk(docs, "").count() == 0
    assert bm25f_topk(docs, "the and of").count() == 0
    assert bm25f_topk(docs, "zzznothere").count() == 0


def test_indexed_bm25f_rank_identical_and_plan_scan_only(spark, tmp_path):
    """The r4 verdict's index-backed BM25F: persist per-field postings
    (write_field_index) and score from them — rank- AND score-
    identical to the corpus-scan pin on the same docs, with a plan
    that never re-tokenizes (no regexp in the physical plan; the scan
    reads the fields/fieldlen parquet)."""
    from search_engine_spark.corpus import synthesize_transcripts
    from search_engine_spark.operators.bm25f import (
        bm25f_topk,
        bm25f_topk_indexed,
    )
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.plans.explain import physical_plan
    from search_engine_spark.sources.index_store import (
        DiskIndex,
        write_field_index,
        write_index,
    )

    out = str(tmp_path / "fix")
    ix = build_index(synthesize_transcripts(spark, 60), use_arrow_udf=False)
    write_index(ix, out, input_desc="synthetic:60", bucket_width=1024)
    disk = DiskIndex(spark, out)
    write_field_index(disk.docs, out, bucket_width=1024)
    disk = DiskIndex(spark, out)  # re-read with fields present

    q = "w00001s w00002ies"
    pin = [(r["doc_id"], r["score"])
           for r in bm25f_topk(disk.docs, q, k=10).collect()]
    served = bm25f_topk_indexed(disk, q, k=10)
    got = [(r["doc_id"], r["score"]) for r in served.collect()]
    assert got == pin and got

    plan = physical_plan(served)
    assert "regexp" not in plan.lower(), plan  # no re-tokenize
    assert "fields" in plan and "fieldlen" in plan

    # the corpus-scan pin itself returns a live frame (no collect):
    # composable lazily, e.g. a filter on top still works
    assert bm25f_topk(disk.docs, q, k=10).filter("score > 0").count() > 0


def test_field_index_invalidated_by_mutation(spark, tmp_path):
    """fields/ is DERIVED: a corpus mutation must drop it (stale
    per-field stats would mis-rank) — invalidate_derived covers it and
    the serving engine fails loud, telling the user to rebuild."""
    import pytest

    from search_engine_spark.corpus import synthesize_transcripts
    from search_engine_spark.operators.bm25f import bm25f_topk_indexed
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.sources.index_store import (
        DiskIndex,
        invalidate_derived,
        write_field_index,
        write_index,
    )

    out = str(tmp_path / "fmut")
    ix = build_index(synthesize_transcripts(spark, 30), use_arrow_udf=False)
    write_index(ix, out, input_desc="synthetic:30", bucket_width=1024)
    disk = DiskIndex(spark, out)
    write_field_index(disk.docs, out, bucket_width=1024)
    assert DiskIndex(spark, out).fields is not None
    assert invalidate_derived(out)
    disk = DiskIndex(spark, out)
    assert disk.fields is None and disk.fieldlen is None
    with pytest.raises(FileNotFoundError, match="--fields"):
        bm25f_topk_indexed(disk, "w00001s")


def test_config_driven_fields_generalize(spark):
    """The reference's config-driven field table (FieldRepository
    seeds name/selector/weight rows): bm25f accepts any FieldSpec
    tuple. Pins: (a) an extra ZERO-weight field leaves every score
    bit-identical to the default two-field config (its tf̃ term is
    exactly 0.0); (b) with positive weight, a lead-field mention
    outranks the same tf buried deep in the body."""
    from search_engine_spark.operators.bm25f import (
        FieldSpec,
        TITLE_EXPR,
        bm25f_topk,
        default_fields,
    )

    filler = " ".join(f"filler{i:03d}" for i in range(80))
    lead_expr = "substring(text, 1, 200)"
    docs = _docs(spark, [
        "plain opening sentence here. database join early words " + filler,
        "plain opening sentence here. " + filler + " database join",
        "alpha beta gamma delta. more words here",
        "epsilon zeta eta theta. other words entirely",
    ])
    three_zero = default_fields() + (FieldSpec("l", lead_expr, 0.0),)
    base = [(r["doc_id"], r["score"])
            for r in bm25f_topk(docs, "join", k=4).collect()]
    got = [(r["doc_id"], r["score"])
           for r in bm25f_topk(docs, "join", k=4,
                               fields=three_zero,
                               candidate_field="b").collect()]
    assert got == base and got

    three = default_fields() + (FieldSpec("l", lead_expr, 3.0),)
    rows = bm25f_topk(docs, "join", k=4, fields=three,
                      candidate_field="b").collect()
    assert [r["doc_id"] for r in rows[:2]] == [0, 1]
    assert rows[0]["score"] > rows[1]["score"]


def test_reindex_maintains_field_index_bucket_bounded(spark, tmp_path):
    """reindex_turn keeps the per-field tables SERVABLE via a
    bucket-bounded refresh (no whole-index invalidation): after the
    mutation, fields/fieldlen/stats equal a from-scratch
    write_field_index over the mutated corpus, and the indexed engine
    still matches the corpus-scan pin."""
    from search_engine_spark.corpus import synthesize_transcripts
    from search_engine_spark.operators.bm25f import (
        bm25f_topk,
        bm25f_topk_indexed,
    )
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.sources.index_store import (
        DiskIndex,
        reindex_turn,
        write_field_index,
        write_index,
    )

    out = str(tmp_path / "frix")
    ix = build_index(synthesize_transcripts(spark, 40), use_arrow_udf=False)
    write_index(ix, out, input_desc="synthetic:40", bucket_width=256)
    disk = DiskIndex(spark, out)
    write_field_index(disk.docs, out, bucket_width=256)

    row = disk.docs.select("conv_id", "turn_idx").head()
    reindex_turn(spark, out, row["conv_id"], int(row["turn_idx"]),
                 "replacement database join text entirely new",
                 bucket_width=256, snapshot=False)

    disk2 = DiskIndex(spark, out)
    assert disk2.fields is not None, "field index was invalidated"

    fresh = str(tmp_path / "fresh")
    import os
    os.makedirs(fresh)
    stats_fresh = write_field_index(disk2.docs, fresh, bucket_width=256)
    fresh_tf = {(r["doc_id"], r["field"], r["lemma"]): r["tf"]
                for r in spark.read.parquet(f"{fresh}/fields").drop(
                    "bucket").collect()}
    got_tf = {(r["doc_id"], r["field"], r["lemma"]): r["tf"]
              for r in disk2.fields.collect()}
    assert got_tf == fresh_tf
    assert disk2.field_stats == {k: v for k, v in stats_fresh.items()
                                 if not k.startswith("_")}

    q = "w00001s w00002ies"
    pin = [(r["doc_id"], r["score"])
           for r in bm25f_topk(disk2.docs, q, k=10).collect()]
    got = [(r["doc_id"], r["score"])
           for r in bm25f_topk_indexed(disk2, q, k=10).collect()]
    assert got == pin and got
