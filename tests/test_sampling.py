"""Dataset split / stratified sample / decontamination / PII scrub.

Covers determinism (the pipeline-reproducibility contract), nesting
(smaller samples ⊂ larger samples), split exhaustiveness, broadcast
plan shape for decontamination, and scrub behavior on adversarial
fixtures (ordering between email / secret / phone patterns).
"""

import pyspark.sql.functions as F
import pytest

from search_engine_spark.operators.sampling import (
    SPLIT_BUCKETS,
    contamination,
    dataset_split,
    decontaminate,
    split_bucket_col,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"w{i % 7:05d} w{(i + 1) % 7:05d} w{(i + 2) % 7:05d} w{i:05d}x",
         "en" if i % 3 else "ru", f"src{i % 4}")
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_split_deterministic_and_exhaustive(docs):
    a = {r.doc_id: r.split for r in dataset_split(docs).collect()}
    b = {r.doc_id: r.split for r in dataset_split(docs).collect()}
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == 200
    # roughly 80/10/10 (hash-uniform; loose bounds at n=200)
    n_train = sum(v == "train" for v in a.values())
    assert 130 <= n_train <= 190


def test_split_membership_stable_under_corpus_growth(spark, docs):
    """A row's split depends only on (id, seed): adding rows must not
    move existing rows between splits."""
    small = {r.doc_id: r.split for r in dataset_split(docs.limit(50)).collect()}
    full = {r.doc_id: r.split for r in dataset_split(docs).collect()}
    assert all(full[k] == v for k, v in small.items())


def test_split_seed_redeals(docs):
    a = {r.doc_id: r.split for r in dataset_split(docs, seed="split0").collect()}
    b = {r.doc_id: r.split for r in dataset_split(docs, seed="split1").collect()}
    assert a != b  # 200 rows: P(identical deal) ≈ 0


def test_stratified_sample_nested_and_per_stratum(docs):
    s10 = stratified_sample(docs, {"en": 0.5, "ru": 0.1})
    s_small = stratified_sample(docs, {"en": 0.25, "ru": 0.05})
    ids10 = {r.doc_id for r in s10.collect()}
    ids_small = {r.doc_id for r in s_small.collect()}
    assert ids_small <= ids10  # nested under the same seed
    # default fraction drops unknown strata entirely
    extra = stratified_sample(
        docs.withColumn("lang", F.lit("zz")), {"en": 0.5}
    )
    assert extra.count() == 0


def test_bucket_range(docs):
    mx = docs.select(F.max(split_bucket_col()).alias("m"),
                     F.min(split_bucket_col()).alias("n")).first()
    assert 0 <= mx.n and mx.m < SPLIT_BUCKETS


def test_contamination_finds_planted_overlap(spark):
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "zeta eta theta iota"),
         (3, "unrelated words only here")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "the answer is alpha beta gamma exactly")],
        "doc_id long, text string",
    )
    hits = {r.doc_id: r.n_shared_shingles
            for r in contamination(train, ev, n=3).collect()}
    # doc 1 shares 'alpha beta gamma' (3-gram); docs 2,3 share nothing
    assert hits == {1: 1}
    clean = decontaminate(train, ev, n=3)
    assert {r.doc_id for r in clean.collect()} == {2, 3}


def test_contamination_plan_broadcasts_eval(spark, docs):
    plan = contamination(docs, docs.limit(5))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pii_scrub_fixtures(spark):
    from search_engine_spark.functions.analysis import (
        pii_count_cols,
        pii_scrub_col,
    )

    rows = [
        (1, "mail me at a.user+tag@sub.example.org today"),
        (2, "key deadbeefdeadbeefdeadbeefdeadbeef1234 leaked"),
        (3, "call +1 (555) 010-4242 now"),
        (4, "digits 123456789012345678901234567890ab stay one secret"),
        (5, "clean text with w00017 and short 12345 numbers"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            pii_scrub_col("text").alias("scrubbed"),
            *pii_count_cols("text"),
        ).collect()
    }
    assert out[1].scrubbed == "mail me at <EMAIL> today"
    assert out[1].n_email == 1 and out[1].n_phone == 0
    assert out[2].scrubbed == "key <SECRET> leaked"
    assert out[2].n_secret == 1
    assert out[3].scrubbed == "call <PHONE> now"
    assert out[3].n_phone == 1
    # 32+ hex chars redact as ONE secret even though they embed a long
    # digit run (secret pattern runs before phone)
    assert out[4].scrubbed == "digits <SECRET> stay one secret"
    assert out[5].scrubbed == rows[4][1]
    assert out[5].n_email == out[5].n_secret == out[5].n_phone == 0


def test_pii_scrub_matches_duckdb(spark):
    """The DuckDB twins must replay the scrub + counts byte-for-byte."""
    import duckdb

    from search_engine_spark.functions.analysis import (
        pii_count_cols,
        pii_count_sql_duckdb,
        pii_scrub_col,
        pii_scrub_sql_duckdb,
    )

    rows = [
        (1, "a@b.io and c.d@e-f.org, key " + "ab12" * 9 + " tel 555-010-99"),
        (2, "+44 20 7946 0958 then bare 0123456 and x@y.zz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.doc_id, r.scrubbed, r.n_email, r.n_secret, r.n_phone)
        for r in df.select(
            "doc_id", pii_scrub_col("text").alias("scrubbed"),
            *pii_count_cols("text")
        ).orderBy("doc_id").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    counts = ", ".join(pii_count_sql_duckdb("text"))
    want = con.execute(
        f"SELECT doc_id, {pii_scrub_sql_duckdb('text')} AS scrubbed, {counts} "
        "FROM t ORDER BY doc_id"
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_split_matches_duckdb(spark, docs):
    import duckdb

    from search_engine_spark.operators.sampling import (
        dataset_split_sql_duckdb,
        stratified_sample_sql_duckdb,
    )

    got = sorted(
        (r.doc_id, r.split) for r in dataset_split(docs).collect()
    )
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(
        f"SELECT doc_id, {dataset_split_sql_duckdb()} AS split "
        "FROM documents ORDER BY doc_id"
    ).fetchall()
    assert got == [tuple(w) for w in want]

    frac = {"en": 0.4, "ru": 0.15}
    got_ids = sorted(r.doc_id for r in stratified_sample(docs, frac).collect())
    want_ids = [
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM documents WHERE "
            f"{stratified_sample_sql_duckdb(frac)} ORDER BY doc_id"
        ).fetchall()
    ]
    assert got_ids == want_ids


def test_sequence_pack_offsets_and_splits(spark):
    """Packing arithmetic on a hand fixture: contiguous per-shard
    offsets in doc_id order, floor-division pack ids, boundary
    straddles flagged, empty docs dropped."""
    from search_engine_spark.operators.sampling import sequence_pack

    texts = {
        0: "a b c d",            # 4 tokens -> [0, 4)   pack 0
        1: "a b c d e",          # 5 tokens -> [4, 9)   pack 0
        2: "a b c",              # 3 tokens -> [9, 12)  packs 0-1: split
        3: "a b c d e f g",      # 7 tokens -> [12, 19) pack 1
        4: "",                   # empty: dropped
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict()
           for r in sequence_pack(docs, budget=10, n_shards=1).collect()}
    assert set(got) == {0, 1, 2, 3}
    want = {
        0: (0, 0, 0, False),
        1: (4, 0, 0, False),
        2: (9, 0, 1, True),
        3: (12, 1, 1, False),
    }
    for d, (start, p0, p1, split) in want.items():
        r = got[d]
        assert (r["start_off"], r["pack_id"], r["end_pack_id"],
                r["is_split"]) == (start, p0, p1, split), d
        assert r["shard"] == 0

    # multi-shard: offsets restart per shard and stay contiguous
    many = spark.createDataFrame(
        [(i, "w " * (i % 5 + 1)) for i in range(40)],
        "doc_id long, text string",
    )
    rows = sequence_pack(many, budget=7, n_shards=4).collect()
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["doc_id"])):
        assert r["shard"] == r["doc_id"] % 4
        nxt = by_shard.get(r["shard"], 0)
        assert r["start_off"] == nxt, r
        by_shard[r["shard"]] = nxt + r["n_tokens"]


def test_chunk_documents_windows_and_tails(spark):
    """chunk=4/stride=3 hand fixture: window starts every stride,
    tails kept unpadded, every token covered, empty docs dropped."""
    from search_engine_spark.operators.sampling import chunk_documents

    docs = spark.createDataFrame(
        [
            (0, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 10 toks -> 3 chunks
            (1, "u0 u1 u2 u3"),                    # exactly one window
            (2, "v0 v1"),                          # short tail only
            (3, ""),                               # empty: dropped
        ],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk=4, stride=3).collect()
    got = {(r["doc_id"], r["chunk_idx"]): r["chunk_text"] for r in rows}
    assert got == {
        (0, 0): "t0 t1 t2 t3",
        (0, 1): "t3 t4 t5 t6",
        (0, 2): "t6 t7 t8 t9",
        (1, 0): "u0 u1 u2 u3",
        (2, 0): "v0 v1",
    }
    # coverage: union of every doc's chunk tokens is the doc's tokens
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).update(r["chunk_text"].split())
    assert by_doc[0] == {f"t{i}" for i in range(10)}


def test_quality_resample_matches_manual_threshold(spark):
    """Kept set == {doc: md5 bucket < quality·BUCKETS} recomputed in
    Python over Spark's own quality scores (the NEW logic under test is
    the deterministic keep rule, not the score)."""
    import hashlib

    from search_engine_spark.functions.analysis import (
        quality_features,
        quality_score_col,
    )
    from search_engine_spark.operators.sampling import (
        SPLIT_BUCKETS,
        quality_resample,
    )

    docs = spark.createDataFrame(
        [
            (i, ("the quick brown fox jumps over lazy dogs near river %d " % i) * (i % 4 + 1))
            for i in range(60)
        ] + [(60, "!!! ??? ;;; ::: ,,,"), (61, "x")],  # low-quality rows
        "doc_id long, text string",
    )
    scores = {
        r["doc_id"]: r["q"]
        for r in docs.select("doc_id", *quality_features("text"))
        .select("doc_id", quality_score_col().alias("q"))
        .collect()
    }

    def bucket(i: int) -> int:
        return int(hashlib.md5(f"{i}:resample0".encode()).hexdigest()[:15], 16) % SPLIT_BUCKETS

    want = {i for i, q in scores.items() if float(bucket(i)) < q * float(SPLIT_BUCKETS)}
    got = {r["doc_id"] for r in quality_resample(docs).collect()}
    assert got == want
    assert got  # fixture keeps at least one row
    # the all-punctuation row scores exactly 0 (no tokens, punct clamp
    # saturated) and can never satisfy bucket < 0
    assert scores[60] == 0.0
    assert 60 not in got


def test_contamination_bloom_prefilter_identical_and_codegen(spark):
    """The Bloom shingle prefilter must not change contamination output
    (zero false negatives) while filtering BEFORE the join."""
    from search_engine_spark.operators.dedup import doc_shingles
    from search_engine_spark.operators.sampling import contamination
    from search_engine_spark.operators.sketches import bloom_bits
    from search_engine_spark.plans.explain import physical_plan

    train = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i} filler words here") for i in range(30)]
        + [(100, "leaked eval answer forty two exactly")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(0, "the leaked eval answer forty two exactly verbatim")],
        "doc_id long, text string",
    )
    m_bits, k, seed = 4096, 4, "bloom0"
    bits = {
        r["bit"]
        for r in bloom_bits(
            doc_shingles(ev, n=3).select(F.col("shingle").alias("text")),
            "text", m_bits, k, seed,
        ).collect()
    }
    plain = {(r["doc_id"], r["n_shared_shingles"])
             for r in contamination(train, ev, n=3).collect()}
    fast_df = contamination(
        train, ev, n=3,
        bloom_bits_prefilter=bits, bloom_params=(m_bits, k, seed),
    )
    fast = {(r["doc_id"], r["n_shared_shingles"]) for r in fast_df.collect()}
    assert fast == plain
    assert any(d == 100 for d, _ in fast)  # the planted leak is caught
    assert "EvalPython" not in physical_plan(fast_df)


def test_exact_n_sample_prefix_stability(spark):
    """Exact-N: returns exactly n rows; the N-sample is a PREFIX of
    the (N+k)-sample under one seed; membership engine-independent
    (recomputed from hashlib)."""
    import hashlib

    from search_engine_spark.operators.sampling import exact_n_sample

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id long, text string"
    )
    small = exact_n_sample(docs, 20)
    big = exact_n_sample(docs, 50)
    s_ids = [r["doc_id"] for r in small.orderBy("_rank").collect()]
    b_ids = [r["doc_id"] for r in big.orderBy("_rank").collect()]
    assert len(s_ids) == 20 and len(b_ids) == 50
    assert b_ids[:20] == s_ids                  # prefix-nested

    def bucket(i):
        return int(
            hashlib.md5(f"{i}:sample0".encode()).hexdigest()[:15], 16
        ) % 1_000_000
    want = sorted(range(200), key=lambda i: (bucket(i), i))[:50]
    assert b_ids == want                        # portable-hash order

    # a different seed reshuffles
    other = [r["doc_id"] for r in
             exact_n_sample(docs, 50, seed="sample1").orderBy("_rank")
             .collect()]
    assert other != b_ids


def test_gopher_filter_rules_and_reasons(spark):
    """Each Gopher rule fires on a doc constructed to violate exactly
    it (plus the short doc tripping several); reasons come back in the
    fixed report order, clean docs keep with ''."""
    from search_engine_spark.operators.sampling import gopher_filter

    docs = spark.createDataFrame([
        (0, "the quick brown fox jumps over the lazy dog near the river "
            "bank today and then it sleeps"),
        (1, "spam spam spam spam spam spam spam spam spam spam"),
        (2, "ok"),
        (3, "!!!! #### $$$$ %%%% ^^^^ &&&& **** (((( )))) @@@@ 0000 1111"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: (r["keep"], r["reasons"])
           for r in gopher_filter(docs, min_tokens=5).collect()}
    assert got[0] == (True, "")
    assert got[1] == (False,
                      "stopword_ratio,top_ngram_char_frac,dup_ngram_frac")
    assert got[2][0] is False and "word_count" in got[2][1]
    assert got[3][0] is False and "symbol_ratio" in got[3][1]
    # thresholds are parameters: loosening them rescues doc 1's
    # repetition violations but not its stopword one
    loose = {r["doc_id"]: r["reasons"]
             for r in gopher_filter(docs, min_tokens=5,
                                    max_top_char_frac=2.0,
                                    max_dup_frac=1.0).collect()}
    assert loose[1] == "stopword_ratio"


def test_budget_sample_exact_and_approx(spark):
    """Token-budget selection: the exact path keeps the maximal
    quality-prefix whose token mass fits; the approx (bucketed) path
    keeps a SUBSET of it — whole quality buckets only, mass <= budget
    (undershoots by at most one bucket), same quality-prefix shape.
    Tiny budget -> empty; huge budget -> everything."""
    from search_engine_spark.operators.sampling import budget_sample

    # distinct quality profiles: vary uniq-token ratio and length
    rows = []
    for i in range(24):
        uniq = [f"word{i}_{j}" for j in range(4 + i)]
        rep = ["again"] * (i % 7)
        rows.append((i, " ".join(uniq + rep)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    total = sum(
        r["n_tokens"]
        for r in budget_sample(docs, 10**9, method="exact").collect()
    )
    budget = total // 2
    exact = {r["doc_id"]: r["n_tokens"]
             for r in budget_sample(docs, budget, method="exact").collect()}
    approx = {r["doc_id"]: r["n_tokens"]
              for r in budget_sample(docs, budget, method="approx",
                                     n_buckets=8).collect()}
    assert sum(exact.values()) <= budget
    assert sum(approx.values()) <= budget
    assert set(approx) <= set(exact)
    assert approx  # a non-degenerate budget keeps something

    assert budget_sample(docs, 0, method="exact").count() == 0
    assert budget_sample(docs, 1, method="approx").count() == 0
    assert budget_sample(docs, 10**9, method="approx").count() == 24


def test_mixture_sample_hits_target_ratios(spark):
    """Mixture thinning: kept counts track the target proportions (the
    binding source — smallest n/p — keeps ~everything), membership is
    hash-stable, absent/invalid sources fail loud."""
    import pytest

    from search_engine_spark.operators.sampling import mixture_sample

    rows = []
    did = 0
    for src, n in (("a", 600), ("b", 600), ("c", 120)):
        for _ in range(n):
            rows.append((did, f"text {did}", src))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    props = {"a": 0.5, "b": 0.3, "c": 0.2}
    kept = mixture_sample(docs, props).collect()
    by_src = {}
    for r in kept:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    # binding source: c (120/0.2 = 600 < 600/0.3 = 2000, 600/0.5 = 1200)
    # -> T = 600, expected a=300 b=180 c=120
    assert by_src["c"] == 120                      # rate 1.0: keep all
    assert abs(by_src["a"] - 300) < 60             # hash-expectation band
    assert abs(by_src["b"] - 180) < 50
    # determinism: same call, same membership
    again = {(r["doc_id"]) for r in mixture_sample(docs, props).collect()}
    assert again == {r["doc_id"] for r in kept}
    # unknown source / bad proportions fail loud
    with pytest.raises(ValueError, match="no rows"):
        mixture_sample(docs, {"a": 0.5, "zzz": 0.5})
    with pytest.raises(ValueError, match="positive"):
        mixture_sample(docs, {"a": -1.0})


def test_pack_conversations_turn_boundaries(spark):
    """Conversation packing: offsets accumulate per conversation in
    turn order with role framing counted, a turn is never split (its
    pack is its start's pack; boundary-crossers flag overflows), and
    conversations pack independently."""
    from search_engine_spark.operators.sampling import pack_conversations

    t = spark.createDataFrame(
        [
            ("c1", 0, "user", "one two three"),        # 4 tokens framed
            ("c1", 1, "assistant", "four five"),       # 3 tokens framed
            ("c1", 2, "user", "a b c d e f"),          # 7 tokens framed
            ("c2", 0, "user", ""),        # framed: the role token counts
            ("c2", 1, "assistant", "only turn"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    rows = {(r["conv_id"], r["turn_idx"]): r
            for r in pack_conversations(t, budget=8).collect()}
    assert rows[("c2", 0)]["n_tokens"] == 1  # "user" alone
    # c1: n_tokens 4, 3, 7; offsets 0, 4, 7
    assert rows[("c1", 0)]["start_off"] == 0
    assert rows[("c1", 1)]["start_off"] == 4
    assert rows[("c1", 2)]["start_off"] == 7
    # packs at budget 8: turn2 starts at 7 (pack 0) and runs to 13 ->
    # stays whole in pack 0, flagged overflowing
    assert rows[("c1", 2)]["pack_id"] == 0
    assert rows[("c1", 2)]["overflows"] is True
    assert rows[("c1", 0)]["overflows"] is False
    # c2 restarts at offset 0 and accumulates independently
    assert rows[("c2", 0)]["start_off"] == 0
    assert rows[("c2", 1)]["start_off"] == 1 and rows[("c2", 1)]["pack_id"] == 0
