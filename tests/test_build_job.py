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

    # index_stats: scan-free report over the same index (+ n_terms via
    # the one tiny parquet read when a session is requested)
    env = dict(os.environ, PYTHONPATH=REPO)
    st = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "index_stats.py"),
         "--index", out, "--local-cpus", "2"],
        capture_output=True, text=True, cwd=REPO, timeout=300, env=env,
    )
    assert st.returncode == 0, st.stderr[-2000:]
    rep = json.loads(st.stdout.strip().splitlines()[-1])
    assert rep["complete"] and rep["n_buckets"] > 0
    assert rep["postings_rows"] > 0 and rep["bucket_skew"] >= 1.0
    assert rep["segments_bytes"] > 0 and rep["n_terms"] > 0
    assert not rep["compaction_pending"]
    missing = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "index_stats.py"),
         "--index", str(tmp_path / "nope")],
        capture_output=True, text=True, cwd=REPO, timeout=60, env=env,
    )
    assert missing.returncode == 2


def _search(*args: str) -> subprocess.CompletedProcess:
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "search.py"),
         "--local-cpus", "4", *args],
        capture_output=True, text=True, cwd=REPO, timeout=300, env=env,
    )


def test_search_cli_engines_agree(tmp_path):
    """jobs/search.py: the CLI analog of the reference's /api/search —
    all three engines return identical hits; mini language and the
    invalid-query exit code work end-to-end."""
    out = str(tmp_path / "idx")
    r = _run("--n-synthetic-convs", "40", "--output", out,
             "--bucket-width", "1024")
    assert r.returncode == 0, r.stderr[-2000:]

    def hits(proc):
        assert proc.returncode == 0, proc.stderr[-2000:]
        return [json.loads(l) for l in proc.stdout.strip().splitlines() if l]

    df = hits(_search("--index", out, "--query", "w00000 w00001", "--engine", "df"))
    wand = hits(_search("--index", out, "--query", "w00000 w00001", "--engine", "wand"))
    sql = hits(_search("--index", out, "--query", "w00000 w00001", "--engine", "sql"))
    assert df and df == wand == sql

    mini = hits(_search("--index", out, "--query", "w00000 -w00001",
                        "--engine", "mini"))
    banned = {h["doc_id"] for h in df}
    # docs holding both terms are excluded by -w00001
    assert mini and not ({h["doc_id"] for h in mini} & banned)

    # qld engine: same AND candidate set as BM25 (match semantics are
    # shared; only the ranking model differs), scores present
    qld = hits(_search("--index", out, "--query", "w00000 w00001",
                       "--engine", "qld", "--k", "100000"))
    assert {h["doc_id"] for h in qld} == {
        h["doc_id"]
        for h in hits(_search("--index", out, "--query", "w00000 w00001",
                              "--engine", "df", "--k", "100000"))
    }
    assert all(isinstance(h["score"], float) for h in qld)

    # --collapse: one best hit per conversation, no group repeated
    col = hits(_search("--index", out, "--query", "w00000 w00001",
                       "--collapse", "conv_id", "--k", "10"))
    assert col and len({h["group"] for h in col}) == len(col)
    top_scores = [h["score"] for h in df]
    assert col[0]["score"] == top_scores[0]  # global best survives collapse

    page = hits(_search("--index", out, "--query", "w00000 w00001",
                        "--offset", "3", "--k", "4"))
    full = hits(_search("--index", out, "--query", "w00000 w00001", "--k", "10"))
    assert page == full[3:7]

    # --after: cursor paging reproduces the offset slice, flat cost
    cur = full[2]
    after = hits(_search("--index", out, "--query", "w00000 w00001",
                         "--after", f"{cur['score']}:{cur['doc_id']}",
                         "--k", "4"))
    assert after == full[3:7] == page
    bad = _search("--index", out, "--query", "w00000", "--after", "junk")
    assert bad.returncode == 2

    # --or: AND-empty (one absent term) but OR still scores the present one
    and_empty = _search("--index", out, "--query", "w00000 zzznotaword")
    assert and_empty.returncode == 0 and not and_empty.stdout.strip()
    or_df = hits(_search("--index", out, "--query", "w00000 zzznotaword", "--or"))
    or_wand = hits(_search("--index", out, "--query", "w00000 zzznotaword",
                           "--or", "--engine", "wand"))
    assert or_df and or_df == or_wand

    # --prf: feedback expansion re-ranks disjunctively; the conjunctive
    # pool seeds it, so strong AND hits stay present
    prf = hits(_search("--index", out, "--query", "w00000 w00001", "--prf"))
    assert prf and ({h["doc_id"] for h in df} & {h["doc_id"] for h in prf})

    # mini-language OR: union of two branch constraint sets — a doc
    # needs only one branch; both branches' lemmas must surface docs
    orq = hits(_search("--index", out, "--query", "w00003 | w00004",
                       "--engine", "mini", "--k", "50"))
    only3 = hits(_search("--index", out, "--query", "w00003",
                         "--engine", "mini", "--k", "50"))
    only4 = hits(_search("--index", out, "--query", "w00004",
                         "--engine", "mini", "--k", "50"))
    got_ids = {h["doc_id"] for h in orq}
    assert got_ids & {h["doc_id"] for h in only3}
    assert got_ids & {h["doc_id"] for h in only4}

    # mini-language grouping: '(a | b) -c' distributes the NOT over
    # both branches — identical hits to the hand-flattened form
    gq = hits(_search("--index", out, "--query", "(w00003 | w00004) -w00000",
                      "--engine", "mini", "--k", "50"))
    fq = hits(_search("--index", out, "--query",
                      "w00003 -w00000 | w00004 -w00000",
                      "--engine", "mini", "--k", "50"))
    assert gq and [(h["doc_id"], h["score"]) for h in gq] == [
        (h["doc_id"], h["score"]) for h in fq
    ]
    # a grouped shape with no flat form is a clean exit-2 user error,
    # not a traceback
    noflat = _search("--index", out, "--query", "-(w00003 w00004)",
                     "--engine", "mini")
    assert noflat.returncode == 2
    assert "invalid query" in noflat.stderr

    # mini-language role: scope — every scoped hit must be a user turn
    scoped = hits(_search("--index", out, "--query", "role:user w00000",
                          "--engine", "mini", "--k", "20", "--snippets"))
    assert scoped
    unscoped = {h["doc_id"]
                for h in hits(_search("--index", out, "--query", "w00000",
                                      "--engine", "mini", "--k", "100000"))}
    assert {h["doc_id"] for h in scoped} <= unscoped

    snip = _search("--index", out, "--query", "w00000", "--k", "2", "--snippets")
    srows = [json.loads(l) for l in snip.stdout.strip().splitlines() if l]
    assert snip.returncode == 0 and len(srows) == 2
    assert all("<b>" in h["snippet"] for h in srows)

    bad = _search("--index", out, "--query", "the and of")
    assert bad.returncode == 2

    # --suggest: a misspelled term gets a did-you-mean line; correctly
    # spelled terms produce none
    sug = _search("--index", out, "--query", "w0000q w00001", "--suggest")
    assert sug.returncode == 0
    slines = [json.loads(l) for l in sug.stdout.strip().splitlines()
              if l and "did_you_mean" in l]
    assert [s["word"] for s in slines] == ["w0000q"]
    assert slines[0]["did_you_mean"].startswith("w0000")

    # --more-like: related docs for the top hit, seed excluded
    seed = df[0]["doc_id"]
    rel = hits(_search("--index", out, "--more-like", str(seed), "--k", "5"))
    assert rel and seed not in {h["doc_id"] for h in rel}
    both = _search("--index", out, "--query", "w00000",
                   "--more-like", str(seed))
    assert both.returncode == 2  # exactly one of --query/--more-like

    # --facets: per-role breakdown of the AND-matching docs, emitted
    # alongside the hits; counts must cover >= the top-k hits
    fac = _search("--index", out, "--query", "w00000 w00001",
                  "--facets", "role", "--k", "3")
    assert fac.returncode == 0
    lines = [json.loads(l) for l in fac.stdout.strip().splitlines() if l]
    frows = [l for l in lines if l.get("facet_col") == "role"]
    hrows = [l for l in lines if "score" in l]
    assert len(hrows) == 3 and frows
    assert {f["facet"] for f in frows} <= {"user", "assistant", "tool"}
    assert sum(f["n_docs"] for f in frows) >= len(hrows)

    # --context: every hit appears with its offset-0 row; all rows
    # stay inside the hit's conversation window
    ctx = _search("--index", out, "--query", "w00000 w00001",
                  "--context", "1", "--k", "3")
    assert ctx.returncode == 0
    clines = [json.loads(l) for l in ctx.stdout.strip().splitlines()
              if l and "hit_doc" in l]
    chits = {c["hit_doc"] for c in clines}
    assert clines and all(-1 <= c["offset"] <= 1 for c in clines)
    assert all(any(c["offset"] == 0 and c["hit_doc"] == h for c in clines)
               for h in chits)

    # --significant: query-correlated vocabulary beside the hits;
    # query lemmas never self-report
    sig = _search("--index", out, "--query", "w00000 w00001",
                  "--significant", "--k", "3")
    assert sig.returncode == 0
    srows = [json.loads(l) for l in sig.stdout.strip().splitlines()
             if l and "jlh" in l]
    assert srows and not ({s["lemma"] for s in srows} & {"w00000", "w00001"})

    # --histogram: matching-doc counts per time bucket over the real
    # transcript ts; bucket starts aligned to the interval, total
    # count covers >= the emitted hits
    hist = _search("--index", out, "--query", "w00000 w00001",
                   "--histogram", "86400", "--k", "3")
    assert hist.returncode == 0
    hlines = [json.loads(l) for l in hist.stdout.strip().splitlines() if l]
    brows = [l for l in hlines if "bucket_start" in l]
    assert brows and all(b["bucket_start"] % 86400 == 0 for b in brows)
    assert sum(b["n_docs"] for b in brows) >= len(
        [l for l in hlines if "score" in l])

    # --recency: with a huge half-life the decay is ~1 — ranking equals
    # plain df BM25; with a tiny one it still returns the same match
    # set count (ranking-only change)
    rec = hits(_search("--index", out, "--query", "w00000 w00001",
                       "--recency", "1e9"))
    assert rec == df
    rec_fast = hits(_search("--index", out, "--query", "w00000 w00001",
                            "--recency", "0.001", "--k", "10"))
    assert rec_fast and {h["doc_id"] for h in rec_fast} <= {
        h["doc_id"] for h in hits(_search(
            "--index", out, "--query", "w00000 w00001", "--k", "100000"))}

    # --since/--until: an all-covering window equals plain; a window
    # before the corpus returns nothing; non-df engines refuse
    win = hits(_search("--index", out, "--query", "w00000 w00001",
                       "--since", "1990-01-01"))
    assert win == df
    none = _search("--index", out, "--query", "w00000 w00001",
                   "--until", "1990-01-01")
    assert none.returncode == 0 and not none.stdout.strip()
    refuse = _search("--index", out, "--query", "w00000",
                     "--since", "1990-01-01", "--engine", "wand")
    assert refuse.returncode == 2

    # --count composes with the window and keeps the invalid-query
    # exit-2 contract; boost syntax is stripped, not lemmatized
    cnone = _search("--index", out, "--query", "w00000 w00001",
                    "--count", "--until", "1990-01-01")
    assert cnone.returncode == 0
    assert json.loads(cnone.stdout.strip()) == {"n": 0}
    cboost = _search("--index", out, "--query", "w00000^2 w00001",
                     "--count")
    cplain = _search("--index", out, "--query", "w00000 w00001",
                     "--count")
    assert (json.loads(cboost.stdout.strip())
            == json.loads(cplain.stdout.strip()))
    assert json.loads(cplain.stdout.strip())["n"] >= len(df)
    assert _search("--index", out, "--query", "the and of",
                   "--count").returncode == 2
    # --recency on a non-plain-df mode refuses instead of silently
    # ranking undecayed
    assert _search("--index", out, "--query", "w00000",
                   "--recency", "7", "--engine", "wand").returncode == 2

    # --min-match 1 == OR retrieval; --percolate matches the stored
    # query's AND set (reverse search)
    full_and = hits(_search("--index", out, "--query", "w00000 w00001",
                            "--k", "100000"))
    msm = hits(_search("--index", out, "--query", "w00000 w00001",
                       "--min-match", "1", "--k", "100000"))
    or_all = hits(_search("--index", out, "--query", "w00000 w00001",
                          "--or", "--k", "100000"))
    assert msm == or_all
    sq = tmp_path / "stored.tsv"
    sq.write_text("5\tw00000 w00001\n")
    perc = _search("--index", out, "--percolate", str(sq))
    assert perc.returncode == 0
    prows = [json.loads(l) for l in perc.stdout.strip().splitlines() if l]
    assert prows and all(r["query_id"] == 5 for r in prows)
    assert {r["doc_id"] for r in prows} == {h["doc_id"] for h in full_and}


def test_eval_cli(tmp_path):
    """jobs/eval.py: query-log replay + qrels scoring end-to-end —
    per-query metric lines, zero-result queries kept in the macro
    denominator, unparseable queries skipped."""
    out = str(tmp_path / "idx")
    r = _run("--n-synthetic-convs", "30", "--output", out,
             "--bucket-width", "1024")
    assert r.returncode == 0, r.stderr[-2000:]

    # fetch real top doc_ids to judge against
    top = _search("--index", out, "--query", "w00000 w00001", "--k", "3")
    hits = [json.loads(l) for l in top.stdout.strip().splitlines() if l]
    assert len(hits) == 3

    qfile = tmp_path / "queries.tsv"
    qfile.write_text(
        "1\tw00000 w00001\n"
        "2\tzzznotaword qqqnotaword\n"   # parses, retrieves nothing
        "3\tthe and of\n"                 # no indexable terms
    )
    qrels = tmp_path / "qrels.tsv"
    qrels.write_text(
        f"1 0 {hits[0]['doc_id']} 2\n"    # 4-col TREC form
        f"1 0 {hits[2]['doc_id']} 1\n"
        f"1 0 999999999 3\n"              # judged, never retrievable
        f"2 0 {hits[0]['doc_id']} 1\n"
    )
    env = dict(os.environ, PYTHONPATH=REPO)
    ev = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "eval.py"),
         "--local-cpus", "4", "--index", out, "--queries", str(qfile),
         "--qrels", str(qrels), "--k", "3"],
        capture_output=True, text=True, cwd=REPO, timeout=300, env=env,
    )
    assert ev.returncode == 0, ev.stderr[-2000:]
    lines = [json.loads(l) for l in ev.stdout.strip().splitlines() if l]
    by_id = {l["query_id"]: l for l in lines}
    assert by_id[3] == {"query_id": 3, "skipped": True}
    q1 = by_id[1]
    assert q1["mrr"] == 1.0                      # top hit judged rel 2
    assert q1["precision"] == round(2 / 3, 6)
    assert q1["recall"] == round(2 / 3, 6)       # 999999999 unreachable
    assert 0 < q1["ndcg"] < 1                    # ideal has rel-3 first
    q2 = by_id[2]
    assert (q2["ndcg"], q2["mrr"], q2["precision"], q2["recall"]) == (
        0.0, 0.0, 0.0, 0.0)
    macro = by_id["macro"]
    assert macro["n_queries"] == 2               # q3 skipped, q2 counted
    for m in ("ndcg", "mrr", "precision", "recall"):
        assert macro[m] == round((q1[m] + q2[m]) / 2, 6)

    # --sweep: one line per (k1, b) config, best mean nDCG first;
    # the default config's mean must equal the single-eval macro nDCG
    sw = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "eval.py"),
         "--local-cpus", "4", "--index", out, "--queries", str(qfile),
         "--qrels", str(qrels), "--k", "3", "--sweep", "1.2:0.75,0.6:0.2"],
        capture_output=True, text=True, cwd=REPO, timeout=300, env=env,
    )
    assert sw.returncode == 0, sw.stderr[-2000:]
    srows = [json.loads(l) for l in sw.stdout.strip().splitlines() if l]
    assert len(srows) == 2
    assert srows[0]["mean_ndcg"] >= srows[1]["mean_ndcg"]
    default = next(r for r in srows if (r["k1"], r["b"]) == (1.2, 0.75))
    # sweep averages over queries WITH runs (q2 retrieves nothing ->
    # not in the sweep denominator); q1 is the only scoring query
    assert default["n_queries"] == 1
    assert default["mean_ndcg"] == q1["ndcg"]


def test_prepare_dataset_cli(tmp_path):
    """jobs/prepare_dataset.py: the training-pipeline CLI writes split
    docs + a pack map and reports consistent stage counts."""
    out = str(tmp_path / "prep")
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "prepare_dataset.py"),
         "--local-cpus", "4", "--n-synthetic-convs", "40",
         "--output", out, "--budget", "128", "--shards", "2"],
        capture_output=True, text=True, cwd=REPO, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["cleansed"] <= m["input"]
    assert m["train"] + m["val"] + m["test"] == m["cleansed"]
    assert m["train_decontaminated"] <= m["train"]
    assert m["packed_docs"] == m["train_decontaminated"]  # no empty docs here
    assert m["n_sequences"] >= 1

    import glob

    assert glob.glob(os.path.join(out, "docs", "split=train", "*.parquet"))
    pack_files = glob.glob(os.path.join(out, "pack", "*.parquet"))
    assert pack_files

    # docs/ must agree with pack/: the written train partition holds
    # exactly the decontaminated docs the pack map covers
    import duckdb

    con = duckdb.connect()
    train_ids = {r[0] for r in con.sql(
        f"SELECT doc_id FROM read_parquet('{out}/docs/split=train/*.parquet')"
    ).fetchall()}
    pack_ids = {r[0] for r in con.sql(
        f"SELECT doc_id FROM read_parquet('{out}/pack/*.parquet')"
    ).fetchall()}
    assert train_ids == pack_ids
    assert len(train_ids) == m["train_decontaminated"]


def test_prepare_dataset_ppl_filter(tmp_path):
    """--ppl-max inserts the LM-perplexity stage: counts chain through
    ppl_filtered and the splits partition the filtered set."""
    out = str(tmp_path / "prep_ppl")
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "prepare_dataset.py"),
         "--local-cpus", "4", "--n-synthetic-convs", "40",
         "--output", out, "--budget", "128", "--shards", "2",
         "--ppl-max", "2800", "--no-decontaminate"],
        capture_output=True, text=True, cwd=REPO, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert 0 < m["ppl_filtered"] <= m["cleansed"]
    assert m["train"] + m["val"] + m["test"] == m["ppl_filtered"]
    assert m["packed_docs"] == m["train"]


def test_refresh_index_cli(tmp_path, spark):
    """jobs/refresh_index.py: drain streamed deltas, compact, and serve
    the merged corpus — the /api/startIndexing loop at CLI level."""
    from pyspark.sql import functions as F

    from search_engine_spark.corpus import synthesize_transcripts

    idx = str(tmp_path / "idx")
    incoming = str(tmp_path / "incoming")
    r = _run("--n-synthetic-convs", "60", "--output", idx,
             "--bucket-width", "1024")
    assert r.returncode == 0, r.stderr[-2000:]
    synthesize_transcripts(spark, 90).filter(
        F.col("conv_id") >= "conv-00000060"
    ).write.parquet(incoming)

    env = dict(os.environ, PYTHONPATH=REPO)
    rf = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "refresh_index.py"),
         "--local-cpus", "4", "--index", idx, "--input", incoming,
         "--compact"],
        capture_output=True, text=True, cwd=REPO, timeout=300, env=env,
    )
    assert rf.returncode == 0, rf.stderr[-2000:]
    m = json.loads(rf.stdout.strip().splitlines()[-1])
    assert m["drained"] and m["compacted"]
    assert m["compaction"]["n_streamed"] > 0
    assert m["stream_delta_files"] == {}  # backlog folded in

    # the merged index serves hits spanning old AND new conversations
    hits = _search("--index", idx, "--query", "w00000", "--k", "100000",
                   "--snippets")
    assert hits.returncode == 0
    rows = [json.loads(l) for l in hits.stdout.strip().splitlines() if l]
    convs = {r["conv_id"] for r in rows}
    assert any(c < "conv-00000060" for c in convs)
    assert any(c >= "conv-00000060" for c in convs)


def test_prepare_dataset_resume_from_staging(tmp_path, spark):
    """--resume restarts from a leftover staged split: the cleanse
    stages are skipped and the final outputs agree with the staged
    table."""
    out = str(tmp_path / "prep")
    env = dict(os.environ, PYTHONPATH=REPO)

    def run(*extra):
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "prepare_dataset.py"),
             "--local-cpus", "4", "--n-synthetic-convs", "30",
             "--output", out, "--budget", "128", "--shards", "2", *extra],
            capture_output=True, text=True, cwd=REPO, timeout=300, env=env,
        )

    r1 = run()
    assert r1.returncode == 0, r1.stderr[-2000:]
    m1 = json.loads(r1.stdout.strip().splitlines()[-1])

    # plant staging equal to the finished run's docs table (same rows
    # the real crash-leftover would hold) and restart with --resume
    staged = spark.read.parquet(os.path.join(out, "docs"))
    staged.select("doc_id", "text", "split").write.mode("overwrite").parquet(
        os.path.join(out, "_staging_split"))
    with open(os.path.join(out, "_staging_counts.json"), "w") as fh:
        json.dump({"input": m1["input"], "cleansed": m1["cleansed"]}, fh)
    r2 = run("--resume")
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert m2["resumed_from_staging"] is True
    assert m2["input"] == m1["input"] and m2["cleansed"] == m1["cleansed"]
    # NOTE: the planted staging's train partition is ALREADY
    # decontaminated, so re-decontamination is a no-op and counts agree
    assert m2["packed_docs"] == m1["packed_docs"]
    assert m2["n_sequences"] == m1["n_sequences"]
    assert not os.path.exists(os.path.join(out, "_staging_split"))


def test_export_cli_roundtrip(tmp_path):
    """jobs/export.py: the match-set JSONL dump — exported row count
    equals --count's figure, whole-corpus export equals n_docs, and
    the output re-ingests cleanly (export -> ingest round-trip)."""
    out = str(tmp_path / "idx")
    r = _run("--n-synthetic-convs", "25", "--output", out,
             "--bucket-width", "1024")
    assert r.returncode == 0, r.stderr[-2000:]
    env = dict(os.environ, PYTHONPATH=REPO)

    cnt = _search("--index", out, "--query", "w00000 w00001", "--count")
    n_match = next(
        json.loads(l)["n"] for l in cnt.stdout.splitlines()
        if l.startswith("{") and '"n"' in l
    )
    assert n_match > 0

    exp_dir = str(tmp_path / "export")
    ex = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "export.py"),
         "--local-cpus", "2", "--index", out, "--output", exp_dir,
         "--query", "w00000 w00001"],
        capture_output=True, text=True, cwd=REPO, timeout=300, env=env,
    )
    assert ex.returncode == 0, ex.stderr[-2000:]
    audit = json.loads([l for l in ex.stdout.splitlines()
                        if l.startswith("{")][-1])
    assert audit["rows_exported"] == n_match

    # whole-corpus dump re-ingests as a valid corpus dir
    full_dir = str(tmp_path / "full")
    full = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "export.py"),
         "--local-cpus", "2", "--index", out, "--output", full_dir,
         "--columns", "conv_id,turn_idx,role,text,tool,ts"],
        capture_output=True, text=True, cwd=REPO, timeout=300, env=env,
    )
    assert full.returncode == 0, full.stderr[-2000:]
    corpus2 = str(tmp_path / "corpus2")
    ing = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "ingest.py"),
         "--local-cpus", "2", "--input", f"{full_dir}/*.json",
         "--format", "jsonl", "--output", corpus2],
        capture_output=True, text=True, cwd=REPO, timeout=300, env=env,
    )
    assert ing.returncode == 0, ing.stderr[-2000:]
    ing_audit = json.loads([l for l in ing.stdout.splitlines()
                            if l.startswith("{")][-1])
    full_audit = json.loads([l for l in full.stdout.splitlines()
                             if l.startswith("{")][-1])
    assert ing_audit["rows_out"] == full_audit["rows_exported"]
    assert ing_audit["dead_malformed"] == 0

    # zero-match query (ADVICE r4): the job must still exit 0 and print
    # the audit line with rows_exported=0 — the old read-back counting
    # crashed schema inference on the empty JSON dir
    empty_dir = str(tmp_path / "export_empty")
    ze = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "export.py"),
         "--local-cpus", "2", "--index", out, "--output", empty_dir,
         "--query", "zzzznevermatches"],
        capture_output=True, text=True, cwd=REPO, timeout=300, env=env,
    )
    assert ze.returncode == 0, ze.stderr[-2000:]
    zaudit = json.loads([l for l in ze.stdout.splitlines()
                         if l.startswith("{")][-1])
    assert zaudit["rows_exported"] == 0
