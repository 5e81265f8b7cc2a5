"""spark-submit entry point: run queries against a written index — the
CLI analog of the reference's search API (`GET /api/search?query=…&
site=…&offset=…&limit=…`, reference ApiService.java:36-113), so a user
can query an index produced by jobs/build_index.py without writing
code.

Usage:
    spark-submit [--master ...] --py-files engine.zip jobs/search.py \
        --index <index_dir> --query '...' [--engine df|wand|sql|mini|qld|bm25f] \
        [--or] [--prf] [--k 10] [--offset 0] [--window W] \
        [--snippets] [--facets col,col] | --more-like DOC_ID

Engines (the reference's three interchangeable strategies plus the
mini query language):
    df    pure-DataFrame BM25 (operators/query.bm25_topk)
    wand  block-max WAND over compressed segments (operators/wand)
    sql   generated-SQL CTE join (operators/query.bm25_topk_sql)
    mini  composed language: "quoted phrases", -not terms, pre*
          wildcards, OR branches, field:value scopes, free terms

Prints one JSON line per hit: {"doc_id", "score", ...} (with conv_id /
turn_idx / snippet when --snippets). Exit code 2 on an invalid query
(reference 'empty request' error path).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True, help="index dir (write_index output)")
    p.add_argument("--query", default=None)
    p.add_argument("--more-like", type=int, default=None, metavar="DOC_ID",
                   help="rank documents similar to DOC_ID instead of "
                        "searching by --query (reference related-pages)")
    p.add_argument("--span", metavar="'W1 W2'", default=None,
                   help="ordered span proximity (SpanNear inOrder): "
                        "first word followed by the second within "
                        "--slop positions; uses the persisted "
                        "positional table when the index has one "
                        "(build_index --positional), else derives "
                        "positions from the doc store")
    p.add_argument("--slop", type=int, default=2,
                   help="max intervening positions for --span")
    p.add_argument("--context", type=int, default=None, metavar="N",
                   help="print each hit with its +-N surrounding "
                        "conversation turns")
    p.add_argument("--significant", action="store_true",
                   help="print significant terms (ES significant_terms, "
                        "JLH) of the query's match set beside the hits")
    p.add_argument("--histogram", type=int, default=None, metavar="SECONDS",
                   help="print a matching-docs date histogram over the "
                        "transcript ts at the given bucket width")
    p.add_argument("--facets", default=None, metavar="COL[,COL...]",
                   help="also print per-column facet counts over the "
                        "AND-matching docs (one JSON line per facet value)")
    p.add_argument("--field-weights", default=None,
                   help="bm25f engine: query-time field weights, "
                        "e.g. 'title=3,body=1' (index stores tf only)")
    p.add_argument("--engine",
               choices=["df", "wand", "sql", "mini", "qld", "bm25f"],
                   default="df",
                   help="retrieval engine; qld = LM-Dirichlet query "
                        "likelihood ranking (composes with --or)")
    p.add_argument("--or", dest="match_any", action="store_true",
                   help="disjunctive (OR) semantics (df/wand engines)")
    p.add_argument("--prf", action="store_true",
                   help="pseudo-relevance feedback: expand the query "
                        "with the top tf-idf lemmas of the conjunctive "
                        "top-5 and re-rank disjunctively (df engine)")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--offset", type=int, default=0)
    p.add_argument("--snippets", action="store_true",
                   help="join hits back to text and add <b>-wrapped snippets")
    p.add_argument("--suggest", action="store_true",
                   help="print did-you-mean corrections (one JSON line per "
                        "query word whose best dictionary match differs)")
    p.add_argument("--federate", default=None, metavar="DIR[,DIR...]",
                   help="additional shard index dirs: score every shard "
                        "with GLOBAL idf and merge the top-k "
                        "(serving.federated_bm25_topk); df engine only")
    p.add_argument("--count", action="store_true",
                   help="print the total matching-doc count (the "
                        "pagination 'N results' figure) instead of hits")
    p.add_argument("--explain", type=int, default=None, metavar="DOC_ID",
                   help="per-term BM25 breakdown (tf/dl/df/idf/weight) "
                        "of the query against one doc — Lucene explain")
    p.add_argument("--relax", action="store_true",
                   help="relaxation cascade: strict AND, zero hits -> "
                        "OR, still zero -> fuzzy; rows carry a 'stage' "
                        "column (df engine)")
    p.add_argument("--recency", type=float, default=None,
                   metavar="HALF_LIFE_DAYS",
                   help="recency-decayed ranking: BM25 x 2^(-age/half_"
                        "life), age from the turn ts against the "
                        "newest turn in the index (df engine)")
    p.add_argument("--since", default=None, metavar="ISO_DATETIME",
                   help="restrict hits to turns with ts >= this "
                        "(e.g. 2024-03-01 or 2024-03-01T12:00:00)")
    p.add_argument("--until", default=None, metavar="ISO_DATETIME",
                   help="restrict hits to turns with ts < this")
    p.add_argument("--complete", metavar="PREFIX", default=None,
                   help="search-as-you-type: top dictionary "
                        "completions under PREFIX by popularity")
    p.add_argument("--min-match", type=int, default=None, metavar="M",
                   help="minimum_should_match: docs need >= M of the "
                        "query's lemmas (between AND and OR; df engine)")
    p.add_argument("--percolate", metavar="QUERIES_TSV", default=None,
                   help="reverse search: match every stored query in "
                        "the TSV (<id><TAB><query>) against all docs; "
                        "prints (query_id, doc_id, n_matched) lines")
    p.add_argument("--percolate-frac", type=float, default=1.0,
                   help="per-query minimum_should_match fraction for "
                        "--percolate (1.0 = strict AND)")
    p.add_argument("--synonyms", metavar="T=S1|S2;U=V", default=None,
                   help="synonym groups for the df engine (Lucene "
                        "SynonymQuery semantics: each group scores as "
                        "one pseudo-term — tf member-sum, union df): "
                        "'join=merge;fast=quick|rapid'")
    p.add_argument("--collapse", metavar="COL", default=None,
                   help="field collapsing (df engine): one best hit "
                        "per value of the doc column (e.g. conv_id)")
    p.add_argument("--after", metavar="SCORE:DOC_ID", default=None,
                   help="cursor deep paging (df engine): return the k "
                        "results strictly after the (score, doc_id) "
                        "cursor — pass the last row of the previous "
                        "page; flat per-page cost at any depth, unlike "
                        "--offset which re-ranks the whole prefix")
    p.add_argument("--nrt", action="store_true",
                   help="near-real-time: serve uncompacted streamed "
                        "turns with delta-merged dictionary + stats "
                        "(df/wand engines)")
    p.add_argument("--as-of", type=int, default=None, metavar="VERSION",
                   help="time-travel: query the index as of a snapshot "
                        "version (see index_store.list_snapshots)")
    p.add_argument("--local-cpus", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from search_engine_spark.operators.query import (
        bm25_topk,
        bm25_topk_sql,
        enrich_results,
        paginate,
        search,
        snippets,
    )
    from search_engine_spark.operators.wand import wand_topk
    from search_engine_spark.sources.index_store import DiskIndex

    if args.local_cpus:
        from search_engine_spark.session import build_session

        spark = build_session("search", cpus=args.local_cpus)
    else:
        spark = SparkSession.builder.appName("search").getOrCreate()

    if args.percolate is None and args.complete is None and (
        args.span is None
    ) and (
        (args.query is None) == (args.more_like is None)
    ):
        print("exactly one of --query / --more-like is required",
              file=sys.stderr)
        sys.exit(2)

    try:
        disk = DiskIndex(spark, args.index, as_of=args.as_of)
    except ValueError as exc:  # unknown snapshot version
        print(str(exc), file=sys.stderr)
        sys.exit(2)
    ix = disk.as_inverted_index(nrt=args.nrt)
    k = args.offset + args.k  # fetch offset+limit, slice below (O2)

    if args.complete is not None:
        from search_engine_spark.operators.query import complete_prefix

        for r in complete_prefix(ix.terms, args.complete,
                                 n=args.k).collect():
            print(json.dumps({"lemma": r["lemma"], "cf": r["cf"],
                              "df": r["df"]}), flush=True)
        spark.stop()
        return

    if args.span is not None:
        from search_engine_spark.operators.positional import (
            build_positional_postings,
            span_near_search_positional,
        )

        pos = disk.positional
        src = "disk"
        if pos is None:
            pos = build_positional_postings(ix.docs)
            src = "derived"
        res = span_near_search_positional(pos, args.span, slop=args.slop,
                                          k=args.k)
        for r in res.collect():
            print(json.dumps({"doc_id": r["doc_id"],
                              "n_spans": r["n_spans"],
                              "positional": src}), flush=True)
        spark.stop()
        return

    if args.percolate is not None:
        from search_engine_spark.operators.query import percolate
        from search_engine_spark.streaming.alerts import load_stored_queries

        stored = load_stored_queries(args.percolate)
        res = percolate(ix.postings, stored,
                        min_match_frac=args.percolate_frac)
        for r in res.orderBy("query_id", "doc_id").collect():
            print(json.dumps({"query_id": r["query_id"],
                              "doc_id": r["doc_id"],
                              "n_matched": r["n_matched"]}), flush=True)
        spark.stop()
        return

    if args.federate:
        from search_engine_spark.operators.serving import federated_bm25_topk

        if args.more_like is not None or args.engine not in ("df", "wand") \
                or args.prf or args.as_of is not None:
            print("--federate supports --query with the df/wand engines "
                  "only (no --prf; no --as-of — shards are always read "
                  "live)", file=sys.stderr)
            spark.stop()
            sys.exit(2)
        disks = [disk] + [
            DiskIndex(spark, d, as_of=None) for d in args.federate.split(",")
        ]
        if args.engine == "wand":
            from search_engine_spark.operators.serving import (
                federated_wand_topk,
            )

            res = federated_wand_topk(disks, args.query, k=k,
                                      match_all=not args.match_any)
        else:
            res = federated_bm25_topk(disks, args.query, k=k,
                                      match_all=not args.match_any)
        # offset slice driver-side: rows are top-k sized and paginate's
        # doc_id tie-break is blind to the shard namespace
        for r in res.collect()[args.offset:args.offset + args.k]:
            print(json.dumps({"shard": r["shard"], "doc_id": r["doc_id"],
                              "score": r["score"]}), flush=True)
        spark.stop()
        return

    def _die(msg: str) -> None:
        print(msg, file=sys.stderr)
        spark.stop()
        sys.exit(2)

    def _require_valid_query() -> None:
        # keep the documented 'exit 2 on an invalid query' contract on
        # the early-return modes too
        from search_engine_spark.operators.query import parse_query

        if not parse_query(args.query):
            _die("invalid query: no indexable terms")

    # ---- date window: plain df ranking, --recency, --count, --relax
    time_filter = None
    if args.since or args.until:
        from datetime import datetime, timezone

        from search_engine_spark.operators.query import docs_in_time_range

        def _epoch(s: str) -> float:
            dt = datetime.fromisoformat(s)
            if dt.tzinfo is None:  # naive -> UTC (session tz is UTC)
                dt = dt.replace(tzinfo=timezone.utc)
            return dt.timestamp()

        if (args.engine != "df" or args.more_like is not None
                or args.prf or args.after is not None
                or args.synonyms is not None or args.explain is not None):
            _die("--since/--until compose with the plain df engine, "
                 "--recency, --count and --relax only")
        time_filter = docs_in_time_range(
            ix.docs,
            since_epoch_s=_epoch(args.since) if args.since else None,
            until_epoch_s=_epoch(args.until) if args.until else None,
        )

    if args.recency is not None and (
        args.engine != "df" or args.more_like is not None or args.prf
        or args.after is not None or args.synonyms is not None
        or args.count or args.relax or args.explain is not None
    ):
        _die("--recency is a plain-df-engine ranking mode (no --prf/"
             "--after/--synonyms/--count/--relax/--explain)")

    if args.min_match is not None and (
        args.engine != "df" or args.more_like is not None or args.prf
        or args.after is not None or args.synonyms is not None
        or args.count or args.relax or args.explain is not None
        or args.recency is not None or args.match_any
    ):
        _die("--min-match applies to the plain df engine only")

    if args.count and args.query is not None:
        from search_engine_spark.operators.query import (
            count_hits,
            extract_boosts,
        )

        _require_valid_query()
        q, _ = extract_boosts(args.query)  # boosts never change a match set
        n = count_hits(ix, q, match_all=not args.match_any,
                       doc_filter=time_filter).head()["n"]
        print(json.dumps({"n": int(n)}), flush=True)
        spark.stop()
        return

    if args.explain is not None and args.query is not None:
        from search_engine_spark.operators.query import (
            explain_score,
            extract_boosts,
        )

        _require_valid_query()
        q, _ = extract_boosts(args.query)
        for r in explain_score(ix, q, args.explain).collect():
            print(json.dumps(r.asDict()), flush=True)
        spark.stop()
        return

    if args.relax and args.query is not None:
        from search_engine_spark.operators.query import (
            extract_boosts,
            search_relaxed,
        )

        if args.match_any:
            _die("--relax defines its own AND->OR->fuzzy cascade; "
                 "--or does not compose")
        _require_valid_query()
        q, _ = extract_boosts(args.query)
        rows = search_relaxed(
            ix, q, k=args.offset + args.k, doc_filter=time_filter
        ).collect()[args.offset:args.offset + args.k]
        for r in rows:
            print(json.dumps({"doc_id": r["doc_id"], "score": r["score"],
                              "stage": r["stage"]}), flush=True)
        spark.stop()
        return

    if args.more_like is not None:
        from search_engine_spark.operators.query import more_like_this

        res = more_like_this(ix, args.more_like, k=k)
    elif args.engine == "df":
        if args.prf:
            from search_engine_spark.operators.query import prf_search

            res = prf_search(ix, args.query, k=k)
        elif args.after is not None:
            from search_engine_spark.operators.query import bm25_topk_after

            if args.offset:
                print("--after replaces --offset (cursor paging)",
                      file=sys.stderr)
                spark.stop()
                sys.exit(2)
            try:
                s, d = args.after.rsplit(":", 1)
                cur_score, cur_doc = float(s), int(d)
            except ValueError:
                print("--after expects SCORE:DOC_ID", file=sys.stderr)
                spark.stop()
                sys.exit(2)
            res = bm25_topk_after(ix, args.query, cur_score, cur_doc,
                                  k=args.k, match_all=not args.match_any)
        elif args.synonyms is not None:
            from search_engine_spark.operators.query import (
                bm25_topk_synonyms,
            )

            syn = {}
            for grp in args.synonyms.split(";"):
                if not grp.strip():
                    continue
                term, _, mems = grp.partition("=")
                syn[term.strip()] = [m for m in mems.split("|") if m.strip()]
            res = bm25_topk_synonyms(ix, args.query, syn, k=k,
                                     match_all=not args.match_any)
        elif args.recency is not None:
            from pyspark.sql import functions as F

            from search_engine_spark.operators.query import (
                bm25_topk_recency,
                extract_boosts,
            )

            # anchor = newest turn in the index (explicit, reproducible
            # "now" — never wall-clock)
            anchor = ix.docs.agg(
                F.max(F.unix_timestamp("ts"))
            ).head()[0]
            if anchor is None:
                _die("--recency needs at least one indexed turn with ts")
            q, boosts = extract_boosts(args.query)
            res = bm25_topk_recency(
                ix, q, ix.docs.select("doc_id", "ts"),
                float(anchor), half_life_days=args.recency, k=k,
                match_all=not args.match_any, doc_filter=time_filter,
                boosts=boosts or None,
            )
        elif args.collapse is not None:
            from search_engine_spark.operators.query import collapse_topk

            if args.collapse not in ix.docs.columns:
                _die(f"--collapse: no doc column {args.collapse!r}")
            res = collapse_topk(ix, ix.docs, args.query,
                                collapse_col=args.collapse, k=k,
                                match_all=not args.match_any)
            for r in res.collect()[args.offset:args.offset + args.k]:
                print(json.dumps({"group": r["group"],
                                  "doc_id": r["doc_id"],
                                  "score": r["score"]}), flush=True)
            spark.stop()
            return
        else:
            from search_engine_spark.operators.query import extract_boosts

            q, boosts = extract_boosts(args.query)
            res = bm25_topk(ix, q, k=k, match_all=not args.match_any,
                            boosts=boosts or None,
                            doc_filter=time_filter,
                            min_match=args.min_match)
    elif args.engine == "wand":
        if args.nrt:
            from search_engine_spark.operators.serving import nrt_wand_topk

            res = nrt_wand_topk(disk, args.query, k=k,
                                match_all=not args.match_any)
        else:
            from search_engine_spark.operators.query import extract_boosts

            q, boosts = extract_boosts(args.query)
            res = wand_topk(disk.segments, disk.terms, q, k=k,
                            stats=disk.stats, match_all=not args.match_any,
                            boosts=boosts or None)
    elif args.engine == "sql":
        res = bm25_topk_sql(ix, args.query, k=k)
    elif args.engine == "qld":
        from search_engine_spark.operators.query import qld_topk

        res = qld_topk(ix, args.query, k=k, match_all=not args.match_any)
    elif args.engine == "bm25f":
        # field-weighted BM25F from the PERSISTED per-field index
        # (build_index --fields) — lemma-pruned postings scan, no
        # corpus re-tokenize; rank-identical to the corpus-scan pin
        from search_engine_spark.operators.bm25f import bm25f_topk_indexed

        if args.nrt:
            # the field tables describe BASE docs only (same contract
            # as positional): streamed turns are served after
            # compaction rebuilds them — don't silently under-serve
            _die("--nrt serves the df/wand engines; the bm25f field "
                 "index covers compacted base docs only")
        fw = None
        if args.field_weights:
            fw = {}
            for part in args.field_weights.split(","):
                name, _, val = part.partition("=")
                try:
                    fw[name.strip()] = float(val)
                except ValueError:
                    _die(f"--field-weights: bad entry {part!r} "
                         "(want name=float,...)")
        try:
            res = bm25f_topk_indexed(disk, args.query, k=k,
                                     field_weights=fw)
        except FileNotFoundError as exc:
            _die(str(exc))
    else:  # mini language (phrases / -not / groups / free terms)
        try:
            res = search(ix, ix.docs, args.query, k=k)
        except ValueError as exc:
            # grouped-query shapes with no flat form (-(a b), negated
            # scopes/wildcards inside a group) are user errors, not
            # tracebacks — same exit-2 contract as an invalid query
            _die(f"invalid query: {exc}")

    res = res.select("doc_id", "score")
    if args.offset:
        res = paginate(res, offset=args.offset, limit=args.k)
    rows = res.collect()
    if not rows and args.query is not None:
        # distinguish invalid query (reference 'empty request') from a
        # valid query with zero hits
        from search_engine_spark.operators.query import parse_query

        if not parse_query(args.query):
            print("invalid query: no indexable terms", file=sys.stderr)
            spark.stop()
            sys.exit(2)

    if args.suggest and args.query is not None:
        from search_engine_spark.operators.query import suggest_spelling

        for r in suggest_spelling(ix.terms, args.query).collect():
            if r["suggestion"] != r["word"]:
                print(json.dumps({"did_you_mean": r["suggestion"],
                                  **r.asDict()}), flush=True)

    if args.facets and args.query is not None:
        from search_engine_spark.operators.query import parse_query
        from search_engine_spark.operators.serving import facets

        lemmas = parse_query(args.query)
        for col in args.facets.split(","):
            for r in facets(ix.postings, ix.docs, lemmas, col.strip()).collect():
                print(json.dumps({"facet_col": col.strip(), **r.asDict()}),
                      flush=True)

    if args.context is not None and rows:
        from search_engine_spark.operators.serving import (
            conversation_context,
        )

        ctx = conversation_context(
            ix.docs, spark.createDataFrame(rows).select("doc_id"),
            before=args.context, after=args.context,
        )
        for r in ctx.collect():
            print(json.dumps({
                "hit_doc": r["hit_doc"], "offset": r["offset"],
                "doc_id": r["doc_id"], "conv_id": r["conv_id"],
                "turn_idx": r["turn_idx"], "role": r["role"],
                "text": r["text"][:200],
            }), flush=True)

    if args.significant and args.query is not None:
        from search_engine_spark.operators.query import parse_query
        from search_engine_spark.operators.serving import significant_terms

        for r in significant_terms(
            ix.postings, ix.terms, ix.stats.n_docs, parse_query(args.query),
        ).collect():
            print(json.dumps(r.asDict()), flush=True)

    if args.histogram and args.query is not None:
        from search_engine_spark.operators.query import parse_query
        from search_engine_spark.operators.serving import date_histogram

        for r in date_histogram(
            ix.postings, ix.docs.select("doc_id", "ts"),
            parse_query(args.query), interval_s=args.histogram,
        ).collect():
            print(json.dumps(r.asDict()), flush=True)

    if args.snippets and args.query is not None and rows:
        # enrich_results broadcasts the tiny top-k and orders in Spark
        enriched = enrich_results(spark.createDataFrame(rows), ix.docs)
        out = snippets(enriched, args.query).select(
            "doc_id", "conv_id", "turn_idx", "score", "snippet"
        )
        for r in out.collect():
            print(json.dumps(r.asDict()), flush=True)
    else:
        for r in rows:
            print(json.dumps({"doc_id": r["doc_id"], "score": r["score"]}),
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
