"""search_engine_spark — a PySpark-native inverted-index + BM25 engine.

Brand-new engine with the query/data-processing capabilities of the
reference (mets-media/search-engine: a Java/Spring crawler + PostgreSQL
inverted index + lemma-intersection relevance search), re-expressed
Spark-first:

- input: tables of multi-turn conversation/agent transcripts
  (conv_id, turn_idx, role, text, tool, ts) — the reference's ``page``
  document store analog (reference entity/Page.java:19-41)
- index build: vectorized tokenize/lemmatize → explode → salted
  aggregations → delta+varbyte compressed posting segments with
  per-block max-score metadata (reference ``lemma``/``index`` tables,
  entity/Lemma.java:14-27, entity/Index.java:12-24)
- query: BM25 / reference-formula top-k via either a pure-DataFrame
  scorer (Catalyst-optimized joins+aggs) or a block-max WAND scorer
  over compressed segments (reference SearchService.java:53-131's three
  equivalent strategies → our two differential engines)

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the reference repo's observable behavior, and published IR
literature (varbyte/delta postings, block-max WAND, BM25).
"""

__version__ = "0.1.0"
