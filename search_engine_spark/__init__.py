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
- query: BM25 / reference-formula top-k via THREE differential engines
  (pure-DataFrame scorer, block-max WAND over compressed tf/dl
  segments, generated-SQL CTE join) — the reference's own 3-strategy
  equivalence harness (SearchService.java:53-131,
  SearchComponent.java:450-551) rebuilt on Spark
- beyond the reference: training-data-pipeline operators (exact /
  MinHash-LSH / SimHash / n-gram-Jaccard dedup, SRP-LSH + IVF ANN,
  text quality/langid/fingerprints, multimodal binary columns,
  dead-letter input gating, stateful conversation sessionization)

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the reference repo's observable behavior, and published IR
literature (varbyte/delta postings, block-max WAND, BM25).
"""

__version__ = "0.2.0"
