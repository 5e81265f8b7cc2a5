from search_engine_spark.functions.text import (  # noqa: F401
    LEMMA_CASE_SQL,
    STOPWORDS_SQL,
    duckdb_lemma_rows_sql,
    lemmas_col,
    lemmas_expr,
    lemmas_sql,
    lemmatize_py,
    lemmatize_text_py,
    lemmatize_text_udf,
    tokenize_expr,
    tokenize_py,
    tokens_sql,
)
