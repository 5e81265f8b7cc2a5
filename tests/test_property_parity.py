"""Property-based cross-engine parity for the oracle FOUNDATIONS.

Every DuckDB oracle in __spark_entry__.py stands on two primitives
being byte-identical across engines: (1) the tokenize → lemma-CASE →
stopword-filter stream, and (2) the portable 60-bit md5-prefix bucket
hash. The golden tests pin them on fixtures; these hypothesis tests
pin them on RANDOM inputs — whitespace runs, unicode junk, digits,
suffix-rule boundary lengths — by running the ENTRY MODULE'S OWN SQL
templates in DuckDB against the python twins (no Spark session: the
Spark expressions share these templates via text.py's single-source
SQL, which the existing 4-way lemmatizer equality test pins)."""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry  # noqa: E402  (the oracle templates)

from search_engine_spark.functions.text import (  # noqa: E402
    LEMMA_CASE_SQL,
    STOPWORDS_SQL,
    lemmatize_text_py,
    tokenize_py,
)
from search_engine_spark.operators.sampling import (  # noqa: E402
    SPLIT_BUCKETS,
    split_bucket_sql_duckdb,
)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _duck_lemmas(con, text: str) -> list[str]:
    case = LEMMA_CASE_SQL.format(tok="t")
    sql = (
        f"SELECT list_filter(list_transform({entry._TOKS}, t -> {case}), "
        f"l -> l NOT IN {STOPWORDS_SQL}) FROM (SELECT ? AS text)"
    )
    out = con.execute(sql, [text]).fetchone()[0]
    return list(out) if out is not None else []


def _duck_tokens(con, text: str) -> list[str]:
    out = con.execute(
        f"SELECT {entry._TOKS} FROM (SELECT ? AS text)", [text]
    ).fetchone()[0]
    return list(out) if out is not None else []


# text shaped like real transcripts AND adversarial: words with
# digits/punct glued on, suffix-rule boundary lengths (the CASE arms
# fire on length thresholds 3/4/5), unicode junk, whitespace runs
_word = st.from_regex(r"[A-Za-z0-9]{1,9}(ing|ies|ed|ss|s)?", fullmatch=True)
_junk = st.sampled_from(
    ["  ", "\t", "\n", "--", "!!", "…", "№", ".", ",", "¡™£", "'s"]
)
_texts = st.lists(st.one_of(_word, _junk), min_size=0, max_size=30).map(
    " ".join
)


@settings(max_examples=300, deadline=None)
@given(_texts)
def test_tokenizer_python_equals_duckdb(con, text):
    assert tokenize_py(text) == _duck_tokens(con, text)


@settings(max_examples=300, deadline=None)
@given(_texts)
def test_lemma_stream_python_equals_duckdb(con, text):
    assert lemmatize_text_py(text) == _duck_lemmas(con, text)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=2**62),
       st.sampled_from(["split0", "sample0", "resample0", "zz"]))
def test_md5_bucket_python_equals_duckdb(con, doc_id, seed):
    py = int(
        hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:15], 16
    ) % SPLIT_BUCKETS
    sql = split_bucket_sql_duckdb("doc_id", seed)
    duck = con.execute(
        f"SELECT {sql} FROM (SELECT ? AS doc_id)", [doc_id]
    ).fetchone()[0]
    assert py == int(duck)
