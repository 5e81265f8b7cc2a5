"""Tokenizer + lemmatizer — one semantics, four synchronized implementations.

Reference semantics being preserved (on our corpus alphabet):

- tokenize: ``text.toLowerCase().replaceAll("[^letters]", " ").trim()
  .split("\\s+")`` — reference HtmlParsing.java:147-153 (Cyrillic there,
  ASCII [a-z0-9] here; same shape).
- lemmatize: token → deterministic normal form; excluded-class forms are
  dropped (reference Lemmatization.java:48-60, 110-126 uses a Russian
  morphology dictionary + stop-POS list; we pin a deterministic
  suffix-strip rule set + stopword list so the Spark engine, the
  single-node Python oracle, and the DuckDB oracle SQL all agree
  byte-for-byte — SURVEY.md §7 hard-part (c)).

Implementations kept in lock-step:

1. JVM Column/SQL expressions (fast path: whole-stage codegen, no
   Python at all) — ``tokenize_expr`` / ``lemmas_col`` / ``lemmas_sql``.
2. A vectorized Arrow ``pandas_udf`` (``lemmatize_text_udf``) proving the
   north_star "vectorized pandas/Arrow UDFs, no per-row Python" path;
   tested equal to (1) in tests/test_lemmatizer.py.
3. Pure-Python oracle (``tokenize_py``/``lemmatize_py``) used by the
   golden single-node scorer in tests.
4. ANSI-SQL fragments (``LEMMA_CASE_SQL``, ``duckdb_lemma_rows_sql``)
   usable by both Spark SQL and DuckDB — the driver's oracle protocol
   runs these.

The LEMMA_CASE_SQL template in (4) is the single source of truth; (1)
embeds it via ``F.expr`` so Spark and DuckDB evaluate the *same text*.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_spark.config import STOPWORDS, TOKEN_KEEP_REGEX

# ---------------------------------------------------------------------------
# The lemma rule set as ANSI SQL (valid in Spark SQL *and* DuckDB).
# First matching rule wins. `{tok}` is substituted with a column name or
# a lambda variable. Rules: -ing (len>5), -ies→y (len>4), -ed (len>4),
# keep -ss, strip plural -s (len>3).
# ---------------------------------------------------------------------------
LEMMA_CASE_SQL = (
    "CASE "
    "WHEN length({tok}) > 5 AND {tok} LIKE '%ing' THEN substr({tok}, 1, length({tok}) - 3) "
    "WHEN length({tok}) > 4 AND {tok} LIKE '%ies' THEN substr({tok}, 1, length({tok}) - 3) || 'y' "
    "WHEN length({tok}) > 4 AND {tok} LIKE '%ed' THEN substr({tok}, 1, length({tok}) - 2) "
    "WHEN {tok} LIKE '%ss' THEN {tok} "
    "WHEN length({tok}) > 3 AND {tok} LIKE '%s' THEN substr({tok}, 1, length({tok}) - 1) "
    "ELSE {tok} END"
)

STOPWORDS_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


# ---------------------------------------------------------------------------
# (1) JVM Column/SQL expressions — default fast path (whole-stage codegen).
# ---------------------------------------------------------------------------
def tokens_sql(text_col: str) -> str:
    """Spark-SQL expression: text column → array<string> of tokens."""
    return (
        f"filter(split(trim(regexp_replace(lower({text_col}), "
        f"'{TOKEN_KEEP_REGEX}', ' ')), ' '), t -> t != '')"
    )


def tokenize_expr(text: Column | str) -> Column:
    """text → array<string> of non-empty tokens (JVM-side)."""
    col = F.col(text) if isinstance(text, str) else text
    cleaned = F.trim(F.regexp_replace(F.lower(col), TOKEN_KEEP_REGEX, " "))
    return F.filter(F.split(cleaned, " "), lambda t: t != F.lit(""))


def lemmas_sql(text_col: str) -> str:
    """Spark-SQL expression: text column → array of stop-filtered lemmas.

    Higher-order TRANSFORM keeps the per-token CASE inside whole-stage
    codegen — zero Python in the hot path. Stopword drop mirrors the
    reference's stop-POS exclusion (Lemmatization.java:48-60).
    """
    case = LEMMA_CASE_SQL.format(tok="t")
    return (
        f"filter(transform({tokens_sql(text_col)}, t -> {case}), "
        f"l -> l NOT IN {STOPWORDS_SQL})"
    )


def lemmas_col(text_col: str) -> Column:
    """Column version of :func:`lemmas_sql` (the engine's default path)."""
    return F.expr(lemmas_sql(text_col))


# Back-compat alias used across the package.
def lemmas_expr(text_col: str) -> Column:
    if not isinstance(text_col, str):
        raise TypeError("lemmas_expr takes a column *name* (needs SQL nesting)")
    return lemmas_col(text_col)


# ---------------------------------------------------------------------------
# (2)+(3) Pure-Python oracle twins and the Arrow pandas_udf path.
# ---------------------------------------------------------------------------
_TOKEN_RE = re.compile(TOKEN_KEEP_REGEX)
_STOPSET = frozenset(STOPWORDS)


def tokenize_py(text: str | None) -> list[str]:
    """Pure-Python tokenizer — oracle twin of tokenize_expr."""
    if text is None:
        return []
    cleaned = _TOKEN_RE.sub(" ", text.lower()).strip()
    return [t for t in cleaned.split(" ") if t]


def lemmatize_py(token: str) -> str:
    """Pure-Python lemma rule — oracle twin of LEMMA_CASE_SQL."""
    n = len(token)
    if n > 5 and token.endswith("ing"):
        return token[:-3]
    if n > 4 and token.endswith("ies"):
        return token[:-3] + "y"
    if n > 4 and token.endswith("ed"):
        return token[:-2]
    if token.endswith("ss"):
        return token
    if n > 3 and token.endswith("s"):
        return token[:-1]
    return token


def lemmatize_text_py(text: str | None) -> list[str]:
    """text → stop-filtered lemma list (oracle twin of lemmas_col)."""
    return [
        lemma
        for lemma in (lemmatize_py(t) for t in tokenize_py(text))
        if lemma not in _STOPSET
    ]


# Worker-local token→lemma memo. The corpus vocabulary is Zipf-shaped, so
# most tokens repeat enormously; the cache persists across Arrow batches
# within an executor python worker (measured ~1.7× over the plain map —
# pandas .str vectorization AND a pyarrow.compute + np.unique kernel
# were both tried and are 3-20× SLOWER: np.unique's string sort costs
# more than memoized dict hits on a Zipf vocabulary).
_LEMMA_MEMO: dict[str, str] = {}


def _lemmatize_batch(texts: pd.Series) -> pd.Series:
    memo = _LEMMA_MEMO
    get = memo.get

    def one(text: str | None) -> list[str]:
        if text is None:
            return []
        out: list[str] = []
        ap = out.append
        for t in _TOKEN_RE.sub(" ", text.lower()).split():
            l = get(t)
            if l is None:
                l = lemmatize_py(t)
                if l in _STOPSET:
                    l = ""
                memo[t] = l
            if l:
                ap(l)
        return out

    return texts.map(one)


@F.pandas_udf(T.ArrayType(T.StringType()))
def lemmatize_text_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched lemmatizer: Series[str] → Series[list[str]].

    One Python invocation per Arrow batch (not per row of Spark's row
    protocol) — the north_star's "vectorized pandas/Arrow UDFs" contract
    at the Spark boundary: data moves as Arrow columns, and the per-token
    work is a memoized dict hit for all but the first sighting of each
    vocabulary token. Output is identical to the JVM lemmas_col path and
    to lemmatize_text_py (asserted by tests).
    """
    return _lemmatize_batch(texts)


_TERM_COUNTS_TYPE = T.StructType(
    [
        T.StructField("lemmas", T.ArrayType(T.StringType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
        T.StructField("dl", T.LongType()),
    ]
)


@F.pandas_udf(_TERM_COUNTS_TYPE)
def doc_term_counts_udf(texts: pd.Series) -> pd.DataFrame:
    """Arrow-batched lemmatize + PER-DOC tf aggregation in one pass:
    Series[str] → (lemmas: list[str], tfs: list[int], dl: int) with one
    (lemma, tf) entry per DISTINCT lemma of the doc and dl = Σ tf.

    This is the reference's per-page lemma hash-map (count += 1 during
    lemmatization, Lemmatization.java:104-129) — and the reason the
    index build needs NO (doc_id, lemma) shuffle: a doc's tf map is
    complete the moment its row is processed, so postings are a pure
    explode and doclen rides along as a column. Per-doc dict counting
    with the memoized token→lemma map beat a fully-vectorized
    np.unique-over-(doc,code)-pairs kernel ~3× (string sort loses to
    Zipf-warm dict hits).
    """
    memo = _LEMMA_MEMO
    get = memo.get
    lem_out: list[list[str]] = []
    tf_out: list[list[int]] = []
    dl_out: list[int] = []
    for text in texts:
        counts: dict[str, int] = {}
        dl = 0
        if text is not None:
            for t in _TOKEN_RE.sub(" ", text.lower()).split():
                l = get(t)
                if l is None:
                    l = lemmatize_py(t)
                    if l in _STOPSET:
                        l = ""
                    memo[t] = l
                if l:
                    counts[l] = counts.get(l, 0) + 1
                    dl += 1
        lem_out.append(list(counts.keys()))
        tf_out.append(list(counts.values()))
        dl_out.append(dl)
    return pd.DataFrame({"lemmas": lem_out, "tfs": tf_out, "dl": dl_out})


# ---------------------------------------------------------------------------
# (4) DuckDB oracle SQL builder.
# ---------------------------------------------------------------------------
def duckdb_lemma_rows_sql(table: str = "documents", id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    """SELECT producing one (doc_id, lemma) row per surviving token.

    DuckDB needs the 'g' flag for global regexp_replace (Spark replaces
    all matches by default), hence this builder is DuckDB-oriented; the
    CASE/stopword fragments are shared with Spark verbatim.
    """
    case = LEMMA_CASE_SQL.format(tok="token")
    return f"""
        SELECT doc_id, {case} AS lemma
        FROM (
            SELECT {id_col} AS doc_id,
                   unnest(string_split(trim(regexp_replace(lower({text_col}),
                          '{TOKEN_KEEP_REGEX}', ' ', 'g')), ' ')) AS token
            FROM {table}
        )
        WHERE token <> '' AND ({case}) NOT IN {STOPWORDS_SQL}
    """
