"""Simple-analyzer token relation shared by the Solr-component analogs.

This is the SQL-expressible profile of the analyzer chain: lowercase +
``[a-z0-9]+`` extraction + the 33-word stop filter with position-gap
semantics (positions are assigned before stop removal,
util/FilteringTokenFilter.java:52-58). On ASCII corpora it coincides with
the full chain in analysis/text.py; it exists so that every gate query has
an exactly-equivalent ANSI-SQL oracle.

All heavy lifting is plain DataFrame ops (explode + groupBy) — JVM-side,
whole-stage-codegen'd, and partition-parallel; at 100 TB the tokens
relation is never materialized, Catalyst pipelines it into each consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..analysis import ENGLISH_STOP_WORDS

STOPWORDS = sorted(ENGLISH_STOP_WORDS)
TOKEN_PATTERN = "[a-z0-9]+"


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
           keep_stop: bool = False) -> DataFrame:
    """(id, term, pos) token relation; pos counts pre-stop-filter positions."""
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
        ).alias("pos", "term"),
    )
    if not keep_stop:
        t = t.where(~F.col("term").isin(STOPWORDS))
    return t


def doc_lengths(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, dl): post-stop token count per doc (the BM25 norm length)."""
    return (
        tokens(docs, id_col, text_col)
        .groupBy("doc_id")
        .agg(F.count("*").alias("dl"))
    )


def _sql_quote(w: str) -> str:
    # double any embedded single quote (SQL string-literal escaping);
    # stop lists are caller-supplied, e.g. the French list carries
    # elision forms in some Solr schemas
    return "'" + w.replace("'", "''") + "'"


def sql_stoplist() -> str:
    return ", ".join(_sql_quote(w) for w in STOPWORDS)


def sql_tokens_cte(table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text",
                   stopwords=None) -> str:
    """DuckDB CTE producing the identical (doc_id, term, pos) relation.
    ``stopwords`` overrides the English stop set (e.g. a Snowball
    analyzer's language list, or () for no stop filtering)."""
    if stopwords is None:
        stop_sql = sql_stoplist()
    else:
        stop_sql = ", ".join(_sql_quote(w) for w in sorted(stopwords)) or "''"
    return f"""
toks_all AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}')) AS term,
         generate_subscripts(regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}'), 1) - 1 AS pos
  FROM {table}
),
toks AS (
  SELECT * FROM toks_all WHERE term NOT IN ({stop_sql})
)"""
