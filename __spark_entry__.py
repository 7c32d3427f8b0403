"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query: build (resumably) the segment inverted
                  index over the sf0.001 documents table and run a top-10
                  disjunctive BM25 query through the full engine.
queries()      -> one entry per implemented operator (SURVEY.md §2 +
                  training-data-pipeline ops); see lucene_solr_spark/plans/gate.py.
oracle_sql()   -> matching ANSI-SQL (DuckDB) oracle per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lucene_solr_spark.plans import gate


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: segment-index build + top-k BM25 on sf0.001."""
    return gate.queries()["bm25_or_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return gate.queries()


def oracle_sql() -> dict[str, str]:
    return gate.oracle_sql()
