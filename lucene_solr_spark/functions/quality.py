"""IR-quality evaluation (the benchmark module's QualityStats analog:
lucene/benchmark/src/java/org/apache/lucene/benchmark/quality/
QualityStats.java:29-62, TrecJudge.java:32-106).

Given a ranked results relation and a judgments (qrels) relation, computes
per-query precision@k, recall@k and average precision — as pure DataFrame
ops (joins + window cumsums), so the evaluation itself scales with the
result set, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def quality_stats(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query IR metrics.

    results: (query_id, doc_id, rank) — rank 1-based, unique per query.
    qrels:   (query_id, doc_id) — the judged-relevant pairs.

    Returns (query_id, num_rel, hits_at_k, p_at_k, recall_at_k, ap) where
    ap = sum over relevant ranked hits of precision@rank / num_rel
    (QualityStats.getAvp semantics; unranked relevant docs contribute 0).
    """
    rel = qrels.select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d")
    ).distinct()
    nrel = rel.groupBy("__q").agg(F.count("*").alias("num_rel"))
    r = results.select(
        F.col(query_col).alias("__q"),
        F.col(doc_col).alias("__d"),
        F.col(rank_col).alias("__r"),
    )
    hits = r.join(rel.withColumn("__hit", F.lit(1)), ["__q", "__d"], "left")
    w = Window.partitionBy("__q").orderBy("__r")
    hits = hits.withColumn(
        "__cum", F.sum(F.coalesce(F.col("__hit"), F.lit(0))).over(w)
    )
    per_q = (
        hits.groupBy("__q")
        .agg(
            F.sum(
                F.when(F.col("__hit") == 1, F.col("__cum") / F.col("__r"))
            ).alias("__ap_num"),
            F.sum(
                F.when((F.col("__hit") == 1) & (F.col("__r") <= k), 1)
                .otherwise(0)
            ).alias("hits_at_k"),
        )
        .join(nrel, "__q", "right")
        .fillna({"__ap_num": 0.0, "hits_at_k": 0})
    )
    return per_q.select(
        F.col("__q").alias(query_col),
        "num_rel",
        "hits_at_k",
        (F.col("hits_at_k") / F.lit(k)).alias("p_at_k"),
        (F.col("hits_at_k") / F.col("num_rel")).alias("recall_at_k"),
        (F.col("__ap_num") / F.col("num_rel")).alias("ap"),
    )
