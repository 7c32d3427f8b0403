"""End-to-end training-data curation pipeline over a web-text corpus.

The 100 TB flagship flow: quality filter -> language filter -> exact
dedup -> near-dup removal -> per-source summary, composed from the
scan-side operators in textstats/dedup. Shuffle budget: the exact-dedup
signature groupBy, the LSH band-bucket join, and the final summary
groupBy — everything else is scan-side column arithmetic.

Reference precedent: Solr's SignatureUpdateProcessorFactory collapses on
content signatures (solr/core/src/java/org/apache/solr/update/processor/
SignatureUpdateProcessorFactory.java); the quality/langid/minhash menu is
the standard Common-Crawl curation recipe restated as DataFrame plans.

Determinism rules (what makes the SQL oracle exact):
  - exact dedup keeps the LOWEST doc_id of each identical-text group
  - near-dup removal drops the HIGHER doc_id (doc_b) of every LSH
    candidate pair — greedy and order-free
  - the gate profile uses the md5 LSH variant; production swaps in
    dedup.lsh_candidate_pairs_np (same shape, vectorized hashes + bucket
    cap) via the ``pairs_fn`` hook
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import dedup as D
from . import textstats as X


def curate_docids(
    docs: DataFrame,
    min_quality_milli: int = 450,
    lang: str = "en",
    text_col: str = "text",
    pairs_fn=None,
) -> DataFrame:
    """Surviving (doc_id, n_tokens) after the full curation pipeline."""
    q = X.quality_score(docs)  # (doc_id, n_tokens, quality_milli)
    l = X.lang_id(docs)  # (doc_id, stop_milli, lang_guess)
    keep = (
        q.join(l, "doc_id")
        .where(
            (F.col("quality_milli") >= min_quality_milli)
            & (F.col("lang_guess") == lang)
        )
        .select("doc_id", "n_tokens")
    )
    # exact dedup: keep the lowest doc_id per content signature
    sig = docs.select("doc_id", F.md5(F.col(text_col)).alias("sig"))
    first = sig.groupBy("sig").agg(F.min("doc_id").alias("keep_doc"))
    keep = (
        keep.join(sig, "doc_id")
        .join(first, "sig")
        .where(F.col("doc_id") == F.col("keep_doc"))
        .select("doc_id", "n_tokens")
    )
    # near-dup: drop the higher side of every candidate pair
    pairs = (pairs_fn or D.lsh_candidate_pairs_md5)(docs)
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return keep.join(drop, "doc_id", "left_anti")


def curation_summary(
    docs: DataFrame,
    min_quality_milli: int = 450,
    lang: str = "en",
    group_col: str = "source",
    **kw,
) -> DataFrame:
    """Per-``group_col`` survivor counts + token totals (the curated-corpus
    manifest row a 100 TB pipeline emits per shard)."""
    ids = curate_docids(docs, min_quality_milli, lang, **kw)
    return (
        docs.join(ids, "doc_id")
        .groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        .orderBy("grp")
    )
