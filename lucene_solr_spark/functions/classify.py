"""Classification over the corpus/index — the lucene/classification module
restated (declared out-of-scope in round 1; reachable now that MLT and the
token relation exist).

- KNN: KNearestNeighborClassifier.java runs a MoreLikeThis query and votes
  over the top-k neighbors' class field — here literally
  SparkSearcher.more_like_this + a label join + majority vote.
- Naive Bayes: SimpleNaiveBayesClassifier.java scores
  log P(c) + sum_t tf_d(t) * log P(t|c) with add-one smoothing from index
  term statistics per class — here two aggregations over the token
  relation (per-class priors + per-(class, term) likelihoods), then one
  join against the document's terms. Everything is DataFrame-native; the
  likelihood table is a per-class dictionary aggregate that at 100 TB is
  computed once and persisted like the IVF centroids.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from .sqltext import tokens


def knn_classify(
    searcher,
    docs: DataFrame,
    seed_text: str,
    label_col: str = "lang",
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """KNearestNeighborClassifier: MLT top-k neighbors vote on the label.
    Returns (label, votes) rows, winner first (ties: label asc)."""
    top = searcher.more_like_this(seed_text, k=k).select(
        F.col("docid").alias(id_col)
    )
    return (
        docs.join(F.broadcast(top), id_col)
        .groupBy(F.col(label_col).alias("label"))
        .agg(F.count("*").alias("votes"))
        .orderBy(F.desc("votes"), "label")
    )


def naive_bayes_model(docs: DataFrame, label_col: str = "lang") -> DataFrame:
    """Per-(label, term) add-one-smoothed log likelihoods + per-label log
    priors — the SimpleNaiveBayesClassifier statistics as one table.
    Columns: label, term, loglik, logprior, vocab (for unseen-term mass)."""
    toks = tokens(docs).join(
        docs.select("doc_id", F.col(label_col).alias("label")), "doc_id"
    )
    vocab_size = toks.select("term").distinct().count()
    n_docs = docs.count()
    class_tokens = toks.groupBy("label").agg(F.count("*").alias("n_tok"))
    class_docs = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_docs")
    )
    term_counts = toks.groupBy("label", "term").agg(F.count("*").alias("cnt"))
    return (
        term_counts.join(class_tokens, "label")
        .join(class_docs, "label")
        .select(
            "label",
            "term",
            F.log(
                (F.col("cnt") + 1.0)
                / (F.col("n_tok") + F.lit(float(vocab_size)))
            ).alias("loglik"),
            F.log(F.col("n_docs") / F.lit(float(n_docs))).alias("logprior"),
            (F.col("n_tok") + F.lit(float(vocab_size))).alias("denom"),
        )
    )


def naive_bayes_classify(
    model: DataFrame, seed_terms: list[str]
) -> DataFrame:
    """Score each label for a bag of analyzed terms:
    logprior + sum over seed terms of loglik (unseen terms contribute the
    smoothed log(1/denom) mass). Returns (label, score_milli) best first."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    seed = spark.createDataFrame(
        [(t,) for t in seed_terms], "term string"
    ).groupBy("term").agg(F.count("*").alias("tf"))
    per_label = model.select("label", "logprior", "denom").distinct()
    n_seed = spark.createDataFrame([(len(seed_terms),)], "n long")
    matched = (
        seed.join(model, "term")
        .groupBy("label")
        .agg(
            F.sum(F.col("tf") * F.col("loglik")).alias("s_matched"),
            F.sum("tf").alias("tf_matched"),
        )
    )
    return (
        per_label.join(matched, "label", "left")
        .crossJoin(n_seed)
        .select(
            "label",
            F.round(
                (
                    F.col("logprior")
                    + F.coalesce(F.col("s_matched"), F.lit(0.0))
                    # unseen seed terms: add-one mass log(1/denom) each
                    + (F.col("n") - F.coalesce(F.col("tf_matched"), F.lit(0)))
                    * -F.log(F.col("denom"))
                )
                * 1000
            )
            .cast("long")
            .alias("score_milli"),
        )
        .orderBy(F.desc("score_milli"), "label")
    )
