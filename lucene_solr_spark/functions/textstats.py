"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

These are the training-data-pipeline companions to the index: every one is
a scan-side expression pipeline (no shuffle except final small aggregations)
built from F.* built-ins, so the ANSI-SQL oracle reproduces them exactly.
Fingerprinting follows Solr's Signature/TextProfileSignature idea
(solr/core/src/java/org/apache/solr/update/processor/TextProfileSignature.java):
a canonicalized digest of the token profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sqltext import STOPWORDS, TOKEN_PATTERN, tokens


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens, analyzer tokens, distinct terms, stopword count."""
    toks_all = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
    stop_arr = F.array([F.lit(w) for w in STOPWORDS])
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("ws_tokens"),
        F.size(toks_all).alias("n_tokens"),
        F.size(F.array_distinct(toks_all)).alias("n_distinct"),
        F.size(F.filter(toks_all, lambda t: F.array_contains(stop_arr, t))).alias(
            "n_stop"
        ),
    ).orderBy("doc_id")


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality: mean word length, type/token ratio, stopword rate.

    quality_milli = round(1000 * (0.4*clamp(mwl/8) + 0.3*ttr + 0.3*stoprate*4))
    — integer output, engine-portable.
    """
    t = token_counts(docs, text_col)
    chars = docs.select("doc_id", F.length(text_col).alias("n_chars_calc"))
    j = t.join(chars, "doc_id")
    mwl = F.col("n_chars_calc") / F.greatest(F.col("n_tokens"), F.lit(1))
    ttr = F.col("n_distinct") / F.greatest(F.col("n_tokens"), F.lit(1))
    stoprate = F.col("n_stop") / F.greatest(F.col("n_tokens"), F.lit(1))
    q = (
        F.lit(0.4) * F.least(mwl / 8.0, F.lit(1.0))
        + F.lit(0.3) * ttr
        + F.lit(0.3) * F.least(stoprate * 4.0, F.lit(1.0))
    )
    return j.select(
        "doc_id",
        "n_tokens",
        F.round(q * 1000).cast("long").alias("quality_milli"),
    ).orderBy("doc_id")


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram-free heuristic language ID: English stopword density.

    guess = 'en' if >= 8% of tokens are English stopwords else 'other'
    (a real system plugs a character-n-gram model into the same shape).
    """
    toks_all = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
    stop_arr = F.array([F.lit(w) for w in STOPWORDS])
    n_all = F.size(toks_all)
    n_stop = F.size(F.filter(toks_all, lambda t: F.array_contains(stop_arr, t)))
    ratio_milli = F.round(F.lit(1000.0) * n_stop / F.greatest(n_all, F.lit(1))).cast("long")
    return docs.select(
        "doc_id",
        ratio_milli.alias("stop_milli"),
        F.when(ratio_milli >= 80, "en").otherwise("other").alias("lang_guess"),
    ).orderBy("doc_id")


def fingerprint(docs: DataFrame) -> DataFrame:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    term profile (TextProfileSignature shape)."""
    t = tokens(docs)
    return (
        t.groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("term")).alias("terms"))
        .select(
            "doc_id",
            F.substring(F.md5(F.concat_ws(" ", "terms")), 1, 16).alias("sig"),
        )
        .orderBy("doc_id")
    )
