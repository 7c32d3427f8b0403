"""Rank-identity gate: Spark engine == pandas oracle, top-k ids AND float32
scores bit-for-bit (BASELINE.md row 3; tie-break HitQueue.java:76-81)."""

import numpy as np
import pandas as pd
import pytest

QUERIES = [
    # (query, mode, k) — shapes from FIXTURES.md §2 (EnwikiQueryMaker-style)
    ("babe", "OR", 10),
    ("babe kala", "OR", 10),
    ("babe kala roro zuzu", "OR", 10),
    ("babe kala", "AND", 10),
    ("the and of", "OR", 10),          # stopwords only -> empty
    ("babe babe", "OR", 10),           # duplicate clause scores twice
    ("nonexistentterm999", "OR", 10),
    ("babe nonexistentterm999", "AND", 10),  # required missing term -> empty
    ("babe -kala", "OR", 10),
    ("+babe kala", "OR", 10),
    ("babe", "OR", 1),
    ("babe", "OR", 100),
]


def _vocab_queries(pages):
    """Pick real corpus terms of varied df for query building."""
    from lucene_solr_spark.analysis import tokenize_series

    flat = tokenize_series(pages["text"].iloc[:500])
    counts = flat.groupby("term").size().sort_values()
    terms = counts.index.to_numpy()
    rare, mid, head = terms[2], terms[len(terms) // 2], terms[-1]
    return [
        (f"{head}", "OR", 10),
        (f"{head} {mid}", "OR", 10),
        (f"{head} {mid} {rare}", "OR", 10),
        (f"{head} {mid}", "AND", 10),
        (f"{head} {mid} {rare}", "AND", 10),
        (f"{mid} -{head}", "OR", 10),
        (f'"{head} {mid}"', "OR", 10),  # phrase (may be empty, still must agree)
        (f"{head}", "OR", 25),
    ]


def _assert_identical(res_engine: pd.DataFrame, res_oracle: pd.DataFrame, q):
    assert len(res_engine) == len(res_oracle), (q, len(res_engine), len(res_oracle))
    np.testing.assert_array_equal(
        res_engine["docid"].to_numpy(), res_oracle["docid"].to_numpy(), err_msg=str(q)
    )
    np.testing.assert_array_equal(
        res_engine["score"].to_numpy(np.float32),
        res_oracle["score"].to_numpy(np.float32),
        err_msg=str(q),
    )


@pytest.mark.parametrize("query,mode,k", QUERIES)
def test_fixed_queries(spark, small_index, oracle_small, query, mode, k):
    from lucene_solr_spark.search.engine import SparkSearcher

    idx, _ = small_index
    s = SparkSearcher(spark, idx)
    _assert_identical(
        s.search_pdf(query, k=k, mode=mode), oracle_small.search(query, k, mode), (query, mode, k)
    )


def test_corpus_derived_queries(spark, small_index, oracle_small, pages_small):
    from lucene_solr_spark.search.engine import SparkSearcher

    idx, _ = small_index
    s = SparkSearcher(spark, idx)
    for query, mode, k in _vocab_queries(pages_small):
        _assert_identical(
            s.search_pdf(query, k=k, mode=mode),
            oracle_small.search(query, k, mode),
            (query, mode, k),
        )


def test_pruning_does_not_change_results(spark, small_index, oracle_small, pages_small):
    from lucene_solr_spark.search.engine import SparkSearcher

    idx, _ = small_index
    s = SparkSearcher(spark, idx)
    for query, mode, k in _vocab_queries(pages_small)[:4]:
        a = s.search_pdf(query, k=k, mode=mode, prune=True)
        b = s.search_pdf(query, k=k, mode=mode, prune=False)
        pd.testing.assert_frame_equal(a, b)


def test_docids_are_lexicographic_url_rank(spark, small_index, pages_small):
    from lucene_solr_spark.search.engine import SparkSearcher

    idx, _ = small_index
    s = SparkSearcher(spark, idx)
    dm = s.docmap().orderBy("docid").toPandas()
    urls_sorted = np.sort(pages_small["url"].to_numpy())
    np.testing.assert_array_equal(dm["url"].to_numpy(), urls_sorted)
    np.testing.assert_array_equal(dm["docid"].to_numpy(), np.arange(len(urls_sorted)))
