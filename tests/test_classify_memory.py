"""Classification (KNN + naive Bayes) and memory-index/percolation."""

import math

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def labeled(spark):
    rows = []
    for i in range(60):
        if i % 2 == 0:
            rows.append({"doc_id": i, "lang": "aa",
                         "text": "spark index merge " + f"w{i % 5}"})
        else:
            rows.append({"doc_id": i, "lang": "bb",
                         "text": "table scan filter " + f"w{i % 5}"})
    return spark.createDataFrame(pd.DataFrame(rows))


def test_naive_bayes_separates_classes(spark, labeled):
    from lucene_solr_spark.functions.classify import (
        naive_bayes_classify,
        naive_bayes_model,
    )

    m = naive_bayes_model(labeled, "lang")
    top_a = naive_bayes_classify(m, ["spark", "index", "merge"]).collect()
    assert top_a[0]["label"] == "aa"
    top_b = naive_bayes_classify(m, ["table", "scan"]).collect()
    assert top_b[0]["label"] == "bb"
    # hand-check one score: P(aa) = 30/60; smoothed loglik of 'spark'|aa
    pdfm = m.toPandas()
    row = pdfm[(pdfm["label"] == "aa") & (pdfm["term"] == "spark")].iloc[0]
    # 30 docs * 4 tokens = 120 class tokens; cnt(spark|aa) = 30
    vocab = pdfm.groupby("term").ngroups
    assert row["loglik"] == pytest.approx(math.log(31 / (120 + vocab)))
    assert row["logprior"] == pytest.approx(math.log(0.5))


def test_knn_classify_votes(spark, small_index, pages_small):
    from lucene_solr_spark.functions.classify import knn_classify
    from lucene_solr_spark.search.engine import SparkSearcher

    idx, _ = small_index
    s = SparkSearcher(spark, idx)
    urls = pages_small["url"].to_numpy()
    rank = np.empty(len(urls), np.int64)
    rank[np.argsort(urls)] = np.arange(len(urls))
    docs = spark.createDataFrame(
        pages_small.assign(doc_id=rank)[["doc_id", "lang", "text"]]
    )
    res = knn_classify(s, docs, pages_small["text"].iloc[0], "lang", 10)
    rows = res.collect()
    assert sum(r["votes"] for r in rows) == 10
    assert rows[0]["votes"] >= rows[-1]["votes"]


def test_memory_index_match_and_score():
    from lucene_solr_spark.search.memory import MemoryIndex

    mi = MemoryIndex("the quick brown fox jumps over the lazy dog")
    assert mi.matches("quick fox")
    assert mi.matches('"quick brown fox"')
    assert not mi.matches('"fox brown"')
    assert not mi.matches("elephant")
    assert mi.matches("+quick +dog")
    assert not mi.matches("+quick +elephant")
    assert mi.score("quick") > 0.0
    assert mi.score("elephant") == 0.0


def test_percolate(spark, labeled):
    from lucene_solr_spark.search.memory import percolate

    res = percolate(
        labeled, ["spark", '"table scan"', "+filter +w1"]
    ).toPandas()
    got = set(zip(res["doc_id"], res["query_id"]))
    # evens contain spark; odds contain the exact phrase 'table scan';
    # q2 = odds with w1 suffix (doc_id % 5 == 1 and odd)
    assert all((d % 2 == 0) for d, q in got if q == 0)
    assert all((d % 2 == 1) for d, q in got if q == 1)
    assert {d for d, q in got if q == 0} == set(range(0, 60, 2))
    assert {d for d, q in got if q == 1} == set(range(1, 60, 2))
    assert {d for d, q in got if q == 2} == {
        d for d in range(60) if d % 2 == 1 and d % 5 == 1
    }


def test_percolate_prefilter_semantics():
    """query_could_match: vocabulary gate never prunes a query that would
    match (no false negatives), prunes obvious dead queries."""
    from lucene_solr_spark.search.memory import query_could_match
    from lucene_solr_spark.search.query import parse_query

    vocab = {"table", "hash", "merge"}
    cases = [
        ("table", True),
        ("zz", False),
        ("table zz", True),          # OR: one live term suffices
        ("+table +zz", False),       # required term missing
        ('"table hash"', True),
        ('"table zz"', False),       # phrase slot missing
        ("-table", True),            # pure must_not: conservative run
        ("(zz qq) table", True),
        ("+(zz qq)", False),         # required group, all dead
    ]
    for q, want in cases:
        assert query_could_match(parse_query(q, "OR"), vocab) == want, q


def test_percolate_with_dead_queries(spark):
    """A large registered set of non-matching queries changes nothing in
    the output (they are pre-filtered, not engine-run)."""
    import pandas as pd

    from lucene_solr_spark.search.memory import percolate

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["table hash", "merge sort"]})
    )
    live = ["table", '"merge sort"']
    dead = [f"deadterm{i}" for i in range(200)]
    res = percolate(docs, live + dead).collect()
    got = {(r["doc_id"], r["query_id"]) for r in res}
    assert got == {(1, 0), (2, 1)}


def test_percolate_multiterm_queries(spark):
    """Wildcard / fuzzy / negated-pattern queries percolate against the
    batch's own vocabulary as the terms dictionary."""
    import pandas as pd

    from lucene_solr_spark.search.memory import percolate

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["table hash join", "tablet stream", "merge sort"],
        })
    )
    qs = ["tab*", "tible~1", "stream -tab*", "+/m.rge/"]
    res = percolate(docs, qs).collect()
    got = {(r["doc_id"], r["query_id"]) for r in res}
    assert got == {
        (1, 0), (2, 0),        # tab* matches table, tablet
        (1, 1),                # tible~1 -> table
        (3, 3),                # regexp merge
        # 'stream -tab*': doc 2 has stream but also tablet -> excluded
    }
