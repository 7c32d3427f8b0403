"""Parity for the extended query surface: paging (searchAfter),
minShouldMatch, total hit count, prefix expansion / constant-score sets."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    from lucene_solr_spark.search.engine import SparkSearcher

    idx, _ = small_index
    return SparkSearcher(spark, idx)


def test_search_after_paging(searcher, oracle_small):
    full = oracle_small.search("babe kala", 30, "OR")
    page1 = searcher.search_pdf("babe kala", k=10, mode="OR")
    last = page1.iloc[-1]
    page2 = searcher.search_pdf(
        "babe kala", k=10, mode="OR", after=(np.float32(last["score"]), int(last["docid"]))
    )
    exp2 = full.iloc[10:20]
    np.testing.assert_array_equal(page2["docid"].to_numpy(), exp2["docid"].to_numpy())
    np.testing.assert_array_equal(
        page2["score"].to_numpy(np.float32), exp2["score"].to_numpy(np.float32)
    )
    # oracle paging agrees too
    o2 = oracle_small.search(
        "babe kala", 10, "OR", after=(np.float32(last["score"]), int(last["docid"]))
    )
    np.testing.assert_array_equal(o2["docid"].to_numpy(), exp2["docid"].to_numpy())


def test_min_should_match(searcher, oracle_small):
    q = "babe kala roro"
    for mm in (2, 3):
        res = searcher.search_pdf(q, k=15, mode="OR", min_should_match=mm)
        exp = oracle_small.search(q, 15, "OR", min_should_match=mm)
        np.testing.assert_array_equal(res["docid"].to_numpy(), exp["docid"].to_numpy())
        np.testing.assert_array_equal(
            res["score"].to_numpy(np.float32), exp["score"].to_numpy(np.float32)
        )


def test_total_hit_count(searcher, oracle_small):
    for q, mode in [("babe", "OR"), ("babe kala", "OR"), ("babe kala", "AND"),
                    ("babe -kala", "OR"), ("zzznope", "OR")]:
        assert searcher.count(q, mode) == oracle_small.count(q, mode), (q, mode)


def test_prefix_expansion_and_constant_score(searcher, oracle_small):
    terms_e = searcher.expand_prefix("ba")
    terms_o = oracle_small.expand_prefix("ba")
    assert terms_e == terms_o and len(terms_e) > 2
    ids_e = searcher.matching_docids(terms_e[:5]).toPandas()["docid"].to_numpy()
    ids_o = oracle_small.matching_docids(terms_o[:5])
    np.testing.assert_array_equal(ids_e, ids_o)
