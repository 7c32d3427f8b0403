"""MultiPhraseQuery: per-position alternatives ("a|b c"), engine==oracle
parity, prune identity, sloppy variant (search/MultiPhraseQuery.java)."""

import numpy as np
import pytest

from lucene_solr_spark.search.query import parse_query


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    from lucene_solr_spark.search.engine import SparkSearcher

    idx, _ = small_index
    return SparkSearcher(spark, idx)


def _top_terms(pages, n=4):
    from lucene_solr_spark.analysis import tokenize_series

    flat = tokenize_series(pages["text"].iloc[:300])
    counts = flat.groupby("term", observed=True).size().sort_values()
    return list(counts.index[-n:])


def test_parse_multiphrase():
    q = parse_query('"alpha|beta gamma"~2^3')
    c = q.clauses[0]
    assert c.kind == "phrase"
    assert c.alts == [["alpha", "beta"], ["gamma"]]
    assert c.terms == ["alpha", "beta", "gamma"]
    assert c.offsets == [0, 1]
    assert c.slop == 2 and c.boost == 3.0
    # single-slot single-alt collapses to a term clause
    assert parse_query('"alpha|alpha"').clauses[0].kind == "term"


def test_multiphrase_parity(searcher, oracle_small, pages_small):
    t1, t2, t3, t4 = _top_terms(pages_small)
    for q in (
        f'"{t1}|{t2} {t3}"',
        f'"{t3} {t1}|{t4}"',
        f'"{t1}|{t2} {t3}|{t4}"~3',
        f'"{t1}|{t2} {t3}" {t4}',
    ):
        res = searcher.search_pdf(q, k=10, mode="OR")
        exp = oracle_small.search(q, 10, "OR")
        np.testing.assert_array_equal(
            res["docid"].to_numpy(), exp["docid"].to_numpy(), err_msg=q
        )
        np.testing.assert_array_equal(
            res["score"].to_numpy(np.float32),
            exp["score"].to_numpy(np.float32), err_msg=q,
        )
        assert len(res) > 0, f"fixture query {q} matched nothing"


def test_multiphrase_superset_of_plain(searcher, oracle_small, pages_small):
    """'a|b c' matches at least the union of 'a c' and 'b c'."""
    t1, t2, t3, _ = _top_terms(pages_small)
    multi = set(
        searcher.search_pdf(f'"{t1}|{t2} {t3}"', k=3000)["docid"].tolist()
    )
    a = set(searcher.search_pdf(f'"{t1} {t3}"', k=3000)["docid"].tolist())
    b = set(searcher.search_pdf(f'"{t2} {t3}"', k=3000)["docid"].tolist())
    assert multi == a | b


def test_multiphrase_prune_parity(searcher, pages_small):
    t1, t2, t3, t4 = _top_terms(pages_small)
    q = f'"{t1}|{t2} {t3}" {t4} roro'
    on = searcher.search_pdf(q, k=10, prune=True)
    off = searcher.search_pdf(q, k=10, prune=False)
    np.testing.assert_array_equal(on["docid"].to_numpy(), off["docid"].to_numpy())
    np.testing.assert_array_equal(
        on["score"].to_numpy(np.float32), off["score"].to_numpy(np.float32)
    )


def test_multiphrase_missing_alternative(searcher, pages_small):
    """An alternative absent from the index must not kill the slot."""
    t1, t2, t3, _ = _top_terms(pages_small)
    with_missing = searcher.search_pdf(f'"{t1}|zzzznotaword {t3}"', k=3000)
    plain = searcher.search_pdf(f'"{t1} {t3}"', k=3000)
    np.testing.assert_array_equal(
        with_missing["docid"].to_numpy(), plain["docid"].to_numpy()
    )
