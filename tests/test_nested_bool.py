"""Nested boolean queries (parenthesized groups): parser shape, engine ==
oracle rank/score identity, required groups, boosts, mm inside groups,
wildcards inside groups, fq with groups."""

import numpy as np
import pytest

from lucene_solr_spark.search.query import parse_query


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    from lucene_solr_spark.search.engine import SparkSearcher

    idx, _ = small_index
    return SparkSearcher(spark, idx)


def test_parse_groups():
    q = parse_query('(merge window)^2 +(dup "table hash") batch')
    assert [c.kind for c in q.clauses] == ["bool", "bool", "term"]
    assert q.clauses[0].boost == 2.0 and not q.clauses[0].required
    assert q.clauses[1].required
    assert [c.kind for c in q.clauses[1].sub.clauses] == ["term", "phrase"]
    assert sorted(q.all_terms) == ["batch", "dup", "hash", "merge", "table", "window"]
    with pytest.raises(ValueError):
        parse_query("-(a b)")


def test_flat_group_identity(searcher, oracle_small):
    """A boost-1 OR group is score-identical to the flattened query
    (sum associativity holds in float32 with zero-start accumulators)."""
    flat = searcher.search_pdf("babe roro babaso", k=10)
    grouped = searcher.search_pdf("(babe roro) babaso", k=10)
    np.testing.assert_array_equal(flat["docid"].to_numpy(), grouped["docid"].to_numpy())
    np.testing.assert_array_equal(
        flat["score"].to_numpy(np.float32), grouped["score"].to_numpy(np.float32)
    )


@pytest.mark.parametrize("q", [
    "(babe roro) babaso",
    "+(babe roro) babaso",
    "(babe roro)^2 babaso",
    "+(babe +roro) babaso",
    "(babe (roro babaso))^3 babe",
    "(babe -roro) babaso",
])
def test_nested_engine_oracle_parity(searcher, oracle_small, q):
    res = searcher.search_pdf(q, k=10, mode="OR")
    exp = oracle_small.search(q, 10, "OR")
    np.testing.assert_array_equal(
        res["docid"].to_numpy(), exp["docid"].to_numpy(), err_msg=q
    )
    np.testing.assert_array_equal(
        res["score"].to_numpy(np.float32), exp["score"].to_numpy(np.float32),
        err_msg=q,
    )
    assert len(res) > 0, f"fixture query {q} matched nothing"


def test_required_group_semantics(searcher, oracle_small):
    """+(a b): doc must match the group (a OR b)."""
    res = searcher.search_pdf("+(babe roro) babaso", k=5000)
    a = set(oracle_small.search("babe", 5000)["docid"])
    b = set(oracle_small.search("roro", 5000)["docid"])
    assert set(res["docid"]) == a | b


def test_group_with_wildcard(searcher):
    """Wildcard rewrite recurses into groups."""
    res = searcher.search_pdf("+(babe ro*) babaso", k=100)
    assert len(res) > 0
    on = searcher.search_pdf("(babe ro*) babaso", k=10, prune=True)
    off = searcher.search_pdf("(babe ro*) babaso", k=10, prune=False)
    np.testing.assert_array_equal(on["docid"].to_numpy(), off["docid"].to_numpy())


def test_group_as_fq(searcher, oracle_small):
    """fq with a group: filter docs matching (babe OR roro) AND babaso."""
    res = searcher.search_pdf("babe", k=5000, fq="+(babe roro) +babaso")
    a = set(oracle_small.search("babe", 5000)["docid"])
    b = set(oracle_small.search("roro", 5000)["docid"])
    c = set(oracle_small.search("babaso", 5000)["docid"])
    assert set(res["docid"]) == a & ((a | b) & c)


def test_group_count_and_explain(searcher, oracle_small):
    q = "(babe roro)^2 babaso"
    assert searcher.count(q) == oracle_small.count(q)
    res = searcher.search_pdf(q, k=3)
    for _, r in res.iterrows():
        ex = searcher.explain(q, int(r["docid"]))
        assert np.float32(ex["total"]) == np.float32(r["score"]), r
