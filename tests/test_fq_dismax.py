"""Filter-query composition (Solr fq / FilteredQuery) + DisMax through the
engine: brute-force parity and prune on/off identity."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    from lucene_solr_spark.search.engine import SparkSearcher

    idx, _ = small_index
    return SparkSearcher(spark, idx)


def _scores(oracle, term):
    df = oracle.search(term, 5000, "OR")
    return dict(zip(df["docid"], df["score"].astype(np.float32)))


def test_fq_restricts_before_scoring(searcher, oracle_small):
    """search('babe', fq='roro'): BM25('babe') over docs containing roro;
    scores must equal the UNfiltered babe scores (fq adds nothing)."""
    babe = _scores(oracle_small, "babe")
    roro = set(_scores(oracle_small, "roro"))
    expected = sorted(
        ((d, s) for d, s in babe.items() if d in roro),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    res = searcher.search_pdf("babe", k=10, fq="roro")
    np.testing.assert_array_equal(
        res["docid"].to_numpy(), np.array([d for d, _ in expected])
    )
    np.testing.assert_array_equal(
        res["score"].to_numpy(np.float32),
        np.array([s for _, s in expected], np.float32),
    )


def test_fq_and_semantics(searcher, oracle_small):
    """fq string parses with AND semantics: all fq terms required."""
    babe = _scores(oracle_small, "babe")
    f1 = set(_scores(oracle_small, "roro"))
    f2 = set(_scores(oracle_small, "babaso"))
    keep = f1 & f2
    expected = {d for d in babe if d in keep}
    res = searcher.search_pdf("babe", k=5000, fq="roro babaso")
    assert set(res["docid"].tolist()) == expected


def test_fq_pure_negative(searcher, oracle_small):
    """fq='-roro' = everything except roro docs (Solr top-level-negative)."""
    babe = _scores(oracle_small, "babe")
    roro = set(_scores(oracle_small, "roro"))
    expected = {d for d in babe if d not in roro}
    res = searcher.search_pdf("babe", k=5000, fq="-roro")
    assert set(res["docid"].tolist()) == expected


def test_fq_prune_parity(searcher):
    """MaxScore pruning must stay exact under fq (the filter is applied
    before the threshold sees any score)."""
    for q, fq in [("babe roro", "babaso"), ("babe babaso", "-roro")]:
        on = searcher.search_pdf(q, k=10, mode="OR", prune=True, fq=fq)
        off = searcher.search_pdf(q, k=10, mode="OR", prune=False, fq=fq)
        np.testing.assert_array_equal(
            on["docid"].to_numpy(), off["docid"].to_numpy(), err_msg=f"{q} fq={fq}"
        )
        np.testing.assert_array_equal(
            on["score"].to_numpy(np.float32), off["score"].to_numpy(np.float32)
        )


def test_fq_with_wildcard(searcher, oracle_small):
    babe = _scores(oracle_small, "babe")
    res = searcher.search_pdf("babe", k=5000, fq="ro*")
    assert set(res["docid"].tolist()) <= set(babe)
    assert len(res) > 0


def test_count_with_fq(searcher, oracle_small):
    babe = set(_scores(oracle_small, "babe"))
    roro = set(_scores(oracle_small, "roro"))
    assert searcher.count("babe", fq="roro") == len(babe & roro)


def test_matching_docset(searcher, oracle_small):
    babe = set(_scores(oracle_small, "babe"))
    got = [r["docid"] for r in searcher.matching("babe").collect()]
    assert got == sorted(babe)


def test_dismax_parity(searcher, oracle_small):
    """DisMax = max(clause BM25) + tie * rest, float32 combination."""
    a = _scores(oracle_small, "babe")
    b = _scores(oracle_small, "babaso")
    tie = np.float32(0.3)
    exp = {}
    for d in set(a) | set(b):
        sa = np.float32(a.get(d, np.float32(0.0)))
        sb = np.float32(b.get(d, np.float32(0.0)))
        sm = np.float32(sa + sb)
        mx = max(sa, sb)
        exp[d] = np.float32(mx + np.float32(tie * np.float32(sm - mx)))
    order = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    res = searcher.search_pdf("babe babaso", k=10, dismax_tie=0.3)
    np.testing.assert_array_equal(
        res["docid"].to_numpy(), np.array([d for d, _ in order])
    )
    np.testing.assert_array_equal(
        res["score"].to_numpy(np.float32),
        np.array([s for _, s in order], np.float32),
    )


def test_dismax_tie_zero_is_pure_max(searcher, oracle_small):
    a = _scores(oracle_small, "babe")
    b = _scores(oracle_small, "roro")
    exp = {}
    for d in set(a) | set(b):
        exp[d] = max(
            np.float32(a.get(d, np.float32(0.0))),
            np.float32(b.get(d, np.float32(0.0))),
        )
    order = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    res = searcher.search_pdf("babe roro", k=10, dismax_tie=0.0)
    np.testing.assert_array_equal(
        res["docid"].to_numpy(), np.array([d for d, _ in order])
    )


def test_filter_cache_equivalent_to_inline_fq(searcher):
    """cached_filter + fq_docids == inline fq, bit-identical; second use
    hits the cache (no re-evaluation)."""
    inline = searcher.search_pdf("babe", k=10, fq="roro")
    bc = searcher.cached_filter("roro")
    cached = searcher.search_pdf("babe", k=10, fq_docids=bc)
    np.testing.assert_array_equal(
        inline["docid"].to_numpy(), cached["docid"].to_numpy()
    )
    np.testing.assert_array_equal(
        inline["score"].to_numpy(np.float32), cached["score"].to_numpy(np.float32)
    )
    assert searcher.cached_filter("roro") is bc  # cache hit, same broadcast
    # composes with an additional inline fq (intersection)
    both = searcher.search_pdf("babe", k=5000, fq="babaso", fq_docids=bc)
    expect = searcher.search_pdf("babe", k=5000, fq="babaso roro")
    assert set(both["docid"]) == set(expect["docid"])


def test_filter_cache_size_guard(searcher):
    with pytest.raises(ValueError, match="max_docs"):
        searcher.cached_filter("babe", max_docs=3)


def test_query_result_cache(searcher):
    """queryResultCache: identical request returns the identical page
    without re-execution; different k is a different cache entry."""
    a = searcher.search_pdf("babe roro", k=10, use_cache=True)
    b = searcher.search_pdf("babe roro", k=10, use_cache=True)
    np.testing.assert_array_equal(a["docid"].to_numpy(), b["docid"].to_numpy())
    np.testing.assert_array_equal(
        a["score"].to_numpy(np.float32), b["score"].to_numpy(np.float32)
    )
    c = searcher.search_pdf("babe roro", k=3, use_cache=True)
    assert len(c) == 3
    # cached copy is defensive: mutating the returned frame is safe
    b.loc[:, "score"] = 0.0
    d = searcher.search_pdf("babe roro", k=10, use_cache=True)
    assert (d["score"].to_numpy(np.float32) > 0).any()


def test_dismax_with_fq(searcher, oracle_small):
    """DisMax combination composes with fq restriction."""
    a = _scores(oracle_small, "babe")
    b = _scores(oracle_small, "babaso")
    fq_docs = set(_scores(oracle_small, "roro"))
    tie = np.float32(0.2)
    exp = {}
    for d in (set(a) | set(b)) & fq_docs:
        sa = np.float32(a.get(d, np.float32(0.0)))
        sb = np.float32(b.get(d, np.float32(0.0)))
        sm = np.float32(sa + sb)
        mx = max(sa, sb)
        exp[d] = np.float32(mx + np.float32(tie * np.float32(sm - mx)))
    order = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    res = searcher.search_pdf("babe babaso", k=10, dismax_tie=0.2, fq="roro")
    np.testing.assert_array_equal(
        res["docid"].to_numpy(), np.array([d for d, _ in order])
    )
    np.testing.assert_array_equal(
        res["score"].to_numpy(np.float32),
        np.array([s for _, s in order], np.float32),
    )


def test_mm_with_fq(searcher, oracle_small):
    """min_should_match quota composes with fq."""
    a = set(_scores(oracle_small, "babe"))
    b = set(_scores(oracle_small, "roro"))
    c = set(_scores(oracle_small, "babaso"))
    fq_docs = set(_scores(oracle_small, "bani"))
    expected = {
        d for d in (a | b | c) & fq_docs
        if sum(d in s for s in (a, b, c)) >= 2
    }
    res = searcher.search_pdf(
        "babe roro babaso", k=5000, min_should_match=2, fq="bani"
    )
    assert set(res["docid"]) == expected


def test_nested_with_dismax(searcher, oracle_small):
    """A group inside a DisMax query: the group is one dismax arm."""
    res = searcher.search_pdf("(babe roro) babaso", k=10, dismax_tie=0.0)
    # pure max of {group sum, babaso}
    a = _scores(oracle_small, "babe")
    b = _scores(oracle_small, "roro")
    c = _scores(oracle_small, "babaso")
    exp = {}
    for d in set(a) | set(b) | set(c):
        grp = np.float32(
            np.float32(a.get(d, np.float32(0.0))) + np.float32(b.get(d, np.float32(0.0)))
        ) if (d in a or d in b) else np.float32(0.0)
        exp[d] = max(grp, np.float32(c.get(d, np.float32(0.0))))
    order = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    np.testing.assert_array_equal(
        res["docid"].to_numpy(), np.array([d for d, _ in order])
    )


def test_query_result_cache_keyed_by_fq_docids(searcher):
    """Two use_cache=True requests with the same query text but different
    filter doc-sets must not collide (cache key includes the doc-set
    fingerprint)."""
    bc_ro = searcher.cached_filter("roro")
    bc_ba = searcher.cached_filter("babaso")
    plain = searcher.search_pdf("babe", k=10, use_cache=True)
    a = searcher.search_pdf("babe", k=10, use_cache=True, fq_docids=bc_ro)
    b = searcher.search_pdf("babe", k=10, use_cache=True, fq_docids=bc_ba)
    # each equals its uncached twin
    np.testing.assert_array_equal(
        a["docid"].to_numpy(),
        searcher.search_pdf("babe", k=10, fq_docids=bc_ro)["docid"].to_numpy(),
    )
    np.testing.assert_array_equal(
        b["docid"].to_numpy(),
        searcher.search_pdf("babe", k=10, fq_docids=bc_ba)["docid"].to_numpy(),
    )
    np.testing.assert_array_equal(
        plain["docid"].to_numpy(),
        searcher.search_pdf("babe", k=10)["docid"].to_numpy(),
    )
    assert set(a["docid"]) != set(plain["docid"])


def test_query_result_cache_keyed_by_multiterm_scoring(searcher):
    """Scored and constant-score wildcard pages must not share a cache
    entry."""
    a = searcher.search_pdf("ro*", k=10, use_cache=True)
    b = searcher.search_pdf("ro*", k=10, use_cache=True,
                            multiterm_scoring=True)
    assert (a["score"].to_numpy() != b["score"].to_numpy()).any()
    a2 = searcher.search_pdf("ro*", k=10, use_cache=True)
    np.testing.assert_array_equal(a["score"].to_numpy(), a2["score"].to_numpy())
