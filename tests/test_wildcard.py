"""General wildcard/regexp multi-term queries: dictionary expansion,
constant-score rewrite, boolean composition (reference semantics:
search/WildcardQuery.java, RegexpQuery.java, MultiTermQuery.java:64-116
CONSTANT_SCORE_REWRITE; tests modeled on core TestWildcard.java)."""

import fnmatch
import re

import numpy as np
import pytest


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    from lucene_solr_spark.search.engine import SparkSearcher

    idx, _ = small_index
    return SparkSearcher(spark, idx)


@pytest.fixture(scope="module")
def vocab_and_docs(pages_small):
    """(sorted vocab, {term -> set of engine docids}) via the shared
    analyzer; engine docids are global url ranks, not row positions."""
    from lucene_solr_spark.analysis import tokenize_series

    flat = tokenize_series(pages_small["text"])
    urls = pages_small["url"].to_numpy()
    docid_by_pos = np.empty(len(urls), np.int64)
    docid_by_pos[np.argsort(urls)] = np.arange(len(urls))
    by_term = (
        flat.assign(docid=docid_by_pos[flat["doc_idx"].to_numpy()])
        .groupby("term", observed=True)["docid"]
        .agg(set)
    )
    return sorted(by_term.index), by_term.to_dict()


def test_wildcard_to_regex():
    from lucene_solr_spark.search.engine import SparkSearcher

    r = SparkSearcher.wildcard_to_regex("wi*o?d")
    assert r == "^wi.*o.d$"
    assert re.fullmatch(r[1:-1], "wiod") is None  # '?' is exactly one char
    assert re.fullmatch(r[1:-1], "wiord")


@pytest.mark.parametrize("pattern", ["ba*", "*ab*", "?abe", "*o", "b*b*"])
def test_expand_wildcard_matches_fnmatch(searcher, vocab_and_docs, pattern):
    vocab, _ = vocab_and_docs
    expected = sorted(t for t in vocab if fnmatch.fnmatchcase(t, pattern))
    got = searcher.expand_wildcard(pattern, max_expansions=10_000)
    assert got == expected
    assert len(got) > 0, f"fixture pattern {pattern} should match terms"


def test_expand_regexp_full_match(searcher, vocab_and_docs):
    vocab, _ = vocab_and_docs
    regex = ".*(be|ro)"
    expected = sorted(t for t in vocab if re.fullmatch(regex, t))
    assert searcher.expand_regexp(regex) == expected


def test_wildcard_docset_union(searcher, vocab_and_docs):
    vocab, by_term = vocab_and_docs
    pattern = "*ab*"
    terms = [t for t in vocab if fnmatch.fnmatchcase(t, pattern)]
    expected = sorted(set().union(*(by_term[t] for t in terms)))
    got = searcher.matching_docids(searcher.expand_wildcard(pattern))
    assert [r["docid"] for r in got.collect()] == expected


def test_wildcard_in_boolean_query(searcher, oracle_small, vocab_and_docs):
    """OR of a scored term and a constant-score wildcard: score must be
    BM25(term) + 1.0 for docs matching both; prune on/off identical."""
    vocab, by_term = vocab_and_docs
    on = searcher.search_pdf("babe ro*", k=10, mode="OR", prune=True)
    off = searcher.search_pdf("babe ro*", k=10, mode="OR", prune=False)
    np.testing.assert_array_equal(on["docid"].to_numpy(), off["docid"].to_numpy())
    np.testing.assert_array_equal(
        on["score"].to_numpy(np.float32), off["score"].to_numpy(np.float32)
    )
    # brute-force expected: float32 clause-order sum of BM25('babe') + 1.0f
    base = oracle_small.search("babe", 3000, "OR")
    bm25_by_doc = dict(zip(base["docid"], base["score"]))
    ro_terms = [t for t in vocab if fnmatch.fnmatchcase(t, "ro*")]
    ro_docs = set().union(*(by_term[t] for t in ro_terms))
    exp = {}
    for d in set(bm25_by_doc) | ro_docs:
        s = np.float32(bm25_by_doc.get(d, np.float32(0.0)))
        if d in ro_docs:
            s = np.float32(s + np.float32(1.0))
        exp[d] = s
    order = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    np.testing.assert_array_equal(
        on["docid"].to_numpy(), np.array([d for d, _ in order])
    )
    np.testing.assert_array_equal(
        on["score"].to_numpy(np.float32), np.array([s for _, s in order], np.float32)
    )


def test_required_wildcard_conjunction(searcher, vocab_and_docs):
    """+babe +ro*: docs must contain babe AND any ro-prefixed term."""
    vocab, by_term = vocab_and_docs
    res = searcher.search_pdf("+babe +ro*", k=2000, mode="OR")
    ro_docs = set().union(
        *(by_term[t] for t in vocab if fnmatch.fnmatchcase(t, "ro*"))
    )
    expected = by_term["babe"] & ro_docs
    assert set(res["docid"].tolist()) == expected


def test_wildcard_no_match(searcher):
    # 'zz*' matches nothing: optional -> clause dropped; required -> empty
    assert len(searcher.search_pdf("babe zz*", k=5)) > 0
    assert len(searcher.search_pdf("+zz*", k=5)) == 0


def test_wildcard_explain_matches_search(searcher):
    res = searcher.search_pdf("babe ro*", k=3, mode="OR")
    for _, r in res.iterrows():
        ex = searcher.explain("babe ro*", int(r["docid"]))
        assert np.float32(ex["total"]) == np.float32(r["score"])


def test_negated_wildcard_prohibits_expansion(searcher, vocab_and_docs):
    """'babe -ro*' prohibits every doc containing any ro-prefixed term
    (MultiTermQuery under a MUST_NOT occur) — previously the parser
    silently stripped the '*' and prohibited only the literal 'ro'."""
    vocab, by_term = vocab_and_docs
    res = searcher.search_pdf("babe -ro*", k=5000, mode="OR")
    ro_docs = set().union(
        *(by_term[t] for t in vocab if fnmatch.fnmatchcase(t, "ro*"))
    )
    assert set(res["docid"].tolist()) == by_term["babe"] - ro_docs
    # scores identical to the plain query on the surviving docs
    base = searcher.search_pdf("babe", k=5000, mode="OR")
    base_by_doc = dict(zip(base["docid"], base["score"]))
    for _, r in res.iterrows():
        assert np.float32(r["score"]) == np.float32(base_by_doc[r["docid"]])


def test_negated_regexp_prohibits_expansion(searcher, vocab_and_docs):
    vocab, by_term = vocab_and_docs
    pat = re.compile(r"ro.*")
    res = searcher.search_pdf("babe -/ro.*/", k=5000, mode="OR")
    ro_docs = set().union(
        *(by_term[t] for t in vocab if pat.fullmatch(t))
    )
    assert set(res["docid"].tolist()) == by_term["babe"] - ro_docs


def test_negated_wildcard_no_match_is_noop(searcher, vocab_and_docs):
    _, by_term = vocab_and_docs
    res = searcher.search_pdf("babe -zz*", k=5000, mode="OR")
    assert set(res["docid"].tolist()) == by_term["babe"]


def _lev(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, d[0] = d[0], i
        for j in range(1, len(b) + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[-1]


def test_fuzzy_expansion_boosts(searcher, vocab_and_docs):
    """expand_fuzzy == brute-force classic levenshtein over the vocab, boost
    = 1 - ed/min(|term|,|target|), ordered (-boost, term), cutoff honored."""
    vocab, _ = vocab_and_docs
    target = "babe"
    exp = searcher.expand_fuzzy(target, 2, max_expansions=10_000)
    brute = sorted(
        (
            (t, 1.0 - _lev(t, target) / min(len(t), len(target)))
            for t in vocab
            if _lev(t, target) <= 2
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert exp == [(t, pytest.approx(b)) for t, b in brute]
    cut = searcher.expand_fuzzy(target, 2, max_expansions=2)
    assert cut == exp[:2]
    default = searcher.expand_fuzzy(target, 2)  # TopTermsRewrite default 50
    assert default == exp[:50]


def test_fuzzy_scored_clause_matches_manual_boosted_query(searcher):
    """'term~2' through the engine == the manually-expanded boosted boolean
    (scored rewrite), bit-identical float32 scores."""
    target = "babe"
    cands = searcher.expand_fuzzy(target, 2)
    assert len(cands) >= 2
    manual = "(" + " ".join(f"{t}^{b}" for t, b in cands) + ")"
    a = searcher.search_pdf(f"{target}~2", k=20)
    b = searcher.search_pdf(manual, k=20)
    np.testing.assert_array_equal(a["docid"].to_numpy(), b["docid"].to_numpy())
    np.testing.assert_array_equal(
        a["score"].to_numpy(np.float32), b["score"].to_numpy(np.float32)
    )


def test_fuzzy_required_and_no_match(searcher, vocab_and_docs):
    vocab, by_term = vocab_and_docs
    got = searcher.search_pdf("+babe~1", k=5000)
    exp_docs = set().union(
        *(by_term[t] for t in vocab if _lev(t, "babe") <= 1)
    )
    assert set(got["docid"].tolist()) == exp_docs
    assert len(searcher.search_pdf("+qqqqqq~1", k=5)) == 0
    assert len(searcher.search_pdf("babe qqqqqq~1", k=5)) > 0


def test_fuzzy_explain_matches_search(searcher):
    res = searcher.search_pdf("babe~2", k=3)
    for _, r in res.iterrows():
        ex = searcher.explain("babe~2", int(r["docid"]))
        assert np.float32(ex["total"]) == np.float32(r["score"])


def test_wildcard_topterms_scoring_rewrite(searcher, vocab_and_docs):
    """multiterm_scoring=True: the wildcard becomes a scored boolean of
    the df-ranked top-50 expansions — bit-identical to the manually
    expanded boolean; the cutoff keeps the highest-df candidates."""
    vocab, _ = vocab_and_docs
    terms = searcher.expand_wildcard_topterms("ba*")
    a = searcher.search_pdf("ba* roro", k=15, multiterm_scoring=True)
    manual = "(" + " ".join(terms) + ") roro"
    b = searcher.search_pdf(manual, k=15)
    np.testing.assert_array_equal(a["docid"].to_numpy(), b["docid"].to_numpy())
    np.testing.assert_array_equal(
        a["score"].to_numpy(np.float32), b["score"].to_numpy(np.float32)
    )
    # cutoff: with many candidates, exactly the 50 highest-df survive
    allc = searcher.expand_wildcard("*a*", max_expansions=1 << 20)
    if len(allc) > 50:
        stats = searcher._term_stats(allc)
        exp = sorted(sorted(allc, key=lambda t: (-stats.get(t, 0), t))[:50])
        assert searcher.expand_wildcard_topterms("*a*") == exp


def test_leading_wildcard_reversed_pushdown(searcher, vocab_and_docs):
    """'*suffix' patterns seek the reversed-terms sidecar: the scan plan
    carries PushedFilters: StringStartsWith(term_rev, ...) instead of a
    full dictionary read, and the expansion is unchanged."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    vocab, _ = vocab_and_docs
    exp = sorted(t for t in vocab if fnmatch.fnmatchcase(t, "*o"))
    assert searcher.expand_wildcard("*o", max_expansions=1 << 20) == exp

    rd = searcher._reversed_dictionary()
    q = rd.where(F.col("term_rev").startswith("o")).select("term")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain(True)
    plan = buf.getvalue()
    assert "StartsWith(term_rev" in plan and "PushedFilters" in plan
