"""Span-near kernels + engine integration: independent brute-force oracle,
micro cases, ordering/slop properties, repeats distinctness."""

import numpy as np
import pytest

from lucene_solr_spark.search.spans import (
    span_near_count,
    span_near_ordered_count,
    span_near_unordered_count,
)


def brute_ordered(pos_lists, slop):
    """Independent implementation of the documented ordered-span spec:
    anchor at each last-clause occurrence, chain closest preceding
    occurrences by linear scan."""
    k = len(pos_lists)
    count = 0
    for pk in pos_lists[-1]:
        p = pk
        ok = True
        for j in range(k - 2, -1, -1):
            cands = [x for x in pos_lists[j] if x < p]
            if not cands:
                ok = False
                break
            p = max(cands)
        if ok and (pk - p) - (k - 1) <= slop:
            count += 1
    return count


def test_ordered_micro_cases():
    a, b = np.array([0, 10]), np.array([1, 12])
    # (0,1): gap 0; (10,12): gap 1
    assert span_near_ordered_count([a, b], 0) == 1
    assert span_near_ordered_count([a, b], 1) == 2
    # order matters: b-then-a finds (1,10) gap 8 and (12,...) nothing
    assert span_near_ordered_count([b, a], 8) == 1
    assert span_near_ordered_count([b, a], 7) == 0


def test_ordered_three_terms():
    a, b, c = np.array([0]), np.array([2]), np.array([5])
    # width (5-0) - 2 = 3
    assert span_near_ordered_count([a, b, c], 3) == 1
    assert span_near_ordered_count([a, b, c], 2) == 0


def test_ordered_matches_brute_random():
    rng = np.random.default_rng(4)
    for _ in range(200):
        k = int(rng.integers(2, 4))
        lists = [
            np.unique(rng.integers(0, 30, rng.integers(1, 8))) for _ in range(k)
        ]
        slop = int(rng.integers(0, 6))
        assert span_near_ordered_count(lists, slop) == brute_ordered(lists, slop), (
            lists, slop,
        )


def test_unordered_reversed_pair():
    a, b = np.array([5]), np.array([4])
    # unordered width (5-4) - 1 = 0
    assert span_near_unordered_count([a, b], 0) == 1
    assert span_near_ordered_count([a, b], 10) == 0  # no a before b... b=4<a=5


def test_unordered_repeats_distinctness():
    # "b b" span over a doc with a single 'b': must NOT match
    p = np.array([7])
    assert span_near_unordered_count([p, p], 5, terms=["b", "b"]) == 0
    # two occurrences -> one window of width (8-7)-1 = 0
    p2 = np.array([7, 8])
    assert span_near_unordered_count([p2, p2], 0, terms=["b", "b"]) >= 1


def test_unordered_superset_of_ordered():
    rng = np.random.default_rng(9)
    for _ in range(100):
        lists = [
            np.unique(rng.integers(0, 25, rng.integers(1, 6))) for _ in range(2)
        ]
        slop = int(rng.integers(0, 5))
        o = span_near_ordered_count(lists, slop)
        u = span_near_unordered_count(lists, slop)
        # every ordered match window also qualifies unordered
        assert u >= min(o, 1) or o == 0


def test_slop_monotonicity():
    rng = np.random.default_rng(2)
    lists = [np.unique(rng.integers(0, 40, 6)) for _ in range(3)]
    prev_o = prev_u = -1
    for slop in range(0, 10):
        o = span_near_ordered_count(lists, slop)
        u = span_near_unordered_count(lists, slop)
        assert o >= prev_o and u >= prev_u
        prev_o, prev_u = o, u


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    from lucene_solr_spark.search.engine import SparkSearcher

    idx, _ = small_index
    return SparkSearcher(spark, idx)


def test_engine_span_near_parity(searcher, pages_small):
    """Engine result == kernel applied to analyzer-derived positions."""
    from lucene_solr_spark.analysis import tokenize_series

    flat = tokenize_series(pages_small["text"])
    urls = pages_small["url"].to_numpy()
    docid_by_pos = np.empty(len(urls), np.int64)
    docid_by_pos[np.argsort(urls)] = np.arange(len(urls))
    flat = flat.assign(docid=docid_by_pos[flat["doc_idx"].to_numpy()])

    counts = flat.groupby("term", observed=True).size().sort_values()
    t1, t2 = counts.index[-1], counts.index[-2]

    by_doc = {}
    for t in (t1, t2):
        sub = flat[flat["term"] == t]
        for d, g in sub.groupby("docid"):
            by_doc.setdefault(d, {})[t] = np.sort(g["pos"].to_numpy())
    for slop, ordered in [(0, True), (3, True), (2, False)]:
        expected = {}
        for d, posmap in by_doc.items():
            if t1 in posmap and t2 in posmap:
                f = span_near_count([posmap[t1], posmap[t2]], slop, ordered, [t1, t2])
                if f > 0:
                    expected[d] = f
        res = searcher.span_near(f"{t1} {t2}", slop=slop, ordered=ordered).toPandas()
        got = dict(zip(res["docid"], res["freq"]))
        assert got == expected, (slop, ordered)


# ---------------------------------------------------------------------------
# batched kernels + span algebra (SpanOr/Not/First, SpanScorer)
# ---------------------------------------------------------------------------


def _mk_global(per_doc_lists, SHIFT):
    k = len(per_doc_lists[0])
    return [
        np.concatenate([np.asarray(ls[j], np.int64) + d * SHIFT
                        for d, ls in enumerate(per_doc_lists)])
        for j in range(k)
    ]


def test_batch_kernels_match_sequential_random():
    from lucene_solr_spark.search import spans as SP
    from lucene_solr_spark.search.sloppy import sloppy_phrase_freq

    rng = np.random.default_rng(7)
    SHIFT = int(SP.SHIFT)
    for _ in range(150):
        k = int(rng.integers(2, 5))
        ndocs = int(rng.integers(1, 5))
        slop = int(rng.integers(0, 5))
        per_doc = []
        for _d in range(ndocs):
            doclen = int(rng.integers(1, 25))
            per_doc.append([
                np.sort(rng.choice(doclen, size=min(int(rng.integers(1, 5)), doclen),
                                   replace=False)).astype(np.int64)
                for _ in range(k)
            ])
        arrs = _mk_global(per_doc, SHIFT)
        gs, _ge, _w = SP.near_ordered_spans_batch(arrs, slop)
        d_o, c_o = SP.span_doc_counts(gs)
        om = dict(zip(d_o.tolist(), c_o.tolist()))
        gs, _ge, _w = SP.near_unordered_spans_batch(arrs, slop)
        d_u, c_u = SP.span_doc_counts(gs)
        um = dict(zip(d_u.tolist(), c_u.tolist()))
        offs = list(range(k))
        adj = [
            np.concatenate([np.asarray(ls[j], np.int64) - offs[j] + (k - 1)
                            + d * SHIFT
                            for d, ls in enumerate(per_doc)])
            for j in range(k)
        ]
        d_s, f_s = SP.sloppy_phrase_freqs_batch(adj, slop, ndocs)
        sm = dict(zip(d_s.tolist(), f_s.tolist()))
        for d in range(ndocs):
            assert om.get(d, 0) == SP.span_near_ordered_count(per_doc[d], slop)
            assert um.get(d, 0) == SP.span_near_unordered_count(per_doc[d], slop)
            assert sm.get(d, 0.0) == sloppy_phrase_freq(per_doc[d], offs, slop)


def test_span_not_brute(searcher, pages_small):
    """SpanNot(include=near(t1,t2), exclude=t3) == brute-force overlap
    filter over analyzer positions."""
    from lucene_solr_spark.analysis import tokenize_series
    from lucene_solr_spark.search import spans as SP

    flat = tokenize_series(pages_small["text"])
    urls = pages_small["url"].to_numpy()
    docid_by_pos = np.empty(len(urls), np.int64)
    docid_by_pos[np.argsort(urls)] = np.arange(len(urls))
    flat = flat.assign(docid=docid_by_pos[flat["doc_idx"].to_numpy()])
    counts = flat.groupby("term", observed=True).size().sort_values()
    t1, t2, t3 = counts.index[-1], counts.index[-2], counts.index[-3]

    pos = {
        t: {d: np.sort(g["pos"].to_numpy())
            for d, g in flat[flat["term"] == t].groupby("docid")}
        for t in (t1, t2, t3)
    }
    slop = 3
    exp = {}
    for d in set(pos[t1]) & set(pos[t2]):
        spans = []
        for p2 in pos[t2][d]:
            before = pos[t1][d][pos[t1][d] < p2]
            if len(before) and (p2 - before[-1]) - 1 <= slop:
                spans.append((int(before[-1]), int(p2) + 1))
        ex = pos[t3].get(d, np.zeros(0, np.int64))
        surv = [s for s in spans if not np.any((ex >= s[0]) & (ex < s[1]))]
        if surv:
            exp[d] = len(surv)

    node = SP.SpanNot(
        SP.SpanNear((SP.SpanTerm(t1), SP.SpanTerm(t2)), slop, True),
        SP.SpanTerm(t3),
    )
    got = {r["docid"]: r["freq"] for r in searcher.span_query(node).collect()}
    assert got == exp


def test_span_first_and_or(searcher, pages_small):
    from lucene_solr_spark.analysis import tokenize_series
    from lucene_solr_spark.search import spans as SP

    flat = tokenize_series(pages_small["text"])
    urls = pages_small["url"].to_numpy()
    docid_by_pos = np.empty(len(urls), np.int64)
    docid_by_pos[np.argsort(urls)] = np.arange(len(urls))
    flat = flat.assign(docid=docid_by_pos[flat["doc_idx"].to_numpy()])
    counts = flat.groupby("term", observed=True).size().sort_values()
    t1, t2 = counts.index[-1], counts.index[-2]

    # SpanFirst: count of t1 occurrences with pos+1 <= 4 per doc
    n = 4
    sub = flat[(flat["term"] == t1) & (flat["pos"] + 1 <= n)]
    exp = sub.groupby("docid").size().to_dict()
    got = {r["docid"]: r["freq"]
           for r in searcher.span_query(SP.SpanFirst(SP.SpanTerm(t1), n)).collect()}
    assert got == exp

    # SpanOr: per-doc occurrence count of t1|t2
    sub = flat[flat["term"].isin([t1, t2])]
    exp = sub.groupby("docid").size().to_dict()
    got = {r["docid"]: r["freq"]
           for r in searcher.span_query(
               SP.SpanOr((SP.SpanTerm(t1), SP.SpanTerm(t2)))).collect()}
    assert got == exp


def test_span_search_scoring_matches_term_query_on_unit_spans(searcher):
    """span_search(SpanTerm(t)) == search(t): freq = tf, weight = idf —
    SpanScorer degenerates to TermScorer on unit spans."""
    from lucene_solr_spark.search import spans as SP

    t = "babe"
    a = searcher.span_search(SP.SpanTerm(t), k=10).toPandas()
    b = searcher.search_pdf(t, k=10)
    np.testing.assert_array_equal(a["docid"].to_numpy(), b["docid"].to_numpy())
    np.testing.assert_array_equal(
        a["score"].to_numpy(np.float32), b["score"].to_numpy(np.float32)
    )


def test_nested_ordered_near_general_spans():
    """near(near(a,b), c) composes through the general ordered kernel;
    widths count this level's inter-span gaps."""
    from lucene_solr_spark.search import spans as SP

    posmap = {
        "a": np.array([0, 10], np.int64),
        "b": np.array([2, 11], np.int64),
        "c": np.array([5, 13], np.int64),
    }
    inner = SP.SpanNear((SP.SpanTerm("a"), SP.SpanTerm("b")), 1, True)
    gs, ge, w = SP.eval_spans(inner, posmap)
    assert list(zip(gs, ge, w)) == [(0, 3, 1), (10, 12, 0)]
    outer = SP.SpanNear((inner, SP.SpanTerm("c")), 2, True)
    gs, ge, w = SP.eval_spans(outer, posmap)
    # [0,3)->c@5 gap 2 OK; [10,12)->c@13 gap 1 OK
    assert list(zip(gs, ge, w)) == [(0, 6, 2), (10, 14, 1)]
    tight = SP.SpanNear((inner, SP.SpanTerm("c")), 1, True)
    gs, _ge, _w = SP.eval_spans(tight, posmap)
    assert list(gs) == [10]
    # overlap is NOT a match (next sub must start at/after previous end)
    posmap2 = {"a": np.array([0], np.int64), "b": np.array([2], np.int64),
               "c": np.array([1], np.int64)}
    over = SP.SpanNear((inner, SP.SpanTerm("c")), 9, True)
    assert len(SP.eval_spans(over, posmap2)[0]) == 0


def test_general_kernel_equals_unit_kernel_on_unit_spans():
    from lucene_solr_spark.search import spans as SP

    rng = np.random.default_rng(11)
    SH = int(SP.SHIFT)
    for _ in range(100):
        k = int(rng.integers(2, 4))
        nd = int(rng.integers(1, 4))
        slop = int(rng.integers(0, 4))
        arrs = []
        for _j in range(k):
            parts = []
            for d in range(nd):
                n = int(rng.integers(1, 5))
                dl = int(rng.integers(1, 20))
                parts.append(
                    np.sort(rng.choice(dl, size=min(n, dl),
                                       replace=False)).astype(np.int64)
                    + d * SH
                )
            arrs.append(np.concatenate(parts))
        g1 = SP.near_ordered_spans_batch(arrs, slop)
        g2 = SP.near_ordered_general_batch([(a, a + 1) for a in arrs], slop)
        for x, y in zip(g1, g2):
            np.testing.assert_array_equal(x, y)


def test_ordered_block_bounded_at_huge_slop():
    """ADVICE r4 (spans.py cross-doc chain bound): with slop far above
    the ~255 MAX_POSITION headroom, a chain that only closes across a
    doc boundary must NOT match, and a same-doc chain must keep winning
    even when a cross-doc candidate sits numerically closer to the
    anchor. The block-bounded lookup excludes cross-doc links
    structurally instead of relying on width > slop."""
    from lucene_solr_spark.search import spans as SP

    SH = int(SP.SHIFT)
    big_slop = SH * 4  # Lucene allows slop up to Integer.MAX_VALUE

    # chain exists ONLY cross-doc: C0 at the very end of doc 0, anchor
    # at the start of doc 1 (link cost would be tiny if blocks ignored)
    c0 = (np.array([SH - 3], np.int64), np.array([SH - 2], np.int64))
    c1 = (np.array([SH + 1], np.int64), np.array([SH + 2], np.int64))
    s, e, w = SP.near_ordered_general_batch([c0, c1], big_slop)
    assert len(s) == 0

    # same-doc chain with a tempting doc-0 candidate just below the
    # block boundary: the anchor must link to the doc-1 C0 span
    c0 = (
        np.array([SH - 3, SH + 0], np.int64),
        np.array([SH - 2, SH + 1], np.int64),
    )
    anchor = (np.array([SH + 500], np.int64), np.array([SH + 501], np.int64))
    s, e, w = SP.near_ordered_general_batch([c0, anchor], big_slop)
    assert list(s) == [SH + 0]
    assert list(w) == [499]

    # three clauses, middle clause present in both docs: the kept
    # minimal chain must be the all-doc-1 one
    c0 = (np.array([SH + 0], np.int64), np.array([SH + 1], np.int64))
    c1 = (
        np.array([SH - 2, SH + 100], np.int64),
        np.array([SH - 1, SH + 101], np.int64),
    )
    anchor = (np.array([SH + 110], np.int64), np.array([SH + 111], np.int64))
    s, e, w = SP.near_ordered_general_batch([c0, c1, anchor], big_slop)
    assert list(s) == [SH + 0]
    assert list(w) == [99 + 9]


def test_nested_near_through_engine(searcher, pages_small):
    """Nested span query end-to-end through span_query on the real index."""
    from lucene_solr_spark.analysis import tokenize_series
    from lucene_solr_spark.search import spans as SP

    flat = tokenize_series(pages_small["text"])
    urls = pages_small["url"].to_numpy()
    docid_by_pos = np.empty(len(urls), np.int64)
    docid_by_pos[np.argsort(urls)] = np.arange(len(urls))
    flat = flat.assign(docid=docid_by_pos[flat["doc_idx"].to_numpy()])
    counts = flat.groupby("term", observed=True).size().sort_values()
    t1, t2, t3 = counts.index[-1], counts.index[-2], counts.index[-3]

    inner = SP.SpanNear((SP.SpanTerm(t1), SP.SpanTerm(t2)), 2, True)
    outer = SP.SpanNear((inner, SP.SpanTerm(t3)), 5, True)
    got = {r["docid"]: r["freq"] for r in searcher.span_query(outer).collect()}

    # brute force per the documented greedy spec
    pos = {
        t: {d: np.sort(g["pos"].to_numpy())
            for d, g in flat[flat["term"] == t].groupby("docid")}
        for t in (t1, t2, t3)
    }
    exp = {}
    for d in set(pos[t1]) & set(pos[t2]) & set(pos[t3]):
        inner_spans = []
        for p2 in pos[t2][d]:
            before = pos[t1][d][pos[t1][d] < p2]
            if len(before) and (p2 - before[-1]) - 1 <= 2:
                inner_spans.append((int(before[-1]), int(p2) + 1))
        n = 0
        for p3 in pos[t3][d]:
            cands = [s for s in inner_spans if s[1] <= p3]
            if not cands:
                continue
            best = max(cands, key=lambda s: (s[1], s[0]))
            if p3 - best[1] <= 5:
                n += 1
        if n:
            exp[d] = n
    assert got == exp


def test_unordered_general_batch_matches_sequential_random():
    """near_unordered_general_batch (interval sweep, all docs at once)
    reproduces the sequential NearSpansUnordered-cell kernel per doc —
    this is the kernel behind unordered span-near over COMPOSITE
    sub-spans (near(near(a,b), c, ordered=False))."""
    import random

    from lucene_solr_spark.search.spans import (
        SHIFT,
        near_unordered_general_batch,
        near_unordered_intervals_count,
    )

    rng = random.Random(7)
    for _ in range(800):
        k = rng.randint(2, 4)
        ndocs = rng.randint(1, 4)
        per_doc, subs_g = [], [([], []) for _ in range(k)]
        for d in range(ndocs):
            doc_lists = []
            for j in range(k):
                iv = sorted({
                    (s, s + rng.randint(1, 4))
                    for s in (rng.randint(0, 12)
                              for _ in range(rng.randint(0, 4)))
                })
                doc_lists.append(iv)
                for s, e in iv:
                    subs_g[j][0].append(d * int(SHIFT) + s)
                    subs_g[j][1].append(d * int(SHIFT) + e)
            per_doc.append(doc_lists)
        subs = [(np.array(gs, np.int64), np.array(ge, np.int64))
                for gs, ge in subs_g]
        slop = rng.randint(-1, 6)
        gs, _ge, _w = near_unordered_general_batch(subs, slop)
        got = {}
        for g in gs:
            got[int(g // SHIFT)] = got.get(int(g // SHIFT), 0) + 1
        for d in range(ndocs):
            exp = near_unordered_intervals_count(per_doc[d], slop)
            assert exp == got.get(d, 0), (per_doc[d], slop)


def test_unordered_composite_through_engine(searcher, pages_small):
    """Unordered near over a composite sub-span through the engine equals
    a brute-force recount from the tokenized corpus."""
    import pandas as pd

    from lucene_solr_spark.analysis import tokenize_series
    from lucene_solr_spark.search import spans as SP
    from lucene_solr_spark.search.spans import near_unordered_intervals_count

    t1, t2, t3 = "babe", "roro", "dup"
    inner = SP.SpanNear((SP.SpanTerm(t1), SP.SpanTerm(t2)), 1, True)
    outer = SP.SpanNear((inner, SP.SpanTerm(t3)), 4, False)
    res = searcher.span_query(outer).toPandas()

    pages = pages_small
    urls = pages["url"].to_numpy()
    docid_by_pos = np.empty(len(urls), np.int64)
    docid_by_pos[np.argsort(urls)] = np.arange(len(urls))
    flat = tokenize_series(pages["text"])
    flat = flat.assign(docid=docid_by_pos[flat["doc_idx"].to_numpy()])
    exp = {}
    for d, g in flat[flat["term"].isin([t1, t2, t3])].groupby("docid"):
        a = np.sort(g[g["term"] == t1]["pos"].to_numpy())
        b = np.sort(g[g["term"] == t2]["pos"].to_numpy())
        c = np.sort(g[g["term"] == t3]["pos"].to_numpy())
        # inner ordered spans: anchor each b, closest a strictly before,
        # width <= 1
        ispans = []
        for pk in b:
            prior = a[a < pk]
            if len(prior) and (pk - prior[-1]) - 1 <= 1:
                ispans.append((int(prior[-1]), int(pk) + 1))
        ispans = sorted(set(ispans))
        units = [(int(p), int(p) + 1) for p in c]
        n = near_unordered_intervals_count([ispans, units], 4)
        if n > 0:
            exp[int(d)] = n
    got = dict(zip(res["docid"].astype(int), res["freq"].astype(int)))
    assert got == exp


def test_unordered_repeats_reconciliation_intervals():
    """Repeated identical sub-clauses must bind DISTINCT spans: a doc
    with a single composite span cannot satisfy near(inner, inner)."""
    from lucene_solr_spark.search.spans import (
        near_unordered_intervals_matches,
    )

    one = [(0, 2)]
    assert near_unordered_intervals_matches([one, one], 10, [0, 0]) == []
    two = [(0, 2), (5, 7)]
    m = near_unordered_intervals_matches([two, two], 3, [0, 0])
    assert m == [(0, 7, 3)]
    assert near_unordered_intervals_matches([two, two], 2, [0, 0]) == []
    # distinct keys: no reconciliation, self-pairing allowed
    m2 = near_unordered_intervals_matches([one, one], 10, [0, 1])
    assert len(m2) == 1 and m2[0][2] < 0  # full overlap, negative width


def test_unordered_composite_repeats_through_engine(searcher, pages_small):
    """near(inner, inner, unordered) through the engine equals a brute
    per-doc recount with reconciliation (distinct inner spans)."""
    from lucene_solr_spark.analysis import tokenize_series
    from lucene_solr_spark.search import spans as SP
    from lucene_solr_spark.search.spans import (
        near_unordered_intervals_matches,
    )

    pages = pages_small
    urls = pages["url"].to_numpy()
    docid_by_pos = np.empty(len(urls), np.int64)
    docid_by_pos[np.argsort(urls)] = np.arange(len(urls))
    flat = tokenize_series(pages["text"])
    flat = flat.assign(docid=docid_by_pos[flat["doc_idx"].to_numpy()])
    t1, t2 = flat["term"].value_counts().index[:2]

    inner = SP.SpanNear((SP.SpanTerm(t1), SP.SpanTerm(t2)), 5, True)
    outer = SP.SpanNear((inner, inner), 20, False)
    res = searcher.span_query(outer).toPandas()

    exp = {}
    for d, g in flat[flat["term"].isin([t1, t2])].groupby("docid"):
        a = np.sort(g[g["term"] == t1]["pos"].to_numpy())
        b = np.sort(g[g["term"] == t2]["pos"].to_numpy())
        ispans = []
        for pk in b:
            prior = a[a < pk]
            if len(prior) and (pk - prior[-1]) - 1 <= 5:
                ispans.append((int(prior[-1]), int(pk) + 1))
        ispans = sorted(set(ispans))
        n = len(near_unordered_intervals_matches(
            [ispans, ispans], 20, [0, 0]))
        if n > 0:
            exp[int(d)] = n
    got = dict(zip(res["docid"].astype(int), res["freq"].astype(int)))
    assert got == exp
    assert exp, "fixture should contain at least one doc with 2 inner spans"


def test_ordered_general_same_end_candidates_exact():
    """ADVICE r3 case: a clause with same-end, different-start spans must
    not be collapsed to max-start — C2=(1,5) yields the width-0 chain."""
    from lucene_solr_spark.search import spans as SP

    subs = [
        (np.array([0], np.int64), np.array([1], np.int64)),
        (np.array([1, 3], np.int64), np.array([5, 5], np.int64)),
        (np.array([5], np.int64), np.array([6], np.int64)),
    ]
    gs, ge, w = SP.near_ordered_general_batch(subs, 0)
    assert list(zip(gs, ge, w)) == [(0, 6, 0)]
    gs, ge, w = SP.near_ordered_general_batch(subs, 1)
    assert list(zip(gs, ge, w)) == [(0, 6, 0)]


def test_ordered_general_unbounded_slop():
    """Slop up to Integer.MAX_VALUE is legal (Lucene never caps it); the
    r4 SHIFT//2 assert is gone and cross-doc chains stay rejected by the
    same-doc guard alone."""
    from lucene_solr_spark.search import spans as SP

    SH = int(SP.SHIFT)
    subs = [
        (np.array([0, SH], np.int64), np.array([1, SH + 1], np.int64)),
        (np.array([10, SH + 10], np.int64),
         np.array([11, SH + 11], np.int64)),
    ]
    gs, ge, w = SP.near_ordered_general_batch(subs, 2**31 - 1)
    assert list(zip(gs, ge, w)) == [(0, 11, 9), (SH, SH + 11, 9)]


def test_check_positions_typed_overflow():
    """check_positions raises the dedicated PositionOverflow (a ValueError)
    so the sloppy-phrase path can fall back to its sequential kernel when
    a long phrase's offset bias would cross the 2^21 block edge."""
    import pytest as _pytest

    from lucene_solr_spark.search import spans as SP

    SP.check_positions(np.array([5], np.int64), 10)  # fine
    with _pytest.raises(SP.PositionOverflow):
        SP.check_positions(
            np.array([SP.MAX_POSITION], np.int64), 512
        )
    assert issubclass(SP.PositionOverflow, ValueError)


def test_ordered_general_matches_bruteforce_min_width():
    """Fuzz the exact prefix-min DP against brute-force enumeration of all
    chains: per anchor, minimal total width and a clause-0 start that
    attains it."""
    from itertools import product

    from lucene_solr_spark.search import spans as SP

    rng = np.random.default_rng(404)
    SH = int(SP.SHIFT)
    for trial in range(200):
        k = int(rng.integers(2, 4))
        nd = int(rng.integers(1, 3))
        slop = int(rng.integers(0, 5))
        subs = []
        for _j in range(k):
            ss, es = [], []
            for d in range(nd):
                n = int(rng.integers(1, 5))
                for _ in range(n):
                    s = int(rng.integers(0, 12))
                    e = s + int(rng.integers(1, 5))
                    ss.append(d * SH + s)
                    es.append(d * SH + e)
            order = np.lexsort((np.array(es), np.array(ss)))
            subs.append((np.array(ss, np.int64)[order],
                         np.array(es, np.int64)[order]))
        gs, ge, w = SP.near_ordered_general_batch(subs, slop)
        got = sorted(zip(gs.tolist(), ge.tolist(), w.tolist()))
        # brute force PER ANCHOR (the kernel emits one match per last-
        # clause span): min total width over all chains ending at it
        exp = []
        cand = [list(zip(s.tolist(), e.tolist())) for s, e in subs]
        for a_s, a_e in cand[-1]:
            best_w, starts = None, set()
            for combo in product(*cand[:-1]):
                chain = list(combo) + [(a_s, a_e)]
                if len({c[0] // SH for c in chain}) != 1:
                    continue
                if not all(chain[j][1] <= chain[j + 1][0]
                           for j in range(k - 1)):
                    continue
                width = sum(chain[j + 1][0] - chain[j][1]
                            for j in range(k - 1))
                if best_w is None or width < best_w:
                    best_w, starts = width, {combo[0][0]}
                elif width == best_w:
                    starts.add(combo[0][0])
            if best_w is not None and best_w <= slop:
                exp.append((starts, a_e, best_w))
        assert len(got) == len(exp), f"trial {trial}"
        # multiset compare on (end, width); starts checked by membership
        from collections import Counter

        exp_cnt = Counter((e, wd) for _st, e, wd in exp)
        got_cnt = Counter((e, wd) for _s, e, wd in got)
        assert got_cnt == exp_cnt, f"trial {trial}"
        start_union = {}
        for st, e, wd in exp:
            start_union.setdefault((e, wd), set()).update(st)
        for g_s, g_e, g_w in got:
            assert g_s in start_union[(g_e, g_w)], f"trial {trial}"


def test_position_overflow_guard():
    """Positions past MAX_POSITION raise instead of bleeding into the next
    doc's coordinate block (ADVICE r3)."""
    import pandas as pd
    import pytest

    from lucene_solr_spark.index.build import _build_segment_pdf
    from lucene_solr_spark.search import spans as SP

    SP.check_positions(np.array([100], np.int64), bias=3)  # fine
    with pytest.raises(ValueError, match="2\\^21"):
        SP.check_positions(np.array([int(SP.SHIFT) - 2], np.int64), bias=3)
    big = pd.Series([" ".join(["tok"] * (SP.MAX_POSITION + 2))])
    with pytest.raises(ValueError, match="MAX_POSITION"):
        _build_segment_pdf(big)


def test_fuzzy_multidigit_edits_raise():
    import pytest

    from lucene_solr_spark.search.query import parse_query

    q = parse_query("term~2")
    assert q.clauses[0].kind == "fuzzy"
    with pytest.raises(ValueError, match="edit distance"):
        parse_query("term~10")
