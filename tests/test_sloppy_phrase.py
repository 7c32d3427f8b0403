"""Sloppy (proximity) phrase: kernel unit semantics + engine==oracle parity."""

import numpy as np
import pytest

from lucene_solr_spark.search.sloppy import sloppy_phrase_freq


def test_kernel_exact_alignment():
    # "a b" with a@[0,10], b@[1,40]: one adjacent pair -> dist 0, freq 1.0
    f = sloppy_phrase_freq([np.array([0, 10]), np.array([1, 40])], [0, 1], 0)
    assert f == 1.0


def test_kernel_slop_window():
    # "a b" with b 3 positions later: dist = 2, needs slop >= 2
    a, b = np.array([0]), np.array([3])
    assert sloppy_phrase_freq([a, b], [0, 1], 1) == 0.0
    assert sloppy_phrase_freq([a, b], [0, 1], 2) == pytest.approx(1 / 3)


def test_kernel_reversed_order():
    # "a b" appearing as "b a": adjusted dist = 2 -> matches at slop 2
    a, b = np.array([5]), np.array([4])
    assert sloppy_phrase_freq([a, b], [0, 1], 2) == pytest.approx(1 / 3)


def test_kernel_three_terms():
    # "a b c" contiguous -> freq 1
    f = sloppy_phrase_freq([np.array([7]), np.array([8]), np.array([9])], [0, 1, 2], 0)
    assert f == 1.0


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    from lucene_solr_spark.search.engine import SparkSearcher

    idx, _ = small_index
    return SparkSearcher(spark, idx)


def _bigrams(pages):
    """Common (t1, t2) pairs co-occurring in docs (not necessarily adjacent)."""
    from lucene_solr_spark.analysis import tokenize_series

    flat = tokenize_series(pages["text"].iloc[:300])
    counts = flat.groupby("term").size().sort_values()
    terms = counts.index.to_numpy()
    return [(terms[-1], terms[-2]), (terms[-1], terms[len(terms) // 2])]


def test_sloppy_parity_engine_oracle(searcher, oracle_small, pages_small):
    for t1, t2 in _bigrams(pages_small):
        for slop in (1, 3, 8):
            q = f'"{t1} {t2}"~{slop}'
            res = searcher.search_pdf(q, k=10, mode="OR")
            exp = oracle_small.search(q, 10, "OR")
            np.testing.assert_array_equal(
                res["docid"].to_numpy(), exp["docid"].to_numpy(), err_msg=q
            )
            np.testing.assert_array_equal(
                res["score"].to_numpy(np.float32),
                exp["score"].to_numpy(np.float32),
                err_msg=q,
            )


def test_sloppy_in_multiclause_or_prune_parity(searcher, oracle_small, pages_small):
    """ADVICE r1 repro: the old phrase UB (min-df term tf bound) is invalid
    for slop>0 — summed sloppyFreq can exceed any single term's tf — so a
    sloppy clause in a multi-clause OR could be wrongly demoted under
    MaxScore pruning, dropping true top-k docs. Prune on/off must agree."""
    (t1, t2), _ = _bigrams(pages_small)
    for q in (
        f'"{t1} {t2}"~3 {t1} roro',
        f'"{t1} {t2}"~8 roro babe',
        f'"{t2} {t1}"~2 {t2}',
    ):
        on = searcher.search_pdf(q, k=10, mode="OR", prune=True)
        off = searcher.search_pdf(q, k=10, mode="OR", prune=False)
        np.testing.assert_array_equal(
            on["docid"].to_numpy(), off["docid"].to_numpy(), err_msg=q
        )
        np.testing.assert_array_equal(
            on["score"].to_numpy(np.float32), off["score"].to_numpy(np.float32),
            err_msg=q,
        )
        exp = oracle_small.search(q, 10, "OR")
        np.testing.assert_array_equal(
            on["docid"].to_numpy(), exp["docid"].to_numpy(), err_msg=q
        )


def test_sloppy_explain_matches_search(searcher, oracle_small, pages_small):
    """CheckHits invariant for slop>0: explain() total must be bit-identical
    to search()'s score (ADVICE r1: int(freq) flooring broke this)."""
    (t1, t2), _ = _bigrams(pages_small)
    q = f'"{t1} {t2}"~3'
    res = searcher.search_pdf(q, k=3, mode="OR")
    assert len(res) > 0
    for _, r in res.iterrows():
        ex = searcher.explain(q, int(r["docid"]))
        assert ex["matched"]
        assert np.float32(ex["total"]) == np.float32(r["score"])
        oex = oracle_small.explain(q, int(r["docid"]))
        assert np.float32(oex["total"]) == np.float32(r["score"])


def test_sloppy_finds_more_than_exact(oracle_small, pages_small):
    t1, t2 = _bigrams(pages_small)[0]
    exact = oracle_small.count(f'"{t1} {t2}"')
    sloppy = len(oracle_small.search(f'"{t1} {t2}"~10', 2000, "OR"))
    assert sloppy >= exact
    assert sloppy > 0


def test_repeats_no_false_match_single_occurrence():
    """'b b' must NOT match a doc with a single 'b'
    (SloppyPhraseScorer.java:238-252 repeats reconciliation)."""
    p = np.array([7])
    assert sloppy_phrase_freq([p, p], [0, 1], 5, terms=["b", "b"]) == 0.0


def test_repeats_two_occurrences_match():
    # doc 'b b': positions [0,1]; phrase "b b" -> one exact alignment
    p = np.array([0, 1])
    f = sloppy_phrase_freq([p, p], [0, 1], 0, terms=["b", "b"])
    assert f == 1.0


def test_repeats_interleaved():
    # doc 'b x b': phrase "b b"~1: occurrences 0 and 2, adjusted (0, 1):
    # dist 1 -> sloppyFreq 1/2
    p = np.array([0, 2])
    f = sloppy_phrase_freq([p, p], [0, 1], 1, terms=["b", "b"])
    assert f == pytest.approx(0.5)


def test_repeats_engine_oracle_parity(searcher, oracle_small, pages_small):
    """Phrases with duplicated tokens stay rank- and score-identical
    between engine and oracle (shared kernel, distinct call sites)."""
    (t1, _), _ = _bigrams(pages_small)
    for q in (f'"{t1} {t1}"', f'"{t1} {t1}"~2', f'"{t1} {t1} {t1}"~4'):
        res = searcher.search_pdf(q, k=10, mode="OR")
        exp = oracle_small.search(q, 10, "OR")
        np.testing.assert_array_equal(
            res["docid"].to_numpy(), exp["docid"].to_numpy(), err_msg=q
        )
        np.testing.assert_array_equal(
            res["score"].to_numpy(np.float32), exp["score"].to_numpy(np.float32),
            err_msg=q,
        )


def test_two_term_merge_closed_form():
    """The edismax ps SQL oracle relies on a closed form of the two-slot
    minimal-window sweep: each slot-0 occurrence pairs with the smallest
    adjusted slot-1 position >= it, each slot-1 occurrence with the
    smallest adjusted slot-0 position strictly > it (ties advance slot 0).
    Verify equivalence to the sequential kernel over random inputs."""
    import random

    def closed_form(A, B, slop):
        f = 0.0
        for x in A:
            ys = [y for y in B if y >= x]
            if ys and min(ys) - x <= slop:
                f += 1.0 / (min(ys) - x + 1)
        for x in B:
            ys = [y for y in A if y > x]
            if ys and min(ys) - x <= slop:
                f += 1.0 / (min(ys) - x + 1)
        return f

    rng = random.Random(42)
    for _ in range(3000):
        A = sorted(rng.sample(range(15), rng.randint(1, 6)))
        B = sorted(rng.sample(range(15), rng.randint(1, 6)))
        slop = rng.randint(0, 5)
        k = sloppy_phrase_freq(
            [np.array(A), np.array([b + 1 for b in B])], [0, 1], slop,
            terms=["t0", "t1"],
        )
        assert k == pytest.approx(closed_form(A, B, slop)), (A, B, slop)
