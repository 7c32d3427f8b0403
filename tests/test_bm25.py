import math

import numpy as np

from lucene_solr_spark.search import bm25


def test_smallfloat_javadoc_values():
    # util/SmallFloat.java:74-77 javadoc: smallest nonzero / largest / epsilon
    f = bm25.byte315_to_float(np.array([0, 1, 255], dtype=np.uint8))
    assert f[0] == 0.0
    assert abs(f[1] - 5.820766e-10) < 1e-16
    assert abs(f[2] - 7.5161928e9) < 1e3


def test_smallfloat_truncation_and_edges():
    vals = np.array([0.0, -3.5, 1e-12, 1.0, 0.5, 7.6e9], dtype=np.float32)
    b = bm25.float_to_byte315(vals)
    assert list(b) == [0, 0, 1, 124, 120, 255]


def test_encode_decode_norm_monotone_lossy():
    lens = np.array([1, 2, 3, 10, 100, 10000])
    bts = bm25.encode_norm(lens)
    dec = bm25.NORM_TABLE[bts]
    # decoded approximates length, monotone non-decreasing
    assert (np.diff(dec) >= 0).all()
    assert dec[0] == 1.0


def test_idf_formula():
    # BM25Similarity.java:65-67
    assert bm25.idf(500, 1000) == np.float32(math.log(1 + (1000 - 500 + 0.5) / 500.5))


def test_score_monotonicity():
    cache = bm25.norm_cache(np.float32(100.0))
    wv = bm25.weight_value(bm25.idf(10, 1000))
    s = bm25.score_freqs(np.array([1, 2, 4, 8]), np.array([110, 110, 110, 110]), cache, wv)
    assert (np.diff(s) > 0).all()  # increasing in tf, saturating
    # shorter doc (higher norm byte) scores higher at same tf
    s2 = bm25.score_freqs(np.array([2, 2]), np.array([100, 120]), cache, wv)
    assert s2[1] > s2[0]
