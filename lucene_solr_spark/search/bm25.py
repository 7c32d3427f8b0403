"""BM25 scoring math, reproduced in float32 exactly as the reference computes it.

Sources (semantics only, no code copied):
  - idf:    lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java:65-67
            (float)Math.log(1 + (numDocs - docFreq + 0.5)/(docFreq + 0.5))
  - avgdl:  BM25Similarity.java:82-89  (double divide, cast to float)
  - norm:   encode = SmallFloat.floatToByte315(boost / (float)sqrt(fieldLength))
            (BM25Similarity.java:95-97); decode table NORM_TABLE[i] = 1/(f*f)
            (BM25Similarity.java:101-103, 127-132)
  - cache:  cache[i] = k1 * ((1 - b) + b * decode(i) / avgdl)  (float ops, :204-210)
  - score:  weightValue * freq / (freq + cache[normByte])  where
            weightValue = idf * boost * (k1 + 1)  (:222-237); BM25 ignores
            queryNorm (:288-293); multi-term weight = sum of per-term idfs (:185-198)
  - minifloat: util/SmallFloat.java:78-99 (3 mantissa bits, zero exp 15,
            truncating; negatives/zero -> 0, underflow -> 1, overflow -> 255)

Every array op below is numpy float32/int32 so Java float semantics are
reproduced bit-for-bit (IEEE-754 single, same op order).
"""

from __future__ import annotations

import math

import numpy as np

K1_DEFAULT = np.float32(1.2)
B_DEFAULT = np.float32(0.75)


def float_to_byte315(f: np.ndarray) -> np.ndarray:
    """float32 array -> uint8 minifloat (SmallFloat.floatToByte315)."""
    f = np.asarray(f, dtype=np.float32)
    bits = f.view(np.int32)
    smallfloat = bits >> np.int32(24 - 3)  # arithmetic shift, like Java >>
    fzero = np.int32((63 - 15) << 3)
    out = (smallfloat - fzero).astype(np.int32)
    out = np.where(smallfloat <= fzero, np.where(bits <= 0, 0, 1), out)
    out = np.where(smallfloat >= fzero + 0x100, 255, out)
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray) -> np.ndarray:
    """uint8 array -> float32 (SmallFloat.byte315ToFloat)."""
    b = np.asarray(b, dtype=np.uint8)
    bits = (b.astype(np.int32) << (24 - 3)) + np.int32((63 - 15) << 24)
    out = bits.view(np.float32).copy()
    out[b == 0] = np.float32(0.0)
    return out


# NORM_TABLE[i] = 1/(f*f): decoded value approximates the field length
_F = byte315_to_float(np.arange(256, dtype=np.uint8))
with np.errstate(divide="ignore"):
    NORM_TABLE = (np.float32(1.0) / (_F * _F)).astype(np.float32)


def encode_norm(field_lengths: np.ndarray) -> np.ndarray:
    """lengths -> norm bytes: floatToByte315(1.0f / (float)sqrt(length))."""
    lens = np.asarray(field_lengths, dtype=np.float64)
    with np.errstate(divide="ignore"):
        f = (np.float32(1.0) / np.sqrt(lens).astype(np.float32)).astype(np.float32)
    return float_to_byte315(f)


def idf(doc_freq, num_docs) -> np.float32:
    """(float)Math.log(1 + (N - df + 0.5)/(df + 0.5)) — double math, cast float."""
    df = float(doc_freq)
    n = float(num_docs)
    return np.float32(math.log(1.0 + (n - df + 0.5) / (df + 0.5)))


def avg_field_length(sum_total_term_freq: int, max_doc: int) -> np.float32:
    if sum_total_term_freq <= 0:
        return np.float32(1.0)
    return np.float32(float(sum_total_term_freq) / float(max_doc))


def norm_cache(avgdl: np.float32, k1: np.float32 = K1_DEFAULT, b: np.float32 = B_DEFAULT) -> np.ndarray:
    """cache[i] = k1 * ((1 - b) + b * NORM_TABLE[i] / avgdl), float32 op order."""
    k1 = np.float32(k1)
    b = np.float32(b)
    avgdl = np.float32(avgdl)
    t = (b * NORM_TABLE).astype(np.float32)
    t = (t / avgdl).astype(np.float32)
    t = ((np.float32(1.0) - b) + t).astype(np.float32)
    return (k1 * t).astype(np.float32)


def weight_value(idf_val: np.float32, boost: float = 1.0, k1: np.float32 = K1_DEFAULT) -> np.float32:
    """idf * boost * (k1 + 1) as float32 (BM25DocScorer.weightValue)."""
    w = np.float32(np.float32(idf_val) * np.float32(boost))
    return np.float32(w * (np.float32(k1) + np.float32(1.0)))


def score_freqs(
    freqs: np.ndarray,
    norm_bytes: np.ndarray,
    cache: np.ndarray,
    wv: np.float32,
) -> np.ndarray:
    """weightValue * freq / (freq + cache[normByte]) elementwise float32."""
    f = np.asarray(freqs, dtype=np.float32)
    norm = cache[np.asarray(norm_bytes, dtype=np.uint8)]
    num = (np.float32(wv) * f).astype(np.float32)
    den = (f + norm).astype(np.float32)
    return (num / den).astype(np.float32)
