"""Analyzer-chain kernels: HTMLStrip -> StandardTokenizer -> LowerCase -> Stop.

Semantics follow the reference chain (see
lucene/analysis/common/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:84-89):
CharFilter (HTML strip) -> UAX#29 word-break tokenizer with
maxTokenLength=255 (StandardAnalyzer.java:39) -> lowercase
(core/LowerCaseFilter.java:44) -> 33-word English stop filter
(core/StopAnalyzer.java:42-47) preserving position gaps
(util/FilteringTokenFilter.java:52-58: each skipped token still consumes a
position increment, and over-long tokens skipped by the tokenizer do too,
StandardTokenizer.java:157-162).

Everything here is batch-level pandas/numpy (Arrow-friendly): these same
functions run inside Spark pandas UDFs *and* inside the pure-pandas oracle,
so engine-vs-oracle token streams agree by construction; fidelity to the
JFlex grammar is covered by the unicode edge-case corpus in tests.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pandas as pd

# StopAnalyzer.ENGLISH_STOP_WORDS_SET (core/StopAnalyzer.java:42-47)
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH

# UAX#29-style word: runs of word chars joined by MidLetter/MidNum/MidNumLet
# (period, colon, comma, apostrophes) only when followed by another word char
# -- keeps "3.14", "example.com", "can't", "foo_bar"; splits on hyphen/space
# like the reference tokenizer (standard/StandardTokenizer.java:45-94).
_TOKEN_RE = re.compile(r"\w+(?:[.,:'’]\w+)*", re.UNICODE)

# CJK ideographs + Hiragana/Katakana are emitted one-token-per-character by
# StandardTokenizer (token type <CJ>/<IDEOGRAPHIC>).
_CJK_CLASS = "\u2e80-\u2eff\u3040-\u30ff\u3400-\u4dbf\u4e00-\u9fff\uf900-\ufaff"
_CJK_RE = re.compile(f"[{_CJK_CLASS}]")
_CJK_SPLIT_RE = re.compile(f"([{_CJK_CLASS}])")

# ---------------------------------------------------------------------------
# HTML strip (charfilter/HTMLStripCharFilter.java semantics, subset)
# ---------------------------------------------------------------------------

_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[!/]?[a-zA-Z][^>]*>|<[!/]?>")


def html_strip_str(s: str) -> str:
    """Strip tags/script/style/comments, decode entities; text nodes verbatim."""
    s = _SCRIPT_RE.sub("", s)
    s = _STYLE_RE.sub("", s)
    s = _COMMENT_RE.sub("", s)
    s = _TAG_RE.sub("", s)
    return _html.unescape(s)


def html_strip_series(html_bytes: pd.Series) -> pd.Series:
    """Vectorized html(binary or str) -> extracted text."""
    if len(html_bytes) and isinstance(html_bytes.iloc[0], (bytes, bytearray)):
        s = html_bytes.map(lambda b: b.decode("utf-8", errors="replace"))
    else:
        s = html_bytes.astype(str)
    return s.map(html_strip_str)


# ---------------------------------------------------------------------------
# Tokenizer chain
# ---------------------------------------------------------------------------


def _expand_cjk(tokens: list[str]) -> list[str]:
    """Split CJK runs inside matched tokens into per-character tokens."""
    out: list[str] = []
    for t in tokens:
        if _CJK_RE.search(t):
            for piece in _CJK_SPLIT_RE.split(t):
                if piece:
                    out.append(piece)
        else:
            out.append(t)
    return out


def tokenize_series(texts: pd.Series) -> pd.DataFrame:
    """Full analyzer chain over a batch of texts.

    Returns a flat DataFrame with columns:
      doc_idx : int32 position of the text within the batch
      term    : analyzed (lowercased, stop-filtered) term
      pos     : int32 token position, with gaps where stopwords/over-long
                tokens were removed (position-increment semantics)
    plus ``.attrs["doc_lengths"]``: int32 array of per-doc emitted token
    counts (the BM25 norm length, FieldInvertState.getLength()).
    """
    texts = texts.fillna("")
    # lowercase whole texts up front (one C call per doc) — equivalent to
    # the per-token LowerCaseFilter for \w-matched tokens, and far cheaper
    # than a per-token pandas pass over millions of small strings
    texts = texts.map(str.lower)
    tok_lists = texts.map(_TOKEN_RE.findall)
    # rare path: per-char CJK expansion before positions are assigned
    has_cjk = texts.map(lambda s: _CJK_RE.search(s) is not None)
    if has_cjk.any():
        idx = np.flatnonzero(has_cjk.to_numpy())
        tl = tok_lists.to_numpy(dtype=object)
        for i in idx:
            tl[i] = _expand_cjk(tl[i])
        tok_lists = pd.Series(tl, index=texts.index)

    counts = tok_lists.map(len).to_numpy(dtype=np.int64)
    n_docs = len(texts)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int32), counts)
    flat = [t for lst in tok_lists for t in lst]
    # position = index in the pre-filter token stream (gap semantics)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    pos = (np.arange(len(flat), dtype=np.int64) - offsets[doc_idx]).astype(np.int32)

    terms = pd.Series(flat, dtype="object")
    keep_len = terms.str.len().to_numpy() <= MAX_TOKEN_LENGTH
    emit = keep_len & ~terms.isin(ENGLISH_STOP_WORDS).to_numpy()

    out = pd.DataFrame(
        {
            "doc_idx": doc_idx[emit],
            "term": terms.to_numpy()[emit],
            "pos": pos[emit],
        }
    )
    lengths = np.zeros(n_docs, dtype=np.int32)
    if len(out):
        np.add.at(lengths, out["doc_idx"].to_numpy(), 1)
    out.attrs["doc_lengths"] = lengths
    return out


def analyze_series(texts: pd.Series) -> pd.Series:
    """texts -> Series of list-of-terms (positions dropped)."""
    flat = tokenize_series(texts)
    n = len(texts)
    result = [[] for _ in range(n)]
    for d, t in zip(flat["doc_idx"].to_numpy(), flat["term"].to_numpy()):
        result[d].append(t)
    return pd.Series(result, index=texts.index)


def analyze_one(text: str) -> list[tuple[str, int]]:
    """Single-string convenience: [(term, position), ...]."""
    flat = tokenize_series(pd.Series([text]))
    return list(zip(flat["term"].tolist(), flat["pos"].tolist()))
