"""ASCII folding filter (analysis/common/src/java/org/apache/lucene/
analysis/miscellaneous/ASCIIFoldingFilter.java).

The reference enumerates the Latin-1 Supplement / Latin Extended blocks in
a giant switch; this restates the same mapping as (a) an explicit table
for the letters whose folds are not unicode decompositions (ss/ae/oe/th
ligature folds, stroked letters) and (b) NFKD decomposition with combining
marks stripped for everything else. Characters the reference does not map
(non-Latin scripts) pass through unchanged, as in the reference.

No reference code was consulted beyond the published mapping semantics.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pandas as pd

# post-lowercase explicit folds (ASCIIFoldingFilter's non-decomposable rows)
_EXPLICIT = {
    "ß": "ss", "æ": "ae", "œ": "oe", "ø": "o", "đ": "d", "ð": "d",
    "þ": "th", "ł": "l", "ħ": "h", "ı": "i", "ŧ": "t", "ƒ": "f",
}
_EXPLICIT_TRANS = str.maketrans(_EXPLICIT)


def _fold_char(c: str) -> str:
    m = _EXPLICIT.get(c)
    if m is not None:
        return m
    d = unicodedata.normalize("NFKD", c)
    stripped = "".join(x for x in d if not unicodedata.combining(x))
    # fold only when the base character is ASCII (the reference's switch
    # covers Latin blocks; everything else passes through unchanged)
    return stripped if stripped and stripped.isascii() else c


def ascii_fold(term: str) -> str:
    if term.isascii():
        return term
    return "".join(_fold_char(c) for c in term)


def fold_filter_terms(terms):
    """Vocabulary-vectorized fold over an analyzed term column (folds can
    conflate terms, so codes are remapped by stem.vocab_map_terms)."""
    from .stem import vocab_map_terms

    return vocab_map_terms(terms, ascii_fold)
