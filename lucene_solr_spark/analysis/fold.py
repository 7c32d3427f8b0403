"""ASCII folding filter (analysis/common/src/java/org/apache/lucene/
analysis/miscellaneous/ASCIIFoldingFilter.java).

The reference enumerates the Latin blocks in a giant switch; the exact
per-character mapping lives in folddata.py, EXTRACTED by running every
BMP character through the compiled reference filter (tools/fuzz_fold.py
FoldMain raw mode — behavior extraction of the published mapping, no
code copied).  Characters outside the table pass through unchanged,
exactly like the reference.  Differentially re-verified per run by
tools/fuzz_fold.py under the chain contract (fold after lowercase).
"""

from __future__ import annotations

from .folddata import FOLD_MAP

_FOLD_TRANS = str.maketrans(FOLD_MAP)


def ascii_fold(term: str) -> str:
    if term.isascii():
        return term
    return term.translate(_FOLD_TRANS)


def fold_filter_terms(terms):
    """Vocabulary-vectorized fold over an analyzed term column (folds can
    conflate terms, so codes are remapped by stem.vocab_map_terms)."""
    from .stem import vocab_map_terms

    return vocab_map_terms(terms, ascii_fold)
