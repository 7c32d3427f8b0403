"""Porter stemmer — the original 1980 algorithm, implemented from the
published description (M.F. Porter, "An algorithm for suffix stripping",
Program 14(3) 1980), matching the reference's
lucene/analysis/common/src/java/org/apache/lucene/analysis/en/PorterStemmer.java
semantics (that file is the same algorithm; no code consulted or copied).

Vectorization strategy: stemming is applied at the VOCABULARY level — the
analyzer stems each distinct term once (pandas Categorical categories /
unique array) and maps occurrences by code, so the per-token cost is a
dictionary lookup regardless of corpus size. At 100 TB the per-batch
vocabulary is bounded by the token count of the Arrow batch, keeping the
Python-side work tiny relative to tokenization itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m(): number of VC sequences in the stem."""
    m = 0
    i = 0
    n = len(stem)
    # skip initial consonants
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        # in vowel run
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (
        len(w) >= 2
        and w[-1] == w[-2]
        and _is_cons(w, len(w) - 1)
    )


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # ---- step 1a ----
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- step 1b ----
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w = w + "e"

    # ---- step 1c ----
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # ---- step 2 ----
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
        ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
        ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"), ("logi", "log"),
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # ---- step 3 ----
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # ---- step 4 ----
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    break
                w = stem
            break

    # ---- step 5a ----
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]

    # ---- step 5b ----
    if w.endswith("ll") and _measure(w) > 1:
        w = w[:-1]

    return w


def stem_vocab(terms: np.ndarray) -> np.ndarray:
    """Stem an array of DISTINCT terms (the vocabulary-level kernel)."""
    return np.array([porter_stem(t) for t in terms], dtype=object)


def _strip_possessive(t: str) -> str:
    """EnglishPossessiveFilter: trailing 's / ’s removed
    (analysis/common/.../en/EnglishPossessiveFilter.java)."""
    if t.endswith("'s") or t.endswith("’s"):
        return t[:-2]
    return t


def vocab_map_terms(terms, fn):
    """Apply a term->term function vocabulary-vectorized: only the
    Categorical dictionary (or the unique values of a plain array) is
    transformed, and codes are remapped because the map can conflate
    terms (stems/folds colliding IS the point). Shared by every
    stemming/folding filter in the analyzer registry."""
    if isinstance(terms, pd.Categorical):
        cats = terms.categories.to_numpy(dtype=object)
        new = np.array([fn(t) for t in cats], dtype=object)
        uniq, inv = np.unique(new, return_inverse=True)
        codes = np.asarray(terms.codes)
        return pd.Categorical.from_codes(
            inv[codes] if len(codes) else np.zeros(0, np.int64),
            categories=uniq,
        )
    arr = np.asarray(terms, dtype=object)
    if len(arr) == 0:
        return arr
    uniq, inv = np.unique(arr, return_inverse=True)
    mapped = np.array([fn(t) for t in uniq], dtype=object)
    return mapped[inv]


def english_filter_terms(terms):
    """EnglishAnalyzer's tail filters over an analyzed term column:
    possessive strip + Porter stem (EnglishAnalyzer.java chain: possessive
    -> lowercase -> stop -> porter; lowercase+stop run upstream)."""
    return vocab_map_terms(terms, lambda t: porter_stem(_strip_possessive(t)))


def minimal_english_stem(word: str) -> str:
    """The S-stemmer (Harman 1991, "How Effective Is Suffixing?", JASIS
    42(1)) in the exact rule shape the reference filter uses
    (analysis/common/.../en/EnglishMinimalStemFilter.java; implemented
    from the published rules, no reference code consulted):

      - words of length < 3 or not ending in 's' pass
      - -us / -ss endings pass
      - -ies -> -y for words longer than 3 unless preceded by 'a'/'e'
        (-aies/-eies pass)
      - other -es endings pass when the char before 'es' is a vowel in
        {a, e, i, o} (-aes/-ees/-oes/-ies); otherwise drop the 's'
      - any other -s drops
    """
    n = len(word)
    if n < 3 or word[-1] != "s":
        return word
    prev = word[-2]
    if prev in ("u", "s"):
        return word
    if prev == "e":
        if n > 3 and word[-3] == "i" and word[-4] not in ("a", "e"):
            return word[:-3] + "y"
        if word[-3] in ("a", "e", "i", "o"):
            return word
        return word[:-1]
    return word[:-1]


def english_minimal_filter_terms(terms):
    """Possessive strip + minimal plural stem over an analyzed term column
    (vocabulary-vectorized via vocab_map_terms)."""
    return vocab_map_terms(
        terms, lambda t: minimal_english_stem(_strip_possessive(t))
    )
