"""Reference chain-position spec for analyzers whose StopFilter does NOT
run directly on the lowercased tokenizer output.

Most language chains are Tokenizer -> LowerCase -> Stop -> Stem, which
the tokenizer-embedded stop check in text.py models exactly. But several
reference analyzers interpose a term-level stage BEFORE the stop filter
(createComponents order in each {Language}Analyzer.java):

  * fr/it/ca/ga  — ElisionFilter (util/ElisionFilter.java:33: truncate at
                   the FIRST ' or U+2019 iff the prefix is an article;
                   fr/FrenchAnalyzer.java:60, it/ItalianAnalyzer.java:49,
                   ca/CatalanAnalyzer.java:47, ga/IrishAnalyzer.java:46)
  * ga           — additionally StopFilter(HYPHENATIONS={h,n,t}) BEFORE
                   elision (ga/IrishAnalyzer.java:57,86)
  * tr           — ApostropheFilter (tr/ApostropheFilter.java:53)
  * el           — GreekLowerCaseFilter folds final sigma + tonos before
                   stop (el/stopwords.txt:2 "used after
                   GreekLowerCaseFilter ... use 'σ' instead of 'ς'")
  * fa           — ArabicNormalization + PersianNormalization before stop
                   (fa/PersianAnalyzer.java createComponents;
                   fa/stopwords.txt:4 "used after normalization")
  * hi           — IndicNormalization + HindiNormalization before stop,
                   HindiStem after (hi/HindiAnalyzer.java)
  * ckb          — SoraniNormalization before stop (ckb/SoraniAnalyzer.java;
                   the reference normalizes before LowerCase, but Arabic
                   script is caseless so Lower<->Normalize commute)

(ar is the notable opposite: ArabicAnalyzer stops BEFORE normalization,
so the arabic analyzer keeps the tokenizer-embedded early stop.)

text.py routes these analyzers through :func:`apply_late_chain`, which
runs pre-stop transform -> stop -> post-stop stem on the Categorical
dictionary only (vocabulary-vectorized, same execution model as
stem.vocab_map_terms), dropping stopped rows and adjusting the per-doc
norm lengths. Positions keep the gap semantics: the tokenizer assigned
them before any removal, exactly like the posInc accumulation of
util/FilteringTokenFilter.java:52.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

# ElisionFilter article sets (ignoreCase=true in the reference; our terms
# are already lowercased upstream so plain membership suffices)
ELISION_ARTICLES = {
    # fr/FrenchAnalyzer.java:60
    "french": frozenset(
        "l m t qu n s j d c jusqu quoiqu lorsqu puisqu".split()
    ),
    # it/ItalianAnalyzer.java:49
    "italian": frozenset(
        """c l all dall dell nell sull coll pell gl agl dagl degl negl
        sugl un m t s v d""".split()
    ),
    # ca/CatalanAnalyzer.java:47
    "catalan": frozenset("d l m n s t".split()),
    # ga/IrishAnalyzer.java:46
    "irish": frozenset("d m b".split()),
}

# ga/IrishAnalyzer.java:57 — StopFilter(HYPHENATIONS) runs BEFORE elision
IRISH_HYPHENATIONS = frozenset(("h", "n", "t"))


def make_elision(articles: frozenset[str]):
    """util/ElisionFilter.java:33 — find the FIRST ' or ’; if the
    prefix before it is an article, strip prefix+apostrophe (once)."""

    def elide(t: str) -> str:
        for i, ch in enumerate(t):
            if ch == "'" or ch == "’":
                if t[:i] in articles:
                    return t[i + 1:]
                return t
        return t

    return elide


def apostrophe_truncate(t: str) -> str:
    """tr/ApostropheFilter.java:53 — truncate every token at its first
    apostrophe (' or ’), suffix discarded."""
    for i, ch in enumerate(t):
        if ch == "'" or ch == "’":
            return t[:i]
    return t


def _irish_pre(t: str):
    # StopFilter(HYPHENATIONS) precedes elision: 'n'/'t'/'h' fragments
    # from tokenized "n-athair" forms drop unconditionally
    if t in IRISH_HYPHENATIONS:
        return None
    t = _ELIDE_GA(t)
    # IrishLowerCaseFilter chain position: the eclipsis sentinel planted
    # by text.py (token-initial n/t before an uppercase vowel) becomes
    # the reference's inserted hyphen — "nꟿathair" -> "n-athair", which
    # the Snowball Irish stemmer then strips as an initial mutation
    if "ꟿ" in t:
        t = t.replace("ꟿ", "-")
    return t


_ELIDE_FR = make_elision(ELISION_ARTICLES["french"])
_ELIDE_IT = make_elision(ELISION_ARTICLES["italian"])
_ELIDE_CA = make_elision(ELISION_ARTICLES["catalan"])
_ELIDE_GA = make_elision(ELISION_ARTICLES["irish"])


def _lazy_maps():
    """Build {analyzer: (pre_stop_fn, post_stop_fn)} lazily (the stemmer
    modules are heavy imports; chain.py must stay cheap to import).
    pre_stop_fn: str -> str | None (None = drop before the stop check,
    used only by Irish's HYPHENATIONS pre-stop)."""
    from .greek import greek_lower, greek_stem
    from .light import (
        french_light_stem,
        french_minimal_stem,
        hindi_chain_normalize,
        hindi_stem_suffixes,
        italian_light_stem,
        persian_normalize,
        sorani_normalize,
        sorani_stem_suffixes,
    )
    from .snowball import (
        catalan_stem,
        french_stem,
        irish_stem,
        italian_stem,
        turkish_stem,
    )
    from .kstem import kstem
    from .stem import _strip_possessive, minimal_english_stem, porter_stem

    return {
        # EnglishAnalyzer.java:99-108: possessive strip runs BEFORE the
        # stop filter — "IT's" -> it -> stopped (fuzz_chain-caught; the
        # old post-stop possessive kept such tokens alive)
        "english": (_strip_possessive, porter_stem),
        "english_minimal": (_strip_possessive, minimal_english_stem),
        # KStemFilter option (Solr text_en shape: possessive -> stop ->
        # KStem); kstem is differentially byte-identical to the
        # compiled reference KStemmer (tools/fuzz_kstem.py)
        "english_kstem": (_strip_possessive, kstem),
        "french": (_ELIDE_FR, french_stem),
        "french_light": (_ELIDE_FR, french_light_stem),
        "french_minimal": (_ELIDE_FR, french_minimal_stem),
        "italian": (_ELIDE_IT, italian_stem),
        "italian_light": (_ELIDE_IT, italian_light_stem),
        "catalan": (_ELIDE_CA, catalan_stem),
        "irish": (_irish_pre, irish_stem),
        "turkish": (apostrophe_truncate, turkish_stem),
        "greek": (greek_lower, greek_stem),
        "persian": (persian_normalize, None),
        # suffix-only post stems: normalization must run exactly once
        # (sorani_normalize is NOT idempotent — fuzz_chain-caught)
        "hindi": (hindi_chain_normalize, hindi_stem_suffixes),
        "sorani": (sorani_normalize, sorani_stem_suffixes),
    }


LATE_STOP_ANALYZERS = frozenset((
    "english", "english_minimal", "english_kstem",
    "french", "french_light", "french_minimal",
    "italian", "italian_light",
    "catalan", "irish", "turkish",
    "greek", "persian", "hindi", "sorani",
))

_MAPS: dict | None = None


def apply_late_chain(doc_idx, terms, pos, lengths, analyzer: str,
                     stopset: frozenset):
    """pre-stop transform -> StopFilter -> stem, vocabulary-vectorized.

    Operates on the flat token arrays produced by the tokenizer (which
    ran with an EMPTY stop set for these analyzers). Only the dictionary
    is transformed; stopped rows are dropped by code mask and the per-doc
    emitted-token counts (the BM25 norm lengths) decremented to match —
    FieldInvertState counts post-StopFilter tokens.
    """
    global _MAPS
    if _MAPS is None:
        _MAPS = _lazy_maps()
    pre_fn, post_fn = _MAPS[analyzer]

    cat = (
        terms
        if isinstance(terms, pd.Categorical)
        else pd.Categorical(np.asarray(terms, dtype=object))
    )
    cats = cat.categories.to_numpy(dtype=object)
    codes = np.asarray(cat.codes)
    doc_idx = np.asarray(doc_idx)
    pos = np.asarray(pos)

    pre = np.empty(len(cats), dtype=object)
    drop_dict = np.zeros(len(cats), dtype=bool)
    for i, t in enumerate(cats):
        p = pre_fn(t) if pre_fn is not None else t
        if p is None or p in stopset:
            drop_dict[i] = True
            pre[i] = ""
        else:
            pre[i] = p

    if len(codes) and drop_dict.any():
        row_drop = drop_dict[codes]
        if row_drop.any():
            lengths = np.asarray(lengths).copy()
            np.subtract.at(lengths, doc_idx[row_drop], 1)
            keep = ~row_drop
            doc_idx = doc_idx[keep]
            pos = pos[keep]
            codes = codes[keep]

    final = (
        np.array([post_fn(t) if not d else "" for t, d in zip(pre, drop_dict)],
                 dtype=object)
        if post_fn is not None
        else pre
    )
    uniq, inv = np.unique(final, return_inverse=True)
    new_terms = pd.Categorical.from_codes(
        inv[codes] if len(codes) else np.zeros(0, np.int64),
        categories=uniq,
    )
    return doc_idx, new_terms, pos, lengths
