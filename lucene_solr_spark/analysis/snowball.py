"""Snowball stemmers: de/fr/es/pt/ru + it/nl/sv/no/da/ro/fi/hu/ca/tr (r4).

Implemented from M.F. Porter's PUBLISHED algorithm descriptions
(snowballstem.org, one page per language). The first five were written
from the descriptions alone; for the round-4 additions the suffix
tables and step semantics were cross-checked against the reference's
generated programs (org/tartarus/snowball/ext/{Italian,Dutch,Swedish,
Norwegian,Danish,Romanian}Stemmer.java — behavior studied, no code
copied; every implementation here is original Python over this module's
helpers, an execution model the SnowballProgram interpreter does not
share). The reference wires these via snowball/SnowballFilter.java:53,
which is the parity target.

Vectorization strategy (same shape as stem.py's Porter filter): stemming
applies at the VOCABULARY level — each distinct term is stemmed once
(pandas Categorical categories) and occurrences are remapped by code, so
per-token cost is a dictionary lookup regardless of corpus size. At
100 TB the per-batch vocabulary is bounded by the Arrow batch's distinct
tokens, keeping Python-side work tiny relative to tokenization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _std_regions(w: str, vowels) -> tuple[int, int]:
    """Standard R1/R2 start offsets: R1 = region after the first
    non-vowel following a vowel (end of word if none); R2 = the same,
    computed within R1."""

    def _after(start: int) -> int:
        i, n = start, len(w)
        while i < n and w[i] not in vowels:
            i += 1
        while i < n and w[i] in vowels:
            i += 1
        return min(i + 1, len(w))

    r1 = _after(0)
    return r1, _after(r1)


def _longest(w: str, sufs) -> str | None:
    """First (pre-sorted longest-first) suffix of ``w`` in ``sufs``."""
    for s in sufs:
        if w.endswith(s):
            return s
    return None


def _bylen(*groups) -> tuple:
    out = []
    for g in groups:
        out.extend(g)
    return tuple(sorted(out, key=len, reverse=True))


# ---------------------------------------------------------------------------
# German
# ---------------------------------------------------------------------------

_DE_VOWELS = frozenset("aeiouyäöü")
_DE_S_END = frozenset("bdfghklmnrt")
_DE_ST_END = frozenset("bdfghklmnt")
_DE_STEP1 = _bylen(("em", "ern", "er"), ("e", "en", "es"), ("s",))
_DE_STEP2 = _bylen(("en", "er", "est"), ("st",))
_DE_STEP3 = _bylen(("end", "ung"), ("ig", "ik", "isch"),
                   ("lich", "heit"), ("keit",))


def german_stem(word: str) -> str:
    """Snowball German: ß→ss, u/y between vowels marked consonant,
    R1 (>=3) / R2 suffix stripping in three steps, then unmark + unumlaut.
    """
    w = word.replace("ß", "ss")
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if (chars[i] in ("u", "y") and chars[i - 1] in _DE_VOWELS
                and chars[i + 1] in _DE_VOWELS):
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _std_regions(w, _DE_VOWELS)
    r1 = max(r1, 3)  # R1 begins no sooner than after 3 letters

    # step 1
    s = _longest(w, _DE_STEP1)
    if s:
        p = len(w) - len(s)
        if s in ("em", "ern", "er"):
            if p >= r1:
                w = w[:p]
        elif s in ("e", "en", "es"):
            if p >= r1:
                w = w[:p]
                if w.endswith("niss"):
                    w = w[:-1]
        else:  # 's'
            if p >= r1 and p > 0 and w[p - 1] in _DE_S_END:
                w = w[:p]

    # step 2
    s = _longest(w, _DE_STEP2)
    if s:
        p = len(w) - len(s)
        if s == "st":
            # valid st-ending itself preceded by at least 3 letters
            if p >= r1 and p > 0 and w[p - 1] in _DE_ST_END and p - 1 >= 3:
                w = w[:p]
        else:
            if p >= r1:
                w = w[:p]

    # step 3 (d-suffixes)
    s = _longest(w, _DE_STEP3)
    if s:
        p = len(w) - len(s)
        if s in ("end", "ung"):
            if p >= r2:
                w = w[:p]
                if (w.endswith("ig") and len(w) - 2 >= r2
                        and not w.endswith("eig")):
                    w = w[:-2]
        elif s in ("ig", "ik", "isch"):
            if p >= r2 and not (p > 0 and w[p - 1] == "e"):
                w = w[:p]
        elif s in ("lich", "heit"):
            if p >= r2:
                w = w[:p]
                for t in ("er", "en"):
                    if w.endswith(t) and len(w) - 2 >= r1:
                        w = w[:-2]
                        break
        else:  # keit
            if p >= r2:
                w = w[:p]
                if w.endswith("lich") and len(w) - 4 >= r2:
                    w = w[:-4]
                elif w.endswith("ig") and len(w) - 2 >= r2:
                    w = w[:-2]

    return (w.replace("U", "u").replace("Y", "y")
             .replace("ä", "a").replace("ö", "o").replace("ü", "u"))


# ---------------------------------------------------------------------------
# French
# ---------------------------------------------------------------------------

_FR_VOWELS = frozenset("aeiouyâàëéêèïîôûù")

_FR_STEP1 = _bylen(
    ("ance", "iqUe", "isme", "able", "iste", "eux",
     "ances", "iqUes", "ismes", "ables", "istes"),
    ("atrice", "ateur", "ation", "atrices", "ateurs", "ations"),
    ("logie", "logies"),
    ("usion", "ution", "usions", "utions"),
    ("ence", "ences"),
    ("ement", "ements"),
    ("ité", "ités"),
    ("if", "ive", "ifs", "ives"),
    ("eaux",), ("aux",), ("euse", "euses"),
    ("issement", "issements"),
    ("amment",), ("emment",), ("ment", "ments"),
)
_FR_G1 = frozenset(("ance", "iqUe", "isme", "able", "iste", "eux",
                    "ances", "iqUes", "ismes", "ables", "istes"))
_FR_G2 = frozenset(("atrice", "ateur", "ation", "atrices", "ateurs",
                    "ations"))
_FR_STEP2A = _bylen((
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
    "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
    "irions", "irons", "iront", "is", "issaIent", "issais", "issait",
    "issant", "issante", "issantes", "issants", "isse", "issent",
    "isses", "issez", "issiez", "issions", "issons", "it",
))
_FR_2B_IONS = ("ions",)
_FR_2B_E = ("é", "ée", "ées", "és", "èrent", "er", "era", "erai",
            "eraIent", "erais", "erait", "eras", "erez", "eriez",
            "erions", "erons", "eront", "ez", "iez")
_FR_2B_A = ("âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant",
            "ante", "antes", "ants", "as", "asse", "assent", "asses",
            "assiez", "assions")
_FR_STEP2B = _bylen(_FR_2B_IONS, _FR_2B_E, _FR_2B_A)
_FR_STEP4 = _bylen(("ion",), ("ier", "ière", "Ier", "Ière"), ("e", "ë"))


def french_stem(word: str) -> str:
    """Snowball French: mark u/i/y/qu, RV/R1/R2 regions, standard-suffix
    step then verb-suffix steps 2a/2b, residual steps 3-6, unmark."""
    chars = list(word)
    n = len(chars)

    def _v(c: str) -> bool:
        return c in _FR_VOWELS

    for i in range(n):
        c = chars[i]
        if c == "u":
            if i > 0 and chars[i - 1] == "q":
                chars[i] = "U"
            elif 0 < i < n - 1 and _v(chars[i - 1]) and _v(chars[i + 1]):
                chars[i] = "U"
        elif c == "i":
            if 0 < i < n - 1 and _v(chars[i - 1]) and _v(chars[i + 1]):
                chars[i] = "I"
        elif c == "y":
            if (i > 0 and _v(chars[i - 1])) or (i < n - 1 and _v(chars[i + 1])):
                chars[i] = "Y"
    w = "".join(chars)

    n = len(w)
    if (n >= 3 and _v(w[0]) and _v(w[1])) or w[:3] in ("par", "col", "tap"):
        rv = 3 if n >= 3 else n
    else:
        rv = n
        for i in range(1, n):
            if _v(w[i]):
                rv = i + 1
                break
    r1, r2 = _std_regions(w, _FR_VOWELS)

    altered = False     # did the last obeyed step alter the word?
    found_ment = False  # was a ment-type ending found in step 1?

    # ---- step 1: standard suffix removal ----
    s = _longest(w, _FR_STEP1)
    if s:
        p = len(w) - len(s)
        before = w
        if s in _FR_G1:
            if p >= r2:
                w = w[:p]
        elif s in _FR_G2:
            if p >= r2:
                w = w[:p]
                if w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif s in ("logie", "logies"):
            if p >= r2:
                w = w[:p] + "log"
        elif s in ("usion", "ution", "usions", "utions"):
            if p >= r2:
                w = w[:p] + "u"
        elif s in ("ence", "ences"):
            if p >= r2:
                w = w[:p] + "ent"
        elif s in ("ement", "ements"):
            if p >= rv:
                w = w[:p]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif w.endswith("eus"):
                    if len(w) - 3 >= r2:
                        w = w[:-3]
                    elif len(w) - 3 >= r1:
                        w = w[:-3] + "eux"
                elif ((w.endswith("abl") or w.endswith("iqU"))
                      and len(w) - 3 >= r2):
                    w = w[:-3]
                elif ((w.endswith("ièr") or w.endswith("Ièr"))
                      and len(w) - 3 >= rv):
                    w = w[:-3] + "i"
        elif s in ("ité", "ités"):
            if p >= r2:
                w = w[:p]
                if w.endswith("abil"):
                    if len(w) - 4 >= r2:
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("if", "ive", "ifs", "ives"):
            if p >= r2:
                w = w[:p]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic"):
                        if len(w) - 2 >= r2:
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif s == "eaux":
            w = w[:p] + "eau"
        elif s == "aux":
            if p >= r1:
                w = w[:p] + "al"
        elif s in ("euse", "euses"):
            if p >= r2:
                w = w[:p]
            elif p >= r1:
                w = w[:p] + "eux"
        elif s in ("issement", "issements"):
            if p >= r1 and p > 0 and not _v(w[p - 1]):
                w = w[:p]
        elif s == "amment":
            found_ment = True
            if p >= rv:
                w = w[:p] + "ant"
        elif s == "emment":
            found_ment = True
            if p >= rv:
                w = w[:p] + "ent"
        else:  # ment, ments
            found_ment = True
            if p >= rv and p > 0 and _v(w[p - 1]) and p - 1 >= rv:
                w = w[:p]
        altered = w != before

    # ---- step 2a: verb suffixes beginning i ----
    # (steps 2a/2b/4 run under "setlimit tomark pV": a suffix crossing
    # RV cannot match and SHORTER candidates are tried — _longest_in)
    if not altered or found_ment:
        s = _longest_in(w, _FR_STEP2A, rv)
        done2a = False
        if s:
            p = len(w) - len(s)
            if (p > 0 and not _v(w[p - 1]) and w[p - 1] != "H"
                    and p - 1 >= rv):
                w = w[:p]
                done2a = True
        altered = done2a
        # ---- step 2b: other verb suffixes ----
        if not done2a:
            s = _longest_in(w, _FR_STEP2B, rv)
            if s:
                p = len(w) - len(s)
                before = w
                if s == "ions":
                    if p >= r2:
                        w = w[:p]
                elif s in _FR_2B_E:
                    w = w[:p]
                else:  # a-group
                    w = w[:p]
                    if w.endswith("e") and len(w) - 1 >= rv:
                        w = w[:-1]
                altered = w != before

    if altered:
        # ---- step 3 ----
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # ---- step 4: residual suffix ----
        if (w.endswith("s") and len(w) >= 2
                and w[-2] not in ("a", "i", "o", "u", "è", "s")):
            w = w[:-1]
        s = _longest_in(w, _FR_STEP4, rv)
        if s:
            p = len(w) - len(s)
            if s == "ion":
                if (p >= r2 and p > 0 and w[p - 1] in "st"
                        and p - 1 >= rv):
                    w = w[:p]
            elif s == "ë":
                # guë: delete the ë when preceded by gu inside RV
                if p >= 2 and w[p - 2:p] == "gu" and p - 2 >= rv:
                    w = w[:p]
            elif s == "e":
                w = w[:p]
            else:  # ier, ière, Ier, Ière
                w = w[:p] + "i"

    # ---- step 5: undouble ----
    if w.endswith(("enn", "onn", "ett", "ell", "eill")):
        w = w[:-1]
    # ---- step 6: un-accent ----
    i = len(w) - 1
    k = 0
    while i >= 0 and not _v(w[i]) and w[i] not in ("é", "è"):
        i -= 1
        k += 1
    if k >= 1 and i >= 0 and w[i] in ("é", "è"):
        w = w[:i] + "e" + w[i + 1:]

    return (w.replace("I", "i").replace("U", "u").replace("Y", "y"))


# ---------------------------------------------------------------------------
# Spanish
# ---------------------------------------------------------------------------

_ES_VOWELS = frozenset("aeiouáéíóúü")
_ES_PRON = _bylen(("me", "se", "sela", "selo", "selas", "selos", "la",
                   "le", "lo", "las", "les", "los", "nos"))
_ES_PRE_A = _bylen(("iéndo", "ándo", "ár", "ér", "ír"))
_ES_PRE_B = _bylen(("ando", "iendo", "ar", "er", "ir"))
_ES_G_A = ("anza", "anzas", "ico", "ica", "icos", "icas", "ismo",
           "ismos", "able", "ables", "ible", "ibles", "ista", "istas",
           "oso", "osa", "osos", "osas", "amiento", "amientos",
           "imiento", "imientos")
_ES_G_B = ("adora", "ador", "ación", "adoras", "adores", "aciones",
           "ante", "antes", "ancia", "ancias")
_ES_STEP1 = _bylen(
    _ES_G_A, _ES_G_B,
    ("logía", "logías"), ("ución", "uciones"), ("encia", "encias"),
    ("amente",), ("mente",), ("idad", "idades"),
    ("iva", "ivo", "ivas", "ivos"),
)
_ES_STEP2A = _bylen(("ya", "ye", "yan", "yen", "yeron", "yendo", "yo",
                     "yó", "yas", "yes", "yais", "yamos"))
_ES_2B_GU = ("en", "es", "éis", "emos")
_ES_2B_PLAIN = (
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
    "aríamos", "aremos", "ará", "aré", "erían", "erías", "erán",
    "erás", "eríais", "ería", "eréis", "eríamos", "eremos", "erá",
    "eré", "irían", "irías", "irán", "irás", "iríais", "iría",
    "iréis", "iríamos", "iremos", "irá", "iré", "aba", "ada", "ida",
    "ía", "ara", "iera", "ad", "ed", "id", "ase", "iese", "aste",
    "iste", "an", "aban", "ían", "aran", "ieran", "asen", "iesen",
    "aron", "ieron", "ado", "ido", "ando", "iendo", "ió", "ar", "er",
    "ir", "as", "abas", "adas", "idas", "ías", "aras", "ieras",
    "ases", "ieses", "ís", "áis", "abais", "íais", "arais", "ierais",
    "aseis", "ieseis", "asteis", "isteis", "ados", "idos", "amos",
    "ábamos", "íamos", "imos", "áramos", "iéramos", "iésemos",
    "ásemos",
)
_ES_STEP2B = _bylen(_ES_2B_GU, _ES_2B_PLAIN)
_ES_3_PLAIN = ("os", "a", "o", "á", "í", "ó")
_ES_STEP3 = _bylen(_ES_3_PLAIN, ("e", "é"))
_ES_UNACCENT = str.maketrans("áéíóú", "aeiou")


def _rv_iberian(w: str, vowels) -> int:
    """RV for Spanish/Portuguese: second letter consonant → after next
    vowel; first two vowels → after next consonant; else after third
    letter; end of word if not found."""
    n = len(w)
    if n < 3:
        return n
    if w[1] not in vowels:
        for i in range(2, n):
            if w[i] in vowels:
                return i + 1
        return n
    if w[0] in vowels and w[1] in vowels:
        for i in range(2, n):
            if w[i] not in vowels:
                return i + 1
        return n
    return 3


def spanish_stem(word: str) -> str:
    """Snowball Spanish: attached-pronoun step 0, standard suffixes,
    y-verb / verb suffixes, residual step, un-accent."""
    w = word
    rv = _rv_iberian(w, _ES_VOWELS)
    r1, r2 = _std_regions(w, _ES_VOWELS)

    # ---- step 0: attached pronoun ----
    s = _longest(w, _ES_PRON)
    if s:
        p = len(w) - len(s)
        base = w[:p]
        a = _longest(base, _ES_PRE_A)
        if a and len(base) - len(a) >= rv:
            # delete pronoun, remove acute accent from the preceding group
            repl = {"iéndo": "iendo", "ándo": "ando", "ár": "ar",
                    "ér": "er", "ír": "ir"}[a]
            w = base[: len(base) - len(a)] + repl
        else:
            b = _longest(base, _ES_PRE_B)
            if b and len(base) - len(b) >= rv:
                w = base
            elif (base.endswith("yendo") and len(base) - 5 >= rv
                  and base[:-5].endswith("u")):
                # yendo in RV following u (the u may precede RV)
                w = base
        # regions are unchanged by this removal (suffix-only edit)

    # ---- step 1: standard suffix removal ----
    changed1 = False
    s = _longest(w, _ES_STEP1)
    if s:
        p = len(w) - len(s)
        before = w
        if s in _ES_G_A:
            if p >= r2:
                w = w[:p]
        elif s in _ES_G_B:
            if p >= r2:
                w = w[:p]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("logía", "logías"):
            if p >= r2:
                w = w[:p] + "log"
        elif s in ("ución", "uciones"):
            if p >= r2:
                w = w[:p] + "u"
        elif s in ("encia", "encias"):
            if p >= r2:
                w = w[:p] + "ente"
        elif s == "amente":
            if p >= r1:
                w = w[:p]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for t in ("os", "ic", "ad"):
                        if w.endswith(t) and len(w) - 2 >= r2:
                            w = w[:-2]
                            break
        elif s == "mente":
            if p >= r2:
                w = w[:p]
                for t in ("ante", "able", "ible"):
                    if w.endswith(t) and len(w) - 4 >= r2:
                        w = w[:-4]
                        break
        elif s in ("idad", "idades"):
            if p >= r2:
                w = w[:p]
                for t in ("abil", "ic", "iv"):
                    if w.endswith(t) and len(w) - len(t) >= r2:
                        w = w[: len(w) - len(t)]
                        break
        else:  # iva ivo ivas ivos
            if p >= r2:
                w = w[:p]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
        changed1 = w != before

    # ---- step 2a: verb suffixes beginning y (if step 1 removed nothing)
    # Both verb amongs run under "setlimit tomark pV" in the reference:
    # a suffix crossing RV cannot match and SHORTER candidates are tried
    # (_longest_in), unlike the standard step's match-then-check.
    if not changed1:
        done2a = False
        s = _longest_in(w, _ES_STEP2A, rv)
        if s:
            p = len(w) - len(s)
            if p > 0 and w[p - 1] == "u":  # the u may precede RV
                w = w[:p]
                done2a = True
        # ---- step 2b: other verb suffixes ----
        if not done2a:
            s = _longest_in(w, _ES_STEP2B, rv)
            if s:
                p = len(w) - len(s)
                w = w[:p]
                if s in _ES_2B_GU and w.endswith("gu"):
                    w = w[:-1]

    # ---- step 3: residual suffix ----
    s = _longest(w, _ES_STEP3)
    if s:
        p = len(w) - len(s)
        if s in _ES_3_PLAIN:
            if p >= rv:
                w = w[:p]
        else:  # e, é
            if p >= rv:
                w = w[:p]
                if (w.endswith("gu") and len(w) - 1 >= rv):
                    w = w[:-1]

    return w.translate(_ES_UNACCENT)


# ---------------------------------------------------------------------------
# Portuguese
# ---------------------------------------------------------------------------

_PT_VOWELS = frozenset("aeiouáéíóúâêô")
_PT_G_A = ("eza", "ezas", "ico", "ica", "icos", "icas", "ismo",
           "ismos", "ável", "ível", "ista", "istas", "oso", "osa",
           "osos", "osas", "amento", "amentos", "imento", "imentos",
           "adora", "ador", "aça~o", "adoras", "adores", "aço~es",
           "ante", "antes", "ância")
_PT_STEP1 = _bylen(
    _PT_G_A,
    # this vintage lists the Spanish-looking forms logía/ución in
    # the Portuguese table (PortugueseStemmer.java a_5), not
    # logia/ução — keep them verbatim for parity
    ("logía", "logías"), ("ución", "uciones"), ("ência", "ências"),
    ("amente",), ("mente",), ("idade", "idades"),
    ("iva", "ivo", "ivas", "ivos"), ("ira", "iras"),
)
_PT_STEP2 = _bylen((
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
    "era", "irá", "ira", "iras", "ava", "asse", "esse", "isse",
    "aste", "este",
    "iste", "ei", "arei", "erei", "irei", "am", "iam", "ariam",
    "eriam", "iriam", "aram", "eram", "iram", "avam", "em", "arem",
    "erem", "irem", "assem", "essem", "issem", "ado", "ido", "ando",
    "endo", "indo", "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as",
    "adas", "idas", "ias", "arias", "erias", "irias", "arás", "aras",
    "erás", "eras", "irás", "avas", "es", "ardes", "erdes", "irdes",
    "ares", "eres", "ires", "asses", "esses", "isses", "astes",
    "estes", "istes", "is", "ais", "eis", "íeis", "aríeis", "eríeis",
    "iríeis", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
    "ásseis", "ésseis", "ísseis", "áveis", "ados", "idos", "ámos",
    "amos", "íamos", "aríamos", "eríamos", "iríamos", "áramos",
    "éramos", "íramos", "ávamos", "emos", "aremos", "eremos",
    "iremos", "ássemos", "êssemos", "íssemos", "imos", "armos",
    "ermos", "irmos", "eu", "iu", "ou",
))
_PT_STEP4 = _bylen(("os", "a", "i", "o", "á", "í", "ó"))


def portuguese_stem(word: str) -> str:
    """Snowball Portuguese: nasal vowels marked (ã→a~, õ→o~), standard /
    verb / residual suffix steps, final e/é/ê + cedilla cleanup."""
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv = _rv_iberian(w, _PT_VOWELS)
    r1, r2 = _std_regions(w, _PT_VOWELS)

    changed1 = False
    s = _longest(w, _PT_STEP1)
    if s:
        p = len(w) - len(s)
        before = w
        if s in _PT_G_A:
            if p >= r2:
                w = w[:p]
        elif s in ("logía", "logías"):
            if p >= r2:
                w = w[:p] + "log"
        elif s in ("ución", "uciones"):
            if p >= r2:
                w = w[:p] + "u"
        elif s in ("ência", "ências"):
            if p >= r2:
                w = w[:p] + "ente"
        elif s == "amente":
            if p >= r1:
                w = w[:p]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for t in ("os", "ic", "ad"):
                        if w.endswith(t) and len(w) - 2 >= r2:
                            w = w[:-2]
                            break
        elif s == "mente":
            if p >= r2:
                w = w[:p]
                for t in ("ante", "avel", "ível"):
                    if w.endswith(t) and len(w) - 4 >= r2:
                        w = w[:-4]
                        break
        elif s in ("idade", "idades"):
            if p >= r2:
                w = w[:p]
                for t in ("abil", "ic", "iv"):
                    if w.endswith(t) and len(w) - len(t) >= r2:
                        w = w[: len(w) - len(t)]
                        break
        elif s in ("iva", "ivo", "ivas", "ivos"):
            if p >= r2:
                w = w[:p]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
        else:  # ira, iras
            if p >= rv and p > 0 and w[p - 1] == "e":
                w = w[:p] + "ir"
        changed1 = w != before

    changed2 = False
    if not changed1:
        # verb among runs under "setlimit tomark pV": suffixes crossing
        # RV cannot match and shorter candidates are tried
        s = _longest_in(w, _PT_STEP2, rv)
        if s:
            w = w[: len(w) - len(s)]
            changed2 = True

    if changed1 or changed2:
        # step 3: delete i if in RV and preceded by c
        if w.endswith("ci") and len(w) - 1 >= rv:
            w = w[:-1]
    else:
        # step 4: residual suffix
        s = _longest(w, _PT_STEP4)
        if s:
            p = len(w) - len(s)
            if p >= rv:
                w = w[:p]

    # step 5: final e/é/ê in RV; then gu/ci undouble; ç→c
    if w and w[-1] in ("e", "é", "ê") and len(w) - 1 >= rv:
        w = w[:-1]
        if ((w.endswith("gu") or w.endswith("ci"))
                and len(w) - 1 >= rv):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# ---------------------------------------------------------------------------
# Russian
# ---------------------------------------------------------------------------

_RU_VOWELS = frozenset("аеиоуыэюя")
_RU_PG_1 = ("в", "вши", "вшись")
_RU_PG_2 = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
_RU_PGERUND = _bylen(_RU_PG_1, _RU_PG_2)
_RU_ADJ = _bylen((
    "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой",
    "ем", "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых",
    "ую", "юю", "ая", "яя", "ою", "ею",
))
_RU_PART_1 = ("ем", "нн", "вш", "ющ", "щ")
_RU_PART_2 = ("ивш", "ывш", "ующ")
_RU_PART = _bylen(_RU_PART_1, _RU_PART_2)
_RU_VERB_1 = ("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н",
              "ло", "но", "ет", "ют", "ны", "ть", "ешь", "нно")
_RU_VERB_2 = ("ила", "ыла", "ена", "ейте", "уйте", "ите", "или",
              "ыли", "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ило",
              "ыло", "ено", "ят", "ует", "уют", "ит", "ыт", "ены",
              "ить", "ыть", "ишь", "ую", "ю")
_RU_VERB = _bylen(_RU_VERB_1, _RU_VERB_2)
_RU_NOUN = _bylen((
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи",
    "ии", "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием",
    "ем", "ам", "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию",
    "ью", "ю", "ия", "ья", "я",
))
_RU_SUPER = _bylen(("ейш", "ейше"))
_RU_DERIV = _bylen(("ост", "ость"))


def russian_stem(word: str) -> str:
    """Snowball Russian: everything after the first vowel (RV) runs
    through perfective-gerund / reflexive / adjectival / verb / noun
    stripping, then и, derivational (R2) and tidying steps. NOTE: this
    Lucene vintage does NOT fold ё->е (the grouping table omits ё and
    RussianAnalyzer applies no prefilter), so neither do we."""
    w = word
    n = len(w)
    rv = n
    for i in range(n):
        if w[i] in _RU_VOWELS:
            rv = i + 1
            break
    r1, r2 = _std_regions(w, _RU_VOWELS)

    head, body = w[:rv], w[rv:]

    def _strip(b: str, sufs, need_ajat=()) -> tuple[str, bool]:
        s = _longest(b, sufs)
        if not s:
            return b, False
        if s in need_ajat:
            p = len(b) - len(s)
            if p > 0 and b[p - 1] in ("а", "я"):
                return b[:p], True
            return b, False
        return b[: len(b) - len(s)], True

    # step 1
    body, done = _strip(body, _RU_PGERUND, need_ajat=_RU_PG_1)
    if not done:
        body, _ = _strip(body, _bylen(("ся", "сь")))
        body, adj = _strip(body, _RU_ADJ)
        if adj:
            body, _ = _strip(body, _RU_PART, need_ajat=_RU_PART_1)
        else:
            body, vb = _strip(body, _RU_VERB, need_ajat=_RU_VERB_1)
            if not vb:
                body, _ = _strip(body, _RU_NOUN)

    # step 2
    if body.endswith("и"):
        body = body[:-1]

    # step 3: derivational, must be in R2
    s = _longest(body, _RU_DERIV)
    if s and rv + len(body) - len(s) >= r2:
        body = body[: len(body) - len(s)]

    # step 4
    if body.endswith("нн"):
        body = body[:-1]
    else:
        s = _longest(body, _RU_SUPER)
        if s:
            body = body[: len(body) - len(s)]
            if body.endswith("нн"):
                body = body[:-1]
        elif body.endswith("ь"):
            body = body[:-1]

    return head + body


# ---------------------------------------------------------------------------
# Scandinavian family (Danish / Norwegian / Swedish)
#
# All three share the structure of the published algorithms (and the
# reference's generated programs, org/tartarus/snowball/ext/
# {Danish,Norwegian,Swedish}Stemmer.java): R1 with a 3-letter minimum,
# a main-suffix step with an s-ending side condition, a consonant-pair
# step that removes the final letter, and an other-suffix step.
# ---------------------------------------------------------------------------


def _longest_in(w: str, sufs, r: int) -> str | None:
    """Longest suffix of ``w`` lying wholly inside the region starting at
    offset ``r`` (Snowball's find_among_b under "setlimit tomark p1":
    shorter suffixes ARE tried when a longer one crosses the boundary)."""
    for s in sufs:
        if w.endswith(s) and len(w) - len(s) >= r:
            return s
    return None


_DA_VOWELS = frozenset("aeiouyæåø")
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")
_DA_STEP1 = _bylen((
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer", "s",
    "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
    "hedens", "erens", "ers", "ets", "erets", "et", "eret",
))
_DA_PAIRS = ("gd", "dt", "gt", "kt")
_DA_OTHER = _bylen(("ig", "lig", "elig", "els", "løst"))


def danish_stem(word: str) -> str:
    """Snowball Danish: R1(>=3) main suffixes, s after a valid s-ending,
    consonant-pair trim, igst/ig/lig/elig/els/løst, and undoubling."""
    w = word
    r1 = max(_std_regions(w, _DA_VOWELS)[0], 3)

    def cons_pair(w: str) -> str:
        if len(w) - 2 >= r1 and w[-2:] in _DA_PAIRS:
            return w[:-1]
        return w

    s = _longest_in(w, _DA_STEP1, r1)
    if s == "s":
        if len(w) >= 2 and w[-2] in _DA_S_END:
            w = w[:-1]
    elif s:
        w = w[: len(w) - len(s)]

    w = cons_pair(w)

    if w.endswith("igst"):
        w = w[:-2]
    s = _longest_in(w, _DA_OTHER, r1)
    if s == "løst":
        w = w[:-1]
    elif s:
        w = w[: len(w) - len(s)]
        w = cons_pair(w)

    if (len(w) >= 2 and len(w) - 1 >= r1 and w[-1] not in _DA_VOWELS
            and w[-1] == w[-2]):
        w = w[:-1]
    return w


_NO_VOWELS = frozenset("aeiouyæåø")
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")
_NO_STEP1 = _bylen((
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "erte",
    "en", "heten", "ar", "er", "heter", "s", "as", "es", "edes",
    "endes", "enes", "hetenes", "ens", "hetens", "ers", "ets", "et",
    "het", "ert", "ast",
))
_NO_OTHER = _bylen(("leg", "eleg", "ig", "eig", "lig", "elig", "els",
                    "lov", "elov", "slov", "hetslov"))


def norwegian_stem(word: str) -> str:
    """Snowball Norwegian: R1(>=3) main suffixes (erte/ert -> er; s after
    a valid s-ending or k-after-consonant), dt/vt trim, other suffixes."""
    w = word
    r1 = max(_std_regions(w, _NO_VOWELS)[0], 3)

    s = _longest_in(w, _NO_STEP1, r1)
    if s in ("erte", "ert"):
        w = w[: len(w) - len(s)] + "er"
    elif s == "s":
        prev = w[-2] if len(w) >= 2 else ""
        if prev in _NO_S_END or (
            prev == "k" and len(w) >= 3 and w[-3] not in _NO_VOWELS
        ):
            w = w[:-1]
    elif s:
        w = w[: len(w) - len(s)]

    if len(w) - 2 >= r1 and w[-2:] in ("dt", "vt"):
        w = w[:-1]

    s = _longest_in(w, _NO_OTHER, r1)
    if s:
        w = w[: len(w) - len(s)]
    return w


_SV_VOWELS = frozenset("aeiouyäåö")
_SV_S_END = frozenset("bcdfghjklmnoprtvy")
_SV_STEP1 = _bylen((
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
    "er", "heter", "or", "s", "as", "arnas", "ernas", "ornas", "es",
    "ades", "andes", "ens", "arens", "hetens", "erns", "at", "andet",
    "het", "ast",
))
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_OTHER = _bylen(("ig", "lig", "els", "fullt", "löst"))


def swedish_stem(word: str) -> str:
    """Snowball Swedish: R1(>=3) main suffixes, s after a valid s-ending,
    consonant-pair trim, ig/lig/els delete + fullt/löst undress."""
    w = word
    r1 = max(_std_regions(w, _SV_VOWELS)[0], 3)

    s = _longest_in(w, _SV_STEP1, r1)
    if s == "s":
        if len(w) >= 2 and w[-2] in _SV_S_END:
            w = w[:-1]
    elif s:
        w = w[: len(w) - len(s)]

    if len(w) - 2 >= r1 and w[-2:] in _SV_PAIRS:
        w = w[:-1]

    s = _longest_in(w, _SV_OTHER, r1)
    if s in ("fullt", "löst"):
        w = w[:-1]
    elif s:
        w = w[: len(w) - len(s)]
    return w


# ---------------------------------------------------------------------------
# Italian (org/tartarus/snowball/ext/ItalianStemmer.java; the published
# Romance structure shared with the Spanish/Portuguese implementations
# above: prelude marks, RV/R1/R2, pronoun step, standard vs verb
# suffixes, vowel tidy-up)
# ---------------------------------------------------------------------------

_IT_VOWELS = frozenset("aeiouàèìòù")
_IT_PRON = _bylen((
    "la", "cela", "gliela", "mela", "tela", "vela", "le", "cele",
    "gliele", "mele", "tele", "vele", "ne", "cene", "gliene", "mene",
    "sene", "tene", "vene", "ci", "li", "celi", "glieli", "meli",
    "teli", "veli", "gli", "mi", "si", "ti", "vi", "lo", "celo",
    "glielo", "melo", "telo", "velo",
))
_IT_PRON_PRE = _bylen(("ando", "endo"), ("ar", "er", "ir"))
_IT_G1 = ("ica", "osa", "ista", "anza", "ice", "atrice", "iche",
          "abile", "ibile", "ose", "ante", "mente", "iste", "anze",
          "ici", "atrici", "ichi", "abili", "ibili", "ismi",
          "osi", "anti", "isti", "ico", "ismo", "oso", "istà", "istè",
          "istì")
_IT_STD = _bylen(
    _IT_G1,
    ("logia", "logie"), ("azione", "azioni", "atore", "atori"),
    ("usione", "uzione", "usioni", "uzioni"), ("enza", "enze"),
    ("amento", "amenti", "imento", "imenti"), ("amente",),
    ("ità",), ("iva", "ive", "ivi", "ivo"),
)
_IT_VERB = _bylen((
    "isca", "enda", "ata", "ita", "uta", "ava", "eva", "iva",
    "erebbe", "irebbe", "isce", "ende", "are", "ere", "ire", "asse",
    "ate", "avate", "evate", "ivate", "ete", "erete", "irete", "ite",
    "ereste", "ireste", "ute", "erai", "irai", "isci", "endi", "erei",
    "irei", "assi", "ati", "iti", "eresti", "iresti", "uti", "avi",
    "evi", "ivi", "isco", "ando", "endo", "Yamo", "iamo", "avamo",
    "evamo", "ivamo", "eremo", "iremo", "assimo", "ammo", "emmo",
    "eremmo", "iremmo", "immo", "ano", "iscano", "avano", "evano",
    "ivano", "eranno", "iranno", "ono", "iscono", "arono", "erono",
    "irono", "erebbero", "irebbero", "assero", "essero", "issero",
    "ato", "ito", "uto", "avo", "evo", "ivo", "ar", "ir", "erà",
    "irà", "erò", "irò",
))
_IT_AEIO = frozenset("aeioàèìò")


def italian_stem(word: str) -> str:
    """Snowball Italian: accent fold-to-grave + qu/intervocalic u,i
    marking, attached-pronoun strip, standard-else-verb suffixes in
    RV/R1/R2, final-vowel + ch/gh tidy."""
    w = word
    for a, b in (("á", "à"), ("é", "è"), ("í", "ì"),
                 ("ó", "ò"), ("ú", "ù")):
        w = w.replace(a, b)
    w = w.replace("qu", "qU")
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if (chars[i] in ("u", "i") and chars[i - 1] in _IT_VOWELS
                and chars[i + 1] in _IT_VOWELS):
            chars[i] = chars[i].upper()
    w = "".join(chars)

    rv = _rv_iberian(w, _IT_VOWELS)
    r1, r2 = _std_regions(w, _IT_VOWELS)

    # step 0: attached pronoun — preceding ando/endo (delete) or
    # ar/er/ir (replace pronoun with e), the preceding part in RV
    s = _longest(w, _IT_PRON)
    if s:
        stem_part = w[: len(w) - len(s)]
        m = _longest(stem_part, _IT_PRON_PRE)
        if m and len(stem_part) - len(m) >= rv:
            w = stem_part if m in ("ando", "endo") else stem_part + "e"

    # step 1: standard suffixes (longest match anywhere; conditions
    # carry the region checks, with no shorter-suffix fallback)
    before = w
    s = _longest(w, _IT_STD)
    if s:
        p = len(w) - len(s)
        if s in ("amento", "amenti", "imento", "imenti"):
            if p >= rv:
                w = w[:p]
        elif s == "amente":
            if p >= r1:
                w = w[:p]
                t = _longest_in(w, _bylen(("ic", "abil", "os", "iv")), r2)
                if t:
                    w = w[: len(w) - len(t)]
                    if t == "iv" and _longest_in(w, ("at",), r2):
                        w = w[:-2]
        elif p >= r2:
            if s in ("logia", "logie"):
                w = w[:p] + "log"
            elif s in ("usione", "uzione", "usioni", "uzioni"):
                w = w[:p] + "u"
            elif s in ("enza", "enze"):
                w = w[:p] + "ente"
            elif s in ("azione", "azioni", "atore", "atori"):
                w = w[:p]
                if _longest_in(w, ("ic",), r2):
                    w = w[:-2]
            elif s == "ità":
                w = w[:p]
                t = _longest_in(w, _bylen(("ic", "abil", "iv")), r2)
                if t:
                    w = w[: len(w) - len(t)]
            elif s in ("iva", "ive", "ivi", "ivo"):
                w = w[:p]
                if _longest_in(w, ("at",), r2):
                    w = w[:-2]
                    if _longest_in(w, ("ic",), r2):
                        w = w[:-2]
            else:
                w = w[:p]

    # step 2: verb suffixes in RV, only if step 1 removed nothing
    if w == before:
        s = _longest_in(w, _IT_VERB, rv)
        if s:
            w = w[: len(w) - len(s)]

    # step 3a: final vowel (and then i) in RV
    if w and w[-1] in _IT_AEIO and len(w) - 1 >= rv:
        w = w[:-1]
        if w and w[-1] == "i" and len(w) - 1 >= rv:
            w = w[:-1]
    # step 3b: ch/gh -> c/g; the RV test applies at the c/g position
    # (the generated code calls RV after consuming both chars)
    if len(w) >= 2 and w[-1] == "h" and w[-2] in ("c", "g") \
            and len(w) - 2 >= rv:
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Dutch (org/tartarus/snowball/ext/DutchStemmer.java)
# ---------------------------------------------------------------------------

_NL_VOWELS = frozenset("aeiouyè")
_NL_STEP1 = _bylen(("heden",), ("ene", "en"), ("se", "s"))


def dutch_stem(word: str) -> str:
    """Snowball Dutch: accent strip + y/i marking, en/s/e suffixes with
    ending conditions and kk/dd/tt undoubling, heid + d-suffixes,
    final double-vowel undoubling (maan -> man)."""
    w = word
    for a, b in (("ä", "a"), ("á", "a"), ("ë", "e"), ("é", "e"),
                 ("ï", "i"), ("í", "i"), ("ö", "o"), ("ó", "o"),
                 ("ü", "u"), ("ú", "u")):
        w = w.replace(a, b)
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    i = 1
    while i < len(chars):
        if chars[i - 1] in _NL_VOWELS:
            if (chars[i] == "i" and i + 1 < len(chars)
                    and chars[i + 1] in _NL_VOWELS):
                chars[i] = "I"
            elif chars[i] == "y":
                chars[i] = "Y"
        i += 1
    w = "".join(chars)

    r1, r2 = _std_regions(w, _NL_VOWELS)
    r1 = max(r1, 3)
    e_found = False

    def undouble(w: str) -> str:
        if w[-2:] in ("kk", "dd", "tt"):
            return w[:-1]
        return w

    def en_ending(w: str) -> str:
        # R1, preceded by a non-vowel that isn't part of 'gem', then
        # undouble (the caller already stripped en/ene)
        return undouble(w)

    # step 1
    s = _longest(w, _NL_STEP1)
    if s == "heden":
        if len(w) - 5 >= r1:
            w = w[:-5] + "heid"
    elif s in ("en", "ene"):
        p = len(w) - len(s)
        if (p >= r1 and p > 0 and w[p - 1] not in _NL_VOWELS
                and w[max(0, p - 3):p] != "gem"):
            w = en_ending(w[:p])
    elif s in ("s", "se"):
        p = len(w) - len(s)
        if p >= r1 and p > 0 and w[p - 1] not in _NL_VOWELS \
                and w[p - 1] != "j":
            w = w[:p]

    # step 2: final e after a non-vowel in R1, then undouble
    if (w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2
            and w[-2] not in _NL_VOWELS):
        w = undouble(w[:-1])
        e_found = True

    # step 3a: heid (not after c) in R2, then the en treatment
    if w.endswith("heid") and len(w) - 4 >= r2 \
            and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en"):
            p = len(w) - 2
            if (p >= r1 and p > 0 and w[p - 1] not in _NL_VOWELS
                    and w[max(0, p - 3):p] != "gem"):
                w = en_ending(w[:p])

    # step 3b: d-suffixes
    s = _longest(w, _bylen(("end", "ing"), ("lijk",), ("baar",),
                           ("bar",), ("ig",)))
    if s in ("end", "ing"):
        p = len(w) - 3
        if p >= r2:
            w = w[:p]
            if (w.endswith("ig") and len(w) - 2 >= r2
                    and (len(w) < 3 or w[-3] != "e")):
                w = w[:-2]
            else:
                w = undouble(w)
    elif s == "ig":
        p = len(w) - 2
        if p >= r2 and (len(w) < 3 or w[-3] != "e"):
            w = w[:p]
    elif s == "lijk":
        p = len(w) - 4
        if p >= r2:
            w = w[:p]
            if (w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2
                    and w[-2] not in _NL_VOWELS):
                w = undouble(w[:-1])
                e_found = True
    elif s == "baar":
        if len(w) - 4 >= r2:
            w = w[:-4]
    elif s == "bar":
        if len(w) - 3 >= r2 and e_found:
            w = w[:-3]

    # step 4: undouble vowel — C V V D with D a non-vowel other than I
    if (len(w) >= 4 and w[-1] not in _NL_VOWELS and w[-1] != "I"
            and w[-2] == w[-3] and w[-2] in "aeou"
            and w[-4] not in _NL_VOWELS):
        w = w[:-2] + w[-1]

    return w.replace("Y", "y").replace("I", "i")


# ---------------------------------------------------------------------------
# Romanian (org/tartarus/snowball/ext/RomanianStemmer.java; the published
# algorithm: step 0 plural/article in R1, repeated combo suffixes in R1,
# standard suffixes in R2 — verb suffixes in RV only if nothing standard
# was removed — then a final vowel in RV)
# ---------------------------------------------------------------------------

_RO_VOWELS = frozenset("aeiouâîă")
_RO_STEP0 = _bylen((
    "ea", "aţia", "aua", "iua", "aţie", "ele", "ile", "iile", "iei",
    "atei", "ii", "ului", "ul", "elor", "ilor", "iilor",
))
_RO_COMBO = _bylen((
    "abilitate", "abilitati", "abilităi", "abilităţi", "ibilitate",
    "ivitate", "ivitati", "ivităi", "ivităţi",
    "icala", "iciva", "icale", "icitate", "icive", "icali", "icatori",
    "icitati", "icivi", "icităi", "icităţi", "ical", "icator", "iciv",
    "icală", "icivă",
    "ativa", "aţiune", "atoare", "ătoare", "ative", "atori", "ători",
    "ator", "ător", "ativ", "ativă",
    "itiva", "iţiune", "itoare", "itive", "itivi", "itori", "itor",
    "itiv", "itivă",
))
_RO_COMBO_REPL = {}
for _s in ("abilitate", "abilitati", "abilităi", "abilităţi"):
    _RO_COMBO_REPL[_s] = "abil"
_RO_COMBO_REPL["ibilitate"] = "ibil"
for _s in ("ivitate", "ivitati", "ivităi", "ivităţi"):
    _RO_COMBO_REPL[_s] = "iv"
for _s in ("icala", "iciva", "icale", "icitate", "icive", "icali",
           "icatori", "icitati", "icivi", "icităi", "icităţi", "ical",
           "icator", "iciv", "icală", "icivă"):
    _RO_COMBO_REPL[_s] = "ic"
for _s in ("ativa", "aţiune", "atoare", "ătoare", "ative", "atori",
           "ători", "ator", "ător", "ativ", "ativă"):
    _RO_COMBO_REPL[_s] = "at"
for _s in ("itiva", "iţiune", "itoare", "itive", "itivi", "itori",
           "itor", "itiv", "itivă"):
    _RO_COMBO_REPL[_s] = "it"
_RO_STD_DEL = ("ica", "abila", "ibila", "oasa", "ata", "ita", "anta",
               "uta", "iva", "ic", "ice", "abile", "ibile", "oase",
               "ate", "itate", "ite", "ante", "ute", "ive", "ici",
               "abili", "ibili", "atori", "osi", "ati", "itati", "iti",
               "anti", "uti", "ivi", "ităi", "oşi", "ităţi", "abil",
               "ibil", "ator", "os", "at", "it", "ant", "ut", "iv",
               "ică", "abilă", "ibilă", "oasă", "ată", "ită", "antă",
               "ută", "ivă")
_RO_STD_IST = ("isme", "ista", "iste", "isti", "ism", "ist", "istă",
               "işti")
_RO_STD = _bylen(_RO_STD_DEL, ("iune", "iuni"), _RO_STD_IST)
_RO_VERB_PLAIN = frozenset((
    "se", "sese", "sei", "seşi", "seseşi", "aţi", "eţi", "iţi", "âţi",
    "serăţi", "seserăţi", "em", "sesem", "im", "âm", "ăm", "serăm",
    "seserăm", "seră", "seseră",
))
_RO_VERB = _bylen((
    "ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere", "ire", "âre",
    "se", "ase", "sese", "ise", "use", "âse", "eşte", "ăşte", "eze",
    "ai", "eai", "iai", "sei", "eşti", "ăşti", "ui", "ezi", "âi",
    "aşi", "seşi", "aseşi", "seseşi", "iseşi", "useşi", "âseşi", "işi",
    "uşi", "âşi", "aţi", "eaţi", "iaţi", "eţi", "iţi", "âţi", "arăţi",
    "serăţi", "aserăţi", "seserăţi", "iserăţi", "userăţi", "âserăţi",
    "irăţi", "urăţi", "ârăţi", "am", "eam", "iam", "em", "asem",
    "sesem", "isem", "usem", "âsem", "im", "âm", "ăm", "arăm", "serăm",
    "aserăm", "seserăm", "iserăm", "userăm", "âserăm", "irăm", "urăm",
    "ârăm", "au", "eau", "iau", "indu", "ându", "ez", "ească", "ară",
    "seră", "aseră", "seseră", "iseră", "useră", "âseră", "iră", "ură",
    "âră", "ează",
))
_RO_VOWEL_SUF = _bylen(("ie",), ("a", "e", "i", "ă"))


def romanian_stem(word: str) -> str:
    """Snowball Romanian: i/u-between-vowels marking, step 0 in R1,
    repeated combo suffixes, standard (R2) else verb (RV) suffixes,
    final-vowel tidy."""
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if (chars[i] in ("u", "i") and chars[i - 1] in _RO_VOWELS
                and chars[i + 1] in _RO_VOWELS):
            chars[i] = chars[i].upper()
    w = "".join(chars)

    rv = _rv_iberian(w, _RO_VOWELS)
    r1, r2 = _std_regions(w, _RO_VOWELS)

    # step 0 (R1)
    s = _longest(w, _RO_STEP0)
    if s and len(w) - len(s) >= r1:
        p = len(w) - len(s)
        if s in ("ul", "ului"):
            w = w[:p]
        elif s == "aua":
            w = w[:p] + "a"
        elif s in ("ea", "ele", "elor"):
            w = w[:p] + "e"
        elif s in ("ii", "iua", "iei", "iile", "ilor", "iilor"):
            w = w[:p] + "i"
        elif s == "ile":
            if not w[:p].endswith("ab"):
                w = w[:p] + "i"
        elif s == "atei":
            w = w[:p] + "at"
        else:  # aţia / aţie
            w = w[:p] + "aţi"

    # standard suffixes: repeat combo (R1), then a_3 (R2)
    removed_std = False
    while True:
        s = _longest(w, _RO_COMBO)
        if s and len(w) - len(s) >= r1:
            w = w[: len(w) - len(s)] + _RO_COMBO_REPL[s]
            removed_std = True
        else:
            break
    s = _longest(w, _RO_STD)
    if s and len(w) - len(s) >= r2:
        p = len(w) - len(s)
        if s in ("iune", "iuni"):
            if w[:p].endswith("ţ"):
                w = w[: p - 1] + "t"
                removed_std = True
        elif s in _RO_STD_IST:
            w = w[:p] + "ist"
            removed_std = True
        else:
            w = w[:p]
            removed_std = True

    # verb suffixes in RV, only if the standard step removed nothing
    if not removed_std:
        s = _longest_in(w, _RO_VERB, rv)
        if s:
            p = len(w) - len(s)
            if s in _RO_VERB_PLAIN:
                w = w[:p]
            elif p - 1 >= rv and (w[p - 1] not in _RO_VOWELS
                                  or w[p - 1] in ("u", "U")):
                w = w[:p]

    # final vowel: longest match anywhere, RV as a condition (the
    # reference has no setlimit here — an 'ie' straddling RV is a miss,
    # not an 'e' strip)
    s = _longest(w, _RO_VOWEL_SUF)
    if s and len(w) - len(s) >= rv:
        w = w[: len(w) - len(s)]

    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Finnish (org/tartarus/snowball/ext/FinnishStemmer.java; the published
# algorithm: particles/possessives/case endings in R1, comparatives in
# R2, i/t-plural, then a tidy pass ending in consonant undoubling).
# Grouping tables decoded from the generated program's bit vectors:
# V1 = aeiouyäö, V2 = V1 minus y, AEI = aeiä, particle_end = V1+{n,t}.
# Suffix-table nuances kept: no hun/hyn case endings in this Lucene
# vintage, and den/seen/tten/siin carry VI/LONG match-time conditions
# whose failure falls back to the bare 'n' entry (the among-tree parent),
# while switch-time conditions (hXn, tta, a/ä after cv) fail outright.
# All post-match context tests run with the R1 limit lifted (the
# generated code restores limit_backward before the switch), so 'kse'->
# 'ksi' etc. may look left of R1; tidy's four steps are the exception —
# they stay limited to R1 through the final undouble, which is not.
# ---------------------------------------------------------------------------

_FI_VOWELS = frozenset("aeiouyäö")  # g_V1
_FI_V2 = frozenset("aeiouäö")       # g_V2 (no y): the VI test's vowels
_FI_AEI = frozenset("aeiä")         # g_AEI
_FI_PARTICLE_END = _FI_VOWELS | {"n", "t"}
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_AN_PRE = ("lla", "na", "ssa", "ta", "lta", "sta")
_FI_AEN_PRE = ("llä", "nä", "ssä", "tä", "ltä", "stä")
_FI_CASE_HXN = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
                "hän": "ä", "hön": "ö"}
_FI_CASE_PLAIN3 = frozenset((
    "lla", "ssa", "lta", "sta", "lle", "ine", "ksi",
    "llä", "ssä", "ltä", "stä",
))
# longest-first among order (a_6); within a length suffixes are disjoint
_FI_CASE_ORDER = (
    "seen", "siin", "tten",
    "lla", "ssa", "lta", "sta", "tta", "lle", "ine", "ksi",
    "han", "den", "hen", "hin", "hon", "hän", "hön",
    "llä", "ssä", "ltä", "stä", "ttä",
    "na", "ta", "nä", "tä",
    "n", "a", "ä",
)
_FI_OTHER = (
    "imma", "impa", "immi", "impi", "immä", "impä",
    "eja", "ejä", "mma", "mpa", "mmi", "mpi", "mmä", "mpä",
)
_FI_OTHER_PO = frozenset(("mma", "mpa", "mmi", "mpi", "mmä", "mpä"))


def _fi_strip_n(w: str) -> str:
    """Case ending 'n': delete it, and one more char when the stem then
    ends in a long vowel or 'ie' (case 7's try-block)."""
    st = w[:-1]
    if st[-2:] in _FI_LONG or st.endswith("ie"):
        st = st[:-1]
    return st


def _fi_case_ending(w: str, r1: int) -> tuple[str, bool]:
    """Step 3 (case endings) in R1; returns (word, ending_removed)."""
    for s in _FI_CASE_ORDER:
        n = len(w)
        if not w.endswith(s) or n - len(s) < r1:
            continue  # crossing R1: the among tries shorter suffixes
        st = w[: n - len(s)]
        if s in ("siin", "tten", "den", "seen"):
            # These carry VI/LONG match-time conditions in the algorithm,
            # BUT this Lucene vintage invokes Among condition methods on
            # the static empty methodObject (SnowballProgram.find_among_b
            # reflection), so they ALWAYS fail and fall back to the
            # among-tree parent 'n'. Bug-for-bug parity, verified against
            # the compiled reference programs (tools/fuzz_snowball.py).
            return _fi_strip_n(w), True
        if s in ("tta", "ttä"):
            return (st, True) if st.endswith("e") else (w, False)
        if s in _FI_CASE_HXN:
            ok = st.endswith(_FI_CASE_HXN[s])
            return (st, True) if ok else (w, False)
        if s == "n":
            return _fi_strip_n(w), True
        if s in ("a", "ä"):
            # preceded by cv (consonant then vowel, left of the suffix)
            ok = (len(st) >= 2 and st[-1] in _FI_VOWELS
                  and st[-2] not in _FI_VOWELS)
            return (st, True) if ok else (w, False)
        return st, True  # plain 2/3-letter case endings
    return w, False


def finnish_stem(word: str) -> str:
    """Snowball Finnish over the region/suffix helpers above."""
    w = word
    r1, r2 = _std_regions(w, _FI_VOWELS)

    # step 1: particles (R1; kin-family needs vowel/n/t before, sti R2)
    for s in ("kaan", "kään", "kin", "han", "hän", "sti", "ko", "kö",
              "pa", "pä"):
        n = len(w)
        if not w.endswith(s) or n - len(s) < r1:
            continue
        if s == "sti":
            if n - 3 >= r2:
                w = w[:-3]
        else:
            st = w[: n - len(s)]
            if st and st[-1] in _FI_PARTICLE_END:
                w = st
        break

    # step 2: possessives (R1)
    for s in ("nsa", "nsä", "mme", "nne", "si", "ni", "an", "än", "en"):
        n = len(w)
        if not w.endswith(s) or n - len(s) < r1:
            continue
        st = w[: n - len(s)]
        if s == "si":
            if not st.endswith("k"):
                w = st
        elif s == "ni":
            w = st[:-3] + "ksi" if st.endswith("kse") else st
        elif s in ("nsa", "nsä", "mme", "nne"):
            w = st
        elif s == "an":
            if st.endswith(_FI_AN_PRE):
                w = st
        elif s == "än":
            if st.endswith(_FI_AEN_PRE):
                w = st
        else:  # en
            if st.endswith(("lle", "ine")):
                w = st
        break

    # step 3: case endings (R1)
    w, removed = _fi_case_ending(w, r1)

    # step 4: comparatives etc. (R2); mp*/mm* blocked after 'po'
    for s in _FI_OTHER:
        n = len(w)
        if not w.endswith(s) or n - len(s) < r2:
            continue
        st = w[: n - len(s)]
        if not (s in _FI_OTHER_PO and st.endswith("po")):
            w = st
        break

    # step 5: i-plural after a removed case ending, else t-plural
    if removed:
        if w[-1:] in ("i", "j") and len(w) - 1 >= r1:
            w = w[:-1]
    else:
        n = len(w)
        if (w.endswith("t") and n - 2 >= r1 and w[-2] in _FI_VOWELS):
            w = w[:-1]
            for s in ("imma", "mma"):
                n = len(w)
                if not w.endswith(s) or n - len(s) < r2:
                    continue
                st = w[: n - len(s)]
                if not (s == "mma" and st.endswith("po")):
                    w = st
                break

    # step 6: tidy (each sub-step within R1)
    if len(w) - 2 >= r1 and w[-2:] in _FI_LONG:
        w = w[:-1]
    if (len(w) - 2 >= r1 and w[-1] in _FI_AEI
            and w[-2] not in _FI_VOWELS):
        w = w[:-1]
    if len(w) - 2 >= r1 and w[-1] == "j" and w[-2] in ("o", "u"):
        w = w[:-1]
    if len(w) - 2 >= r1 and w[-1] == "o" and w[-2] == "j":
        w = w[:-1]
    # undouble the rightmost consonant pair (whole word, no limit)
    i = len(w) - 1
    while i >= 0 and w[i] in _FI_VOWELS:
        i -= 1
    if i >= 1 and w[i - 1] == w[i]:
        w = w[:i] + w[i + 1:]
    return w


# ---------------------------------------------------------------------------
# Hungarian (org/tartarus/snowball/ext/HungarianStemmer.java): R1 with
# digraph awareness (cs/dzs/gy/ly/ny/sz/ty/zs count as one consonant when
# the word starts with a vowel), then nine independent suffix passes:
# instrumental (-val/-vel assimilated: double consonant + al/el, with
# undoubling), general case endings + final á/é normalization, special
# and -stul/-stül cases, factive -vá/-vé (assimilated), owned/owner
# suffix families, and plurals. Every pass matches the longest suffix
# FIRST and only then checks R1 — a longest match outside R1 fails the
# whole pass (no shorter-suffix fallback; unlike Finnish these amongs
# run unlimited). Vintage fidelity kept: the grouping table uses õ/û
# (U+00F5/U+00FB), NOT the modern ő/ű, so ő is a consonant here exactly
# as in the reference's table.
# ---------------------------------------------------------------------------

_HU_VOWELS = frozenset("aeiouáéíóöõúüû")
_HU_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = _bylen((
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp",
    "rr", "ss", "tt", "vv", "zz", "ccs", "zzs", "ggy", "lly", "nny",
    "tty", "ssz",
))
_HU_CASE = _bylen((
    "képpen", "anként", "enként", "onként", "képp", "ként",
    "nak", "nek", "val", "vel", "nál", "nél", "ból", "ról", "tól",
    "bõl", "rõl", "tõl", "ban", "ben", "kor", "hez", "hoz", "höz",
    "ért",
    "ba", "ra", "be", "re", "ig", "ul", "ül", "an", "en", "on", "ön",
    "at", "et", "ot", "öt", "vá", "vé",
    "n", "t",
))
_HU_OWNED_A = frozenset(("áéi", "áké"))
_HU_OWNED_E = frozenset(("ééi", "éké", "éé"))
_HU_OWNED = _bylen((
    "áéi", "ééi", "aké", "eké", "oké", "áké", "éké", "öké",
    "éi", "ké", "éé", "é",
))
_HU_SING_A = frozenset(("ánk", "ájuk", "ám", "ád", "á"))
_HU_SING_E = frozenset(("énk", "éjük", "ém", "éd", "é"))
_HU_SING = _bylen((
    "ájuk", "éjük",
    "unk", "ánk", "énk", "ünk", "juk", "jük",
    "ja", "ad", "ed", "od", "ád", "éd", "öd", "je", "nk", "uk", "ük",
    "am", "em", "om", "ám", "ém",
    "a", "d", "e", "m", "o", "á", "é",
))
_HU_PLUR_A = frozenset(("áim", "áid", "ái", "áink", "áitok", "áik"))
_HU_PLUR_E = frozenset(("éim", "éid", "éi", "éink", "éitek", "éik"))
_HU_PLUR = _bylen((
    "jaitok", "jeitek",
    "jaink", "jeink", "aitok", "áitok", "eitek", "éitek",
    "jaim", "jeim", "jaid", "jeid", "itek", "jaik", "jeik", "aink",
    "eink", "áink", "éink",
    "áim", "éim", "aim", "eim", "áid", "éid", "aid", "eid", "jai",
    "jei", "áik", "éik", "aik", "eik", "ink",
    "im", "id", "ái", "éi", "ai", "ei", "ik",
    "i",
))
_HU_PLURAL = _bylen(("ák", "ék", "ak", "ek", "ok", "ök", "k"))


def _hu_r1(w: str) -> int:
    """Hungarian R1: vowel-initial words break after the first consonant
    (a digraph counts whole); consonant-initial words after the first
    vowel; no break -> R1 empty (offset = len)."""
    if not w:
        return 0
    if w[0] in _HU_VOWELS:
        i = 1
        while i < len(w) and w[i] in _HU_VOWELS:
            i += 1
        if i >= len(w):
            return len(w)
        for d in _HU_DIGRAPHS:
            if w.startswith(d, i):
                return i + len(d)
        return i + 1
    i = 1
    while i < len(w) and w[i] not in _HU_VOWELS:
        i += 1
    return min(i + 1, len(w))


def hungarian_stem(word: str) -> str:
    """Snowball Hungarian over the tables above."""
    w = word
    r1 = _hu_r1(w)

    def in_r1(s: str) -> bool:
        return len(w) - len(s) >= r1

    def undouble(x: str) -> str:
        return x[:-2] + x[-1]

    # instrumental: double + al/el -> delete + undouble
    s = _longest(w, ("al", "el"))
    if s and in_r1(s):
        st = w[: len(w) - 2]
        if _longest(st, _HU_DOUBLES):
            w = undouble(st)

    # general case endings, then final á/é -> a/e
    s = _longest(w, _HU_CASE)
    if s and in_r1(s):
        w = w[: len(w) - len(s)]
        if w.endswith("á") and len(w) - 1 >= r1:
            w = w[:-1] + "a"
        elif w.endswith("é") and len(w) - 1 >= r1:
            w = w[:-1] + "e"

    # special cases: én -> e, án/ánként -> a
    s = _longest(w, ("ánként", "án", "én"))
    if s and in_r1(s):
        w = w[: len(w) - len(s)] + ("e" if s == "én" else "a")

    # -stul/-stül family
    s = _longest(w, ("astul", "ástul", "estül", "éstül", "stul", "stül"))
    if s and in_r1(s):
        st = w[: len(w) - len(s)]
        if s == "ástul":
            w = st + "a"
        elif s == "éstül":
            w = st + "e"
        else:
            w = st

    # factive á/é after a double consonant -> delete + undouble
    s = _longest(w, ("á", "é"))
    if s and in_r1(s):
        st = w[:-1]
        if _longest(st, _HU_DOUBLES):
            w = undouble(st)

    # owned (-é/-éi families)
    s = _longest(w, _HU_OWNED)
    if s and in_r1(s):
        st = w[: len(w) - len(s)]
        w = st + ("a" if s in _HU_OWNED_A
                  else "e" if s in _HU_OWNED_E else "")

    # singular owner
    s = _longest(w, _HU_SING)
    if s and in_r1(s):
        st = w[: len(w) - len(s)]
        w = st + ("a" if s in _HU_SING_A
                  else "e" if s in _HU_SING_E else "")

    # plural owner
    s = _longest(w, _HU_PLUR)
    if s and in_r1(s):
        st = w[: len(w) - len(s)]
        w = st + ("a" if s in _HU_PLUR_A
                  else "e" if s in _HU_PLUR_E else "")

    # plural
    s = _longest(w, _HU_PLURAL)
    if s and in_r1(s):
        st = w[: len(w) - len(s)]
        w = st + ("a" if s == "ák" else "e" if s == "ék" else "")

    return w


# ---------------------------------------------------------------------------
# Catalan (org/tartarus/snowball/ext/CatalanStemmer.java): standard
# R1/R2; attached-pronoun strip, then standard suffixes OR verb
# suffixes (verbs only when the standard pass applied nothing), a
# residual single-vowel/s pass, and a forward "cleaning" pass that
# folds every accented vowel to its base and the middle dot to '.'.
# Suffix tables machine-extracted from the generated program's Among
# lists (data only); the control flow is original Python over this
# module's helpers. Each among matches the LONGEST suffix and only
# then checks its region -- a region miss fails the pass with no
# shorter-suffix fallback.
# ---------------------------------------------------------------------------

_CA_VOWELS = frozenset("aeiouàáèéíïòóúü")
_CA_PRONOUNS = _bylen((
    'la', '-la', 'sela', 'le', 'me', '-me', 'se', '-te', 'hi', "'hi", 'li',
    '-li', "'l", "'m", '-m', "'n", '-n', 'ho', "'ho", 'lo', 'selo', "'s",
    'las', 'selas', 'les', '-les', "'ls", '-ls', "'ns", '-ns', 'ens',
    'los', 'selos', 'nos', '-nos', 'vos', 'us', '-us', "'t",
))
_CA_STD_R2_DEL = frozenset(('ada', 'ades', 'acions'))
_CA_STD_LOG = frozenset(('lógica', 'logia', 'logía', 'logi', 'lógics', 'logies', 'lógiques', 'logíes', 'logis'))
_CA_STD_IC = frozenset(('ica', 'ic', 'ics', 'iques'))
_CA_STD_C = frozenset(('quíssima', 'quíssim', 'quíssimes', 'quíssims'))
_CA_STD = _bylen((
    'ica', 'lógica', 'enca', 'ada', 'ancia', 'encia', 'ència', 'ícia',
    'logia', 'inia', 'íinia', 'eria', 'ària', 'atòria', 'alla', 'ella',
    'ívola', 'ima', 'íssima', 'quíssima', 'ana', 'ina', 'era', 'sfera',
    'ora', 'dora', 'adora', 'adura', 'esa', 'osa', 'assa', 'essa', 'issa',
    'eta', 'ita', 'ota', 'ista', 'ialista', 'ionista', 'iva', 'ativa',
    'nça', 'logía', 'ic', 'ístic', 'enc', 'esc', 'ud', 'atge', 'ble',
    'able', 'ible', 'isme', 'ialisme', 'ionisme', 'ivisme', 'aire', 'icte',
    'iste', 'ici', 'íci', 'logi', 'ari', 'tori', 'al', 'il', 'all', 'ell',
    'ívol', 'isam', 'issem', 'ìssem', 'íssem', 'íssim', 'quíssim', 'amen',
    'ìssin', 'ar', 'ificar', 'egar', 'ejar', 'itar', 'itzar', 'fer', 'or',
    'dor', 'dur', 'doras', 'ics', 'lógics', 'uds', 'nces', 'ades',
    'ancies', 'encies', 'ències', 'ícies', 'logies', 'inies', 'ínies',
    'eries', 'àries', 'atòries', 'bles', 'ables', 'ibles', 'imes',
    'íssimes', 'quíssimes', 'formes', 'ismes', 'ialismes', 'ines', 'eres',
    'ores', 'dores', 'idores', 'dures', 'eses', 'oses', 'asses', 'ictes',
    'ites', 'otes', 'istes', 'ialistes', 'ionistes', 'iques', 'lógiques',
    'ives', 'atives', 'logíes', 'allengües', 'icis', 'ícis', 'logis',
    'aris', 'toris', 'ls', 'als', 'ells', 'ims', 'íssims', 'quíssims',
    'ions', 'cions', 'acions', 'esos', 'osos', 'assos', 'issos', 'ers',
    'ors', 'dors', 'adors', 'idors', 'ats', 'itats', 'bilitats', 'ivitats',
    'ativitats', 'ïtats', 'ets', 'ants', 'ents', 'ments', 'aments', 'ots',
    'uts', 'ius', 'trius', 'atius', 'ès', 'és', 'ís', 'dís', 'ós', 'itat',
    'bilitat', 'ivitat', 'ativitat', 'ïtat', 'et', 'ant', 'ent', 'ient',
    'ment', 'ament', 'isament', 'ot', 'isseu', 'ìsseu', 'ísseu', 'triu',
    'íssiu', 'atiu', 'ó', 'ió', 'ció', 'ació',
))
_CA_VERB = _bylen((
    'aba', 'esca', 'isca', 'ïsca', 'ada', 'ida', 'uda', 'ïda', 'ia',
    'aria', 'iria', 'ara', 'iera', 'ira', 'adora', 'ïra', 'ava', 'ixa',
    'itza', 'ía', 'aría', 'ería', 'iría', 'ïa', 'isc', 'ïsc', 'ad', 'ed',
    'id', 'ie', 're', 'dre', 'ase', 'iese', 'aste', 'iste', 'ii', 'ini',
    'esqui', 'eixi', 'itzi', 'am', 'em', 'arem', 'irem', 'àrem', 'írem',
    'àssem', 'éssem', 'iguem', 'ïguem', 'avem', 'àvem', 'ávem', 'irìem',
    'íem', 'aríem', 'iríem', 'assim', 'essim', 'issim', 'àssim', 'èssim',
    'éssim', 'íssim', 'ïm', 'an', 'aban', 'arian', 'aran', 'ieran', 'iran',
    'ían', 'arían', 'erían', 'irían', 'en', 'ien', 'arien', 'irien',
    'aren', 'eren', 'iren', 'àren', 'ïren', 'asen', 'iesen', 'assen',
    'essen', 'issen', 'éssen', 'ïssen', 'esquen', 'isquen', 'ïsquen',
    'aven', 'ixen', 'eixen', 'ïxen', 'ïen', 'in', 'inin', 'sin', 'isin',
    'assin', 'essin', 'issin', 'ïssin', 'esquin', 'eixin', 'aron', 'ieron',
    'arán', 'erán', 'irán', 'iïn', 'ado', 'ido', 'ando', 'iendo', 'io',
    'ixo', 'eixo', 'ïxo', 'itzo', 'ar', 'tzar', 'er', 'eixer', 'ir',
    'ador', 'as', 'abas', 'adas', 'idas', 'aras', 'ieras', 'ías', 'arías',
    'erías', 'irías', 'ids', 'es', 'ades', 'ides', 'udes', 'ïdes', 'atges',
    'ies', 'aries', 'iries', 'ares', 'ires', 'adores', 'ïres', 'ases',
    'ieses', 'asses', 'esses', 'isses', 'ïsses', 'ques', 'esques',
    'ïsques', 'aves', 'ixes', 'eixes', 'ïxes', 'ïes', 'abais', 'arais',
    'ierais', 'íais', 'aríais', 'eríais', 'iríais', 'aseis', 'ieseis',
    'asteis', 'isteis', 'inis', 'sis', 'isis', 'assis', 'essis', 'issis',
    'ïssis', 'esquis', 'eixis', 'itzis', 'áis', 'aréis', 'eréis', 'iréis',
    'ams', 'ados', 'idos', 'amos', 'ábamos', 'áramos', 'iéramos', 'íamos',
    'aríamos', 'eríamos', 'iríamos', 'aremos', 'eremos', 'iremos',
    'ásemos', 'iésemos', 'imos', 'adors', 'ass', 'erass', 'ess', 'ats',
    'its', 'ents', 'às', 'aràs', 'iràs', 'arás', 'erás', 'irás', 'és',
    'arés', 'ís', 'iïs', 'at', 'it', 'ant', 'ent', 'int', 'ut', 'ït', 'au',
    'erau', 'ieu', 'ineu', 'areu', 'ireu', 'àreu', 'íreu', 'asseu',
    'esseu', 'eresseu', 'àsseu', 'ésseu', 'igueu', 'ïgueu', 'àveu', 'áveu',
    'itzeu', 'ìeu', 'irìeu', 'íeu', 'aríeu', 'iríeu', 'assiu', 'issiu',
    'àssiu', 'èssiu', 'éssiu', 'íssiu', 'ïu', 'ix', 'eix', 'ïx', 'itz',
    'ià', 'arà', 'irà', 'itzà', 'ará', 'erá', 'irá', 'irè', 'aré', 'eré',
    'iré', 'í', 'iï', 'ió',
))
_CA_RESID = _bylen((
    'a', 'e', 'i', 'ïn', 'o', 'ir', 's', 'is', 'os', 'ïs', 'it', 'eu',
    'iu', 'iqu', 'itz', 'à', 'á', 'é', 'ì', 'í', 'ï', 'ó',
))
_CA_CLEAN = str.maketrans(
    {"à": "a", "á": "a", "è": "e", "é": "e", "ì": "i", "í": "i",
     "ï": "i", "ò": "o", "ó": "o", "ú": "u", "ü": "u", "·": "."}
)


def catalan_stem(word: str) -> str:
    """Snowball Catalan over the tables above."""
    w = word
    r1, r2 = _std_regions(w, _CA_VOWELS)

    # attached pronoun (R1)
    s = _longest(w, _CA_PRONOUNS)
    if s and len(w) - len(s) >= r1:
        w = w[: len(w) - len(s)]

    # standard suffixes; verbs only when nothing standard applied
    applied = False
    s = _longest(w, _CA_STD)
    if s:
        p = len(w) - len(s)
        if s in _CA_STD_R2_DEL:
            if p >= r2:
                w, applied = w[:p], True
        elif s in _CA_STD_LOG:
            if p >= r2:
                w, applied = w[:p] + "log", True
        elif s in _CA_STD_IC:
            if p >= r2:
                w, applied = w[:p] + "ic", True
        elif s in _CA_STD_C:
            if p >= r1:
                w, applied = w[:p] + "c", True
        elif p >= r1:
            w, applied = w[:p], True
    if not applied:
        s = _longest(w, _CA_VERB)
        if s:
            p = len(w) - len(s)
            if s == "ando":
                if p >= r2:
                    w = w[:p]
            elif p >= r1:
                w = w[:p]

    # residual suffix (R1); iqu -> ic
    s = _longest(w, _CA_RESID)
    if s and len(w) - len(s) >= r1:
        p = len(w) - len(s)
        w = (w[:p] + "ic") if s == "iqu" else w[:p]

    # cleaning: unaccent everywhere + middle dot -> '.'
    return w.translate(_CA_CLEAN)


# ---------------------------------------------------------------------------
# Turkish (org/tartarus/snowball/ext/TurkishStemmer.java): an
# agglutinative suffix-chain machine rather than a region stemmer.
# Words need >= 2 vowels to stem at all. First the nominal-verb chain,
# then (unless it hit the -lAr early stop) the noun chain — both walk
# suffix "marks" leftward and slice; slices are PERMANENT even when an
# enclosing snowball 'try' later fails (only the cursor restores), and
# the recursive ki-chain can therefore delete a mid-word segment while
# a trailing '...ndaki' survives. Every vowel-bearing suffix checks
# vowel harmony against the preceding vowels, and the y/n/s buffer
# consonants (and the U vowel of possessives) are consumed only in
# their exact phonological contexts (mark_suffix_with_optional_*).
# Postlude: 'ad'/'soyad' are reserved; stems ending d/g get the
# harmony-matching high vowel appended; a final b/c/d/ğ is devoiced to
# p/ç/t/k. The analyzer chain also carries TurkishLowerCaseFilter's
# dotted/dotless i and the ApostropheFilter (both wired in text.py /
# the registry entry below).
# ---------------------------------------------------------------------------

_TR_VOWELS = frozenset("aeıioöuü")
_TR_U = frozenset("ıiuü")  # high vowels (g_U)
# per-vowel harmony class: the LAST vowel before the suffix must find
# one of these earlier in the word (check_vowel_harmony)
_TR_HARMONY = {"a": "aouı", "e": "eiöü", "ı": "aı", "i": "ei",
               "o": "ou", "ö": "öü", "u": "ou", "ü": "öü"}
_TR_YDU = (
    "dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
    "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım",
    "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın",
    "di", "ti", "du", "tu", "dü", "tü", "dı", "tı",
)


def _tr_harmony(w: str, p: int) -> bool:
    i = p - 1
    while i >= 0 and w[i] not in _TR_VOWELS:
        i -= 1
    if i < 0:
        return False
    allowed = _TR_HARMONY[w[i]]
    for j in range(i - 1, -1, -1):
        if w[j] in allowed:
            return True
    return False


def _tr_suf(w: str, p: int, sufs) -> int | None:
    """Longest suffix of w[:p] from ``sufs`` (pre-ordered longest first);
    returns the start offset of the match."""
    for s in sufs:
        q = p - len(s)
        if q >= 0 and w.startswith(s, q):
            return q
    return None


def _tr_opt_cons(w: str, p: int, ch: str) -> int | None:
    """mark_suffix_with_optional_<ch>_consonant at cursor p: consume the
    buffer consonant when vowel-attached, pass when absent, fail when
    present but not vowel-attached."""
    if p >= 1 and w[p - 1] == ch:
        if p >= 2 and w[p - 2] in _TR_VOWELS:
            return p - 1
        return None
    if p >= 2 and w[p - 2] in _TR_VOWELS:
        return p
    return None


def _tr_opt_U(w: str, p: int) -> int | None:
    """mark_suffix_with_optional_U_vowel: consume a high vowel attached
    to a consonant, pass when the previous char is already a consonant."""
    if p >= 1 and w[p - 1] in _TR_U:
        if p >= 2 and w[p - 2] not in _TR_VOWELS:
            return p - 1
        return None
    if p >= 2 and w[p - 2] not in _TR_VOWELS:
        return p
    return None


def _tm_poss(w, p):
    q = _tr_suf(w, p, ("miz", "niz", "muz", "nuz", "müz", "nüz",
                       "mız", "nız", "m", "n"))
    return None if q is None else _tr_opt_U(w, q)


def _tm_sU(w, p):
    if not _tr_harmony(w, p) or p < 1 or w[p - 1] not in _TR_U:
        return None
    return _tr_opt_cons(w, p - 1, "s")


def _tm_lArI(w, p):
    return _tr_suf(w, p, ("leri", "ları"))


def _tm_yU(w, p):
    if not _tr_harmony(w, p) or p < 1 or w[p - 1] not in _TR_U:
        return None
    return _tr_opt_cons(w, p - 1, "y")


def _tm_nU(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_suf(w, p, ("ni", "nu", "nü", "nı"))


def _tm_nUn(w, p):
    if not _tr_harmony(w, p):
        return None
    q = _tr_suf(w, p, ("in", "un", "ün", "ın"))
    return None if q is None else _tr_opt_cons(w, q, "n")


def _tm_yA(w, p):
    if not _tr_harmony(w, p):
        return None
    q = _tr_suf(w, p, ("a", "e"))
    return None if q is None else _tr_opt_cons(w, q, "y")


def _tm_nA(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_suf(w, p, ("na", "ne"))


def _tm_DA(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_suf(w, p, ("da", "ta", "de", "te"))


def _tm_ndA(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_suf(w, p, ("nda", "nde"))


def _tm_DAn(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_suf(w, p, ("dan", "tan", "den", "ten"))


def _tm_ndAn(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_suf(w, p, ("ndan", "nden"))


def _tm_ylA(w, p):
    if not _tr_harmony(w, p):
        return None
    q = _tr_suf(w, p, ("la", "le"))
    return None if q is None else _tr_opt_cons(w, q, "y")


def _tm_ki(w, p):
    return p - 2 if p >= 2 and w[p - 2:p] == "ki" else None


def _tm_ncA(w, p):
    if not _tr_harmony(w, p):
        return None
    q = _tr_suf(w, p, ("ca", "ce"))
    return None if q is None else _tr_opt_cons(w, q, "n")


def _tm_yUm(w, p):
    if not _tr_harmony(w, p):
        return None
    q = _tr_suf(w, p, ("im", "um", "üm", "ım"))
    return None if q is None else _tr_opt_cons(w, q, "y")


def _tm_sUn(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_suf(w, p, ("sin", "sun", "sün", "sın"))


def _tm_yUz(w, p):
    if not _tr_harmony(w, p):
        return None
    q = _tr_suf(w, p, ("iz", "uz", "üz", "ız"))
    return None if q is None else _tr_opt_cons(w, q, "y")


def _tm_sUnUz(w, p):
    return _tr_suf(w, p, ("siniz", "sunuz", "sünüz", "sınız"))


def _tm_lAr(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_suf(w, p, ("lar", "ler"))


def _tm_nUz(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_suf(w, p, ("niz", "nuz", "nüz", "nız"))


def _tm_DUr(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_suf(w, p, ("dir", "tir", "dur", "tur",
                          "dür", "tür", "dır", "tır"))


def _tm_cAsInA(w, p):
    return _tr_suf(w, p, ("casına", "cesine"))


def _tm_yDU(w, p):
    if not _tr_harmony(w, p):
        return None
    q = _tr_suf(w, p, _TR_YDU)
    return None if q is None else _tr_opt_cons(w, q, "y")


def _tm_ysA(w, p):
    q = _tr_suf(w, p, ("sak", "sek", "sam", "sem", "san", "sen",
                       "sa", "se"))
    return None if q is None else _tr_opt_cons(w, q, "y")


def _tm_ymUs(w, p):
    if not _tr_harmony(w, p):
        return None
    q = _tr_suf(w, p, ("miş", "muş", "müş", "mış"))
    return None if q is None else _tr_opt_cons(w, q, "y")


def _tm_yken(w, p):
    if p >= 3 and w[p - 3:p] == "ken":
        return _tr_opt_cons(w, p - 3, "y")
    return None


def _tr_nominal_verb(w: str):
    """stem_nominal_verb_suffixes: returns (word, continue_flag) or None
    when no alternative applied."""
    n = len(w)
    # A: ymUş / yDU / ysA / yken
    for m in (_tm_ymUs, _tm_yDU, _tm_ysA, _tm_yken):
        q = m(w, n)
        if q is not None:
            return w[:q], True
    # B: cAsInA (sUnUz|lAr|yUm|sUn|yUz)? ymUş
    q = _tm_cAsInA(w, n)
    if q is not None:
        mid = q
        for m in (_tm_sUnUz, _tm_lAr, _tm_yUm, _tm_sUn, _tm_yUz):
            r = m(w, q)
            if r is not None:
                mid = r
                break
        q2 = _tm_ymUs(w, mid)
        if q2 is not None:
            return w[:q2], True
    # C: lAr [DUr|yDU|ysA|ymUş] -> stop noun stemming
    q = _tm_lAr(w, n)
    if q is not None:
        w2 = w[:q]
        for m in (_tm_DUr, _tm_yDU, _tm_ysA, _tm_ymUs):
            r = m(w2, len(w2))
            if r is not None:
                w2 = w2[:r]
                break
        return w2, False
    # D: nUz (yDU|ysA)
    q = _tm_nUz(w, n)
    if q is not None:
        for m in (_tm_yDU, _tm_ysA):
            r = m(w, q)
            if r is not None:
                return w[:r], True
    # E: (sUnUz|yUz|sUn|yUm) [ymUş]
    for m in (_tm_sUnUz, _tm_yUz, _tm_sUn, _tm_yUm):
        q = m(w, n)
        if q is not None:
            w2 = w[:q]
            r = _tm_ymUs(w2, len(w2))
            return (w2[:r] if r is not None else w2), True
    # F: DUr [(sUnUz|lAr|yUm|sUn|yUz)? ymUş]
    q = _tm_DUr(w, n)
    if q is not None:
        w2 = w[:q]
        mid = len(w2)
        for m in (_tm_sUnUz, _tm_lAr, _tm_yUm, _tm_sUn, _tm_yUz):
            r = m(w2, mid)
            if r is not None:
                mid = r
                break
        r = _tm_ymUs(w2, mid)
        return (w2[:r] if r is not None else w2), True
    return None


def _tr_chain_ki(w: str, c: int):
    """stem_suffix_chain_before_ki at cursor c: slices delete
    w[bra:c] keeping any tail w[c:] — the recursive third arm really
    does remove a mid-word segment while '...ndaki' survives. Returns
    (word, cursor) or None (None => word unchanged)."""
    q = _tm_ki(w, c)
    if q is None:
        return None
    r = _tm_DA(w, q)
    if r is not None:
        w = w[:r] + w[c:]
        c = r
        rr = _tm_lAr(w, c)
        if rr is not None:
            w = w[:rr] + w[c:]
            c = rr
            res = _tr_chain_ki(w, c)
            return res if res is not None else (w, c)
        rr = _tm_poss(w, c)
        if rr is not None:
            w = w[:rr] + w[c:]
            c = rr
            rr2 = _tm_lAr(w, c)
            if rr2 is not None:
                w = w[:rr2] + w[c:]
                c = rr2
                res = _tr_chain_ki(w, c)
                if res is not None:
                    return res
        return w, c
    r = _tm_nUn(w, q)
    if r is not None:
        w = w[:r] + w[c:]
        c = r
        rr = _tm_lArI(w, c)
        if rr is not None:
            return w[:rr] + w[c:], rr
        rr = _tm_poss(w, c)
        if rr is None:
            rr = _tm_sU(w, c)
        if rr is not None:
            w = w[:rr] + w[c:]
            c = rr
            rr2 = _tm_lAr(w, c)
            if rr2 is not None:
                w = w[:rr2] + w[c:]
                c = rr2
                res = _tr_chain_ki(w, c)
                if res is not None:
                    return res
            return w, c
        res = _tr_chain_ki(w, c)
        return res if res is not None else (w, c)
    r = _tm_ndA(w, q)
    if r is not None:
        rr = _tm_lArI(w, r)
        if rr is not None:
            return w[:rr] + w[c:], rr
        rr = _tm_sU(w, r)
        if rr is not None:
            w = w[:rr] + w[c:]
            c = rr
            rr2 = _tm_lAr(w, c)
            if rr2 is not None:
                w = w[:rr2] + w[c:]
                c = rr2
                res = _tr_chain_ki(w, c)
                if res is not None:
                    return res
            return w, c
        return _tr_chain_ki(w, r)
    return None


def _tr_ki(w: str):
    """chain_ki anchored at the end; plain-word convenience."""
    res = _tr_chain_ki(w, len(w))
    return res[0] if res is not None else None


def _tr_noun_suffixes(w: str):
    """stem_noun_suffixes: returns the new word or None."""
    n = len(w)
    # 1: lAr [ki-chain]
    q = _tm_lAr(w, n)
    if q is not None:
        w = w[:q]
        res = _tr_ki(w)
        return res if res is not None else w
    # 2: ncA [lArI | (poss|sU)[lAr ki-chain] | lAr ki-chain]
    q = _tm_ncA(w, n)
    if q is not None:
        w = w[:q]
        r = _tm_lArI(w, len(w))
        if r is not None:
            return w[:r]
        rr = _tm_poss(w, len(w))
        if rr is None:
            rr = _tm_sU(w, len(w))
        if rr is not None:
            w = w[:rr]
            r2 = _tm_lAr(w, len(w))
            if r2 is not None:
                w2 = w[:r2]
                res = _tr_ki(w2)
                return res if res is not None else w2
            return w
        r2 = _tm_lAr(w, len(w))
        if r2 is not None:
            w = w[:r2]
            res = _tr_ki(w)
            if res is not None:
                w = res
        return w
    # 3: (ndA|nA) (lArI | sU[lAr ki-chain] | ki-chain)
    q = _tm_ndA(w, n)
    if q is None:
        q = _tm_nA(w, n)
    if q is not None:
        r = _tm_lArI(w, q)
        if r is not None:
            return w[:r]
        r = _tm_sU(w, q)
        if r is not None:
            w2 = w[:r]
            r2 = _tm_lAr(w2, len(w2))
            if r2 is not None:
                w3 = w2[:r2]
                res = _tr_ki(w3)
                return res if res is not None else w3
            return w2
        res = _tr_chain_ki(w, q)
        if res is not None:
            return res[0]
    # 4: (ndAn|nU) (sU[lAr ki-chain] | lArI)
    q = _tm_ndAn(w, n)
    if q is None:
        q = _tm_nU(w, n)
    if q is not None:
        r = _tm_sU(w, q)
        if r is not None:
            w2 = w[:r]
            r2 = _tm_lAr(w2, len(w2))
            if r2 is not None:
                w3 = w2[:r2]
                res = _tr_ki(w3)
                return res if res is not None else w3
            return w2
        r = _tm_lArI(w, q)
        if r is not None:
            return w[:r]
    # 5: DAn [poss[lAr ki-chain] | lAr[ki-chain] | ki-chain]
    q = _tm_DAn(w, n)
    if q is not None:
        w = w[:q]
        r = _tm_poss(w, len(w))
        if r is not None:
            w = w[:r]
            r2 = _tm_lAr(w, len(w))
            if r2 is not None:
                w2 = w[:r2]
                res = _tr_ki(w2)
                return res if res is not None else w2
            return w
        r = _tm_lAr(w, len(w))
        if r is not None:
            w = w[:r]
            res = _tr_ki(w)
            return res if res is not None else w
        res = _tr_ki(w)
        return res if res is not None else w
    # 6: (nUn|ylA) [lAr ki-chain(required, slice stands) |
    #              (poss|sU)[lAr ki-chain] | ki-chain]
    q = _tm_nUn(w, n)
    if q is None:
        q = _tm_ylA(w, n)
    if q is not None:
        w = w[:q]
        r = _tm_lAr(w, len(w))
        if r is not None:
            w = w[:r]
            res = _tr_ki(w)
            if res is not None:
                return res
            # ki-chain failed: the lAr slice stands, next arm continues
        r = _tm_poss(w, len(w))
        if r is None:
            r = _tm_sU(w, len(w))
        if r is not None:
            w = w[:r]
            r2 = _tm_lAr(w, len(w))
            if r2 is not None:
                w2 = w[:r2]
                res = _tr_ki(w2)
                return res if res is not None else w2
            return w
        res = _tr_ki(w)
        return res if res is not None else w
    # 7: lArI
    q = _tm_lArI(w, n)
    if q is not None:
        return w[:q]
    # 8: bare ki-chain
    res = _tr_ki(w)
    if res is not None:
        return res
    # 9: (DA|yU|yA) [poss[lAr]|lAr, then ki-chain(required)]
    q = _tm_DA(w, n)
    if q is None:
        q = _tm_yU(w, n)
    if q is None:
        q = _tm_yA(w, n)
    if q is not None:
        w = w[:q]
        r = _tm_poss(w, len(w))
        if r is not None:
            w = w[:r]
            r2 = _tm_lAr(w, len(w))
            if r2 is not None:
                w = w[:r2]
            res = _tr_ki(w)
            if res is not None:
                w = res
            return w
        r2 = _tm_lAr(w, len(w))
        if r2 is not None:
            w = w[:r2]
            res = _tr_ki(w)
            if res is not None:
                w = res
        return w
    # 10: (poss|sU) [lAr ki-chain]
    q = _tm_poss(w, n)
    if q is None:
        q = _tm_sU(w, n)
    if q is None:
        return None
    w = w[:q]
    r = _tm_lAr(w, len(w))
    if r is not None:
        w = w[:r]
        res = _tr_ki(w)
        if res is not None:
            w = res
    return w


_TR_APPEND_U = {"a": "ı", "ı": "ı", "e": "i", "i": "i",
                "o": "u", "u": "u", "ö": "ü", "ü": "ü"}
_TR_DEVOICE = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def turkish_stem(word: str) -> str:
    """Snowball Turkish over the suffix-chain machinery above."""
    w = word
    if sum(ch in _TR_VOWELS for ch in w) < 2:
        return w  # more_than_one_syllable_word gate
    res = _tr_nominal_verb(w)
    cont = True
    if res is not None:
        w, cont = res
    if not cont:
        return w  # -lAr verb reading: skip noun suffixes AND postlude
    res = _tr_noun_suffixes(w)
    if res is not None:
        w = res
    # postlude
    if w in ("ad", "soyad"):  # is_reserved_word
        return w
    # append the harmony vowel to stems ending d/g
    if w.endswith(("d", "g")):
        i = len(w) - 1
        while i >= 0 and w[i] not in _TR_VOWELS:
            i -= 1
        if i >= 0:
            w = w + _TR_APPEND_U[w[i]]
    # devoice a final b/c/d/ğ
    if w and w[-1] in _TR_DEVOICE:
        w = w[:-1] + _TR_DEVOICE[w[-1]]
    return w


def turkish_term_filter(term: str) -> str:
    """TurkishAnalyzer term chain tail: ApostropheFilter (truncate at
    ' or U+2019 — tr/ApostropheFilter.java:53) then the Snowball stem.
    The dotted/dotless-i lowercasing runs upstream in tokenize_series."""
    for i, ch in enumerate(term):
        if ch == "'" or ch == "’":
            term = term[:i]
            break
    return turkish_stem(term)


# ---------------------------------------------------------------------------
# Basque (org/tartarus/snowball/ext/BasqueStemmer.java): Iberian RV +
# standard R1/R2 marked ONCE on the input word; then the verb table
# (aditzak) applied repeatedly to exhaustion, the noun table (izenak)
# likewise, and one adjective pass (adjetiboak). Suffix tables
# machine-extracted from the generated Among lists (data only); each
# among matches the longest suffix and only then checks its region — a
# region miss fails that pass with no shorter-suffix fallback.
# ---------------------------------------------------------------------------

_EU_VOWELS = frozenset("aeiou")
_EU_ADITZAK = _bylen((
    'idea', 'bidea', 'kidea', 'pidea', 'kundea', 'galea', 'tailea',
    'tzailea', 'gunea', 'kunea', 'tzaga', 'gaia', 'aldia', 'taldia',
    'karia', 'garria', 'karria', 'ka', 'tzaka', 'la', 'mena', 'pena',
    'kina', 'ezina', 'tezina', 'kuna', 'tuna', 'kizuna', 'era', 'bera',
    'arabera', 'kera', 'pera', 'orra', 'korra', 'dura', 'gura', 'kura',
    'tura', 'eta', 'keta', 'gailua', 'eza', 'erreza', 'tza', 'gaitza',
    'kaitza', 'kuntza', 'ide', 'bide', 'kide', 'pide', 'kunde', 'tzake',
    'tzeke', 'le', 'gale', 'taile', 'tzaile', 'gune', 'kune', 'tze',
    'atze', 'gai', 'aldi', 'taldi', 'ki', 'ari', 'kari', 'lari', 'tari',
    'etari', 'garri', 'karri', 'arazi', 'tarazi', 'an', 'ean', 'rean',
    'kan', 'etan', 'atseden', 'men', 'pen', 'kin', 'rekin', 'ezin',
    'tezin', 'tun', 'kizun', 'go', 'ago', 'tio', 'dako', 'or', 'kor',
    'tzat', 'du', 'gailu', 'tu', 'atu', 'aldatu', 'tatu', 'baditu', 'ez',
    'errez', 'tzez', 'gaitz', 'kaitz',
))
_EU_ADITZAK_R2 = frozenset(('garria', 'tza', 'garri'))
_EU_ADITZAK_REPL = {'arabera': 'arabera', 'atseden': 'atseden', 'baditu': 'baditu'}
_EU_IZENAK = _bylen((
    'ada', 'kada', 'anda', 'denda', 'gabea', 'kabea', 'aldea', 'kaldea',
    'taldea', 'ordea', 'zalea', 'tzalea', 'gilea', 'emea', 'kumea', 'nea',
    'enea', 'zionea', 'unea', 'gunea', 'pea', 'aurrea', 'tea', 'kotea',
    'artea', 'ostea', 'etxea', 'ga', 'anga', 'gaia', 'aldia', 'taldia',
    'handia', 'mendia', 'geia', 'egia', 'degia', 'tegia', 'nahia', 'ohia',
    'kia', 'tokia', 'oia', 'koia', 'aria', 'karia', 'laria', 'taria',
    'eria', 'keria', 'teria', 'garria', 'larria', 'kirria', 'duria',
    'asia', 'tia', 'ezia', 'bizia', 'ontzia', 'ka', 'joka', 'aurka', 'ska',
    'xka', 'zka', 'gibela', 'gela', 'kaila', 'skila', 'tila', 'ola', 'na',
    'kana', 'ena', 'garrena', 'gerrena', 'urrena', 'zaina', 'tzaina',
    'kina', 'mina', 'garna', 'una', 'duna', 'asuna', 'tasuna', 'ondoa',
    'kondoa', 'ngoa', 'zioa', 'koa', 'takoa', 'zkoa', 'noa', 'zinoa',
    'aroa', 'taroa', 'zaroa', 'eroa', 'oroa', 'osoa', 'toa', 'ttoa',
    'ztoa', 'txoa', 'tzoa', 'ñoa', 'ra', 'ara', 'dara', 'liara', 'tiara',
    'tara', 'etara', 'tzara', 'bera', 'kera', 'pera', 'ora', 'tzarra',
    'korra', 'tra', 'sa', 'osa', 'ta', 'eta', 'keta', 'sta', 'dua',
    'mendua', 'ordua', 'lekua', 'burua', 'durua', 'tsua', 'tua', 'mentua',
    'estua', 'txua', 'zua', 'tzua', 'za', 'eza', 'eroza', 'tza', 'koitza',
    'antza', 'gintza', 'kintza', 'kuntza', 'gabe', 'kabe', 'kide', 'alde',
    'kalde', 'talde', 'orde', 'ge', 'zale', 'tzale', 'gile', 'eme', 'kume',
    'ne', 'zione', 'une', 'gune', 'pe', 'aurre', 'te', 'kote', 'arte',
    'oste', 'etxe', 'gai', 'di', 'aldi', 'taldi', 'geldi', 'handi',
    'mendi', 'gei', 'egi', 'degi', 'tegi', 'nahi', 'ohi', 'ki', 'toki',
    'oi', 'goi', 'koi', 'ari', 'kari', 'lari', 'tari', 'garri', 'larri',
    'kirri', 'duri', 'asi', 'ti', 'ontzi', 'ñi', 'ak', 'ek', 'tarik',
    'gibel', 'ail', 'kail', 'kan', 'tan', 'etan', 'en', 'ren', 'garren',
    'gerren', 'urren', 'ten', 'tzen', 'zain', 'tzain', 'kin', 'min', 'dun',
    'asun', 'tasun', 'aizun', 'ondo', 'kondo', 'go', 'ngo', 'zio', 'ko',
    'trako', 'tako', 'etako', 'eko', 'tariko', 'sko', 'tuko', 'minutuko',
    'zko', 'no', 'zino', 'ro', 'aro', 'igaro', 'taro', 'zaro', 'ero',
    'giro', 'oro', 'oso', 'to', 'tto', 'zto', 'txo', 'tzo', 'gintzo', 'ño',
    'zp', 'ar', 'dar', 'behar', 'zehar', 'liar', 'tiar', 'tar', 'tzar',
    'or', 'kor', 'os', 'ket', 'du', 'mendu', 'ordu', 'leku', 'buru',
    'duru', 'tsu', 'tu', 'tatu', 'mentu', 'estu', 'txu', 'zu', 'tzu',
    'gintzu', 'z', 'ez', 'eroz', 'tz', 'koitz',
))
_EU_IZENAK_R2 = frozenset(('garria', 'ora', 'tza', 'garri', 'ren', 'or', 'buru'))
_EU_IZENAK_R1 = frozenset(('en', 'ten', 'tzen', 'tatu'))
_EU_IZENAK_REPL = {'joka': 'jok', 'aurka': 'aurka', 'geldi': 'geldi', 'trako': 'tra', 'minutuko': 'minutu', 'igaro': 'igaro', 'zehar': 'zehar'}
_EU_ADJ = _bylen((
    'zlea', 'keria', 'la', 'era', 'dade', 'tade', 'date', 'tate', 'gi',
    'ki', 'ik', 'lanik', 'rik', 'larik', 'ztik', 'go', 'ro', 'ero', 'to',
))
_EU_ADJ_REPL = {'zlea': 'z'}


def _eu_pass(w, c, rv, r1, r2, sufs, r2set, r1set, repl):
    """One among pass at cursor ``c``: longest suffix of w[:c], region
    by action (default RV delete), replacements unconditioned. The
    slice removes/replaces w[p:c] keeping any tail w[c:], and the new
    cursor is the match start p — snowball's repeat does NOT reset the
    cursor to the end, so successive passes chain leftward (an identity
    guard like arabera<-arabera moves the cursor past itself, and the
    following passes work on the prefix before it). None = pass failed."""
    for s in sufs:
        p = c - len(s)
        if p >= 0 and w.startswith(s, p):
            if s in repl:
                return w[:p] + repl[s] + w[c:], p
            if s in r2set:
                return (w[:p] + w[c:], p) if p >= r2 else None
            if s in r1set:
                return (w[:p] + w[c:], p) if p >= r1 else None
            return (w[:p] + w[c:], p) if p >= rv else None
    return None


def basque_stem(word: str) -> str:
    """Snowball Basque over the tables above."""
    w = word
    rv = _rv_iberian(w, _EU_VOWELS)
    r1, r2 = _std_regions(w, _EU_VOWELS)
    c = len(w)
    while True:  # repeat aditzak (leftward chain)
        res = _eu_pass(w, c, rv, r1, r2, _EU_ADITZAK, _EU_ADITZAK_R2,
                       frozenset(), _EU_ADITZAK_REPL)
        if res is None:
            break
        w, c = res
    while True:  # repeat izenak, continuing from aditzak's cursor
        res = _eu_pass(w, c, rv, r1, r2, _EU_IZENAK, _EU_IZENAK_R2,
                       _EU_IZENAK_R1, _EU_IZENAK_REPL)
        if res is None:
            break
        w, c = res
    res = _eu_pass(w, c, rv, r1, r2, _EU_ADJ, frozenset(), frozenset(),
                   _EU_ADJ_REPL)
    if res is not None:
        w, c = res
    return w


# ---------------------------------------------------------------------------
# Irish (org/tartarus/snowball/ext/IrishStemmer.java): a forward pass
# first undoes the initial mutations (eclipsis mb->b, gc->c, ...;
# lenition bh->b, ch->c, ...; h-/n-/t- and d'/b'/m' prefixes), THEN
# RV/R1/R2 are marked on the demutated word, followed by one noun, one
# derivational, and one verb suffix pass.
# ---------------------------------------------------------------------------

_GA_VOWELS = frozenset("aeiouáéíóú")
# longest-first prefix table; '' = plain delete
_GA_PREFIXES = (
    ("d'fh", "f"),
    ("bhf", "f"),
    ("h-", ""), ("n-", ""), ("t-", ""), ("b'", ""), ("d'", ""),
    ("m'", ""), ("sh", "s"), ("mb", "b"), ("gc", "c"), ("nd", "d"),
    ("ng", "g"), ("bp", "p"), ("ts", "s"), ("dt", "t"), ("bh", "b"),
    ("ch", "c"), ("dh", "d"), ("fh", "f"), ("gh", "g"), ("mh", "m"),
    ("ph", "p"), ("th", "t"),
)
_GA_NOUN_R1 = ("íochta", "aíochta", "abh", "eabh", "ibh", "aibh",
               "amh", "eamh", "imh", "aimh", "íocht", "aíocht")
_GA_NOUN_R2 = ("ire", "aire", "irí", "airí")
_GA_NOUN = _bylen(_GA_NOUN_R1, _GA_NOUN_R2)
_GA_DERIV_R2 = ("achta", "eachta", "ach", "each", "achtúil",
                "eachtúil", "acht", "eacht")
_GA_DERIV_REPL = {}
for _s in ("arcachta", "arcacht", "arcachtaí"):
    _GA_DERIV_REPL[_s] = "arc"
for _s in ("gineach", "gineas", "ginis"):
    _GA_DERIV_REPL[_s] = "gin"
for _s in ("grafaíochta", "grafaíoch", "grafaíocht", "grafaíochtaí"):
    _GA_DERIV_REPL[_s] = "graf"
for _s in ("patacha", "patach", "pataigh", "paite"):
    _GA_DERIV_REPL[_s] = "paite"
for _s in ("óideacha", "óideach", "óidigh"):
    _GA_DERIV_REPL[_s] = "óid"
_GA_DERIV = _bylen(_GA_DERIV_R2, tuple(_GA_DERIV_REPL))
_GA_VERB_RV = ("imid", "aimid", "ímid", "aímid", "faidh", "fidh")
_GA_VERB_R1 = ("adh", "eadh", "áil", "ain", "tear", "tar")
_GA_VERB = _bylen(_GA_VERB_RV, _GA_VERB_R1)


def irish_stem(word: str) -> str:
    """Snowball Irish over the tables above."""
    w = word
    for pre, repl in _GA_PREFIXES:
        if w.startswith(pre):
            w = repl + w[len(pre):]
            break
    # RV = after the first vowel; R1/R2 standard — on the demutated word
    rv = len(w)
    for i, ch in enumerate(w):
        if ch in _GA_VOWELS:
            rv = i + 1
            break
    r1, r2 = _std_regions(w, _GA_VOWELS)

    s = _longest(w, _GA_NOUN)
    if s:
        p = len(w) - len(s)
        if (s in _GA_NOUN_R1 and p >= r1) or (s in _GA_NOUN_R2 and p >= r2):
            w = w[:p]

    s = _longest(w, _GA_DERIV)
    if s:
        p = len(w) - len(s)
        if s in _GA_DERIV_REPL:
            w = w[:p] + _GA_DERIV_REPL[s]
        elif p >= r2:
            w = w[:p]

    s = _longest(w, _GA_VERB)
    if s:
        p = len(w) - len(s)
        if (s in _GA_VERB_RV and p >= rv) or (s in _GA_VERB_R1 and p >= r1):
            w = w[:p]
    return w


# ---------------------------------------------------------------------------
# Armenian (org/tartarus/snowball/ext/ArmenianStemmer.java): pV = after
# the first vowel, R2 standard; everything runs inside the pV limit —
# one R2-checked ending pass, then verb, adjective and noun passes,
# each a longest-suffix plain delete. Tables machine-extracted from
# the generated Among lists (data only).
# ---------------------------------------------------------------------------

_HY_VOWELS = frozenset("աեէըիուօ")
_HY_ADJ = _bylen((
    'րորդ', 'երորդ', 'ալի', 'ակի', 'որակ', 'եղ', 'ական', 'արան', 'են',
    'եկեն', 'երեն', 'որէն', 'ին', 'գին', 'ովին', 'լայն', 'վուն', 'պես',
    'իվ', 'ատ', 'ավետ', 'կոտ', 'բար',
))
_HY_VERB = _bylen((
    'ա', 'ացա', 'եցա', 'վե', 'ացրի', 'ացի', 'եցի', 'վեցի', 'ալ', 'ըալ',
    'անալ', 'ենալ', 'ացնալ', 'ել', 'ըել', 'նել', 'ցնել', 'եցնել', 'չել',
    'վել', 'ացվել', 'եցվել', 'տել', 'ատել', 'ոտել', 'կոտել', 'ված', 'ում',
    'վում', 'ան', 'ցան', 'ացան', 'ացրին', 'ացին', 'եցին', 'վեցին', 'ալիս',
    'ելիս', 'ավ', 'ացավ', 'եցավ', 'ալով', 'ելով', 'ար', 'ացար', 'եցար',
    'ացրիր', 'ացիր', 'եցիր', 'վեցիր', 'աց', 'եց', 'ացրեց', 'ալուց',
    'ելուց', 'ալու', 'ելու', 'աք', 'ցաք', 'ացաք', 'ացրիք', 'ացիք', 'եցիք',
    'վեցիք', 'անք', 'ցանք', 'ացանք', 'ացրինք', 'ացինք', 'եցինք', 'վեցինք',
))
_HY_NOUN = _bylen((
    'որդ', 'ույթ', 'ուհի', 'ցի', 'իլ', 'ակ', 'յակ', 'անակ', 'իկ', 'ուկ',
    'ան', 'պան', 'ստան', 'արան', 'եղէն', 'յուն', 'ություն', 'ածո', 'իչ',
    'ուս', 'ուստ', 'գար', 'վոր', 'ավոր', 'ոց', 'անօց', 'ու', 'ք', 'չեք',
    'իք', 'ալիք', 'անիք', 'վածք', 'ույք', 'ենք', 'ոնք', 'ունք', 'մունք',
    'իչք', 'արք',
))
_HY_ENDING = _bylen((
    'սա', 'վա', 'ամբ', 'դ', 'անդ', 'ությանդ', 'վանդ', 'ոջդ', 'երդ', 'ներդ',
    'ուդ', 'ը', 'անը', 'ությանը', 'վանը', 'ոջը', 'երը', 'ները', 'ի', 'վի',
    'երի', 'ների', 'անում', 'երում', 'ներում', 'ն', 'ան', 'ության', 'վան',
    'ին', 'երին', 'ներին', 'ությանն', 'երն', 'ներն', 'ուն', 'ոջ',
    'ությանս', 'վանս', 'ոջս', 'ով', 'անով', 'վով', 'երով', 'ներով', 'եր',
    'ներ', 'ց', 'ից', 'վանից', 'ոջից', 'վից', 'երից', 'ներից', 'ցից', 'ոց',
    'ուց',
))


def armenian_stem(word: str) -> str:
    """Snowball Armenian over the tables above."""
    w = word
    pv = None
    for i, ch in enumerate(w):
        if ch in _HY_VOWELS:
            pv = i + 1
            break
    if pv is None:
        return w
    r2 = _std_regions(w, _HY_VOWELS)[1]
    body = w[pv:]
    s = _longest(body, _HY_ENDING)
    if s and pv + len(body) - len(s) >= r2:
        body = body[: len(body) - len(s)]
    for tab in (_HY_VERB, _HY_ADJ, _HY_NOUN):
        s = _longest(body, tab)
        if s:
            body = body[: len(body) - len(s)]
    return w[:pv] + body


# ---------------------------------------------------------------------------
# registry + vectorized filter
# ---------------------------------------------------------------------------

# DutchAnalyzer's default StemmerOverrideFilter dictionary
# (nl/DutchAnalyzer.java:80-84): overridden terms are keyword-marked, so
# the Snowball stemmer never touches them
_NL_STEM_OVERRIDES = {
    "fiets": "fiets", "bromfiets": "bromfiets",
    "ei": "eier", "kind": "kinder",
}

SNOWBALL_STEMMERS = {
    "german": german_stem,
    "french": french_stem,
    "spanish": spanish_stem,
    "portuguese": portuguese_stem,
    "russian": russian_stem,
    "italian": italian_stem,
    "dutch": lambda w: _NL_STEM_OVERRIDES.get(w) or dutch_stem(w),
    "swedish": swedish_stem,
    "norwegian": norwegian_stem,
    "danish": danish_stem,
    "romanian": romanian_stem,
    "finnish": finnish_stem,
    "hungarian": hungarian_stem,
    "catalan": catalan_stem,
    # apostrophe strip + stem, matching TurkishAnalyzer's filter order
    "turkish": turkish_term_filter,
    "basque": basque_stem,
    "irish": irish_stem,
    "armenian": armenian_stem,
}

# Per-language stop sets: transcribed verbatim from the reference's
# resource files (analysis/stopdata.py, generated by
# tools/gen_stopwords.py from snowball/*_stop.txt and */stopwords.txt —
# the exact data {Language}Analyzer.getDefaultStopSet() loads;
# tests/test_stopwords_reference.py asserts per-language equality).
from .stopdata import REFERENCE_STOPWORDS as _REF_STOPS  # noqa: E402

SNOWBALL_STOPWORDS = {
    lang: _REF_STOPS[lang]
    for lang in (
        "german", "french", "spanish", "portuguese", "russian", "italian",
        "dutch", "swedish", "norwegian", "danish", "romanian", "finnish",
        "hungarian", "catalan", "turkish", "basque", "irish", "armenian",
    )
}


def snowball_filter_terms(terms, lang: str):
    """SnowballFilter analog over an analyzed term column — vocabulary-
    vectorized: only the dictionary is stemmed, codes remapped (stems may
    conflate); the shared transform lives in stem.vocab_map_terms."""
    from .stem import vocab_map_terms

    return vocab_map_terms(terms, SNOWBALL_STEMMERS[lang])
