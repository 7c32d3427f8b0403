"""Snowball stemmers: German, French, Spanish, Portuguese, Russian.

Implemented from the PUBLISHED algorithm descriptions (M.F. Porter's
Snowball project, snowballstem.org — "German stemming algorithm",
"French stemming algorithm", "Spanish stemming algorithm", "Portuguese
stemming algorithm", "Russian stemming algorithm"). No Snowball or
Lucene source was consulted or copied; the reference ships the same
algorithms as generated Java under
lucene/analysis/common/src/java/org/apache/lucene/analysis/snowball/
(SnowballFilter.java:53 and the per-language packages de/fr/es/pt/ru),
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
_FR_2B_A = ("â", "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant",
            "ante", "antes", "ants", "as", "asse", "assent", "asses",
            "assiez", "assions")
_FR_STEP2B = _bylen(_FR_2B_IONS, _FR_2B_E, _FR_2B_A)
_FR_STEP4 = _bylen(("ion",), ("ier", "ière", "Ier", "Ière"), ("e",))


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
    if not altered or found_ment:
        s = _longest(w, _FR_STEP2A)
        done2a = False
        if s:
            p = len(w) - len(s)
            if (p >= rv and p > 0 and not _v(w[p - 1]) and w[p - 1] != "H"
                    and p - 1 >= rv):
                w = w[:p]
                done2a = True
        altered = done2a
        # ---- step 2b: other verb suffixes ----
        if not done2a:
            s = _longest(w, _FR_STEP2B)
            if s:
                p = len(w) - len(s)
                before = w
                if s == "ions":
                    if p >= rv and p >= r2:
                        w = w[:p]
                elif s in _FR_2B_E:
                    if p >= rv:
                        w = w[:p]
                else:  # a-group
                    if p >= rv:
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
        s = _longest(w, _FR_STEP4)
        if s:
            p = len(w) - len(s)
            if s == "ion":
                if (p >= rv and p >= r2 and p > 0 and w[p - 1] in "st"
                        and p - 1 >= rv):
                    w = w[:p]
            elif s == "e":
                if p >= rv:
                    w = w[:p]
            else:  # ier, ière, Ier, Ière
                if p >= rv:
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
    if not changed1:
        done2a = False
        s = _longest(w, _ES_STEP2A)
        if s:
            p = len(w) - len(s)
            if p >= rv and p > 0 and w[p - 1] == "u":
                w = w[:p]
                done2a = True
        # ---- step 2b: other verb suffixes ----
        if not done2a:
            s = _longest(w, _ES_STEP2B)
            if s:
                p = len(w) - len(s)
                if p >= rv:
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
    ("logia", "logias"), ("uça~o", "uço~es"), ("ência", "ências"),
    ("amente",), ("mente",), ("idade", "idades"),
    ("iva", "ivo", "ivas", "ivos"), ("ira", "iras"),
)
_PT_STEP2 = _bylen((
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
    "era", "irá", "ava", "asse", "esse", "isse", "aste", "este",
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
        elif s in ("logia", "logias"):
            if p >= r2:
                w = w[:p] + "log"
        elif s in ("uça~o", "uço~es"):
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
        s = _longest(w, _PT_STEP2)
        if s:
            p = len(w) - len(s)
            if p >= rv:
                w = w[:p]
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
    stripping, then и, derivational (R2) and tidying steps."""
    w = word.replace("ё", "е")
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
# registry + vectorized filter
# ---------------------------------------------------------------------------

SNOWBALL_STEMMERS = {
    "german": german_stem,
    "french": french_stem,
    "spanish": spanish_stem,
    "portuguese": portuguese_stem,
    "russian": russian_stem,
}

# Per-language stop sets: the high-frequency function-word core of the
# published Snowball stop lists (snowballstem.org); deliberately small and
# stated from common knowledge rather than transcribed, and pluggable the
# same way ENGLISH_STOP_WORDS is. The reference wires the full lists via
# {Language}Analyzer.getDefaultStopSet().
SNOWBALL_STOPWORDS = {
    "german": frozenset(
        """der die das den dem des ein eine einer eines einem einen und
        oder aber nicht ist sind war waren sein ich du er sie es wir ihr
        im in zu mit von auf für als auch an bei nach um aus wie noch nur
        so dass was man wenn""".split()
    ),
    "french": frozenset(
        """le la les un une des du de au aux et ou mais ne pas est sont
        était je tu il elle nous vous ils elles ce cette ces que qui quoi
        dans sur sous avec sans pour par plus moins si son sa ses leur
        leurs mon ma mes ton ta tes notre votre on se en y a""".split()
    ),
    "spanish": frozenset(
        """el la los las un una unos unas y o pero no es son era de del
        al a en con por para sin sobre entre yo tú él ella nosotros ellos
        que quien como cuando donde su sus mi mis tu tus se lo le les nos
        me te si ya muy más""".split()
    ),
    "portuguese": frozenset(
        """o a os as um uma uns umas e ou mas não é são era foi de do da
        dos das no na nos nas em com por para sem sobre entre eu tu ele
        ela nós eles elas que quem como quando onde seu sua seus suas meu
        minha se lhe nos me te já muito mais ao""".split()
    ),
    "russian": frozenset(
        """и в во не что он на я с со как а то все она так его но да ты
        к у же вы за бы по ее мне было вот от меня еще нет о из ему
        теперь когда даже ну ли если уже или ни был него до вас""".split()
    ),
}


def snowball_filter_terms(terms, lang: str):
    """SnowballFilter analog over an analyzed term column — vocabulary-
    vectorized like stem.english_filter_terms: only the Categorical
    dictionary is stemmed; codes are remapped (stems may conflate)."""
    stem = SNOWBALL_STEMMERS[lang]
    if isinstance(terms, pd.Categorical):
        cats = terms.categories.to_numpy(dtype=object)
        new = np.array([stem(t) for t in cats], dtype=object)
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
    stemmed = np.array([stem(t) for t in uniq], dtype=object)
    return stemmed[inv]
