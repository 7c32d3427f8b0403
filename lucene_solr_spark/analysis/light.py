"""Non-Snowball "light" language packs: normalizers + light stemmers.

Semantics ported from the reference's analyzer packages (all are small
rule cascades from the published literature — Larkey et al. for Arabic,
Savoy for Czech/Bulgarian, Ramanathan & Rao for Hindi, Tala/Asian for
Indonesian, the UMass light stemmer for Latvian):

  arabic     — ArabicNormalizer (ar/ArabicNormalizer.java:37) +
               ArabicStemmer light10 (ar/ArabicStemmer.java:35)
  persian    — ArabicNormalizer + PersianNormalizer
               (fa/PersianNormalizer.java:35); no stemming, per the
               reference PersianAnalyzer
  czech      — CzechStemmer (cz/CzechStemmer.java:44): case +
               possessive removal + final palatalization normalize
  bulgarian  — BulgarianStemmer (bg/BulgarianStemmer.java:40): article
               + plural removal + vowel/ен/ъN tidy
  hindi      — HindiNormalizer (hi/HindiNormalizer.java:41, nukta/
               matra/virama folding) + HindiStemmer
               (hi/HindiStemmer.java:32, 1-5 char suffix ladder)
  indonesian — IndonesianStemmer (id/IndonesianStemmer.java:47):
               particle/possessive strip + flag-gated derivational
               prefix/suffix rules, syllable(=vowel)-count guarded
  latvian    — LatvianStemmer (lv/LatvianStemmer.java:39): affix table
               with per-affix vowel-count minimum + unpalatalization
  greek      — GreekLowerCaseFilter + the 23-rule GreekStemmer
               (analysis/greek.py)
  sorani     — SoraniNormalizer + SoraniStemmer
               (ckb/Sorani{Normalizer,Stemmer}.java)

Chain divergence (documented): the reference applies the stop filter at
language-specific points (Arabic before normalization — matched here;
Persian/Hindi after normalization — here stop runs first, so a stop
word spelled in a non-normalized variant is kept). Stop sets are small
high-frequency cores stated from common knowledge, like the Snowball
ones.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Arabic
# ---------------------------------------------------------------------------

_AR_NORM = str.maketrans({
    "آ": "ا", "أ": "ا", "إ": "ا",  # hamza->alef
    "ى": "ي",                                          # dotless yeh
    "ة": "ه",                                          # teh marbuta
    "ـ": None,                                              # tatweel
    "ً": None, "ٌ": None, "ٍ": None,              # -atan
    "َ": None, "ُ": None, "ِ": None,              # harakat
    "ّ": None, "ْ": None,                              # shadda/sukun
})

_AR_PREFIXES = ("ال", "وال",
                "بال", "كال",
                "فال", "لل", "و")
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")


def arabic_normalize(w: str) -> str:
    return w.translate(_AR_NORM)


def arabic_stem(w: str) -> str:
    """Light10: one prefix (list order, first match), then every matching
    suffix in list order; 1-char prefix needs len>=4, others len>=pfx+2;
    each suffix needs len>=suf+2 at removal time."""
    w = arabic_normalize(w)
    for p in _AR_PREFIXES:
        if w.startswith(p):
            if len(p) == 1:
                if len(w) >= 4:
                    w = w[len(p):]
                    break
            elif len(w) >= len(p) + 2:
                w = w[len(p):]
                break
    for s in _AR_SUFFIXES:
        if w.endswith(s) and len(w) >= len(s) + 2:
            w = w[: len(w) - len(s)]
    return w


# ---------------------------------------------------------------------------
# Persian (normalization only)
# ---------------------------------------------------------------------------

_FA_NORM = str.maketrans({
    "ی": "ي", "ے": "ي",   # farsi yeh / yeh barree
    "ک": "ك",                       # keheh -> kaf
    "ۀ": "ه", "ہ": "ه",   # heh+yeh / heh goal -> heh
    "ٔ": None,                           # hamza above
})


def persian_normalize(w: str) -> str:
    return arabic_normalize(w).translate(_FA_NORM)


# ---------------------------------------------------------------------------
# Czech
# ---------------------------------------------------------------------------

_CZ_CASE_5 = ("atech",)
_CZ_CASE_4 = ("ětem", "etem", "atům")
_CZ_CASE_3 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte",
              "ete", "ěti", "eti", "ího", "iho", "ími", "ímu", "imu",
              "ách", "ata", "aty", "ých", "ama", "ami", "ové", "ovi",
              "ými")
_CZ_CASE_2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us",
              "ým", "mi", "ou")
_CZ_VOWEL_1 = frozenset("aeiouůyáéíýě")


def czech_stem(w: str) -> str:
    n = len(w)
    if n > 7 and w.endswith(_CZ_CASE_5):
        w = w[:-5]
    elif n > 6 and w.endswith(_CZ_CASE_4):
        w = w[:-4]
    elif n > 5 and w.endswith(_CZ_CASE_3):
        w = w[:-3]
    elif n > 4 and w.endswith(_CZ_CASE_2):
        w = w[:-2]
    elif n > 3 and w[-1] in _CZ_VOWEL_1:
        w = w[:-1]
    if len(w) > 5 and w.endswith(("ov", "in", "ův")):
        w = w[:-2]
    if not w:
        return w
    # palatalization normalize on the final letters
    if w.endswith("čt"):
        return w[:-2] + "ck"
    if w.endswith("št"):
        return w[:-2] + "sk"
    if w[-1] in ("c", "č"):
        return w[:-1] + "k"
    if w[-1] in ("z", "ž"):
        return w[:-1] + "h"
    if len(w) > 1 and w[-2] == "e":
        return w[:-2] + w[-1]
    if len(w) > 2 and w[-2] == "ů":
        return w[:-2] + "o" + w[-1]
    return w


# ---------------------------------------------------------------------------
# Bulgarian
# ---------------------------------------------------------------------------


def bulgarian_stem(w: str) -> str:
    if len(w) < 4:
        return w
    if len(w) > 5 and w.endswith("ища"):
        return w[:-3]
    # article
    if len(w) > 6 and w.endswith("ият"):
        w = w[:-3]
    elif len(w) > 5 and w.endswith(("ът", "то", "те", "та", "ия")):
        w = w[:-2]
    elif len(w) > 4 and w.endswith("ят"):
        w = w[:-2]
    # plural
    if len(w) > 6 and w.endswith("овци"):
        w = w[:-3]
    elif len(w) > 6 and w.endswith("ове"):
        w = w[:-3]
    elif len(w) > 6 and w.endswith("еве"):
        w = w[:-3] + "й"
    elif len(w) > 5 and w.endswith("ища"):
        w = w[:-3]
    elif len(w) > 5 and w.endswith("та"):
        w = w[:-2]
    elif len(w) > 5 and w.endswith("ци"):
        w = w[:-2] + "к"
    elif len(w) > 5 and w.endswith("зи"):
        w = w[:-2] + "г"
    elif len(w) > 5 and w[-3] == "е" and w[-1] == "и":
        w = w[:-3] + "я" + w[-2]
    elif len(w) > 4 and w.endswith("си"):
        w = w[:-2] + "х"
    elif len(w) > 4 and w.endswith("и"):
        w = w[:-1]
    if len(w) > 3:
        if w.endswith("я"):
            w = w[:-1]
        if w.endswith(("а", "о", "е")):
            w = w[:-1]
    if len(w) > 4 and w.endswith("ен"):
        w = w[:-2] + "н"
    if len(w) > 5 and w[-2] == "ъ":
        w = w[:-2] + w[-1]
    return w


# ---------------------------------------------------------------------------
# Hindi
# ---------------------------------------------------------------------------

_HI_NORM_MAP = str.maketrans({
    "ँ": "ं",                       # candrabindu -> bindu
    "़": None,                           # nukta
    "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
    "क़": "क", "ख़": "ख", "ग़": "ग",
    "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
    "फ़": "फ", "य़": "य",
    "‍": None, "‌": None,           # zwj/zwnj
    "ॅ": "े", "ॆ": "े",
    "ॉ": "ो", "ॊ": "ो",
    "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ",
    "ॲ": "अ",
    "आ": "अ", "ई": "इ", "ऊ": "उ",
    "ॠ": "ऋ", "ॡ": "ऌ",
    "ऐ": "ए", "औ": "ओ",
    "ी": "ि", "ू": "ु", "ॄ": "ृ",
    "ॣ": "ॢ", "ै": "े", "ौ": "ो",
})


def hindi_normalize(w: str) -> str:
    # dead n (na + virama) -> anusvara, BEFORE the general virama delete
    w = w.replace("न्", "ं")
    w = w.translate(_HI_NORM_MAP)
    return w.replace("्", "")  # remaining viramas


_HI_SUF_5 = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
_HI_SUF_4 = ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे",
             "ेंगे", "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं",
             "ताएं", "ियाँ", "ियों", "ियां")
_HI_SUF_3 = ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे",
             "ाने", "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं",
             "ुओं", "ुएं", "ुआं")
_HI_SUF_2 = ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते",
             "ीं", "ती", "ता", "ाँ", "ां", "ों", "ें")
_HI_SUF_1 = ("ो", "े", "ू", "ु", "ी", "ि", "ा")


def hindi_stem(w: str) -> str:
    w = hindi_normalize(w)
    n = len(w)
    for k, sufs in ((5, _HI_SUF_5), (4, _HI_SUF_4), (3, _HI_SUF_3),
                    (2, _HI_SUF_2), (1, _HI_SUF_1)):
        if n > k + 1 and w.endswith(sufs):
            return w[:-k]
    return w


# ---------------------------------------------------------------------------
# Indonesian
# ---------------------------------------------------------------------------

_ID_VOWELS = frozenset("aeiou")


def indonesian_stem(word: str) -> str:
    w = word
    syl = sum(1 for c in w if c in _ID_VOWELS)
    removed = set()

    def particle(w, syl):
        if w.endswith(("kah", "lah", "pun")):
            return w[:-3], syl - 1
        return w, syl

    def possessive(w, syl):
        if w.endswith(("ku", "mu")):
            return w[:-2], syl - 1
        if w.endswith("nya"):
            return w[:-3], syl - 1
        return w, syl

    def first_prefix(w, syl):
        if w.startswith("meng"):
            removed.add("meng"); return w[4:], syl - 1
        if w.startswith("meny") and len(w) > 4 and w[4] in _ID_VOWELS:
            removed.add("meng"); return "s" + w[4:], syl - 1
        if w.startswith("men"):
            removed.add("meng"); return w[3:], syl - 1
        if w.startswith("mem"):
            removed.add("meng"); return w[3:], syl - 1
        if w.startswith("me"):
            removed.add("meng"); return w[2:], syl - 1
        if w.startswith("peng"):
            removed.add("peng"); return w[4:], syl - 1
        if w.startswith("peny") and len(w) > 4 and w[4] in _ID_VOWELS:
            removed.add("peng"); return "s" + w[4:], syl - 1
        if w.startswith("peny"):
            removed.add("peng"); return w[4:], syl - 1
        if w.startswith("pen") and len(w) > 3 and w[3] in _ID_VOWELS:
            removed.add("peng"); return "t" + w[3:], syl - 1
        if w.startswith("pen"):
            removed.add("peng"); return w[3:], syl - 1
        if w.startswith("pem"):
            removed.add("peng"); return w[3:], syl - 1
        if w.startswith("di"):
            removed.add("di"); return w[2:], syl - 1
        if w.startswith("ter"):
            removed.add("ter"); return w[3:], syl - 1
        if w.startswith("ke"):
            removed.add("ke"); return w[2:], syl - 1
        return w, syl

    def second_prefix(w, syl):
        if w.startswith("ber"):
            removed.add("ber"); return w[3:], syl - 1
        if w == "belajar":
            removed.add("ber"); return w[3:], syl - 1
        if (w.startswith("be") and len(w) > 4 and w[2] not in _ID_VOWELS
                and w[3] == "e" and w[4] == "r"):
            removed.add("ber"); return w[2:], syl - 1
        if w.startswith("per"):
            return w[3:], syl - 1
        if w == "pelajar":
            return w[3:], syl - 1
        if w.startswith("pe"):
            removed.add("pe"); return w[2:], syl - 1
        return w, syl

    def suffix(w, syl):
        if (w.endswith("kan") and "ke" not in removed
                and "peng" not in removed and "pe" not in removed):
            return w[:-3], syl - 1
        if (w.endswith("an") and "di" not in removed
                and "meng" not in removed and "ter" not in removed):
            return w[:-2], syl - 1
        if (w.endswith("i") and not w.endswith("si")
                and "ber" not in removed and "ke" not in removed
                and "peng" not in removed):
            return w[:-1], syl - 1
        return w, syl

    if syl > 2:
        w, syl = particle(w, syl)
    if syl > 2:
        w, syl = possessive(w, syl)
    # derivational
    old = w
    if syl > 2:
        w, syl = first_prefix(w, syl)
    if w != old:
        old = w
        if syl > 2:
            w, syl = suffix(w, syl)
        if w != old and syl > 2:
            w, syl = second_prefix(w, syl)
    else:
        if syl > 2:
            w, syl = second_prefix(w, syl)
        if syl > 2:
            w, syl = suffix(w, syl)
    return w


# ---------------------------------------------------------------------------
# Latvian
# ---------------------------------------------------------------------------

# (affix, suffix vowel count, palatalizes)
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True), ("e", 1, False),
    ("ā", 1, False), ("ē", 1, False), ("ī", 1, False),
    ("ū", 1, False), ("o", 1, False), ("s", 0, False), ("š", 0, False),
)
_LV_VOWELS = frozenset("aeiouāīēū")


def latvian_stem(w: str) -> str:
    nv = sum(1 for c in w if c in _LV_VOWELS)
    for affix, vc, palatalizes in _LV_AFFIXES:
        if nv > vc and len(w) >= len(affix) + 3 and w.endswith(affix):
            removed = w[len(w) - len(affix)]
            w = w[: len(w) - len(affix)]
            return _lv_unpalatalize(w, removed) if palatalizes else w
    return w


def _lv_unpalatalize(w: str, removed: str) -> str:
    if removed == "u":
        if w.endswith("kš"):
            return w[:-2] + "kst"
        if w.endswith("ņņ"):
            return w[:-2] + "nn"
    if w.endswith(("pj", "bj", "mj", "vj")):
        return w[:-1]
    for a, b in (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"),
                 ("žļ", "zl"), ("ļņ", "ln"), ("ļļ", "ll")):
        if w.endswith(a):
            return w[:-2] + b
    if w.endswith("č"):
        return w[:-1] + "c"
    if w.endswith("ļ"):
        return w[:-1] + "l"
    if w.endswith("ņ"):
        return w[:-1] + "n"
    return w


# ---------------------------------------------------------------------------
# registry + vectorized filter (same shape as snowball.py)
# ---------------------------------------------------------------------------

from .greek import greek_stem  # noqa: E402  (module-level registry)

# ---------------------------------------------------------------------------
# Sorani Kurdish (ckb/SoraniNormalizer.java + ckb/SoraniStemmer.java):
# yeh/kaf/heh/reh normalization with in-place ZWNJ + harakat/format
# deletion (the scan sees the CURRENT length, so a heh only becomes AE
# when it is final at visit time), then the fixed postposition /
# possessive / ezafe / definiteness suffix ladder — including the
# reference's own quirk that the 2-char 'نا' branch strips one char.
# ---------------------------------------------------------------------------

_CKB_DELETE = frozenset(
    "ـًٌٍَُِّْ"
)


def sorani_normalize(w: str) -> str:
    import unicodedata

    s = list(w)
    i = 0
    while i < len(s):
        c = s[i]
        if c in ("ي", "ى"):      # yeh forms -> farsi yeh
            s[i] = "ی"
        elif c == "ك":                  # kaf -> keheh
            s[i] = "ک"
        elif c == "‌":                  # ZWNJ
            if i > 0 and s[i - 1] == "ه":
                s[i - 1] = "ە"          # heh+ZWNJ -> AE
            del s[i]
            continue
        elif c == "ه":                  # word-final heh -> AE
            if i == len(s) - 1:
                s[i] = "ە"
        elif c == "ة":                  # teh marbuta -> AE
            s[i] = "ە"
        elif c == "ھ":                  # heh doachashmee -> heh
            s[i] = "ه"
        elif c == "ر":                  # word-initial reh -> rreh
            if i == 0:
                s[i] = "ڕ"
        elif c == "ڒ":                  # rreh-above -> rreh
            s[i] = "ڕ"
        elif c in _CKB_DELETE or unicodedata.category(c) == "Cf":
            del s[i]
            continue
        i += 1
    return "".join(s)


def sorani_stem(w: str) -> str:
    w = sorani_normalize(w)
    n = len(w)
    # postposition
    if n > 5 and w.endswith("دا"):
        w = w[:-2]; n -= 2
    elif n > 4 and w.endswith("نا"):
        w = w[:-1]; n -= 1                  # sic: one char, per reference
    elif n > 6 and w.endswith("ەوە"):
        w = w[:-3]; n -= 3
    # possessive pronoun
    if n > 6 and (w.endswith("مان") or w.endswith("یان")
                  or w.endswith("تان")):
        w = w[:-3]; n -= 3
    # indefinite singular ezafe
    if n > 6 and w.endswith("ێکی"):
        return w[:-3]
    if n > 7 and w.endswith("یەکی"):
        return w[:-4]
    # the rest is one exclusive ladder
    if n > 5 and w.endswith("ێک"):
        return w[:-2]
    if n > 6 and w.endswith("یەک"):
        return w[:-3]
    if n > 6 and w.endswith("ەکە"):
        return w[:-3]
    if n > 5 and w.endswith("کە"):
        return w[:-2]
    if n > 7 and w.endswith("ەکان"):
        return w[:-4]
    if n > 6 and w.endswith("کان"):
        return w[:-3]
    if n > 7 and w.endswith("یانی"):
        return w[:-4]
    if n > 6 and w.endswith("انی"):
        return w[:-3]
    if n > 6 and w.endswith("یان"):
        return w[:-3]
    if n > 5 and w.endswith("ان"):
        return w[:-2]
    if n > 7 and w.endswith("یانە"):
        return w[:-4]
    if n > 6 and w.endswith("انە"):
        return w[:-3]
    if n > 5 and (w.endswith("ایە") or w.endswith("ەیە")):
        return w[:-2]
    if n > 4 and w.endswith("ە"):
        return w[:-1]
    if n > 4 and w.endswith("ی"):
        return w[:-1]
    return w



# ---------------------------------------------------------------------------
# Brazilian Portuguese (br/BrazilianStemmer.java): the RSLP-flavoured
# rule cascade behind BrazilianAnalyzer — distinct from the Snowball
# 'portuguese' pack. Faithful to the reference's exact quirks: R1/R2/RV
# are captured as STRINGS once and never refreshed (later steps test
# the stale region tail but each removal is re-guarded on the current
# term), the 'logias' rule returns success without assigning, and the
# step-2 'ira' rule "removes" 'ava' (normally a no-op). Rules
# machine-extracted from the reference source in order.
# ---------------------------------------------------------------------------

_BR_ACCENTS = str.maketrans({
    "á": "a", "â": "a", "ã": "a", "é": "e", "ê": "e", "í": "i",
    "ó": "o", "ô": "o", "õ": "o", "ú": "u", "ü": "u", "ç": "c",
    "ñ": "n",
})
_BR_PUNCT = set("\"'-,;.?!")
_BR_VOWELS = frozenset("aeiou")

_BR_STEP1 = (  # (suffix, region, action, replacement, preceded-by)
    ('uciones', 'R2', 'replace', 'u', None),
    ('imentos', 'R2', 'remove', None, None),
    ('amentos', 'R2', 'remove', None, None),
    ('adores', 'R2', 'remove', None, None),
    ('adoras', 'R2', 'remove', None, None),
    ('logias', 'R2', 'noop', 'log', None),
    ('encias', 'R2', 'replace', 'ente', None),
    ('amente', 'R1', 'remove', None, None),
    ('idades', 'R2', 'remove', None, None),
    ('acoes', 'R2', 'remove', None, None),
    ('imento', 'R2', 'remove', None, None),
    ('amento', 'R2', 'remove', None, None),
    ('adora', 'R2', 'remove', None, None),
    ('ismos', 'R2', 'remove', None, None),
    ('istas', 'R2', 'remove', None, None),
    ('logia', 'R2', 'replace', 'log', None),
    ('ucion', 'R2', 'replace', 'u', None),
    ('encia', 'R2', 'replace', 'ente', None),
    ('mente', 'R2', 'remove', None, None),
    ('idade', 'R2', 'remove', None, None),
    ('acao', 'R2', 'remove', None, None),
    ('ezas', 'R2', 'remove', None, None),
    ('icos', 'R2', 'remove', None, None),
    ('icas', 'R2', 'remove', None, None),
    ('ismo', 'R2', 'remove', None, None),
    ('avel', 'R2', 'remove', None, None),
    ('ivel', 'R2', 'remove', None, None),
    ('ista', 'R2', 'remove', None, None),
    ('osos', 'R2', 'remove', None, None),
    ('osas', 'R2', 'remove', None, None),
    ('ador', 'R2', 'remove', None, None),
    ('ivas', 'R2', 'remove', None, None),
    ('ivos', 'R2', 'remove', None, None),
    ('iras', 'RV', 'replace', 'ir', 'e'),
    ('eza', 'R2', 'remove', None, None),
    ('ico', 'R2', 'remove', None, None),
    ('ica', 'R2', 'remove', None, None),
    ('oso', 'R2', 'remove', None, None),
    ('osa', 'R2', 'remove', None, None),
    ('iva', 'R2', 'remove', None, None),
    ('ivo', 'R2', 'remove', None, None),
    ('ira', 'RV', 'replace', 'ir', 'e'),
)
_BR_STEP2 = (  # (RV-condition suffix, suffix removed from the term)
    ('issemos', 'issemos'), ('essemos', 'essemos'), ('assemos', 'assemos'),
    ('ariamos', 'ariamos'), ('eriamos', 'eriamos'), ('iriamos', 'iriamos'),
    ('iremos', 'iremos'), ('eremos', 'eremos'), ('aremos', 'aremos'),
    ('avamos', 'avamos'), ('iramos', 'iramos'), ('eramos', 'eramos'),
    ('aramos', 'aramos'), ('asseis', 'asseis'), ('esseis', 'esseis'),
    ('isseis', 'isseis'), ('arieis', 'arieis'), ('erieis', 'erieis'),
    ('irieis', 'irieis'), ('irmos', 'irmos'), ('iamos', 'iamos'),
    ('armos', 'armos'), ('ermos', 'ermos'), ('areis', 'areis'),
    ('ereis', 'ereis'), ('ireis', 'ireis'), ('asses', 'asses'),
    ('esses', 'esses'), ('isses', 'isses'), ('astes', 'astes'),
    ('assem', 'assem'), ('essem', 'essem'), ('issem', 'issem'),
    ('ardes', 'ardes'), ('erdes', 'erdes'), ('irdes', 'irdes'),
    ('ariam', 'ariam'), ('eriam', 'eriam'), ('iriam', 'iriam'),
    ('arias', 'arias'), ('erias', 'erias'), ('irias', 'irias'),
    ('estes', 'estes'), ('istes', 'istes'), ('areis', 'areis'),
    ('aveis', 'aveis'), ('aria', 'aria'), ('eria', 'eria'),
    ('iria', 'iria'), ('asse', 'asse'), ('esse', 'esse'), ('isse', 'isse'),
    ('aste', 'aste'), ('este', 'este'), ('iste', 'iste'), ('arei', 'arei'),
    ('erei', 'erei'), ('irei', 'irei'), ('aram', 'aram'), ('eram', 'eram'),
    ('iram', 'iram'), ('avam', 'avam'), ('arem', 'arem'), ('erem', 'erem'),
    ('irem', 'irem'), ('ando', 'ando'), ('endo', 'endo'), ('indo', 'indo'),
    ('arao', 'arao'), ('erao', 'erao'), ('irao', 'irao'), ('adas', 'adas'),
    ('idas', 'idas'), ('aras', 'aras'), ('eras', 'eras'), ('iras', 'iras'),
    ('avas', 'avas'), ('ares', 'ares'), ('eres', 'eres'), ('ires', 'ires'),
    ('ados', 'ados'), ('idos', 'idos'), ('amos', 'amos'), ('emos', 'emos'),
    ('imos', 'imos'), ('iras', 'iras'), ('ieis', 'ieis'), ('ada', 'ada'),
    ('ida', 'ida'), ('ara', 'ara'), ('era', 'era'), ('ira', 'ava'),
    ('iam', 'iam'), ('ado', 'ado'), ('ido', 'ido'), ('ias', 'ias'),
    ('ais', 'ais'), ('eis', 'eis'), ('ira', 'ira'), ('ear', 'ear'),
    ('ia', 'ia'), ('ei', 'ei'), ('am', 'am'), ('em', 'em'), ('ar', 'ar'),
    ('er', 'er'), ('ir', 'ir'), ('as', 'as'), ('es', 'es'), ('is', 'is'),
    ('eu', 'eu'), ('iu', 'iu'), ('iu', 'iu'), ('ou', 'ou'),
)


def _br_r1(v):
    """getR1: region after the first non-vowel following a vowel; the
    boundary must sit strictly before the LAST character (reference
    loops bound j < len-1), else None."""
    if v is None:
        return None
    i = len(v) - 1
    j = 0
    while j < i and v[j] not in _BR_VOWELS:
        j += 1
    if j >= i:
        return None
    while j < i and v[j] in _BR_VOWELS:
        j += 1
    if j >= i:
        return None
    return v[j + 1:]


def _br_rv(v):
    if v is None:
        return None
    i = len(v) - 1
    if i > 0 and v[1] not in _BR_VOWELS:
        j = 2
        while j < i and v[j] not in _BR_VOWELS:
            j += 1
        if j < i:
            return v[j + 1:]
    if i > 1 and v[0] in _BR_VOWELS and v[1] in _BR_VOWELS:
        j = 2
        while j < i and v[j] in _BR_VOWELS:
            j += 1
        if j < i:
            return v[j + 1:]
    if i > 2:
        return v[3:]
    return None


def _br_rm(ct, suf):
    """removeSuffix: guarded on the CURRENT term."""
    return ct[: -len(suf)] if ct.endswith(suf) else ct


def brazilian_stem(term: str):
    """Returns the stem, or None when the term is not indexable (the
    filter keeps the original then)."""
    ct = term.lower().translate(_BR_ACCENTS)
    if len(ct) >= 2 and ct[0] in _BR_PUNCT:
        ct = ct[1:]
    if len(ct) >= 2 and ct[-1] in _BR_PUNCT:
        ct = ct[:-1]
    if not (2 < len(ct) < 30):
        return None
    if not all(c.isalpha() for c in ct):
        return ct
    r1 = _br_r1(ct)
    r2 = _br_r1(r1)
    rv = _br_rv(ct)
    regions = {"R1": r1, "R2": r2, "RV": rv}

    altered = False
    for suf, reg, act, repl, prec in _BR_STEP1:
        region = regions[reg]
        if region is None or not ct.endswith(suf) \
                or not region.endswith(suf):
            continue
        if prec is not None and not ct[: -len(suf)].endswith(prec):
            continue
        if act == "remove":
            ct = ct[: -len(suf)]
        elif act == "replace":
            ct = ct[: -len(suf)] + repl
        # 'noop': reference bug — success without changing the term
        altered = True
        break
    if not altered and rv is not None:
        for cond, rm in _BR_STEP2:
            if rv.endswith(cond):
                ct = _br_rm(ct, rm)
                altered = True
                break

    if altered:
        # step 3: i preceded by c, tested in the (stale) RV
        if rv is not None and rv.endswith("i") and rv[:-1].endswith("c"):
            ct = _br_rm(ct, "i")
    elif rv is not None:
        # step 4: residual suffix
        for s in ("os", "a", "i", "o"):
            if rv.endswith(s):
                ct = _br_rm(ct, s)
                break

    # step 5: final e (with gu/ci undress), tested in the stale RV
    if rv is not None and rv.endswith("e"):
        if rv[:-1].endswith("gu"):
            ct = _br_rm(ct, "e")
            ct = _br_rm(ct, "u")
        elif rv[:-1].endswith("ci"):
            ct = _br_rm(ct, "e")
            ct = _br_rm(ct, "i")
        else:
            ct = _br_rm(ct, "e")
    return ct


def brazilian_term(term: str) -> str:
    """BrazilianStemFilter behavior: keep the original when stem() is
    null (too short/long)."""
    s = brazilian_stem(term)
    return term if s is None else s


LIGHT_STEMMERS = {
    "arabic": arabic_stem,
    "persian": persian_normalize,
    "czech": czech_stem,
    "bulgarian": bulgarian_stem,
    "hindi": hindi_stem,
    "indonesian": indonesian_stem,
    "latvian": latvian_stem,
    "greek": greek_stem,
    "sorani": sorani_stem,
    "brazilian": brazilian_term,
}

LIGHT_STOPWORDS = {
    "arabic": frozenset(
        """في من على و ما هذا هذه ذلك التي الذي ان أن إن كان كانت هو هي
        الى إلى عن مع لم لا ثم او أو اذا إذا كل بعد قبل عند قد لقد منذ
        حتى بين هناك""".split()
    ),
    "persian": frozenset(
        """و در به از که این آن را با است بود شد برای تا هم او ما من
        شما آنها اگر هر نه یا چه بر یک خود دو نیز باید""".split()
    ),
    "czech": frozenset(
        """a aby ale ani asi až bez bude by byl byla bylo co což do i
        ho já jak jako je jeho jejich jen ještě ji jsem jsme jsou k kde
        když kterou který má mezi mi mně mu na nad není nám o od on
        po pod pro proto protože před při s se si své ta tak také te
        to tohle u už v ve více však z za že""".split()
    ),
    "bulgarian": frozenset(
        """а аз ако але бе без беше би бил била било брой в вас ваш във
        г г-н д да дали до е едва за зад защо и из или им както като
        кога когато което които кой което ли междуме мен ми мнозина
        може на над назад най не него нея ни ние но от по пред при с
        са само се си след със та тази така там те тези то това той
        тук тя у че чрез ще""".split()
    ),
    "hindi": frozenset(
        """के का एक में की है यह और से हैं को पर इस होता कि जो कर मे
        गया करने किया लिये अपने ने बनी नहीं तो ही या हो था द्वारा हुआ
        तक साथ करना वाले बाद लिए सकते इसके अभी भी वह वे थे""".split()
    ),
    "indonesian": frozenset(
        """yang dan di ke dari ini itu dengan untuk pada adalah sebagai
        juga dalam tidak akan oleh saya kami kita mereka dia ia atau
        bisa ada sudah telah belum harus karena jika maka bahwa serta
        para saat lebih bagi tentang seperti hingga antara masih""".split()
    ),
    "latvian": frozenset(
        """un ir es tu viņš viņa mēs jūs tie tās kas ko kam par ar uz
        no pie bet ja vai arī kā tikai šis šī tas tā jau vēl pēc pirms
        bija būs būt nav ne savu man tev""".split()
    ),
    # accented stop words carry both spellings: the generic-lowercase
    # stop check runs before the Greek tonos fold (see greek.py)
    "greek": frozenset(
        """ο η το οι τα του της των τον την και κι είναι ειναι με σε
        για από απο να δεν δε στο στη στην στον ότι οτι που ως πως αν
        θα είχε ειχε έχει εχει αλλά αλλα αυτός αυτος αυτή αυτη αυτό
        αυτο ή μια ένα ενα δύο δυο""".split()
    ),
    "sorani": frozenset(
        """و لە بە بۆ کە لەگەڵ ئەم ئەو ئەوە ئەمە هەر هەموو هیچ چی
        بەڵام یان ئەگەر چونکە وەک دوای پێش لەسەر لەژێر نێوان بەبێ
        من تۆ ئێمە ئێوە ئەوان خۆی هەیە نییە دەبێت بوو""".split()
    ),
    "brazilian": frozenset(
        """de a o que e do da em um para é com não uma os no se na
        por mais as dos como mas foi ao ele das tem à seu sua ou ser
        quando muito há nos já está eu também só pelo pela até isso
        ela entre era depois sem mesmo aos ter seus quem nas me esse
        eles estão você tinha foram essa num nem suas meu às minha
        têm numa pelos elas havia seja qual será nós tenho lhe deles
        essas esses pelas este fosse dele""".split()
    ),
}


def light_filter_terms(terms, lang: str):
    """Light-stemmer analog of snowball_filter_terms: dictionary-only
    map, codes remapped (stems may conflate) via stem.vocab_map_terms."""
    from .stem import vocab_map_terms

    return vocab_map_terms(terms, LIGHT_STEMMERS[lang])
