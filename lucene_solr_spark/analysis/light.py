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
  brazilian  — BrazilianStemmer's RSLP-flavoured cascade
               (br/BrazilianStemmer.java), the BrazilianAnalyzer
               chain (distinct from the Snowball portuguese pack)
  galician   — GalicianStemmer, RSLPStemmerBase over the published
               galician.rslp rule file (gl/GalicianStemmer.java)

Every stemmer/normalizer here is differentially verified byte-identical
to the compiled reference Java (tools/fuzz_light.py). One chain note:
HindiAnalyzer also runs IndicNormalizationFilter before the Hindi
normalizer; for Devanagari its compositions (base+nukta -> precomposed)
are immediately re-folded by HindiNormalizer's nukta deletion, so the
composed chain here (hindi_normalize deletes nukta directly) matches on
those shapes; the exotic cross-script logic is intentionally omitted.

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


# IndicNormalizer (analysis/in/IndicNormalizer.java:70-231), Devanagari
# rows only (flag(DEVANAGARI)), in the reference table's order — compose
# independent-vowel/nukta cluster sequences into single letters BEFORE
# HindiNormalizer runs. Offsets are relative to the 0x0900 block base;
# ch2 == -1 means a 2-char rule. First matching row wins; matched rows
# consume 1 or 2 following chars; the scan does not revisit a composed
# position (normalize() increments past it).
_INDIC_DEV_ROWS = [
    (0x05, 0x3E, 0x45, 0x11), (0x05, 0x3E, 0x46, 0x12),
    (0x05, 0x3E, 0x47, 0x13), (0x05, 0x3E, 0x48, 0x14),
    (0x05, 0x3E, -1, 0x06), (0x05, 0x45, -1, 0x72),
    (0x05, 0x46, -1, 0x04), (0x05, 0x49, -1, 0x11),
    (0x05, 0x4A, -1, 0x12), (0x05, 0x4B, -1, 0x13),
    (0x05, 0x4C, -1, 0x14), (0x06, 0x45, -1, 0x11),
    (0x06, 0x46, -1, 0x12), (0x06, 0x47, -1, 0x13),
    (0x06, 0x48, -1, 0x14), (0x09, 0x41, -1, 0x0A),
    (0x0F, 0x45, -1, 0x0D), (0x0F, 0x46, -1, 0x0E),
    (0x0F, 0x47, -1, 0x10), (0x15, 0x3C, -1, 0x58),
    (0x16, 0x3C, -1, 0x59), (0x17, 0x3C, -1, 0x5A),
    (0x1C, 0x3C, -1, 0x5B), (0x21, 0x3C, -1, 0x5C),
    (0x22, 0x3C, -1, 0x5D), (0x28, 0x3C, -1, 0x29),
    (0x2B, 0x3C, -1, 0x5E), (0x2F, 0x3C, -1, 0x5F),
    (0x30, 0x3C, -1, 0x31), (0x33, 0x3C, -1, 0x34),
    (0x3E, 0x45, -1, 0x49), (0x3E, 0x46, -1, 0x4A),
    (0x3E, 0x47, -1, 0x4B), (0x3E, 0x48, -1, 0x4C),
]
_INDIC_DEV_BY_CH0: dict[int, list[tuple[int, int, int, int]]] = {}
for _r in _INDIC_DEV_ROWS:
    _INDIC_DEV_BY_CH0.setdefault(_r[0], []).append(_r)
_DEV_BASE = 0x0900


def _dev(c: str) -> int:
    o = ord(c) - _DEV_BASE
    return o if 0 <= o < 0x80 else -1


def indic_normalize(w: str) -> str:
    """IndicNormalizer.normalize over the Devanagari block: compose
    e.g. अ+ा -> आ, ए+े -> ऐ, क+़ -> क़ so HindiNormalizer sees the
    canonical letters (the reference chain runs this filter first)."""
    s = list(w)
    i = 0
    while i < len(s):
        ch0 = _dev(s[i])
        rows = _INDIC_DEV_BY_CH0.get(ch0)
        if rows and i + 1 < len(s):
            ch1 = _dev(s[i + 1])
            if ch1 >= 0:
                ch2 = -1
                if i + 2 < len(s):
                    if s[i + 2] == "‍":
                        ch2 = 0xFF
                    else:
                        ch2 = _dev(s[i + 2])
                for _c0, c1, c2, res in rows:
                    if c1 == ch1 and (c2 < 0 or c2 == ch2):
                        s[i] = chr(_DEV_BASE + res)
                        del s[i + 1]
                        if c2 >= 0:
                            del s[i + 1]
                        break
        i += 1
    return "".join(s)


def hindi_normalize(w: str) -> str:
    """HindiNormalizer alone (hi/HindiNormalizer.java) — the kernel
    contract tools/fuzz_light.py pins byte-identically. The analyzer
    chain runs IndicNormalizer first: hindi_chain_normalize."""
    # dead n (na + virama) -> anusvara, BEFORE the general virama delete
    w = w.replace("न्", "ं")
    w = w.translate(_HI_NORM_MAP)
    return w.replace("्", "")  # remaining viramas


def hindi_chain_normalize(w: str) -> str:
    # the reference chain position: IndicNormalization THEN
    # HindiNormalization (hi/HindiAnalyzer.java createComponents)
    return hindi_normalize(indic_normalize(w))


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


def hindi_stem_suffixes(w: str) -> str:
    """HindiStemmer's suffix ladder alone — expects ALREADY-normalized
    input (the chain runs Indic+Hindi normalization before the stop
    filter, then this after; analysis/chain.py wires the split so the
    normalizers run exactly once, like the reference filter order)."""
    n = len(w)
    for k, sufs in ((5, _HI_SUF_5), (4, _HI_SUF_4), (3, _HI_SUF_3),
                    (2, _HI_SUF_2), (1, _HI_SUF_1)):
        if n > k + 1 and w.endswith(sufs):
            return w[:-k]
    return w


def hindi_stem(w: str) -> str:
    """Standalone full chain (normalize + stem) for the vocab-mapped
    LIGHT_STEMMERS registry path."""
    return hindi_stem_suffixes(hindi_normalize(w))


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


def sorani_stem_suffixes(w: str) -> str:
    """SoraniStemmer's ladder alone — expects ALREADY-normalized input.
    Normalization is NOT idempotent (ھ -> ه on the first pass would
    become word-final ه -> ە on a second), so the late-stop chain
    (analysis/chain.py) runs sorani_normalize exactly once before the
    stop filter and this after, like the reference filter order —
    double-normalizing was a real fuzz_chain.py-caught bug."""
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


def sorani_stem(w: str) -> str:
    """Standalone full chain (normalize + stem) for the vocab-mapped
    LIGHT_STEMMERS registry path."""
    return sorani_stem_suffixes(sorani_normalize(w))


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



# ---------------------------------------------------------------------------
# Galician (gl/GalicianStemmer.java + RSLPStemmerBase over the RSLG
# rule file gl/galician.rslp): plural, unification and adverb passes,
# augmentative repeated to a fixed point, noun-else-verb, a final
# vowel pass, then accent removal. Rule semantics per RSLPStemmerBase:
# first matching rule wins (ordered), a rule needs
# len(word) - len(suffix) >= min, and exceptions match either the
# whole word (flag 1) or as suffixes (flag 0). Rule data
# machine-extracted from the published galician.rslp.
# ---------------------------------------------------------------------------

_GL_STEPS = {
    'plural': {
        "min": 3, "whole_word_exc": True,
        "end": ('s',),
        "rules": (
        ('ns', 1, 'n', ('luns', 'furatapóns', 'furatapons')),
        ('ós', 3, 'ón', None),
        ('ões', 3, 'ón', None),
        ('ães', 1, 'ão', ('mães', 'magalhães')),
        ('ais', 2, 'al', ('cais', 'tais', 'mais', 'pais', 'ademais')),
        ('áis', 2, 'al', ('cáis', 'táis', 'máis', 'páis', 'ademáis')),
        ('éis', 2, 'el', None),
        ('eis', 2, 'el', None),
        ('óis', 2, 'ol', ('escornabóis',)),
        ('ois', 2, 'ol', ('escornabois',)),
        ('ís', 2, 'il', ('país',)),
        ('is', 2, 'il', ('menfis', 'pais', 'kinguis')),
        ('les', 2, 'l', ('ingles', 'marselles', 'montreales', 'senegales', 'manizales', 'móstoles', 'nápoles')),
        ('res', 3, 'r', ('petres', 'henares', 'cáceres', 'baleares', 'linares', 'londres', 'mieres', 'miraflores', 'mércores', 'venres', 'pires')),
        ('ces', 2, 'z', None),
        ('zes', 2, 'z', None),
        ('ises', 3, 'z', None),
        ('ás', 1, 'al', ('más',)),
        ('ses', 2, 's', None),
        ('s', 2, '', ('barbadés', 'barcelonés', 'cantonés', 'gabonés', 'llanés', 'medinés', 'escocés', 'escocês', 'francês', 'barcelonês', 'cantonês', 'macramés', 'reves', 'barcelones', 'cantones', 'gabones', 'llanes', 'magallanes', 'medines', 'escoces', 'frances', 'xoves', 'martes', 'aliás', 'pires', 'lápis', 'cais', 'mais', 'mas', 'menos', 'férias', 'pêsames', 'crúcis', 'país', 'cangas', 'atenas', 'asturias', 'canarias', 'filipinas', 'honduras', 'molucas', 'caldas', 'mascareñas', 'micenas', 'covarrubias', 'psoas', 'óculos', 'nupcias', 'xoves', 'martes', 'llanes')),
        ),
    },
    'unification': {
        "min": 3, "whole_word_exc": False,
        "end": None,
        "rules": (
        ('íssimo', 5, 'ísimo', None),
        ('íssima', 5, 'ísima', None),
        ('aço', 4, 'azo', None),
        ('aça', 4, 'aza', None),
        ('uça', 4, 'uza', None),
        ('lhar', 2, 'llar', None),
        ('lher', 2, 'ller', None),
        ('lhor', 2, 'llor', None),
        ('lho', 1, 'llo', None),
        ('nhar', 2, 'ñar', None),
        ('nhor', 2, 'ñor', None),
        ('nho', 1, 'ño', None),
        ('nha', 1, 'ña', None),
        ('ário', 3, 'ario', None),
        ('ária', 3, 'aria', None),
        ('able', 2, 'ábel', None),
        ('ável', 2, 'ábel', None),
        ('ible', 2, 'íbel', None),
        ('ível', 2, 'íbel', None),
        ('çom', 2, 'ción', None),
        ('agem', 2, 'axe', None),
        ('age', 2, 'axe', None),
        ('ão', 3, 'ón', None),
        ('ao', 1, 'án', None),
        ('au', 1, 'án', None),
        ('om', 3, 'ón', None),
        ('m', 2, 'n', None),
        ),
    },
    'adverb': {
        "min": 9, "whole_word_exc": False,
        "end": None,
        "rules": (
        ('mente', 4, '', ('experimente', 'vehemente', 'sedimente')),
        ),
    },
    'augmentative': {
        "min": 5, "whole_word_exc": True,
        "end": None,
        "rules": (
        ('dísimo', 5, '', None),
        ('dísima', 5, '', None),
        ('bilísimo', 3, '', None),
        ('bilísima', 3, '', None),
        ('ísimo', 3, '', None),
        ('ísima', 3, '', None),
        ('ésimo', 3, '', None),
        ('ésima', 3, '', None),
        ('érrimo', 4, '', None),
        ('érrima', 4, '', None),
        ('ana', 2, '', ('argana', 'banana', 'choupana', 'espadana', 'faciana', 'iguana', 'lantana', 'macana', 'membrana', 'mesana', 'nirvana', 'obsidiana', 'palangana', 'pavana', 'persiana', 'pestana', 'porcelana', 'pseudomembrana', 'roldana', 'sábana', 'salangana', 'saragana', 'ventana')),
        ('án', 3, '', ('ademán', 'bardán', 'barregán', 'corricán', 'curricán', 'faisán', 'furacán', 'fustán', 'gabán', 'gabián', 'galán', 'gañán', 'lavacán', 'mazán', 'mourán', 'rabadán', 'serán', 'serrán', 'tabán', 'titán', 'tobogán', 'verán', 'volcán', 'volován')),
        ('azo', 4, '', ('abrazo', 'espazo', 'andazo', 'bagazo', 'balazo', 'bandazo', 'cachazo', 'carazo', 'denazo', 'engazo', 'famazo', 'lampreazo', 'pantocazo', 'pedazo', 'preñazo', 'regazo', 'ribazo', 'sobrazo', 'terrazo', 'trompazo')),
        ('aza', 3, '', ('alcarraza', 'ameaza', 'baraza', 'broucaza', 'burgaza', 'cabaza', 'cachaza', 'calaza', 'carpaza', 'carraza', 'coiraza', 'colmaza', 'fogaza', 'famaza', 'labaza', 'liñaza', 'melaza', 'mordaza', 'paraza', 'pinaza', 'rabaza', 'rapaza', 'trancaza')),
        ('allo', 4, '', ('traballo',)),
        ('alla', 4, '', None),
        ('arra', 3, '', ('cigarra', 'cinzarra')),
        ('astro', 3, '', ('balastro', 'bimbastro', 'canastro', 'retropilastro')),
        ('astra', 3, '', ('banastra', 'canastra', 'contrapilastra', 'piastra', 'pilastra')),
        ('ázio', 3, '', ('topázio',)),
        ('elo', 4, '', ('bacelo', 'barrelo', 'bicarelo', 'biquelo', 'boquelo', 'botelo', 'bouquelo', 'cacarelo', 'cachelo', 'cadrelo', 'campelo', 'candelo', 'cantelo', 'carabelo', 'carambelo', 'caramelo', 'cercelo', 'cerebelo', 'chocarelo', 'coitelo', 'conchelo', 'corbelo', 'cotobelo', 'couselo', 'destelo', 'desvelo', 'esfácelo', 'fandelo', 'fardelo', 'farelo', 'farnelo', 'flabelo', 'ganchelo', 'garfelo', 'involucelo', 'mantelo', 'montelo', 'outerelo', 'padicelo', 'pesadelo', 'pinguelo', 'piquelo', 'rampelo', 'rastrelo', 'restelo', 'tornecelo', 'trabelo', 'restrelo', 'portelo', 'ourelo', 'zarapelo')),
        ('eta', 3, '', ('arqueta', 'atleta', 'avoceta', 'baioneta', 'baldeta', 'banqueta', 'barraganeta', 'barreta', 'borleta', 'buceta', 'caceta', 'calceta', 'caldeta', 'cambeta', 'canaleta', 'caneta', 'carreta', 'cerceta', 'chaparreta', 'chapeta', 'chareta', 'chincheta', 'colcheta', 'cometa', 'corbeta', 'corveta', 'cuneta', 'desteta', 'espeta', 'espoleta', 'estafeta', 'esteta', 'faceta', 'falanxeta', 'frasqueta', 'gaceta', 'gabeta', 'galleta', 'garabeta', 'gaveta', 'glorieta', 'lagareta', 'lambeta', 'lanceta', 'libreta', 'maceta', 'macheta', 'maleta', 'malleta', 'mareta', 'marreta', 'meseta', 'mofeta', 'muleta', 'peseta', 'planeta', 'raqueta', 'regreta', 'saqueta', 'veleta', 'vendeta', 'viñeta')),
        ('ete', 3, '', ('alfinete', 'ariete', 'bacinete', 'banquete', 'barallete', 'barrete', 'billete', 'binguelete', 'birrete', 'bonete', 'bosquete', 'bufete', 'burlete', 'cabalete', 'cacahuete', 'cavinete', 'capacete', 'carrete', 'casarete', 'casete', 'chupete', 'clarinete', 'colchete', 'colete', 'capete', 'curupete', 'disquete', 'estilete', 'falsete', 'ferrete', 'filete', 'gallardete', 'gobelete', 'inglete', 'machete', 'miquelete', 'molete', 'mosquete', 'piquete', 'ribete', 'rodete', 'rolete', 'roquete', 'sorvete', 'vedete', 'vendete')),
        ('ica', 3, '', ('andarica', 'botánica', 'botica', 'dialéctica', 'dinámica', 'física', 'formica', 'gráfica', 'marica', 'túnica')),
        ('ico', 3, '', ('conico', 'acetifico', 'acidifico')),
        ('exo', 3, '', ('arpexo', 'arquexo', 'asexo', 'axexo', 'azulexo', 'badexo', 'bafexo', 'bocexo', 'bosquexo', 'boubexo', 'cacarexo', 'carrexo', 'cascarexo', 'castrexo', 'convexo', 'cotexo', 'desexo', 'despexo', 'forcexo', 'gabexo', 'gargarexo', 'gorgolexo', 'inconexo', 'manexo', 'merexo', 'narnexo', 'padexo', 'patexo', 'sopexo', 'varexo')),
        ('exa', 3, '', ('airexa', 'bandexa', 'carrexa', 'envexa', 'igrexa', 'larexa', 'patexa', 'presexa', 'sobexa')),
        ('idão', 3, '', None),
        ('iño', 3, 'o', ('camiño', 'cariño', 'comiño', 'golfiño', 'padriño', 'sobriño', 'viciño', 'veciño')),
        ('iña', 3, 'a', ('camariña', 'campiña', 'entreliña', 'espiña', 'fariña', 'moriña', 'valiña')),
        ('ito', 3, '', None),
        ('ita', 3, '', None),
        ('oide', 3, '', ('anaroide', 'aneroide', 'asteroide', 'axoide', 'cardioide', 'celuloide', 'coronoide', 'discoide', 'espermatozoide', 'espiroide', 'esquizoide', 'esteroide', 'glenoide', 'linfoide', 'hemorroide', 'melaloide', 'sacaroide', 'tetraploide', 'varioloide')),
        ('ola', 3, '', ('aixola', 'ampola', 'argola', 'arola', 'arteríola', 'bandola', 'bítola', 'bractéola', 'cachola', 'carambola', 'carapola', 'carola', 'carrandiola', 'catrapola', 'cebola', 'centola', 'champola', 'chatola', 'cirola', 'cítola', 'consola', 'corola', 'empola', 'escarola', 'esmola', 'estola', 'fitola', 'florícola', 'garañola', 'gárgola', 'garxola', 'glicocola', 'góndola', 'mariola', 'marola', 'michola', 'pirola', 'rebola', 'rupícola', 'saxícola', 'sémola', 'tachola', 'tómbola')),
        ('olo', 3, '', ('arrolo', 'babiolo', 'cacharolo', 'caixarolo', 'carolo', 'carramolo', 'cascarolo', 'cirolo', 'codrolo', 'correolo', 'cotrolo', 'desconsolo', 'rebolo', 'repolo', 'subsolo', 'tixolo', 'tómbolo', 'torolo', 'trémolo', 'vacúolo', 'xermolo', 'zócolo')),
        ('ote', 3, '', ('aigote', 'alcaiote', 'barbarote', 'balote', 'billote', 'cachote', 'camarote', 'capote', 'cebote', 'chichote', 'citote', 'cocorote', 'escote', 'gañote', 'garrote', 'gavote', 'lamote', 'lapote', 'larapote', 'lingote', 'lítote', 'magote', 'marrote', 'matalote', 'pandote', 'paparote', 'rebote', 'tagarote', 'zarrote')),
        ('ota', 3, '', ('asíntota', 'caiota', 'cambota', 'chacota', 'compota', 'creosota', 'curota', 'derrota', 'díspota', 'gamota', 'maniota', 'pelota', 'picota', 'pillota', 'pixota', 'queirota', 'remota')),
        ('cho', 3, '', ('abrocho', 'arrocho', 'carocho', 'falucho', 'bombacho', 'borracho', 'mostacho')),
        ('cha', 3, '', ('borracha', 'carracha', 'estacha', 'garnacha', 'limacha', 'remolacha', 'abrocha')),
        ('uco', 4, '', ('caduco', 'estuco', 'fachuco', 'malluco', 'saluco', 'trabuco')),
        ('uzo', 3, '', ('carriñouzo', 'fachuzo', 'mañuzo', 'mestruzo', 'tapuzo')),
        ('uza', 3, '', ('barruza', 'chamuza', 'chapuza', 'charamuza', 'conduza', 'deduza', 'desluza', 'entreluza', 'induza', 'reluza', 'seduza', 'traduza', 'trasluza')),
        ('uxa', 3, '', ('caramuxa', 'carrabouxa', 'cartuxa', 'coruxa', 'curuxa', 'gaturuxa', 'maruxa', 'meruxa', 'miruxa', 'moruxa', 'muruxa', 'papuxa', 'rabuxa', 'trouxa')),
        ('uxo', 3, '', ('caramuxo', 'carouxo', 'carrabouxo', 'curuxo', 'debuxo', 'ganduxo', 'influxo', 'negouxo', 'pertuxo', 'refluxo')),
        ('ello', 3, '', ('alborello', 'artello', 'botello', 'cachafello', 'calello', 'casarello', 'cazabello', 'cercello', 'cocerello', 'concello', 'consello', 'desparello', 'escaravello', 'espello', 'fedello', 'fervello', 'gagafello', 'gorrobello', 'nortello', 'pendello', 'troupello', 'trebello')),
        ('ella', 3, '', ('alborella', 'bertorella', 'bocatella', 'botella', 'calella', 'cercella', 'gadella', 'grosella', 'lentella', 'movella', 'nocella', 'noitevella', 'parella', 'pelella', 'percebella', 'segorella', 'sabella')),
        ),
    },
    'noun': {
        "min": 4, "whole_word_exc": False,
        "end": None,
        "rules": (
        ('dade', 3, '', ('acridade', 'calidade')),
        ('ificar', 2, '', None),
        ('eiro', 3, '', ('agoireiro', 'bardalleiro', 'braseiro', 'barreiro', 'canteiro', 'capoeiro', 'carneiro', 'carteiro', 'cinceiro', 'faroleiro', 'mareiro', 'preguiceiro', 'quinteiro', 'raposeiro', 'retranqueiro', 'regueiro', 'sineiro', 'troleiro', 'ventureiro')),
        ('eira', 3, '', ('cabeleira', 'canteira', 'cocheira', 'folleira', 'milleira')),
        ('ario', 3, '', ('armario', 'calcario', 'lionario', 'salario')),
        ('aria', 3, '', ('cetaria', 'coronaria', 'fumaria', 'linaria', 'lunaria', 'parietaria', 'saponaria', 'serpentaria')),
        ('ístico', 3, '', ('balístico', 'ensaístico')),
        ('ista', 3, '', ('batista', 'ciclista', 'fadista', 'operista', 'tenista', 'verista')),
        ('ado', 2, '', ('grado', 'agrado')),
        ('ato', 2, '', ('agnato',)),
        ('ido', 3, '', ('cándido', 'cândido', 'consolido', 'decidido', 'duvido', 'marido', 'rápido')),
        ('ida', 3, '', ('bastida', 'dúbida', 'dubida', 'duvida', 'ermida', 'éxida', 'guarida', 'lapicida', 'medida', 'morida')),
        ('ída', 3, '', None),
        ('ido', 3, '', None),
        ('udo', 3, '', ('estudo', 'escudo')),
        ('uda', 3, '', None),
        ('ada', 3, '', ('abada', 'alhada', 'allada', 'pitada')),
        ('dela', 3, '', ('cambadela', 'cavadela', 'forcadela', 'erisipidela', 'mortadela', 'espadela', 'fondedela', 'picadela', 'arandela', 'candela', 'cordela', 'escudela', 'pardela')),
        ('ela', 3, '', ('canela', 'capela', 'cotela', 'cubela', 'curupela', 'escarapela', 'esparrela', 'estela', 'fardela', 'flanela', 'fornela', 'franela', 'gabela', 'gamela', 'gavela', 'glumela', 'granicela', 'lamela', 'lapela', 'malvela', 'manela', 'manganela', 'mexarela', 'micela', 'mistela', 'novela', 'ourela', 'panela', 'parcela', 'pasarela', 'patamela', 'patela', 'paxarela', 'pipela', 'pitela', 'postela', 'pubela', 'restela', 'sabela', 'salmonela', 'secuela', 'sentinela', 'soldanela', 'subela', 'temoncela', 'tesela', 'tixela', 'tramela', 'trapela', 'varela', 'vitela', 'xanela', 'xestela')),
        ('ábel', 2, '', ('afábel', 'fiábel')),
        ('íbel', 2, '', ('críbel', 'imposíbel', 'posíbel', 'fisíbel', 'falíbel')),
        ('nte', 3, '', ('alimente', 'adiante', 'acrescente', 'elefante', 'frequente', 'freqüente', 'gigante', 'instante', 'oriente', 'permanente', 'posante', 'possante', 'restaurante')),
        ('ncia', 3, '', None),
        ('nza', 3, '', None),
        ('acia', 3, '', ('acracia', 'audacia', 'falacia', 'farmacia')),
        ('icia', 3, '', ('caricia', 'delicia', 'ledicia', 'malicia', 'milicia', 'noticia', 'pericia', 'presbicia', 'primicia', 'regalicia', 'sevicia', 'tiricia')),
        ('iza', 3, '', ('alvariza', 'baliza', 'cachiza', 'caniza', 'cañiza', 'carbaliza', 'carriza', 'chamariza', 'chapiza', 'fraguiza', 'latiza', 'longaniza', 'mañiza', 'nabiza', 'peliza', 'preguiza', 'rabiza')),
        ('exar', 3, '', ('palmexar',)),
        ('ación', 2, '', ('aeración',)),
        ('ición', 3, '', ('condición', 'gornición', 'monición', 'nutrición', 'petición', 'posición', 'sedición', 'volición')),
        ('ción', 3, 't', None),
        ('sión', 3, 's', ('abrasión', 'alusión')),
        ('azón', 2, '', ('armazón',)),
        ('ón', 3, '', ('abalón', 'acordeón', 'alción', 'aldrabón', 'alerón', 'aliñón', 'ambón', 'bombón', 'calzón', 'campón', 'canalón', 'cantón', 'capitón', 'cañón', 'centón', 'ciclón', 'collón', 'colofón', 'copón', 'cotón', 'cupón', 'petón', 'tirón', 'tourón', 'turón', 'unción', 'versión', 'zubón', 'zurrón')),
        ('ona', 3, '', ('abandona', 'acetona', 'aleurona', 'amazona', 'anémona', 'bombona', 'cambona', 'carona', 'chacona', 'charamona', 'cincona', 'condona', 'cortisona', 'cretona', 'cretona', 'detona', 'estona', 'fitohormona', 'fregona', 'gerona', 'hidroquinona', 'hormona', 'lesiona', 'madona', 'maratona', 'matrona', 'metadona', 'monótona', 'neurona', 'pamplona', 'peptona', 'poltrona', 'proxesterona', 'quinona', 'quinona', 'silicona', 'sulfona')),
        ('oa', 3, '', ('abandoa', 'madroa', 'barbacoa', 'estoa', 'airoa', 'eiroa', 'amalloa', 'ámboa', 'améndoa', 'anchoa', 'antinéboa', 'avéntoa', 'avoa', 'bágoa', 'balboa', 'bisavoa', 'boroa', 'canoa', 'caroa', 'comadroa', 'coroa', 'éngoa', 'espácoa', 'filloa', 'fírgoa', 'grañoa', 'lagoa', 'lanzoa', 'magoa', 'mámoa', 'morzoa', 'noiteboa', 'noraboa', 'parañoa', 'persoa', 'queiroa', 'rañoa', 'táboa', 'tataravoa', 'teiroa')),
        ('aco', 3, '', None),
        ('aca', 3, '', ('alpaca', 'barraca', 'bullaca', 'buraca', 'carraca', 'casaca', 'cavaca', 'cloaca', 'entresaca', 'ervellaca', 'espinaca', 'estaca', 'farraca', 'millaca', 'pastinaca', 'pataca', 'resaca', 'urraca', 'purraca')),
        ('al', 4, '', ('afinal', 'animal', 'estatal', 'bisexual', 'bissexual', 'desleal', 'fiscal', 'formal', 'pessoal', 'persoal', 'liberal', 'postal', 'virtual', 'visual', 'pontual', 'puntual', 'homosexual', 'heterosexual')),
        ('dor', 2, '', ('abaixador',)),
        ('tor', 3, '', ('autor', 'motor', 'pastor', 'pintor')),
        ('or', 2, '', ('asesor', 'assessor', 'favor', 'mellor', 'melhor', 'redor', 'rigor', 'sensor', 'tambor', 'tumor')),
        ('ora', 3, '', ('albacora', 'anáfora', 'áncora', 'apisoadora', 'ardora', 'ascospora', 'aurora', 'avéspora', 'bitácora', 'canéfora', 'cantimplora', 'catáfora', 'cepilladora', 'demora', 'descalcificadora', 'diáspora', 'empacadora', 'epífora', 'ecavadora', 'escora', 'eslora', 'espora', 'fotocompoñedora', 'fotocopiadora', 'grampadora', 'isícora', 'lavadora', 'lixadora', 'macrospora', 'madrépora', 'madrágora', 'masora', 'mellora', 'metáfora', 'microspora', 'milépora', 'milpéndora', 'nécora', 'oospora', 'padeadora', 'pasiflora', 'pécora', 'píldora', 'pólvora', 'ratinadora', 'rémora', 'retroescavadora', 'sófora', 'torradora', 'trémbora', 'uredospora', 'víbora', 'víncora', 'zoospora')),
        ('aría', 3, '', ('libraría',)),
        ('axe', 3, '', ('aluaxe', 'amaraxe', 'amperaxe', 'bagaxe', 'balaxe', 'barcaxe', 'borraxe', 'bescaxe', 'cabotaxe', 'carraxe', 'cartilaxe', 'chantaxe', 'colaxe', 'coraxe', 'carruaxe', 'dragaxe', 'embalaxe', 'ensilaxe', 'epistaxe', 'fagundaxe', 'fichaxe', 'fogaxe', 'forraxe', 'fretaxe', 'friaxe', 'garaxe', 'homenaxe', 'leitaxe', 'liñaxe', 'listaxe', 'maraxe', 'marcaxe', 'maridaxe', 'masaxe', 'miraxe', 'montaxe', 'pasaxe', 'peaxe', 'portaxe', 'ramaxe', 'rebelaxe', 'rodaxe', 'romaxe', 'sintaxe', 'sondaxe', 'tiraxe', 'vantaxe', 'vendaxe', 'viraxe')),
        ('dizo', 3, '', None),
        ('eza', 3, '', ('alteza', 'beleza', 'fereza', 'fineza', 'vasteza', 'vileza')),
        ('ez', 3, '', ('acidez', 'adultez', 'adustez', 'avidez', 'candidez', 'mudez', 'nenez', 'nudez', 'pomez')),
        ('engo', 3, '', None),
        ('ego', 3, '', ('corego', 'derrego', 'entrego', 'lamego', 'sarego', 'sartego')),
        ('oso', 3, '', ('afanoso', 'algoso', 'caldoso', 'caloso', 'cocoso', 'ditoso', 'favoso', 'fogoso', 'lamoso', 'mecoso', 'mocoso', 'precioso', 'rixoso', 'venoso', 'viroso', 'xesoso')),
        ('osa', 3, '', ('mucosa', 'glicosa', 'baldosa', 'celulosa', 'isoglosa', 'nitrocelulosa', 'levulosa', 'ortosa', 'pectosa', 'preciosa', 'sacarosa', 'serosa', 'ventosa')),
        ('ume', 3, '', ('agrume', 'albume', 'alcume', 'batume', 'cacume', 'cerrume', 'chorume', 'churume', 'costume', 'curtume', 'estrume', 'gafume', 'legume', 'perfume', 'queixume', 'zarrume')),
        ('ura', 3, '', ('albura', 'armadura', 'imatura', 'costura')),
        ('iñar', 3, '', None),
        ('il', 3, '', ('abril', 'alfil', 'anil', 'atril', 'badil', 'baril', 'barril', 'brasil', 'cadril', 'candil', 'cantil', 'carril', 'chamil', 'chancil', 'civil', 'cubil', 'dátil', 'difícil', 'dócil', 'edil', 'estéril', 'fácil', 'fráxil', 'funil', 'fusil', 'grácil', 'gradil', 'hábil', 'hostil', 'marfil')),
        ('esco', 4, '', None),
        ('isco', 4, '', None),
        ('ivo', 3, '', ('pasivo', 'positivo', 'passivo', 'possessivo', 'posesivo', 'pexotarivo', 'relativo')),
        ),
    },
    'verb': {
        "min": 2, "whole_word_exc": False,
        "end": None,
        "rules": (
        ('aba', 2, '', None),
        ('abade', 2, '', None),
        ('ábade', 2, '', None),
        ('abamo', 2, '', None),
        ('ábamo', 2, '', None),
        ('aban', 2, '', None),
        ('ache', 2, '', None),
        ('ade', 2, '', None),
        ('an', 2, '', None),
        ('ando', 2, '', None),
        ('ar', 2, '', ('azar', 'bazar', 'patamar')),
        ('arade', 2, '', None),
        ('aramo', 2, '', None),
        ('arán', 2, '', None),
        ('aran', 2, '', None),
        ('árade', 2, '', None),
        ('aría', 2, '', None),
        ('ariade', 2, '', None),
        ('aríade', 2, '', None),
        ('arian', 2, '', None),
        ('ariamo', 2, '', None),
        ('aron', 2, '', None),
        ('ase', 2, '', None),
        ('asede', 2, '', None),
        ('ásede', 2, '', None),
        ('asemo', 2, '', None),
        ('ásemo', 2, '', None),
        ('asen', 2, '', None),
        ('avan', 2, '', None),
        ('aríamo', 2, '', None),
        ('assen', 2, '', None),
        ('ássemo', 2, '', None),
        ('eríamo', 2, '', None),
        ('êssemo', 2, '', None),
        ('iríamo', 3, '', None),
        ('íssemo', 3, '', None),
        ('áramo', 2, '', None),
        ('árei', 2, '', None),
        ('aren', 2, '', None),
        ('aremo', 2, '', None),
        ('aríei', 2, '', None),
        ('ássei', 2, '', None),
        ('ávamo', 2, '', None),
        ('êramo', 1, '', None),
        ('eremo', 1, '', None),
        ('eríei', 1, '', None),
        ('êssei', 1, '', None),
        ('íramo', 3, '', None),
        ('iremo', 3, '', None),
        ('iríei', 3, '', None),
        ('íssei', 3, '', None),
        ('issen', 3, '', None),
        ('endo', 1, '', None),
        ('indo', 3, '', None),
        ('ondo', 3, '', None),
        ('arde', 2, '', None),
        ('arei', 2, '', None),
        ('aria', 2, '', None),
        ('armo', 2, '', None),
        ('asse', 2, '', None),
        ('aste', 2, '', None),
        ('ávei', 2, '', None),
        ('erão', 1, '', None),
        ('erde', 1, '', None),
        ('erei', 1, '', None),
        ('êrei', 1, '', None),
        ('eren', 2, '', None),
        ('eria', 1, '', None),
        ('ermo', 1, '', None),
        ('este', 1, '', ('faroeste', 'agreste')),
        ('íamo', 1, '', None),
        ('ian', 2, '', ('enfian', 'eloxian', 'ensaian')),
        ('irde', 2, '', None),
        ('irei', 3, '', ('admirei',)),
        ('iren', 3, '', None),
        ('iria', 3, '', None),
        ('irmo', 3, '', None),
        ('isse', 3, '', None),
        ('iste', 4, '', None),
        ('iava', 1, '', ('ampliava',)),
        ('amo', 2, '', None),
        ('iona', 3, '', None),
        ('ara', 2, '', ('arara', 'prepara')),
        ('ará', 2, '', ('alvará', 'bacará')),
        ('are', 2, '', ('prepare',)),
        ('ava', 2, '', ('agrava',)),
        ('emo', 2, '', None),
        ('era', 1, '', ('acelera', 'espera')),
        ('erá', 1, '', None),
        ('ere', 1, '', ('espere',)),
        ('íei', 1, '', None),
        ('in', 3, '', None),
        ('imo', 3, '', ('reprimo', 'intimo', 'íntimo', 'nimo', 'queimo', 'ximo')),
        ('ira', 3, '', ('fronteira', 'sátira')),
        ('ído', 3, '', None),
        ('irá', 3, '', None),
        ('tizar', 4, '', ('alfabetizar',)),
        ('izar', 3, '', ('organizar',)),
        ('itar', 5, '', ('acreditar', 'explicitar', 'estreitar')),
        ('ire', 3, '', ('adquire',)),
        ('omo', 3, '', None),
        ('ai', 2, '', None),
        ('ear', 4, '', ('alardear', 'nuclear')),
        ('uei', 3, '', None),
        ('uía', 5, 'u', None),
        ('ei', 3, '', None),
        ('er', 1, '', ('éter', 'pier')),
        ('eu', 1, '', ('chapeu',)),
        ('ia', 1, '', ('estória', 'fatia', 'acia', 'praia', 'elogia', 'mania', 'lábia', 'aprecia', 'polícia', 'arredia', 'cheia', 'ásia')),
        ('ir', 3, '', None),
        ('iu', 3, '', None),
        ('eou', 5, '', None),
        ('ou', 3, '', None),
        ('i', 1, '', None),
        ('ede', 1, '', ('rede', 'bípede', 'céspede', 'parede', 'palmípede', 'vostede', 'hóspede', 'adrede')),
        ('ei', 3, '', None),
        ('en', 2, '', None),
        ('erade', 1, '', None),
        ('érade', 1, '', None),
        ('eran', 2, '', None),
        ('eramo', 1, '', None),
        ('éramo', 1, '', None),
        ('erán', 1, '', None),
        ('ería', 1, '', None),
        ('eriade', 1, '', None),
        ('eríade', 1, '', None),
        ('eriamo', 1, '', None),
        ('erian', 1, '', None),
        ('erían', 1, '', None),
        ('eron', 1, '', None),
        ('ese', 1, '', None),
        ('esedes', 1, '', None),
        ('ésedes', 1, '', None),
        ('esemo', 1, '', None),
        ('ésemo', 1, '', None),
        ('esen', 1, '', None),
        ('êssede', 1, '', None),
        ('ía', 1, '', None),
        ('iade', 1, '', None),
        ('íade', 1, '', None),
        ('iamo', 1, '', None),
        ('ían', 1, '', None),
        ('iche', 1, '', None),
        ('ide', 1, '', None),
        ('irade', 3, '', None),
        ('írade', 3, '', None),
        ('iramo', 3, '', None),
        ('irán', 3, '', None),
        ('iría', 3, '', None),
        ('iriade', 3, '', None),
        ('iríade', 3, '', None),
        ('iriamo', 3, '', None),
        ('irian', 3, '', None),
        ('irían', 3, '', None),
        ('iron', 3, '', None),
        ('ise', 3, '', None),
        ('isede', 3, '', None),
        ('ísede', 3, '', None),
        ('isemo', 3, '', None),
        ('ísemo', 3, '', None),
        ('isen', 3, '', None),
        ('íssede', 3, '', None),
        ('tizar', 3, '', ('alfabetizar',)),
        ('ondo', 3, '', None),
        ),
    },
    'vowel': {
        "min": 4, "whole_word_exc": False,
        "end": None,
        "rules": (
        ('gue', 2, 'g', ('azougue', 'dengue', 'merengue', 'nurague', 'merengue', 'rengue')),
        ('que', 2, 'c', ('alambique', 'albaricoque', 'abaroque', 'alcrique', 'almadraque', 'almanaque', 'arenque', 'arinque', 'baduloque', 'ballestrinque', 'betoque', 'bivaque', 'bloque', 'bodaque', 'bosque', 'breque', 'buque', 'cacique', 'cheque', 'claque', 'contradique', 'coque', 'croque', 'dique', 'duque', 'enroque', 'espeque', 'estoque', 'estoraque', 'estraloque', 'estrinque', 'milicroque', 'monicreque', 'orinque', 'arinque', 'palenque', 'parque', 'penique', 'picabeque', 'pique', 'psique', 'raque', 'remolque', 'xeque', 'repenique', 'roque', 'sotobosque', 'tabique', 'tanque', 'toque', 'traque', 'truque', 'vivaque', 'xaque')),
        ('a', 3, '', ('amasadela', 'cerva')),
        ('e', 3, '', ('marte',)),
        ('o', 3, '', ('barro', 'fado', 'cabo', 'libro', 'cervo')),
        ('â', 3, '', None),
        ('ã', 3, '', ('amanhã', 'arapuã', 'fã', 'divã', 'manhã')),
        ('ê', 3, '', None),
        ('ô', 3, '', None),
        ('á', 3, '', None),
        ('é', 3, '', None),
        ('ó', 3, '', None),
        ('i', 3, '', None),
        ),
    },
}

_GL_ACCENTS = str.maketrans({"á": "a", "é": "e", "ê": "e", "í": "i",
                             "ó": "o", "ú": "u"})


def _gl_step(w: str, name: str) -> str:
    st = _GL_STEPS[name]
    if len(w) < st["min"]:
        return w
    if st["end"] is not None and not w.endswith(st["end"]):
        return w
    for suf, mn, rep, exc in st["rules"]:
        if len(w) - len(suf) >= mn and w.endswith(suf):
            if exc is not None:
                if st["whole_word_exc"]:
                    if w in exc:
                        continue
                elif w.endswith(exc):
                    continue
            return w[: len(w) - len(suf)] + rep
    return w


def galician_stem(w: str) -> str:
    w = _gl_step(w, "plural")
    w = _gl_step(w, "unification")
    w = _gl_step(w, "adverb")
    while True:
        w2 = _gl_step(w, "augmentative")
        if w2 == w:
            break
        w = w2
    w2 = _gl_step(w, "noun")
    if w2 == w:
        w2 = _gl_step(w, "verb")
    w = _gl_step(w2, "vowel")
    return w.translate(_GL_ACCENTS)


# ---------------------------------------------------------------------------
# Romance/German LIGHT stemmers (Savoy's UniNE / CLEF-2001 algorithms).
# These are what the reference's DEFAULT GermanAnalyzer, FrenchAnalyzer,
# SpanishAnalyzer, PortugueseAnalyzer and ItalianAnalyzer actually wire
# (de/GermanLightStemmer.java + GermanNormalizationFilter.java,
# fr/FrenchLightStemmer.java, es/SpanishLightStemmer.java,
# pt/PortugueseLightStemmer.java, it/ItalianLightStemmer.java) — the
# Snowball packs cover SnowballFilter-based custom schemas instead.
# ---------------------------------------------------------------------------

_DEL_FOLD = str.maketrans(
    {"ä": "a", "à": "a", "á": "a", "â": "a", "ö": "o", "ò": "o",
     "ó": "o", "ô": "o", "ï": "i", "ì": "i", "í": "i", "î": "i",
     "ü": "u", "ù": "u", "ú": "u", "û": "u"}
)
_DE_ST_END = frozenset("bdfghklmnt")


def german_normalize(w: str) -> str:
    """GermanNormalizationFilter's state machine: 'e' after a u/a/o
    state is deleted (bauen->baun style), umlauts fold, ß -> ss."""
    out = []
    state = "N"
    for c in w:
        if c in ("a", "o"):
            out.append(c); state = "U"
        elif c == "u":
            out.append(c); state = "U" if state == "N" else "V"
        elif c == "e":
            if state == "U":
                state = "V"
                continue  # delete
            out.append(c); state = "V"
        elif c in ("i", "q", "y"):
            out.append(c); state = "V"
        elif c == "ä":
            out.append("a"); state = "V"
        elif c == "ö":
            out.append("o"); state = "V"
        elif c == "ü":
            out.append("u"); state = "V"
        elif c == "ß":
            out.append("ss"); state = "N"
        else:
            out.append(c); state = "N"
    return "".join(out)


def german_light_stem(w: str) -> str:
    w = w.translate(_DEL_FOLD)
    n = len(w)
    if n > 5 and w.endswith("ern"):
        w = w[:-3]
    elif n > 4 and w[-2:-1] == "e" and w[-1] in "mnrs":
        w = w[:-2]
    elif n > 3 and w[-1] == "e":
        w = w[:-1]
    elif n > 3 and w[-1] == "s" and w[-2] in _DE_ST_END:
        w = w[:-1]
    n = len(w)
    if n > 5 and w.endswith("est"):
        w = w[:-3]
    elif n > 4 and (w.endswith("er") or w.endswith("en")):
        w = w[:-2]
    elif n > 4 and w.endswith("st") and w[-3] in _DE_ST_END:
        w = w[:-2]
    return w


def german_light_term(t: str) -> str:
    """The GermanAnalyzer default chain tail: normalization then stem."""
    return german_light_stem(german_normalize(t))


_ES_LIGHT_FOLD = str.maketrans(
    {"à": "a", "á": "a", "â": "a", "ä": "a", "ò": "o", "ó": "o",
     "ô": "o", "ö": "o", "è": "e", "é": "e", "ê": "e", "ë": "e",
     "ù": "u", "ú": "u", "û": "u", "ü": "u", "ì": "i", "í": "i",
     "î": "i", "ï": "i"}
)


def spanish_light_stem(w: str) -> str:
    if len(w) < 5:
        return w
    w = w.translate(_ES_LIGHT_FOLD)
    if w[-1] in "oae":
        return w[:-1]
    if w[-1] == "s":
        if w[-2] == "e" and w[-3] == "s" and w[-4] == "e":
            return w[:-2]
        if w[-2] == "e" and w[-3] == "c":
            return w[:-3] + "z"
        if w[-2] in "oae":
            return w[:-2]
    return w


def italian_light_stem(w: str) -> str:
    if len(w) < 6:
        return w
    w = w.translate(_ES_LIGHT_FOLD)
    last, prev = w[-1], w[-2]
    if last == "e":
        return w[:-2] if prev in ("i", "h") else w[:-1]
    if last == "i":
        return w[:-2] if prev in ("h", "i") else w[:-1]
    if last in ("a", "o"):
        return w[:-2] if prev == "i" else w[:-1]
    return w


_FRL_FOLD = str.maketrans(
    {"à": "a", "á": "a", "â": "a", "ô": "o", "è": "e", "é": "e",
     "ê": "e", "ù": "u", "û": "u", "î": "i", "ç": "c"}
)


def _frl_norm(w: str) -> str:
    if len(w) > 4:
        w = w.translate(_FRL_FOLD)
        out = [w[0]]
        for c in w[1:]:
            if c == out[-1] and c.isalpha():
                continue  # collapse doubled letters
            out.append(c)
        w = "".join(out)
    if len(w) > 4 and w.endswith("ie"):
        w = w[:-2]
    if len(w) > 4:
        if w[-1] == "r":
            w = w[:-1]
        if w[-1] == "e":
            w = w[:-1]
        if w[-1] == "e":
            w = w[:-1]
        if len(w) >= 2 and w[-1] == w[-2] and w[-1].isalpha():
            w = w[:-1]
    return w


def french_light_stem(w: str) -> str:
    if len(w) > 5 and w[-1] == "x":
        if w[-3] == "a" and w[-2] == "u" and w[-4] != "e":
            w = w[:-2] + "lx"  # aux -> alx, then the x drops
        w = w[:-1]
    if len(w) > 3 and w[-1] == "x":
        w = w[:-1]
    if len(w) > 3 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 9 and w.endswith("issement"):
        return _frl_norm(w[:-7] + "r")
    if n > 8 and w.endswith("issant"):
        return _frl_norm(w[:-5] + "r")
    if n > 6 and w.endswith("ement"):
        w = w[:-4]
        if len(w) > 3 and w.endswith("ive"):
            w = w[:-2] + "f"
        return _frl_norm(w)
    if n > 11 and w.endswith("ficatrice"):
        return _frl_norm(w[:-7] + "er")
    if n > 10 and w.endswith("ficateur"):
        return _frl_norm(w[:-6] + "er")
    if n > 9 and w.endswith("catrice"):
        return _frl_norm(w[:-7] + "quer")
    if n > 8 and w.endswith("cateur"):
        return _frl_norm(w[:-6] + "quer")
    if n > 8 and w.endswith("atrice"):
        return _frl_norm(w[:-6] + "er")
    if n > 7 and w.endswith("ateur"):
        return _frl_norm(w[:-5] + "er")
    if n > 6 and w.endswith("trice"):
        w = w[:-5] + "teur"  # no early return in the reference
    n = len(w)
    if n > 5 and w.endswith("ième"):
        return _frl_norm(w[:-4])
    if n > 7 and w.endswith("teuse"):
        return _frl_norm(w[:-3] + "r")
    if n > 6 and w.endswith("teur"):
        return _frl_norm(w[:-2] + "r")
    if n > 5 and w.endswith("euse"):
        return _frl_norm(w[:-2])
    if n > 8 and w.endswith("ère"):
        return _frl_norm(w[:-3] + "er")
    if n > 7 and w.endswith("ive"):
        return _frl_norm(w[:-2] + "f")
    if n > 4 and (w.endswith("folle") or w.endswith("molle")):
        return _frl_norm(w[:-3] + "u")
    if n > 9 and w.endswith("nnelle"):
        return _frl_norm(w[:-5])
    if n > 9 and w.endswith("nnel"):
        return _frl_norm(w[:-3])
    if n > 4 and w.endswith("ète"):
        w = w[:-3] + "et"  # falls through
    n = len(w)
    if n > 8 and w.endswith("ique"):
        w = w[:-4]
    n = len(w)
    if n > 8 and w.endswith("esse"):
        return _frl_norm(w[:-3])
    if n > 7 and w.endswith("inage"):
        return _frl_norm(w[:-3])
    if n > 9 and w.endswith("isation"):
        w = w[:-7]
        if len(w) > 5 and w.endswith("ual"):
            w = w[:-2] + "el"
        return _frl_norm(w)
    if n > 9 and w.endswith("isateur"):
        return _frl_norm(w[:-7])
    if n > 8 and w.endswith("ation"):
        return _frl_norm(w[:-5])
    if n > 8 and w.endswith("ition"):
        return _frl_norm(w[:-5])
    return _frl_norm(w)


_PTL_FOLD = str.maketrans(
    {"à": "a", "á": "a", "â": "a", "ä": "a", "ã": "a", "ò": "o",
     "ó": "o", "ô": "o", "ö": "o", "õ": "o", "è": "e", "é": "e",
     "ê": "e", "ë": "e", "ù": "u", "ú": "u", "û": "u", "ü": "u",
     "ì": "i", "í": "i", "î": "i", "ï": "i", "ç": "c"}
)


def _ptl_remove_suffix(w: str) -> str:
    n = len(w)
    if n > 4 and w.endswith("es") and w[-3] in "rslz":
        return w[:-2]
    if n > 3 and w.endswith("ns"):
        return w[:-2] + "m"
    if n > 4 and (w.endswith("eis") or w.endswith("éis")):
        return w[:-3] + "el"
    if n > 4 and w.endswith("ais"):
        return w[:-3] + "al"
    if n > 4 and w.endswith("óis"):
        return w[:-3] + "ol"
    if n > 4 and w.endswith("is"):
        return w[:-1] + "l"
    if n > 3 and (w.endswith("ões") or w.endswith("ães")):
        return w[:-3] + "ão"
    if n > 6 and w.endswith("mente"):
        return w[:-5]
    if n > 3 and w[-1] == "s":
        return w[:-1]
    return w


def _ptl_norm_feminine(w: str) -> str:
    n = len(w)
    if n > 7 and w.endswith(("inha", "iaca", "eira")):
        return w[:-1] + "o"
    if n > 6:
        if w.endswith(("osa", "ica", "ida", "ada", "iva", "ama")):
            return w[:-1] + "o"
        if w.endswith("ona"):
            return w[:-3] + "ão"
        if w.endswith("ora"):
            return w[:-1]
        if w.endswith("esa"):
            return w[:-3] + "ês"
        if w.endswith("na"):
            return w[:-1] + "o"
    return w


def portuguese_light_stem(w: str) -> str:
    if len(w) < 4:
        return w
    w = _ptl_remove_suffix(w)
    if len(w) > 3 and w[-1] == "a":
        w = _ptl_norm_feminine(w)
    if len(w) > 4 and w[-1] in "eao":
        w = w[:-1]
    return w.translate(_PTL_FOLD)



# ---------------------------------------------------------------------------
# Portuguese RSLP (pt/PortugueseStemmer.java over portuguese.rslp, the
# PortugueseStemFilter option) + the RSLP-S minimal variants
# (pt/PortugueseMinimalStemmer.java, gl/GalicianMinimalStemmer.java =
# just the Plural step), reusing the Galician RSLP engine semantics.
# ---------------------------------------------------------------------------

_PTR_STEPS = {
    'plural': {
        "min": 3, "whole_word_exc": True,
        "end": ('s',),
        "rules": (
        ('ns', 1, 'm', None),
        ('ões', 3, 'ão', None),
        ('ães', 1, 'ão', ('mães',)),
        ('ais', 1, 'al', ('cais', 'mais')),
        ('éis', 2, 'el', None),
        ('eis', 2, 'el', None),
        ('óis', 2, 'ol', None),
        ('is', 2, 'il', ('lápis', 'cais', 'mais', 'crúcis', 'biquínis', 'pois', 'depois', 'dois', 'leis')),
        ('les', 3, 'l', None),
        ('res', 3, 'r', ('árvores',)),
        ('s', 2, '', ('aliás', 'pires', 'lápis', 'cais', 'mais', 'mas', 'menos', 'férias', 'fezes', 'pêsames', 'crúcis', 'gás', 'atrás', 'moisés', 'através', 'convés', 'ês', 'país', 'após', 'ambas', 'ambos', 'messias', 'depois')),
        ),
    },
    'adverb': {
        "min": 9, "whole_word_exc": False,
        "end": None,
        "rules": (
        ('mente', 4, '', ('experimente',)),
        ),
    },
    'feminine': {
        "min": 3, "whole_word_exc": True,
        "end": ('a', 'ã'),
        "rules": (
        ('ona', 3, 'ão', ('abandona', 'lona', 'iona', 'cortisona', 'monótona', 'maratona', 'acetona', 'detona', 'carona')),
        ('ã', 2, 'ão', ('amanhã', 'arapuã', 'fã', 'divã')),
        ('ora', 3, 'or', None),
        ('na', 4, 'no', ('carona', 'abandona', 'lona', 'iona', 'cortisona', 'monótona', 'maratona', 'acetona', 'detona', 'guiana', 'campana', 'grana', 'caravana', 'banana', 'paisana')),
        ('inha', 3, 'inho', ('rainha', 'linha', 'minha')),
        ('esa', 3, 'ês', ('mesa', 'obesa', 'princesa', 'turquesa', 'ilesa', 'pesa', 'presa')),
        ('osa', 3, 'oso', ('mucosa', 'prosa')),
        ('íaca', 3, 'íaco', None),
        ('ica', 3, 'ico', ('dica',)),
        ('ada', 2, 'ado', ('pitada',)),
        ('ida', 3, 'ido', ('vida', 'dúvida')),
        ('ída', 3, 'ido', ('recaída', 'saída')),
        ('ima', 3, 'imo', ('vítima',)),
        ('iva', 3, 'ivo', ('saliva', 'oliva')),
        ('eira', 3, 'eiro', ('beira', 'cadeira', 'frigideira', 'bandeira', 'feira', 'capoeira', 'barreira', 'fronteira', 'besteira', 'poeira')),
        ),
    },
    'augmentative': {
        "min": 5, "whole_word_exc": True,
        "end": None,
        "rules": (
        ('díssimo', 5, '', None),
        ('abilíssimo', 5, '', None),
        ('íssimo', 3, '', None),
        ('ésimo', 3, '', None),
        ('érrimo', 4, '', None),
        ('zinho', 2, '', None),
        ('quinho', 4, 'c', None),
        ('uinho', 4, '', None),
        ('adinho', 3, '', None),
        ('inho', 3, '', ('caminho', 'cominho')),
        ('alhão', 4, '', None),
        ('uça', 4, '', None),
        ('aço', 4, '', ('antebraço',)),
        ('aça', 4, '', None),
        ('adão', 4, '', None),
        ('idão', 4, '', None),
        ('ázio', 3, '', ('topázio',)),
        ('arraz', 4, '', None),
        ('zarrão', 3, '', None),
        ('arrão', 4, '', None),
        ('arra', 3, '', None),
        ('zão', 2, '', ('coalizão',)),
        ('ão', 3, '', ('camarão', 'chimarrão', 'canção', 'coração', 'embrião', 'grotão', 'glutão', 'ficção', 'fogão', 'feição', 'furacão', 'gamão', 'lampião', 'leão', 'macacão', 'nação', 'órfão', 'orgão', 'patrão', 'portão', 'quinhão', 'rincão', 'tração', 'falcão', 'espião', 'mamão', 'folião', 'cordão', 'aptidão', 'campeão', 'colchão', 'limão', 'leilão', 'melão', 'barão', 'milhão', 'bilhão', 'fusão', 'cristão', 'ilusão', 'capitão', 'estação', 'senão')),
        ),
    },
    'noun': {
        "min": 4, "whole_word_exc": False,
        "end": None,
        "rules": (
        ('encialista', 4, '', None),
        ('alista', 5, '', None),
        ('agem', 3, '', ('coragem', 'chantagem', 'vantagem', 'carruagem')),
        ('iamento', 4, '', None),
        ('amento', 3, '', ('firmamento', 'fundamento', 'departamento')),
        ('imento', 3, '', None),
        ('mento', 6, '', ('firmamento', 'elemento', 'complemento', 'instrumento', 'departamento')),
        ('alizado', 4, '', None),
        ('atizado', 4, '', None),
        ('tizado', 4, '', ('alfabetizado',)),
        ('izado', 5, '', ('organizado', 'pulverizado')),
        ('ativo', 4, '', ('pejorativo', 'relativo')),
        ('tivo', 4, '', ('relativo',)),
        ('ivo', 4, '', ('passivo', 'possessivo', 'pejorativo', 'positivo')),
        ('ado', 2, '', ('grado',)),
        ('ido', 3, '', ('cândido', 'consolido', 'rápido', 'decido', 'tímido', 'duvido', 'marido')),
        ('ador', 3, '', None),
        ('edor', 3, '', None),
        ('idor', 4, '', ('ouvidor',)),
        ('dor', 4, '', ('ouvidor',)),
        ('sor', 4, '', ('assessor',)),
        ('atoria', 5, '', None),
        ('tor', 3, '', ('benfeitor', 'leitor', 'editor', 'pastor', 'produtor', 'promotor', 'consultor')),
        ('or', 2, '', ('motor', 'melhor', 'redor', 'rigor', 'sensor', 'tambor', 'tumor', 'assessor', 'benfeitor', 'pastor', 'terior', 'favor', 'autor')),
        ('abilidade', 5, '', None),
        ('icionista', 4, '', None),
        ('cionista', 5, '', None),
        ('ionista', 5, '', None),
        ('ionar', 5, '', None),
        ('ional', 4, '', None),
        ('ência', 3, '', None),
        ('ância', 4, '', ('ambulância',)),
        ('edouro', 3, '', None),
        ('queiro', 3, 'c', None),
        ('adeiro', 4, '', ('desfiladeiro',)),
        ('eiro', 3, '', ('desfiladeiro', 'pioneiro', 'mosteiro')),
        ('uoso', 3, '', None),
        ('oso', 3, '', ('precioso',)),
        ('alizaç', 5, '', None),
        ('atizaç', 5, '', None),
        ('tizaç', 5, '', None),
        ('izaç', 5, '', ('organizaç',)),
        ('aç', 3, '', ('equaç', 'relaç')),
        ('iç', 3, '', ('eleiç',)),
        ('ário', 3, '', ('voluntário', 'salário', 'aniversário', 'diário', 'lionário', 'armário')),
        ('atório', 3, '', None),
        ('rio', 5, '', ('voluntário', 'salário', 'aniversário', 'diário', 'compulsório', 'lionário', 'próprio', 'stério', 'armário')),
        ('ério', 6, '', None),
        ('ês', 4, '', None),
        ('eza', 3, '', None),
        ('ez', 4, '', None),
        ('esco', 4, '', None),
        ('ante', 2, '', ('gigante', 'elefante', 'adiante', 'possante', 'instante', 'restaurante')),
        ('ástico', 4, '', ('eclesiástico',)),
        ('alístico', 3, '', None),
        ('áutico', 4, '', None),
        ('êutico', 4, '', None),
        ('tico', 3, '', ('político', 'eclesiástico', 'diagnostico', 'prático', 'doméstico', 'diagnóstico', 'idêntico', 'alopático', 'artístico', 'autêntico', 'eclético', 'crítico', 'critico')),
        ('ico', 4, '', ('tico', 'público', 'explico')),
        ('ividade', 5, '', None),
        ('idade', 4, '', ('autoridade', 'comunidade')),
        ('oria', 4, '', ('categoria',)),
        ('encial', 5, '', None),
        ('ista', 4, '', None),
        ('auta', 5, '', None),
        ('quice', 4, 'c', None),
        ('ice', 4, '', ('cúmplice',)),
        ('íaco', 3, '', None),
        ('ente', 4, '', ('freqüente', 'alimente', 'acrescente', 'permanente', 'oriente', 'aparente')),
        ('ense', 5, '', None),
        ('inal', 3, '', None),
        ('ano', 4, '', None),
        ('ável', 2, '', ('afável', 'razoável', 'potável', 'vulnerável')),
        ('ível', 3, '', ('possível',)),
        ('vel', 5, '', ('possível', 'vulnerável', 'solúvel')),
        ('bil', 3, 'vel', None),
        ('ura', 4, '', ('imatura', 'acupuntura', 'costura')),
        ('ural', 4, '', None),
        ('ual', 3, '', ('bissexual', 'virtual', 'visual', 'pontual')),
        ('ial', 3, '', None),
        ('al', 4, '', ('afinal', 'animal', 'estatal', 'bissexual', 'desleal', 'fiscal', 'formal', 'pessoal', 'liberal', 'postal', 'virtual', 'visual', 'pontual', 'sideral', 'sucursal')),
        ('alismo', 4, '', None),
        ('ivismo', 4, '', None),
        ('ismo', 3, '', ('cinismo',)),
        ),
    },
    'verb': {
        "min": 4, "whole_word_exc": False,
        "end": None,
        "rules": (
        ('aríamo', 2, '', None),
        ('ássemo', 2, '', None),
        ('eríamo', 2, '', None),
        ('êssemo', 2, '', None),
        ('iríamo', 3, '', None),
        ('íssemo', 3, '', None),
        ('áramo', 2, '', None),
        ('árei', 2, '', None),
        ('aremo', 2, '', None),
        ('ariam', 2, '', None),
        ('aríei', 2, '', None),
        ('ássei', 2, '', None),
        ('assem', 2, '', None),
        ('ávamo', 2, '', None),
        ('êramo', 3, '', None),
        ('eremo', 3, '', None),
        ('eriam', 3, '', None),
        ('eríei', 3, '', None),
        ('êssei', 3, '', None),
        ('essem', 3, '', None),
        ('íramo', 3, '', None),
        ('iremo', 3, '', None),
        ('iriam', 3, '', None),
        ('iríei', 3, '', None),
        ('íssei', 3, '', None),
        ('issem', 3, '', None),
        ('ando', 2, '', None),
        ('endo', 3, '', None),
        ('indo', 3, '', None),
        ('ondo', 3, '', None),
        ('aram', 2, '', None),
        ('arão', 2, '', None),
        ('arde', 2, '', None),
        ('arei', 2, '', None),
        ('arem', 2, '', None),
        ('aria', 2, '', None),
        ('armo', 2, '', None),
        ('asse', 2, '', None),
        ('aste', 2, '', None),
        ('avam', 2, '', ('agravam',)),
        ('ávei', 2, '', None),
        ('eram', 3, '', None),
        ('erão', 3, '', None),
        ('erde', 3, '', None),
        ('erei', 3, '', None),
        ('êrei', 3, '', None),
        ('erem', 3, '', None),
        ('eria', 3, '', None),
        ('ermo', 3, '', None),
        ('esse', 3, '', None),
        ('este', 3, '', ('faroeste', 'agreste')),
        ('íamo', 3, '', None),
        ('iram', 3, '', None),
        ('íram', 3, '', None),
        ('irão', 2, '', None),
        ('irde', 2, '', None),
        ('irei', 3, '', ('admirei',)),
        ('irem', 3, '', ('adquirem',)),
        ('iria', 3, '', None),
        ('irmo', 3, '', None),
        ('isse', 3, '', None),
        ('iste', 4, '', None),
        ('iava', 4, '', ('ampliava',)),
        ('amo', 2, '', None),
        ('iona', 3, '', None),
        ('ara', 2, '', ('arara', 'prepara')),
        ('ará', 2, '', ('alvará',)),
        ('are', 2, '', ('prepare',)),
        ('ava', 2, '', ('agrava',)),
        ('emo', 2, '', None),
        ('era', 3, '', ('acelera', 'espera')),
        ('erá', 3, '', None),
        ('ere', 3, '', ('espere',)),
        ('iam', 3, '', ('enfiam', 'ampliam', 'elogiam', 'ensaiam')),
        ('íei', 3, '', None),
        ('imo', 3, '', ('reprimo', 'intimo', 'íntimo', 'nimo', 'queimo', 'ximo')),
        ('ira', 3, '', ('fronteira', 'sátira')),
        ('ído', 3, '', None),
        ('irá', 3, '', None),
        ('tizar', 4, '', ('alfabetizar',)),
        ('izar', 5, '', ('organizar',)),
        ('itar', 5, '', ('acreditar', 'explicitar', 'estreitar')),
        ('ire', 3, '', ('adquire',)),
        ('omo', 3, '', None),
        ('ai', 2, '', None),
        ('am', 2, '', None),
        ('ear', 4, '', ('alardear', 'nuclear')),
        ('ar', 2, '', ('azar', 'bazaar', 'patamar')),
        ('uei', 3, '', None),
        ('uía', 5, 'u', None),
        ('ei', 3, '', None),
        ('guem', 3, 'g', None),
        ('em', 2, '', ('alem', 'virgem')),
        ('er', 2, '', ('éter', 'pier')),
        ('eu', 3, '', ('chapeu',)),
        ('ia', 3, '', ('estória', 'fatia', 'acia', 'praia', 'elogia', 'mania', 'lábia', 'aprecia', 'polícia', 'arredia', 'cheia', 'ásia')),
        ('ir', 3, '', ('freir',)),
        ('iu', 3, '', None),
        ('eou', 5, '', None),
        ('ou', 3, '', None),
        ('i', 3, '', None),
        ),
    },
    'vowel': {
        "min": 4, "whole_word_exc": False,
        "end": None,
        "rules": (
        ('bil', 2, 'vel', None),
        ('gue', 2, 'g', ('gangue', 'jegue')),
        ('á', 3, '', None),
        ('ê', 3, '', ('bebê',)),
        ('a', 3, '', ('ásia',)),
        ('e', 3, '', None),
        ('o', 3, '', ('ão',)),
        ),
    },
}

_PTR_ACCENTS = str.maketrans(
    {"à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "a",
     "ç": "c", "è": "e", "é": "e", "ê": "e", "ë": "e", "ì": "i",
     "í": "i", "î": "i", "ï": "i", "ñ": "n", "ò": "o", "ó": "o",
     "ô": "o", "õ": "o", "ö": "o", "ù": "u", "ú": "u", "û": "u",
     "ü": "u"}
)


def _rslp_step(w: str, st: dict) -> str:
    if len(w) < st["min"]:
        return w
    if st["end"] is not None and not w.endswith(st["end"]):
        return w
    for suf, mn, rep, exc in st["rules"]:
        if len(w) - len(suf) >= mn and w.endswith(suf):
            if exc is not None:
                if st["whole_word_exc"]:
                    if w in exc:
                        continue
                elif w.endswith(exc):
                    continue
            return w[: len(w) - len(suf)] + rep
    return w


def portuguese_rslp_stem(w: str) -> str:
    """PortugueseStemmer: plural, adverb, feminine, augmentative, then
    noun-else-verb-else-vowel, then accent removal."""
    w = _rslp_step(w, _PTR_STEPS["plural"])
    w = _rslp_step(w, _PTR_STEPS["adverb"])
    w = _rslp_step(w, _PTR_STEPS["feminine"])
    w = _rslp_step(w, _PTR_STEPS["augmentative"])
    w2 = _rslp_step(w, _PTR_STEPS["noun"])
    if w2 == w:
        w2 = _rslp_step(w, _PTR_STEPS["verb"])
        if w2 == w:
            w2 = _rslp_step(w, _PTR_STEPS["vowel"])
    return w2.translate(_PTR_ACCENTS)


def portuguese_minimal_stem(w: str) -> str:
    return _rslp_step(w, _PTR_STEPS["plural"])


def galician_minimal_stem(w: str) -> str:
    return _gl_step(w, "plural")


# ---------------------------------------------------------------------------
# Remaining light/minimal variants (Savoy UniNE / CLEF; the *StemFilter
# factory options for sv/no/ru/hu/fi/de/fr): hand-ported rule-for-rule
# from the reference sources named per function.
# ---------------------------------------------------------------------------


def swedish_light_stem(w: str) -> str:
    """sv/SwedishLightStemmer.java"""
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 7 and (w.endswith("elser") or w.endswith("heten")):
        return w[:-5]
    if n > 6 and w.endswith(("arne", "erna", "ande", "else", "aste",
                             "orna", "aren")):
        return w[:-4]
    if n > 5 and w.endswith(("are", "ast", "het")):
        return w[:-3]
    if n > 4 and w.endswith(("ar", "er", "or", "en", "at", "te", "et")):
        return w[:-2]
    if n > 3 and w[-1] in "taen":
        return w[:-1]
    return w


def norwegian_light_stem(w: str) -> str:
    """no/NorwegianLightStemmer.java with the filter default BOKMAAL
    flags (Nynorsk-only endings skipped)."""
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 7 and (w.endswith("heter") or w.endswith("heten")):
        return w[:-5]
    if n > 5 and (w.endswith("dom") or w.endswith("het")):
        return w[:-3]
    if n > 7 and (w.endswith("elser") or w.endswith("elsen")):
        return w[:-5]
    if n > 6 and w.endswith(("ende", "else", "este", "eren")):
        return w[:-4]
    if n > 5 and w.endswith(("ere", "est", "ene")):
        return w[:-3]
    if n > 4 and w.endswith(("er", "en", "et", "st", "te")):
        return w[:-2]
    if n > 3 and w[-1] in "aen":
        return w[:-1]
    return w


def norwegian_minimal_stem(w: str) -> str:
    """no/NorwegianMinimalStemmer.java, BOKMAAL flags."""
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 5 and w.endswith("ene"):
        return w[:-3]
    if n > 4 and w.endswith(("er", "en", "et")):
        return w[:-2]
    if n > 3 and w[-1] in "ae":
        return w[:-1]
    return w


_RUL_3 = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его",
          "ему", "ери", "ими", "ого", "ому", "ыми", "оев")
_RUL_2 = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
          "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
          "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")


def russian_light_stem(w: str) -> str:
    """ru/RussianLightStemmer.java"""
    n = len(w)
    if n > 6 and (w.endswith("иями") or w.endswith("оями")):
        w = w[:-4]
    elif n > 5 and w.endswith(_RUL_3):
        w = w[:-3]
    elif n > 4 and w.endswith(_RUL_2):
        w = w[:-2]
    elif n > 3 and w[-1] in "аеиоуйыяь":
        w = w[:-1]
    n = len(w)
    if n > 3:
        if w[-1] in ("ь", "и"):
            return w[:-1]
        if w[-1] == "н" and w[-2] == "н":
            return w[:-1]
    return w


_HUL_VOWELS = frozenset("aeiouy")
_HUL_FOLD = str.maketrans(
    {"á": "a", "ë": "e", "é": "e", "í": "i", "ó": "o", "ő": "o",
     "õ": "o", "ö": "o", "ú": "u", "ű": "u", "ũ": "u", "û": "u",
     "ü": "u"}
)


def hungarian_light_stem(w: str) -> str:
    """hu/HungarianLightStemmer.java"""
    w = w.translate(_HUL_FOLD)

    def vowel(c):
        return c in _HUL_VOWELS

    # removeCase
    n = len(w)
    if n > 6 and w.endswith("kent"):
        w = w[:-4]
    else:
        done = False
        if n > 5:
            if w.endswith(("nak", "nek", "val", "vel", "ert", "rol",
                           "ban", "ben", "bol", "nal", "nel", "hoz",
                           "hez", "tol")):
                w = w[:-3]; done = True
            elif w.endswith(("al", "el")) and not vowel(w[-3])                     and w[-3] == w[-4]:
                w = w[:-3]; done = True
        if not done and n > 4:
            if w.endswith(("at", "et", "ot", "va", "ve", "ra", "re",
                           "ba", "be", "ul", "ig")):
                w = w[:-2]
            elif w.endswith(("on", "en")) and not vowel(w[-3]):
                w = w[:-2]
            elif w[-1] in ("t", "n"):
                w = w[:-1]
            elif w[-1] in ("a", "e") and w[-2] == w[-3]                     and not vowel(w[-2]):
                w = w[:-2]
    # removePossessive
    n = len(w)
    done = False
    if n > 6:
        if (not vowel(w[-5]) and w.endswith(("atok", "otok", "etek")))                 or w.endswith(("itek", "itok")):
            w = w[:-4]; done = True
    if not done and n > 5:
        if (not vowel(w[-4]) and w.endswith(("unk", "tok", "tek")))                 or (vowel(w[-4]) and w.endswith("juk"))                 or w.endswith("ink"):
            w = w[:-3]; done = True
    if not done and n > 4:
        if (not vowel(w[-3]) and w.endswith(("am", "em", "om", "ad",
                                             "ed", "od", "uk")))                 or (vowel(w[-3]) and w.endswith(("nk", "ja", "je")))                 or w.endswith(("im", "id", "ik")):
            w = w[:-2]; done = True
    if not done and n > 3:
        if w[-1] in ("a", "e"):
            if not vowel(w[-2]):
                w = w[:-1]
        elif w[-1] in ("m", "d"):
            if vowel(w[-2]):
                w = w[:-1]
        elif w[-1] == "i":
            w = w[:-1]
    # removePlural
    if len(w) > 3 and w[-1] == "k":
        if w[-2] in ("a", "o", "e") and len(w) > 4:
            w = w[:-2]
        else:
            w = w[:-1]
    # normalize
    if len(w) > 3 and w[-1] in "aeio":
        w = w[:-1]
    return w


_FIL_VOWELS = frozenset("aeiouy")
_FIL_FOLD = str.maketrans({"ä": "a", "å": "a", "ö": "o"})


def finnish_light_stem(w: str) -> str:
    """fi/FinnishLightStemmer.java"""
    if len(w) < 4:
        return w
    w = w.translate(_FIL_FOLD)

    def step1(w):
        if len(w) > 8:
            if w.endswith("kin"):
                return step1(w[:-3])
            if w.endswith("ko"):
                return step1(w[:-2])
        if len(w) > 11:
            if w.endswith("dellinen"):
                return w[:-8]
            if w.endswith("dellisuus"):
                return w[:-9]
        return w

    w = step1(w)
    n = len(w)
    if n > 5:
        if w.endswith(("lla", "tse", "sti")):
            w = w[:-3]
        elif w.endswith("ni"):
            w = w[:-2]
        elif w.endswith("aa"):
            w = w[:-1]
    # step3
    n = len(w)
    if n > 8 and w.endswith("nnen"):
        w = w[:-4] + "s"
    elif n > 8 and w.endswith("ntena"):
        w = w[:-5] + "s"
    elif n > 8 and w.endswith("tten"):
        w = w[:-4]
    elif n > 8 and w.endswith("eiden"):
        w = w[:-5]
    elif n > 6 and w.endswith(("neen", "niin", "seen", "teen", "inen")):
        w = w[:-4]
    elif n > 6 and w[-3] == "h" and w[-2] in _FIL_VOWELS and w[-1] == "n":
        w = w[:-3]
    elif n > 6 and w.endswith("den"):
        w = w[:-3] + "s"
    elif n > 6 and w.endswith("ksen"):
        w = w[:-4] + "s"
    elif n > 6 and w.endswith(("ssa", "sta", "lla", "lta", "tta", "ksi",
                               "lle")):
        w = w[:-3]
    elif n > 5 and w.endswith(("na", "ne")):
        w = w[:-2]
    elif n > 5 and w.endswith("nei"):
        w = w[:-3]
    elif n > 4 and w.endswith(("ja", "ta")):
        w = w[:-2]
    elif n > 4 and w[-1] == "a":
        w = w[:-1]
    elif n > 4 and w[-1] == "n":
        w = w[:-2] if w[-2] in _FIL_VOWELS else w[:-1]
    # norm1
    if len(w) > 5 and w.endswith("hde"):
        w = w[:-3] + "ksi"
    if len(w) > 4 and (w.endswith("ei") or w.endswith("at")):
        w = w[:-2]
    elif len(w) > 3 and w[-1] in "tsjeai":
        w = w[:-1]
    # norm2
    if len(w) > 8 and w[-1] in "eou":
        w = w[:-1]
    if len(w) > 4:
        if w[-1] == "i":
            w = w[:-1]
        if len(w) > 4:
            out = [w[0]]
            for c in w[1:]:
                if c == out[-1] and c in ("k", "p", "t"):
                    continue
                out.append(c)
            w = "".join(out)
    return w


def german_minimal_stem(w: str) -> str:
    """de/GermanMinimalStemmer.java"""
    if len(w) < 5:
        return w
    w = w.translate(str.maketrans({"ä": "a", "ö": "o", "ü": "u"}))
    n = len(w)
    if n > 6 and w.endswith("nen"):
        return w[:-3]
    if n > 5 and w.endswith(("en", "se", "es", "er")):
        return w[:-2]
    if w[-1] in "nesr":
        return w[:-1]
    return w


def french_minimal_stem(w: str) -> str:
    """fr/FrenchMinimalStemmer.java"""
    if len(w) < 6:
        return w
    if w[-1] == "x":
        if w[-3] == "a" and w[-2] == "u":
            return w[:-2] + "l"
        return w[:-1]
    if w[-1] == "s":
        w = w[:-1]
    if w[-1] == "r":
        w = w[:-1]
    if w[-1] == "e":
        w = w[:-1]
    if w[-1] == "é":
        w = w[:-1]
    if w[-1] == w[-2]:
        w = w[:-1]
    return w


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
    "galician": galician_stem,
    # the reference's DEFAULT analyzer chains for these five languages
    "german_light": german_light_term,
    "french_light": french_light_stem,
    "spanish_light": spanish_light_stem,
    "portuguese_light": portuguese_light_stem,
    "italian_light": italian_light_stem,
    # *StemFilter factory options (Solr schemas pick these by name)
    "portuguese_rslp": portuguese_rslp_stem,
    "portuguese_minimal": portuguese_minimal_stem,
    "galician_minimal": galician_minimal_stem,
    "swedish_light": swedish_light_stem,
    "norwegian_light": norwegian_light_stem,
    "norwegian_minimal": norwegian_minimal_stem,
    "russian_light": russian_light_stem,
    "hungarian_light": hungarian_light_stem,
    "finnish_light": finnish_light_stem,
    "german_minimal": german_minimal_stem,
    "french_minimal": french_minimal_stem,
}

# Per-language stop sets: transcribed verbatim from the reference's
# */stopwords.txt resources (analysis/stopdata.py, generated by
# tools/gen_stopwords.py). Note the chain POSITION varies by language:
# ar stops BEFORE normalization (ArabicAnalyzer.java createComponents);
# fa/hi/ckb/el stop AFTER their normalize/fold stage — handled by the
# late-stop path in text.py (analysis/chain.py), so these sets are in
# the normalized form the reference files carry (fa/stopwords.txt:4
# "this file is used after normalization").
from .stopdata import REFERENCE_STOPWORDS as _REF_STOPS2  # noqa: E402

LIGHT_STOPWORDS = {
    lang: _REF_STOPS2[lang]
    for lang in (
        "arabic", "persian", "czech", "bulgarian", "hindi", "indonesian",
        "latvian", "greek", "sorani", "brazilian", "galician",
    )
}

# the light-variant analyzers use the same per-language stop cores
from .snowball import SNOWBALL_STOPWORDS as _SB_STOPS  # noqa: E402

for _lang, _src in (("german_light", "german"), ("french_light", "french"),
                    ("spanish_light", "spanish"),
                    ("portuguese_light", "portuguese"),
                    ("italian_light", "italian"),
                    ("portuguese_rslp", "portuguese"),
                    ("portuguese_minimal", "portuguese"),
                    ("swedish_light", "swedish"),
                    ("norwegian_light", "norwegian"),
                    ("norwegian_minimal", "norwegian"),
                    ("russian_light", "russian"),
                    ("hungarian_light", "hungarian"),
                    ("finnish_light", "finnish"),
                    ("german_minimal", "german"),
                    ("french_minimal", "french")):
    LIGHT_STOPWORDS[_lang] = _SB_STOPS[_src]
LIGHT_STOPWORDS["galician_minimal"] = LIGHT_STOPWORDS["galician"]

def light_filter_terms(terms, lang: str):
    """Light-stemmer analog of snowball_filter_terms: dictionary-only
    map, codes remapped (stems may conflate) via stem.vocab_map_terms."""
    from .stem import vocab_map_terms

    return vocab_map_terms(terms, LIGHT_STEMMERS[lang])
