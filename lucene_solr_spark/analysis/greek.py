"""Greek analyzer pack: GreekLowerCaseFilter + GreekStemmer.

Semantics ported from the reference (el/GreekLowerCaseFilter.java:55 —
final sigma to sigma, tonos/dialytika stripped to the base vowel — and
el/GreekStemmer.java:43 — the 23-rule cascade of Ntais' stemmer with
Lucene's exception sets). Rules strip a suffix and then "add back" a
shorter invariant when the remaining stem is in a rule-specific
exception set (exact stem match) or ends with a listed shape.

Fidelity note: rule 8's inner branches reproduce the reference's Java
operator precedence exactly (`len > 7 && A || B || C` binds as
`(len > 7 && A) || B || C`), so whole-word matches of the unguarded
alternatives behave like the reference, quirks included.

Chain divergence (documented): the reference runs GreekLowerCaseFilter
before the stop filter; here the stop check uses the generic lowercase
form, so the stop set carries both accented and unaccented spellings of
the accented stop words.
"""

from __future__ import annotations

# GreekLowerCaseFilter (el/GreekLowerCaseFilter.java:55): already
# generically lowercased upstream, so only the lowercase-side mappings
# matter: final sigma, tonos/dialytika forms to the bare vowel.
_EL_FOLD = str.maketrans({
    "ς": "σ",
    "ά": "α", "έ": "ε", "ή": "η",
    "ί": "ι", "ϊ": "ι", "ΐ": "ι",
    "ύ": "υ", "ϋ": "υ", "ΰ": "υ",
    "ό": "ο", "ώ": "ω",
})


def greek_lower(w: str) -> str:
    return w.translate(_EL_FOLD)


_VOWELS = frozenset("αεηιουω")
_VOWELS_NO_Y = frozenset("αεηιοω")  # 'υ' excluded

_EXC4 = frozenset(("θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"))
_EXC6 = frozenset((
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ"))
_EXC7 = frozenset(("αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ",
                   "πεθ", "πικρ", "ποτ", "σιχ", "χ"))
_EXC8A = frozenset(("τρ", "τσ"))
_EXC8B = frozenset((
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
    "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π",
    "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ",
    "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ",
    "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
    "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
    "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
    "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
    "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
    "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
    "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ",
    "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ",
    "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ"))
_EXC9 = frozenset(("αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ",
                   "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ",
                   "παρακαλ", "σερπ", "σκελ", "συρφ", "τοκ", "υ", "δ",
                   "εμ", "θαρρ", "θ"))
_R9_SHAPES = ("οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ", "ευρ",
              "τιθ", "υπερθ", "ραθ", "ενθ", "ροθ", "σθ", "πυρ", "αιν",
              "συνδ", "συν", "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ",
              "εκθ", "νετ", "ρον", "αρκ", "βαρ", "βολ", "ωφελ")
_EXC12A = frozenset(("π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"))
_EXC12B = frozenset(("αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ",
                     "προ", "νισ"))
_EXC13 = frozenset(("διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"))
_EXC14 = frozenset(("φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
                    "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ",
                    "μεσαζ", "υποτειν", "αμ", "αιθ", "ανηκ", "δεσποζ",
                    "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
                    "τσα"))
_R14_SHAPES = ("ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ", "μαλλ",
               "κυματ", "λαχ", "ληγ", "φαγ", "ομ", "πρωτ")
_EXC15A = frozenset((
    "αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ", "αμαλλι",
    "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ", "ξεφ", "νεοπ",
    "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ", "συμπ", "συντ", "τ",
    "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ", "αρτιπ", "διατ",
    "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ", "ναυ", "ουλαμ", "ουρ",
    "π", "τρ", "μ"))
_R15_SHAPES = ("οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ", "πρ", "λοχ",
               "σμην")
_EXC15B = frozenset(("ψοφ", "ναυλοχ"))
_EXC16 = frozenset(("ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον",
                    "επταν"))
_EXC17 = frozenset(("ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
                    "ευχρ", "κοινοχρ", "παλιμψ"))
_EXC18 = frozenset(("ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"))
_EXC19 = frozenset(("παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ",
                    "ασουσ"))

_R13_SHAPES = ("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ")

_R0_LADDER = (
    (9, ("καθεστωτοσ", "καθεστωτων"), 4),
    (8, ("γεγονοτοσ", "γεγονοτων"), 4),
    (8, ("καθεστωτα",), 3),
    (7, ("τατογιου", "τατογιων"), 4),
    (7, ("γεγονοτα",), 3),
    (7, ("καθεστωσ",), 2),
    (6, ("σκαγιου", "σκαγιων", "ολογιου", "ολογιων", "κρεατοσ",
         "κρεατων", "περατοσ", "περατων", "τερατοσ", "τερατων"), 4),
    (6, ("τατογια",), 3),
    (6, ("γεγονοσ",), 2),
    (5, ("φαγιου", "φαγιων", "σογιου", "σογιων"), 4),
    (5, ("σκαγια", "ολογια", "κρεατα", "περατα", "τερατα"), 3),
    (4, ("φαγια", "σογια", "φωτοσ", "φωτων"), 3),
    (4, ("κρεασ", "περασ", "τερασ"), 2),
    (3, ("φωτα",), 2),
    (2, ("φωσ",), 1),
)

_R21_LADDER = (
    (9, ("ιοντουσαν",)),
    (8, ("ιομασταν", "ιοσασταν", "ιουμαστε", "οντουσαν")),
    (7, ("ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε", "ιοσουνα",
         "ιουνται", "ιουνταν", "ηθηκατε", "ομασταν", "οσασταν",
         "ουμαστε")),
    (6, ("ιομουν", "ιονταν", "ιοσουν", "ηθειτε", "ηθηκαν", "ομουνα",
         "οσαστε", "οσουνα", "ουνται", "ουνταν", "ουσατε")),
    (5, ("αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν", "ιουμα", "ηθεισ",
         "ηθουν", "ηκατε", "ησατε", "ησουν", "ομουν", "ονται", "ονταν",
         "οσουν", "ουμαι", "ουσαν")),
    (4, ("αγαν", "αμαι", "ασαι", "αται", "ειτε", "εσαι", "εται", "ηδεσ",
         "ηδων", "ηθει", "ηκαν", "ησαν", "ησει", "ησεσ", "ομαι",
         "οταν")),
    (3, ("αει", "εισ", "ηθω", "ησω", "ουν", "ουσ")),
    (2, ("αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ", "ου", "υσ",
         "ων")),
)


def _ev(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS


def _ev_no_y(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS_NO_Y


def greek_stem(word: str) -> str:
    w = greek_lower(word)
    if len(w) < 4:
        return w
    orig_len = len(w)

    # rule 0
    for minlen, sufs, cut in _R0_LADDER:
        if len(w) > minlen and w.endswith(sufs):
            w = w[:-cut]
            break

    # rule 1: -αδεσ/-αδων
    if len(w) > 4 and w.endswith(("αδεσ", "αδων")):
        stem = w[:-4]
        if stem.endswith(("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι",
                          "νταντ", "κυρ", "θει", "πεθερ")):
            w = stem
        else:
            w = stem + "αδ"
    # rule 2: -εδεσ/-εδων
    if len(w) > 4 and w.endswith(("εδεσ", "εδων")):
        stem = w[:-4]
        if stem.endswith(("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ",
                          "μιλ")):
            w = stem + "εδ"
        else:
            w = stem
    # rule 3: -ουδεσ/-ουδων
    if len(w) > 5 and w.endswith(("ουδεσ", "ουδων")):
        stem = w[:-5]
        if stem.endswith(("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ",
                          "σ", "φλ", "φρ", "βελ", "λουλ", "χν", "σπ",
                          "τραγ", "φε")):
            w = stem + "ουδ"
        else:
            w = stem
    # rule 4: -εωσ/-εων
    if len(w) > 3 and w.endswith(("εωσ", "εων")):
        stem = w[:-3]
        w = stem + "ε" if stem in _EXC4 else stem
    # rule 5: -ια / -ιου/-ιων
    if len(w) > 2 and w.endswith("ια"):
        stem = w[:-2]
        w = stem + "ι" if _ev(stem) else stem
    elif len(w) > 3 and w.endswith(("ιου", "ιων")):
        stem = w[:-3]
        w = stem + "ι" if _ev(stem) else stem
    # rule 6: -ικα/-ικο / -ικου/-ικων
    removed = False
    if len(w) > 3 and w.endswith(("ικα", "ικο")):
        w = w[:-3]
        removed = True
    elif len(w) > 4 and w.endswith(("ικου", "ικων")):
        w = w[:-4]
        removed = True
    if removed and (_ev(w) or w in _EXC6):
        w += "ικ"
    # rule 7: -αγαμε family then -αμε
    if len(w) == 5 and w.endswith("αγαμε"):
        w = w[:-1]
    else:
        if len(w) > 7 and w.endswith("ηθηκαμε"):
            w = w[:-7]
        elif len(w) > 6 and w.endswith("ουσαμε"):
            w = w[:-6]
        elif len(w) > 5 and w.endswith(("αγαμε", "ησαμε", "ηκαμε")):
            w = w[:-5]
        if len(w) > 3 and w.endswith("αμε"):
            stem = w[:-3]
            w = stem + "αμ" if stem in _EXC7 else stem
    # rule 8: -ανε family (reference precedence reproduced: the 2nd-4th
    # branches' non-first alternatives are NOT length-guarded)
    removed = False
    if len(w) > 8 and w.endswith("ιουντανε"):
        w = w[:-8]
        removed = True
    elif (len(w) > 7 and w.endswith("ιοντανε")) \
            or w.endswith(("ουντανε", "ηθηκανε")):
        w = w[:-7]
        removed = True
    elif (len(w) > 6 and w.endswith("ιοτανε")) \
            or w.endswith(("οντανε", "ουσανε")):
        w = w[:-6]
        removed = True
    elif (len(w) > 5 and w.endswith("αγανε")) \
            or w.endswith(("ησανε", "οτανε", "ηκανε")):
        w = w[:-5]
        removed = True
    if removed and w in _EXC8A:
        w += "αγαν"
    if len(w) > 3 and w.endswith("ανε"):
        stem = w[:-3]
        w = stem + "αν" if (_ev_no_y(stem) or stem in _EXC8B) else stem
    # rule 9: -ησετε then -ετε
    if len(w) > 5 and w.endswith("ησετε"):
        w = w[:-5]
    if len(w) > 3 and w.endswith("ετε"):
        stem = w[:-3]
        if stem in _EXC9 or _ev_no_y(stem) or stem.endswith(_R9_SHAPES):
            w = stem + "ετ"
        else:
            w = stem
    # rule 10: -οντασ/-ωντασ
    if len(w) > 5 and w.endswith(("οντασ", "ωντασ")):
        w = w[:-5]
        if len(w) == 3 and w.endswith("αρχ"):
            w += "οντ"
        if w.endswith("κρε"):
            w += "ωντ"
    # rule 11: -ομαστε / -ιομαστε
    if len(w) > 6 and w.endswith("ομαστε"):
        w = w[:-6]
        if len(w) == 2 and w.endswith("ον"):
            w += "ομαστ"
    elif len(w) > 7 and w.endswith("ιομαστε"):
        w = w[:-7]
        if len(w) == 2 and w.endswith("ον"):
            w += "ομαστ"
    # rule 12: -ιεστε then -εστε
    if len(w) > 5 and w.endswith("ιεστε"):
        stem = w[:-5]
        w = stem + "ιεστ" if stem in _EXC12A else stem
    if len(w) > 4 and w.endswith("εστε"):
        stem = w[:-4]
        w = stem + "εστ" if stem in _EXC12B else stem
    # rule 13: -ηθηκ* then -ηκ*
    if len(w) > 6 and w.endswith("ηθηκεσ"):
        w = w[:-6]
    elif len(w) > 5 and w.endswith(("ηθηκα", "ηθηκε")):
        w = w[:-5]
    removed = False
    if len(w) > 4 and w.endswith("ηκεσ"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("ηκα", "ηκε")):
        w = w[:-3]
        removed = True
    if removed and (w in _EXC13 or w.endswith(_R13_SHAPES)):
        w += "ηκ"
    # rule 14: -ουσ* imperfect
    removed = False
    if len(w) > 5 and w.endswith("ουσεσ"):
        w = w[:-5]
        removed = True
    elif len(w) > 4 and w.endswith(("ουσα", "ουσε")):
        w = w[:-4]
        removed = True
    if removed and (w in _EXC14 or _ev(w) or w.endswith(_R14_SHAPES)):
        w += "ουσ"
    # rule 15: -αγ* imperfect
    removed = False
    if len(w) > 4 and w.endswith("αγεσ"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("αγα", "αγε")):
        w = w[:-3]
        removed = True
    if removed:
        cond1 = w in _EXC15A or w.endswith(_R15_SHAPES)
        cond2 = w in _EXC15B or w.endswith("κολλ")
        if cond1 and not cond2:
            w += "αγ"
    # rule 16: -ησου/-ησε/-ησα
    removed = False
    if len(w) > 4 and w.endswith("ησου"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("ησε", "ησα")):
        w = w[:-3]
        removed = True
    if removed and w in _EXC16:
        w += "ησ"
    # rule 17: -ηστε
    if len(w) > 4 and w.endswith("ηστε"):
        stem = w[:-4]
        w = stem + "ηστ" if stem in _EXC17 else stem
    # rule 18: -ουνε family
    removed = False
    if len(w) > 6 and w.endswith(("ησουνε", "ηθουνε")):
        w = w[:-6]
        removed = True
    elif len(w) > 4 and w.endswith("ουνε"):
        w = w[:-4]
        removed = True
    if removed and w in _EXC18:
        w += "ουν"
    # rule 19: -ουμε family
    removed = False
    if len(w) > 6 and w.endswith(("ησουμε", "ηθουμε")):
        w = w[:-6]
        removed = True
    elif len(w) > 4 and w.endswith("ουμε"):
        w = w[:-4]
        removed = True
    if removed and w in _EXC19:
        w += "ουμ"
    # rule 20: -ματων/-ματοσ / -ματα
    if len(w) > 5 and w.endswith(("ματων", "ματοσ")):
        w = w[:-3]
    elif len(w) > 4 and w.endswith("ματα"):
        w = w[:-2]
    # rule 21 (long list) only if nothing else fired
    if len(w) == orig_len:
        for cut, sufs in _R21_LADDER:  # every suffix in a group is cut long
            if len(w) > cut and w.endswith(sufs):
                w = w[:-cut]
                break
        else:
            if len(w) > 1 and _ev(w):
                w = w[:-1]
    # rule 22: superlatives, unconditional
    if w.endswith(("εστερ", "εστατ")):
        w = w[:-5]
    elif w.endswith(("οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")):
        w = w[:-4]
    return w
