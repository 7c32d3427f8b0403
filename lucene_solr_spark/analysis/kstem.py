"""KStem — the Krovetz dictionary-backed English stemmer
(en/KStemmer.java, a Lucene-optimized derivative of the CIIR/UMass
original; en/KStemFilter.java).

A faithful state-machine port: the mutable word buffer with its
(length, k, j) indices, the exception/direct-conflation/country
tables, the 27,495-word lexicon (kstemdata.py), and the exact rule
cascade order (plural -> pastTense -> aspect -> ity -> ness -> ion ->
er/or -> ly -> al -> ive -> ize -> ment -> ble -> ism -> ic -> ncy ->
nce) with its lookup short-circuits.  The quirks that only a
differential oracle keeps honest ride along: lookup() OVERWRITES
matchedEntry (a later failed probe clears an earlier match), exception
entries are returned by wordInDict but never cached, the 'un-' prefix
guard in pastTense, and the stale-buffer setCharAt interplay.

Differentially verified byte-identical against the compiled reference
KStemmer by tools/fuzz_kstem.py.
"""
from __future__ import annotations

from .kstemdata import KSTEM_WORDS

MAX_WORD_LEN = 50

_EXCEPTION_WORDS = (
    "aide", "bathe", "caste", "cute", "dame", "dime", "doge", "done",
    "dune", "envelope", "gage", "grille", "grippe", "lobe", "mane",
    "mare", "nape", "node", "pane", "pate", "plane", "pope",
    "programme", "quite", "ripe", "rote", "rune", "sage", "severe",
    "shoppe", "sine", "slime", "snipe", "steppe", "suite", "swinge",
    "tare", "tine", "tope", "tripe", "twine",
)

_DIRECT_CONFLATIONS = {
    "aging": "age", "going": "go", "goes": "go", "lying": "lie",
    "using": "use", "owing": "owe", "suing": "sue", "dying": "die",
    "tying": "tie", "vying": "vie", "aged": "age", "used": "use",
    "vied": "vie", "cued": "cue", "died": "die", "eyed": "eye",
    "hued": "hue", "iced": "ice", "lied": "lie", "owed": "owe",
    "sued": "sue", "toed": "toe", "tied": "tie", "does": "do",
    "doing": "do", "aeronautical": "aeronautics",
    "mathematical": "mathematics", "political": "politics",
    "metaphysical": "metaphysics", "cylindrical": "cylinder",
    "nazism": "nazi", "ambiguity": "ambiguous",
    "barbarity": "barbarous", "credulity": "credulous",
    "generosity": "generous", "spontaneity": "spontaneous",
    "unanimity": "unanimous", "voracity": "voracious",
    "fled": "flee", "miscarriage": "miscarry",
}

_COUNTRY_NATIONALITY = {
    "afghan": "afghanistan", "african": "africa",
    "albanian": "albania", "algerian": "algeria",
    "american": "america", "andorran": "andorra", "angolan": "angola",
    "arabian": "arabia", "argentine": "argentina",
    "armenian": "armenia", "asian": "asia", "australian": "australia",
    "austrian": "austria", "azerbaijani": "azerbaijan",
    "azeri": "azerbaijan", "bangladeshi": "bangladesh",
    "belgian": "belgium", "bermudan": "bermuda", "bolivian": "bolivia",
    "bosnian": "bosnia", "botswanan": "botswana",
    "brazilian": "brazil", "british": "britain",
    "bulgarian": "bulgaria", "burmese": "burma",
    "californian": "california", "cambodian": "cambodia",
    "canadian": "canada", "chadian": "chad", "chilean": "chile",
    "chinese": "china", "colombian": "colombia", "croat": "croatia",
    "croatian": "croatia", "cuban": "cuba", "cypriot": "cyprus",
    "czechoslovakian": "czechoslovakia", "danish": "denmark",
    "egyptian": "egypt", "equadorian": "equador",
    "eritrean": "eritrea", "estonian": "estonia",
    "ethiopian": "ethiopia", "european": "europe", "fijian": "fiji",
    "filipino": "philippines", "finnish": "finland",
    "french": "france", "gambian": "gambia", "georgian": "georgia",
    "german": "germany", "ghanian": "ghana", "greek": "greece",
    "grenadan": "grenada", "guamian": "guam",
    "guatemalan": "guatemala", "guinean": "guinea",
    "guyanan": "guyana", "haitian": "haiti", "hawaiian": "hawaii",
    "holland": "dutch", "honduran": "honduras",
    "hungarian": "hungary", "icelandic": "iceland",
    "indonesian": "indonesia", "iranian": "iran", "iraqi": "iraq",
    "iraqui": "iraq", "irish": "ireland", "israeli": "israel",
    "italian": "italy", "jamaican": "jamaica", "japanese": "japan",
    "jordanian": "jordan", "kampuchean": "cambodia",
    "kenyan": "kenya", "korean": "korea", "kuwaiti": "kuwait",
    "lankan": "lanka", "laotian": "laos", "latvian": "latvia",
    "lebanese": "lebanon", "liberian": "liberia", "libyan": "libya",
    "lithuanian": "lithuania", "macedonian": "macedonia",
    "madagascan": "madagascar", "malaysian": "malaysia",
    "maltese": "malta", "mauritanian": "mauritania",
    "mexican": "mexico", "micronesian": "micronesia",
    "moldovan": "moldova", "monacan": "monaco",
    "mongolian": "mongolia", "montenegran": "montenegro",
    "moroccan": "morocco", "myanmar": "burma", "namibian": "namibia",
    "nepalese": "nepal", "nicaraguan": "nicaragua",
    "nigerian": "nigeria", "norwegian": "norway", "omani": "oman",
    "pakistani": "pakistan", "panamanian": "panama",
    "papuan": "papua", "paraguayan": "paraguay", "peruvian": "peru",
    "portuguese": "portugal", "romanian": "romania",
    "rumania": "romania", "rumanian": "romania", "russian": "russia",
    "rwandan": "rwanda", "samoan": "samoa", "scottish": "scotland",
    "serb": "serbia", "serbian": "serbia", "siam": "thailand",
    "siamese": "thailand", "slovakia": "slovak",
    "slovakian": "slovak", "slovenian": "slovenia",
    "somali": "somalia", "somalian": "somalia", "spanish": "spain",
    "swedish": "sweden", "swiss": "switzerland", "syrian": "syria",
    "taiwanese": "taiwan", "tanzanian": "tanzania", "texan": "texas",
    "thai": "thailand", "tunisian": "tunisia", "turkish": "turkey",
    "ugandan": "uganda", "ukrainian": "ukraine",
    "uruguayan": "uruguay", "uzbek": "uzbekistan",
    "venezuelan": "venezuela", "vietnamese": "viet",
    "virginian": "virginia", "yemeni": "yemen",
    "yugoslav": "yugoslavia", "yugoslavian": "yugoslavia",
    "zambian": "zambia", "zealander": "zealand",
    "zimbabwean": "zimbabwe",
}

_SUPPLEMENT_DICT = (
    "aids", "applicator", "capacitor", "digitize", "electromagnet",
    "ellipsoid", "exosphere", "extensible", "ferromagnet", "graphics",
    "hydromagnet", "polygraph", "toroid", "superconduct",
    "backscatter", "connectionism",
)

_PROPER_NOUNS = (
    "abrams", "achilles", "acropolis", "adams", "agnes", "aires",
    "alexander", "alexis", "alfred", "algiers", "alps", "amadeus",
    "ames", "amos", "andes", "angeles", "annapolis", "antilles",
    "aquarius", "archimedes", "arkansas", "asher", "ashly", "athens",
    "atkins", "atlantis", "avis", "bahamas", "bangor", "barbados",
    "barger", "bering", "brahms", "brandeis", "brussels",
    "bruxelles", "cairns", "camoros", "camus", "carlos", "celts",
    "chalker", "charles", "cheops", "ching", "christmas", "cocos",
    "collins", "columbus", "confucius", "conners", "connolly",
    "copernicus", "cramer", "cyclops", "cygnus", "cyprus", "dallas",
    "damascus", "daniels", "davies", "davis", "decker", "denning",
    "dennis", "descartes", "dickens", "doris", "douglas", "downs",
    "dreyfus", "dukakis", "dulles", "dumfries", "ecclesiastes",
    "edwards", "emily", "erasmus", "euphrates", "evans",
    "everglades", "fairbanks", "federales", "fisher", "fitzsimmons",
    "fleming", "forbes", "fowler", "france", "francis", "goering",
    "goodling", "goths", "grenadines", "guiness", "hades", "harding",
    "harris", "hastings", "hawkes", "hawking", "hayes", "heights",
    "hercules", "himalayas", "hippocrates", "hobbs", "holmes",
    "honduras", "hopkins", "hughes", "humphreys", "illinois",
    "indianapolis", "inverness", "iris", "iroquois", "irving",
    "isaacs", "italy", "james", "jarvis", "jeffreys", "jesus",
    "jones", "josephus", "judas", "julius", "kansas", "keynes",
    "kipling", "kiwanis", "lansing", "laos", "leeds", "levis",
    "leviticus", "lewis", "louis", "maccabees", "madras",
    "maimonides", "maldive", "massachusetts", "matthews",
    "mauritius", "memphis", "mercedes", "midas", "mingus",
    "minneapolis", "mohammed", "moines", "morris", "moses", "myers",
    "myknos", "nablus", "nanjing", "nantes", "naples", "neal",
    "netherlands", "nevis", "nostradamus", "oedipus", "olympus",
    "orleans", "orly", "papas", "paris", "parker", "pauling",
    "peking", "pershing", "peter", "peters", "philippines",
    "phineas", "pisces", "pryor", "pythagoras", "queens", "rabelais",
    "ramses", "reynolds", "rhesus", "rhodes", "richards", "robins",
    "rodgers", "rogers", "rubens", "sagittarius", "seychelles",
    "socrates", "texas", "thames", "thomas", "tiberias", "tunis",
    "venus", "vilnius", "wales", "warner", "wilkins", "williams",
    "wyoming", "xmas", "yonkers", "zeus", "frances", "aarhus",
    "adonis", "andrews", "angus", "antares", "aquinas", "arcturus",
    "ares", "artemis", "augustus", "ayers", "barnabas", "barnes",
    "becker", "bejing", "biggs", "billings", "boeing", "boris",
    "borroughs", "briggs", "buenos", "calais", "caracas", "cassius",
    "cerberus", "ceres", "cervantes", "chantilly", "chartres",
    "chester", "connally", "conner", "coors", "cummings", "curtis",
    "daedalus", "dionysus", "dobbs", "dolores", "edmonds",
)


def _build_dict() -> dict:
    """initializeDictHash: word -> (root_or_None, is_exception).
    Insertion order matters only for the duplicate guards, which the
    reference enforces at class-load; entries never collide here."""
    d = {}
    for w in _EXCEPTION_WORDS:
        d[w] = (w, True)
    for w, root in _DIRECT_CONFLATIONS.items():
        d[w] = (root, False)
    for w, root in _COUNTRY_NATIONALITY.items():
        d[w] = (root, False)
    default = (None, False)
    for w in KSTEM_WORDS:
        if w not in d:
            d[w] = default
    for w in _SUPPLEMENT_DICT:
        if w not in d:
            d[w] = default
    for w in _PROPER_NOUNS:
        if w not in d:
            d[w] = default
    return d


_DICT = _build_dict()


class _KStem:
    """One stemming pass: the KStemmer buffer/index state machine."""

    __slots__ = ("buf", "blen", "j", "k", "matched")

    def __init__(self, term: str):
        self.buf = list(term) + [""] * 10
        self.blen = len(term)
        self.k = len(term) - 1
        self.j = 0
        self.matched = None  # (root, exception) or None

    # -- buffer ops (OpenStringBuilder semantics) ----------------------

    def word(self) -> str:
        return "".join(self.buf[: self.blen])

    def set_length(self, n: int) -> None:
        self.blen = n

    def write(self, c: str) -> None:
        if self.blen < len(self.buf):
            self.buf[self.blen] = c
        else:
            self.buf.append(c)
        self.blen += 1

    def append(self, s: str) -> None:
        for c in s:
            self.write(c)

    def set_char(self, i: int, c: str) -> None:
        while i >= len(self.buf):
            self.buf.append("")
        self.buf[i] = c

    def ch(self, i: int) -> str:
        return self.buf[i]

    # -- predicates -----------------------------------------------------

    def is_cons(self, i: int) -> bool:
        c = self.buf[i]
        if c in "aeiou":
            return False
        if c != "y" or i == 0:
            return True
        return not self.is_cons(i - 1)

    def is_vowel(self, i: int) -> bool:
        return not self.is_cons(i)

    def vowel_in_stem(self) -> bool:
        return any(self.is_vowel(i) for i in range(self.j + 1))

    def double_c(self, i: int) -> bool:
        if i < 1:
            return False
        if self.buf[i] != self.buf[i - 1]:
            return False
        return self.is_cons(i)

    def ends_in(self, s: str) -> bool:
        if len(s) > self.k:
            return False
        r = self.blen - len(s)
        self.j = self.k
        for i, c in enumerate(s):
            if c != self.buf[r + i]:
                return False
        self.j = r - 1
        return True

    # -- dictionary ------------------------------------------------------

    def lookup(self) -> bool:
        self.matched = _DICT.get(self.word())
        return self.matched is not None

    def word_in_dict(self):
        """wordInDict: caches non-exception hits in matchedEntry but
        does NOT clear it on a miss (unlike lookup)."""
        if self.matched is not None:
            return self.matched
        e = _DICT.get(self.word())
        if e is not None and not e[1]:
            self.matched = e
        return e

    # -- rules (exact transcriptions) -------------------------------------

    def plural(self) -> None:
        if self.buf[self.k] != "s":
            return
        if self.ends_in("ies"):
            self.set_length(self.j + 3)
            self.k -= 1
            if self.lookup():
                return
            self.k += 1
            self.write("s")
            self.set_suffix("y")
            self.lookup()
        elif self.ends_in("es"):
            self.set_length(self.j + 2)
            self.k -= 1
            try_e = self.j > 0 and not (
                self.buf[self.j] == "s" and self.buf[self.j - 1] == "s")
            if try_e and self.lookup():
                return
            self.set_length(self.j + 1)
            self.k -= 1
            if self.lookup():
                return
            self.write("e")
            self.k += 1
            if not try_e:
                self.lookup()
            return
        else:
            if self.blen > 3 and self.buf[self.k - 1] != "s" \
                    and not self.ends_in("ous"):
                self.set_length(self.k)
                self.k -= 1
                self.lookup()

    def set_suffix(self, s: str) -> None:
        self.set_length(self.j + 1)
        for c in s:
            self.write(c)
        self.k = self.j + len(s)

    def past_tense(self) -> None:
        if self.blen <= 4:
            return
        if self.ends_in("ied"):
            self.set_length(self.j + 3)
            self.k -= 1
            if self.lookup():
                return
            self.k += 1
            self.write("d")
            self.set_suffix("y")
            self.lookup()
            return
        if self.ends_in("ed") and self.vowel_in_stem():
            self.set_length(self.j + 2)
            self.k = self.j + 1
            entry = self.word_in_dict()
            if entry is not None and not entry[1]:
                return
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            if self.double_c(self.k):
                self.set_length(self.k)
                self.k -= 1
                if self.lookup():
                    return
                self.write(self.buf[self.k])
                self.k += 1
                self.lookup()
                return
            if self.buf[0] == "u" and self.buf[1] == "n":
                self.write("e")
                self.write("d")
                self.k += 2
                return
            self.set_length(self.j + 1)
            self.write("e")
            self.k = self.j + 1
            return

    def aspect(self) -> None:
        if self.blen <= 5:
            return
        if self.ends_in("ing") and self.vowel_in_stem():
            self.set_char(self.j + 1, "e")
            self.set_length(self.j + 2)
            self.k = self.j + 1
            entry = self.word_in_dict()
            if entry is not None and not entry[1]:
                return
            self.set_length(self.k)
            self.k -= 1
            if self.lookup():
                return
            if self.double_c(self.k):
                self.k -= 1
                self.set_length(self.k + 1)
                if self.lookup():
                    return
                self.write(self.buf[self.k])
                self.k += 1
                self.lookup()
                return
            if self.j > 0 and self.is_cons(self.j) \
                    and self.is_cons(self.j - 1):
                self.k = self.j
                self.set_length(self.k + 1)
                return
            self.set_length(self.j + 1)
            self.write("e")
            self.k = self.j + 1
            return

    def ity_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ity"):
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            self.write("e")
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_char(self.j + 1, "i")
            self.append("ty")
            self.k = old_k
            if self.j > 0 and self.buf[self.j - 1] == "i" \
                    and self.buf[self.j] == "l":
                self.set_length(self.j - 1)
                self.append("le")
                self.k = self.j
                self.lookup()
                return
            if self.j > 0 and self.buf[self.j - 1] == "i" \
                    and self.buf[self.j] == "v":
                self.set_length(self.j + 1)
                self.write("e")
                self.k = self.j + 1
                self.lookup()
                return
            if self.j > 0 and self.buf[self.j - 1] == "a" \
                    and self.buf[self.j] == "l":
                self.set_length(self.j + 1)
                self.k = self.j
                self.lookup()
                return
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.k = self.j
            return

    def ness_endings(self) -> None:
        if self.ends_in("ness"):
            self.set_length(self.j + 1)
            self.k = self.j
            if self.buf[self.j] == "i":
                self.set_char(self.j, "y")
            self.lookup()

    def ism_endings(self) -> None:
        if self.ends_in("ism"):
            self.set_length(self.j + 1)
            self.k = self.j
            self.lookup()

    def ment_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ment"):
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            self.append("ment")
            self.k = old_k

    def ize_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ize"):
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            self.write("i")
            if self.double_c(self.j):
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.write(self.buf[self.j - 1])
            self.set_length(self.j + 1)
            self.write("e")
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("ize")
            self.k = old_k

    def ncy_endings(self) -> None:
        if self.ends_in("ncy"):
            if self.buf[self.j] not in ("e", "a"):
                return
            self.set_char(self.j + 2, "t")
            self.set_length(self.j + 3)
            self.k = self.j + 2
            if self.lookup():
                return
            self.set_char(self.j + 2, "c")
            self.write("e")
            self.k = self.j + 3
            self.lookup()

    def nce_endings(self) -> None:
        old_k = self.k
        if self.ends_in("nce"):
            wc = self.buf[self.j]
            if wc not in ("e", "a"):
                return
            self.set_length(self.j)
            self.write("e")
            self.k = self.j
            if self.lookup():
                return
            self.set_length(self.j)
            self.k = self.j - 1
            if self.lookup():
                return
            self.write(wc)
            self.append("nce")
            self.k = old_k

    def ble_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ble"):
            if self.buf[self.j] not in ("a", "i"):
                return
            wc = self.buf[self.j]
            self.set_length(self.j)
            self.k = self.j - 1
            if self.lookup():
                return
            if self.double_c(self.k):
                self.set_length(self.k)
                self.k -= 1
                if self.lookup():
                    return
                self.k += 1
                self.write(self.buf[self.k - 1])
            self.set_length(self.j)
            self.write("e")
            self.k = self.j
            if self.lookup():
                return
            self.set_length(self.j)
            self.append("ate")
            self.k = self.j + 2
            if self.lookup():
                return
            self.set_length(self.j)
            self.write(wc)
            self.append("ble")
            self.k = old_k

    def ic_endings(self) -> None:
        if self.ends_in("ic"):
            self.set_length(self.j + 3)
            self.append("al")
            self.k = self.j + 4
            if self.lookup():
                return
            self.set_char(self.j + 1, "y")
            self.set_length(self.j + 2)
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_char(self.j + 1, "e")
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            self.append("ic")
            self.k = self.j + 2

    def ion_endings(self) -> None:
        old_k = self.k
        if not self.ends_in("ion"):
            return
        if self.ends_in("ization"):
            self.set_length(self.j + 3)
            self.write("e")
            self.k = self.j + 3
            self.lookup()
            return
        if self.ends_in("ition"):
            self.set_length(self.j + 1)
            self.write("e")
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("ition")
            self.k = old_k
        elif self.ends_in("ation"):
            self.set_length(self.j + 3)
            self.write("e")
            self.k = self.j + 3
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.write("e")
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("ation")
            self.k = old_k
        if self.ends_in("ication"):
            self.set_length(self.j + 1)
            self.write("y")
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("ication")
            self.k = old_k
        # generic -ion handling (the reference re-derives j here)
        self.j = self.k - 3
        self.set_length(self.j + 1)
        self.write("e")
        self.k = self.j + 1
        if self.lookup():
            return
        self.set_length(self.j + 1)
        self.k = self.j
        if self.lookup():
            return
        self.set_length(self.j + 1)
        self.append("ion")
        self.k = old_k

    def er_and_or_endings(self) -> None:
        old_k = self.k
        if self.buf[self.k] != "r":
            return
        if self.ends_in("izer"):
            self.set_length(self.j + 4)
            self.k = self.j + 3
            self.lookup()
            return
        if self.ends_in("er") or self.ends_in("or"):
            wc = self.buf[self.j + 1]
            if self.double_c(self.j):
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.write(self.buf[self.j - 1])
            if self.buf[self.j] == "i":
                self.set_char(self.j, "y")
                self.set_length(self.j + 1)
                self.k = self.j
                if self.lookup():
                    return
                self.set_char(self.j, "i")
                self.write("e")
            if self.buf[self.j] == "e":
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.write("e")
            self.set_length(self.j + 2)
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            self.write("e")
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.write(wc)
            self.write("r")
            self.k = old_k

    def ly_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ly"):
            self.set_char(self.j + 2, "e")
            if self.lookup():
                return
            self.set_char(self.j + 2, "y")
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            if self.j > 0 and self.buf[self.j - 1] == "a" \
                    and self.buf[self.j] == "l":
                return
            self.append("ly")
            self.k = old_k
            if self.j > 0 and self.buf[self.j - 1] == "a" \
                    and self.buf[self.j] == "b":
                self.set_char(self.j + 2, "e")
                self.k = self.j + 2
                return
            if self.buf[self.j] == "i":
                self.set_length(self.j)
                self.write("y")
                self.k = self.j
                if self.lookup():
                    return
                self.set_length(self.j)
                self.append("ily")
                self.k = old_k
            self.set_length(self.j + 1)
            self.k = self.j

    def al_endings(self) -> None:
        old_k = self.k
        if self.blen < 4:
            return
        if self.ends_in("al"):
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            if self.double_c(self.j):
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.write(self.buf[self.j - 1])
            self.set_length(self.j + 1)
            self.write("e")
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("um")
            self.k = self.j + 2
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("al")
            self.k = old_k
            if self.j > 0 and self.buf[self.j - 1] == "i" \
                    and self.buf[self.j] == "c":
                self.set_length(self.j - 1)
                self.k = self.j - 2
                if self.lookup():
                    return
                self.set_length(self.j - 1)
                self.write("y")
                self.k = self.j - 1
                if self.lookup():
                    return
                self.set_length(self.j - 1)
                self.append("ic")
                self.k = self.j
                self.lookup()
                return
            if self.buf[self.j] == "i":
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.append("ial")
                self.k = old_k
                self.lookup()

    def ive_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ive"):
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            self.write("e")
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("ive")
            if self.j > 0 and self.buf[self.j - 1] == "a" \
                    and self.buf[self.j] == "t":
                self.set_char(self.j - 1, "e")
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.set_length(self.j - 1)
                if self.lookup():
                    return
                self.append("ative")
                self.k = old_k
            self.set_char(self.j + 2, "o")
            self.set_char(self.j + 3, "n")
            if self.lookup():
                return
            self.set_char(self.j + 2, "v")
            self.set_char(self.j + 3, "e")
            self.k = old_k


def kstem(term: str) -> str:
    """KStemmer.stem(String): lowercase input required (the chain
    lowercases first, like the reference's mandated LowerCaseFilter)."""
    k = len(term) - 1
    if k <= 1 or k >= MAX_WORD_LEN - 1:
        return term
    entry = _DICT.get(term)
    if entry is not None:
        return entry[0] if entry[0] is not None else term
    if any(not ("a" <= c <= "z") for c in term):
        return term

    s = _KStem(term)
    while True:
        s.plural()
        if s.matched:
            break
        s.past_tense()
        if s.matched:
            break
        s.aspect()
        if s.matched:
            break
        s.ity_endings()
        if s.matched:
            break
        s.ness_endings()
        if s.matched:
            break
        s.ion_endings()
        if s.matched:
            break
        s.er_and_or_endings()
        if s.matched:
            break
        s.ly_endings()
        if s.matched:
            break
        s.al_endings()
        if s.matched:
            break
        s.word_in_dict()
        s.ive_endings()
        if s.matched:
            break
        s.ize_endings()
        if s.matched:
            break
        s.ment_endings()
        if s.matched:
            break
        s.ble_endings()
        if s.matched:
            break
        s.ism_endings()
        if s.matched:
            break
        s.ic_endings()
        if s.matched:
            break
        s.ncy_endings()
        if s.matched:
            break
        s.nce_endings()
        break

    if s.matched is not None and s.matched[0] is not None:
        return s.matched[0]
    return s.word()


def kstem_filter_terms(terms):
    """Vocabulary-vectorized KStemFilter over an analyzed term column."""
    from .stem import vocab_map_terms

    return vocab_map_terms(terms, kstem)
