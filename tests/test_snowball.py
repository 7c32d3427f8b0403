"""Snowball stemmer tests: hand-traced vectors from the published
algorithm descriptions, vectorized-filter equivalence, and the analyzer
chain (per-language stop list + stemming + position gaps)."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.analysis.snowball import (
    SNOWBALL_STEMMERS,
    SNOWBALL_STOPWORDS,
    armenian_stem,
    basque_stem,
    catalan_stem,
    danish_stem,
    irish_stem,
    dutch_stem,
    finnish_stem,
    french_stem,
    german_stem,
    hungarian_stem,
    italian_stem,
    norwegian_stem,
    portuguese_stem,
    romanian_stem,
    russian_stem,
    snowball_filter_terms,
    spanish_stem,
    swedish_stem,
    turkish_stem,
    turkish_term_filter,
)
from lucene_solr_spark.analysis import tokenize_series


# Every vector below is hand-traced through the published algorithm
# (regions, longest-suffix match, condition, action) — the traces live in
# the r4 session notes; a few are also well-known demo outputs.
GERMAN = [
    ("katzen", "katz"),          # step 1 'en' in R1
    ("laufen", "lauf"),
    ("schönes", "schon"),        # 'es' in R1 + unumlaut
    ("bedürfnisse", "bedurfnis"),  # 'e' + niss -> nis
    ("häuser", "haus"),          # 'er' + unumlaut
    ("fischers", "fisch"),       # s(valid s-ending) then step 2 'er'
    ("aufgabe", "aufgab"),
    ("weißes", "weiss"),         # ß -> ss, 'es' in R1
]
FRENCH = [
    ("continuelle", "continuel"),  # step4 'e' + step5 undouble 'ell'
    ("arrivera", "arriv"),         # 2b 'era' in RV
    ("majestueux", "majestu"),     # step1 'eux' in R2
    ("chanterions", "chant"),      # 2b 'erions'
    ("nationale", "national"),     # step4 'e'
]
SPANISH = [
    ("caminando", "camin"),      # 2b 'ando'
    ("canciones", "cancion"),    # 2b 'es' (gu-group, no gu)
    ("grandiosas", "grandi"),    # 2b 'as' then step3 residual 'os'
    ("niñas", "niñ"),            # 2b 'as'
]
PORTUGUESE = [
    ("falando", "fal"),          # step2 'ando'
    ("meninas", "menin"),        # step2 'as'
]
ITALIAN = [
    ("abbandonata", "abbandon"),     # verb 'ata' in RV
    ("abbandonarlo", "abbandon"),    # pronoun 'lo' after 'ar' -> +e, 'are'
    ("nazionale", "nazional"),       # final vowel in RV
    ("nazioni", "nazion"),           # final 'i' in RV
    ("logia", "log"),                # step1 'logia' -> log
    ("caratteristiche", "caratterist"),  # step1 'iche' in R2
    ("mangiano", "mang"),            # verb 'ano' + final-vowel 'i' tidy
    ("amichevole", "amichevol"),     # no suffix matches; vowel tidy only
]
DUTCH = [
    ("lichamelijk", "licham"),       # lijk in R2 + e-ending (worked example)
    ("opvoeding", "opvoed"),         # ing in R2 (worked example)
    ("maan", "man"),                 # step4 undouble vowel (worked example)
    ("brood", "brod"),               # step4 undouble vowel (worked example)
    ("bedden", "bed"),               # en-ending + kk/dd/tt undouble
    ("huizen", "huiz"),              # en-ending (worked example)
    ("gemeenten", "gemeent"),        # 'gem' guard is 3-back from en, passes
    ("mogelijkheden", "mogelijk"),   # heden->heid then heid deleted in R2
]
SWEDISH = [
    ("flickorna", "flick"),          # step1 'orna'
    ("klubbarna", "klubb"),          # step1 'arna'
    ("inledningen", "inledning"),    # step1 'en'
    ("vackraste", "vackr"),          # step1 'aste'
    ("husets", "huset"),             # only 's' (no 'ets' in Swedish)
    ("möjligheterna", "möj"),        # 'heterna' + other-suffix 'lig'
]
NORWEGIAN = [
    ("huset", "hus"),                # step1 'et'
    ("bilene", "bil"),               # step1 'ene'
    ("naturlig", "natur"),           # other-suffix 'lig'
    ("vakkert", "vakker"),           # step1 'ert' -> 'er'
    ("forsøkene", "forsøk"),         # step1 'ene'
    ("kjærlighetens", "kjær"),       # 'hetens' + 'lig'
]
DANISH = [
    ("hundene", "hund"),             # step1 'ene'
    ("katten", "kat"),               # step1 'en' + undouble tt
    ("kattens", "kat"),              # step1 'ens' + undouble
    ("venligst", "ven"),             # igst -> -st, then 'lig'
    ("frygteligt", "frygt"),         # gt pair trim, then 'elig'
    ("spørgsmålet", "spørgsmål"),    # step1 'et'
]
ROMANIAN = [
    ("abilitate", "abil"),        # a_3 'itate' in R2
    ("frumoasă", "frumoas"),      # final vowel in RV
    ("lucrurile", "lucrur"),      # step0 'ile' -> i, then vowel tidy
    ("importante", "import"),     # a_3 'ante' in R2
    ("naţiunea", "naţiun"),       # step0 'ea' -> e, vowel tidy
]
FINNISH = [
    ("taloissa", "talo"),          # case 'ssa' + i-plural
    ("taloihin", "talo"),          # case 'hin' preceded by i, i-plural
    ("edeltäjistään", "edeltäj"),  # possessive 'än' + case 'stä' + i
    ("sanoiksi", "sano"),          # case 'ksi' + i-plural
    ("kirjat", "kirj"),            # t-plural + tidy AEI-after-consonant
    ("suurimmat", "suurim"),       # t-plural + tidy undouble mm
    ("nopeammin", "nopeam"),       # case 'n' + i-plural + undouble
    ("kirjoja", "kirj"),           # tidy cascade: AEI, oj, jo
    ("puiden", "puide"),           # 'den' crosses R1 -> bare 'n' strip
    ("edeltäjistä", "edeltäj"),    # case 'stä' + i-plural
]
HUNGARIAN = [
    ("asztalokat", "asztal"),      # sz digraph R1; case 'at' + plural 'ok'
    ("kutyák", "kutya"),           # plural 'ák' -> a
    ("tollal", "tol"),             # instrumental: double ll + al, undouble
    ("vizekben", "viz"),           # case 'ben' + plural 'ek'
    ("házakat", "ház"),            # case 'at' + plural 'ak'
    ("házé", "ház"),               # owned 'é'
    ("emberek", "ember"),          # plural 'ek'
    ("könyvet", "könyv"),          # case 'et'
    ("gyerekeknek", "gyerek"),     # case 'nek' + plural 'ek'
    ("házaimban", "ház"),          # case 'ban' + plural-owner 'aim'
]
CATALAN = [
    ("nacionals", "nacion"),       # standard 'als' in R1
    ("portada", "port"),           # standard 'ada' in R2
    ("tecnològiques", "tecnologic"),  # 'iques' -> ic (R2) + cleaning
    ("lògica", "logic"),           # 'ica' misses R2 -> residual 'a'
    ("arribaven", "arrib"),        # verb 'aven' in R1
    ("cantàvem", "cant"),          # verb 'àvem' in R1
    ("vermella", "vermel"),        # attached pronoun 'la' strips first
    ("fàcilment", "facil"),        # 'ment' in R1 + cleaning
    ("construïm", "constru"),      # verb 'ïm'
    ("importància", "importanc"),  # 'ancia'... è-form + cleaning
]
TURKISH = [
    ("kitaplar", "kitap"),       # -lAr verb branch (early stop, no postlude)
    ("kitabı", "kitap"),         # yU strip + final-b devoice
    ("evlerinde", "ev"),         # nde chain
    ("okuldan", "okul"),         # DAn
    ("çocukları", "çocuk"),      # lArI
    ("güzelliğin", "güzellik"),  # nUn + final-ğ devoice
    ("evimizdeki", "ev"),        # possessive + ki-chain
    ("gözlerimden", "göz"),      # DAn + possessive + lAr
    ("arabalar", "araba"),
    ("ev", "ev"),                # < 2 vowels: unchanged
]
BASQUE = [
    ("liburuak", "liburu"),      # izenak 'ak'
    ("mendietan", "mendi"),      # izenak 'etan'
    ("lagunekin", "lagune"),     # izenak 'kin'
    ("egunero", "egun"),         # adjetiboak 'ero'
    ("etxeetatik", "etxeetat"),  # izenak 'ik'
    ("yarabera", "yarabera"),    # identity guard stops the repeat chain
]
IRISH = [
    ("bhfeirmeoirí", "feirmeoirí"),  # eclipsis bhf -> f
    ("d'fhoilsigh", "foilsigh"),     # d'fh -> f
    ("scoileanna", "scoileanna"),    # no region reaches: unchanged
    ("náisiúnta", "náisiúnta"),
]
ARMENIAN = [
    ("աշխատանքների", "աշխ"),      # ending + noun chains inside pV
    ("երեխաները", "երեխ"),
    ("քաղաքում", "քաղա"),
    ("գրադարանից", "գրադար"),
    ("ուսանողներին", "ուսանող"),
]
RUSSIAN = [
    ("книгами", "книг"),         # noun 'ами'
    ("красивый", "красив"),      # adjective 'ый'
    ("делать", "дела"),          # verb group-1 'ть' after 'а'
    ("программы", "программ"),   # noun 'ы'
    ("большое", "больш"),        # adjective 'ое'
    # this Lucene vintage does NOT fold ё->е (grouping table omits ё;
    # no analyzer prefilter): ё is a consonant, RV starts after 'а'
    ("ёлка", "ёлка"),
]


@pytest.mark.parametrize("fn,vectors", [
    (german_stem, GERMAN), (french_stem, FRENCH), (spanish_stem, SPANISH),
    (portuguese_stem, PORTUGUESE), (russian_stem, RUSSIAN),
    (italian_stem, ITALIAN), (dutch_stem, DUTCH), (swedish_stem, SWEDISH),
    (norwegian_stem, NORWEGIAN), (danish_stem, DANISH),
    (romanian_stem, ROMANIAN),
    (finnish_stem, FINNISH), (hungarian_stem, HUNGARIAN),
    (catalan_stem, CATALAN), (turkish_stem, TURKISH),
    (basque_stem, BASQUE), (irish_stem, IRISH),
    (armenian_stem, ARMENIAN),
])
def test_hand_traced_vectors(fn, vectors):
    for word, expected in vectors:
        assert fn(word) == expected, f"{fn.__name__}({word!r})"


def test_short_and_vowelless_words_survive():
    for fn in SNOWBALL_STEMMERS.values():
        for w in ("a", "xy", "", "zzz", "42"):
            assert isinstance(fn(w), str)


def test_vectorized_filter_matches_scalar():
    words = [w for w, _ in GERMAN] + ["merge", "table", "x"]
    cat = pd.Categorical(words + words)  # repeated occurrences
    out = snowball_filter_terms(cat, "german")
    exp = [german_stem(w) for w in words] * 2
    assert list(out.astype(str)) == exp
    arr = snowball_filter_terms(np.array(words, dtype=object), "german")
    assert list(arr) == [german_stem(w) for w in words]


def test_chain_stopwords_and_position_gaps():
    # 'die'/'und' are German stopwords: removed, but positions keep gaps
    f = tokenize_series(
        pd.Series(["die katzen und die häuser"]), analyzer="german"
    )
    assert list(f["term"].astype(str)) == ["katz", "haus"]
    assert list(f["pos"]) == [1, 4]
    # doc length = emitted token count (the BM25 norm semantics)
    assert list(f.attrs["doc_lengths"]) == [2]
    # English stop words are NOT removed by language analyzers
    f = tokenize_series(pd.Series(["the table"]), analyzer="german")
    assert list(f["term"].astype(str)) == ["the", "tabl"]


def test_chain_russian_cyrillic():
    f = tokenize_series(
        pd.Series(["и красивый книгами"]), analyzer="russian"
    )
    assert list(f["term"].astype(str)) == ["красив", "книг"]
    assert list(f["pos"]) == [1, 2]


def test_stop_lists_disjoint_from_corpus_vocab():
    # the injective-BM25 gate oracles assume the synthetic corpus vocab
    # never hits a language stop list; pin that here
    vocab = {
        "a", "agg", "batch", "big", "column", "customer", "data", "dup",
        "fast", "filter", "group", "hash", "join", "key", "line",
        "merge", "order", "part", "query", "row", "scan", "slow",
        "small", "sort", "spark", "stream", "table", "the", "value",
        "vector", "window",
    }
    # under the reference's verbatim lists (stopdata.py): only 'a' ever
    # collides — the es/pt/it/ca/hu article; notably the snowball French
    # and Romanian lists do NOT contain bare 'a' (only accented 'à')
    for lang in ("german", "russian", "dutch", "swedish", "norwegian",
                 "danish", "french", "romanian", "finnish", "turkish",
                 "basque", "armenian"):
        assert not (vocab & SNOWBALL_STOPWORDS[lang]), lang
    for lang in ("spanish", "portuguese", "italian", "catalan",
                 "hungarian", "irish"):
        assert (vocab & SNOWBALL_STOPWORDS[lang]) == {"a"}, lang


def test_injective_over_corpus_vocab():
    vocab = [
        "agg", "batch", "big", "column", "customer", "data", "dup",
        "fast", "filter", "group", "hash", "join", "key", "line",
        "merge", "order", "part", "query", "row", "scan", "slow",
        "small", "sort", "spark", "stream", "table", "the", "value",
        "vector", "window", "a", "merges",
    ]
    # per-language query word whose stem conflates with corpus 'merge'
    # (the *_stem_topk gate's query-side check); Italian keeps final s,
    # Dutch only strips s after a non-vowel, so those use other forms
    conflator = {"italian": "mergi", "dutch": "mergen",
                 "romanian": "mergi", "hungarian": "mergek"}
    for lang, stem in SNOWBALL_STEMMERS.items():
        kept = [t for t in vocab if t not in SNOWBALL_STOPWORDS[lang]
                and t != "merges"]
        stems = [stem(t) for t in kept]
        assert len(set(stems)) == len(stems), lang
        # Russian is Cyrillic-only; Finnish/Turkish/Irish strip no bare
        # final 'e'/'es' and Basque over-strips it (all four use
        # VALUES-based gates, not stem_topk)
        if lang not in ("russian", "finnish", "turkish", "basque",
                        "irish", "armenian"):
            q = conflator.get(lang, "merges")
            assert stem(q) == stem("merge") == "merg", lang


def test_turkish_apostrophe_and_dotless_i():
    # ApostropheFilter truncates at ' or U+2019 before stemming
    assert turkish_term_filter("türkiye'nin") == "türki"
    assert turkish_term_filter("ankara’dan") == "ankar"
    # TurkishLowerCaseFilter runs upstream in tokenize_series: İ->i, I->ı
    f = tokenize_series(pd.Series(["İstanbul KITAP okuldan"]),
                        analyzer="turkish")
    terms = list(f["term"].astype(str))
    assert terms[0].startswith("i")          # İ -> i, not i+combining dot
    assert "kıtap" in terms                  # I -> ı under Turkish casing
    assert "okul" in terms                   # chain reaches the stemmer


def test_german_marking_u_y_between_vowels():
    # u between vowels is consonant-marked: 'bauen': a-u-e -> u marked,
    # so R1 starts after the marked consonant; 'en' still strips
    assert german_stem("bauen") == "bau"


def test_french_qu_marking():
    # u after q is never a vowel: 'risquer' -> 2b 'er' -> 'risqu'
    assert french_stem("risquer") == "risqu"
