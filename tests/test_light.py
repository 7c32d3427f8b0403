"""Light (non-Snowball) language packs: normalizer/stemmer vectors
traced from the reference rule cascades, vectorized-filter equivalence,
and the analyzer chain."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.analysis import tokenize_series
from lucene_solr_spark.analysis.greek import greek_lower, greek_stem
from lucene_solr_spark.analysis.light import (
    LIGHT_STEMMERS,
    LIGHT_STOPWORDS,
    arabic_normalize,
    arabic_stem,
    bulgarian_stem,
    czech_stem,
    hindi_stem,
    indonesian_stem,
    latvian_stem,
    light_filter_terms,
    persian_normalize,
)

ARABIC = [
    ("الكتاب", "كتاب"),      # definite article al-
    ("كتابها", "كتاب"),      # suffix -ha
    ("المسلمون", "مسلم"),    # al- + -uwn
    ("مَدْرَسَة", "مدرس"),   # harakat stripped, teh marbuta -> heh -> stripped
    ("والكتاب", "كتاب"),     # wal- prefix
]
CZECH = [
    ("hradech", "hrad"),      # -ech
    ("stromy", "strom"),      # final vowel
    ("zeleného", "zeln"),     # -ého then e* > * collapse
    ("matkách", "matk"),      # -ách
    ("divadle", "divadl"),    # final -e
    ("otcův", "otcov"),       # too short for -ův possessive; ů -> o
]
BULGARIAN = [
    ("градът", "град"),       # article -ът
    ("книгите", "книг"),      # article -те + plural -и
    ("хубава", "хубав"),      # final vowel
]
HINDI = [
    ("लड़के", "लडक"),          # nukta fold + final matra
    ("करता", "कर"),           # -ता
]
INDONESIAN = [
    ("membaca", "baca"),      # mem- prefix
    ("penyelesaian", "selesai"),  # peny+V -> s..., then -an
    ("kebijakan", "bijak"),   # ke- ... -kan? (ke blocks -kan; -an fires)
    ("bukunya", "buku"),      # possessive -nya
    ("berlari", "lari"),      # ber- (blocks -i)
    ("memberikan", "beri"),   # mem- + -kan
]
LATVIAN = [
    ("cilvēkiem", "cilvēk"),  # -iem (palatalizing, nothing to fix)
    ("valodas", "valod"),     # -as
    ("galdiņš", "galdiņ"),    # -š (vc 0, no palatalization)
]
GREEK = [
    ("λόγος", "λογ"),          # rule21 -οσ (after tonos fold)
    ("βιβλία", "βιβλ"),        # rule5 -ια, consonant stem
    ("ελληνικά", "ελλην"),     # rule6 -ικα
    ("γεγονότα", "γεγον"),     # rule0 ladder
    ("ομορφότερος", "ομορφ"),  # rule21 -οσ + rule22 -οτερ
    ("θάλασσες", "θαλασσ"),    # rule21 -εσ
]


@pytest.mark.parametrize("fn,vectors", [
    (arabic_stem, ARABIC), (czech_stem, CZECH),
    (bulgarian_stem, BULGARIAN), (hindi_stem, HINDI),
    (indonesian_stem, INDONESIAN), (latvian_stem, LATVIAN),
    (greek_stem, GREEK),
])
def test_hand_traced_vectors(fn, vectors):
    for word, expected in vectors:
        assert fn(word) == expected, f"{fn.__name__}({word!r})"


def test_greek_lowercase_filter():
    """GreekLowerCaseFilter profile: final sigma -> sigma, tonos and
    dialytika stripped to the base vowel."""
    assert greek_lower("πόλης") == "πολησ"
    assert greek_lower("ϊΐϋΰ") == "ιιυυ"


def test_persian_normalizer():
    # farsi yeh / keheh fold to arabic yeh / kaf
    assert persian_normalize("می") == "مي"
    assert persian_normalize("ک") == "ك"
    # composes the arabic normalizer (alef forms, harakat)
    assert persian_normalize("أَب") == "اب"


def test_arabic_normalizer():
    assert arabic_normalize("إمّا") == "اما"
    assert arabic_normalize("مكتبةى") == "مكتبهي"


def test_short_words_survive():
    for fn in LIGHT_STEMMERS.values():
        for w in ("a", "ab", "", "xyz", "42"):
            assert isinstance(fn(w), str)


def test_vectorized_filter_matches_scalar():
    words = [w for w, _ in INDONESIAN] + ["table", "x"]
    cat = pd.Categorical(words + words)
    out = light_filter_terms(cat, "indonesian")
    exp = [indonesian_stem(w) for w in words] * 2
    assert list(out.astype(str)) == exp
    arr = light_filter_terms(np.array(words, dtype=object), "indonesian")
    assert list(arr) == [indonesian_stem(w) for w in words]


def test_chain_stopwords_and_gaps():
    f = tokenize_series(
        pd.Series(["yang membaca dan bukunya"]), analyzer="indonesian"
    )
    assert list(f["term"].astype(str)) == ["baca", "buku"]
    assert list(f["pos"]) == [1, 3]  # 'yang'/'dan' stopped, gaps kept


def test_chain_arabic():
    # harakat glue to the token (WB4), then the normalizer strips them
    f = tokenize_series(pd.Series(["في الكتاب"]), analyzer="arabic")
    assert list(f["term"].astype(str)) == ["كتاب"]
    assert list(f["pos"]) == [1]  # 'في' stopped


def test_stop_lists_disjoint_from_corpus_vocab():
    vocab = {
        "a", "agg", "batch", "big", "column", "customer", "data", "dup",
        "fast", "filter", "group", "hash", "join", "key", "line",
        "merge", "order", "part", "query", "row", "scan", "slow",
        "small", "sort", "spark", "stream", "table", "the", "value",
        "vector", "window",
    }
    # under the reference's verbatim lists (stopdata.py): only 'a' ever
    # collides — the Czech conjunction / the es/pt/it/gl/hu article; the
    # reference French list has no bare 'a' (only accented 'à')
    for lang, stops in LIGHT_STOPWORDS.items():
        if lang in ("czech", "brazilian", "galician",
                    "spanish_light", "portuguese_light", "italian_light",
                    "portuguese_rslp", "portuguese_minimal",
                    "galician_minimal", "hungarian_light"):
            assert (vocab & stops) == {"a"}, lang
        else:
            assert not (vocab & stops), lang


def test_german_normalization_filter_state_machine():
    # GermanNormalizationFilter: ae/oe/ue digraphs fold the e; 'que'
    # is protected by the q state; umlauts fold; ss for sharp-s
    from lucene_solr_spark.analysis.light import german_normalize

    assert german_normalize("aepfel") == "apfel"
    assert german_normalize("gruen") == "grun"
    assert german_normalize("quelle") == "quelle"
    assert german_normalize("weiß") == "weiss"
    assert german_normalize("häuser") == "hauser"


def test_light_variant_analyzers_through_chain():
    import pandas as pd

    from lucene_solr_spark.analysis import tokenize_series

    f = tokenize_series(pd.Series(["die häuser und freundlichen"]),
                        analyzer="german_light")
    assert list(f["term"].astype(str)) == ["haus", "freundlich"]
    f = tokenize_series(pd.Series(["la chanteuse nationaux"]),
                        analyzer="french_light")
    assert list(f["term"].astype(str)) == ["chant", "national"]
