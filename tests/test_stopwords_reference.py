"""Per-language stop-set fidelity: the sets in analysis/stopdata.py must
equal the reference's own resource files, parsed with the reference's
loader semantics (WordlistLoader.getSnowballWordSet for snowball/*_stop.txt,
getWordSet(reader, "#") for */stopwords.txt) — VERDICT-r4 item 1.

Also pins the chain POSITION facts the late-stop path depends on
(analysis/chain.py): the Persian/Greek lists are stored in their
post-normalization form, so stopping must happen after that stage.
"""
from __future__ import annotations

import os

import pytest

from lucene_solr_spark.analysis.stopdata import REFERENCE_STOPWORDS

import tools.gen_stopwords as gen

REF_RES = gen.RES

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_RES),
    reason="reference resource tree not available",
)


@pytest.mark.parametrize("name", sorted(gen.SOURCES))
def test_stop_set_matches_reference(name):
    rel, fmt = gen.SOURCES[name]
    text = (REF_RES / rel).read_text(encoding="utf-8")
    parsed = (
        gen.parse_snowball(text) if fmt == "snowball" else gen.parse_hash(text)
    )
    assert REFERENCE_STOPWORDS[name] == parsed, name


def test_analyzer_registries_use_reference_sets():
    from lucene_solr_spark.analysis.light import LIGHT_STOPWORDS
    from lucene_solr_spark.analysis.snowball import SNOWBALL_STOPWORDS
    from lucene_solr_spark.analysis.text import CJK_STOP_WORDS

    for lang, stops in SNOWBALL_STOPWORDS.items():
        assert stops == REFERENCE_STOPWORDS[lang], lang
    base_of = {
        "german_light": "german", "german_minimal": "german",
        "french_light": "french", "french_minimal": "french",
        "spanish_light": "spanish",
        "portuguese_light": "portuguese",
        "portuguese_rslp": "portuguese",
        "portuguese_minimal": "portuguese",
        "italian_light": "italian",
        "swedish_light": "swedish",
        "norwegian_light": "norwegian", "norwegian_minimal": "norwegian",
        "russian_light": "russian",
        "hungarian_light": "hungarian",
        "finnish_light": "finnish",
        "galician_minimal": "galician",
    }
    for lang, stops in LIGHT_STOPWORDS.items():
        assert stops == REFERENCE_STOPWORDS[base_of.get(lang, lang)], lang
    assert CJK_STOP_WORDS == REFERENCE_STOPWORDS["cjk"]
    # the reference CJK list omits 'an' (cjk/stopwords.txt)
    assert "an" not in CJK_STOP_WORDS


def test_persian_list_is_post_normalization_form():
    # fa/stopwords.txt:4 — entries use arabic yeh 'ي', so the stop check
    # must run AFTER PersianNormalization (farsi yeh -> arabic yeh)
    from lucene_solr_spark.analysis.light import persian_normalize

    fa = REFERENCE_STOPWORDS["persian"]
    assert all(persian_normalize(w) == w for w in fa)


def test_greek_list_is_post_fold_form():
    # el/stopwords.txt:3 — 'σ' never final-sigma 'ς'; entries are the
    # GreekLowerCaseFilter output form
    from lucene_solr_spark.analysis.greek import greek_lower

    el = REFERENCE_STOPWORDS["greek"]
    assert all(greek_lower(w) == w for w in el)


def test_stop_gap_positions_late_chain():
    # position-increment gaps survive the late-stop path: French
    # "le chat et chien" -> 'et'/'le' stopped AFTER elision stage,
    # positions keep their pre-stop indices
    from lucene_solr_spark.analysis import analyze_one

    toks = analyze_one("le chat et chien", analyzer="french")
    assert toks == [("chat", 1), ("chien", 3)]


def test_elision_strips_articles_only():
    from lucene_solr_spark.analysis import analyze_one

    # l' is an article -> stripped; 'aujourd'hui' keeps its apostrophe
    # (prefix 'aujourd' is not an article)
    toks = analyze_one("l'homme aujourd'hui", analyzer="french")
    assert toks[0][0] == "homm"
    assert toks[1][0].startswith("aujourd'")
