"""Porter stemmer fidelity + english analyzer end-to-end (registry,
conflation, manifest persistence, NRT inheritance)."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.analysis.stem import english_filter_terms, porter_stem
from tests.conftest import CACHE

# classic examples from the published algorithm description
# (M.F. Porter 1980, steps 1-5)
PORTER_CASES = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file", "happy": "happi",
    "sky": "sky", "relational": "relat", "conditional": "condit",
    "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "controll": "control", "roll": "roll",
    "merging": "merg", "merged": "merg", "merges": "merg", "merge": "merg",
    "query": "queri", "key": "kei",
}


def test_porter_classic_vocabulary():
    fails = {w: (porter_stem(w), e) for w, e in PORTER_CASES.items()
             if porter_stem(w) != e}
    assert not fails, fails


def test_english_filter_conflates_categorical():
    terms = pd.Categorical(
        ["merging", "merged", "merge", "spark", "merges", "spark's"]
    )
    out = english_filter_terms(terms)
    assert list(out) == ["merg", "merg", "merg", "spark", "merg", "spark"]
    # dictionary actually conflated (codes remapped, not just renamed)
    assert set(out.categories) == {"merg", "spark"}


def test_analyze_one_english():
    from lucene_solr_spark.analysis import analyze_one

    toks = analyze_one("The engines are merging quickly", analyzer="english")
    assert [t for t, _ in toks] == ["engin", "merg", "quickli"]
    # position gaps preserved: stop words 'the' (0) and 'are' (2) consume
    # their position increments before stemming
    assert [p for _, p in toks] == [1, 3, 4]


def test_unknown_analyzer_rejected():
    from lucene_solr_spark.analysis import tokenize_series

    with pytest.raises(ValueError):
        tokenize_series(pd.Series(["x"]), analyzer="klingon")


@pytest.fixture(scope="module")
def inflected_corpus():
    rng = np.random.default_rng(17)
    forms = ["merge", "merging", "merged", "merges"]
    fillers = ["spark", "index", "data", "query", "table", "scan"]
    rows = []
    for i in range(300):
        words = list(rng.choice(fillers, rng.integers(5, 15)))
        if i % 3 != 0:
            words.insert(
                int(rng.integers(0, len(words))), forms[int(i % 4)]
            )
        rows.append({"url": f"{i:06d}", "text": " ".join(words)})
    return pd.DataFrame(rows)


def test_english_index_end_to_end(spark, inflected_corpus):
    """Any inflected query form matches ALL inflected doc forms; engine is
    rank- and float32-score-identical to the english-analyzer oracle."""
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.oracle import OracleSearcher
    from lucene_solr_spark.search.engine import SparkSearcher

    idx = os.path.join(CACHE, "idx_english")
    shutil.rmtree(idx, ignore_errors=True)
    man = build_index(
        spark, spark.createDataFrame(inflected_corpus), idx,
        num_segments=3, build_id="en", analyzer="english",
    )
    assert man["analyzer"] == "english"
    s = SparkSearcher(spark, idx)
    assert s.analyzer == "english"
    oracle = OracleSearcher(inflected_corpus, analyzer="english")

    n_docs_with_form = sum(
        1 for t in inflected_corpus["text"]
        if any(f in t.split() for f in ["merge", "merging", "merged", "merges"])
    )
    for q in ["merge", "merging", "merged"]:
        assert s.count(q) == n_docs_with_form, q
        res = s.search_pdf(q, k=10)
        exp = oracle.search(q, 10, "OR")
        np.testing.assert_array_equal(res["docid"].to_numpy(), exp["docid"].to_numpy())
        np.testing.assert_array_equal(
            res["score"].to_numpy(np.float32), exp["score"].to_numpy(np.float32)
        )
    # a standard-analyzer searcher over the same corpus does NOT conflate
    idx2 = os.path.join(CACHE, "idx_standard_ctrl")
    shutil.rmtree(idx2, ignore_errors=True)
    build_index(spark, spark.createDataFrame(inflected_corpus), idx2,
                num_segments=3, build_id="std")
    s2 = SparkSearcher(spark, idx2)
    assert s2.count("merging") < n_docs_with_form


def test_nrt_append_inherits_analyzer(spark, inflected_corpus):
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.search.engine import SparkSearcher
    from lucene_solr_spark.streaming.incremental import append_batch

    idx = os.path.join(CACHE, "idx_english_nrt")
    shutil.rmtree(idx, ignore_errors=True)
    build_index(spark, spark.createDataFrame(inflected_corpus.iloc[:200]), idx,
                num_segments=2, build_id="en0", analyzer="english")
    batch = inflected_corpus.iloc[200:].copy()
    man = append_batch(spark, spark.createDataFrame(batch), idx, 1)
    assert man.get("analyzer") == "english"
    s = SparkSearcher(spark, idx)
    # stemmed matching works across base + appended docs
    assert s.count("merging") == sum(
        1 for t in inflected_corpus["text"]
        if any(f in t.split() for f in ["merge", "merging", "merged", "merges"])
    )


def test_minimal_english_stem_published_rules():
    """Harman-1991 S-stemmer rules (EnglishMinimalStemFilter)."""
    from lucene_solr_spark.analysis.stem import minimal_english_stem as m

    assert m("ponies") == "pony"
    assert m("ties") == "ty"
    assert m("eies") == "eies" and m("aies") == "aies"
    assert m("ies") == "ies"  # too short for the -ies rewrite
    assert m("tables") == "table"
    assert m("goes") == "goes" and m("trees") == "trees" and m("aes") == "aes"
    assert m("sees") == "sees" and m("dues") == "due" and m("dyes") == "dye"
    assert m("cats") == "cat"
    assert m("focus") == "focus" and m("glass") == "glass"
    assert m("glasses") == "glasse"  # consonant before -es: drop the s
    assert m("is") == "is" and m("as") == "as"  # < 3 chars pass
    assert m("dog") == "dog"


def test_english_minimal_analyzer_conflates():
    import pandas as pd

    from lucene_solr_spark.analysis import tokenize_series

    flat = tokenize_series(
        pd.Series(["cat cats pony ponies"]), analyzer="english_minimal"
    )
    assert flat["term"].tolist() == ["cat", "cat", "pony", "pony"]
