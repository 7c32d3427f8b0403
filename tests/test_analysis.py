import numpy as np
import pandas as pd

from lucene_solr_spark.analysis import (
    ENGLISH_STOP_WORDS,
    analyze_one,
    html_strip_series,
    tokenize_series,
)
from lucene_solr_spark.corpus import generate_pages


def test_stopword_list_is_the_reference_33():
    # core/StopAnalyzer.java:42-47
    assert len(ENGLISH_STOP_WORDS) == 33
    assert {"a", "the", "with", "such", "their"} <= ENGLISH_STOP_WORDS


def test_position_gaps():
    toks = analyze_one("the quick fox is at home")
    # positions: the=0 quick=1 fox=2 is=3 at=4 home=5; stopwords dropped, gaps kept
    assert toks == [("quick", 1), ("fox", 2), ("home", 5)]


def test_uax29_word_shapes():
    toks = [t for t, _ in analyze_one("AUDI A4 3.14 example.com can't wi-fi 1,000 x_y")]
    assert toks == ["audi", "a4", "3.14", "example.com", "can't", "wi", "fi", "1,000", "x_y"]


def test_uax29_mid_joiner_class_constraints():
    """Per-class UAX#29 mid-token rules (WB6/7, WB11/12): MidNumLet and
    Single_Quote (. ' ’) join letter.letter or digit.digit; MidLetter (:)
    joins letters only; MidNum (,) joins digits only; '_' (ExtendNumLet)
    glues inside runs but is never a joiner neighbor
    (standard/StandardTokenizerImpl.java word-break grammar)."""
    from lucene_solr_spark.analysis.text import _TOKEN_RE

    cases = {
        "3.14": ["3.14"], "example.com": ["example.com"], "can't": ["can't"],
        "1,000,000": ["1,000,000"], "a:b:c": ["a:b:c"], "1'2": ["1'2"],
        # cross-class splits the pre-r4 approximation got wrong:
        "1:30": ["1", "30"], "a,b": ["a", "b"], "a.4": ["a", "4"],
        "4.a": ["4", "a"], "a'1": ["a", "1"], "ab1.2cd": ["ab1.2cd"],
        # underscore: in-run glue, never a joiner neighbor
        "foo_bar": ["foo_bar"], "_a.b_": ["_a.b_"], "a_._b": ["a_", "_b"],
        "a_.b": ["a_", "b"],
    }
    for src, want in cases.items():
        assert _TOKEN_RE.findall(src) == want, src


def test_arrow_path_matches_regex_on_class_constraints():
    """Arrow fast path must stay byte-identical to the regex under the
    per-class joiner rules, including unicode letters and combining
    marks (which route through the _ARROW_SUSPECT resplit)."""
    from lucene_solr_spark.analysis.text import _tokenize_arrow, _tokenize_regex

    rng = np.random.default_rng(7)
    chars = list("ab .,:'x19_é:’") + ["́", "‍", "‌"]
    docs = ["".join(rng.choice(chars, rng.integers(0, 80))) for _ in range(1500)]
    docs += ["á.b", "é,1", "x̀:y", "café 1:30 a,b 3.14", "a‍b c‌.d", "‍ ́"]
    s = pd.Series(docs)
    fa = _tokenize_arrow(s, check_cjk=False)
    fr = _tokenize_regex(s)
    assert list(fa[1]) == list(fr[1])
    np.testing.assert_array_equal(np.asarray(fa[0]), np.asarray(fr[0]))
    np.testing.assert_array_equal(np.asarray(fa[2]), np.asarray(fr[2]))
    np.testing.assert_array_equal(np.asarray(fa[3]), np.asarray(fr[3]))


def test_cjk_per_char():
    toks = [t for t, _ in analyze_one("index 中文网 docs")]
    assert toks == ["index", "中", "文", "网", "docs"]


def test_katakana_runs_hiragana_han_per_char():
    """JFlex emits {KatakanaEx}+ as one token (WB13) but Han/Hiragana one
    per character (StandardTokenizerImpl.jflex:135,190-191), including the
    prolonged-sound mark U+30FC and halfwidth forms."""
    assert [t for t, _ in analyze_one("テーブル")] == ["テーブル"]
    assert [t for t, _ in analyze_one("あいう")] == ["あ", "い", "う"]
    assert [t for t, _ in analyze_one("アイウあ漢カナ")] == [
        "アイウ", "あ", "漢", "カナ"]
    assert [t for t, _ in analyze_one("ｶﾞｷﾞ")] == ["ｶﾞｷﾞ"]
    assert [t for t, _ in analyze_one("パーティー化")] == ["パーティー", "化"]


def test_cjk_bigram_analyzer():
    """CJKAnalyzer profile (cjk/CJKBigramFilter.java:48): contiguous
    CJK/Hangul chars emit overlapping character bigrams; isolated chars
    stay unigrams; no bigram across a delimiter."""
    f = tokenize_series(pd.Series(["index 中文网 docs"]), analyzer="cjk")
    assert list(zip(f["pos"], f["term"].astype(str))) == [
        (0, "index"), (1, "中文"), (2, "文网"), (3, "docs")]
    f = tokenize_series(pd.Series(["テーブル 化 한글"]), analyzer="cjk")
    assert list(f["term"].astype(str)) == ["テー", "ーブ", "ブル", "化", "한글"]
    # a space between CJK chars is a real break: no bigram across it
    f = tokenize_series(pd.Series(["中 文"]), analyzer="cjk")
    assert list(f["term"].astype(str)) == ["中", "文"]


def test_cjk_stopset_matches_reference():
    """CJKAnalyzer's default stop set is the classic English set PLUS
    s/t/www (analysis/cjk/stopwords.txt) — 'www' must not be indexed."""
    f = tokenize_series(pd.Series(["www 中文 site s t the"]), analyzer="cjk")
    terms = list(f["term"].astype(str))
    assert terms == ["中文", "site"]
    # the stop removals leave position gaps
    assert list(f["pos"]) == [1, 2]


def test_cjk_halfwidth_hangul_and_jamo_extended_bigram():
    """Halfwidth Hangul (U+FFA0-FFDC) and Jamo Extended-A/B are HANGUL
    script to the reference's CJKBigramFilter; they must bigram too and
    divert off the Arrow word path."""
    f = tokenize_series(pd.Series(["ﾡﾢﾣ"]), analyzer="cjk")
    assert list(f["term"].astype(str)) == ["ﾡﾢ", "ﾢﾣ"]
    f = tokenize_series(pd.Series(["ힱힲ"]), analyzer="cjk")  # Jamo Ext-B
    assert list(f["term"].astype(str)) == ["ힱힲ"]


def test_common_grams_analyzer():
    """CommonGramsFilter (commongrams/CommonGramsFilter.java:52): stop
    words stay as unigrams AND seed w1_w2 grams at the first word's
    position (posIncrement 0)."""
    f = tokenize_series(
        pd.Series(["the quick brown fox is fast"]), analyzer="common_grams"
    )
    rows = list(zip(f["pos"], f["term"].astype(str)))
    assert rows == [
        (0, "the"), (0, "the_quick"), (1, "quick"), (2, "brown"),
        (3, "fox"), (3, "fox_is"), (4, "is"), (4, "is_fast"), (5, "fast")]
    # grams ride posInc 0: discountOverlaps norm counts the 6 unigrams
    assert list(f.attrs["doc_lengths"]) == [6]


def test_wb4_mark_and_format_gluing():
    """UAX#29 WB4: Extend (combining marks) and Format (ZWJ/ZWNJ) glue to
    the preceding base char (the JFlex Ex-suffixed classes) instead of
    breaking the token; they also glue across mid-token joiners."""
    import pytest

    from lucene_solr_spark.analysis.text import _HAS_REGEX, _TOKEN_RE

    if not _HAS_REGEX:
        pytest.skip("regex module unavailable; marks break tokens")
    assert _TOKEN_RE.findall("café") == ["café"]
    assert _TOKEN_RE.findall("a‍b") == ["a‍b"]  # ZWJ
    assert _TOKEN_RE.findall("x́.y") == ["x́.y"]
    assert _TOKEN_RE.findall("1́,2") == ["1́,2"]
    # a mark after a non-token char attaches to nothing emittable
    assert _TOKEN_RE.findall(" ́ab") == ["ab"]


def test_url_email_tokenizer():
    """UAX29URLEmailTokenizer subset: scheme URLs and emails are single
    tokens (standard/UAX29URLEmailTokenizerImpl.jflex:84-148); stop
    words between them still take a position; marker-free docs are
    byte-identical to the standard tokenizer."""
    f = tokenize_series(
        pd.Series([
            "contact Bob.Smith@Example.com now",
            "read https://spark.apache.org/docs?x=1#top and more",
            "user@[127.0.0.1] bracket hosts unsupported",
        ]),
        analyzer="url_email",
    )
    rows = list(zip(f["doc_idx"], f["pos"], f["term"].astype(str)))
    assert (0, 1, "bob.smith@example.com") in rows
    assert (1, 1, "https://spark.apache.org/docs?x=1#top") in rows
    assert (1, 3, "more") in rows  # 'and' stopped, position hole kept
    # bracketed hosts are outside the documented subset -> word tokens
    assert (2, 0, "user") in rows and (2, 1, "127.0.0.1") in rows

    plain = pd.Series(["just words 3.14 can't", "x_y foo"])
    a = tokenize_series(plain, analyzer="url_email")
    b = tokenize_series(plain, analyzer="standard")
    assert list(a["term"].astype(str)) == list(b["term"].astype(str))
    assert list(a["pos"]) == list(b["pos"])

    # over-long URLs are dropped but take a position (maxTokenLength)
    long_url = "http://x.co/" + "a" * 300
    f = tokenize_series(pd.Series([f"pre {long_url} post"]),
                        analyzer="url_email")
    assert list(zip(f["pos"], f["term"].astype(str))) == [
        (0, "pre"), (2, "post")]


def test_max_token_length_dropped_but_takes_position():
    long = "x" * 256
    toks = analyze_one(f"alpha {long} beta")
    assert toks == [("alpha", 0), ("beta", 2)]


def test_doc_lengths_count_emitted_tokens():
    flat = tokenize_series(pd.Series(["the quick fox", "", "a an and"]))
    assert list(flat.attrs["doc_lengths"]) == [2, 0, 0]


def test_html_strip_invariant_on_corpus():
    pdf = generate_pages(300, seed=7)
    ext = html_strip_series(pdf["html"])
    assert (ext == pdf["text"]).all()


def test_corpus_deterministic():
    a = generate_pages(100, seed=11)
    b = generate_pages(100, seed=11)
    assert a.equals(b)
    c = generate_pages(100, seed=12)
    assert not c["text"].equals(a["text"])


def test_ascii_folding_filter():
    """ASCIIFoldingFilter profile: diacritics stripped, ligature folds,
    non-Latin passthrough (miscellaneous/ASCIIFoldingFilter.java)."""
    from lucene_solr_spark.analysis.fold import ascii_fold

    cases = {
        "café": "cafe", "naïve": "naive", "sœur": "soeur", "straße": "strasse",
        "łódź": "lodz", "ångström": "angstrom", "señor": "senor",
        "þorn": "thorn", "øre": "ore", "ascii": "ascii", "русский": "русский",
    }
    for src, want in cases.items():
        assert ascii_fold(src) == want, src


def test_folding_analyzer_chain():
    import pandas as pd

    from lucene_solr_spark.analysis import tokenize_series

    flat = tokenize_series(
        pd.Series(["Café au láit", "the sœur ßigma"]), analyzer="folding"
    )
    by_doc = flat.groupby("doc_idx")["term"].agg(list).to_dict()
    assert by_doc[0] == ["cafe", "au", "lait"]
    assert by_doc[1] == ["soeur", "ssigma"]  # 'the' stopped pre-fold
    # position gap preserved for the stopped token
    assert flat[flat["doc_idx"] == 1]["pos"].tolist() == [1, 2]


def test_folding_conflates_with_plain_terms():
    """Folded terms must share dictionary entries with their plain twins
    (Categorical codes remapped on collision)."""
    import pandas as pd

    from lucene_solr_spark.analysis import tokenize_series

    flat = tokenize_series(pd.Series(["cafe café"]), analyzer="folding")
    assert flat["term"].tolist() == ["cafe", "cafe"]


def test_arrow_path_matches_regex_on_joiner_runs():
    """The documented multi-joiner divergence is closed: tokens with >=2
    consecutive joiners ('a..b') re-split through the reference regex, so
    the Arrow fast path is byte-identical to the regex path."""
    import numpy as np
    import pandas as pd

    from lucene_solr_spark.analysis.text import _tokenize_arrow, _tokenize_regex

    cases = pd.Series([
        "a..b normal c.d joined",
        "x...y , ..z.. '' a.'b",
        "dots.. at,, edges ..lead",
        "the a..the stopword..case",
        "3.14 example.com can't a..b..c",
    ])
    fa = _tokenize_arrow(cases, check_cjk=False)
    fr = _tokenize_regex(cases)
    assert list(fa[1]) == list(fr[1])
    np.testing.assert_array_equal(np.asarray(fa[0]), np.asarray(fr[0]))
    np.testing.assert_array_equal(np.asarray(fa[2]), np.asarray(fr[2]))
    np.testing.assert_array_equal(np.asarray(fa[3]), np.asarray(fr[3]))

    rng = np.random.default_rng(3)
    chars = list("ab .,:'x1")
    docs = ["".join(rng.choice(chars, rng.integers(0, 60))) for _ in range(500)]
    s = pd.Series(docs)
    fa = _tokenize_arrow(s, check_cjk=False)
    fr = _tokenize_regex(s)
    assert list(fa[1]) == list(fr[1])
    np.testing.assert_array_equal(np.asarray(fa[0]), np.asarray(fr[0]))
    np.testing.assert_array_equal(np.asarray(fa[2]), np.asarray(fr[2]))


def test_urlemail_bulk_equals_perdoc():
    """The vectorized url_email path (one split-scan + Arrow tokenize +
    dictionary splice) must be byte-identical to the per-doc reference
    path — terms, positions, doc order and norm lengths (VERDICT-r4
    'What's wrong' #3)."""
    import random
    import string

    from lucene_solr_spark.analysis.text import (
        ENGLISH_STOP_WORDS,
        _tokenize_urlemail,
        _tokenize_urlemail_bulk,
    )

    rng = random.Random(42)

    def rword():
        return "".join(
            rng.choice(string.ascii_lowercase)
            for _ in range(rng.randint(1, 8))
        )

    def rurl():
        return rng.choice([
            f"http://{rword()}.com/{rword()}?a={rword()}&b=1",
            f"https://{rword()}.{rword()}.org/{rword()}#frag",
            f"ftp://{rword()}.net/{rword()}",
            f"{rword()}@{rword()}.com",
            f"{rword()}.{rword()}@{rword()}.{rword()}.co.uk",
            "http://" + "x" * 300 + ".com",  # > MAX_TOKEN_LENGTH
        ])

    docs = []
    for _ in range(250):
        parts = []
        for _ in range(rng.randint(1, 10)):
            r = rng.random()
            if r < 0.35:
                parts.append(rurl())
            elif r < 0.5:
                parts.append(rng.choice(["the", "and", "of", "to"]))
            else:
                parts.append(rword() + rng.choice(["", ",", ".", ")"]))
        line = " ".join(parts)
        docs.append(line.upper() if rng.random() < 0.1 else line)
    docs += ["no urls here at all", "", "x@y.com", "http://a.b/c"]
    s = pd.Series(docs)
    a = _tokenize_urlemail(s.str.lower(), ENGLISH_STOP_WORDS)
    b = _tokenize_urlemail_bulk(s, ENGLISH_STOP_WORDS)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert list(np.asarray(a[1]).astype(str)) == list(
        np.asarray(b[1]).astype(str))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(b[3]))


def test_thai_analyzer_matches_compiled_reference():
    """ThaiAnalyzer chain (th/ThaiAnalyzer.java: ThaiTokenizer ->
    LowerCase -> Stop(th/stopwords.txt)): expectations are the verbatim
    output of the compiled reference ThaiAnalyzer over these lines
    (ChainMain harness). General-text parity is NOT claimed — the JDK
    BreakIterator dictionary differs from analysis/thai.py's curated
    longest-match lexicon (documented there)."""
    cases = {
        "การที่ได้ต้องแสดงว่างานดี": [("แสดง", 4), ("งาน", 6), ("ดี", 7)],
        "ภาษาไทยเป็นภาษาที่สวยงาม": [
            ("ภาษา", 0), ("ไทย", 1), ("ภาษา", 3), ("สวย", 5), ("งาม", 6)],
        "Apache Lucene กับภาษาไทย": [
            ("apache", 0), ("lucene", 1), ("ภาษา", 3), ("ไทย", 4)],
    }
    for line, exp in cases.items():
        assert analyze_one(line, analyzer="thai") == exp, line


def test_thai_stop_words_segment_out():
    # every th stop word must be segmentable or it could never be
    # removed by the stop filter
    from lucene_solr_spark.analysis.stopdata import REFERENCE_STOPWORDS
    from lucene_solr_spark.analysis.thai import thai_segment

    for w in REFERENCE_STOPWORDS["thai"]:
        assert w in thai_segment(w), w


def test_uax29_full_class_tail():
    """r5 tail closure — every expectation is the verbatim output of the
    compiled reference StandardAnalyzer (ChainMain harness): Hebrew
    WB7a/b/c quotes, geresh-as-ALetter, full MidLetter/MidNum sets,
    Nd/Nl/No distinctions, SEA script runs, underscore-only shapes."""
    from lucene_solr_spark.analysis.text import (
        ENGLISH_STOP_WORDS,
        _findall_tokens,
    )

    cases = {
        "א\"ב": ['א"ב'],          # WB7b/c joins
        "א\"b": ["א", "b"],       # only between Hebrew letters
        "ששש'": ["ששש'"],         # WB7a trailing quote kept
        "׳׳'א'": ["׳׳'א"],        # א consumed by WB6 join: quote drops
        "שש'ש'": ["שש'ש'"],       # re-segmentation keeps both quotes
        "ג'1_": ["ג'1_"],         # HL-quote segment chains onward
        "ש׳ש ׳׳2": ["ש׳ש", "׳׳2"],  # geresh is ALetter
        "12;34 ab;cd": ["12;34", "ab", "cd"],   # ';' MidNum
        "a·b 1·2": ["a·b", "1", "2"],           # '·' MidLetter
        "a‧b": ["a‧b"],                          # '‧' MidLetter
        "กกก abc": ["กกก", "abc"],               # SEA run = one token
        "ก๑ก": ["ก", "๑", "ก"],   # Thai digit is Numeric, splits the run
        "ภาษาไทย": ["ภาษาไทย"],
        "__ _a a_": ["_a", "a_"],  # underscore-only: no token
        "①① a①b": ["a", "b"],      # No chars are not token chars
        "Ⅻ.2": ["ⅻ", "2"],        # Nl is a letter, not a digit context
        "a2’Ⅻ": ["a2", "ⅻ"],
    }
    for src, want in cases.items():
        assert _findall_tokens(src.lower()) == want, src
        # the full pipeline (Arrow gate + suspect resplit) must agree
        got = [t for t, _p in analyze_one(src, analyzer="standard")]
        assert got == [w for w in want if w not in ENGLISH_STOP_WORDS], src


def test_hard_unicode_consistent_across_gate_paths():
    """A Hebrew-quote doc must tokenize identically whether or not it
    also contains the analyzer's own slow-path marker (url/CJK/Thai) —
    the suspect classes divert to the exact path in EVERY analyzer."""
    from lucene_solr_spark.analysis import analyze_one

    heb = 'ששש"א hello'
    for analyzer, marker in (("url_email", " x@y.com"),
                             ("cjk", " 中文"),
                             ("thai", " ไทย")):
        base = [t for t, _ in analyze_one(heb, analyzer=analyzer)]
        with_marker = [t for t, _ in
                       analyze_one(heb + marker, analyzer=analyzer)]
        assert with_marker[: len(base)] == base, (analyzer, base,
                                                  with_marker)
        assert 'ששש"א' in base, (analyzer, base)


def test_oracle_sum_len_counts_overlaps():
    """sumTotalTermFreq counts every posting (overlaps included) while
    doc_lengths are discountOverlaps norms; the pandas oracle must use
    the former for avgdl, like index/build.py does."""
    import pandas as pd

    from lucene_solr_spark.analysis import tokenize_series
    from lucene_solr_spark.oracle.searcher import OracleSearcher

    pages = pd.DataFrame({
        "url": ["u0", "u1"],
        "text": ["dup rows in the table", "merge the dup batch"],
    })
    s = OracleSearcher(pages, analyzer="synonym")
    flat = tokenize_series(pages["text"], analyzer="synonym")
    assert s.sum_len == len(flat)
    assert s.sum_len > int(flat.attrs["doc_lengths"].sum())


def test_fold_table_matches_compiled_reference():
    """The fold table was EXTRACTED from the compiled reference filter
    (tools/fuzz_fold.py); pin its size + rows the old NFKD heuristic
    got wrong, and the İ lowercase contract."""
    from lucene_solr_spark.analysis import analyze_one
    from lucene_solr_spark.analysis.fold import ascii_fold
    from lucene_solr_spark.analysis.folddata import FOLD_MAP

    assert len(FOLD_MAP) == 1242
    # rows the NFKD approximation missed (verified vs compiled filter)
    assert ascii_fold("ɔƈɖǝə") == "ocdea"
    assert ascii_fold("ƕ") == "hv"
    assert ascii_fold("½") == "½"      # NOT mapped by the reference
    assert ascii_fold("⑰") == "17"
    assert ascii_fold("“q”") == '"q"'
    # Character.toLowerCase contract: 'İ' -> plain 'i' in EVERY chain
    assert analyze_one("İstanbul", analyzer="standard") == [
        ("istanbul", 0)]
