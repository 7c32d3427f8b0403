"""Multi-token (graph) token filters: Shingle / Synonym / WordDelimiter.

Reference semantics:
  shingle/ShingleFilter.java:45 (word n-grams, '_' filler for holes)
  synonym/SolrSynonymParser.java (equivalence classes vs '=>' mappings)
  miscellaneous/WordDelimiterFilter.java:86 (letter<->digit splits)
"""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.analysis import tokenize_series
from lucene_solr_spark.analysis.graph import (
    parse_synonym_rules,
    shingle_flat,
    synonym_flat,
    word_delimiter_flat,
)
from lucene_solr_spark.analysis.text import analyze_one


def _flat(rows):
    df = pd.DataFrame(rows, columns=["doc_idx", "term", "pos"])
    df["doc_idx"] = df["doc_idx"].astype(np.int32)
    df["pos"] = df["pos"].astype(np.int32)
    n = int(df["doc_idx"].max()) + 1 if len(df) else 0
    lengths = np.zeros(n, dtype=np.int32)
    np.add.at(lengths, df["doc_idx"].to_numpy(), 1)
    df.attrs["doc_lengths"] = lengths
    return df


def _tuples(df):
    return list(
        zip(df["doc_idx"].tolist(), df["term"].astype(str).tolist(),
            df["pos"].tolist())
    )


class TestShingle:
    def test_plain_bigrams(self):
        f = _flat([(0, "a", 0), (0, "b", 1), (0, "c", 2)])
        out = shingle_flat(f)
        assert _tuples(out) == [
            (0, "a", 0), (0, "a b", 0),
            (0, "b", 1), (0, "b c", 1),
            (0, "c", 2),
        ]
        # discountOverlaps=true: bigrams ride posInc 0, norm counts
        # occupied positions only (BM25Similarity.computeNorm)
        assert out.attrs["doc_lengths"].tolist() == [3]

    def test_stop_hole_filler(self):
        # pos 1 removed by a stop filter: shingles spanning it get '_'
        f = _flat([(0, "a", 0), (0, "c", 2)])
        out = shingle_flat(f)
        assert _tuples(out) == [
            (0, "a", 0), (0, "a _", 0),
            (0, "_ c", 1),
            (0, "c", 2),
        ]

    def test_all_filler_dropped_and_no_trailing_filler(self):
        # holes at 1,2 -> "_ _" dropped; nothing past the last real token
        f = _flat([(0, "a", 0), (0, "d", 3)])
        out = shingle_flat(f)
        assert _tuples(out) == [
            (0, "a", 0), (0, "a _", 0),
            (0, "_ d", 2),
            (0, "d", 3),
        ]

    def test_per_doc_boundaries(self):
        f = _flat([(0, "a", 0), (0, "b", 1), (1, "x", 0), (1, "y", 1)])
        out = shingle_flat(f)
        grams = [t for t in _tuples(out) if " " in t[1]]
        assert grams == [(0, "a b", 0), (1, "x y", 0)]

    def test_trigrams(self):
        f = _flat([(0, "a", 0), (0, "b", 1), (0, "c", 2)])
        out = shingle_flat(f, max_shingle=3, output_unigrams=False)
        assert _tuples(out) == [
            (0, "a b", 0), (0, "a b c", 0), (0, "b c", 1),
        ]

    def test_empty(self):
        f = _flat([])
        out = shingle_flat(f)
        assert len(out) == 0


class TestSynonym:
    def test_parse_equivalence_and_mapping(self):
        rules = parse_synonym_rules(
            ["a, b", "x => y, z", "# comment", ""]
        )
        assert rules["a"] == ("a", "b")
        assert rules["b"] == ("a", "b")
        assert rules["x"] == ("y", "z")  # x NOT in outputs: replaced

    def test_equivalence_injects_at_same_pos(self):
        rules = parse_synonym_rules(["dup, duplicate"])
        f = _flat([(0, "dup", 0), (0, "rows", 1)])
        out = synonym_flat(f, rules)
        assert _tuples(out) == [
            (0, "dup", 0), (0, "duplicate", 0), (0, "rows", 1),
        ]
        # the twin is an overlap token: norm length stays 2
        assert out.attrs["doc_lengths"].tolist() == [2]

    def test_mapping_replaces_original(self):
        rules = parse_synonym_rules(["blend => merge"])
        f = _flat([(0, "blend", 0), (0, "rows", 1)])
        out = synonym_flat(f, rules)
        assert _tuples(out) == [(0, "merge", 0), (0, "rows", 1)]

    def test_no_rule_no_change(self):
        rules = parse_synonym_rules(["blend => merge"])
        f = _flat([(0, "rows", 0)])
        out = synonym_flat(f, rules)
        assert _tuples(out) == [(0, "rows", 0)]

    def test_query_side_expansion(self):
        assert analyze_one("blend", analyzer="synonym") == [("merge", 0)]
        assert analyze_one("duplicate", analyzer="synonym") == [
            ("duplicate", 0), ("dup", 0),
        ]


class TestWordDelimiter:
    def test_letter_digit_split_renumbers(self):
        f = _flat([(0, "x100", 0), (0, "runs", 1)])
        out = word_delimiter_flat(f)
        assert _tuples(out) == [
            (0, "x", 0), (0, "100", 1), (0, "runs", 2),
        ]
        assert out.attrs["doc_lengths"].tolist() == [3]

    def test_pure_tokens_untouched(self):
        f = _flat([(0, "abc", 0), (0, "123", 1)])
        out = word_delimiter_flat(f)
        assert _tuples(out) == [(0, "abc", 0), (0, "123", 1)]

    def test_stop_gap_preserved(self):
        # hole at pos 1 stays a hole after the shift
        f = _flat([(0, "a1b", 0), (0, "end", 3)])
        out = word_delimiter_flat(f)
        assert _tuples(out) == [
            (0, "a", 0), (0, "1", 1), (0, "b", 2), (0, "end", 5),
        ]

    def test_preserve_original_and_catenate(self):
        f = _flat([(0, "x100", 0)])
        out = word_delimiter_flat(
            f, preserve_original=True, catenate_all=True
        )
        got = _tuples(out)
        assert (0, "x100", 0) in got and (0, "x", 0) in got
        assert (0, "100", 1) in got and (0, "x100", 0) in got

    def test_per_doc_independent_shift(self):
        f = _flat([(0, "x100", 0), (1, "plain", 0), (1, "y2", 1)])
        out = word_delimiter_flat(f)
        assert _tuples(out) == [
            (0, "x", 0), (0, "100", 1),
            (1, "plain", 0), (1, "y", 1), (1, "2", 2),
        ]

    def test_unicode_letters_kept(self):
        # r4 review: the ASCII-only split dropped 'ü'/'é' from mixed
        # tokens; WordDelimiterIterator uses Character.isLetter
        f = _flat([(0, "über1", 0), (0, "café2", 1)])
        out = word_delimiter_flat(f)
        assert _tuples(out) == [
            (0, "über", 0), (0, "1", 1), (0, "café", 2), (0, "2", 3),
        ]

    def test_underscore_is_delimiter(self):
        # '_' survives UAX#29 (ExtendNumLet) but is SUBWORD_DELIM in the
        # reference's DEFAULT_WORD_DELIM_TABLE
        f = _flat([(0, "wi_fi", 0), (0, "next", 1)])
        out = word_delimiter_flat(f)
        assert _tuples(out) == [
            (0, "wi", 0), (0, "fi", 1), (0, "next", 2),
        ]

    def test_all_delimiter_token_vanishes_but_keeps_gap(self):
        # a token of only delimiters emits nothing; its position gap
        # remains (accumulated posIncrement semantics)
        f = _flat([(0, "a_1", 0), (0, "__", 1), (0, "b", 2)])
        out = word_delimiter_flat(f)
        assert _tuples(out) == [
            (0, "a", 0), (0, "1", 1), (0, "b", 3),
        ]


class TestChainIntegration:
    def test_shingle_through_chain(self):
        f = tokenize_series(pd.Series(["the data table"]), analyzer="shingle")
        assert _tuples(f) == [
            (0, "_ data", 0), (0, "data", 1), (0, "data table", 1),
            (0, "table", 2),
        ]

    def test_word_delimiter_through_chain(self):
        f = tokenize_series(pd.Series(["x100 runs"]),
                            analyzer="word_delimiter")
        assert _tuples(f) == [(0, "x", 0), (0, "100", 1), (0, "runs", 2)]

    def test_synonym_through_chain_lengths(self):
        f = tokenize_series(pd.Series(["dup rows", "table scan"]),
                            analyzer="synonym")
        # 'duplicate' twin doesn't inflate the norm (discountOverlaps)
        assert f.attrs["doc_lengths"].tolist() == [2, 2]


class TestSynonymGraph:
    """Multi-token MATCH graphs (synonym/SynonymFilter.java:111 FST):
    longest match, left-to-right, non-overlapping. Semantics pinned
    byte-for-byte against a compiled-from-reference SynonymFilter
    harness (StandardTokenizer -> Lower -> Stop -> SynonymFilter):
    '=>' drops inputs, swallows increment gaps at/inside the match and
    COMPRESSES downstream positions; equivalence keeps originals with
    their own increments; multi-word outputs sausage one word per
    following stream slot, flushing at doc end."""

    def _rules(self):
        from lucene_solr_spark.analysis.graph import parse_synonym_rules_multi

        return parse_synonym_rules_multi([
            "wi fi => wifi",
            "big row, bigrow",
            "dup, duplicate",
            "table hash => tablehash",
            "cold war => east west conflict",
            "nyc => new york city",
        ])

    def _run(self, line):
        from lucene_solr_spark.analysis.graph import synonym_graph_flat

        flat = tokenize_series(pd.Series([line]), analyzer="standard")
        out = synonym_graph_flat(flat, self._rules())
        got = sorted(zip(out["term"].astype(str), out["pos"].tolist()))
        return got, out.attrs.get("doc_lengths")

    def test_compiled_reference_probe_matrix(self):
        # every case's expectation is the verbatim output of the
        # compiled reference SynonymFilter over the same line
        cases = {
            "bigrow scan runs": [("bigrow", 0), ("big", 0), ("scan", 1),
                                 ("row", 1), ("runs", 2)],
            "use wi fi now": [("use", 0), ("wifi", 1), ("now", 2)],
            "big row here": [("big", 0), ("bigrow", 0), ("row", 1),
                             ("here", 2)],
            "the table hash join": [("tablehash", 0), ("join", 1)],
            "wi wi fi fi": [("wi", 0), ("wifi", 1), ("fi", 2)],
            "wi the fi": [("wifi", 0)],
            "dup rows": [("dup", 0), ("duplicate", 0), ("rows", 1)],
            "table table hash hash": [("table", 0), ("tablehash", 1),
                                      ("hash", 2)],
            "table hash table hash": [("tablehash", 0), ("tablehash", 1)],
            "the dup rows": [("dup", 1), ("duplicate", 1), ("rows", 2)],
            "the wi fi now": [("wifi", 0), ("now", 1)],
            "wi fi the now": [("wifi", 0), ("now", 2)],
            "big the row": [("big", 0), ("bigrow", 0), ("row", 2)],
            "table the hash": [("tablehash", 0)],
            "use wi fi wi fi end": [("use", 0), ("wifi", 1), ("wifi", 2),
                                    ("end", 3)],
            "the big row end": [("big", 1), ("bigrow", 1), ("row", 2),
                                ("end", 3)],
            "the bigrow end": [("bigrow", 1), ("big", 1), ("end", 2),
                               ("row", 2)],
            "cold war end game": [("east", 0), ("west", 1), ("end", 2),
                                  ("conflict", 2), ("game", 3)],
            "nyc marathon start": [("new", 0), ("marathon", 1),
                                   ("york", 1), ("start", 2), ("city", 2)],
            "the cold war the end": [("east", 0), ("west", 1), ("end", 3),
                                     ("conflict", 3)],
            "cold the war end": [("east", 0), ("west", 1), ("end", 2),
                                 ("conflict", 2)],
            "nyc": [("new", 0), ("york", 1), ("city", 2)],
            "the bigrow": [("bigrow", 1), ("big", 1), ("row", 2)],
        }
        for line, exp in cases.items():
            got, _ = self._run(line)
            assert got == sorted(exp), line

    def test_discounted_lengths(self):
        # '=>' compression shrinks the norm length; riders don't add
        got, dl = self._run("use wi fi now")
        assert dl.tolist() == [3]
        got, dl = self._run("big row here")
        assert dl.tolist() == [3]

    def test_match_never_crosses_docs(self):
        from lucene_solr_spark.analysis.graph import synonym_graph_flat

        f = _flat([(0, "wi", 0), (1, "fi", 0)])
        out = synonym_graph_flat(f, self._rules())
        assert _tuples(out) == [(0, "wi", 0), (1, "fi", 0)]

    def test_through_chain(self):
        f = tokenize_series(
            pd.Series(["the table hash join"]), analyzer="synonym_graph"
        )
        assert _tuples(f) == [(0, "tablehash", 0), (0, "join", 1)]


class TestDecompound:
    """DictionaryCompoundWordTokenFilter (compound/DictionaryCompound
    WordTokenFilter.java:41) inside the German chain: stop -> decompound
    (pre-normalization text, dictionary carries umlaut/eszett forms) ->
    GermanNormalization -> GermanLightStem, subwords at posInc 0.
    Expectations are the verbatim output of a compiled-from-reference
    harness over the same lines (StandardTokenizer -> Lower ->
    Stop(german_stop.txt) -> DictionaryCompound -> GermanNormalization
    -> GermanLightStem)."""

    def test_compiled_reference_probe_matrix(self):
        cases = {
            "Donaudampfschifffahrtsgesellschaftskapitän war hier": [
                ("donaudampfschifffahrtsgesellschaftskapitan", 0),
                ("donau", 0), ("dampf", 0), ("schiff", 0), ("fahrt", 0),
                ("gesellschaft", 0), ("kapitan", 0)],
            "die Handschuhe und das Fußballspielfeld": [
                ("handschuh", 1), ("hand", 1), ("schuh", 1),
                ("fussballspielfeld", 4), ("fuss", 4), ("ball", 4),
                ("spiel", 4), ("feld", 4)],
            # 'schiff' >= minWordSize and in the dictionary: re-emits
            # itself (bug-for-bug); 'haus' < minWordSize: untouched
            "haus schiff kurz": [
                ("haus", 0), ("schiff", 1), ("schiff", 1), ("kurz", 2)],
            "Wasserkraftwerk am Marktplatz": [
                ("wasserkraftwerk", 0), ("wass", 0), ("kraft", 0),
                ("werk", 0), ("marktplatz", 2), ("markt", 2),
                ("platz", 2)],
            "Autoversicherung Geschwindigkeitsbegrenzung": [
                ("autoversicherung", 0), ("auto", 0),
                ("versicherung", 0), ("geschwindigkeitsbegrenzung", 1),
                ("geschwindigkeit", 1), ("begrenzung", 1)],
        }
        for line, exp in cases.items():
            f = tokenize_series(pd.Series([line]),
                                analyzer="german_decompound")
            got = sorted(zip(f["term"].astype(str), f["pos"].tolist()))
            assert got == sorted(exp), line

    def test_norm_length_unchanged(self):
        f = tokenize_series(
            pd.Series(["die Handschuhe und das Fußballspielfeld"]),
            analyzer="german_decompound",
        )
        # subwords are posInc-0 overlaps: norm counts the 2 surviving
        # originals only (die/und/das stopped)
        assert list(f.attrs["doc_lengths"]) == [2]
