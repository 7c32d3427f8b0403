"""Multi-token (graph) token filters over the flat token stream:
Shingle, Synonym, WordDelimiter.

The analyzer chain materializes a batch as the flat (doc_idx, term, pos)
frame (text.tokenize_series); these filters transform that frame the way
the reference's TokenFilters transform a TokenStream:

  - ShingleFilter (analysis/common/.../shingle/ShingleFilter.java:45):
    token n-grams with '_' filler tokens for stop-filter holes.
  - SynonymFilter (analysis/common/.../synonym/SynonymFilter.java:111):
    inject synonym terms at the same position (posInc 0). synonym_flat
    handles single-token inputs (the SolrSynonymParser equivalence-class
    case, solr/example schema.xml:126-150); synonym_graph_flat adds the
    FST's multi-token MATCH support ("wi fi => wifi") with the
    reference's flattened sausage output positions.
  - WordDelimiterFilter (analysis/common/.../miscellaneous/
    WordDelimiterFilter.java:86): split tokens on letter/digit
    transitions ('x100' -> x, 100), each part consuming a position (the
    filter's posIncrement semantics renumber everything downstream),
    optionally preserving the original and/or the catenation at the
    first part's position.

All three are vectorized numpy/pandas — no per-token Python in the hot
path except the rare split/match rows — and run identically inside Spark
pandas UDFs and the DuckDB-oracle generators.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

FILLER = "_"  # ShingleFilter.DEFAULT_FILLER_TOKEN

# Default synonyms.txt for the 'synonym' registry analyzer (the Solr
# example wires a file exactly like this into text_general,
# solr/example/solr/collection1/conf/synonyms.txt). One equivalence
# class (index-time injection: every 'dup' grows a 'duplicate' twin)
# and one explicit mapping (query-time rewrite: 'blend' never occurs in
# a corpus, so it only bites when a query uses it).
DEFAULT_SYNONYM_LINES = [
    "dup, duplicate",
    "blend => merge",
]

# Default rules for the 'synonym_graph' registry analyzer: the multi-token
# MATCH cases SynonymFilter's FST handles ("wi fi => wifi" shaped). The
# corpus bigram "table hash" is frequent in the testdata, so the '=>'
# rule visibly rewrites the index; "big row, bigrow" exercises the
# keep-originals equivalence with a multi-word member.
SYNONYM_GRAPH_LINES = [
    "dup, duplicate",
    "blend => merge",
    "table hash => tablehash",
    "big row, bigrow",
]


def _discounted_lengths(od: np.ndarray, op: np.ndarray,
                        n_docs: int) -> np.ndarray:
    """BM25 norm length with discountOverlaps=true (the reference
    default, search/similarities/BM25Similarity.java computeNorm:
    state.getLength() - state.getNumOverlap()): posInc-0 tokens —
    synonym twins, shingles, common grams, WDF catenate/preserve — do
    not inflate the field length, so count ONE token per occupied
    (doc, pos) slot."""
    lengths = np.zeros(n_docs, dtype=np.int32)
    if len(od):
        od = od.astype(np.int64)
        key = od * (int(op.max()) + 1) + op.astype(np.int64)
        _, first = np.unique(key, return_index=True)
        np.add.at(lengths, od[first], 1)
    return lengths


def _order_by_doc_pos(flat: pd.DataFrame):
    doc = flat["doc_idx"].to_numpy()
    pos = flat["pos"].to_numpy()
    order = np.lexsort((pos, doc))
    return doc[order], flat["term"].astype(str).to_numpy()[order], pos[order]


def shingle_flat(
    flat: pd.DataFrame,
    max_shingle: int = 2,
    output_unigrams: bool = True,
    sep: str = " ",
) -> pd.DataFrame:
    """Token shingles (word n-grams) over the flat stream.

    Holes left by the stop filter become '_' fillers: the filler occupies
    the removed position inside a shingle, exactly as ShingleFilter
    inserts fillerToken for positionIncrement > 1. Fillers exist only up
    to the LAST real token of a doc (nothing carries an increment past
    it), are never emitted as unigrams, and all-filler shingles are
    dropped. A shingle's position is its first token's position.
    """
    doc, term, pos = _order_by_doc_pos(flat)
    out_doc, out_term, out_pos = [], [], []
    if output_unigrams and len(doc):
        out_doc.append(doc)
        out_term.append(term)
        out_pos.append(pos)
    if len(doc):
        # position-expanded stream per doc: 0..last_real_pos
        n_docs = int(doc.max()) + 1
        last = np.zeros(n_docs, np.int64)
        np.maximum.at(last, doc, pos)
        has = np.zeros(n_docs, dtype=bool)
        has[doc] = True
        lens = np.where(has, last + 1, 0)
        offs = np.concatenate([[0], np.cumsum(lens)])
        total = int(offs[-1])
        dense = np.full(total, FILLER, dtype=object)
        dense[offs[doc] + pos] = term
        dense_doc = np.repeat(np.arange(n_docs), lens)
        dense_pos = np.concatenate(
            [np.arange(n) for n in lens]
        ) if total else np.zeros(0, np.int64)
        for k in range(2, max_shingle + 1):
            if total < k:
                break
            parts = [dense[i: total - (k - 1) + i] for i in range(k)]
            same_doc = dense_doc[: total - (k - 1)] == dense_doc[k - 1:]
            grams = parts[0].astype(object)
            all_filler = parts[0] == FILLER
            for p in parts[1:]:
                grams = grams + sep + p.astype(object)
                all_filler &= p == FILLER
            keep = same_doc & ~all_filler
            out_doc.append(dense_doc[: total - (k - 1)][keep])
            out_term.append(grams[keep])
            out_pos.append(dense_pos[: total - (k - 1)][keep])
    if not out_doc:
        out = flat.iloc[0:0].copy()
        if "doc_lengths" in flat.attrs:
            out.attrs["doc_lengths"] = np.zeros(
                len(flat.attrs["doc_lengths"]), dtype=np.int32
            )
        return out
    od = np.concatenate(out_doc)
    ot = np.concatenate(out_term)
    op = np.concatenate(out_pos).astype(np.int32)
    order = np.lexsort((op, od))
    out = pd.DataFrame(
        {"doc_idx": od[order].astype(np.int32), "term": ot[order],
         "pos": op[order]}
    )
    if "doc_lengths" in flat.attrs:
        out.attrs["doc_lengths"] = _discounted_lengths(
            od, op, len(flat.attrs["doc_lengths"])
        )
    return out


def parse_synonym_rules(lines: list[str]) -> dict[str, tuple[str, ...]]:
    """SolrSynonymParser format (synonym/SolrSynonymParser.java):
    'a, b, c' = equivalence class (each member maps to all members);
    'a => b, c' = explicit mapping (a is REPLACED by b and c).
    Single-token keys/outputs only (documented module limitation)."""
    rules: dict[str, set[str]] = {}
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
            outs = tuple(t.strip() for t in rhs.split(",") if t.strip())
            for key in (t.strip() for t in lhs.split(",")):
                if key:
                    rules.setdefault(key, set()).update(outs)
        else:
            cls = [t.strip() for t in line.split(",") if t.strip()]
            for key in cls:
                rules.setdefault(key, set()).update(cls)
    return {k: tuple(sorted(v)) for k, v in rules.items()}


def parse_synonym_rules_multi(lines: list[str]):
    """SolrSynonymParser with MULTI-token inputs and outputs
    (synonym/SolrSynonymParser.java; the FST in SynonymFilter.java:111
    matches multi-word inputs like "wi fi => wifi").

    Returns {input_token_tuple: (output_phrase_tuples, keep_originals)}.
    Equivalence classes map every member to all members (keep=True,
    self included); '=>' maps each LHS alternative to the RHS outputs
    (keep=False). Each output phrase is a tuple of tokens.
    """
    rules: dict[tuple, tuple] = {}

    def phrase(s: str) -> tuple:
        return tuple(s.split())

    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
            outs = tuple(phrase(t) for t in rhs.split(",") if t.strip())
            for key in (phrase(t) for t in lhs.split(",") if t.strip()):
                prev = rules.get(key, ((), False))
                rules[key] = (tuple(sorted(set(prev[0]) | set(outs))), False)
        else:
            cls = [phrase(t) for t in line.split(",") if t.strip()]
            for key in cls:
                prev = rules.get(key, ((), True))
                outs = set(prev[0]) | {c for c in cls if c != key}
                rules[key] = (tuple(sorted(outs)), True)
    return rules


def _synonym_replay_doc(terms_d, pos_d, matches_d):
    """Flattened SynonymFilter replay for one doc (only docs with >= 1
    match pay this; semantics pinned against a compiled SynonymFilter
    harness — see tests/test_graph.py::TestSynonymGraph):

      * output word j of every matched rule attaches to stream SLOT
        s + j (s = the match's first slot) as a posInc-0 rider on
        whatever token emits that slot; riders past the last slot flush
        at doc end as posInc-1 slots, in slot order;
      * keepOrig matches emit their original tokens unchanged (own
        increments preserved);
      * '=>' matches swallow the inputs and emit min(k, longest-output)
        fresh slots with posInc 1 HARD (any gap before or inside the
        match is lost — the reference does not preserve it), so
        downstream positions compress when the output is shorter.
    """
    out_terms: list = []
    out_pos: list = []
    slot_pos: list = []
    pending: dict[int, list] = {}

    def emit_slot(p):
        slot_pos.append(p)
        for w in pending.pop(len(slot_pos) - 1, ()):
            out_terms.append(w)
            out_pos.append(p)

    i = 0
    mi = 0
    prev_orig = -1
    n = len(terms_d)
    while i < n:
        if mi < len(matches_d) and matches_d[mi][0] == i:
            _start, k, outs, keep = matches_d[mi]
            mi += 1
            s = len(slot_pos)
            for o in outs:
                for j, w in enumerate(o):
                    pending.setdefault(s + j, []).append(w)
            if keep:
                for t in range(k):
                    p = ((slot_pos[-1] if slot_pos else -1)
                         + int(pos_d[i + t]) - prev_orig)
                    out_terms.append(terms_d[i + t])
                    out_pos.append(p)
                    emit_slot(p)
                    prev_orig = int(pos_d[i + t])
            else:
                for _ in range(min(k, max(len(o) for o in outs))):
                    emit_slot((slot_pos[-1] if slot_pos else -1) + 1)
                prev_orig = int(pos_d[i + k - 1])
            i += k
        else:
            p = ((slot_pos[-1] if slot_pos else -1)
                 + int(pos_d[i]) - prev_orig)
            out_terms.append(terms_d[i])
            out_pos.append(p)
            emit_slot(p)
            prev_orig = int(pos_d[i])
            i += 1
    for s in sorted(pending):
        p = (slot_pos[-1] if slot_pos else -1) + 1
        ws = pending[s]
        del pending[s]
        for w in ws:
            out_terms.append(w)
            out_pos.append(p)
        slot_pos.append(p)
    return out_terms, out_pos


def synonym_graph_flat(
    flat: pd.DataFrame,
    rules: dict,
) -> pd.DataFrame:
    """SynonymFilter with multi-token MATCH support over the flat stream
    (synonym/SynonymFilter.java:111 — the FST consumes the longest
    matching input sequence at each stream position, left to right,
    matched spans never overlapping).

    Semantics are bug-for-bug with the reference's flattened (pre-graph)
    token stream, pinned against a compiled-from-reference SynonymFilter
    harness: multi-word outputs sausage onto the following slots, '=>'
    replacements compress downstream positions and swallow position-
    increment gaps at/inside the match. Candidate generation is
    vocabulary-gated and only docs with >= 1 match pay the per-doc
    replay; every other doc passes through untouched (vectorized)."""
    if not rules:
        return flat
    doc, term, pos = _order_by_doc_pos(flat)
    n = len(doc)
    if n == 0:
        return flat
    by_first: dict[str, list] = {}
    for k, v in rules.items():
        by_first.setdefault(k[0], []).append((k, v))
    for lst in by_first.values():
        lst.sort(key=lambda kv: -len(kv[0]))  # longest input first
    first_mask = np.isin(term, list(by_first))
    cand = np.flatnonzero(first_mask)
    matches: dict[int, list] = {}  # doc -> [(start_row, k, outs, keep)]
    next_free = 0  # left-to-right: matched spans never overlap
    for i in cand:
        if i < next_free:
            continue
        for key, (outs, keep) in by_first[term[i]]:
            k = len(key)
            if i + k > n or doc[i + k - 1] != doc[i]:
                continue
            if k > 1 and not all(term[i + j] == key[j] for j in range(1, k)):
                continue
            matches.setdefault(int(doc[i]), []).append((i, k, outs, keep))
            next_free = i + k
            break
    if not matches:
        return flat

    hit_docs = np.zeros(int(doc.max()) + 1, dtype=bool)
    hit_docs[list(matches)] = True
    row_hit = hit_docs[doc]
    out_doc = [doc[~row_hit]]
    out_term = [term[~row_hit].astype(object)]
    out_pos = [pos[~row_hit]]
    starts = np.flatnonzero(np.concatenate([[True], doc[1:] != doc[:-1]]))
    bounds = np.append(starts, n)
    row0 = {int(doc[st]): i for i, st in enumerate(starts)}
    for d, ms in matches.items():
        lo = int(bounds[row0[d]])
        hi = int(bounds[row0[d] + 1])
        td = term[lo:hi]
        pd_ = pos[lo:hi]
        local = [(st - lo, k, outs, keep) for st, k, outs, keep in ms]
        ts, ps = _synonym_replay_doc(td, pd_, local)
        out_doc.append(np.full(len(ts), d, dtype=doc.dtype))
        out_term.append(np.asarray(ts, dtype=object))
        out_pos.append(np.asarray(ps, dtype=pos.dtype))
    od = np.concatenate(out_doc)
    ot = np.concatenate(out_term)
    op = np.concatenate(out_pos)
    order = np.lexsort((op, od))
    out = pd.DataFrame(
        {"doc_idx": od[order], "term": ot[order],
         "pos": op[order].astype(np.int32)}
    )
    if "doc_lengths" in flat.attrs:
        out.attrs["doc_lengths"] = _discounted_lengths(
            od, op, len(flat.attrs["doc_lengths"])
        )
    return out


def synonym_flat(
    flat: pd.DataFrame,
    rules: dict[str, tuple[str, ...]],
) -> pd.DataFrame:
    """Index-time synonym injection: each token whose term has a rule is
    replaced by the rule's OUTPUTS, all at the token's position (posInc
    0). Equivalence classes ('a, b') include the key in their outputs so
    the original survives; '=>' rules don't, so the original is replaced
    — exactly SolrSynonymParser's two shapes. Vocabulary-level match: the
    rule lookup runs once per distinct term."""
    term = flat["term"].astype(str)
    cats, codes = np.unique(term.to_numpy(), return_inverse=True)
    add_doc, add_term, add_pos = [], [], []
    drop = np.zeros(len(flat), dtype=bool)
    doc = flat["doc_idx"].to_numpy()
    pos = flat["pos"].to_numpy()
    for ci, t in enumerate(cats):
        outs = rules.get(t)
        if not outs:
            continue
        hits = codes == ci
        for o in outs:
            if o == t:
                continue
            add_doc.append(doc[hits])
            add_term.append(np.full(int(hits.sum()), o, dtype=object))
            add_pos.append(pos[hits])
        if t not in outs:
            drop |= hits
    if not add_doc and not drop.any():
        return flat
    od = np.concatenate([doc[~drop]] + add_doc)
    ot = np.concatenate([term.to_numpy()[~drop].astype(object)] + add_term)
    op = np.concatenate([pos[~drop]] + add_pos)
    order = np.lexsort((op, od))
    out = pd.DataFrame(
        {"doc_idx": od[order], "term": ot[order],
         "pos": op[order].astype(np.int32)}
    )
    if "doc_lengths" in flat.attrs:
        out.attrs["doc_lengths"] = _discounted_lengths(
            od, op, len(flat.attrs["doc_lengths"])
        )
    return out


# Unicode-aware, like the reference's WordDelimiterIterator char types
# (Character.isLetter/isDigit): [^\W\d_] is "any unicode letter or mark"
# under Python re, \d any unicode decimal digit. '_' is SUBWORD_DELIM in
# the reference's DEFAULT_WORD_DELIM_TABLE, so a token that carries one
# (UAX#29 ExtendNumLet keeps it) is split too and the underscore dropped.
_WDF_SPLIT_RE = re.compile(r"[^\W\d_]+|\d+")
_WDF_MIXED_RE = re.compile(r"[^\W\d_]\d|\d[^\W\d_]|_")


def word_delimiter_flat(
    flat: pd.DataFrame,
    generate_parts: bool = True,
    catenate_all: bool = False,
    preserve_original: bool = False,
) -> pd.DataFrame:
    """WordDelimiterFilter for the post-tokenizer stream: the standard
    tokenizer already split punctuation, so the remaining work is the
    letter<->digit transition split ('x100' -> x, 100). Parts consume
    one position each (the reference emits each subword with
    posIncrement 1, renumbering everything after it); the catenation
    and/or preserved original sit at the first part's position
    (posIncrement 0). Only mixed alnum tokens are touched; the pure
    word/number fast path is a no-op mask."""
    doc, term, pos = _order_by_doc_pos(flat)
    n = len(doc)
    if n == 0:
        return flat
    cats, codes = np.unique(term, return_inverse=True)
    mixed_cat = np.array(
        [bool(_WDF_MIXED_RE.search(t)) for t in cats], dtype=bool
    )
    mixed = mixed_cat[codes]
    if not mixed.any():
        return flat
    parts_by_cat = {
        ci: _WDF_SPLIT_RE.findall(cats[ci])
        for ci in np.flatnonzero(mixed_cat)
    }
    # extra positions each token consumes beyond its own (len(parts)-1
    # for split tokens): downstream tokens shift by the running total,
    # preserving stop-filter gaps — a segmented exclusive cumsum
    nparts = np.zeros(len(cats), np.int64)
    for ci, ps in parts_by_cat.items():
        nparts[ci] = len(ps)
    # a token that yields no parts at all (e.g. pure '_') vanishes but its
    # position gap remains (the reference accumulates the skipped token's
    # posIncrement onto the next emitted one) -> extra 0, never -1
    extra = np.where(
        mixed & generate_parts, np.maximum(nparts[codes] - 1, 0), 0
    )
    cs = np.cumsum(extra)
    excl = cs - extra
    starts = np.flatnonzero(
        np.concatenate([[True], doc[1:] != doc[:-1]])
    )
    run_lens = np.diff(np.append(starts, n))
    base_pos = pos + excl - np.repeat(excl[starts], run_lens)

    out_doc = [doc[~mixed]]
    out_term = [term[~mixed].astype(object)]
    out_pos = [base_pos[~mixed]]
    for i in np.flatnonzero(mixed):
        parts = parts_by_cat[codes[i]]
        p0 = base_pos[i]
        if preserve_original:
            out_doc.append(doc[i: i + 1]); out_pos.append(base_pos[i: i + 1])
            out_term.append(np.array([term[i]], dtype=object))
        if generate_parts:
            out_doc.append(np.full(len(parts), doc[i]))
            out_term.append(np.array(parts, dtype=object))
            out_pos.append(p0 + np.arange(len(parts)))
        if catenate_all and parts:
            out_doc.append(doc[i: i + 1]); out_pos.append(base_pos[i: i + 1])
            out_term.append(np.array(["".join(parts)], dtype=object))
    od = np.concatenate(out_doc)
    ot = np.concatenate(out_term)
    op = np.concatenate(out_pos)
    order = np.lexsort((op, od))
    out = pd.DataFrame(
        {"doc_idx": od[order], "term": ot[order],
         "pos": op[order].astype(np.int32)}
    )
    if "doc_lengths" in flat.attrs:
        out.attrs["doc_lengths"] = _discounted_lengths(
            od, op, len(flat.attrs["doc_lengths"])
        )
    return out


def common_grams_flat(flat: pd.DataFrame, common: frozenset,
                      sep: str = "_") -> pd.DataFrame:
    """CommonGramsFilter (commongrams/CommonGramsFilter.java:52): for
    every adjacent token pair where either word is in the common set,
    add a "w1_w2" gram at the FIRST word's position (posIncrement 0).
    All unigrams are kept — the chain runs with no stop filter, so
    positions are dense and adjacency is pos+1."""
    doc, term, pos = _order_by_doc_pos(flat)
    out = flat.copy()
    if len(doc) > 1:
        same_doc = doc[1:] == doc[:-1]
        adjacent = pos[1:] == pos[:-1] + 1
        is_common = np.isin(term, list(common))
        pair = same_doc & adjacent & (is_common[:-1] | is_common[1:])
        if pair.any():
            idx = np.flatnonzero(pair)
            grams = pd.DataFrame({
                "doc_idx": doc[idx].astype(np.int32),
                "term": term[idx].astype(object) + sep
                        + term[idx + 1].astype(object),
                "pos": pos[idx],
            })
            lengths = out.attrs.get("doc_lengths")
            out = pd.concat([out, grams], ignore_index=True)
            order = np.lexsort(
                (out["pos"].to_numpy(), out["doc_idx"].to_numpy())
            )
            out = out.iloc[order].reset_index(drop=True)
            if lengths is not None:
                # grams ride posInc-0 on the first word's slot:
                # discountOverlaps leaves the norm length unchanged
                out.attrs["doc_lengths"] = np.asarray(lengths)
    return out


# DictionaryCompoundWordTokenFilter's dictionary for the
# 'german_decompound' registry analyzer (compound/
# DictionaryCompoundWordTokenFilterFactory.java wires a user word list;
# this compact list covers common German compound parts and mirrors the
# compiled-harness probe dictionary in tests/test_graph.py)
GERMAN_COMPOUND_DICT = frozenset((
    "donau", "dampf", "schiff", "fahrt", "gesellschaft", "kapitän",
    "haus", "tür", "schlüssel", "bund", "land", "straße", "bahn",
    "hof", "wasser", "kraft", "werk", "zeit", "arbeit", "markt",
    "platz", "buch", "hand", "schuh", "eisen", "auto", "versicherung",
    "geschwindigkeit", "begrenzung", "fuß", "ball", "spiel", "feld",
))


def decompose_word(term: str, dictionary: frozenset,
                   min_word: int = 5, min_sub: int = 2,
                   max_sub: int = 15) -> list[str]:
    """CompoundWordTokenFilterBase.decompose (compound/
    DictionaryCompoundWordTokenFilter.java:41): for every start index,
    every dictionary substring of length min_sub..max_sub is a subword
    — including the whole word itself when it is in the dictionary
    (bug-for-bug: 'schiff' >= minWordSize re-emits itself)."""
    n = len(term)
    if n < min_word:
        return []
    subs = []
    for i in range(0, n - min_sub + 1):
        for j in range(min_sub, max_sub + 1):
            if i + j > n:
                break
            if term[i: i + j] in dictionary:
                subs.append(term[i: i + j])
    return subs


def decompound_flat(flat: pd.DataFrame,
                    dictionary: frozenset = GERMAN_COMPOUND_DICT,
                    min_word: int = 5, min_sub: int = 2,
                    max_sub: int = 15) -> pd.DataFrame:
    """DictionaryCompoundWordTokenFilter over the flat stream: subwords
    ride posInc 0 at the original's position, original kept first
    (CompoundWordTokenFilterBase.incrementToken restores state, sets
    increment 0). Vocabulary-vectorized: decompose runs once per
    distinct term; rows expand by dictionary code."""
    term = flat["term"].astype(str)
    cats, codes = np.unique(term.to_numpy(), return_inverse=True)
    subs_by_cat = {}
    for ci, t in enumerate(cats):
        subs = decompose_word(t, dictionary, min_word, min_sub, max_sub)
        if subs:
            subs_by_cat[ci] = subs
    if not subs_by_cat:
        return flat
    doc = flat["doc_idx"].to_numpy()
    pos = flat["pos"].to_numpy()
    add_doc, add_term, add_pos = [], [], []
    for ci, subs in subs_by_cat.items():
        hits = np.flatnonzero(codes == ci)
        for s in subs:
            add_doc.append(doc[hits])
            add_term.append(np.full(len(hits), s, dtype=object))
            add_pos.append(pos[hits])
    od = np.concatenate([doc] + add_doc)
    ot = np.concatenate([term.to_numpy().astype(object)] + add_term)
    op = np.concatenate([pos] + add_pos)
    # stable by (doc, pos): originals precede their subwords (original
    # rows come first in the concatenation)
    order = np.lexsort((op, od))
    out = pd.DataFrame(
        {"doc_idx": od[order], "term": ot[order],
         "pos": op[order].astype(np.int32)}
    )
    if "doc_lengths" in flat.attrs:
        # subwords are posInc-0 overlaps: norm lengths unchanged
        out.attrs["doc_lengths"] = np.asarray(flat.attrs["doc_lengths"])
    return out
