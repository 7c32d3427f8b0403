"""Pure-pandas/numpy brute-force reference searcher.

Plays the role of the reference implementation in tests (SURVEY.md §5): the
sandbox can't run the Java fork, so rank-identity is asserted against this
oracle, which reproduces the reference semantics directly:

  - same analyzer chain as the engine (shared kernels, analysis/text.py)
  - BM25 float32 math per BM25Similarity.java:65-67,95-97,204-237 with lossy
    SmallFloat norms (util/SmallFloat.java:78-99)
  - BooleanQuery score = plain sum of clause scores, coord/queryNorm = 1
    (search/BooleanQuery.java:213-218, similarities/Similarity.java:121,138),
    accumulated in clause order in float32
  - phrase scoring: freq = exact phrase occurrence count, weight = sum of
    clause idfs (search/ExactPhraseScorer.java:26-33, PhraseQuery)
  - top-k tie-break: score desc, then docID asc (search/HitQueue.java:76-81)

It is deliberately a different *execution* strategy (dict + dense scan vs
codec + block-max pruning) sharing only the math kernels — the reference's
own equivalence-testing pattern (e.g. TestBoolean2 cross-checking scorers).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..analysis import tokenize_series, analyze_one
from ..search import bm25
from ..search.query import parse_query, Clause


class OracleSearcher:
    def __init__(self, pages: pd.DataFrame, url_col: str = "url", text_col: str = "text", analyzer: str = "standard"):
        pages = pages.sort_values(url_col, kind="mergesort").reset_index(drop=True)
        self.urls = pages[url_col].to_numpy()
        self.analyzer = analyzer
        flat = tokenize_series(pages[text_col], analyzer=analyzer)
        self.lengths = flat.attrs["doc_lengths"]
        self.norm_bytes = bm25.encode_norm(self.lengths)
        self.max_doc = len(pages)
        # sumTotalTermFreq counts EVERY posting (overlaps included),
        # while doc_lengths are discountOverlaps norms — for overlap-
        # producing analyzers (synonym/shingle/common_grams/hunspell/
        # decompound) the two differ; the engine index stores
        # sum_len = len(flat) (index/build.py), match it
        self.sum_len = int(len(flat))

        from ..index.build import _factorize_sorted

        term_codes, self.term_vocab = _factorize_sorted(flat["term"])
        doc_idx = flat["doc_idx"].to_numpy().astype(np.int64)
        pos = flat["pos"].to_numpy().astype(np.int64)
        order = np.lexsort((doc_idx, term_codes))
        ts, ds, ps = term_codes[order], doc_idx[order], pos[order]

        self.postings: dict[str, tuple[np.ndarray, np.ndarray, list[np.ndarray]]] = {}
        if len(ts):
            new_grp = np.empty(len(ts), dtype=bool)
            new_grp[0] = True
            new_grp[1:] = (ts[1:] != ts[:-1]) | (ds[1:] != ds[:-1])
            gs = np.flatnonzero(new_grp)
            ge = np.append(gs[1:], len(ts))
            tfs = ge - gs
            g_term, g_doc = ts[gs], ds[gs]
            new_term = np.empty(len(gs), dtype=bool)
            new_term[0] = True
            new_term[1:] = g_term[1:] != g_term[:-1]
            t_starts = np.flatnonzero(new_term)
            t_ends = np.append(t_starts[1:], len(gs))
            for a, b in zip(t_starts, t_ends):
                term = self.term_vocab[g_term[a]]
                doc_list = g_doc[a:b]
                tf_list = tfs[a:b].astype(np.int64)
                pos_lists = [
                    ps[gs[j] : ge[j]] for j in range(a, b)
                ]
                self.postings[term] = (doc_list, tf_list, pos_lists)

    # -- stats ---------------------------------------------------------------
    def df(self, term: str) -> int:
        p = self.postings.get(term)
        return 0 if p is None else len(p[0])

    def _cache(self):
        avgdl = bm25.avg_field_length(self.sum_len, self.max_doc)
        return bm25.norm_cache(avgdl)

    # -- search --------------------------------------------------------------
    def search(
        self, query: str, k: int = 10, mode: str = "OR", after=None,
        min_should_match: int = 0,
    ) -> pd.DataFrame:
        q = parse_query(query, mode, analyzer=self.analyzer)
        q.min_should_match = min_should_match
        return self.search_parsed(q, k, after=after)

    def count(self, query: str, mode: str = "OR") -> int:
        q = parse_query(query, mode, analyzer=self.analyzer)
        return int(self._matched_scores(q)[0].sum())

    def matching_docids(self, terms: list[str]) -> np.ndarray:
        """Constant-score union of the given terms' doc sets
        (MultiTermQuery CONSTANT_SCORE rewrite, search/MultiTermQuery.java:64-116)."""
        matched = np.zeros(self.max_doc, dtype=bool)
        for t in terms:
            p = self.postings.get(t)
            if p is not None:
                matched[p[0]] = True
        return np.flatnonzero(matched)

    def expand_prefix(self, prefix: str, max_expansions: int = 1024) -> list[str]:
        return sorted(t for t in self.postings if t.startswith(prefix))[:max_expansions]

    def search_parsed(self, q, k: int = 10, after=None) -> pd.DataFrame:
        matched, scores = self._matched_scores(q)
        ids = np.flatnonzero(matched)
        if after is not None:
            a_s, a_d = np.float32(after[0]), np.int64(after[1])
            s = scores[ids]
            keep = (s < a_s) | ((s == a_s) & (ids > a_d))
            ids = ids[keep]
        if len(ids) == 0:
            return self._empty()
        s = scores[ids]
        order = np.lexsort((ids, -s))[:k]
        ids, s = ids[order], s[order]
        return pd.DataFrame(
            {
                "rank": np.arange(1, len(ids) + 1),
                "docid": ids,
                "url": self.urls[ids],
                "score": s.astype(np.float32),
            }
        )

    def _matched_scores(self, q, parent_boost: float = 1.0) -> tuple[np.ndarray, np.ndarray]:
        cache = self._cache()
        scores = np.zeros(self.max_doc, dtype=np.float32)
        matched = np.zeros(self.max_doc, dtype=bool)
        required_count = np.zeros(self.max_doc, dtype=np.int32)
        optional_count = np.zeros(self.max_doc, dtype=np.int32)
        n_required = 0

        none = np.zeros(self.max_doc, dtype=bool)
        for clause in q.clauses:
            if clause.kind == "bool":
                # nested BooleanQuery: recursive matched/scores over the
                # full doc space; boost multiplies down the tree
                sub_m, sub_s = self._matched_scores(
                    clause.sub, parent_boost * clause.boost
                )
                if not sub_m.any():
                    if clause.required:
                        return none, scores
                    continue
                doc_list = np.flatnonzero(sub_m)
                s = sub_s[doc_list]
            elif clause.kind == "term":
                p = self.postings.get(clause.terms[0])
                if p is None:
                    if clause.required:
                        return none, scores
                    continue
                doc_list, tf_list, _ = p
                wv = bm25.weight_value(
                    bm25.idf(len(doc_list), self.max_doc),
                    boost=clause.boost * parent_boost,
                )
                s = bm25.score_freqs(tf_list, self.norm_bytes[doc_list], cache, wv)
            elif clause.kind == "term_set":
                # constant-score multi-term expansion (MultiTermQuery
                # CONSTANT_SCORE_REWRITE, mirroring the engine kernel):
                # score = boost for docs containing ANY set term
                present = np.zeros(self.max_doc, dtype=bool)
                for t in clause.terms:
                    p = self.postings.get(t)
                    if p is not None:
                        present[p[0]] = True
                if not present.any():
                    if clause.required:
                        return none, scores
                    continue
                doc_list = np.flatnonzero(present)
                s = np.full(
                    len(doc_list),
                    np.float32(clause.boost * parent_boost),
                    np.float32,
                )
            elif clause.kind == "phrase":
                doc_list, freqs = self._phrase_freqs(clause)
                if len(doc_list) == 0:
                    if clause.required:
                        return none, scores
                    continue
                idf_sum = np.float32(0.0)
                for t in clause.terms:
                    idf_sum = np.float32(
                        idf_sum + bm25.idf(self.df(t), self.max_doc)
                    )
                wv = bm25.weight_value(idf_sum, boost=clause.boost * parent_boost)
                s = bm25.score_freqs(freqs, self.norm_bytes[doc_list], cache, wv)
            else:
                raise ValueError(clause.kind)
            # clause-order float32 accumulation
            acc = scores[doc_list]
            scores[doc_list] = (acc + s).astype(np.float32)
            matched[doc_list] = True
            if clause.required:
                n_required += 1
                required_count[doc_list] += 1
            else:
                optional_count[doc_list] += 1

        for term in q.must_not:
            p = self.postings.get(term)
            if p is not None:
                matched[p[0]] = False

        if n_required:
            matched &= required_count == n_required
        if q.min_should_match:
            matched &= optional_count >= q.min_should_match
        return matched, scores

    def _phrase_freqs(self, clause: Clause) -> tuple[np.ndarray, np.ndarray]:
        """Phrase freq per doc: exact alignments, or summed sloppyFreq when
        clause.slop > 0 (shared kernel, search/sloppy.py). Position slots
        may carry alternatives (MultiPhraseQuery): a slot matches at the
        union of its alternatives' positions."""
        alts = clause.alts if getattr(clause, "alts", None) else [
            [t] for t in clause.terms
        ]
        slot_posting: list[list] = []
        for alist in alts:
            ps = [self.postings[t] for t in alist if t in self.postings]
            if not ps:
                return np.zeros(0, np.int64), np.zeros(0, np.int64)
            slot_posting.append(ps)
        # intersect per-slot doc unions
        ids = None
        for ps in slot_posting:
            u = (
                ps[0][0]
                if len(ps) == 1
                else np.unique(np.concatenate([p[0] for p in ps]))
            )
            ids = u if ids is None else ids[np.isin(ids, u, assume_unique=True)]
        out_ids, out_freqs = [], []
        offsets = clause.offsets

        def slot_positions(ps, d):
            arrs = []
            for (doc_list, _tf, pos_lists) in ps:
                j = int(np.searchsorted(doc_list, d))
                if j < len(doc_list) and doc_list[j] == d:
                    arrs.append(pos_lists[j])
            if not arrs:
                return np.zeros(0, np.int64)
            return arrs[0] if len(arrs) == 1 else np.unique(np.concatenate(arrs))

        if clause.slop > 0:
            from ..search.sloppy import sloppy_phrase_freq

            slot_keys = ["|".join(a) for a in alts]
            for d in ids:
                pls = [slot_positions(ps, d) for ps in slot_posting]
                f = sloppy_phrase_freq(pls, offsets, clause.slop,
                                       terms=slot_keys)
                if f > 0:
                    out_ids.append(d)
                    out_freqs.append(f)
            return (np.array(out_ids, dtype=np.int64),
                    np.array(out_freqs, dtype=np.float64))
        for d in ids:
            base = None
            for ps, off in zip(slot_posting, offsets):
                cur = slot_positions(ps, d) - off
                base = cur if base is None else base[np.isin(base, cur, assume_unique=True)]
                if len(base) == 0:
                    break
            if base is not None and len(base) > 0:
                out_ids.append(d)
                out_freqs.append(len(base))
        return np.array(out_ids, dtype=np.int64), np.array(out_freqs, dtype=np.int64)

    def _empty(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "rank": np.zeros(0, np.int64),
                "docid": np.zeros(0, np.int64),
                "url": np.zeros(0, dtype=object),
                "score": np.zeros(0, np.float32),
            }
        )

    # -- explain (CheckHits invariant: explain() == score()) -----------------
    def explain(self, query: str, docid: int, mode: str = "OR") -> dict:
        """Per-clause scoring breakdown for one doc (Explanation analog,
        search/similarities/BM25Similarity.java explainScore)."""
        q = parse_query(query, mode, analyzer=self.analyzer)
        cache = self._cache()
        norm_byte = int(self.norm_bytes[docid])
        details = []
        total = np.float32(0.0)
        matched = False
        for clause in q.clauses:
            freq = 0
            if clause.kind == "term":
                p = self.postings.get(clause.terms[0])
                if p is not None:
                    j = np.searchsorted(p[0], docid)
                    if j < len(p[0]) and p[0][j] == docid:
                        freq = int(p[1][j])
                idf_v = bm25.idf(self.df(clause.terms[0]), self.max_doc)
            else:
                ids_p, freqs = self._phrase_freqs(clause)
                j = np.searchsorted(ids_p, docid)
                if j < len(ids_p) and ids_p[j] == docid:
                    # keep sloppy freq fractional (CheckHits invariant)
                    fv = freqs[j]
                    freq = float(fv) if getattr(clause, "slop", 0) > 0 else int(fv)
                idf_v = np.float32(0.0)
                for t in clause.terms:
                    idf_v = np.float32(idf_v + bm25.idf(self.df(t), self.max_doc))
            wv = bm25.weight_value(idf_v, boost=clause.boost)
            contrib = np.float32(0.0)
            if freq > 0:
                contrib = bm25.score_freqs(
                    np.array([freq]), np.array([norm_byte]), cache, wv
                )[0]
                matched = True
            total = np.float32(total + contrib)
            details.append(
                {
                    "clause": " ".join(clause.terms),
                    "kind": clause.kind,
                    "freq": freq,
                    "idf": float(idf_v),
                    "boost": clause.boost,
                    "weight_value": float(wv),
                    "norm_byte": norm_byte,
                    "score": float(contrib),
                }
            )
        for t in q.must_not:
            p = self.postings.get(t)
            if p is not None and docid in p[0]:
                matched = False
        return {"docid": int(docid), "matched": matched,
                "total": float(total), "details": details}
