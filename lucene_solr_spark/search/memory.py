"""Single-document in-memory index + percolation.

lucene/memory/ MemoryIndex indexes ONE document into RAM so queries can be
matched against it — the percolator pattern (reverse search: a stream of
documents, each tested against a registered query set). The pandas oracle
searcher already IS an exact in-memory engine sharing every scoring
kernel, so:

- MemoryIndex wraps a one-document OracleSearcher (match + score).
- percolate() runs the registered queries over a document STREAM as one
  mapInPandas: each Arrow batch is indexed once (a batch-level memory
  index — strictly better than per-doc), every query runs against it, and
  (doc, query) match rows stream out. Queries ship in the closure
  (broadcast), documents never leave their partition — the percolation
  shape that holds at 100 TB.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, types as T


class MemoryIndex:
    """One-document in-memory index (MemoryIndex.java semantics: analyze,
    hold postings in RAM, answer match/score queries)."""

    def __init__(self, text: str, analyzer: str = "standard"):
        from ..oracle import OracleSearcher

        self._o = OracleSearcher(
            pd.DataFrame({"url": ["doc"], "text": [text]}), analyzer=analyzer
        )

    def matches(self, query: str, mode: str = "OR") -> bool:
        return self._o.count(query, mode) > 0

    def score(self, query: str, mode: str = "OR") -> float:
        df = self._o.search(query, 1, mode)
        return float(df["score"].iloc[0]) if len(df) else 0.0


def query_could_match(q, vocab) -> bool:
    """Percolator pre-filter (the required-term index trick of the
    reference percolator): decide from the BATCH VOCABULARY alone whether
    a registered query can possibly match, without running the engine.

    - a required term/phrase clause whose term(s) miss the vocab -> False
    - otherwise, if any positive clause could match -> True
    - a query with no positive clauses (pure must_not / match-all) -> True
      (conservative)
    """

    def clause_possible(c) -> bool:
        if c.kind == "term":
            return c.terms[0] in vocab
        if c.kind == "phrase":
            slots = c.alts if getattr(c, "alts", None) else [[t] for t in c.terms]
            return all(any(t in vocab for t in sl) for sl in slots)
        if c.kind == "term_set":
            return any(t in vocab for t in c.terms)
        if c.kind == "bool" and c.sub is not None:
            return query_could_match(c.sub, vocab)
        return True  # unknown kinds: conservative

    if not q.clauses:
        return True
    for c in q.clauses:
        if c.required and not clause_possible(c):
            return False
    opt = [c for c in q.clauses if not c.required]
    req = [c for c in q.clauses if c.required]
    if req:
        return True  # all required clauses possible
    return any(clause_possible(c) for c in opt)


def rewrite_against_vocab(q, vocab_sorted):
    """Multiterm rewrite against an in-memory vocabulary (the percolation
    batch is its own terms dictionary): wildcard/regexp -> constant-score
    term_set, fuzzy -> boosted scored expansion, prohibited patterns ->
    must_not terms — the same rewrite semantics as the segment engine's
    dictionary scan, so MemoryIndex matches what the index would match.
    Returns None when a required pattern matches nothing."""
    import re as _re

    import numpy as np

    from .engine import SparkSearcher, _levenshtein, _query_has
    from .query import Clause, Query

    if not _query_has(q, ("wildcard", "regexp", "fuzzy")) and not getattr(
        q, "must_not_patterns", None
    ):
        return q
    vocab = list(vocab_sorted)

    def expand(kind, pat):
        if kind == "wildcard":
            rx = _re.compile(SparkSearcher.wildcard_to_regex(pat))
        else:
            rx = _re.compile(f"^(?:{pat})$")
        return [t for t in vocab if rx.match(t)]

    out = []
    for c in q.clauses:
        if c.kind == "bool":
            sub = rewrite_against_vocab(c.sub, vocab)
            if sub is None:
                if c.required:
                    return None
                continue
            out.append(Clause("bool", [], required=c.required, boost=c.boost,
                              sub=sub))
            continue
        if c.kind == "fuzzy":
            tl = len(c.terms[0])
            cands = []
            for t in vocab:
                ed = _levenshtein(t, c.terms[0], c.fuzzy_edits)
                if ed <= c.fuzzy_edits:
                    cands.append((t, 1.0 - ed / min(len(t), tl)))
            cands.sort(key=lambda kv: (-kv[1], kv[0]))
            cands = cands[:50]
            if not cands:
                if c.required:
                    return None
                continue
            sub = Query([Clause("term", [t], boost=b) for t, b in cands])
            out.append(Clause("bool", [], required=c.required, boost=c.boost,
                              sub=sub))
            continue
        if c.kind in ("wildcard", "regexp"):
            terms = expand(c.kind, c.terms[0])
            if not terms:
                if c.required:
                    return None
                continue
            out.append(Clause("term_set", terms, required=c.required,
                              boost=c.boost))
            continue
        out.append(c)
    mn = list(q.must_not)
    for kind, pat in getattr(q, "must_not_patterns", ()):
        mn.extend(expand(kind, pat))
    if not out:
        return None
    return Query(out, mn, q.min_should_match, dismax_tie=q.dismax_tie)


def percolate(
    docs: DataFrame,
    queries: list[str],
    analyzer: str = "standard",
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "OR",
) -> DataFrame:
    """Match every document against every registered query.

    Returns (doc_id, query_id) rows for each (document, query) match,
    ordered by (doc_id, query_id). Queries support the full parser
    surface; wildcard/regexp/fuzzy patterns rewrite per batch against the
    BATCH's own vocabulary (the memory index IS the terms dictionary)."""
    from ..oracle import OracleSearcher

    qs = list(queries)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("query_id", T.IntegerType()),
    ])

    from .query import parse_query

    # queries parse ONCE (driver side, shipped in the closure) and each
    # carries its pre-filter term set
    parsed = [parse_query(q, mode, analyzer) for q in qs]

    def run(it):
        import numpy as np

        for pdf in it:
            if not len(pdf):
                continue
            # batch-level memory index: url = zero-padded batch position so
            # oracle docids == positions
            frame = pd.DataFrame({
                "url": [f"{i:09d}" for i in range(len(pdf))],
                "text": pdf[text_col].to_numpy(),
            })
            o = OracleSearcher(frame, analyzer=analyzer)
            # required-term pre-filter: only queries whose terms appear in
            # the batch vocabulary reach the engine — at 10^4+ registered
            # queries this is the difference between O(batches x queries)
            # engine runs and O(batches x live queries)
            vocab = set(o.postings.keys())
            vocab_sorted = sorted(vocab)
            ids = pdf[id_col].to_numpy()
            out_doc, out_q = [], []
            for qi, q in enumerate(parsed):
                if not query_could_match(q, vocab):
                    continue
                qr = rewrite_against_vocab(q, vocab_sorted)
                if qr is None:
                    continue
                matched, _ = o._matched_scores(qr)
                for j in np.flatnonzero(matched):
                    out_doc.append(int(ids[j]))
                    out_q.append(qi)
            yield pd.DataFrame({"doc_id": out_doc, "query_id": out_q})

    return (
        docs.select(id_col, text_col)
        .mapInPandas(run, schema)
        .orderBy("doc_id", "query_id")
    )
