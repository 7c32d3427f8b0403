"""Minimal Lucene-style boolean query model + parser.

Models the BooleanQuery clause algebra (search/BooleanQuery.java:343-470):
required (+/AND mode), optional (OR mode, SHOULD), prohibited (-term,
MUST_NOT) clauses, plus exact quoted phrases (PhraseQuery with
position-gap-preserving offsets). Scores are plain sums of clause scores —
coord and queryNorm are 1 for BM25 (similarities/Similarity.java:121,138).

Rewrites applied at parse time (the Query.rewrite fixpoint of
search/IndexSearcher.java:516-522, here trivially single-pass):
  - single-term phrase -> term clause
  - clause analyzed to nothing (stopwords only) -> dropped
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..analysis import analyze_one


@dataclass
class Clause:
    # "term" | "phrase" | "wildcard" | "regexp" (pre-rewrite multi-term
    # queries, terms=[pattern]) | "term_set" (post-rewrite constant-score
    # expansion, MultiTermQuery CONSTANT_SCORE_REWRITE,
    # search/MultiTermQuery.java:64-116)
    kind: str
    terms: list[str]
    offsets: list[int] = field(default_factory=list)  # phrase position offsets
    required: bool = False
    boost: float = 1.0  # query-time boost (weight = idf * boost, BM25Stats.normalize)
    slop: int = 0  # phrase proximity (PhraseQuery.setSlop; 0 = exact)
    # MultiPhraseQuery (search/MultiPhraseQuery.java): alternatives per
    # phrase position ("a|b c" -> [[a, b], [c]]). None for plain phrases;
    # when set, `terms` holds the flattened alternatives (stats/scan list)
    # and the weight sums idfs over ALL alternatives, as the reference does.
    alts: list[list[str]] | None = None


@dataclass
class Query:
    clauses: list[Clause]
    must_not: list[str] = field(default_factory=list)
    # BooleanQuery.setMinimumNumberShouldMatch (search/BooleanQuery.java:158,
    # scorer: MinShouldMatchSumScorer.java:36-48): optional-clause quota
    min_should_match: int = 0
    # DisjunctionMaxQuery tie-breaker (search/DisjunctionMaxQuery.java:45-54):
    # when set, score = max(clause scores) + tie * (sum of the others)
    # instead of the BooleanQuery sum
    dismax_tie: float | None = None

    @property
    def all_terms(self) -> list[str]:
        out = [t for c in self.clauses for t in c.terms]
        out.extend(self.must_not)
        return out


_SEGMENT_RE = re.compile(r"\"([^\"]*)\"|(\S+)")
# "phrase"~slop^boost / term^boost syntax (Lucene query parser)
_BOOSTED_SEGMENT_RE = re.compile(
    r"\"([^\"]*)\"(?:~(\d+))?(?:\^(\d+(?:\.\d+)?))?|(\S+)"
)
_BOOST_SUFFIX_RE = re.compile(r"\^(\d+(?:\.\d+)?)$")


def parse_query(text: str, mode: str = "OR", analyzer: str = "standard") -> Query:
    """Parse free text with optional "quoted phrases", +required, -prohibited.

    mode="AND" makes every non-phrase, non-prefixed clause required
    (conjunctive); mode="OR" leaves them optional (disjunctive).
    """
    required_default = mode.upper() == "AND"
    clauses: list[Clause] = []
    must_not: list[str] = []
    for m in _BOOSTED_SEGMENT_RE.finditer(text):
        phrase, pslop, pboost, word = m.group(1), m.group(2), m.group(3), m.group(4)
        if phrase is not None:
            boost = float(pboost) if pboost else 1.0
            slop = int(pslop) if pslop else 0
            if "|" in phrase:
                # MultiPhraseQuery syntax: "a|b c" = (a OR b) then c.
                # Each alternative analyzes independently; a slot whose
                # alternatives all analyze away drops the clause.
                slots: list[list[str]] = []
                ok = True
                for word in phrase.split():
                    alts_here: list[str] = []
                    for alt in word.split("|"):
                        t = analyze_one(alt, analyzer=analyzer)
                        if t:
                            alts_here.append(t[0][0])
                    if not alts_here:
                        ok = False
                        break
                    slots.append(sorted(set(alts_here)))
                if not ok or not slots:
                    continue
                if len(slots) == 1 and len(slots[0]) == 1:
                    clauses.append(
                        Clause("term", [slots[0][0]],
                               required=required_default, boost=boost)
                    )
                else:
                    clauses.append(
                        Clause(
                            "phrase",
                            [t for s in slots for t in s],
                            offsets=list(range(len(slots))),
                            required=required_default,
                            boost=boost,
                            slop=slop,
                            alts=slots,
                        )
                    )
                continue
            toks = analyze_one(phrase, analyzer=analyzer)
            if not toks:
                continue
            if len(toks) == 1:
                clauses.append(
                    Clause("term", [toks[0][0]], required=required_default, boost=boost)
                )
            else:
                base = toks[0][1]
                clauses.append(
                    Clause(
                        "phrase",
                        [t for t, _ in toks],
                        offsets=[p - base for _, p in toks],
                        required=required_default,
                        boost=boost,
                        slop=slop,
                    )
                )
        else:
            req = required_default
            neg = False
            boost = 1.0
            if word.startswith("+"):
                req, word = True, word[1:]
            elif word.startswith("-"):
                neg, word = True, word[1:]
            bm = _BOOST_SUFFIX_RE.search(word)
            if bm:
                boost = float(bm.group(1))
                word = word[: bm.start()]
            # /regex/ -> RegexpQuery; * or ? -> WildcardQuery. Multi-term
            # patterns are NOT analyzed (QueryParserBase.getWildcardQuery
            # semantics), only lowercased; the searcher rewrites them
            # against the terms dictionary at search time.
            if not neg and len(word) > 1 and word.startswith("/") and word.endswith("/"):
                clauses.append(
                    Clause("regexp", [word[1:-1].lower()], required=req, boost=boost)
                )
                continue
            if not neg and ("*" in word or "?" in word):
                clauses.append(
                    Clause("wildcard", [word.lower()], required=req, boost=boost)
                )
                continue
            toks = analyze_one(word, analyzer=analyzer)
            if not toks:
                continue
            for t, _ in toks:
                if neg:
                    must_not.append(t)
                else:
                    clauses.append(Clause("term", [t], required=req, boost=boost))
    return Query(clauses, must_not)
