"""Solr search-component analogs as native Spark DataFrame plans.

Each function maps one reference component to the idiomatic Catalyst plan
(SURVEY.md §2.9): the facet/stats/grouping layer of Solr becomes
filter + groupBy + window, with broadcast joins for doc-set intersection.
References per function docstring. Everything is built-in F.* expressions —
JVM-side, codegen'd, shuffle only on the grouping keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .sqltext import tokens


def _matching_docs(docs: DataFrame, term: str) -> DataFrame:
    """DocSet of a term filter: semi-join docs against the token relation
    (SimpleFacets computes facets over the filtered DocSet,
    solr/core/src/java/org/apache/solr/request/SimpleFacets.java:256-369)."""
    hits = tokens(docs).where(F.col("term") == term).select("doc_id").distinct()
    return docs.join(F.broadcast(hits), "doc_id", "inner")


def facet_field(docs: DataFrame, term: str, facet_col: str, limit: int = 20) -> DataFrame:
    """facet.field: term counts over the result DocSet (SimpleFacets.java:331)."""
    return (
        _matching_docs(docs, term)
        .groupBy(F.col(facet_col).alias("facet"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("facet"))
        .limit(limit)
    )


def facet_range(docs: DataFrame, term: str, num_col: str, gap: int) -> DataFrame:
    """facet.range: bucketed counts (SimpleFacets.getFacetRangeCounts, :243)."""
    return (
        _matching_docs(docs, term)
        .groupBy((F.floor(F.col(num_col) / gap) * gap).cast("long").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket")
    )


def facet_query(docs: DataFrame, preds: dict[str, str]) -> DataFrame:
    """facet.query: conditional counts per named predicate (SimpleFacets.java:276)."""
    aggs = [
        F.sum(F.when(F.expr(p), 1).otherwise(0)).alias(name)
        for name, p in preds.items()
    ]
    return docs.agg(*aggs)


def pivot_facet(docs: DataFrame, col1: str, col2: str, limit: int = 50) -> DataFrame:
    """pivot facet: nested field1->field2 counts
    (solr/core/.../handler/component/PivotFacetProcessor.java)."""
    return (
        docs.groupBy(F.col(col1).alias("f1"), F.col(col2).alias("f2"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "f1", "f2")
        .limit(limit)
    )


def stats_component(docs: DataFrame, num_col: str, by: str) -> DataFrame:
    """StatsComponent: min/max/sum/count/mean/stddev per facet value
    (solr/core/.../handler/component/StatsValuesFactory.java:110-246)."""
    return (
        docs.groupBy(F.col(by).alias("facet"))
        .agg(
            F.count("*").alias("cnt"),
            F.min(num_col).alias("min_v"),
            F.max(num_col).alias("max_v"),
            F.sum(num_col).cast("long").alias("sum_v"),
            F.round(F.avg(num_col) * 1000).cast("long").alias("mean_milli"),
            F.round(F.stddev_samp(num_col) * 1000).cast("long").alias("stddev_milli"),
            F.countDistinct(num_col).alias("distinct_v"),
        )
        .orderBy("facet")
    )


def grouping_topk(docs: DataFrame, term: str, group_col: str, k: int = 2) -> DataFrame:
    """Grouping module two-pass top-k-per-group, as one window
    (lucene/grouping/.../AbstractSecondPassGroupingCollector.java); ranked by
    the term's tf in the doc, tie-break doc_id asc."""
    tf = (
        tokens(docs)
        .where(F.col("term") == term)
        .groupBy("doc_id")
        .agg(F.count("*").alias("tf"))
    )
    j = docs.join(F.broadcast(tf), "doc_id", "inner")
    w = Window.partitionBy(group_col).orderBy(F.desc("tf"), F.asc("doc_id"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(F.col(group_col).alias("grp"), "doc_id", "tf", "rn")
        .orderBy("grp", "rn")
    )


def collapse_top1(docs: DataFrame, group_col: str, sort_col: str) -> DataFrame:
    """CollapsingQParserPlugin: field-collapse keeping the max-sort doc
    (solr/core/.../search/CollapsingQParserPlugin.java)."""
    w = Window.partitionBy(group_col).orderBy(F.desc(sort_col), F.asc("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col(group_col).alias("grp"), "doc_id", F.col(sort_col).alias("sort_v"))
        .orderBy("grp")
    )


def terms_component(docs: DataFrame, prefix: str, limit: int = 30) -> DataFrame:
    """TermsComponent: dictionary scan by prefix -> (term, df, ttf)
    (solr/core/.../handler/component/TermsComponent.java). On the segment
    index this is a postings-metadata scan; here over the token relation."""
    return (
        tokens(docs)
        .where(F.col("term").startswith(prefix))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"), F.count("*").alias("ttf"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(limit)
    )


def fuzzy_terms(docs: DataFrame, target: str, max_edits: int = 1) -> DataFrame:
    """FuzzyQuery term expansion: dictionary terms within edit distance
    (search/FuzzyQuery.java:54-56, FuzzyTermsEnum) -> (term, df)."""
    return (
        tokens(docs)
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.levenshtein(F.col("term"), F.lit(target)) <= max_edits)
        .orderBy("term")
    )


def dismax_topk(docs: DataFrame, term_a: str, term_b: str, k: int = 10,
                tie_milli: int = 100) -> DataFrame:
    """DisjunctionMaxQuery: max clause score + tieBreaker * others
    (search/DisjunctionMaxQuery.java:45-54), on integer tf*1000 impacts so
    the result is exactly reproducible in any engine."""
    t = (
        tokens(docs)
        .where(F.col("term").isin([term_a, term_b]))
        .groupBy("doc_id")
        .pivot("term", [term_a, term_b])
        .agg(F.count(F.lit(1)))
        .fillna(0)
        .withColumnRenamed(term_a, "tf_a")
        .withColumnRenamed(term_b, "tf_b")
    )
    mx = F.greatest(F.col("tf_a"), F.col("tf_b")) * 1000
    mn = F.least(F.col("tf_a"), F.col("tf_b")) * tie_milli
    return (
        t.withColumn("dismax_milli", (mx + mn).cast("long"))
        .where(F.col("dismax_milli") > 0)
        .select("doc_id", "tf_a", "tf_b", "dismax_milli")
        .orderBy(F.desc("dismax_milli"), F.asc("doc_id"))
        .limit(k)
    )


def boolean_not_count(docs: DataFrame, must: str, must_not: str) -> DataFrame:
    """ReqExclScorer (AND NOT) as semi-join + anti-join (search/ReqExclScorer.java)."""
    toks = tokens(docs)
    pos = toks.where(F.col("term") == must).select("doc_id").distinct()
    neg = toks.where(F.col("term") == must_not).select("doc_id").distinct()
    return (
        pos.join(neg, "doc_id", "left_anti")
        .agg(F.count("*").alias("cnt"))
    )


def join_query(docs: DataFrame, term: str, join_col: str) -> DataFrame:
    """JoinUtil query-time join: docs whose ``join_col`` value appears in the
    docs matching ``term`` (lucene/join/.../JoinUtil.java) -> count per value."""
    hit_vals = (
        _matching_docs(docs, term).select(join_col).distinct()
    )
    return (
        docs.join(F.broadcast(hit_vals), join_col, "left_semi")
        .groupBy(F.col(join_col).alias("join_val"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("join_val")
    )


def block_join_parent_topk(
    parents: DataFrame,
    children: DataFrame,
    join_key: str,
    child_filter: str,
    child_score_col: str,
    score_mode: str = "max",
    k: int = 10,
) -> DataFrame:
    """ToParentBlockJoinQuery: parents whose children match a child query,
    parent score = ScoreMode aggregate of matching-child scores
    (lucene/join/src/java/org/apache/lucene/search/join/
    ToParentBlockJoinQuery.java, ScoreMode max/total/avg/none).

    Lucene stores parent+children contiguously in one segment block; the
    relational restatement is a keyed aggregation — the child filter and
    the aggregate both shuffle ONCE on the join key, and the parent join
    is broadcast-eligible when the matching-parent set is selective."""
    agg = {
        "max": F.max, "total": F.sum, "avg": F.avg, "min": F.min,
        "none": lambda c: F.lit(1.0),
    }[score_mode]
    child_scores = (
        children.where(child_filter)
        .groupBy(join_key)
        .agg(
            agg(F.col(child_score_col)).alias("_score"),
            F.count("*").alias("n_children"),
        )
    )
    return (
        parents.join(child_scores, join_key)
        .select(
            join_key,
            "n_children",
            F.round(F.col("_score").cast("double") * 100).cast("long").alias("score_cents"),
        )
        .orderBy(F.desc("score_cents"), F.asc(join_key))
        .limit(k)
    )


def sort_by_field_topk(docs: DataFrame, term: str, sort_col: str, k: int = 10) -> DataFrame:
    """TopFieldCollector: top-k of the matching doc set by a field sort
    (search/TopFieldCollector.java; Spark plans it as TakeOrderedAndProject)."""
    return (
        _matching_docs(docs, term)
        .select("doc_id", F.col(sort_col).alias("sort_v"))
        .orderBy(F.desc("sort_v"), F.asc("doc_id"))
        .limit(k)
    )


def highlight_best_window(
    docs: DataFrame, terms: list[str], window: int = 10, limit: int = 25
) -> DataFrame:
    """PostingsHighlighter passage selection over ANALYZED positions
    (postingshighlight/PostingsHighlighter.java, passage scoring reduced to
    match counts): for each matching doc, the densest ``window``-token
    passage anchored at a match position. Runs on the token relation — the
    same analyzed stream the index stores — so case/tokenization agree
    with search, unlike raw-substring locate. One self-join shuffled on
    doc_id; scales as O(matches per doc * window)."""
    toks = tokens(docs)
    return (
        _best_window_per_doc(toks, terms, window)
        .select("doc_id", "best_start", "best_m")
        .orderBy("doc_id")
        .limit(limit)
    )


def _best_window_per_doc(toks: DataFrame, terms: list[str], window: int) -> DataFrame:
    """Densest ``window``-token passage per doc over a token relation:
    (doc_id, best_start, best_m) — the shared core of the single-field and
    qf-aware highlighters."""
    hits = toks.where(F.col("term").isin(list(terms))).select("doc_id", "pos")
    a, b = hits.alias("a"), hits.alias("b")
    win = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & F.col("b.pos").between(F.col("a.pos"), F.col("a.pos") + window - 1),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"), F.col("a.pos").alias("start"))
        .agg(F.count("*").alias("m"))
    )
    best = (
        win.groupBy("doc_id").agg(F.max("m").alias("best_m"))
    )
    return (
        win.join(best, "doc_id")
        .where(F.col("m") == F.col("best_m"))
        .groupBy("doc_id", "best_m")
        .agg(F.min("start").alias("best_start"))
        .select("doc_id", F.col("best_start").cast("long"), F.col("best_m").cast("long"))
    )


def highlight_best_window_fields(
    docs: DataFrame,
    terms: list[str],
    field_cols: dict[str, str],
    window: int = 10,
    limit: int = 50,
) -> DataFrame:
    """qf-aware highlighting (Solr hl.fl over the edismax qf fields,
    solr/core/.../highlight/DefaultSolrHighlighter.java field loop): one
    passage selection per (field, doc) — each field analyzed with the same
    chain as its index field, windows chosen independently per field.
    ``field_cols`` maps field name -> docs column holding its text.
    Per field this is the same one-shuffle window self-join as
    highlight_best_window; fields union without an extra shuffle."""
    parts = []
    for fname in sorted(field_cols):
        toks = tokens(docs, text_col=field_cols[fname])
        parts.append(
            _best_window_per_doc(toks, terms, window)
            .select(F.lit(fname).alias("field"), "doc_id",
                    "best_start", "best_m")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("field", "doc_id").limit(limit)


def analyzed_snippets(
    texts, query_terms: set[str], analyzer: str = "standard", window: int = 10
) -> list[str | None]:
    """Char-offset snippet extraction (the PostingsHighlighter formatting
    half): tokenize with char spans, analyze each token with the SAME chain
    as the index (so 'Merging' highlights for query 'merge' under the
    english analyzer), pick the densest ``window``-token passage, wrap
    matches in <em>. Pandas-side; meant to run over the k WINNING docs of
    a search (two-phase: positions select passages at scale, only final
    page hits pay string work)."""
    import pandas as pd

    from ..analysis import analyze_one
    from ..analysis.text import _token_pattern_for

    out: list[str | None] = []
    qset = set(query_terms)
    for text in texts:
        spans = [(m.start(), m.end(), m.group(0))
                 for m in _token_pattern_for(text).finditer(text)]
        if not spans:
            out.append(None)
            continue
        flags = []
        for _, _, tok in spans:
            toks = analyze_one(tok, analyzer=analyzer)
            flags.append(bool(toks) and toks[0][0] in qset)
        flags_np = [i for i, f in enumerate(flags) if f]
        if not flags_np:
            out.append(None)
            continue
        # densest window anchored at a match
        best_i, best_m = flags_np[0], 0
        for i in flags_np:
            m = sum(1 for j in flags_np if i <= j < i + window)
            if m > best_m:
                best_i, best_m = i, m
        lo = spans[best_i][0]
        hi_tok = min(best_i + window, len(spans)) - 1
        hi = spans[hi_tok][1]
        # wrap matches inside the passage, right-to-left to keep offsets
        snippet = text[lo:hi]
        for i in reversed(range(best_i, hi_tok + 1)):
            if flags[i]:
                s, e, _ = spans[i]
                snippet = (
                    snippet[: s - lo] + "<em>" + snippet[s - lo : e - lo]
                    + "</em>" + snippet[e - lo :]
                )
        out.append(snippet)
    return out


def highlight(docs: DataFrame, term: str, before: int = 20, width: int = 50) -> DataFrame:
    """Postings-highlighter shape (lucene/highlighter/): a snippet window
    around the first occurrence for each matching doc."""
    loc = F.locate(term, F.col("text"))
    return (
        docs.where(loc > 0)
        .select(
            "doc_id",
            F.substring(
                F.col("text"), F.greatest(F.lit(1), loc - before), width
            ).alias("snippet"),
        )
        .orderBy("doc_id")
    )


def suggest(docs: DataFrame, prefix: str, n: int = 5) -> DataFrame:
    """Suggester/autocomplete: prefix -> top terms by total term frequency
    (lucene/suggest/ AnalyzingSuggester shape over the terms dictionary)."""
    return (
        tokens(docs)
        .where(F.col("term").startswith(prefix))
        .groupBy("term")
        .agg(F.count("*").alias("ttf"))
        .orderBy(F.desc("ttf"), F.asc("term"))
        .limit(n)
    )


def spellcheck(docs: DataFrame, wrong: str, n: int = 3) -> DataFrame:
    """DirectSpellChecker shape (solr/core/.../spelling/): nearest dictionary
    terms by edit distance, more frequent first."""
    return (
        tokens(docs)
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(wrong)))
        .where(F.col("dist") <= 2)
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(n)
    )


def function_query_topk(docs: DataFrame, k: int = 10) -> DataFrame:
    """FunctionQuery / ValueSource scoring (solr ValueSourceParser 'recip':
    recip(x,m,a,b) = a/(m*x+b)): rank docs by a field arithmetic expression
    (lucene/queries/.../function/FunctionQuery.java)."""
    score = F.round(
        F.lit(1000.0) * 300.0 / (300.0 + F.abs(F.col("n_chars") - 300))
    ).cast("long")
    return (
        docs.select("doc_id", score.alias("fq_milli"))
        .orderBy(F.desc("fq_milli"), F.asc("doc_id"))
        .limit(k)
    )


def more_like_this(docs: DataFrame, seed_doc: int, n_terms: int = 5, k: int = 10) -> DataFrame:
    """MoreLikeThis (lucene/queries/.../mlt/MoreLikeThis.java): extract the
    seed doc's top terms, then rank other docs by shared-term frequency
    (integer scoring profile so any engine reproduces it exactly)."""
    t = tokens(docs)
    seed_terms = (
        t.where(F.col("doc_id") == seed_doc)
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(n_terms)
        .select("term")
    )
    return (
        t.join(F.broadcast(seed_terms), "term")
        .where(F.col("doc_id") != seed_doc)
        .groupBy("doc_id")
        .agg(F.count("*").alias("mlt_score"))
        .orderBy(F.desc("mlt_score"), F.asc("doc_id"))
        .limit(k)
    )


def rescore_topk(docs: DataFrame, first_term: str, boost_term: str,
                 first_n: int = 30, k: int = 10) -> DataFrame:
    """QueryRescorer (search/QueryRescorer.java): take top-N of a cheap
    first-pass query, re-rank with a second query's contribution."""
    t = tokens(docs)
    tf = lambda term, name: (
        t.where(F.col("term") == term).groupBy("doc_id").agg(F.count("*").alias(name))
    )
    first = (
        tf(first_term, "tf1")
        .orderBy(F.desc("tf1"), F.asc("doc_id"))
        .limit(first_n)
    )
    return (
        first.join(tf(boost_term, "tf2"), "doc_id", "left")
        .fillna(0)
        .withColumn("rescore_milli", (F.col("tf1") * 1000 + F.col("tf2") * 500).cast("long"))
        .select("doc_id", "tf1", "tf2", "rescore_milli")
        .orderBy(F.desc("rescore_milli"), F.asc("doc_id"))
        .limit(k)
    )
