"""Solr function-query parser + registry.

The reference registers ~54 value-source parsers by name
(solr/core/src/java/org/apache/solr/search/ValueSourceParser.java:85+,
`addParser("abs", ...)` etc). This module restates the standard arithmetic
/ conditional / distance core as a recursive-descent parser producing
Catalyst Column expressions — every function stays JVM-side, codegen'd,
no UDFs.

Implemented names (each mapping to the reference parser of the same
name): sum add sub product mul div abs min max pow sqrt log ln exp floor
ceil mod neg recip linear map if not and or xor eq gt gte lt lte strdist
ms def exists geodist const literal field — as pure Column expressions;
PLUS the join-backed sources below (apply_funcquery): ord rord tf docfreq
idf norm query — compiled as pre-joined auxiliary columns (distinct-rank
broadcast, tokens-relation joins, constant folding, engine subquery
scores), never an unpartitioned window over the corpus.

`scale(x, lo, hi)` IS included: it needs the column's global min/max, so
it compiles to an agg + crossJoin(broadcast) — the documented two-pass
shape, not an unpartitioned window.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

_TOKEN = re.compile(
    r"\s*(?:(\d+\.?\d*(?:[eE][+-]?\d+)?)|([A-Za-z_][\w.]*)|([(),])"
    r"|\"([^\"]*)\"|'([^']*)')"
)


class _Parser:
    def __init__(self, text: str):
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN.match(text, pos)
            if m is None:
                if text[pos:].strip() == "":
                    break
                raise ValueError(f"funcquery: bad syntax at {text[pos:]!r}")
            num, name, punct, s, s1 = m.groups()
            if num is not None:
                self.toks.append(("num", num))
            elif name is not None:
                self.toks.append(("name", name))
            elif punct is not None:
                self.toks.append(("punct", punct))
            else:
                self.toks.append(("str", s if s is not None else s1))
            pos = m.end()
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse_expr(self):
        kind, val = self.next()
        if kind == "num":
            return ("num", float(val))
        if kind == "str":
            return ("str", val)
        if kind == "name":
            if self.peek() == ("punct", "("):
                self.next()
                args = []
                if self.peek() != ("punct", ")"):
                    args.append(self.parse_expr())
                    while self.peek() == ("punct", ","):
                        self.next()
                        args.append(self.parse_expr())
                if self.next() != ("punct", ")"):
                    raise ValueError(f"funcquery: expected ')' in {val}")
                return ("call", val, args)
            return ("field", val)
        raise ValueError(f"funcquery: unexpected token {val!r}")


def _binfold(f, args):
    out = args[0]
    for a in args[1:]:
        out = f(out, a)
    return out


_REGISTRY = {
    # arithmetic (ValueSourceParser addParser names)
    "sum": lambda a: _binfold(lambda x, y: x + y, a),
    "add": lambda a: _binfold(lambda x, y: x + y, a),
    "sub": lambda a: a[0] - a[1],
    "product": lambda a: _binfold(lambda x, y: x * y, a),
    "mul": lambda a: _binfold(lambda x, y: x * y, a),
    "div": lambda a: a[0] / a[1],
    "abs": lambda a: F.abs(a[0]),
    "min": lambda a: F.least(*a),
    "max": lambda a: F.greatest(*a),
    "pow": lambda a: F.pow(a[0], a[1]),
    "sqrt": lambda a: F.sqrt(a[0]),
    "log": lambda a: F.log10(a[0]),
    "ln": lambda a: F.log(a[0]),
    "exp": lambda a: F.exp(a[0]),
    "floor": lambda a: F.floor(a[0]),
    "ceil": lambda a: F.ceil(a[0]),
    "mod": lambda a: a[0] % a[1],
    "neg": lambda a: -a[0],
    # recip(x,m,a,b) = a / (m*x + b)  (ValueSourceParser "recip")
    "recip": lambda a: a[2] / (a[0] * a[1] + a[3]),
    # linear(x,m,c) = m*x + c
    "linear": lambda a: a[0] * a[1] + a[2],
    # map(x,min,max,target[,default]) — x in [min,max] -> target
    "map": lambda a: F.when(a[0].between(a[1], a[2]), a[3]).otherwise(
        a[4] if len(a) > 4 else a[0]
    ),
    # conditionals
    "if": lambda a: F.when(a[0], a[1]).otherwise(a[2]),
    "not": lambda a: ~a[0],
    "and": lambda a: _binfold(lambda x, y: x & y, a),
    "or": lambda a: _binfold(lambda x, y: x | y, a),
    "eq": lambda a: a[0] == a[1],
    "gt": lambda a: a[0] > a[1],
    "gte": lambda a: a[0] >= a[1],
    "lt": lambda a: a[0] < a[1],
    "lte": lambda a: a[0] <= a[1],
    # strdist(a,b,"edit"): only the edit-distance family (others need
    # libraries) — returns the Solr similarity 1 - dist/maxlen
    "strdist": lambda a: F.lit(1.0)
    - F.levenshtein(a[0], a[1])
    / F.greatest(F.length(a[0]), F.length(a[1])),
    # ms(a[,b]): millisecond difference (b defaults to epoch)
    "ms": lambda a: (
        F.unix_millis(a[0]) - (F.unix_millis(a[1]) if len(a) > 1 else F.lit(0))
    ),
    # def(x, fallback): x unless null (DefFunction)
    "def": lambda a: F.coalesce(a[0], a[1]),
    # exists(x): field has a value (ExistsValueSource)
    "exists": lambda a: a[0].isNotNull(),
    # xor: Solr's XOrFunction coerces operands to booleans (BoolFunction
    # truthiness); boolean XOR == boolean inequality
    "xor": lambda a: _binfold(
        lambda x, y: x.cast("boolean") != y.cast("boolean"), a
    ),
}


def _geodist(a):
    # geodist(lat_a, lon_a, lat_b, lon_b) in km (GeoDistValueSourceParser;
    # wired to the spatial module's haversine)
    from .spatial import haversine_km

    return haversine_km(a[0], a[1], a[2], a[3])


_REGISTRY["geodist"] = _geodist

_NEEDS_RECT = {"recip": (1, 2, 3), "linear": (1, 2)}  # literal positions kept raw


def compile_func(expr: str, df: DataFrame | None = None) -> Column:
    """Compile a Solr function-query string to a Column.

    ``df`` is required only by two-pass sources (scale)."""
    tree = _Parser(expr).parse_expr()
    return _compile(tree, df)


def _compile(node, df) -> Column:
    kind = node[0]
    if kind == "num":
        return F.lit(node[1])
    if kind == "str":
        return F.lit(node[1])
    if kind == "field":
        if node[1] == "NOW":
            raise ValueError(
                "funcquery: NOW must be bound by the caller for determinism "
                "(pass e.g. ms(\"2026-01-01\", ts))"
            )
        return F.col(node[1])
    _, name, args = node
    if name == "scale":
        # scale(x, lo, hi): two-pass — global min/max agg + broadcast join
        if df is None:
            raise ValueError("funcquery: scale() needs the DataFrame context")
        x = _compile(args[0], df)
        lo = _compile(args[1], df)
        hi = _compile(args[2], df)
        stats = df.agg(
            F.min(x).alias("_mn"), F.max(x).alias("_mx")
        ).collect()[0]
        mn, mx = float(stats["_mn"]), float(stats["_mx"])
        rng = (mx - mn) or 1.0
        return (x - F.lit(mn)) / F.lit(rng) * (hi - lo) + lo
    fn = _REGISTRY.get(name)
    if fn is None:
        raise ValueError(
            f"funcquery: unknown function {name!r} "
            f"(registry: {sorted(_REGISTRY)} + scale)"
        )
    return fn([_compile(a, df) for a in args])


# ---------------------------------------------------------------------------
# join-requiring value sources: ord/rord, tf/docfreq/idf/norm, query()
# (ValueSourceParser addParser names backed by index statistics rather than
# row-local arithmetic — compiled as pre-joined auxiliary columns)
# ---------------------------------------------------------------------------

_DOC_SOURCES = {"ord", "rord", "tf", "norm", "query", "geodist"}
_CONST_SOURCES = {"docfreq", "idf"}


def _collect_sources(node, found):
    kind = node[0]
    if kind == "call":
        _, name, args = node
        if name in _DOC_SOURCES - {"geodist"} or name in _CONST_SOURCES:
            found.append(node)
            return
        for a in args:
            _collect_sources(a, found)


def _replace_node(node, mapping):
    if id(node) in mapping:
        return mapping[id(node)]
    if node[0] == "call":
        _, name, args = node
        return ("call", name, [_replace_node(a, mapping) for a in args])
    return node


def apply_funcquery(
    df: DataFrame,
    expr: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    searcher=None,
    alias: str = "func",
) -> DataFrame:
    """Evaluate a function query that may use index-statistics sources
    (the ValueSourceParser names the plain Column compiler cannot express):

      ord(f)/rord(f)   — 1-based ordinal of the row's f value among the
                         sorted distinct values (OrdFieldSource semantics);
                         two-pass: distinct + row_number window over the
                         (bounded) distinct set, broadcast back — never an
                         unpartitioned window over the corpus
      tf(f, 'term')    — per-doc analyzed term frequency (TFValueSource);
                         tokens-relation groupBy + left join
      docfreq/idf(f,'term') — global constants folded to literals
                         (DocFreqValueSource / IDFValueSource)
      norm(f)          — the SmallFloat-quantized field length the BM25
                         kernel scores with (NormValueSource profile):
                         dl -> quantized length via a broadcast range join
      query('q')       — the engine score of a subquery per doc, 0 if no
                         match (QueryValueSource); requires ``searcher``
                         whose docids align with ``id_col``

    Returns ``df`` with the compiled expression as column ``alias``.
    """
    from ..search import bm25
    from .sqltext import tokens

    tree = _Parser(expr).parse_expr()
    found: list = []
    _collect_sources(tree, found)
    out = df
    mapping: dict = {}
    n_docs = None
    for i, node in enumerate(found):
        _, name, args = node
        aux = f"__fq_aux{i}"
        if name in ("ord", "rord"):
            fld = args[0][1]
            from pyspark.sql import Window

            distinct = df.select(fld).distinct()
            w = Window.orderBy(F.col(fld))
            ranks = distinct.withColumn("__ord", F.row_number().over(w))
            if name == "rord":
                k = distinct.count()
                ranks = ranks.withColumn("__ord", F.lit(k + 1) - F.col("__ord"))
            out = out.join(
                F.broadcast(ranks.withColumnRenamed("__ord", aux)), fld, "left"
            )
        elif name == "tf":
            term = args[1][1]
            rel = (
                tokens(df, id_col, text_col)
                .where(F.col("term") == term)
                .groupBy("doc_id")
                .agg(F.count("*").alias(aux))
                .withColumnRenamed("doc_id", id_col)
            )
            out = out.join(rel, id_col, "left").fillna({aux: 0})
        elif name in ("docfreq", "idf"):
            term = args[1][1]
            if n_docs is None:
                n_docs = df.count()
            dfreq = (
                tokens(df, id_col, text_col)
                .where(F.col("term") == term)
                .agg(F.countDistinct("doc_id"))
                .collect()[0][0]
            )
            val = (
                float(dfreq)
                if name == "docfreq"
                else float(bm25.idf(int(dfreq), n_docs))
            )
            mapping[id(node)] = ("num", val)
            continue
        elif name == "norm":
            import numpy as np

            dl_rel = (
                tokens(df, id_col, text_col)
                .groupBy("doc_id")
                .agg(F.count("*").alias("__dl"))
                .withColumnRenamed("doc_id", id_col)
            )
            # (lo, hi, qlen) quantization ranges from the shared minifloat
            # tables — a ~2^8-row broadcast range join
            lens = np.arange(1, 2_000_001, dtype=np.int64)
            bts = bm25.encode_norm(lens)
            qlen = bm25.NORM_TABLE[bts].astype(np.float64)
            change = np.flatnonzero(np.diff(bts)) + 1
            starts = np.concatenate([[0], change])
            ends = np.concatenate([change, [len(lens)]])
            rows = [
                (int(lens[s]), int(lens[e - 1]), float(qlen[s]))
                for s, e in zip(starts, ends)
            ]
            rows[-1] = (rows[-1][0], 1 << 60, rows[-1][2])
            spark = df.sparkSession
            ranges = spark.createDataFrame(rows, "lo long, hi long, qlen double")
            joined = dl_rel.join(
                F.broadcast(ranges),
                (F.col("__dl") >= F.col("lo")) & (F.col("__dl") <= F.col("hi")),
                "inner",
            ).select(id_col, F.col("qlen").alias(aux))
            out = out.join(joined, id_col, "left").fillna({aux: 0.0})
        elif name == "query":
            if searcher is None:
                raise ValueError("funcquery: query() needs searcher=")
            sub = args[0][1]
            scores = searcher.search(sub, k=0, _all_hits=True).select(
                F.col("docid").alias(id_col), F.col("score").alias(aux)
            )
            out = out.join(scores, id_col, "left").fillna({aux: 0.0})
        else:  # pragma: no cover
            raise AssertionError(name)
        mapping[id(node)] = ("field", aux)
    tree = _replace_node(tree, mapping)
    return out.withColumn(alias, _compile(tree, out)).drop(
        *[c for c in out.columns if c.startswith("__fq_aux")]
    )
