"""Solr function-query parser + registry.

The reference registers ~54 value-source parsers by name
(solr/core/src/java/org/apache/solr/search/ValueSourceParser.java:85+,
`addParser("abs", ...)` etc). This module restates the standard arithmetic
/ conditional / distance core as a recursive-descent parser producing
Catalyst Column expressions — every function stays JVM-side, codegen'd,
no UDFs.

Implemented names (parity subset, each mapping to the reference parser of
the same name): sum add sub product mul div abs min max pow sqrt log ln
exp floor ceil mod neg recip linear map if not and or eq gt gte lt lte
strdist ms const literal field. Omitted (documented): ord/rord (global
rank — a whole-table window; expressible but a scale hazard as a scalar),
query()/score-coupled sources (the engine's job), geodist (spatial out of
scope).

`scale(x, lo, hi)` IS included: it needs the column's global min/max, so
it compiles to an agg + crossJoin(broadcast) — the documented two-pass
shape, not an unpartitioned window.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

_TOKEN = re.compile(r"\s*(?:(\d+\.?\d*(?:[eE][+-]?\d+)?)|([A-Za-z_][\w.]*)|([(),])|\"([^\"]*)\")")


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
            num, name, punct, s = m.groups()
            if num is not None:
                self.toks.append(("num", num))
            elif name is not None:
                self.toks.append(("name", name))
            elif punct is not None:
                self.toks.append(("punct", punct))
            else:
                self.toks.append(("str", s))
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
}

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
