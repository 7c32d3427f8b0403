"""Webtext URL operators: canonicalization, host / registered-domain
extraction, host-level corpus statistics.

A Common-Crawl-style pipeline needs URL keys before any dedup or
host-prior stage: raw WARC URLs differ in scheme/host case, default
ports, userinfo, empty-vs-'/' paths and fragments while naming the same
resource.  The canonical form here follows the usual crawl convention
(cf. Solr's URLClassifyProcessor, solr/core/.../update/processor/
URLClassifyProcessor.java, which computes the same normalized-url +
domain fields at ingest):

* scheme and host lowercased, userinfo stripped
* default port dropped (``:80`` for http, ``:443`` for https), other
  ports kept
* fragment dropped, bare trailing ``?`` dropped, empty path becomes
  ``/`` (path case preserved — paths are case-significant)

Everything is a pure Spark Column expression (regexp_extract + CASE —
JVM-side, whole-stage-codegen'd, no Python in the scan). The regex
constants are shared with the DuckDB oracle SQL so the gate compares
the identical specification in both engines.

``registered_domain`` groups hosts by their registrable domain using a
compact public-suffix subset (the full PSL is a runtime data file in
real deployments; the subset covers the common 2-label country
suffixes and is the lookup the host-prior aggregation keys on).

At 100 TB these are scan-side projections: host stats are one
hash-aggregate shuffle keyed by registered domain (bounded
cardinality), and canonical-URL dedup reuses dedup_exact's
hash-groupBy — no new shuffle shapes.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# shared with the DuckDB oracle (plain-RE2/Java-common subset)
RE_SCHEME = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
RE_AUTHORITY = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
RE_HOSTPORT = r"([^@]*)$"          # after last userinfo '@'
RE_HOST = r"^([^:]*)"
RE_PORT = r":([0-9]+)$"
RE_PATH_QUERY = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)"
RE_PATH = r"^([^?]*)"
RE_QUERY = r"(\?.*)$"

# compact registrable-domain suffix subset (2-label public suffixes);
# anything else falls back to the last two host labels
PUBLIC_SUFFIXES_2 = (
    "co.uk", "ac.uk", "org.uk", "gov.uk", "com.au", "net.au", "co.jp",
    "ne.jp", "or.jp", "com.br", "com.cn", "co.in", "co.kr", "com.mx",
    "com.tr", "com.ar", "co.za", "com.sg", "com.hk", "co.nz",
)


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, RE_SCHEME, 1))


def url_host(url: Column) -> Column:
    authority = F.regexp_extract(url, RE_AUTHORITY, 1)
    hostport = F.regexp_extract(authority, RE_HOSTPORT, 1)
    return F.lower(F.regexp_extract(hostport, RE_HOST, 1))


def url_port(url: Column) -> Column:
    authority = F.regexp_extract(url, RE_AUTHORITY, 1)
    hostport = F.regexp_extract(authority, RE_HOSTPORT, 1)
    return F.regexp_extract(hostport, RE_PORT, 1)


def canonical_url(url: Column) -> Column:
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    rest = F.regexp_extract(url, RE_PATH_QUERY, 1)
    path = F.regexp_extract(rest, RE_PATH, 1)
    query = F.regexp_extract(rest, RE_QUERY, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(query == "?", F.lit("")).otherwise(query)
    portpart = (
        F.when((scheme == "http") & (port == "80"), F.lit(""))
        .when((scheme == "https") & (port == "443"), F.lit(""))
        .when(port == "", F.lit(""))
        .otherwise(F.concat(F.lit(":"), port))
    )
    return F.concat(scheme, F.lit("://"), host, portpart, path, query)


RE_IPV4_HOST = r"^([0-9]{1,3}\.){3}[0-9]{1,3}$"


def registered_domain(host: Column) -> Column:
    """Registrable domain: one label + public suffix (3 host labels for
    the 2-label suffixes in PUBLIC_SUFFIXES_2, else the last 2).
    IP-literal and dotless hosts are their own key — the last-2-labels
    fallback would otherwise collapse every x.y.0.1 IP into '0.1' and
    every bare hostname into ''."""
    expr = F.when(host.rlike(RE_IPV4_HOST), host) \
        .when(~host.contains("."), host)
    for suf in PUBLIC_SUFFIXES_2:
        pat = r"([^.]+\." + suf.replace(".", r"\.") + r")$"
        expr = expr.when(host.endswith("." + suf),
                         F.regexp_extract(host, pat, 1))
    return expr.otherwise(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))


def sql_canonical_url(url_expr: str) -> str:
    """DuckDB expression computing the identical canonical form."""
    scheme = f"lower(regexp_extract({url_expr}, '{RE_SCHEME}', 1))"
    hostport = (f"regexp_extract(regexp_extract({url_expr}, "
                f"'{RE_AUTHORITY}', 1), '{RE_HOSTPORT}', 1)")
    host = f"lower(regexp_extract({hostport}, '{RE_HOST}', 1))"
    port = f"regexp_extract({hostport}, '{RE_PORT}', 1)"
    rest = f"regexp_extract({url_expr}, '{RE_PATH_QUERY}', 1)"
    path = f"regexp_extract({rest}, '{RE_PATH}', 1)"
    query = f"regexp_extract({rest}, '{RE_QUERY}', 1)"
    return f"""(
  {scheme} || '://' || {host}
  || CASE WHEN {scheme} = 'http' AND {port} = '80' THEN ''
          WHEN {scheme} = 'https' AND {port} = '443' THEN ''
          WHEN {port} = '' THEN ''
          ELSE ':' || {port} END
  || CASE WHEN {path} = '' THEN '/' ELSE {path} END
  || CASE WHEN {query} = '?' THEN '' ELSE {query} END
)"""


def sql_url_host(url_expr: str) -> str:
    return (f"lower(regexp_extract(regexp_extract(regexp_extract("
            f"{url_expr}, '{RE_AUTHORITY}', 1), '{RE_HOSTPORT}', 1), "
            f"'{RE_HOST}', 1))")


def sql_registered_domain(host_expr: str) -> str:
    cases = " ".join(
        "WHEN {h} LIKE '%.{s}' THEN regexp_extract({h}, "
        "'([^.]+\\.{e})$', 1)".format(
            h=host_expr, s=suf, e=suf.replace(".", "\\."))
        for suf in PUBLIC_SUFFIXES_2
    )
    return (f"CASE WHEN regexp_matches({host_expr}, '{RE_IPV4_HOST}') "
            f"THEN {host_expr} "
            f"WHEN NOT contains({host_expr}, '.') THEN {host_expr} "
            f"{cases} ELSE regexp_extract({host_expr}, "
            f"'([^.]+\\.[^.]+)$', 1) END")


def host_stats(docs: DataFrame, url_col: str = "url",
               length_col: str = "n_chars", k: int = 10) -> DataFrame:
    """Host-level corpus priors: docs per registrable domain + mean doc
    length — the aggregation a crawl-quality stage keys its host priors
    on.  One hash-aggregate shuffle on a bounded-cardinality key."""
    host = url_host(F.col(url_col))
    dom = registered_domain(host)
    return (
        docs.select(dom.alias("domain"), F.col(length_col))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.round(F.avg(length_col) * 100)
            .cast("bigint").alias("avg_len_c"),
        )
        .orderBy(F.desc("docs"), "domain")
        .limit(k)
    )


def canonical_dedup(docs: DataFrame, url_col: str = "url",
                    id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on the canonical URL: keep the smallest id per
    canonical key (hash groupBy — dedup_exact's shuffle shape)."""
    return (
        docs.select(canonical_url(F.col(url_col)).alias("canon"),
                    F.col(id_col))
        .groupBy("canon")
        .agg(F.min(id_col).alias("keep_id"),
             F.count(F.lit(1)).alias("copies"))
    )


# URLClassifyProcessor analog (solr/core/.../update/processor/
# URLClassifyProcessor.java:67,116-230): the same output fields —
# url_length, levels, top-level page, landing page, domain, canonical
# url. Bug-for-bug notes: landing detection lowercases the path but the
# canonical strip is case-sensitive on the original string, and the
# suffix is applied as a REGEX (dots match any char), both exactly as
# the reference's replaceFirst does.
LANDING_SUFFIXES = (
    "/", "index.html", "index.htm", "index.phtml", "index.shtml",
    "index.xml", "index.php", "index.asp", "index.aspx",
    "welcome.html", "welcome.htm", "welcome.phtml", "welcome.shtml",
    "welcome.xml", "welcome.php", "welcome.asp", "welcome.aspx",
)


def _landing_suffix(path_lower: Column) -> Column:
    expr = None
    for suf in LANDING_SUFFIXES:
        cond = path_lower.endswith(suf)
        lit = F.lit(suf)
        expr = F.when(cond, lit) if expr is None else expr.when(cond, lit)
    return expr.otherwise(F.lit(""))


RE_AFTER_AUTHORITY = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*(.*)$"
RE_PATH_ONLY = r"^([^?#]*)"
RE_TAIL = r"([?#].*)$"


def _normalized_url(url: Column) -> Column:
    """getNormalizedURL analog: URI.normalize().toURL().toString()
    lowercases the scheme and collapses slash runs in the path
    (dot-segment resolution is the one exclusion — found and pinned by
    the differential run in tools/fuzz_url.py)."""
    scheme = F.regexp_extract(url, RE_SCHEME, 1)
    authority = F.regexp_extract(url, RE_AUTHORITY, 1)
    rest_all = F.regexp_extract(url, RE_AFTER_AUTHORITY, 1)
    path = F.regexp_extract(rest_all, RE_PATH_ONLY, 1)
    tail = F.regexp_extract(rest_all, RE_TAIL, 1)
    return F.concat(F.lower(scheme), F.lit("://"), authority,
                    F.regexp_replace(path, "/{2,}", "/"), tail)


def url_classify(docs: DataFrame, url_col: str = "url",
                 id_col: str = "doc_id") -> DataFrame:
    """The URLClassifyProcessor's per-document fields as one scan-side
    projection (no shuffle)."""
    url = _normalized_url(F.col(url_col))
    rest = F.regexp_extract(url, RE_PATH_QUERY, 1)
    path = F.regexp_extract(rest, RE_PATH, 1)
    path_lower = F.lower(path)
    suffix = _landing_suffix(path_lower)
    stripped = F.regexp_replace(
        F.regexp_replace(path_lower, F.concat(suffix, F.lit("$")),
                         F.lit("")),
        F.lit("/+$"), F.lit(""))
    levels = (F.length(stripped)
              - F.length(F.regexp_replace(stripped, "/", "")))
    # URL.getQuery() is null only when there is no '?' before the
    # fragment
    has_query = rest.contains("?")
    top_level = (F.length(stripped) == 0) & ~has_query
    landing = ~has_query & (suffix != "")
    canonical = F.when(
        suffix == "", url
    ).otherwise(
        F.regexp_replace(url, F.concat(F.lit("/"), suffix, F.lit("$")),
                         F.lit("/"))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(url).cast("bigint").alias("url_length"),
        levels.cast("bigint").alias("levels"),
        top_level.cast("int").cast("bigint").alias("top_level_page"),
        landing.cast("int").cast("bigint").alias("landing_page"),
        # the reference's domain field is URL.getHost() verbatim —
        # case-preserved (unlike url_host, which lowercases for keys)
        F.regexp_extract(
            F.regexp_extract(F.regexp_extract(url, RE_AUTHORITY, 1),
                             RE_HOSTPORT, 1),
            RE_HOST, 1).alias("domain"),
        canonical.alias("canonical_url"),
    )


def sql_normalized_url(url_expr: str) -> str:
    scheme = f"lower(regexp_extract({url_expr}, '{RE_SCHEME}', 1))"
    authority = f"regexp_extract({url_expr}, '{RE_AUTHORITY}', 1)"
    rest_all = f"regexp_extract({url_expr}, '{RE_AFTER_AUTHORITY}', 1)"
    path = (f"regexp_replace(regexp_extract({rest_all}, "
            f"'{RE_PATH_ONLY}', 1), '/{{2,}}', '/', 'g')")
    tail = f"regexp_extract({rest_all}, '{RE_TAIL}', 1)"
    return f"({scheme} || '://' || {authority} || {path} || {tail})"


def sql_url_classify(raw_url_expr: str, id_col: str = "doc_id") -> str:
    """DuckDB SELECT-list computing the identical fields."""
    url_expr = sql_normalized_url(raw_url_expr)
    rest = f"regexp_extract({url_expr}, '{RE_PATH_QUERY}', 1)"
    path = f"lower(regexp_extract({rest}, '{RE_PATH}', 1))"
    sufcases = " ".join(
        f"WHEN {path} LIKE '%{suf}' THEN '{suf}'"
        for suf in LANDING_SUFFIXES
    )
    suffix = f"(CASE {sufcases} ELSE '' END)"
    stripped = (f"regexp_replace(regexp_replace({path}, "
                f"{suffix} || '$', ''), '/+$', '')")
    levels = (f"length({stripped}) - "
              f"length(replace({stripped}, '/', ''))")
    has_q = f"contains({rest}, '?')"
    return f"""
  {id_col} AS doc_id,
  CAST(length({url_expr}) AS BIGINT) AS url_length,
  CAST({levels} AS BIGINT) AS levels,
  CAST(CASE WHEN length({stripped}) = 0 AND NOT {has_q}
       THEN 1 ELSE 0 END AS BIGINT) AS top_level_page,
  CAST(CASE WHEN NOT {has_q} AND {suffix} <> '' THEN 1 ELSE 0 END
       AS BIGINT) AS landing_page,
  regexp_extract(regexp_extract(regexp_extract({url_expr},
      '{RE_AUTHORITY}', 1), '{RE_HOSTPORT}', 1), '{RE_HOST}', 1)
      AS domain,
  CASE WHEN {suffix} = '' THEN {url_expr}
       ELSE regexp_replace({url_expr}, '/' || {suffix} || '$', '/')
  END AS canonical_url"""


# PathHierarchyTokenizer (analysis/path/PathHierarchyTokenizer.java:94-
# 190): cumulative path-prefix tokens — '/a/b/c' emits '/a', '/a/b',
# '/a/b/c' (first at posInc 1, the rest posInc 0); a trailing delimiter
# carries into the NEXT token ('/a/' emits '/a', '/a/'); `skip` drops
# the leading segments from every token; `replacement` substitutes the
# delimiter in the output. Differentially verified against the
# compiled reference tokenizer (tools/fuzz_path.py).
def path_hierarchy(path: str, delimiter: str = "/",
                   replacement: str = None, skip: int = 0) -> list[str]:
    """Reference-exact token list for one path string."""
    if replacement is None:
        replacement = delimiter
    out: list[str] = []
    result = ""          # resultToken: the previous emitted token
    skipped = 0
    start = 0            # startPosition (offset bookkeeping only)
    end_delimiter = False
    i, n = 0, len(path)
    while True:
        term = result
        added = False
        if end_delimiter:
            term += replacement
            end_delimiter = False
            added = True
        while True:
            if i >= n:
                if skipped > skip:
                    if added:
                        out.append(term)
                        result = term
                    return out
                return out
            c = path[i]
            i += 1
            if not added:
                added = True
                skipped += 1
                if skipped > skip:
                    term += replacement if c == delimiter else c
                else:
                    start += 1
            else:
                if c == delimiter:
                    if skipped > skip:
                        end_delimiter = True
                        break
                    skipped += 1
                    if skipped > skip:
                        term += replacement
                    else:
                        start += 1
                else:
                    if skipped > skip:
                        term += c
                    else:
                        start += 1
        out.append(term)
        result = term


def url_path_hierarchy(docs: DataFrame, url_col: str = "url",
                       id_col: str = "doc_id") -> DataFrame:
    """(doc_id, host, prefix) — every cumulative path prefix of the
    normalized URL path, Spark-native (split + transform(sequence), no
    Python): the path-hierarchy drilldown facet over a crawl.  For the
    default '/'-delimited no-skip case the cumulative-join expansion is
    exactly the reference tokenizer's output (trailing/doubled
    delimiters included — verified in tests against path_hierarchy)."""
    url = F.col(url_col)
    rest = F.regexp_extract(url, RE_PATH_QUERY, 1)
    path = F.regexp_extract(rest, RE_PATH, 1)
    parts = F.split(path, "/")
    prefixes = F.transform(
        F.sequence(F.lit(2), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, 1, i), "/"),
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            url_host(url).alias("host"),
            F.explode(
                F.when(F.size(parts) >= 2, prefixes)
                .otherwise(F.array().cast("array<string>"))
            ).alias("prefix"),
        )
    )


def reverse_path_hierarchy(path: str, delimiter: str = "/",
                           replacement: str = None,
                           skip: int = 0) -> list[str]:
    """ReversePathHierarchyTokenizer (analysis/path/
    ReversePathHierarchyTokenizer.java:108-176): the suffix chain —
    'www.site.com' with '.' emits ['www.site.com', 'site.com', 'com'];
    `skip` drops trailing segments from every token.  Reference-exact
    (tools/fuzz_path.py reverse mode)."""
    if replacement is None:
        replacement = delimiter
    replaced = "".join(replacement if c == delimiter else c
                       for c in path)
    positions = [0]
    for idx, c in enumerate(path):
        if c == delimiter:
            positions.append(idx + 1)
    if positions[-1] < len(path):
        positions.append(len(path))
    count = len(positions)
    end_idx = count - 1 - skip
    if end_idx < 0:
        return []
    end = positions[end_idx]
    return [replaced[positions[s]:end]
            for s in range(0, count - skip - 1)]


def host_hierarchy(docs: DataFrame, url_col: str = "url",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, suffix) — the registrable-domain drilldown: every
    dot-suffix of the host ('www.site.com' -> www.site.com, site.com,
    com), Spark-native (the ReversePathHierarchyTokenizer use case for
    domains).  Scan-side, no shuffle until the consumer aggregates."""
    url = F.col(url_col)
    host = url_host(url)
    parts = F.split(host, r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(
            F.slice(parts, i, F.size(parts) - i + 1), "."),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(suffixes).alias("suffix"),
    )
