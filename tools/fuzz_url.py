"""Differential oracle for the URLClassifyProcessor analog: compile the
reference's own solr/core URLClassifyProcessor.java (with the same tiny
dependency stubs the stemmer oracle uses — SolrParams/SolrInputDocument/
slf4j are parameter plumbing, the URL math is untouched), drive URLs
through its public methods, and compare against the DuckDB evaluation
of functions/webtext.sql_url_classify.  The gate url_classify_fields
then pins SQL == Spark, closing Java == SQL == Spark.

The reference normalizes via URI.normalize() before classifying; the
analog operates on the raw URL, so generated inputs contain no dot
segments (documented divergence — dot-segment resolution is a
pre-normalization, not part of the classification).

Usage: python tools/fuzz_url.py [n]   (exit 1 on any mismatch)
"""
from __future__ import annotations

import os
import random
import subprocess
import sys

ORACLE_DIR = "/tmp/url_oracle"
REF_SRC = ("/root/reference/solr/core/src/java/org/apache/solr/update/"
           "processor/URLClassifyProcessor.java")

STUBS = {
    "org/apache/solr/common/SolrInputDocument.java": """
package org.apache.solr.common;
public class SolrInputDocument {
    public boolean containsKey(String k) { return false; }
    public Object getFieldValue(String k) { return null; }
    public void setField(String k, Object v) {}
}
""",
    "org/apache/solr/common/params/SolrParams.java": """
package org.apache.solr.common.params;
public class SolrParams {
    public Boolean getBool(String k, boolean d) { return d; }
    public String get(String k, String d) { return d; }
    public String get(String k) { return null; }
}
""",
    "org/apache/solr/request/SolrQueryRequest.java": """
package org.apache.solr.request;
public class SolrQueryRequest {}
""",
    "org/apache/solr/response/SolrQueryResponse.java": """
package org.apache.solr.response;
public class SolrQueryResponse {}
""",
    "org/apache/solr/update/AddUpdateCommand.java": """
package org.apache.solr.update;
import org.apache.solr.common.SolrInputDocument;
public class AddUpdateCommand {
    public SolrInputDocument getSolrInputDocument() { return null; }
}
""",
    "org/apache/solr/update/processor/UpdateRequestProcessor.java": """
package org.apache.solr.update.processor;
import org.apache.solr.update.AddUpdateCommand;
import java.io.IOException;
public class UpdateRequestProcessor {
    public UpdateRequestProcessor(UpdateRequestProcessor next) {}
    public void processAdd(AddUpdateCommand cmd) throws IOException {}
}
""",
    "org/slf4j/Logger.java": """
package org.slf4j;
public interface Logger {
    void debug(String s);
    void warn(String s);
}
""",
    "org/slf4j/LoggerFactory.java": """
package org.slf4j;
public class LoggerFactory {
    public static Logger getLogger(Class<?> c) {
        return new Logger() {
            public void debug(String s) {}
            public void warn(String s) {}
        };
    }
}
""",
}

URL_MAIN = """
import org.apache.solr.update.processor.URLClassifyProcessor;
import java.io.*;
import java.net.URL;
import java.nio.charset.StandardCharsets;

public class UrlMain {
    public static void main(String[] args) throws Exception {
        URLClassifyProcessor p =
            new URLClassifyProcessor(null, null, null, null);
        BufferedReader in = new BufferedReader(
            new InputStreamReader(System.in, StandardCharsets.UTF_8));
        PrintStream out = new PrintStream(System.out, true, "UTF-8");
        String line;
        while ((line = in.readLine()) != null) {
            try {
                URL u = p.getNormalizedURL(line);
                out.println(p.length(u) + "\\t" + p.levels(u) + "\\t"
                    + (p.isTopLevelPage(u) ? 1 : 0) + "\\t"
                    + (p.isLandingPage(u) ? 1 : 0) + "\\t"
                    + u.getHost() + "\\t" + p.getCanonicalUrl(u));
            } catch (Exception e) {
                out.println("ERR");
            }
        }
    }
}
"""


def ensure_oracle() -> str:
    classes = os.path.join(ORACLE_DIR, "classes")
    if os.path.exists(os.path.join(classes, "UrlMain.class")):
        return classes
    os.makedirs(ORACLE_DIR, exist_ok=True)
    for rel, src in STUBS.items():
        path = os.path.join(ORACLE_DIR, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(src)
    with open(os.path.join(ORACLE_DIR, "UrlMain.java"), "w") as f:
        f.write(URL_MAIN)
    stub_files = " ".join(os.path.join(ORACLE_DIR, rel) for rel in STUBS)
    cmd = (
        f"cd {ORACLE_DIR} && javac -d classes -encoding UTF-8 -nowarn "
        f"UrlMain.java {REF_SRC} {stub_files}"
    )
    r = subprocess.run(cmd, shell=True, capture_output=True, text=True)
    if not os.path.exists(os.path.join(classes, "UrlMain.class")):
        sys.stderr.write(r.stdout + r.stderr)
        raise RuntimeError("url oracle compile failed")
    return classes


def gen_urls(n: int, rng: random.Random) -> list[str]:
    urls = [
        "http://www.example.com/",
        "http://www.example.com",
        "HTTP://WWW.Example.COM:80/index.html",
        "https://sub.host.co.uk:443/a/b/c/",
        "http://h.example.org/a/b/index.php",
        "http://h.example.org/a/b/INDEX.HTML",
        "http://h.example.org/welcome.aspx",
        "http://user:pw@h.net:8080/p/q?x=1",
        "http://h.net/p?",
        "http://h.net/p#frag",
        "http://h.net/index.html?q=1",
        "http://h.net/indexahtml",
        "http://h.net//",
        "http://h.net/a//b///",
    ]
    hosts = ["www.example.com", "Sub.HOST.co.uk", "h.example.org",
             "a.b.c.net", "single"]
    schemes = ["http", "https", "HTTP", "HtTpS", "ftp"]
    tails = ["", "/", "/a", "/a/", "/a/b.html", "/index.html",
             "/a/index.htm", "/welcome.php", "/a//b/", "/p?q=1",
             "/p?x=1&y=2", "/p#f", "/index.html#f", "/INDEX.html",
             "/index.xhtml"]
    ports = ["", ":80", ":443", ":8080"]
    for _ in range(n):
        urls.append(
            rng.choice(schemes) + "://"
            + (rng.choice(["", "u:p@"]) if rng.random() < 0.2 else "")
            + rng.choice(hosts) + rng.choice(ports) + rng.choice(tails))
    return urls


def main() -> int:
    import duckdb

    from lucene_solr_spark.functions.webtext import sql_url_classify

    classes = ensure_oracle()
    rng = random.Random(20260818)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    urls = gen_urls(n, rng)

    proc = subprocess.run(
        ["java", "-cp", classes, "UrlMain"],
        input="\n".join(urls).encode("utf-8"),
        capture_output=True, timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr.decode()[:3000])
    jlines = proc.stdout.decode("utf-8").split("\n")[: len(urls)]

    con = duckdb.connect()
    con.execute("CREATE TABLE u(doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)",
                    list(enumerate(urls)))
    rows = con.execute(
        "SELECT" + sql_url_classify("url") + " FROM u ORDER BY doc_id"
    ).fetchall()

    bad = total = 0
    for url, jl, row in zip(urls, jlines, rows):
        if jl == "ERR":
            continue  # unparseable by java.net.URL (e.g. ftp w/o handler)
        total += 1
        jlen, jlev, jtop, jland, jhost, jcanon = jl.split("\t")
        (_id, plen, plev, ptop, pland, phost, pcanon) = row
        got = (plen, plev, ptop, pland, phost, pcanon)
        want = (int(jlen), int(jlev), int(jtop), int(jland), jhost,
                jcanon)
        if got != want:
            bad += 1
            if bad <= 8:
                print(f"  MISMATCH {url!r}: java={want} py={got}")
    print(f"url_classify: {total} urls, "
          f"{'OK' if not bad else f'FAIL({bad})'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.exit(main())
