"""Differential oracle for the Solr dedup signatures: compile the
reference's own MD5Signature / Lookup3Signature / TextProfileSignature
(+ the real solrj Hash.java; SolrParams/slf4j stubs) and compare hex
signatures against functions/signature.py.

TextProfileSignature's profile line order for tied counts is Java
HashMap.values() iteration order — this campaign is what proves the
_java_hashmap_order reproduction (bucket spread, resize thresholds,
within-bucket insertion order).

Usage: python tools/fuzz_signature.py [n]   (exit 1 on any mismatch)
"""
from __future__ import annotations

import os
import random
import subprocess
import sys

ORACLE_DIR = "/tmp/sig_oracle"
REF = "/root/reference/solr"
P = f"{REF}/core/src/java/org/apache/solr/update/processor"
HASH = f"{REF}/solrj/src/java/org/apache/solr/common/util/Hash.java"

STUBS = {
    "org/apache/solr/common/params/SolrParams.java": """
package org.apache.solr.common.params;
public class SolrParams {
    public Float getFloat(String k, float d) { return d; }
    public Integer getInt(String k, int d) { return d; }
}
""",
    "org/slf4j/Logger.java": """
package org.slf4j;
public interface Logger { void debug(String s); void warn(String s); }
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

SIG_MAIN = """
import org.apache.solr.update.processor.*;
import java.io.*;
import java.nio.charset.StandardCharsets;

public class SigMain {
    static String hex(byte[] b) {
        StringBuilder sb = new StringBuilder();
        for (byte x : b) sb.append(String.format("%02x", x));
        return sb.toString();
    }
    public static void main(String[] args) throws Exception {
        BufferedReader in = new BufferedReader(
            new InputStreamReader(System.in, StandardCharsets.UTF_8));
        PrintStream out = new PrintStream(System.out, true, "UTF-8");
        String line;
        while ((line = in.readLine()) != null) {
            String content = line.replace('\\u241E', '\\n');
            // sequential: MD5Signature's digester is a per-thread
            // ThreadLocal shared by TextProfileSignature, so each
            // signature must finish before the next is constructed
            // (exactly how the update processor uses them)
            MD5Signature md5 = new MD5Signature();
            md5.add(content);
            String h1 = hex(md5.getSignature());
            Lookup3Signature l3 = new Lookup3Signature();
            l3.add(content);
            String h2 = hex(l3.getSignature());
            TextProfileSignature tp = new TextProfileSignature();
            tp.init(new org.apache.solr.common.params.SolrParams());
            tp.add(content);
            String h3 = hex(tp.getSignature());
            out.println(h1 + "\\t" + h2 + "\\t" + h3);
        }
    }
}
"""


def ensure_oracle() -> str:
    classes = os.path.join(ORACLE_DIR, "classes")
    if os.path.exists(os.path.join(classes, "SigMain.class")):
        return classes
    os.makedirs(ORACLE_DIR, exist_ok=True)
    for rel, src in STUBS.items():
        path = os.path.join(ORACLE_DIR, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(src)
    with open(os.path.join(ORACLE_DIR, "SigMain.java"), "w") as f:
        f.write(SIG_MAIN)
    stub_files = " ".join(os.path.join(ORACLE_DIR, rel) for rel in STUBS)
    cmd = (
        f"cd {ORACLE_DIR} && javac -d classes -encoding UTF-8 -nowarn "
        f"SigMain.java {P}/Signature.java {P}/MD5Signature.java "
        f"{P}/Lookup3Signature.java {P}/TextProfileSignature.java "
        f"{HASH} {stub_files}"
    )
    r = subprocess.run(cmd, shell=True, capture_output=True, text=True)
    if not os.path.exists(os.path.join(classes, "SigMain.class")):
        sys.stderr.write(r.stdout + r.stderr)
        raise RuntimeError("signature oracle compile failed")
    return classes


_WORDS = ("the quick brown fox jumps over lazy dog table hash join merge "
          "query spark filter customer value data große straße ärger "
          "кошка дом книга 東京 渋谷 mañana año x yz ab abc abcd a1b2 "
          "12345 007 woord0 woord1 woord2 woord3 woord4").split()


def gen_lines(n: int, rng: random.Random) -> list[str]:
    lines = [
        "",
        "ab",            # token <= minTokenLen: empty profile
        "abc",
        "abc abc abc",
        "aaa bbb aaa ccc bbb aaa",
        "x" * 300,
        "tab\tsep and, punct! 123456 mixed… ok",
        "😀 emoji astral 𝕥𝕖𝕩𝕥 tokens",
        "CASE Case case MiXeD İstanbul",
        " ".join(f"tok{i}" for i in range(200)),        # resize to 512
        " ".join(f"tok{i % 30}" for i in range(300)),   # heavy ties
    ]
    for _ in range(n):
        k = rng.randrange(1, 120)
        words = [rng.choice(_WORDS) for _ in range(k)]
        # repeat some words to create frequency structure
        for _ in range(rng.randrange(0, 8)):
            words += [rng.choice(words)] * rng.randrange(1, 5)
        rng.shuffle(words)
        sep = rng.choice([" ", "  ", ", ", "␞"])
        lines.append(sep.join(words))
    return lines


def main() -> int:
    from lucene_solr_spark.functions.signature import (
        lookup3_signature, md5_signature, text_profile_signature)

    classes = ensure_oracle()
    rng = random.Random(20260818)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    lines = gen_lines(n, rng)

    proc = subprocess.run(
        ["java", "-cp", classes, "SigMain"],
        input="\n".join(lines).encode("utf-8"),
        capture_output=True, timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr.decode()[:3000])
    jlines = proc.stdout.decode("utf-8").split("\n")[: len(lines)]

    bad = 0
    for line, jl in zip(lines, jlines):
        content = line.replace("␞", "\n")
        jmd5, jl3, jtp = jl.split("\t")
        pmd5 = md5_signature(content)
        pl3 = lookup3_signature(content)
        ptp = text_profile_signature(content)
        if (pmd5, pl3, ptp) != (jmd5, jl3, jtp):
            bad += 1
            if bad <= 6:
                which = [w for w, (p, j) in
                         (("md5", (pmd5, jmd5)), ("l3", (pl3, jl3)),
                          ("tp", (ptp, jtp))) if p != j]
                print(f"  MISMATCH {which} {content[:60]!r}")
    print(f"signatures: {len(lines)} lines, "
          f"{'OK' if not bad else f'FAIL({bad})'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.exit(main())
