"""Differential oracle for the KStem port: compile the reference's own
en/KStemmer.java (+ KStemData1-8) and compare stems against
analysis/kstem.py over dictionary words, suffixed derivations and
random mutations.

Usage: python tools/fuzz_kstem.py [n]   (exit 1 on any mismatch)
"""
from __future__ import annotations

import os
import random
import subprocess
import sys

ORACLE_DIR = "/tmp/kstem_oracle"
REF = "/root/reference"
CORE = f"{REF}/lucene/core/src/java"
COMMON = f"{REF}/lucene/analysis/common/src/java"

KSTEM_MAIN = """
package org.apache.lucene.analysis.en;
import java.io.*;
import java.nio.charset.StandardCharsets;

public class KStemMain {
    public static void main(String[] args) throws Exception {
        KStemmer stemmer = new KStemmer();
        BufferedReader in = new BufferedReader(
            new InputStreamReader(System.in, StandardCharsets.UTF_8));
        PrintStream out = new PrintStream(System.out, true, "UTF-8");
        String line;
        while ((line = in.readLine()) != null) {
            out.println(stemmer.stem(line));
        }
    }
}
"""

SUFFIXES = ["s", "es", "ies", "ed", "ied", "ing", "ity", "ness", "ion",
            "tion", "ation", "ization", "ication", "ition", "er", "or",
            "izer", "ly", "ally", "ably", "ily", "al", "ical", "ial",
            "ive", "ative", "ize", "ment", "able", "ible", "ism", "ic",
            "ency", "ancy", "ence", "ance", "ility", "ivity", "ality"]


def ensure_oracle() -> str:
    classes = os.path.join(ORACLE_DIR, "classes")
    if os.path.exists(os.path.join(classes,
                                   "org/apache/lucene/analysis/en/"
                                   "KStemMain.class")):
        return classes
    os.makedirs(ORACLE_DIR, exist_ok=True)
    with open(os.path.join(ORACLE_DIR, "KStemMain.java"), "w") as f:
        f.write(KSTEM_MAIN)
    srcs = " ".join(
        f"{COMMON}/org/apache/lucene/analysis/en/KStemData{i}.java"
        for i in range(1, 9))
    cmd = (
        f"cd {ORACLE_DIR} && javac -d classes -encoding UTF-8 -nowarn "
        f"-sourcepath {CORE}:{COMMON} KStemMain.java "
        f"{COMMON}/org/apache/lucene/analysis/en/KStemmer.java {srcs}"
    )
    r = subprocess.run(cmd, shell=True, capture_output=True, text=True)
    if not os.path.exists(os.path.join(classes,
                                       "org/apache/lucene/analysis/en/"
                                       "KStemMain.class")):
        sys.stderr.write(r.stdout + r.stderr)
        raise RuntimeError("kstem oracle compile failed")
    return classes


def gen_words(n: int, rng: random.Random) -> list[str]:
    from lucene_solr_spark.analysis.kstemdata import KSTEM_WORDS

    lex = sorted(KSTEM_WORDS)
    words = set()
    # seeded classics
    words |= {"calories", "died", "dying", "flies", "running",
              "italians", "feet", "graphics", "aids", "definition",
              "amplification", "injunctive", "optimal", "compensable",
              "bibliographical", "militarily", "adherance",
              "fingerspelling", "bookselling", "mislabelled",
              "unfastened", "generosity", "spontaneity", "does",
              "buses", "gases", "classes", "mosses", "bosses"}
    base = rng.sample(lex, min(600, len(lex)))
    for w in base:
        words.add(w)
        for _ in range(4):
            words.add(w + rng.choice(SUFFIXES))
        # strip-last-char derivations (drive -> driving shapes)
        if len(w) > 3:
            words.add(w[:-1] + rng.choice(SUFFIXES))
        # doubled final consonant + suffix (stop -> stopped)
        if len(w) > 2 and w[-1] not in "aeiou":
            words.add(w + w[-1] + rng.choice(["ed", "ing", "er"]))
    for _ in range(n):
        k = rng.randrange(3, 14)
        words.add("".join(rng.choice("abcdefghijklmnopqrstuvwxy")
                          for _ in range(k)))
    return sorted(words)[:20000]


def main() -> int:
    from lucene_solr_spark.analysis.kstem import kstem

    classes = ensure_oracle()
    rng = random.Random(20260818)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    words = gen_words(n, rng)

    proc = subprocess.run(
        ["java", "-cp", classes,
         "org.apache.lucene.analysis.en.KStemMain"],
        input="\n".join(words).encode("utf-8"),
        capture_output=True, timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr.decode()[:3000])
    jlines = proc.stdout.decode("utf-8").split("\n")[: len(words)]

    bad = 0
    for w, j in zip(words, jlines):
        p = kstem(w)
        if p != j:
            bad += 1
            if bad <= 25:
                print(f"  MISMATCH {w!r}: java={j!r} py={p!r}")
    print(f"kstem: {len(words)} words, {'OK' if not bad else f'FAIL({bad})'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.exit(main())
