"""Differential oracle for the PathHierarchyTokenizer port: compile the
reference tokenizer and compare token lists over fuzzed paths across
delimiter/replacement/skip configurations.

Usage: python tools/fuzz_path.py [n]   (exit 1 on any mismatch)
"""
from __future__ import annotations

import os
import random
import subprocess
import sys

ORACLE_DIR = "/tmp/path_oracle"
REF = "/root/reference"
CORE = f"{REF}/lucene/core/src/java"
COMMON = f"{REF}/lucene/analysis/common/src/java"

PATH_MAIN = """
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.Tokenizer;
import org.apache.lucene.analysis.path.PathHierarchyTokenizer;
import org.apache.lucene.analysis.path.ReversePathHierarchyTokenizer;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import java.io.*;
import java.nio.charset.StandardCharsets;

public class PathMain {
    public static void main(String[] args) throws Exception {
        char delimiter = args[0].charAt(0);
        char replacement = args[1].charAt(0);
        int skip = Integer.parseInt(args[2]);
        boolean reverse = args.length > 3 && args[3].equals("rev");
        BufferedReader in = new BufferedReader(
            new InputStreamReader(System.in, StandardCharsets.UTF_8));
        PrintStream out = new PrintStream(System.out, true, "UTF-8");
        String line;
        while ((line = in.readLine()) != null) {
            Tokenizer tok = reverse
                ? new ReversePathHierarchyTokenizer(
                      1024, delimiter, replacement, skip)
                : new PathHierarchyTokenizer(
                      1024, delimiter, replacement, skip);
            tok.setReader(new StringReader(line.replace('\\u241E','\\n')));
            CharTermAttribute term = tok.addAttribute(CharTermAttribute.class);
            tok.reset();
            StringBuilder sb = new StringBuilder();
            while (tok.incrementToken()) {
                if (sb.length() > 0) sb.append('\\u241F');
                sb.append(term.toString());
            }
            tok.end();
            tok.close();
            out.println(sb.toString());
        }
    }
}
"""


def ensure_oracle() -> str:
    classes = os.path.join(ORACLE_DIR, "classes")
    if os.path.exists(os.path.join(classes, "PathMain.class")):
        return classes
    os.makedirs(ORACLE_DIR, exist_ok=True)
    with open(os.path.join(ORACLE_DIR, "PathMain.java"), "w") as f:
        f.write(PATH_MAIN)
    cmd = (
        f"cd {ORACLE_DIR} && javac -d classes -encoding UTF-8 -nowarn "
        f"-sourcepath {CORE}:{COMMON} PathMain.java "
        f"{CORE}/org/apache/lucene/analysis/tokenattributes/*.java"
    )
    r = subprocess.run(cmd, shell=True, capture_output=True, text=True)
    if not os.path.exists(os.path.join(classes, "PathMain.class")):
        sys.stderr.write(r.stdout + r.stderr)
        raise RuntimeError("path oracle compile failed")
    return classes


def gen_paths(n: int, rng: random.Random) -> list[str]:
    paths = ["", "/", "//", "a", "/a", "a/", "/a/", "/a/b/c", "a/b/c/",
             "//a//b", "/a b/c d", "c:/x/y", "...", "/./..", "/a/b/"]
    segs = ["usr", "share", "doc", "a", "b", "x y", "über", "文",
            ".", "..", ""]
    for _ in range(n):
        k = rng.randrange(0, 7)
        p = ("/" if rng.random() < 0.5 else "")
        p += "/".join(rng.choice(segs) for _ in range(k))
        if rng.random() < 0.3:
            p += "/"
        paths.append(p)
    return [p for p in paths if "\n" not in p]


def main() -> int:
    from lucene_solr_spark.functions.webtext import (
        path_hierarchy, reverse_path_hierarchy)

    classes = ensure_oracle()
    rng = random.Random(20260818)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    paths = gen_paths(n, rng)

    total = fails = 0
    for delim, repl, skip, rev in (
            ("/", "/", 0, False), ("/", "/", 1, False),
            ("/", "-", 0, False), ("-", "/", 0, False),
            ("/", "/", 3, False), ("/", "/", 0, True),
            (".", ".", 0, True), (".", ".", 1, True),
            ("/", "-", 2, True)):
        args = ["java", "-cp", classes, "PathMain", delim, repl,
                str(skip)] + (["rev"] if rev else [])
        proc = subprocess.run(
            args,
            input="\n".join(paths).encode("utf-8"),
            capture_output=True, timeout=600,
        )
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr.decode()[:3000])
        jlines = proc.stdout.decode("utf-8").split("\n")[: len(paths)]
        bad = 0
        fn = reverse_path_hierarchy if rev else path_hierarchy
        for p, j in zip(paths, jlines):
            want = j.split("␟") if j else []
            got = fn(p, delim, repl, skip)
            if got != want:
                bad += 1
                if bad <= 5:
                    print(f"  MISMATCH d={delim!r} r={repl!r} s={skip} "
                          f"{p!r}: java={want} py={got}")
        print(f"path{'-rev' if rev else ''} d={delim!r} r={repl!r} "
              f"skip={skip}: {len(paths)} paths "
              f"{'OK' if not bad else f'FAIL({bad})'}")
        total += len(paths)
        fails += bad
    print(f"TOTAL: {total} comparisons, {fails} mismatches")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.exit(main())
