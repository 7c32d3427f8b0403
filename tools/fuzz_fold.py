"""Differential oracle for the ASCII folding filter: compile the
reference's ASCIIFoldingFilter (the 2k-line Latin switch) and compare
the repo's fold (analysis/fold.py: explicit table + NFKD-strip) under
the chain contract (fold runs after lowercase, as in the 'folding'
analyzer).

Usage: python tools/fuzz_fold.py [n]   (exit 1 on any mismatch)
"""
from __future__ import annotations

import os
import random
import subprocess
import sys

ORACLE_DIR = "/tmp/fold_oracle"
REF = "/root/reference"
CORE = f"{REF}/lucene/core/src/java"
COMMON = f"{REF}/lucene/analysis/common/src/java"

FOLD_MAIN = """
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.Tokenizer;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.analysis.core.KeywordTokenizer;
import org.apache.lucene.analysis.core.LowerCaseFilter;
import org.apache.lucene.analysis.miscellaneous.ASCIIFoldingFilter;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import java.io.*;
import java.nio.charset.StandardCharsets;

public class FoldMain {
    public static void main(String[] args) throws Exception {
        boolean raw = args.length > 0 && args[0].equals("raw");
        BufferedReader in = new BufferedReader(
            new InputStreamReader(System.in, StandardCharsets.UTF_8));
        PrintStream out = new PrintStream(System.out, true, "UTF-8");
        String line;
        while ((line = in.readLine()) != null) {
            TokenStream ts;
            if (raw) {
                Tokenizer tok = new KeywordTokenizer();
                tok.setReader(new StringReader(line));
                ts = new ASCIIFoldingFilter(tok);
            } else {
                Tokenizer tok = new WhitespaceTokenizer();
                tok.setReader(new StringReader(line));
                ts = new ASCIIFoldingFilter(new LowerCaseFilter(tok));
            }
            CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
            ts.reset();
            StringBuilder sb = new StringBuilder();
            while (ts.incrementToken()) {
                if (sb.length() > 0) sb.append(' ');
                sb.append(term.toString());
            }
            ts.end();
            ts.close();
            out.println(sb.toString());
        }
    }
}
"""


def ensure_oracle() -> str:
    classes = os.path.join(ORACLE_DIR, "classes")
    if os.path.exists(os.path.join(classes, "FoldMain.class")):
        return classes
    os.makedirs(ORACLE_DIR, exist_ok=True)
    with open(os.path.join(ORACLE_DIR, "FoldMain.java"), "w") as f:
        f.write(FOLD_MAIN)
    cmd = (
        f"cd {ORACLE_DIR} && javac -d classes -encoding UTF-8 -nowarn "
        f"-sourcepath {CORE}:{COMMON} FoldMain.java "
        f"{CORE}/org/apache/lucene/analysis/tokenattributes/*.java"
    )
    r = subprocess.run(cmd, shell=True, capture_output=True, text=True)
    if not os.path.exists(os.path.join(classes, "FoldMain.class")):
        sys.stderr.write(r.stdout + r.stderr)
        raise RuntimeError("fold oracle compile failed")
    return classes


# the blocks the reference's switch covers (plus controls that pass):
_RANGES = [
    (0x00C0, 0x00FF),   # Latin-1 Supplement letters
    (0x0100, 0x024F),   # Latin Extended-A/B
    (0x1E00, 0x1EFF),   # Latin Extended Additional
    (0x2010, 0x203F),   # punctuation: dashes, quotes, daggers
    (0x2070, 0x209F),   # super/subscripts
    (0x2460, 0x24FF),   # enclosed alphanumerics
    (0xFB00, 0xFB06),   # latin ligatures
    (0xFF01, 0xFF5E),   # fullwidth forms
    (0x00A0, 0x00BF),   # angle quotes, fractions, ordinals
]


def gen_words(n: int, rng: random.Random) -> list[str]:
    words = []
    # exhaustive single-char probes over every covered range
    for lo, hi in _RANGES:
        for cp in range(lo, hi + 1):
            c = chr(cp)
            if c.strip():
                words.append("x" + c + "y")
    base = "abcdefghijklmnopqrstuvwxyz"
    pool = [chr(rng.randrange(lo, hi + 1)) for lo, hi in _RANGES
            for _ in range(30)]
    for _ in range(n):
        k = rng.randrange(1, 10)
        words.append("".join(
            rng.choice(pool) if rng.random() < 0.5 else rng.choice(base)
            for _ in range(k)).strip() or "x")
    # no whitespace of any kind: the harness compares ONE token per
    # word (U+2028 etc. are whitespace to the Java tokenizer)
    return [w for w in words
            if w.strip() and not any(c.isspace() for c in w)]


def main() -> int:
    from lucene_solr_spark.analysis.fold import ascii_fold

    classes = ensure_oracle()
    rng = random.Random(20260818)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    words = gen_words(n, rng)

    proc = subprocess.run(
        ["java", "-cp", classes, "FoldMain"],
        input="\n".join(words).encode("utf-8"),
        capture_output=True, timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr.decode()[:3000])
    jlines = proc.stdout.decode("utf-8").split("\n")[: len(words)]

    bad = 0
    for w, j in zip(words, jlines):
        # the pipeline's lowercase contract: Character.toLowerCase is
        # 1:1 ('İ' -> 'i', pre-mapped in tokenize_series)
        p = ascii_fold(w.replace("İ", "i").lower())
        if p != j:
            bad += 1
            if bad <= 40:
                print(f"  MISMATCH {w!r} ({[hex(ord(c)) for c in w]}): "
                      f"java={j!r} py={p!r}")
    print(f"fold: {len(words)} words, {'OK' if not bad else f'FAIL({bad})'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.exit(main())
