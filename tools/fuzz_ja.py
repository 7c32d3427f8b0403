"""Differential oracle for the dictionary-free kuromoji components:
JapaneseIterationMarkCharFilter and JapaneseKatakanaStemFilter compiled
from the reference sources (they need none of the missing binary
dictionaries) and compared against analysis/japanese.py.

The JapaneseTokenizer itself cannot run here — the reference checkout
ships the kuromoji resources without TokenInfoDictionary$buffer.dat
(verified: its own JapaneseAnalyzer throws FileNotFoundException), so
the two char/token filters are the verifiable ja surface.

Usage: python tools/fuzz_ja.py [n_lines]   (exit 1 on any mismatch)
"""
from __future__ import annotations

import os
import random
import subprocess
import sys

ORACLE_DIR = "/tmp/ja_oracle"
REF = "/root/reference"
CORE = f"{REF}/lucene/core/src/java"
COMMON = f"{REF}/lucene/analysis/common/src/java"
KURO = f"{REF}/lucene/analysis/kuromoji/src/java"

JA_MAIN = """
import org.apache.lucene.analysis.ja.JapaneseIterationMarkCharFilter;
import org.apache.lucene.analysis.ja.JapaneseKatakanaStemFilter;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import java.io.*;
import java.nio.charset.StandardCharsets;

public class JaMain {
    public static void main(String[] args) throws Exception {
        boolean kanji = args[0].contains("kanji");
        boolean kana = args[0].contains("kana");
        boolean stem = args[0].contains("stem");
        BufferedReader in = new BufferedReader(
            new InputStreamReader(System.in, StandardCharsets.UTF_8));
        PrintStream out = new PrintStream(System.out, true, "UTF-8");
        String line;
        while ((line = in.readLine()) != null) {
            if (stem) {
                WhitespaceTokenizer tok = new WhitespaceTokenizer();
                tok.setReader(new StringReader(line));
                TokenStream ts = new JapaneseKatakanaStemFilter(tok);
                CharTermAttribute term =
                    ts.addAttribute(CharTermAttribute.class);
                ts.reset();
                StringBuilder sb = new StringBuilder();
                while (ts.incrementToken()) {
                    if (sb.length() > 0) sb.append(' ');
                    sb.append(term.toString());
                }
                ts.end();
                ts.close();
                out.println(sb.toString());
            } else {
                Reader r = new JapaneseIterationMarkCharFilter(
                    new StringReader(line), kanji, kana);
                StringBuilder sb = new StringBuilder();
                int c;
                while ((c = r.read()) != -1) sb.append((char) c);
                out.println(sb.toString());
            }
        }
    }
}
"""


def ensure_oracle() -> str:
    classes = os.path.join(ORACLE_DIR, "classes")
    if os.path.exists(os.path.join(classes, "JaMain.class")):
        return classes
    os.makedirs(ORACLE_DIR, exist_ok=True)
    with open(os.path.join(ORACLE_DIR, "JaMain.java"), "w") as f:
        f.write(JA_MAIN)
    # the *Impl attribute classes are loaded reflectively, so compile
    # the whole tokenattributes package explicitly
    cmd = (
        f"cd {ORACLE_DIR} && javac -d classes -encoding UTF-8 -nowarn "
        f"-sourcepath {CORE}:{COMMON}:{KURO} JaMain.java "
        f"{CORE}/org/apache/lucene/analysis/tokenattributes/*.java"
    )
    r = subprocess.run(cmd, shell=True, capture_output=True, text=True)
    if not os.path.exists(os.path.join(classes, "JaMain.class")):
        sys.stderr.write(r.stdout + r.stderr)
        raise RuntimeError("ja oracle compile failed")
    return classes


def run_java(classes: str, mode: str, lines: list[str]) -> list[str]:
    proc = subprocess.run(
        ["java", "-cp", classes, "JaMain", mode],
        input="\n".join(lines).encode("utf-8"),
        capture_output=True, timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr.decode("utf-8")[:3000])
    return proc.stdout.decode("utf-8").split("\n")[: len(lines)]


# hiragana base+dakuten range, katakana, kanji, marks, resets
_ALPHA = (
    "かがきくぐさざしじすずたちつづてとなにはばぱひふへほまやゆよ"
    "カガキクケコサザシジスズタチツヅテトナニハバパヒフヘホーャュ"
    "国人日本語学校年月時東京々"
    "ゝゞヽヾ。、 abc19"
)


def gen_lines(n: int, rng: random.Random) -> list[str]:
    lines = []
    # seeded edge cases
    lines += [
        "々", "ゝ", "ヾ",                      # marks at stream start
        "学生々々", "こゝろ", "こゞ", "ほゞ",   # classic examples
        "バナヽ", "ハヾ", "みすゞ",
        "さゝゝ", "こどもゞゝ",                 # multi-mark spans
        "時々。々",                             # full-stop reset
        "馬鹿々々しい",
        "😀々", "a々", "?ゝ",                  # surrogate / ascii sources
        "ゝゝゝゝ", "々ゝヾheヽ",
    ]
    for _ in range(n):
        k = rng.randrange(1, 30)
        lines.append("".join(rng.choice(_ALPHA) for _ in range(k)))
    return lines


def gen_stem_lines(n: int, rng: random.Random) -> list[str]:
    lines = ["コピー サーバー ター タクシー カラー",
             "センター こー データー abcー カーー",
             "ミー ミラー 区ー ハﾞー"]
    kat = "アカガサザタダナハバパマヤラワンーィッ"
    for _ in range(n):
        toks = []
        for _ in range(rng.randrange(1, 6)):
            k = rng.randrange(1, 8)
            toks.append("".join(rng.choice(kat + "あか字a")
                                for _ in range(k)))
        lines.append(" ".join(toks))
    return lines


def main() -> int:
    from lucene_solr_spark.analysis.japanese import (
        iteration_mark_normalize, katakana_stem)

    classes = ensure_oracle()
    rng = random.Random(20260818)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    fails = total = 0

    for mode, kanji, kana in (("kanji+kana", True, True),
                              ("kanji", True, False),
                              ("kana", False, True)):
        lines = gen_lines(n, rng)
        got = run_java(classes, mode, lines)
        bad = 0
        for line, j in zip(lines, got):
            p = iteration_mark_normalize(line, normalize_kanji=kanji,
                                         normalize_kana=kana)
            if p != j:
                bad += 1
                if bad <= 5:
                    print(f"  MISMATCH [{mode}] {line!r}: java={j!r} "
                          f"py={p!r}")
        print(f"iteration_mark[{mode}]: {len(lines)} lines, "
              f"{'OK' if not bad else f'FAIL({bad})'}")
        total += len(lines)
        fails += bad

    lines = gen_stem_lines(n, rng)
    got = run_java(classes, "stem", lines)
    bad = 0
    for line, j in zip(lines, got):
        p = " ".join(katakana_stem(t) for t in line.split())
        if p != j:
            bad += 1
            if bad <= 5:
                print(f"  MISMATCH [stem] {line!r}: java={j!r} py={p!r}")
    print(f"katakana_stem: {len(lines)} lines, "
          f"{'OK' if not bad else f'FAIL({bad})'}")
    total += len(lines)
    fails += bad

    print(f"TOTAL: {total} lines, {fails} mismatches")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.exit(main())
