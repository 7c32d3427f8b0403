"""WHOLE-ANALYZER-CHAIN differential oracle: compile each reference
{Language}Analyzer (tokenizer + elision/normalize + stop + stem, the
real createComponents chain) with javac straight from the reference
sources, pipe fuzz text through it, and compare full (term, position)
token streams against analysis.tokenize_series — VERDICT-r4 item 3.

This subsumes the stemmer-level campaign (tools/fuzz_snowball.py /
fuzz_light.py): it exercises the tokenizer, chain order, elision,
stop sets and position-increment bookkeeping together, exactly the
layers the stemmer oracle could not see.

Usage:  python tools/fuzz_chain.py [n_lines_per_lang] [lang ...]

Requires javac/java (present in this container). Compiles into
/tmp/chain_oracle on first run (javac -sourcepath resolves the closure
through lucene core + analysis/common automatically; the stopword
resources ride the runtime classpath). Exit 1 on any mismatch.
"""
from __future__ import annotations

import os
import random
import subprocess
import sys

ORACLE_DIR = "/tmp/chain_oracle"
REF = "/root/reference"
CORE = f"{REF}/lucene/core/src/java"
COMMON = f"{REF}/lucene/analysis/common/src/java"
RES = (f"{REF}/lucene/analysis/common/src/resources:"
       f"{REF}/lucene/core/src/resources")
A = f"{COMMON}/org/apache/lucene/analysis"

CHAIN_MAIN = """
import org.apache.lucene.analysis.Analyzer;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;
import java.io.*;
import java.nio.charset.StandardCharsets;

/** stdin line -> one output line of tab-separated "term|pos" tokens
 *  (pos accumulated from posInc starting at -1, i.e. the pre-stop
 *  token index — the same convention as tokenize_series). */
public class ChainMain {
    public static void main(String[] args) throws Exception {
        String cls = args[0];
        Analyzer an = (Analyzer) Class.forName(cls)
            .getDeclaredConstructor().newInstance();
        BufferedReader in = new BufferedReader(
            new InputStreamReader(System.in, StandardCharsets.UTF_8));
        PrintStream out = new PrintStream(System.out, true, "UTF-8");
        String line;
        while ((line = in.readLine()) != null) {
            TokenStream ts = an.tokenStream("f", line.replace('\\u241E','\\n'));
            CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
            PositionIncrementAttribute pi =
                ts.addAttribute(PositionIncrementAttribute.class);
            ts.reset();
            StringBuilder sb = new StringBuilder();
            int pos = -1;
            while (ts.incrementToken()) {
                pos += pi.getPositionIncrement();
                if (sb.length() > 0) sb.append('\\t');
                sb.append(term.toString()).append('|').append(pos);
            }
            ts.end();
            ts.close();
            out.println(sb.toString());
        }
    }
}
"""

# (java analyzer FQCN, repo analyzer name, alphabet extras)
# NOTE the vintage's DEFAULT de/fr/es/pt/it analyzers use LIGHT stemmers
# The standard-analyzer extras exercise the full UAX#29 tail: Hebrew
# quotes (WB7a/b/c), geresh/gershayim, the full mid classes, Nl/No,
# SEA scripts, underscore shapes.
LANGS = [
    ("org.apache.lucene.analysis.standard.StandardAnalyzer", "standard",
     "אבגש׳״·‧Ⅻ①๑ก"),
    ("org.apache.lucene.analysis.en.EnglishAnalyzer", "english", ""),
    ("org.apache.lucene.analysis.de.GermanAnalyzer", "german_light", "äöüß"),
    ("org.apache.lucene.analysis.fr.FrenchAnalyzer", "french_light",
     "àâçèéêëîïôùûüæœ"),
    ("org.apache.lucene.analysis.es.SpanishAnalyzer", "spanish_light",
     "áéíñóúü"),
    ("org.apache.lucene.analysis.pt.PortugueseAnalyzer", "portuguese_light",
     "áâãçéêíóôõú"),
    ("org.apache.lucene.analysis.it.ItalianAnalyzer", "italian_light",
     "àèéìíîòóùú"),
    ("org.apache.lucene.analysis.ru.RussianAnalyzer", "russian",
     "абвгдежзийклмнопрстуфхцчшщъыьэюяё"),
    ("org.apache.lucene.analysis.nl.DutchAnalyzer", "dutch", "äëïöü"),
    ("org.apache.lucene.analysis.sv.SwedishAnalyzer", "swedish", "äåö"),
    ("org.apache.lucene.analysis.no.NorwegianAnalyzer", "norwegian", "æåø"),
    ("org.apache.lucene.analysis.da.DanishAnalyzer", "danish", "æåø"),
    ("org.apache.lucene.analysis.ro.RomanianAnalyzer", "romanian", "âîăşţ"),
    ("org.apache.lucene.analysis.fi.FinnishAnalyzer", "finnish", "äöy"),
    ("org.apache.lucene.analysis.hu.HungarianAnalyzer", "hungarian",
     "áéíóöõúüû"),
    ("org.apache.lucene.analysis.ca.CatalanAnalyzer", "catalan",
     "àáèéíïòóúü"),
    ("org.apache.lucene.analysis.tr.TurkishAnalyzer", "turkish", "çğıöşüâ"),
    ("org.apache.lucene.analysis.eu.BasqueAnalyzer", "basque", ""),
    ("org.apache.lucene.analysis.ga.IrishAnalyzer", "irish", "áéíóú"),
    ("org.apache.lucene.analysis.hy.ArmenianAnalyzer", "armenian",
     "աբգդեզէըթժիլխծկհձղճմյնշոչպջռսվտրցւփքօֆ"),
    ("org.apache.lucene.analysis.ar.ArabicAnalyzer", "arabic",
     "ابتثجحخدذرزسشصضطظعغفقكلمنهويىةءآأإ"),
    ("org.apache.lucene.analysis.fa.PersianAnalyzer", "persian",
     "ابپتثجچحخدذرزژسشصضطظعغفقکگلمنوهیي"),
    ("org.apache.lucene.analysis.cz.CzechAnalyzer", "czech",
     "áčďéěíňóřšťúůýž"),
    ("org.apache.lucene.analysis.bg.BulgarianAnalyzer", "bulgarian",
     "абвгдежзийклмнопрстуфхцчшщъьюя"),
    ("org.apache.lucene.analysis.hi.HindiAnalyzer", "hindi",
     "अआइईउऊएऐओऔकखगघचछजझटठडढणतथदधनपफबभमयरलवशषसहािीुूेैोौं्ँः"),
    ("org.apache.lucene.analysis.id.IndonesianAnalyzer", "indonesian", ""),
    ("org.apache.lucene.analysis.lv.LatvianAnalyzer", "latvian",
     "āčēģīķļņšūž"),
    ("org.apache.lucene.analysis.el.GreekAnalyzer", "greek",
     "αβγδεζηθικλμνξοπρστυφχψωάέήίόύώϊϋΰΐς"),
    ("org.apache.lucene.analysis.ckb.SoraniAnalyzer", "sorani",
     "ئابپتجچحخدرڕزژسشعغفڤقکگلڵمنوۆهھەیێ"),
    ("org.apache.lucene.analysis.br.BrazilianAnalyzer", "brazilian",
     "áâãçéêíóôõú"),
    ("org.apache.lucene.analysis.gl.GalicianAnalyzer", "galician",
     "áéíñóúü"),
    ("org.apache.lucene.analysis.cjk.CJKAnalyzer", "cjk",
     "中文字漢語カタカナひらがな한국어ﾡﾢﾣ"),
]

_PKGS = ("de fr es pt ru it nl sv no da ro fi hu ca tr eu ga hy ar fa cz "
         "bg hi id lv el ckb br gl en cjk th standard core util "
         "miscellaneous snowball").split()


def ensure_oracle() -> str:
    classes = os.path.join(ORACLE_DIR, "classes")
    if os.path.exists(os.path.join(classes, "ChainMain.class")):
        return classes
    os.makedirs(ORACLE_DIR, exist_ok=True)
    with open(os.path.join(ORACLE_DIR, "ChainMain.java"), "w") as f:
        f.write(CHAIN_MAIN)
    srcs = [os.path.join(ORACLE_DIR, "ChainMain.java"),
            f"{CORE}/org/apache/lucene/analysis/tokenattributes/*.java"]
    for p in _PKGS:
        if os.path.isdir(f"{A}/{p}"):
            srcs.append(f"{A}/{p}/*.java")
    cmd = (
        f"cd {ORACLE_DIR} && javac -d classes -encoding UTF-8 -nowarn "
        f"-sourcepath {CORE}:{COMMON} " + " ".join(srcs)
    )
    r = subprocess.run(cmd, shell=True, capture_output=True, text=True)
    if not os.path.exists(os.path.join(classes, "ChainMain.class")):
        sys.stderr.write(r.stdout + r.stderr)
        raise RuntimeError("chain oracle compile failed")
    return classes


def run_java(classes: str, fqcn: str, lines: list[str]) -> list[str]:
    proc = subprocess.run(
        ["java", "-cp", f"{classes}:{RES}", "ChainMain", fqcn],
        input="\n".join(lines).encode("utf-8"),
        capture_output=True, timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr.decode("utf-8")[:2000])
    return proc.stdout.decode("utf-8").split("\n")[: len(lines)]


def parse_stream(line: str) -> list[tuple[str, int]]:
    if not line:
        return []
    out = []
    for tok in line.split("\t"):
        term, _, pos = tok.rpartition("|")
        out.append((term, int(pos)))
    return out


def py_stream(text: str, analyzer: str) -> list[tuple[str, int]]:
    from lucene_solr_spark.analysis import analyze_one

    return analyze_one(text, analyzer=analyzer)


def gen_lines(py_name: str, extras: str, n: int, rng: random.Random,
              stops) -> list[str]:
    """Fuzz lines: per-language letters + stop words + elision forms +
    apostrophes, digits, mixed case, multi-space — the chain surface."""
    alpha = "abcdefghijklmnopqrstuvwxyz" + extras
    if py_name in ("russian", "bulgarian", "armenian", "arabic", "persian",
                   "hindi", "greek", "sorani"):
        alpha = extras  # native script only
    stops = sorted(stops)
    articles = {
        "french_light": ["l", "d", "qu", "j", "c", "jusqu", "lorsqu"],
        "italian_light": ["l", "dell", "un", "all", "d"],
        "catalan": ["d", "l", "m", "n", "s", "t"],
        "irish": ["d", "m", "b"],
    }.get(py_name, [])

    seeds = {
        # DutchAnalyzer's StemmerOverrideFilter dictionary entries
        "dutch": ["fiets", "bromfiets", "ei", "kind", "eieren", "kinderen"],
        # EnglishPossessiveFilter shapes
        "english": ["john's", "users'", "IT's", "o'clock"],
        # TurkishAnalyzer apostrophe + dotted/dotless I
        "turkish": ["Türkiye'nin", "İstanbul'da", "ISPARTA", "kitabı"],
        # Irish eclipsis/hyphenation and elision shapes
        "irish": ["n-athair", "t-uisce", "d'fhear", "b'fhearr", "hÁrd",
                  "nAthair", "tUisce", "nÁisiúnta", "nGaillimh", "tSín"],
    }.get(py_name, [])

    def word():
        r = rng.random()
        if seeds and r < 0.08:
            return rng.choice(seeds)
        if r < 0.22 and stops:
            w = rng.choice(stops)
        else:
            w = "".join(rng.choice(alpha)
                        for _ in range(rng.randint(1, 9)))
        if articles and rng.random() < 0.18:
            w = rng.choice(articles) + "'" + w
        elif rng.random() < 0.06:
            w = w + "'" + "".join(rng.choice(alpha)
                                  for _ in range(rng.randint(1, 4)))
        if rng.random() < 0.08:
            w = w.upper() if rng.random() < 0.5 else w.capitalize()
        if rng.random() < 0.06:
            w = w + str(rng.randint(0, 999))
        return w

    lines = []
    for _ in range(n):
        k = rng.randint(2, 10)
        sep = "  " if rng.random() < 0.1 else " "
        lines.append(sep.join(word() for _ in range(k)))
    return lines


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    only = set(sys.argv[2:])
    classes = ensure_oracle()
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lucene_solr_spark.analysis.light import LIGHT_STOPWORDS
    from lucene_solr_spark.analysis.snowball import SNOWBALL_STOPWORDS
    from lucene_solr_spark.analysis.text import ENGLISH_STOP_WORDS

    rng = random.Random(20260818)
    total_bad = 0
    for fqcn, py_name, extras in LANGS:
        if only and py_name not in only:
            continue
        stops = (SNOWBALL_STOPWORDS.get(py_name)
                 or LIGHT_STOPWORDS.get(py_name) or ENGLISH_STOP_WORDS)
        lines = gen_lines(py_name, extras, n, rng, stops)
        expected = [parse_stream(x) for x in run_java(classes, fqcn, lines)]
        bad = []
        for line, exp in zip(lines, expected):
            got = py_stream(line, py_name)
            if got != exp:
                bad.append((line, got, exp))
        status = "OK " if not bad else "FAIL"
        print(f"{status} {py_name:<17} {len(lines) - len(bad)}/{len(lines)}")
        for line, got, exp in bad[:6]:
            print(f"      line: {line!r}")
            print(f"        py:   {got!r}")
            print(f"        java: {exp!r}")
        total_bad += len(bad)
    sys.exit(1 if total_bad else 0)


if __name__ == "__main__":
    main()
