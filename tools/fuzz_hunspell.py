"""Hunspell differential oracle: compile the reference's own
hunspell/Dictionary.java + Stemmer.java (javac straight from the
reference sources, -sourcepath resolving the lucene-core closure), pipe
generated words through Stemmer.uniqueStems / stem, and compare against
analysis/hunspell.py for every parseable test-fixture dictionary in the
reference tree.

Word generation per fixture: every .dic entry, every entry with every
affix append applied (prefix, suffix, prefix+suffix), case variants
(Title/UPPER), and random mutations — the surface the recursion
actually branches on.

Usage:  python tools/fuzz_hunspell.py [fixture ...]
Exit 1 on any mismatch.
"""
from __future__ import annotations

import glob
import os
import random
import subprocess
import sys

ORACLE_DIR = "/tmp/hunspell_oracle"
REF = "/root/reference"
CORE = f"{REF}/lucene/core/src/java"
COMMON = f"{REF}/lucene/analysis/common/src/java"
FIXDIR = (f"{REF}/lucene/analysis/common/src/test/org/apache/lucene/"
          "analysis/hunspell")

HUNSPELL_MAIN = """
import org.apache.lucene.analysis.hunspell.Dictionary;
import org.apache.lucene.analysis.hunspell.HunspellOracle;
import java.io.*;
import java.nio.charset.StandardCharsets;
import java.nio.file.*;
import java.util.List;

public class HunspellMain {
    public static void main(String[] args) throws Exception {
        InputStream aff = Files.newInputStream(Paths.get(args[0]));
        InputStream dic = Files.newInputStream(Paths.get(args[1]));
        boolean ignoreCase = args.length > 2 && args[2].equals("ic");
        Dictionary d = new Dictionary(aff,
            java.util.Collections.singletonList(dic), ignoreCase);
        BufferedReader in = new BufferedReader(
            new InputStreamReader(System.in, StandardCharsets.UTF_8));
        PrintStream out = new PrintStream(System.out, true, "UTF-8");
        String line;
        while ((line = in.readLine()) != null) {
            // raw stem order U+241F unique stems (order-sensitive both)
            out.println(HunspellOracle.stems(d, line) + "\\u2400"
                        + HunspellOracle.uniqueStems(d, line));
        }
    }
}
"""

# package-private Stemmer access requires a helper inside the package
HUNSPELL_ORACLE = """
package org.apache.lucene.analysis.hunspell;

import org.apache.lucene.util.CharsRef;
import java.util.List;

public class HunspellOracle {
    public static String stems(Dictionary d, String word) {
        return join(new Stemmer(d).stem(word));
    }
    public static String uniqueStems(Dictionary d, String word) {
        char[] c = word.toCharArray();
        return join(new Stemmer(d).uniqueStems(c, c.length));
    }
    private static String join(List<CharsRef> refs) {
        StringBuilder sb = new StringBuilder();
        for (CharsRef r : refs) {
            if (sb.length() > 0) sb.append('\\u241F');
            sb.append(r.toString());
        }
        return sb.toString();
    }
}
"""

# fixtures that are deliberately broken or need resources we don't ship
SKIP = {"broken", "broken-flags", "morph"}  # morph: aliased morph only

# .aff fixtures paired with a differently-named .dic (same pairs the
# reference's own tests use: TestOptionalCondition/TestTwoFold/...)
CROSS_PAIRS = [
    ("optional-condition", "condition"),
    ("twofold", "morph"),
    ("compressed-before-set", "compressed"),
    ("compressed-empty-alias", "compressed"),
]


def ensure_oracle() -> str:
    classes = os.path.join(ORACLE_DIR, "classes")
    if os.path.exists(os.path.join(classes, "HunspellMain.class")):
        return classes
    os.makedirs(ORACLE_DIR, exist_ok=True)
    with open(os.path.join(ORACLE_DIR, "HunspellMain.java"), "w") as f:
        f.write(HUNSPELL_MAIN)
    with open(os.path.join(ORACLE_DIR, "HunspellOracle.java"), "w") as f:
        f.write(HUNSPELL_ORACLE)
    cmd = (
        f"cd {ORACLE_DIR} && javac -d classes -encoding UTF-8 -nowarn "
        f"-sourcepath {CORE}:{COMMON}:{ORACLE_DIR} "
        f"HunspellMain.java HunspellOracle.java "
        f"{COMMON}/org/apache/lucene/analysis/hunspell/Dictionary.java "
        f"{COMMON}/org/apache/lucene/analysis/hunspell/Stemmer.java"
    )
    r = subprocess.run(cmd, shell=True, capture_output=True, text=True)
    if not os.path.exists(os.path.join(classes, "HunspellMain.class")):
        sys.stderr.write(r.stdout + r.stderr)
        raise RuntimeError("hunspell oracle compile failed")
    return classes


def run_java(classes: str, aff: str, dic: str, words: list[str],
             ignore_case: bool) -> list[str]:
    args = ["java", "-cp", classes, "HunspellMain", aff, dic]
    if ignore_case:
        args.append("ic")
    proc = subprocess.run(
        args, input="\n".join(words).encode("utf-8"),
        capture_output=True, timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr.decode("utf-8")[:4000])
    return proc.stdout.decode("utf-8").split("\n")[: len(words)]


def gen_words(aff_bytes: bytes, dic_bytes: bytes, rng: random.Random,
              encoding: str) -> list[str]:
    from lucene_solr_spark.analysis.hunspell import HunspellDictionary

    d = HunspellDictionary(aff_bytes, [dic_bytes])
    roots = []
    for entry in list(d.words)[:200]:
        if entry:
            roots.append(entry)
    appends_sfx = [a.append for a in d.affixes][:40]
    appends_pfx = [d.affixes[i].append
                   for ids in d.prefixes.values() for i in ids][:20]
    words = set()
    for root in roots:
        words.add(root)
        words.add(root.title())
        words.add(root.upper())
        for s in appends_sfx:
            words.add(root + s)
            # strip-aware guess: drop 1-2 trailing chars then append
            if len(root) > 2:
                words.add(root[:-1] + s)
                words.add(root[:-2] + s)
        for p in appends_pfx:
            words.add(p + root)
            words.add((p + root).title())
            for s in appends_sfx[:10]:
                words.add(p + root + s)
    # random mutations
    pool = sorted(words)
    for w in pool[:300]:
        if len(w) > 2:
            i = rng.randrange(len(w))
            words.add(w[:i] + w[i + 1:])
            words.add(w + w[rng.randrange(len(w))])
    out = sorted(x for x in words if x and "\n" not in x)
    return out[:4000]


def check_fixture(classes: str, name: str, rng: random.Random,
                  ignore_case: bool = False,
                  dic_name: str = None) -> tuple[int, int]:
    from lucene_solr_spark.analysis.hunspell import (
        HunspellDictionary, HunspellStemmer)

    aff_path = os.path.join(FIXDIR, name + ".aff")
    dic_path = os.path.join(FIXDIR, (dic_name or name) + ".dic")
    with open(aff_path, "rb") as f:
        aff = f.read()
    with open(dic_path, "rb") as f:
        dic = f.read()
    try:
        d = HunspellDictionary(aff, [dic], ignore_case=ignore_case)
    except Exception as e:  # parse parity for broken fixtures is n/a
        print(f"  {name}: SKIP (parse: {e})")
        return (0, 0)
    stemmer = HunspellStemmer(d)
    enc = HunspellDictionary._detect_encoding(aff)
    words = gen_words(aff, dic, rng, enc)
    got_java = run_java(classes, aff_path, dic_path, words, ignore_case)
    bad = 0
    for w, jline in zip(words, got_java):
        raw_j, _, uniq_j = jline.partition("␀")
        raw_p = "␟".join(stemmer.stem(w))
        uniq_p = "␟".join(stemmer.unique_stems(w))
        if raw_p != raw_j or uniq_p != uniq_j:
            bad += 1
            if bad <= 5:
                print(f"  MISMATCH {name} {w!r}: java raw={raw_j!r} "
                      f"uniq={uniq_j!r} | py raw={raw_p!r} uniq={uniq_p!r}")
    return (len(words), bad)


def main() -> int:
    classes = ensure_oracle()
    rng = random.Random(42)
    if len(sys.argv) > 1:
        names = sys.argv[1:]
    else:
        names = sorted(
            os.path.basename(p)[:-4]
            for p in glob.glob(os.path.join(FIXDIR, "*.aff"))
            if os.path.basename(p)[:-4] not in SKIP
            and os.path.exists(os.path.join(FIXDIR,
                                            os.path.basename(p)[:-4]
                                            + ".dic"))
        )
    jobs = [(n, None) for n in names]
    if len(sys.argv) <= 1:
        jobs += CROSS_PAIRS
    total = fails = 0
    for name, dic_name in jobs:
        for ic in (False, True):
            n, bad = check_fixture(classes, name, rng, ignore_case=ic,
                                   dic_name=dic_name)
            tag = "ic" if ic else "cs"
            status = "OK" if bad == 0 else f"FAIL({bad})"
            if n:
                print(f"{name} [{tag}]: {n} words {status}")
            total += n
            fails += bad
    print(f"TOTAL: {total} comparisons, {fails} mismatches")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.exit(main())
