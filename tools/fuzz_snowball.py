"""Differential fuzz of every Python Snowball stemmer against the
reference's own generated Java programs (org/tartarus/snowball/ext/*),
compiled locally with two tiny lucene-util stubs. This is the strongest
possible parity check: the Java side IS the reference implementation.

Usage:  python tools/fuzz_snowball.py [n_words_per_lang]

Requires javac/java (present in this container). Compiles into
/tmp/snowball_oracle on first run. Prints per-language mismatch counts
and up to 10 example mismatches; exit code 1 if any language mismatches.
"""

import os
import random
import subprocess
import sys

ORACLE_DIR = "/tmp/snowball_oracle"
REF = "/root/reference/lucene/analysis/common/src/java"

MAIN_JAVA = """
import org.tartarus.snowball.SnowballProgram;
import java.io.*;
import java.nio.charset.StandardCharsets;

public class Main {
    public static void main(String[] args) throws Exception {
        String lang = args[0];
        Class<?> cls = Class.forName("org.tartarus.snowball.ext." + lang + "Stemmer");
        SnowballProgram st = (SnowballProgram) cls.getDeclaredConstructor().newInstance();
        BufferedReader in = new BufferedReader(new InputStreamReader(System.in, StandardCharsets.UTF_8));
        PrintStream out = new PrintStream(System.out, true, "UTF-8");
        String line;
        java.lang.reflect.Method stem = cls.getMethod("stem");
        while ((line = in.readLine()) != null) {
            st.setCurrent(line);
            stem.invoke(st);
            out.println(st.getCurrent());
        }
    }
}
"""

ARRAYUTIL = """package org.apache.lucene.util;
public class ArrayUtil {
    public static int oversize(int minSize, int bytesPerElement) {
        return Math.max(minSize, minSize + (minSize >> 3) + 8);
    }
}
"""
RAMUSAGE = """package org.apache.lucene.util;
public class RamUsageEstimator {
    public static final int NUM_BYTES_CHAR = 2;
}
"""

# (java class prefix, python fn name, alphabet extras)
LANGS = [
    ("German", "german_stem", "äöüß"),
    ("French", "french_stem", "àâçèéêëîïôùûüæœ"),
    ("Spanish", "spanish_stem", "áéíñóúü"),
    ("Portuguese", "portuguese_stem", "áâãçéêíóôõú"),
    ("Russian", "russian_stem", "абвгдежзийклмнопрстуфхцчшщъыьэюяё"),
    ("Italian", "italian_stem", "àèéìíîòóùú"),
    ("Dutch", "dutch_stem", "äëïöüáéíóú"),
    ("Swedish", "swedish_stem", "äåö"),
    ("Norwegian", "norwegian_stem", "æåø"),
    ("Danish", "danish_stem", "æåø"),
    ("Romanian", "romanian_stem", "âîăşţ"),
    ("Finnish", "finnish_stem", "äöy"),
    ("Hungarian", "hungarian_stem", "áéíóöõúüû"),
    ("Catalan", "catalan_stem", "àáèéíïòóúü·"),
    ("Turkish", "turkish_stem", "çğıöşüâ"),
    ("Basque", "basque_stem", ""),
    ("Irish", "irish_stem", "áéíóú'-"),
    ("Armenian", "armenian_stem", "աբգդեզէըթժիլխծկհձղճմյնշոչպջռսվտրցւփքօֆ"),
]


def ensure_oracle():
    classes = os.path.join(ORACLE_DIR, "classes")
    if os.path.exists(os.path.join(classes, "Main.class")):
        return classes
    os.makedirs(ORACLE_DIR, exist_ok=True)
    src = os.path.join(ORACLE_DIR, "src")
    os.makedirs(os.path.join(src, "org/apache/lucene/util"), exist_ok=True)
    subprocess.run(["cp", "-r", os.path.join(REF, "org"), src], check=True)
    with open(os.path.join(src, "org/apache/lucene/util/ArrayUtil.java"), "w") as f:
        f.write(ARRAYUTIL)
    with open(os.path.join(src, "org/apache/lucene/util/RamUsageEstimator.java"), "w") as f:
        f.write(RAMUSAGE)
    with open(os.path.join(ORACLE_DIR, "Main.java"), "w") as f:
        f.write(MAIN_JAVA)
    cmd = (
        f"cd {ORACLE_DIR} && javac -d classes -encoding UTF-8 "
        "src/org/apache/lucene/util/*.java src/org/tartarus/snowball/*.java "
        "src/org/tartarus/snowball/ext/*.java Main.java"
    )
    subprocess.run(cmd, shell=True, check=True)
    return classes


def gen_words(lang, extras, n, rng, py_mod):
    """Suffix-table-seeded + random words: stems x real suffixes catch
    the interesting paths; pure-random strings catch guards/edges."""
    alpha = "abcdefghijklmnopqrstuvwxyz" + extras
    if lang == "Russian":
        alpha = extras  # Cyrillic only
    # harvest this language's suffix strings from the python module
    prefix = {"German": "_DE", "French": "_FR", "Spanish": "_ES",
              "Portuguese": "_PT", "Russian": "_RU", "Italian": "_IT",
              "Dutch": "_NL", "Swedish": "_SV", "Norwegian": "_NO",
              "Danish": "_DA", "Romanian": "_RO", "Finnish": "_FI",
              "Hungarian": "_HU", "Catalan": "_CA", "Turkish": "_TR",
              "Basque": "_EU", "Irish": "_GA", "Armenian": "_HY"}[lang]
    sufs = set()
    for name in dir(py_mod):
        if name.startswith(prefix):
            val = getattr(py_mod, name)
            if isinstance(val, (tuple, frozenset)):
                for x in val:
                    if isinstance(x, str) and 0 < len(x) <= 12:
                        sufs.add(x)
            elif isinstance(val, dict):
                for k in val:
                    if isinstance(k, str):
                        sufs.add(k)
    sufs = sorted(sufs)
    words = []
    for _ in range(n):
        r = rng.random()
        stem_len = rng.randint(1, 8)
        stem = "".join(rng.choice(alpha) for _ in range(stem_len))
        if r < 0.55 and sufs:
            word = stem + rng.choice(sufs)
            if rng.random() < 0.3 and sufs:
                word += rng.choice(sufs)
        elif r < 0.7 and sufs:
            word = rng.choice(sufs) + stem
        else:
            word = stem
        words.append(word)
    return words


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    classes = ensure_oracle()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lucene_solr_spark.analysis import snowball as sb

    rng = random.Random(20260817)
    total_bad = 0
    for jname, pyname, extras in LANGS:
        fn = getattr(sb, pyname)
        words = gen_words(jname, extras, n, rng, sb)
        proc = subprocess.run(
            ["java", "-cp", f"{classes}:{ORACLE_DIR}", "Main", jname],
            input="\n".join(words).encode("utf-8"),
            capture_output=True, timeout=300,
        )
        expected = proc.stdout.decode("utf-8").splitlines()
        assert len(expected) == len(words), (jname, len(expected), len(words))
        bad = [(w, fn(w), e) for w, e in zip(words, expected) if fn(w) != e]
        status = "OK " if not bad else "FAIL"
        print(f"{status} {jname:<11} {len(words) - len(bad)}/{len(words)}")
        for w, got, exp in bad[:10]:
            print(f"      {w!r}: py={got!r} java={exp!r}")
        total_bad += len(bad)
    sys.exit(1 if total_bad else 0)


if __name__ == "__main__":
    main()
