"""Differential fuzz of the Porter stemmer and every light language
pack/variant against the REFERENCE Java implementations — 28 kernels:
porter, the eleven language packs (ar/fa/bg/cz/hi/id/lv/el/ckb/br/gl),
the five UniNE default-chain light stemmers (de/fr/es/pt/it), and the
eleven *StemFilter factory options (pt-rslp, pt/gl-minimal, sv/no/ru/
hu/fi light, no/de/fr minimal). Compiled with tiny lucene-util stubs
next to the Snowball oracle (see tools/fuzz_snowball.py, which builds
the shared /tmp/snowball_oracle tree; LightMain.java drives these
classes, with the .rslp rule files on its classpath).

Usage: python tools/fuzz_light.py [n_words_per_lang]
Exit 1 on any mismatch.
"""

import os
import random
import subprocess
import sys

ORACLE_DIR = "/tmp/snowball_oracle"
REF = "/root/reference/lucene/analysis/common/src/java/org/apache/lucene/analysis"

LIGHT_SOURCES = [
    "util/StemmerUtil.java", "en/PorterStemmer.java",
    "ar/ArabicNormalizer.java", "ar/ArabicStemmer.java",
    "fa/PersianNormalizer.java", "bg/BulgarianStemmer.java",
    "cz/CzechStemmer.java", "hi/HindiNormalizer.java",
    "hi/HindiStemmer.java", "id/IndonesianStemmer.java",
    "lv/LatvianStemmer.java", "el/GreekStemmer.java",
    "br/BrazilianStemmer.java",
    "ckb/SoraniNormalizer.java", "ckb/SoraniStemmer.java",
    "pt/RSLPStemmerBase.java", "gl/GalicianStemmer.java",
    "de/GermanLightStemmer.java", "fr/FrenchLightStemmer.java",
    "es/SpanishLightStemmer.java", "pt/PortugueseLightStemmer.java",
    "it/ItalianLightStemmer.java",
    "pt/PortugueseStemmer.java", "pt/PortugueseMinimalStemmer.java",
    "gl/GalicianMinimalStemmer.java", "sv/SwedishLightStemmer.java",
    "no/NorwegianLightStemmer.java", "no/NorwegianMinimalStemmer.java",
    "ru/RussianLightStemmer.java", "hu/HungarianLightStemmer.java",
    "fi/FinnishLightStemmer.java", "de/GermanMinimalStemmer.java",
    "fr/FrenchMinimalStemmer.java",
]

PORTER_SHIM = """package org.apache.lucene.analysis.en;
public class PorterShim {
    public static String stem(String s) { return new PorterStemmer().stem(s); }
}
"""

CHARARRAYSET = """package org.apache.lucene.analysis.util;
import java.util.*;
import org.apache.lucene.util.Version;
public class CharArraySet {
    private final Set<String> set = new HashSet<>();
    public CharArraySet(Collection<?> c, boolean ignoreCase) {
        for (Object o : c) set.add(o.toString());
    }
    public CharArraySet(Version v, Collection<?> c, boolean ignoreCase) {
        this(c, ignoreCase);
    }
    public boolean contains(char[] text, int off, int len) {
        return set.contains(new String(text, off, len));
    }
    public boolean contains(CharSequence cs) { return set.contains(cs.toString()); }
}
"""

VERSION = """package org.apache.lucene.util;
public enum Version { LUCENE_CURRENT; }
"""

ARRAYUTIL = """package org.apache.lucene.util;
import java.util.Arrays;
public class ArrayUtil {
    public static int oversize(int minSize, int bytesPerElement) {
        return Math.max(minSize, minSize + (minSize >> 3) + 8);
    }
    public static char[] grow(char[] arr, int minSize) {
        return arr.length >= minSize ? arr : Arrays.copyOf(arr, oversize(minSize, 2));
    }
}
"""

LIGHT_MAIN = r"""
import java.io.*;
import java.nio.charset.StandardCharsets;
import org.apache.lucene.analysis.en.PorterShim;
import org.apache.lucene.analysis.ar.*;
import org.apache.lucene.analysis.fa.PersianNormalizer;
import org.apache.lucene.analysis.bg.BulgarianStemmer;
import org.apache.lucene.analysis.cz.CzechStemmer;
import org.apache.lucene.analysis.hi.*;
import org.apache.lucene.analysis.id.IndonesianStemmer;
import org.apache.lucene.analysis.lv.LatvianStemmer;
import org.apache.lucene.analysis.el.GreekStemmer;
import org.apache.lucene.analysis.br.BrazilianStemmer;
import org.apache.lucene.analysis.ckb.*;
import org.apache.lucene.analysis.gl.GalicianStemmer;
import org.apache.lucene.analysis.de.GermanLightStemmer;
import org.apache.lucene.analysis.de.GermanMinimalStemmer;
import org.apache.lucene.analysis.fr.FrenchMinimalStemmer;
import org.apache.lucene.analysis.pt.PortugueseStemmer;
import org.apache.lucene.analysis.pt.PortugueseMinimalStemmer;
import org.apache.lucene.analysis.gl.GalicianMinimalStemmer;
import org.apache.lucene.analysis.sv.SwedishLightStemmer;
import org.apache.lucene.analysis.no.NorwegianLightStemmer;
import org.apache.lucene.analysis.no.NorwegianMinimalStemmer;
import org.apache.lucene.analysis.ru.RussianLightStemmer;
import org.apache.lucene.analysis.hu.HungarianLightStemmer;
import org.apache.lucene.analysis.fi.FinnishLightStemmer;
import org.apache.lucene.analysis.fr.FrenchLightStemmer;
import org.apache.lucene.analysis.es.SpanishLightStemmer;
import org.apache.lucene.analysis.pt.PortugueseLightStemmer;
import org.apache.lucene.analysis.it.ItalianLightStemmer;
import java.lang.reflect.Method;

public class LightMain {
    public static void main(String[] args) throws Exception {
        String lang = args[0];
        BufferedReader in = new BufferedReader(new InputStreamReader(System.in, StandardCharsets.UTF_8));
        PrintStream out = new PrintStream(System.out, true, "UTF-8");
        String line;
        while ((line = in.readLine()) != null) {
            out.println(apply(lang, line));
        }
    }
    static String apply(String lang, String w) throws Exception {
        char[] b = w.toCharArray();
        int len = b.length;
        switch (lang) {
            case "porter":
                return PorterShim.stem(w);
            case "arabic": {
                char[] s = java.util.Arrays.copyOf(b, len + 8);
                len = new ArabicNormalizer().normalize(s, len);
                len = new ArabicStemmer().stem(s, len);
                return new String(s, 0, len);
            }
            case "persian": {
                char[] s = java.util.Arrays.copyOf(b, len + 8);
                len = new ArabicNormalizer().normalize(s, len);
                len = new PersianNormalizer().normalize(s, len);
                return new String(s, 0, len);
            }
            case "bulgarian":
                len = new BulgarianStemmer().stem(b, len);
                return new String(b, 0, len);
            case "czech":
                len = new CzechStemmer().stem(b, len);
                return new String(b, 0, len);
            case "hindi": {
                char[] s = java.util.Arrays.copyOf(b, len + 8);
                len = new HindiNormalizer().normalize(s, len);
                len = new HindiStemmer().stem(s, len);
                return new String(s, 0, len);
            }
            case "indonesian":
                len = new IndonesianStemmer().stem(b, len, true);
                return new String(b, 0, len);
            case "latvian":
                len = new LatvianStemmer().stem(b, len);
                return new String(b, 0, len);
            case "greek":
                len = new GreekStemmer().stem(b, len);
                return new String(b, 0, len);
            case "sorani": {
                char[] s = java.util.Arrays.copyOf(b, len + 8);
                len = new SoraniNormalizer().normalize(s, len);
                len = new SoraniStemmer().stem(s, len);
                return new String(s, 0, len);
            }
            case "portuguese_rslp": {
                char[] s = java.util.Arrays.copyOf(b, len + 2);
                len = new PortugueseStemmer().stem(s, len);
                return new String(s, 0, len);
            }
            case "portuguese_minimal": {
                char[] s = java.util.Arrays.copyOf(b, len + 2);
                len = new PortugueseMinimalStemmer().stem(s, len);
                return new String(s, 0, len);
            }
            case "galician_minimal": {
                char[] s = java.util.Arrays.copyOf(b, len + 2);
                len = new GalicianMinimalStemmer().stem(s, len);
                return new String(s, 0, len);
            }
            case "swedish_light":
                len = new SwedishLightStemmer().stem(b, len);
                return new String(b, 0, len);
            case "norwegian_light":
                len = new NorwegianLightStemmer(1).stem(b, len);
                return new String(b, 0, len);
            case "norwegian_minimal":
                len = new NorwegianMinimalStemmer(1).stem(b, len);
                return new String(b, 0, len);
            case "russian_light":
                len = new RussianLightStemmer().stem(b, len);
                return new String(b, 0, len);
            case "hungarian_light":
                len = new HungarianLightStemmer().stem(b, len);
                return new String(b, 0, len);
            case "finnish_light":
                len = new FinnishLightStemmer().stem(b, len);
                return new String(b, 0, len);
            case "german_minimal":
                len = new GermanMinimalStemmer().stem(b, len);
                return new String(b, 0, len);
            case "french_minimal":
                len = new FrenchMinimalStemmer().stem(b, len);
                return new String(b, 0, len);
            case "german_light":
                len = new GermanLightStemmer().stem(b, len);
                return new String(b, 0, len);
            case "french_light":
                len = new FrenchLightStemmer().stem(b, len);
                return new String(b, 0, len);
            case "spanish_light":
                len = new SpanishLightStemmer().stem(b, len);
                return new String(b, 0, len);
            case "portuguese_light":
                len = new PortugueseLightStemmer().stem(b, len);
                return new String(b, 0, len);
            case "italian_light":
                len = new ItalianLightStemmer().stem(b, len);
                return new String(b, 0, len);
            case "galician": {
                char[] s = java.util.Arrays.copyOf(b, len + 2);
                len = new GalicianStemmer().stem(s, len);
                return new String(s, 0, len);
            }
            case "brazilian": {
                BrazilianStemmer st = new BrazilianStemmer();
                Method m = BrazilianStemmer.class.getDeclaredMethod("stem", String.class);
                m.setAccessible(true);
                String r = (String) m.invoke(st, w);
                return r == null ? w : r;
            }
        }
        throw new IllegalArgumentException(lang);
    }
}
"""


def ensure_light_oracle():
    classes = os.path.join(ORACLE_DIR, "classes")
    if os.path.exists(os.path.join(classes, "LightMain.class")):
        return classes
    src = os.path.join(ORACLE_DIR, "src")
    files = []
    for rel in LIGHT_SOURCES:
        dst = os.path.join(src, "org/apache/lucene/analysis", rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        subprocess.run(["cp", os.path.join(REF, rel), dst], check=True)
        files.append(dst)
    for rel, content in [
        ("org/apache/lucene/analysis/en/PorterShim.java", PORTER_SHIM),
        ("org/apache/lucene/analysis/util/CharArraySet.java", CHARARRAYSET),
        ("org/apache/lucene/util/Version.java", VERSION),
        ("org/apache/lucene/util/ArrayUtil.java", ARRAYUTIL),
        ("org/apache/lucene/util/RamUsageEstimator.java",
         "package org.apache.lucene.util;\n"
         "public class RamUsageEstimator {\n"
         "    public static final int NUM_BYTES_CHAR = 2;\n}\n"),
    ]:
        dst = os.path.join(src, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "w") as f:
            f.write(content)
        files.append(dst)
    with open(os.path.join(ORACLE_DIR, "LightMain.java"), "w") as f:
        f.write(LIGHT_MAIN)
    files.append(os.path.join(ORACLE_DIR, "LightMain.java"))
    subprocess.run(
        ["javac", "-d", "classes", "-encoding", "UTF-8", "-cp", "classes"]
        + files, cwd=ORACLE_DIR, check=True,
    )
    rsrc_pt = os.path.join(classes, "org/apache/lucene/analysis/pt")
    os.makedirs(rsrc_pt, exist_ok=True)
    subprocess.run(
        ["cp", "/root/reference/lucene/analysis/common/src/resources/"
         "org/apache/lucene/analysis/pt/portuguese.rslp", rsrc_pt],
        check=True)
    rsrc = os.path.join(classes, "org/apache/lucene/analysis/gl")
    os.makedirs(rsrc, exist_ok=True)
    subprocess.run(
        ["cp", REF.replace("/java/", "/resources/", 1).replace(
            "src/java", "src/resources") if False else
         "/root/reference/lucene/analysis/common/src/resources/org/apache/lucene/analysis/gl/galician.rslp",
         rsrc], check=True)
    return classes

ALPHA = {
    "porter": "abcdefghijklmnopqrstuvwxyz",
    "arabic": "ابتثجحخدذرزسشصضطظعغفقكلمنهويءآأؤإئىةـ" + "ًٌٍَُِّْ",
    "persian": "ابتثجحخدذرزسشصضطظعغفقكلمنهويءآأؤإئىة" + "یکۀہ",
    "bulgarian": "абвгдежзийклмнопрстуфхцчшщъьюя",
    "czech": "abcdefghijklmnopqrstuvwxyzáčďéěíňóřšťúůýž",
    "hindi": "अआइईउऊएऐओऔकखगघङचछजझञटठडढणतथदधनपफबभमयरलवशषसह"
             + "ािीुूृेैोौंँः़्",
    "indonesian": "abcdefghijklmnopqrstuvwxyz",
    "latvian": "abcdefghijklmnopqrstuvwxyzāčēģīķļņšūž",
    # generate pre-folded input (lowercase, tonos removed, final sigma
    # already σ) — the analyzer's GreekLowerCaseFilter analog runs
    # upstream on both sides
    "greek": "αβγδεζηθικλμνξοπρστυφχψω",
    "sorani": "ئابپتجچحخدرڕزژسشعغفڤقکگلڵمنوۆهەیێكيىهةھڒ" + "\u200c\u0640\u064b\u064e\u0651",
    "brazilian": "abcdefghijklmnopqrstuvwxyzáâãéêíóôõúüçñ-'.",
    "galician": "abcdefghijklmnopqrstuvwxyzáéêíñóúüç",
    "german_light": "abcdefghijklmnopqrstuvwxyzäöüàáâòóôìíîùúûß",
    "french_light": "abcdefghijklmnopqrstuvwxyzàáâôèéêùûîç",
    "spanish_light": "abcdefghijklmnopqrstuvwxyzàáâäòóôöèéêëùúûüìíîï",
    "portuguese_light": "abcdefghijklmnopqrstuvwxyzàáâäãòóôöõèéêëùúûüìíîïç",
    "italian_light": "abcdefghijklmnopqrstuvwxyzàáâäòóôöèéêëùúûüìíîï",
    "portuguese_rslp": "abcdefghijklmnopqrstuvwxyzàáâãçéêíóôõúüñèå",
    "portuguese_minimal": "abcdefghijklmnopqrstuvwxyzáâãçéêíóôõú",
    "galician_minimal": "abcdefghijklmnopqrstuvwxyzáéêíñóúüç",
    "swedish_light": "abcdefghijklmnopqrstuvwxyzäåö",
    "norwegian_light": "abcdefghijklmnopqrstuvwxyzæåø",
    "norwegian_minimal": "abcdefghijklmnopqrstuvwxyzæåø",
    "russian_light": "абвгдежзийклмнопрстуфхцчшщъьыэюяё",
    "hungarian_light": "abcdefghijklmnopqrstuvwxyzáëéíóőõöúűũûü",
    "finnish_light": "abcdefghijklmnopqrstuvwxyzäåö",
    "german_minimal": "abcdefghijklmnopqrstuvwxyzäöüß",
    "french_minimal": "abcdefghijklmnopqrstuvwxyzàáâôèéêùûîçx",
}
PREFIX = {"arabic": "_AR", "persian": "_FA", "czech": "_CZ",
          "bulgarian": "_BG", "hindi": "_HI", "indonesian": "_ID",
          "latvian": "_LV", "sorani": "_CKB", "brazilian": "_BR",
          "galician": "_GL", "german_light": "_DEL",
          "french_light": "_FRL", "spanish_light": "_ES_LIGHT",
          "portuguese_light": "_PTL", "italian_light": "_ES_LIGHT",
          "portuguese_rslp": "_PTRX", "portuguese_minimal": "_PTRX",
          "galician_minimal": "_GL", "swedish_light": "_SV",
          "norwegian_light": "_NO", "norwegian_minimal": "_NO",
          "russian_light": "_RUL", "hungarian_light": "_HUL",
          "finnish_light": "_FIL", "german_minimal": "_DEL",
          "french_minimal": "_FRL"}


def harvest(mod, prefix):
    if prefix == "_PTRX":
        sufs = set()
        for st in mod._PTR_STEPS.values():
            for suf, _mn, rep, exc in st["rules"]:
                sufs.add(suf)
                if rep:
                    sufs.add(rep)
                for e in exc or ():
                    sufs.add(e)
        return sorted(sufs)
    if prefix in ("_SV", "_NO"):
        import lucene_solr_spark.analysis.snowball as _sb
        out = set()
        for name in dir(_sb):
            if name.startswith(prefix):
                val = getattr(_sb, name)
                if isinstance(val, (tuple, frozenset)):
                    out |= {x for x in val
                            if isinstance(x, str) and 0 < len(x) <= 10}
        return sorted(out)
    if prefix == "_GL":
        sufs = set()
        for st in mod._GL_STEPS.values():
            for suf, _mn, rep, exc in st["rules"]:
                sufs.add(suf)
                if rep:
                    sufs.add(rep)
                for e in exc or ():
                    sufs.add(e)
        return sorted(sufs)
    sufs = set()
    for name in dir(mod):
        if not name.startswith(prefix):
            continue
        val = getattr(mod, name)
        if isinstance(val, (tuple, frozenset, list)):
            for x in val:
                if isinstance(x, str) and 0 < len(x) <= 10:
                    sufs.add(x)
        elif isinstance(val, dict):
            for k in val:
                if isinstance(k, str) and 0 < len(k) <= 10:
                    sufs.add(k)
    return sorted(sufs)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    os.makedirs(ORACLE_DIR, exist_ok=True)
    ensure_light_oracle()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lucene_solr_spark.analysis import light, greek
    from lucene_solr_spark.analysis.stem import porter_stem

    fns = {"porter": porter_stem}
    fns.update({k: v for k, v in light.LIGHT_STEMMERS.items()})
    # the Java oracle drives the bare stemmer; the analyzer chain's
    # GermanNormalizationFilter is unit-tested separately
    fns["german_light"] = light.german_light_stem

    rng = random.Random(20260818)
    total_bad = 0
    for lang, alpha in ALPHA.items():
        fn = fns[lang]
        if lang == "porter":
            sufs = ["ing", "ed", "ational", "izer", "ator", "ness", "ism",
                    "aliti", "iviti", "ement", "ion", "s", "es", "eed",
                    "ies", "ational", "fulness", "ousli", "ization"]
        elif lang == "greek":
            sufs = harvest(greek, "_")
            sufs = [s for s in sufs if s and all(c in alpha for c in s)]
        else:
            sufs = harvest(light, PREFIX[lang])
        words = []
        for _ in range(n):
            stem_len = rng.randint(1, 8)
            stem = "".join(rng.choice(alpha) for _ in range(stem_len))
            r = rng.random()
            if r < 0.6 and sufs:
                word = stem + rng.choice(sufs)
                if rng.random() < 0.3:
                    word += rng.choice(sufs)
            elif r < 0.7 and sufs:
                word = rng.choice(sufs) + stem
            else:
                word = stem
            words.append(word)
        proc = subprocess.run(
            ["java", "-cp", f"{ORACLE_DIR}/classes:{ORACLE_DIR}",
             "LightMain", lang],
            input="\n".join(words).encode("utf-8"),
            capture_output=True, timeout=300,
        )
        expected = proc.stdout.decode("utf-8").splitlines()
        assert len(expected) == len(words), (lang, proc.stderr[-300:])
        bad = [(w, fn(w), e) for w, e in zip(words, expected) if fn(w) != e]
        status = "OK " if not bad else "FAIL"
        print(f"{status} {lang:<11} {len(words) - len(bad)}/{len(words)}")
        for w, got, exp in bad[:10]:
            print(f"      {w!r}: py={got!r} java={exp!r}")
        total_bad += len(bad)
    sys.exit(1 if total_bad else 0)


if __name__ == "__main__":
    main()
