"""Dictionary-free components of the Japanese (kuromoji) analysis
package: JapaneseIterationMarkCharFilter and JapaneseKatakanaStemFilter
(ja/JapaneseIterationMarkCharFilter.java, ja/JapaneseKatakanaStemFilter
.java).

The JapaneseTokenizer itself (Viterbi lattice over the bundled ipadic
binary dictionaries) is ENVIRONMENT-BLOCKED in this sandbox: the
reference checkout ships the kuromoji resources WITHOUT
``TokenInfoDictionary$buffer.dat`` (and smartcn without
``bigramdict.mem``), so the reference's own JapaneseAnalyzer throws
``FileNotFoundException: Not in classpath: .../TokenInfoDictionary$
buffer.dat`` on startup — there is no dictionary to port and no oracle
to verify a port against.  The CJK bigram analyzer (analysis/text.py
``cjk``) is the reference's own fallback for ja/zh (cjk/CJKAnalyzer).

These two components need no dictionary and are differentially
verified against their compiled reference classes (tools/fuzz_ja.py):

* ``iteration_mark_normalize`` — the streaming char filter that
  resolves 々 (kanji), ゝ/ゞ (hiragana) and ヽ/ヾ (katakana) iteration
  marks to the source character they repeat, including dakuten
  voicing/devoicing, multi-mark spans (span size restricted so a span
  never reads past the previous span's end), the illegal
  span-starts-where-previous-ended rule, and the surrogate /
  full-stop span resets.  Positions are UTF-16 code units, exactly as
  the Java CharFilter sees them.
* ``katakana_stem`` — removes a trailing prolonged sound mark U+30FC
  from all-katakana terms of length >= 4.

Exposed Spark-side as the ``cjk_ja`` analyzer: iteration-mark
normalization at text level before the CJK bigram chain.
``katakana_stem`` is a standalone filter utility (the bigram chain
emits only length-1/2 katakana terms, below the filter's >=4
threshold, so chaining it there would be a no-op — it applies to
word-level token streams, e.g. whitespace/dictionary tokenization);
it is exercised by the ja_iteration_values gate rows 100+ and the
fuzz/pytest campaigns.
"""
from __future__ import annotations

# Hiragana dakuten map, lookup by code point - 0x304b (か); positions
# with no dakuten variant map to themselves (the filter's h2d table,
# JapaneseIterationMarkCharFilter.java:86)
_H2D_PAIRS = {
    0: 0x304C, 1: 0x304C, 2: 0x304E, 3: 0x304E, 4: 0x3050, 5: 0x3050,
    6: 0x3052, 7: 0x3052, 8: 0x3054, 9: 0x3054, 10: 0x3056, 11: 0x3056,
    12: 0x3058, 13: 0x3058, 14: 0x305A, 15: 0x305A, 16: 0x305C,
    17: 0x305C, 18: 0x305E, 19: 0x305E, 20: 0x3060, 21: 0x3060,
    22: 0x3062, 23: 0x3062, 24: 0x3063, 25: 0x3065, 26: 0x3065,
    27: 0x3067, 28: 0x3067, 29: 0x3069, 30: 0x3069, 31: 0x306A,
    32: 0x306B, 33: 0x306C, 34: 0x306D, 35: 0x306E, 36: 0x3070,
    37: 0x3070, 38: 0x3071, 39: 0x3073, 40: 0x3073, 41: 0x3074,
    42: 0x3076, 43: 0x3076, 44: 0x3077, 45: 0x3079, 46: 0x3079,
    47: 0x307A, 48: 0x307C, 49: 0x307C,
}
_H2D = [_H2D_PAIRS[i] for i in range(50)]
_K2D = [c + (0x30AB - 0x304B) for c in _H2D]

_KANJI_MARK = 0x3005       # 々
_HIRA_MARK = 0x309D        # ゝ
_HIRA_VOICED = 0x309E      # ゞ
_KATA_MARK = 0x30FD        # ヽ
_KATA_VOICED = 0x30FE      # ヾ
_FULL_STOP = 0x3002        # 。
_PROLONGED = 0x30FC        # ー


def _lookup(c: int, table, offset: int) -> int:
    if offset <= c < offset + 50:
        return table[c - offset]
    return c


def _is_dakuten(c: int, table, offset: int) -> bool:
    return offset <= c < offset + 50 and _lookup(c, table, offset) == c


def _normalize_one(c: int, m: int) -> int:
    """normalize(): resolve mark m pointing at source char c."""
    if m in (_HIRA_MARK, _HIRA_VOICED):
        if m == _HIRA_MARK:
            return c - 1 if _is_dakuten(c, _H2D, 0x304B) else c
        return _lookup(c, _H2D, 0x304B)
    if m in (_KATA_MARK, _KATA_VOICED):
        if m == _KATA_MARK:
            return c - 1 if _is_dakuten(c, _K2D, 0x30AB) else c
        return _lookup(c, _K2D, 0x30AB)
    return c  # kanji mark (or disabled kana): repeat the source char


def iteration_mark_normalize(text: str, normalize_kanji: bool = True,
                             normalize_kana: bool = True) -> str:
    """JapaneseIterationMarkCharFilter as one pass over the string.

    Operates on UTF-16 code units (the Java CharFilter's view) so
    surrogate handling is position-exact; the output length always
    equals the input length (correct() is identity)."""
    if not (normalize_kanji or normalize_kana):
        return text
    units = [ord(u) for u in _to_utf16_units(text)]

    def is_mark(c: int) -> bool:
        if normalize_kanji and c == _KANJI_MARK:
            return True
        if normalize_kana and c in (_HIRA_MARK, _HIRA_VOICED,
                                    _KATA_MARK, _KATA_VOICED):
            return True
        return False

    n = len(units)
    out = list(units)
    span_end = 0          # iterationMarkSpanEndPosition
    span_size = 0         # iterationMarksSpanSize
    i = 0
    while i < n:
        c = units[i]
        if 0xD800 <= c <= 0xDFFF:     # high or low surrogate
            span_end = i + 1
        if c == _FULL_STOP:
            span_end = i + 1
        if is_mark(c):
            if i < span_end:
                # inside the current span: source char is spanSize back
                src = _source_char(units, i, span_size)
                out[i] = _normalize_one(src, c)
            elif i == span_end:
                # new span starting where the previous ended (or at the
                # stream start): illegal, emit the mark itself and push
                # the boundary
                span_end += 1
            else:
                # new span: count subsequent marks, restricted so the
                # span never reads back past the previous span's end
                span_size = 0
                j = i
                while j < n and is_mark(units[j]):
                    span_size += 1
                    j += 1
                if i - span_size < span_end:
                    span_size = i - span_end
                span_end = i + span_size
                src = _source_char(units, i, span_size)
                out[i] = _normalize_one(src, c)
        i += 1
    return _from_utf16_units(out)


def _source_char(units, position: int, span_size: int) -> int:
    """sourceCharacter(): the char spanSize positions back in the
    ORIGINAL buffer (RollingCharBuffer holds input, not output), so
    marks referring to earlier marks see the raw mark and normalize()
    passes non-kana sources through unchanged.  The span-size
    restriction above guarantees position - span_size >= 0."""
    return units[position - span_size]


def _to_utf16_units(text: str) -> str:
    # surrogatepass keeps lone surrogates; the filter treats each unit
    # independently
    b = text.encode("utf-16-le", "surrogatepass")
    return "".join(chr(b[k] | (b[k + 1] << 8)) for k in range(0, len(b), 2))


def _from_utf16_units(units) -> str:
    b = bytearray()
    for u in units:
        b.append(u & 0xFF)
        b.append((u >> 8) & 0xFF)
    return bytes(b).decode("utf-16-le", "surrogatepass")


def katakana_stem(term: str, minimum_length: int = 4) -> str:
    """JapaneseKatakanaStemFilter.stem(): strip one trailing U+30FC
    from terms of length >= minimum_length whose chars are ALL in the
    full-width Katakana block U+30A0..U+30FF."""
    if len(term) < minimum_length:
        return term
    for ch in term:
        if not (0x30A0 <= ord(ch) <= 0x30FF):
            return term
    if term[-1] == chr(_PROLONGED):
        return term[:-1]
    return term
