"""Hunspell dictionary stemming (hunspell/Dictionary.java, Stemmer.java,
HunspellStemFilter.java).

A faithful re-implementation of the reference's hunspell subsystem:

* ``HunspellDictionary`` parses ``.aff``/``.dic`` pairs with the same
  semantics as ``hunspell/Dictionary.java`` — SET encoding detection,
  FLAG strategies (single char / ``long`` / ``num``), AF flag aliases,
  AM morph aliases with ``st:`` stem exceptions, PFX/SFX rules with
  strip + condition + continuation classes, KEEPCASE / NEEDAFFIX /
  PSEUDOROOT / ONLYINCOMPOUND / CIRCUMFIX flags, IGNORE char sets,
  ICONV/OCONV longest-match conversion tables, FULLSTRIP,
  COMPLEXPREFIXES and LANG alternate (Turkish/Azeri) casing.
* ``HunspellStemmer`` is the recursion of ``hunspell/Stemmer.java``:
  case-variant union (exact / title / lower), two-stage affix
  stripping with cross-product continuation-class checks, circumfix
  pairing and stem exceptions.
* ``hunspell_stems`` applies ``HunspellStemFilter.java`` token
  semantics (dedup'd stems as same-position twins, unknown words kept,
  optional longestOnly).

Where the reference stores words/affixes in FSTs and flag sets in a
BytesRefHash, this port uses plain dicts keyed by the same strings —
the FST here is a lookup structure, not a semantic one.  Everything
order-sensitive is preserved: the OfflineSorter line order that decides
homonym form order (sort by entry bytes with the full unescaped line as
tie-break, Dictionary.java:828), affix enumeration order (shortest
consumed prefix first, Stemmer.java:309; shortest consumed suffix
first, Stemmer.java:393), and per-key affix-id file order.

Conditions are matched positionally, not as regexes: the reference
pre-escapes every dash (Dictionary.escapeDash, "dash hasn't got special
meaning") so character classes never contain ranges — a class is a
literal char set, exactly like native hunspell.

Differential oracle: tools/fuzz_hunspell.py compiles the reference's
own Dictionary/Stemmer (javac over the real sources) and compares stem
sets for every test fixture dictionary; a pinned sample runs in pytest
(tests/test_hunspell.py).
"""
from __future__ import annotations

import re
import unicodedata
from typing import Optional

FLAG_SEPARATOR = "\x1f"
MORPH_SEPARATOR = "\x1e"

_CHARSET_ALIASES = {
    "microsoft-cp1251": "cp1251",
    "TIS620-2533": "tis-620",
    "ISO8859-14": "iso8859-14",
}


def _java_char_lower(c: str) -> str:
    """Character.toLowerCase(char): a 1:1 mapping.  Python's str.lower
    can expand (e.g. 'İ' -> 'i̇'); Java keeps single-char results."""
    low = c.lower()
    if len(low) == 1:
        return low
    if c == "İ":  # U+0130: Java maps to plain 'i'
        return "i"
    return c


def _is_upper(c: str) -> bool:
    """Character.isUpperCase analog (Lu or Other_Uppercase)."""
    return c.isupper()


class _Condition:
    """One parsed affix condition: a fixed-length item list where each
    item is (negated, frozenset-of-chars or None for '.')."""

    __slots__ = ("items",)

    def __init__(self, cond: str):
        items = []
        i, n = 0, len(cond)
        while i < n:
            ch = cond[i]
            if ch == "\\" and i + 1 < n:
                items.append((False, frozenset(cond[i + 1])))
                i += 2
            elif ch == "[":
                j = cond.find("]", i + 1)
                if j == -1:
                    j = n  # tolerate unterminated (gascon fix appends ])
                body = cond[i + 1: j]
                neg = body.startswith("^")
                if neg:
                    body = body[1:]
                chars = set()
                k = 0
                while k < len(body):
                    if body[k] == "\\" and k + 1 < len(body):
                        chars.add(body[k + 1])
                        k += 2
                    else:
                        # no ranges: the reference escapes every dash
                        # before compiling (Dictionary.escapeDash)
                        chars.add(body[k])
                        k += 1
                items.append((neg, frozenset(chars)))
                i = j + 1
            elif ch == ".":
                items.append((False, None))
                i += 1
            else:
                items.append((False, frozenset(ch)))
                i += 1
        self.items = items

    def matches_end(self, s: str) -> bool:
        k = len(self.items)
        if len(s) < k:
            return False
        return self._match(s[len(s) - k:])

    def matches_start(self, s: str) -> bool:
        k = len(self.items)
        if len(s) < k:
            return False
        return self._match(s[:k])

    def _match(self, seg: str) -> bool:
        for ch, (neg, chars) in zip(seg, self.items):
            if chars is None:
                continue
            if (ch in chars) == neg:
                return False
        return True


class _Affix:
    __slots__ = ("flag", "strip", "condition", "cross", "append_flags",
                 "append")

    def __init__(self, flag, strip, condition, cross, append_flags, append):
        self.flag = flag                  # int flag code
        self.strip = strip                # strip string
        self.condition = condition        # _Condition or None (always true)
        self.cross = cross                # crossProduct bool
        self.append_flags = append_flags  # sorted tuple of int flags
        self.append = append              # affix text (unreversed)


def _parse_flags_simple(raw: str):
    return [ord(c) for c in raw]


def _parse_flags_num(raw: str):
    out = []
    for part in raw.strip().split(","):
        digits = re.sub(r"[^0-9]", "", part)
        if digits:
            out.append(int(digits))
    return out


def _parse_flags_long(raw: str):
    if not raw:
        return []
    if len(raw) % 2 == 1:
        raise ValueError("Invalid flags (should be even number of "
                         "characters): " + raw)
    out = []
    for i in range(0, len(raw), 2):
        f1, f2 = ord(raw[i]), ord(raw[i + 1])
        if f1 >= 256 or f2 >= 256:
            raise ValueError("Invalid flags (LONG flags must be double "
                             "ASCII): " + raw)
        out.append(f1 << 8 | f2)
    return out


def _index_of_space_or_tab(text: str, start: int) -> int:
    p1 = text.find("\t", start)
    p2 = text.find(" ", start)
    if p1 >= 0 and p2 >= 0:
        return min(p1, p2)
    return max(p1, p2)


def _morph_boundary(line: str) -> int:
    end = _index_of_space_or_tab(line, 0)
    if end == -1:
        return len(line)
    while 0 <= end < len(line):
        if (line[end] == "\t"
                or (end + 3 < len(line)
                    and line[end + 1].isalpha()
                    and line[end + 2].isalpha()
                    and line[end + 3] == ":")):
            break
        end = _index_of_space_or_tab(line, end + 1)
    if end == -1:
        return len(line)
    return end


class HunspellDictionary:
    """Parsed .aff + .dic data (hunspell/Dictionary.java)."""

    def __init__(self, aff: bytes, dics, ignore_case: bool = False):
        if isinstance(dics, (bytes, bytearray)):
            dics = [dics]
        self.ignore_case = ignore_case
        self.needs_input_cleaning = ignore_case
        self.needs_output_cleaning = False
        self.complex_prefixes = False
        self.two_stage_affix = False
        self.full_strip = False
        self.circumfix = -1
        self.keepcase = -1
        self.needaffix = -1
        self.onlyincompound = -1
        self.ignore: Optional[frozenset] = None
        self.iconv: Optional[dict] = None
        self.oconv: Optional[dict] = None
        self.language: Optional[str] = None
        self.alternate_casing = False
        self.affixes: list[_Affix] = []
        self.prefixes: dict[str, list[int]] = {}
        self.suffixes: dict[str, list[int]] = {}
        # every proper prefix of a map key, for the FST break semantics
        self._prefix_paths: set[str] = set()
        self._suffix_paths: set[str] = set()
        self._parse_flags = _parse_flags_simple
        self._aliases: list[str] = []
        self._morph_aliases: list[str] = []
        self.stem_exceptions: list[str] = []
        self.has_stem_exceptions = False
        self.words: dict[str, list] = {}

        encoding = self._detect_encoding(aff)
        codec = _CHARSET_ALIASES.get(encoding, encoding)
        aff_text = aff.decode(codec, errors="replace")
        self._read_affix_file(aff_text)
        self._read_dictionaries(
            [d.decode(codec, errors="replace") for d in dics])

    # -- affix file ---------------------------------------------------

    @staticmethod
    def _detect_encoding(aff: bytes) -> str:
        for raw in aff.split(b"\n"):
            line = raw.rstrip(b"\r").decode("latin-1")
            if not line or line[0] == "#" or not line.strip():
                continue
            m = re.match(r"^(ï»¿)?SET\s+", line)
            if m:
                return line[m.end():].strip()
        raise ValueError("Unexpected end of affix file.")

    def _read_affix_file(self, text: str) -> None:
        lines = text.split("\n")
        it = iter(enumerate(lines))
        for lineno, line in it:
            line = line.rstrip("\r")
            if lineno == 0 and line.startswith("﻿"):
                line = line[1:]
            if line.startswith("AF"):
                self._parse_alias(line)
            elif line.startswith("AM"):
                self._parse_morph_alias(line)
            elif line.startswith("PFX"):
                self._parse_affix(self.prefixes, line, it, is_suffix=False)
            elif line.startswith("SFX"):
                self._parse_affix(self.suffixes, line, it, is_suffix=True)
            elif line.startswith("FLAG"):
                parts = line.split()
                if len(parts) != 2:
                    raise ValueError("Illegal FLAG specification: " + line)
                self._parse_flags = {
                    "num": _parse_flags_num,
                    "UTF-8": _parse_flags_simple,
                    "long": _parse_flags_long,
                }.get(parts[1]) or self._bad_flag(parts[1])
            elif line == "COMPLEXPREFIXES":
                self.complex_prefixes = True
            elif line.startswith("CIRCUMFIX"):
                self.circumfix = self._single_flag(line, "CIRCUMFIX")
            elif line.startswith("KEEPCASE"):
                self.keepcase = self._single_flag(line, "KEEPCASE")
            elif line.startswith("NEEDAFFIX") or line.startswith("PSEUDOROOT"):
                self.needaffix = self._single_flag(line, "NEEDAFFIX")
            elif line.startswith("ONLYINCOMPOUND"):
                self.onlyincompound = self._single_flag(line, "ONLYINCOMPOUND")
            elif line.startswith("IGNORE"):
                parts = line.split()
                if len(parts) != 2:
                    raise ValueError("Illegal IGNORE declaration: " + line)
                self.ignore = frozenset(parts[1])
                self.needs_input_cleaning = True
            elif line.startswith("ICONV") or line.startswith("OCONV"):
                parts = line.split()
                if len(parts) != 2:
                    raise ValueError(
                        "Illegal %s declaration: %s" % (parts[0], line))
                num = int(parts[1])
                mappings = {}
                for _ in range(num):
                    _, conv_line = next(it)
                    cparts = conv_line.rstrip("\r").split()
                    if len(cparts) != 3:
                        raise ValueError("invalid syntax: " + conv_line)
                    if cparts[1] in mappings:
                        raise ValueError(
                            "duplicate mapping specified for: " + cparts[1])
                    mappings[cparts[1]] = cparts[2]
                if parts[0].startswith("ICONV"):
                    self.iconv = mappings
                    self.needs_input_cleaning = True
                else:
                    self.oconv = mappings
                    self.needs_output_cleaning = True
            elif line.startswith("FULLSTRIP"):
                self.full_strip = True
            elif line.startswith("LANG"):
                self.language = line[len("LANG"):].strip()
                self.alternate_casing = self.language in ("tr_TR", "az_AZ")

        for key in self.prefixes:
            for i in range(len(key)):
                self._prefix_paths.add(key[:i])
        for key in self.suffixes:
            for i in range(len(key)):
                self._suffix_paths.add(key[len(key) - i:])

    @staticmethod
    def _bad_flag(flag_type: str):
        raise ValueError("Unknown flag type: " + flag_type)

    def _single_flag(self, line: str, what: str) -> int:
        parts = line.split()
        if len(parts) != 2:
            raise ValueError("Illegal %s declaration: %s" % (what, line))
        flags = self._parse_flags(parts[1])
        if len(flags) != 1:
            raise ValueError("expected only one flag, got: " + parts[1])
        return flags[0]

    def _parse_alias(self, line: str) -> None:
        parts = line.split()
        if not self._aliases and not getattr(self, "_alias_total", 0):
            self._alias_total = int(parts[1])
        else:
            self._aliases.append(parts[1] if len(parts) > 1 else "")

    def _get_alias(self, idx: int) -> str:
        return self._aliases[idx - 1]

    def _parse_morph_alias(self, line: str) -> None:
        if not self._morph_aliases and not getattr(self, "_morph_total", 0):
            self._morph_total = int(line[3:])
        else:
            self._morph_aliases.append(line[2:])  # leave the space

    def _parse_affix(self, affix_map, header, it, is_suffix: bool) -> None:
        args = header.split()
        cross = args[2] == "Y"
        num_lines = int(args[3])
        for _ in range(num_lines):
            _, line = next(it)
            line = line.rstrip("\r")
            rule = line.split()
            if len(rule) < 4:
                raise ValueError("The affix file contains a rule with less "
                                 "than four elements: " + line)
            flag = self._single_flag_token(rule[1])
            strip = "" if rule[2] == "0" else rule[2]
            affix_arg = rule[3]
            append_flags = ()
            flag_sep = affix_arg.rfind("/")
            if flag_sep != -1:
                flag_part = affix_arg[flag_sep + 1:]
                affix_arg = affix_arg[:flag_sep]
                if self._aliases:
                    flag_part = self._get_alias(int(flag_part))
                append_flags = tuple(sorted(self._parse_flags(flag_part)))
                self.two_stage_affix = True
            if affix_arg == "0":
                affix_arg = ""

            condition = rule[4] if len(rule) > 4 else "."
            if condition.startswith("[") and "]" not in condition:
                condition += "]"
            if condition == "." or condition == strip:
                cond = None
            else:
                cond = _Condition(condition)

            if self.needs_input_cleaning:
                affix_arg = str(self.clean_input(affix_arg))

            affix_id = len(self.affixes)
            self.affixes.append(
                _Affix(flag, strip, cond, cross, append_flags, affix_arg))
            affix_map.setdefault(affix_arg, []).append(affix_id)

    def _single_flag_token(self, raw: str) -> int:
        flags = self._parse_flags(raw)
        if len(flags) != 1:
            raise ValueError("expected only one flag, got: " + raw)
        return flags[0]

    # -- dic files ----------------------------------------------------

    def _unescape_entry(self, entry: str) -> str:
        out = []
        end = _morph_boundary(entry)
        i = 0
        while i < end:
            ch = entry[i]
            if ch == "\\" and i + 1 < len(entry):
                out.append(entry[i + 1])
                i += 2
                continue
            elif ch == "/":
                out.append(FLAG_SEPARATOR)
            elif ch in (MORPH_SEPARATOR, FLAG_SEPARATOR):
                pass  # binary junk embedded in real-world dictionaries
            else:
                out.append(ch)
            i += 1
        out.append(MORPH_SEPARATOR)
        for ch in entry[end:]:
            if ch not in (FLAG_SEPARATOR, MORPH_SEPARATOR):
                out.append(ch)
        return "".join(out)

    def _parse_stem_exception(self, morph_data: str) -> Optional[str]:
        if self._morph_aliases:
            try:
                alias = int(morph_data.strip())
                morph_data = self._morph_aliases[alias - 1]
            except ValueError:
                pass
        index = morph_data.find(" st:")
        if index < 0:
            index = morph_data.find("\tst:")
        if index >= 0:
            end_index = _index_of_space_or_tab(morph_data, index + 1)
            if end_index < 0:
                end_index = len(morph_data)
            return morph_data[index + 4: end_index]
        return None

    def _read_dictionaries(self, texts: list[str]) -> None:
        processed: list[str] = []
        for text in texts:
            lines = text.split("\n")
            for raw in lines[1:]:  # first line is the (approximate) count
                line = raw.rstrip("\r")
                if not line or line[0] in ("/", "#", "\t"):
                    continue
                line = self._unescape_entry(line)
                if not self.has_stem_exceptions:
                    morph_start = line.find(MORPH_SEPARATOR)
                    if 0 <= morph_start < len(line):
                        self.has_stem_exceptions = (
                            self._parse_stem_exception(
                                line[morph_start + 1:]) is not None)
                if self.needs_input_cleaning:
                    flag_sep = line.find(FLAG_SEPARATOR)
                    if flag_sep == -1:
                        flag_sep = line.find(MORPH_SEPARATOR)
                    if flag_sep == -1:
                        line = str(self.clean_input(line))
                    else:
                        line = (str(self.clean_input(line[:flag_sep]))
                                + line[flag_sep:])
                processed.append(line)

        def sort_key(line: str):
            b = line.encode("utf-8")
            trunc = len(b)
            for i in range(len(b) - 1, -1, -1):
                if b[i] in (0x1f, 0x1e):
                    trunc = i
                    break
            return (b[:trunc], b)

        processed.sort(key=sort_key)

        current_entry = None
        current_forms: list = []
        for line in processed:
            flag_sep = line.find(FLAG_SEPARATOR)
            end = line.find(MORPH_SEPARATOR)
            if flag_sep == -1:
                word_flags = ()
                entry = line[:end]
            else:
                flag_part = line[flag_sep + 1: end]
                if self._aliases:
                    flag_part = self._get_alias(int(flag_part))
                word_flags = tuple(sorted(self._parse_flags(flag_part)))
                entry = line[:flag_sep]
            stem_exception_id = 0
            if self.has_stem_exceptions and end + 1 < len(line):
                exc = self._parse_stem_exception(line[end + 1:])
                if exc is not None:
                    self.stem_exceptions.append(exc)
                    stem_exception_id = len(self.stem_exceptions)
            if current_entry is not None and entry == current_entry:
                current_forms.append((word_flags, stem_exception_id))
            else:
                if current_entry is not None:
                    self.words[current_entry] = current_forms
                current_entry = entry
                current_forms = [(word_flags, stem_exception_id)]
        if current_entry is not None:
            self.words[current_entry] = current_forms

    # -- input/output cleaning ----------------------------------------

    def case_fold(self, c: str) -> str:
        if self.alternate_casing:
            if c == "I":
                return "ı"
            if c == "İ":
                return "i"
        return _java_char_lower(c)

    def clean_input(self, s: str) -> str:
        out = []
        for ch in s:
            if self.ignore is not None and ch in self.ignore:
                continue
            if self.ignore_case and self.iconv is None:
                ch = self.case_fold(ch)
            out.append(ch)
        text = "".join(out)
        if self.iconv is not None:
            text = _apply_mappings(self.iconv, text)
            if self.ignore_case:
                text = "".join(self.case_fold(c) for c in text)
        return text


def _apply_mappings(mappings: dict, s: str) -> str:
    """Longest-match conversion sweep (Dictionary.applyMappings)."""
    max_len = max((len(k) for k in mappings), default=0)
    out = []
    i = 0
    n = len(s)
    while i < n:
        match_len = 0
        match_out = None
        limit = min(max_len, n - i)
        for j in range(1, limit + 1):
            rep = mappings.get(s[i: i + j])
            if rep is not None:
                match_len, match_out = j, rep
        if match_out is not None:
            out.append(match_out)
            i += match_len
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


_EXACT_CASE, _TITLE_CASE, _UPPER_CASE = 0, 1, 2


class HunspellStemmer:
    """hunspell/Stemmer.java: recursive affix stripping."""

    def __init__(self, dictionary: HunspellDictionary):
        self.d = dictionary

    # -- public API ----------------------------------------------------

    def stem(self, word: str) -> list[str]:
        d = self.d
        if d.needs_input_cleaning:
            word = d.clean_input(word)
        case_type = self._case_of(word)
        if case_type == _UPPER_CASE:
            title = word[0] + "".join(d.case_fold(c) for c in word[1:])
            lower = d.case_fold(title[0]) + title[1:] if title else title
            out = self._do_stem(word, False)
            out += self._do_stem(title, True)
            out += self._do_stem(lower, True)
            return out
        elif case_type == _TITLE_CASE:
            lower = d.case_fold(word[0]) + word[1:]
            out = self._do_stem(word, False)
            out += self._do_stem(lower, True)
            return out
        return self._do_stem(word, False)

    def unique_stems(self, word: str) -> list[str]:
        stems = self.stem(word)
        if len(stems) < 2:
            return stems
        seen = set()
        out = []
        for s in stems:
            # CharArraySet(ignoreCase) folds with Character.toLowerCase,
            # NOT the dictionary's alternate (Turkish) casing
            key = ("".join(_java_char_lower(c) for c in s)
                   if self.d.ignore_case else s)
            if key not in seen:
                seen.add(key)
                out.append(s)
        return out

    # -- internals ------------------------------------------------------

    def _case_of(self, word: str) -> int:
        if self.d.ignore_case or not word or not _is_upper(word[0]):
            return _EXACT_CASE
        seen_upper = seen_lower = False
        for c in word[1:]:
            v = _is_upper(c)
            seen_upper |= v
            seen_lower |= not v
        if not seen_lower:
            return _UPPER_CASE
        if not seen_upper:
            return _TITLE_CASE
        return _EXACT_CASE

    def _do_stem(self, word: str, case_variant: bool) -> list[str]:
        d = self.d
        stems: list[str] = []
        forms = d.words.get(word)
        if forms is not None:
            check_keep = case_variant and d.keepcase != -1
            check_need = d.needaffix != -1
            check_oic = d.onlyincompound != -1
            for word_flags, exc_id in forms:
                if check_keep and d.keepcase in word_flags:
                    continue
                if check_need and d.needaffix in word_flags:
                    continue
                if check_oic and d.onlyincompound in word_flags:
                    continue
                stems.append(self._new_stem(word, exc_id))
        stems.extend(self._stem(word, -1, -1, -1, 0, True, True, False,
                                False, case_variant))
        return stems

    def _new_stem(self, buffer: str, exc_id: int) -> str:
        d = self.d
        exception = (d.stem_exceptions[exc_id - 1]
                     if d.has_stem_exceptions and exc_id > 0 else None)
        if d.needs_output_cleaning:
            text = exception if exception is not None else buffer
            return _apply_mappings(d.oconv or {}, text)
        return exception if exception is not None else buffer

    def _stem(self, word: str, previous: int, prev_flag: int,
              prefix_flag: int, depth: int, do_prefix: bool,
              do_suffix: bool, previous_was_prefix: bool,
              circumfix: bool, case_variant: bool) -> list[str]:
        d = self.d
        stems: list[str] = []
        length = len(word)

        if do_prefix and d.prefixes:
            limit = length if d.full_strip else length - 1
            for i in range(0, max(limit, 0)):
                key = word[:i]
                if i > 0 and key not in d._prefix_paths \
                        and key not in d.prefixes:
                    break  # FST: no arc for word[i-1]
                for affix_id in d.prefixes.get(key, ()):
                    if affix_id == previous:
                        continue
                    a = d.affixes[affix_id]
                    if not self._compatible(a, depth, prev_flag, False):
                        continue
                    rest = word[i:]
                    if not self._check_condition(a, a.strip + rest,
                                                 prefix=True):
                        continue
                    stripped = a.strip + rest
                    stems.extend(self._apply_affix(
                        stripped, affix_id, -1, depth, True, circumfix,
                        case_variant))

        if do_suffix and d.suffixes:
            limit = 0 if d.full_strip else 1
            for i in range(length, limit - 1, -1):
                key = word[i:]
                if i < length and key not in d._suffix_paths \
                        and key not in d.suffixes:
                    break
                for affix_id in d.suffixes.get(key, ()):
                    if affix_id == previous:
                        continue
                    a = d.affixes[affix_id]
                    if not self._compatible(a, depth, prev_flag,
                                            previous_was_prefix):
                        continue
                    stem_part = word[:i]
                    if not self._check_condition(a, stem_part + a.strip,
                                                 prefix=False):
                        continue
                    stripped = stem_part + a.strip
                    stems.extend(self._apply_affix(
                        stripped, affix_id, prefix_flag, depth, False,
                        circumfix, case_variant))

        return stems

    def _compatible(self, a: _Affix, depth: int, prev_flag: int,
                    previous_was_prefix: bool) -> bool:
        d = self.d
        if depth == 0:
            if d.onlyincompound == -1:
                return True
            return d.onlyincompound not in a.append_flags
        if a.cross:
            allowed = (d.onlyincompound == -1
                       or d.onlyincompound not in a.append_flags)
            return allowed and self._cross_checked(
                prev_flag, a.append_flags, previous_was_prefix)
        return False

    @staticmethod
    def _cross_checked(flag: int, flags: tuple,
                       match_empty: bool) -> bool:
        return (len(flags) == 0 and match_empty) or flag in flags

    @staticmethod
    def _check_condition(a: _Affix, text: str, prefix: bool) -> bool:
        if a.condition is None:
            return True
        if prefix:
            return a.condition.matches_start(text)
        return a.condition.matches_end(text)

    def _apply_affix(self, stripped: str, affix_id: int, prefix_flag: int,
                     depth: int, prefix: bool, circumfix: bool,
                     case_variant: bool) -> list[str]:
        d = self.d
        a = d.affixes[affix_id]
        stems: list[str] = []

        forms = d.words.get(stripped)
        if forms is not None:
            for word_flags, exc_id in forms:
                if a.flag not in word_flags:
                    continue
                # in this one exception the first prefix was already
                # chained against the second, so skip the word check
                chained_prefix = (d.complex_prefixes and depth == 1
                                  and prefix)
                if (not chained_prefix and prefix_flag >= 0
                        and prefix_flag not in word_flags):
                    # chain prefix through the suffix continuation class
                    if not self._cross_checked(prefix_flag, a.append_flags,
                                               False):
                        continue
                if d.circumfix != -1:
                    suffix_circumfix = d.circumfix in a.append_flags
                    if circumfix != suffix_circumfix:
                        continue
                if (case_variant and d.keepcase != -1
                        and d.keepcase in word_flags):
                    continue
                if (d.onlyincompound != -1
                        and d.onlyincompound in word_flags):
                    continue
                stems.append(self._new_stem(stripped, exc_id))

        if d.circumfix != -1 and not circumfix and prefix:
            circumfix = d.circumfix in a.append_flags

        if a.cross:
            if depth == 0:
                if prefix:
                    stems.extend(self._stem(
                        stripped, affix_id, a.flag, a.flag, 1,
                        d.complex_prefixes and d.two_stage_affix, True,
                        True, circumfix, case_variant))
                elif not d.complex_prefixes and d.two_stage_affix:
                    stems.extend(self._stem(
                        stripped, affix_id, a.flag, prefix_flag, 1,
                        False, True, False, circumfix, case_variant))
            elif depth == 1:
                if prefix and d.complex_prefixes:
                    stems.extend(self._stem(
                        stripped, affix_id, a.flag, a.flag, 2,
                        False, True, True, circumfix, case_variant))
                elif (not prefix and not d.complex_prefixes
                        and d.two_stage_affix):
                    stems.extend(self._stem(
                        stripped, affix_id, a.flag, prefix_flag, 2,
                        False, True, False, circumfix, case_variant))

        return stems


def hunspell_stems(token: str, stemmer: HunspellStemmer,
                   dedup: bool = True,
                   longest_only: bool = False) -> list[str]:
    """HunspellStemFilter.incrementToken semantics for one token:
    returns the emitted terms in order (first replaces the token, the
    rest are same-position twins).  Unknown words come back unchanged."""
    if dedup and not longest_only:
        buf = stemmer.unique_stems(token)
    else:
        buf = stemmer.stem(token)
    if not buf:
        return [token]
    if longest_only:
        if len(buf) > 1:
            buf.sort(key=_longest_only_key)
        return [buf[0]]
    return buf


def _utf16_units(s: str) -> tuple:
    b = s.encode("utf-16-be", "surrogatepass")
    return tuple((b[k] << 8) | b[k + 1] for k in range(0, len(b), 2))


def _longest_only_key(s: str):
    """HunspellStemFilter.lengthComparator: CharsRef length (UTF-16
    units, not code points) descending, tie reverse UTF-16 order."""
    units = _utf16_units(s)
    return (-len(units), tuple(-u for u in units))


# ---------------------------------------------------------------------
# Bundled demo dictionary over the testdata documents vocabulary — the
# Spark-facing analyzer ("hunspell") uses it so the gate runs on real
# table text.  Rules exercise suffix strip/append with conditions, a
# prefix rule, multi-stem homonyms and NEEDAFFIX.
DEMO_AFF = b"""SET UTF-8
NEEDAFFIX Z

PFX S Y 1
PFX S 0 s [^s]

SFX R Y 2
SFX R 0 er [^e]
SFX R e er e

SFX E Y 1
SFX E 0 e .

SFX G Y 1
SFX G 0 g g
"""

DEMO_DIC = b"""13
tabl/E
lin/E
valu/E
merg/E
custom/R
filt/R
ord/R
order
low/S
park/S
mall/S
can/S
ag/G
"""

_DEMO_STEMMER = None


def demo_stemmer() -> HunspellStemmer:
    global _DEMO_STEMMER
    if _DEMO_STEMMER is None:
        _DEMO_STEMMER = HunspellStemmer(
            HunspellDictionary(DEMO_AFF, [DEMO_DIC]))
    return _DEMO_STEMMER


def hunspell_flat(flat, stemmer: HunspellStemmer = None,
                  dedup: bool = True, longest_only: bool = False):
    """HunspellStemFilter over the flat token stream: the first stem
    replaces the token, additional stems ride posInc 0 at the same
    position, unknown words pass through (HunspellStemFilter.java:89).
    Vocabulary-vectorized: the stemmer recursion runs once per distinct
    term."""
    import numpy as np
    import pandas as pd

    if stemmer is None:
        stemmer = demo_stemmer()
    term = flat["term"].astype(str)
    cats, codes = np.unique(term.to_numpy(), return_inverse=True)
    first = np.asarray(cats, dtype=object).copy()
    extras_by_cat = {}
    for ci, t in enumerate(cats):
        emitted = hunspell_stems(t, stemmer, dedup=dedup,
                                 longest_only=longest_only)
        first[ci] = emitted[0]
        if len(emitted) > 1:
            extras_by_cat[ci] = emitted[1:]
    base_term = first[codes]
    doc = flat["doc_idx"].to_numpy()
    pos = flat["pos"].to_numpy()
    if not extras_by_cat:
        out = pd.DataFrame({"doc_idx": doc, "term": base_term,
                            "pos": pos.astype(np.int32)})
        if "doc_lengths" in flat.attrs:
            out.attrs["doc_lengths"] = np.asarray(flat.attrs["doc_lengths"])
        return out
    add_doc, add_term, add_pos = [], [], []
    for ci, extras in extras_by_cat.items():
        hits = np.flatnonzero(codes == ci)
        for s in extras:
            add_doc.append(doc[hits])
            add_term.append(np.full(len(hits), s, dtype=object))
            add_pos.append(pos[hits])
    od = np.concatenate([doc] + add_doc)
    ot = np.concatenate([base_term] + add_term)
    op = np.concatenate([pos] + add_pos)
    order = np.lexsort((op, od))
    out = pd.DataFrame(
        {"doc_idx": od[order], "term": ot[order],
         "pos": op[order].astype(np.int32)}
    )
    if "doc_lengths" in flat.attrs:
        # extra stems are posInc-0 overlaps: discountOverlaps norm
        # lengths unchanged
        out.attrs["doc_lengths"] = np.asarray(flat.attrs["doc_lengths"])
    return out
