"""Double Metaphone phonetic encoding + the ``phonetic_en`` fieldType.

The reference schema declares ``phonetic_en`` (default-base-config/
managed-schema.xml:476-482): StandardTokenizer -> DoubleMetaphoneFilter
(inject=false) -- every token is indexed as its phonetic code(s), so
"Smith" and "Smyth" collide and sound-alike search works.

:func:`double_metaphone` is an original implementation of Lawrence
Philips' published Double Metaphone algorithm (C/C++ Users Journal /
Dr. Dobb's, June 2000 -- public spec; the same rule set behind Apache
commons-codec's encoder, which Lucene's filter wraps). It returns the
(primary, alternate) codes, each truncated to ``max_len`` (Lucene's
``maxCodeLength`` default 4).

Filter semantics reproduced (Lucene DoubleMetaphoneFilter, inject=false):
the token is REPLACED by its primary code; when the alternate differs it
is emitted too, at the same position (so either code matches at query
time, and phrase positions stay aligned). Tokens that encode to nothing
(pure digits) are kept verbatim -- a documented choice: the engine's
frozen tokenizer emits [a-z0-9]+ runs and dropping numbers would lose
exact-number search on a phonetic field.
"""

from __future__ import annotations

_VOWELS = frozenset("AEIOUY")


def _slavo_germanic(s: str) -> bool:
    return "W" in s or "K" in s or "CZ" in s or "WITZ" in s


class _DM:
    """One encoding pass. ``word`` is upper-cased, padded so lookahead
    never walks off the end (the algorithm peeks up to 4 ahead)."""

    def __init__(self, word: str, max_len: int):
        self.s = word.upper() + "     "
        self.length = len(word)
        self.last = self.length - 1
        self.max_len = max_len
        self.primary: list[str] = []
        self.secondary: list[str] = []

    def at(self, start: int, length: int, *options: str) -> bool:
        if start < 0:
            return False
        return self.s[start : start + length] in options

    def ch(self, i: int) -> str:
        return self.s[i] if 0 <= i < self.length else ""

    def vowel(self, i: int) -> bool:
        return 0 <= i < self.length and self.s[i] in _VOWELS

    def add(self, p: str, a: str | None = None) -> None:
        self.primary.append(p)
        self.secondary.append(p if a is None else a)

    def done(self) -> bool:
        return (
            len("".join(self.primary)) >= self.max_len
            and len("".join(self.secondary)) >= self.max_len
        )


def double_metaphone(value: str, max_len: int = 4) -> tuple[str, str]:
    """(primary, alternate) Double Metaphone codes of ``value``. Codes use
    the alphabet {A F H J K L M N P R S T X 0} ('0' = th, 'X' = sh/ch).
    Non-letters are ignored; an all-non-letter input returns ('', '')."""
    word = "".join(c for c in value.upper() if "A" <= c <= "Z")
    d = _DM(word, max_len)
    if not word:
        return "", ""
    sg = _slavo_germanic(word)
    n = 0
    # silent first letters; initial X sounds like S (Xavier)
    if d.at(0, 2, "GN", "KN", "PN", "WR", "PS"):
        n = 1
    if d.ch(0) == "X":
        d.add("S")
        n = 1

    while n < d.length and not d.done():
        c = d.s[n]
        if c in _VOWELS:
            if n == 0:
                d.add("A")
            n += 1
        elif c == "B":
            d.add("P")
            n += 2 if d.ch(n + 1) == "B" else 1
        elif c == "C":
            # germanic -ACH- (e.g. 'macher'); not CH as in 'chianti'
            if (
                n > 1
                and not d.vowel(n - 2)
                and d.at(n - 1, 3, "ACH")
                and d.ch(n + 2) != "I"
                and (d.ch(n + 2) != "E" or d.at(n - 2, 6, "BACHER", "MACHER"))
            ):
                d.add("K")
                n += 2
            elif n == 0 and d.at(n, 6, "CAESAR"):
                d.add("S")
                n += 2
            elif d.at(n, 4, "CHIA"):  # italian 'chianti'
                d.add("K")
                n += 2
            elif d.at(n, 2, "CH"):
                if n > 0 and d.at(n, 4, "CHAE"):  # 'michael'
                    d.add("K", "X")
                elif (
                    n == 0
                    and (
                        d.at(n + 1, 5, "HARAC", "HARIS")
                        or d.at(n + 1, 3, "HOR", "HYM", "HIA", "HEM")
                    )
                    and not d.at(0, 5, "CHORE")
                ):  # greek roots: 'chorus', 'chemistry'
                    d.add("K")
                elif (
                    d.at(0, 4, "VAN ", "VON ")
                    or d.at(0, 3, "SCH")
                    or d.at(n - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                    or d.at(n + 2, 1, "T", "S")
                    or (
                        (d.at(n - 1, 1, "A", "O", "U", "E") or n == 0)
                        and (
                            d.at(n + 2, 1, "L", "R", "N", "M", "B",
                                 "H", "F", "V", "W")
                            or n + 1 == d.last
                        )
                    )
                ):  # germanic: 'architect' (not 'arch'), 'orchestra'
                    d.add("K")
                else:
                    if n > 0:
                        if d.at(0, 2, "MC"):  # 'mchugh'
                            d.add("K")
                        else:
                            d.add("X", "K")
                    else:
                        d.add("X")
                n += 2
            elif d.at(n, 2, "CZ") and not d.at(n - 2, 4, "WICZ"):
                d.add("S", "X")  # 'czerny'
                n += 2
            elif d.at(n + 1, 3, "CIA"):  # 'focaccia'
                d.add("X")
                n += 3
            elif d.at(n, 2, "CC") and not (n == 1 and d.ch(0) == "M"):
                # double C, but not McClellan
                if d.at(n + 2, 1, "I", "E", "H") and not d.at(n + 2, 2, "HU"):
                    if (n == 1 and d.ch(n - 1) == "A") or d.at(
                        n - 1, 5, "UCCEE", "UCCES"
                    ):  # 'accident'/'succeed'
                        d.add("KS")
                    else:  # 'bacci', 'bertucci'
                        d.add("X")
                    n += 3
                else:  # Pierce's rule
                    d.add("K")
                    n += 2
            elif d.at(n, 2, "CK", "CG", "CQ"):
                d.add("K")
                n += 2
            elif d.at(n, 2, "CI", "CE", "CY"):
                if d.at(n, 3, "CIO", "CIE", "CIA"):  # italian vs systematic
                    d.add("S", "X")
                else:
                    d.add("S")
                n += 2
            else:
                d.add("K")
                if d.at(n + 1, 2, " C", " Q", " G"):  # 'mac caffrey'
                    n += 3
                elif d.at(n + 1, 1, "C", "K", "Q") and not d.at(
                    n + 1, 2, "CE", "CI"
                ):
                    n += 2
                else:
                    n += 1
        elif c == "D":
            if d.at(n, 2, "DG"):
                if d.at(n + 2, 1, "I", "E", "Y"):  # 'edge'
                    d.add("J")
                    n += 3
                else:  # 'edgar'
                    d.add("TK")
                    n += 2
            elif d.at(n, 2, "DT", "DD"):
                d.add("T")
                n += 2
            else:
                d.add("T")
                n += 1
        elif c == "F":
            d.add("F")
            n += 2 if d.ch(n + 1) == "F" else 1
        elif c == "G":
            if d.ch(n + 1) == "H":
                if n > 0 and not d.vowel(n - 1):
                    d.add("K")
                    n += 2
                elif n == 0:
                    if d.ch(n + 2) == "I":  # 'ghislane'
                        d.add("J")
                    else:  # 'ghost'
                        d.add("K")
                    n += 2
                elif (
                    (n > 1 and d.at(n - 2, 1, "B", "H", "D"))
                    or (n > 2 and d.at(n - 3, 1, "B", "H", "D"))
                    or (n > 3 and d.at(n - 4, 1, "B", "H"))
                ):  # Parker's rule (with some further refinements): 'hugh'
                    n += 2
                else:
                    if n > 2 and d.ch(n - 1) == "U" and d.at(
                        n - 3, 1, "C", "G", "L", "R", "T"
                    ):  # 'laugh', 'cough'
                        d.add("F")
                    elif n > 0 and d.ch(n - 1) != "I":
                        d.add("K")
                    n += 2
            elif d.ch(n + 1) == "N":
                if n == 1 and d.vowel(0) and not sg:
                    d.add("KN", "N")
                elif not d.at(n + 2, 2, "EY") and d.ch(n + 1) != "Y" and not sg:
                    d.add("N", "KN")  # 'cagney'
                else:
                    d.add("KN")
                n += 2
            elif d.at(n + 1, 2, "LI") and not sg:  # 'tagliaro'
                d.add("KL", "L")
                n += 2
            elif n == 0 and (
                d.ch(n + 1) == "Y"
                or d.at(n + 1, 2, "ES", "EP", "EB", "EL", "EY", "IB",
                        "IL", "IN", "IE", "EI", "ER")
            ):  # -ges-, -gep- etc at start
                d.add("K", "J")
                n += 2
            elif (
                (d.at(n + 1, 2, "ER") or d.ch(n + 1) == "Y")
                and not d.at(0, 6, "DANGER", "RANGER", "MANGER")
                and not d.at(n - 1, 1, "E", "I")
                and not d.at(n - 1, 3, "RGY", "OGY")
            ):  # -ger-, -gy-: 'berger' but not 'bergen'
                d.add("K", "J")
                n += 2
            elif d.at(n + 1, 1, "E", "I", "Y") or d.at(
                n - 1, 4, "AGGI", "OGGI"
            ):  # italian 'biaggi'
                if d.at(0, 4, "VAN ", "VON ") or d.at(0, 3, "SCH") or d.at(
                    n + 1, 2, "ET"
                ):  # germanic
                    d.add("K")
                elif d.at(n + 1, 4, "IER "):  # always soft if french ending
                    d.add("J")
                else:
                    d.add("J", "K")
                n += 2
            else:
                d.add("K")
                n += 2 if d.ch(n + 1) == "G" else 1
        elif c == "H":
            # keep H between vowels and at start before a vowel
            if (n == 0 or d.vowel(n - 1)) and d.vowel(n + 1):
                d.add("H")
                n += 2
            else:
                n += 1
        elif c == "J":
            if d.at(n, 4, "JOSE") or d.at(0, 4, "SAN "):
                # spanish 'jose' / 'san jacinto'
                if (n == 0 and d.ch(n + 4) == " ") or d.length == 4 or d.at(
                    0, 4, "SAN "
                ):
                    d.add("H")
                else:
                    d.add("J", "H")
            elif n == 0:
                d.add("J", "A")  # 'yankelovich' vs 'jahn'
            elif (
                d.vowel(n - 1)
                and not sg
                and (d.ch(n + 1) == "A" or d.ch(n + 1) == "O")
            ):
                d.add("J", "H")
            elif n == d.last:
                d.add("J", "")
            elif not d.at(
                n + 1, 1, "L", "T", "K", "S", "N", "M", "B", "Z"
            ) and not d.at(n - 1, 1, "S", "K", "L"):
                d.add("J")
            n += 2 if d.ch(n + 1) == "J" else 1
        elif c == "K":
            d.add("K")
            n += 2 if d.ch(n + 1) == "K" else 1
        elif c == "L":
            if d.ch(n + 1) == "L":
                # spanish 'cabrillo', 'gallegos'
                if (
                    n == d.length - 3
                    and d.at(n - 1, 4, "ILLO", "ILLA", "ALLE")
                ) or (
                    (d.at(d.last - 1, 2, "AS", "OS") or d.at(d.last, 1, "A", "O"))
                    and d.at(n - 1, 4, "ALLE")
                ):
                    d.add("L", "")
                else:
                    d.add("L")
                n += 2
            else:
                d.add("L")
                n += 1
        elif c == "M":
            d.add("M")
            if (
                d.at(n - 1, 3, "UMB")
                and (n + 1 == d.last or d.at(n + 2, 2, "ER"))
            ) or d.ch(n + 1) == "M":  # 'dumb', 'thumb'
                n += 2
            else:
                n += 1
        elif c == "N":
            d.add("N")
            n += 2 if d.ch(n + 1) == "N" else 1
        elif c == "P":
            if d.ch(n + 1) == "H":
                d.add("F")
                n += 2
            else:
                d.add("P")
                n += 2 if d.at(n + 1, 1, "P", "B") else 1  # 'campbell'
        elif c == "Q":
            d.add("K")
            n += 2 if d.ch(n + 1) == "Q" else 1
        elif c == "R":
            # french 'rogier', exclude 'hochmeier'
            if (
                n == d.last
                and not sg
                and d.at(n - 2, 2, "IE")
                and not d.at(n - 4, 2, "ME", "MA")
            ):
                d.add("", "R")
            else:
                d.add("R")
            n += 2 if d.ch(n + 1) == "R" else 1
        elif c == "S":
            if d.at(n - 1, 3, "ISL", "YSL"):  # silent: 'island', 'carlysle'
                n += 1
            elif n == 0 and d.at(n, 5, "SUGAR"):
                d.add("X", "S")
                n += 1
            elif d.at(n, 2, "SH"):
                if d.at(n + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):  # germanic
                    d.add("S")
                else:
                    d.add("X")
                n += 2
            elif d.at(n, 3, "SIO", "SIA") or d.at(n, 4, "SIAN"):
                d.add("S") if sg else d.add("S", "X")
                n += 3
            elif (n == 0 and d.at(n + 1, 1, "M", "N", "L", "W")) or d.at(
                n + 1, 1, "Z"
            ):
                # german/anglicization: 'smith' -> match 'schmidt'
                d.add("S", "X")
                n += 2 if d.at(n + 1, 1, "Z") else 1
            elif d.at(n, 2, "SC"):
                if d.ch(n + 2) == "H":
                    if d.at(n + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
                        # dutch origin: 'school', 'schooner'
                        if d.at(n + 3, 2, "ER", "EN"):  # 'schermerhorn'
                            d.add("X", "SK")
                        else:
                            d.add("SK")
                    else:
                        if n == 0 and not d.vowel(3) and d.ch(3) != "W":
                            d.add("X", "S")
                        else:
                            d.add("X")
                    n += 3
                elif d.at(n + 2, 1, "I", "E", "Y"):
                    d.add("S")
                    n += 3
                else:
                    d.add("SK")
                    n += 3
            else:
                if n == d.last and d.at(n - 2, 2, "AI", "OI"):
                    d.add("", "S")  # french 'resnais', 'artois'
                else:
                    d.add("S")
                n += 2 if d.at(n + 1, 1, "S", "Z") else 1
        elif c == "T":
            if d.at(n, 4, "TION") or d.at(n, 3, "TIA", "TCH"):
                d.add("X")
                n += 3
            elif d.at(n, 2, "TH") or d.at(n, 3, "TTH"):
                if d.at(n + 2, 2, "OM", "AM") or d.at(
                    0, 4, "VAN ", "VON "
                ) or d.at(0, 3, "SCH"):  # 'thomas', 'thames', germanic
                    d.add("T")
                else:
                    d.add("0", "T")
                n += 2
            else:
                d.add("T")
                n += 2 if d.at(n + 1, 1, "T", "D") else 1
        elif c == "V":
            d.add("F")
            n += 2 if d.ch(n + 1) == "V" else 1
        elif c == "W":
            if d.at(n, 2, "WR"):  # can also be in the middle of a word
                d.add("R")
                n += 2
            elif n == 0 and (d.vowel(n + 1) or d.at(n, 2, "WH")):
                if d.vowel(n + 1):  # Wasserman should match Vasserman
                    d.add("A", "F")
                else:  # need Uomo to match Womo
                    d.add("A")
                n += 1
            elif (n == d.last and d.vowel(n - 1)) or d.at(
                n - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY"
            ) or d.at(0, 3, "SCH"):
                d.add("", "F")  # Arnow should match Arnoff
                n += 1
            elif d.at(n, 4, "WICZ", "WITZ"):  # polish e.g. 'filipowicz'
                d.add("TS", "FX")
                n += 4
            else:  # else skip it
                n += 1
        elif c == "X":
            # french e.g. 'breaux': final X silent
            if not (
                n == d.last
                and (d.at(n - 3, 3, "IAU", "EAU") or d.at(n - 2, 2, "AU", "OU"))
            ):
                d.add("KS")
            n += 2 if d.at(n + 1, 1, "C", "X") else 1
        elif c == "Z":
            if d.ch(n + 1) == "H":  # chinese pinyin e.g. 'zhao'
                d.add("J")
                n += 2
            else:
                if d.at(n + 1, 2, "ZO", "ZI", "ZA") or (
                    sg and n > 0 and d.ch(n - 1) != "T"
                ):
                    d.add("S", "TS")
                else:
                    d.add("S")
                n += 2 if d.ch(n + 1) == "Z" else 1
        else:
            n += 1

    p = "".join(d.primary)[:max_len]
    a = "".join(d.secondary)[:max_len]
    return p, a


def _phonetic_forms(tok: str) -> list[str]:
    """Token -> indexed form(s), Lucene DoubleMetaphoneFilter inject=false:
    the primary code, plus the alternate at the same position when it
    differs. Unencodable tokens (digits) pass through verbatim."""
    p, a = double_metaphone(tok)
    if not p:
        return [tok.lower()]
    return [p] if a == p else [p, a]


def register_phonetic_en_chain(name: str = "phonetic_en") -> None:
    """Register the schema's ``phonetic_en`` fieldType (managed-schema.xml
    :476-482): frozen tokenizer -> double_metaphone, inject=false. Both
    index and query sides analyze identically (the schema declares one
    <analyzer>), so 'Smyth' retrieves documents containing 'Smith'."""
    from .analysis import (
        HIGHLIGHT_TOKEN_PATTERNS,
        POSITION_ANALYZERS,
        QUERY_ANALYZERS,
        TOKEN_NORMALIZERS,
        TOKEN_RE,
    )

    def analyze(text: str | None) -> list[str]:
        if text is None:
            return []
        out: list[str] = []
        for tok in TOKEN_RE.findall(text.lower()):
            out.extend(_phonetic_forms(tok))
        return out

    def positions_of(text: str | None) -> dict[str, list[int]]:
        m: dict[str, list[int]] = {}
        if text is None:
            return m
        for i, tok in enumerate(TOKEN_RE.findall(text.lower())):
            for f in _phonetic_forms(tok):  # primary+alternate share i
                m.setdefault(f, []).append(i)
        return m

    QUERY_ANALYZERS[name] = analyze
    POSITION_ANALYZERS[name] = positions_of
    TOKEN_NORMALIZERS[name] = _phonetic_forms
    HIGHLIGHT_TOKEN_PATTERNS[name] = "[A-Za-z0-9]+"
