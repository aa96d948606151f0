"""Porter stemmer (classic 1980 algorithm) -- pure Python, dependency-free.

Backs the engine's ``text_en`` analyzer chain (SURVEY T5): the reference's
text_en field type runs PorterStemFilter after stop+lowercase
(/root/reference/src/main/resources/default-base-config/managed-schema.xml:
354-381). Implemented from the published algorithm (M.F. Porter, "An
algorithm for suffix stripping", Program 14(3) 1980) -- the same spec
Lucene's PorterStemmer implements.

The stemmer is a per-token pure function; the analyzer memoizes it per Arrow
batch (Zipfian text -> high hit rate), so the hot path is dict lookups.
"""

from __future__ import annotations

_VOWELS = set("aeiou")

# KeywordMarkerFilter (managed-schema.xml:360,375 -- `protected="protwords.txt"`):
# protected words bypass the stemmer entirely. DEFAULT_PROTWORDS is exactly
# parse_protwords_file(<the reference's shipped default-base-config/
# protwords.txt>) -- asserted by tests/test_text_en.py. Matching is on the
# lowercased token (the filter sits after LowerCaseFilter in the chain).
DEFAULT_PROTWORDS = frozenset({"dontstems", "zwhacky"})


def parse_protwords_lines(lines) -> frozenset[str]:
    """Solr protwords.txt format: one word per line, '#' comments, blanks
    ignored; lowercased to match the post-LowerCaseFilter position."""
    out = set()
    for raw in lines:
        line = raw.strip()
        if line and not line.startswith("#"):
            out.add(line.lower())
    return frozenset(out)


def parse_protwords_file(path: str) -> frozenset[str]:
    with open(path, encoding="utf-8") as f:
        return parse_protwords_lines(f)


def stem_en(word: str, protected: frozenset[str] = DEFAULT_PROTWORDS) -> str:
    """text_en stemming step: KeywordMarker-protected words pass through,
    everything else gets Porter."""
    return word if word in protected else porter_stem(word)


def _is_consonant(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences ([C](VC)^m[V])."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        if _is_consonant(stem, i):
            if prev_vowel:
                m += 1
            prev_vowel = False
        else:
            prev_vowel = True
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if (
        _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
    ):
        return word[-1] not in "wxy"
    return False


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Stem a lowercase word (classic Porter; words of length <= 2 kept)."""
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_consonant(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w = w + "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue
            if _measure(stem) > 1:
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_consonant(w) and w.endswith("l"):
        w = w[:-1]

    return w


class MemoStemmer:
    """Memoized stemmer for Zipfian token streams. Seeds the cache with the
    KeywordMarker-protected words (identity mapping), so protection costs
    nothing on the hot path."""

    def __init__(self, protected: frozenset[str] = DEFAULT_PROTWORDS):
        self.cache: dict[str, str] = {w: w for w in protected}

    def __call__(self, word: str) -> str:
        s = self.cache.get(word)
        if s is None:
            s = porter_stem(word)
            self.cache[word] = s
        return s
