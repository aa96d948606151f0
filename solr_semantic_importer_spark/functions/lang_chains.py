"""Language analysis chains from a Solr configset's ``lang/`` directory.

The reference schema declares ~30 language fieldTypes
(default-base-config/managed-schema.xml:568+), each the same shape:
standard tokenizer -> [elision] -> lowercase -> stop(words=lang/
stopwords_XX.txt, often format="snowball") -> [normalization] -> stemmer.
This module makes every one of them instantiable against the user's own
configset files:

- ``parse_stopwords_file``: both Solr stopword formats -- "snowball"
  (``|`` comments, one word leading each line) and the default wordset
  (``#`` comments, whitespace-separated words)
- ``parse_wordlist_file``: the elision/contractions list format
  (``#`` comments, one particle per line, e.g. lang/contractions_fr.txt)
- minimal stemmers for fr/de/pt -- the ``*MinimalStem`` variants each
  fieldType documents as its less-aggressive alternative
  (managed-schema.xml:649, :736, :961), after Savoy, "Light Stemming
  Approaches for the French, Portuguese, German and Hungarian Languages"
  (SAC 2006). Rule sets are stated exactly in each docstring; other
  space-delimited languages register stop-only (a faithful chain: most of
  the reference's fieldTypes beyond the big European languages are
  tokenize+stop+lowercase only). ja/th need a segmenter, so the generic
  loop skips them; each gets a dedicated dictionary-free fallback:
  :func:`register_japanese_fallback_chain` -- script-run segmentation +
  kanji bigrams + the chain's width/stop/katakana-stem stages with
  ``stopwords_ja.txt`` and ``stoptags_ja.txt`` parsed -- and
  :func:`register_thai_fallback_chain` -- Thai-character-cluster
  bigrams + ``stopwords_th.txt``. The schema's own no-dictionary CJK
  chain, text_cjk (CJKBigram), is provided by
  :func:`register_cjk_bigram_chain`
- ``register_language_chains(lang_dir)``: registers ``text_XX`` for every
  ``stopwords_XX.txt`` present, merging ``contractions_XX.txt`` particles
  into the stop set

Tokenizer deviation (documented): the engine's frozen regex tokenizer
splits at apostrophes, so ``l'avion`` tokenizes as ``l / avion`` and
elision particles are dropped as standalone stop tokens -- same retrieval
effect as Lucene's ElisionFilter (which strips ``l'`` inside the token),
different mechanism. Language chains tokenize with a Unicode-letter
pattern so accented tokens (``été``, ``über``) stay whole.
"""

from __future__ import annotations

import os
import re

from .analysis import register_analysis_chain

__all__ = [
    "parse_stopwords_file",
    "parse_wordlist_file",
    "french_minimal_stem",
    "german_minimal_stem",
    "german_normalize",
    "portuguese_minimal_stem",
    "register_language_chains",
    "register_cjk_bigram_chain",
    "cjk_bigram_tokens",
    "parse_stoptags_file",
    "make_japanese_fallback_analyzer",
    "register_japanese_fallback_chain",
    "make_thai_fallback_analyzer",
    "register_thai_fallback_chain",
    "make_korean_fallback_analyzer",
    "register_korean_fallback_chain",
    "register_reference_configset",
    "UNICODE_TOKEN_PATTERN",
]

# \w minus underscore, over lowercased text: keeps accented letters whole
UNICODE_TOKEN_PATTERN = r"[^\W_]+"
_UNI_RE = re.compile(UNICODE_TOKEN_PATTERN, re.UNICODE)


def parse_stopwords_file(path: str, fmt: str = "auto") -> frozenset[str]:
    """Solr stopword file -> frozenset. ``snowball`` format: ``|`` starts a
    comment (full-line or trailing), the stop word is the first token of
    the line. ``wordset`` (Solr default): ``#`` full-line comments,
    whitespace-separated words. ``auto`` sniff: a file with ``#`` comment
    lines is wordset (its entries may legitimately contain ``|``); else
    any ``|`` means snowball."""
    with open(path, encoding="utf-8") as f:
        lines = f.read().splitlines()
    if fmt == "auto":
        if any(ln.lstrip().startswith("#") for ln in lines):
            fmt = "wordset"
        else:
            fmt = "snowball" if any("|" in ln for ln in lines) else "wordset"
    words: set[str] = set()
    for ln in lines:
        if fmt == "snowball":
            ln = ln.split("|", 1)[0]
            w = ln.strip().split()
            if w:
                words.add(w[0].lower())
        else:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            words.update(w.lower() for w in ln.split())
    return frozenset(words)


def parse_wordlist_file(path: str) -> list[str]:
    """Elision/contraction list: ``#`` comments, one entry per line."""
    out = []
    with open(path, encoding="utf-8") as f:
        for ln in f:
            ln = ln.strip()
            if ln and not ln.startswith("#"):
                out.append(ln.lower())
    return out


def french_minimal_stem(s: str) -> str:
    """frenchMinimalStem (managed-schema.xml:736 alternative; Savoy 2006).
    Rules, applied in order to words of length >= 6:
    final ``x``: ``aux -> al`` (chevaux -> cheval), else drop the ``x``;
    otherwise sequentially drop a final ``s``, then ``r``, then ``e``,
    then ``é``, then one of a doubled final letter."""
    if len(s) < 6:
        return s
    if s[-1] == "x":
        if s[-3:-1] == "au":
            return s[:-2] + "l"
        return s[:-1]
    if s[-1] == "s":
        s = s[:-1]
    if s[-1] == "r":
        s = s[:-1]
    if s[-1] == "e":
        s = s[:-1]
    if s[-1] == "é":
        s = s[:-1]
    if len(s) > 1 and s[-1] == s[-2]:
        s = s[:-1]
    return s


def german_normalize(s: str) -> str:
    """germanNormalization (managed-schema.xml:647), umlaut/eszett folding:
    ä->a, ö->o, ü->u, ß->ss. (Lucene's filter additionally folds ``ae/oe/
    ue`` digraphs context-sensitively; that heuristic is intentionally
    omitted -- documented deviation.)"""
    return (
        s.replace("ä", "a").replace("ö", "o").replace("ü", "u").replace("ß", "ss")
    )


def german_minimal_stem(s: str) -> str:
    """germanMinimalStem (managed-schema.xml:649 alternative; Savoy 2006
    plural reduction). Rules: words < 5 chars unchanged; drop final
    ``nen`` (len > 6); else drop final ``en``/``er``/``es``/``se``
    (len > 5); else drop a final ``n``/``s``/``r``/``e``. Runs after
    german_normalize in the registered chain."""
    if len(s) < 5:
        return s
    if len(s) > 6 and s.endswith("nen"):
        return s[:-3]
    if len(s) > 5 and s[-2:] in ("en", "er", "es", "se"):
        return s[:-2]
    if s[-1] in "nsre":
        return s[:-1]
    return s


def portuguese_minimal_stem(s: str) -> str:
    """portugueseMinimalStem (managed-schema.xml:961 alternative; Savoy
    2006 / RSLP plural step). Rules, plural words (final ``s``) of length
    >= 4 only: ``ões/ães -> ão``, ``ais -> al``, ``éis/eis -> el``,
    ``óis -> ol``, ``res -> r``, else drop the final ``s``; words ending
    ``ss`` are not plurals and stay unchanged."""
    if len(s) < 4 or not s.endswith("s"):
        return s
    if s.endswith(("ões", "ães")):
        return s[:-3] + "ão"
    if s.endswith("ais"):
        return s[:-3] + "al"
    if s.endswith(("éis", "eis")):
        return s[:-3] + "el"
    if s.endswith("óis"):
        return s[:-3] + "ol"
    if s.endswith("res"):
        return s[:-2]
    if s.endswith("ss"):
        return s
    return s[:-1]


# --- Arabic / Persian normalization (managed-schema.xml:568-579, 700-712) ---
#
# Lucene's ArabicNormalizationFilter / PersianNormalizationFilter /
# ArabicStemmer are published per-character algorithms (Larkey et al.'s
# light stemming); re-implemented here from the public spec. The schema's
# Persian ``<charFilter name="persian"/>`` replaces ZWNJ (U+200C) with a
# space BEFORE tokenization — under this engine's regex tokenizer that is
# a structural no-op: ZWNJ is a format char, not a letter, so ``[^\W_]+``
# already splits token runs at it (golden-tested).

# tatweel + fathatan..sukun (escapes: combining marks are invisible and
# editor-hostile as raw source)
_AR_DIACRITICS = dict.fromkeys(
    [0x0640] + list(range(0x064B, 0x0653))
)
_AR_MAP = str.maketrans({
    "آ": "ا", "أ": "ا", "إ": "ا",  # alef forms
    "ى": "ي",  # dotless yeh -> yeh
    "ة": "ه",  # teh marbuta -> heh
})


def arabic_normalize(s: str) -> str:
    """Lucene ArabicNormalizer: strip tatweel + harakat, fold hamza-alef
    forms to bare alef, dotless yeh -> yeh, teh marbuta -> heh."""
    return s.translate(_AR_DIACRITICS).translate(_AR_MAP)


_FA_MAP = str.maketrans({
    "ي": "ی", "ے": "ی",  # arabic yeh / yeh barree
    "ك": "ک",                       # kaf -> keheh
    "ۀ": "ه", "ہ": "ه",  # heh+yeh / heh goal -> heh
    "ٔ": None,                 # combining hamza above
})


def persian_normalize(s: str) -> str:
    """Lucene PersianNormalizer: fold yeh/kaf/heh variants, drop hamza."""
    return s.translate(_FA_MAP)


_AR_PREFIXES = ("وال", "بال",
                "كال", "فال",
                "ال", "لل", "و")
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")


def arabic_stem(s: str) -> str:
    """Lucene ArabicStemmer (Larkey light stemming): remove ONE leading
    article/conjunction prefix (waw needs length >= 4, others need
    length >= len+2), then strip EVERY matching suffix in list order
    (each needs remaining length >= len+2)."""
    for p in _AR_PREFIXES:
        need = 4 if len(p) == 1 else len(p) + 2
        if s.startswith(p) and len(s) >= need:
            s = s[len(p):]
            break
    for suf in _AR_SUFFIXES:
        if s.endswith(suf) and len(s) >= len(suf) + 2:
            s = s[: -len(suf)]
    return s


def _persian_chain_transform(s: str) -> str:
    # schema order (text_fa): lowercase -> arabicNormalization ->
    # persianNormalization -> stop; runs as token_transform (pre-stop)
    return persian_normalize(arabic_normalize(s))


STEMMERS = {
    "fr": french_minimal_stem,
    "de": german_minimal_stem,
    "pt": portuguese_minimal_stem,
    # text_ar (managed-schema.xml:577): arabicStem AFTER normalization
    "ar": arabic_stem,
}
# text_ar: stop runs BEFORE arabicNormalization in the schema -> post-stop
POST_STOP_TRANSFORMS = {"de": german_normalize, "ar": arabic_normalize}
# text_fa: normalization runs BEFORE stop in the schema -> token transform
TOKEN_TRANSFORMS = {"fa": _persian_chain_transform}

# Unsegmented-script languages whose Lucene chains need a dictionary /
# algorithmic segmenter (text_ja = kuromoji, managed-schema.xml:838;
# text_th = ThaiTokenizer, :1004; text_ko = nori/mecab-ko-dic, :885-905 --
# Korean writes words+particles as unspaced eojeol runs). A whitespace/
# regex tokenizer would emit whole clauses as single tokens -- retrieval
# would silently return zero hits -- so these are NOT registered by the
# generic stop-only loop. Each has a dedicated dictionary-free chain below
# (register_japanese_fallback_chain / register_thai_fallback_chain /
# register_korean_fallback_chain).
UNSEGMENTED = frozenset({"ja", "th", "ko"})

# CJK unified ideographs + kana + hangul (the ranges CJKBigramFilter pairs)
_CJK_RANGE = (
    "ᄀ-ᇿ぀-ヿ㄰-㆏㐀-䶿"
    "一-鿿가-힯豈-﫿"
)
_CJK_TOKEN_RE = re.compile(rf"([{_CJK_RANGE}]+)|([^\W_]+)", re.UNICODE)


def cjk_bigram_tokens(text: str | None) -> list[str]:
    """text_cjk analysis (managed-schema.xml:607-615): width normalization
    (NFKC folds full-width Latin and half-width kana, the CJKWidth analog)
    -> lowercase -> runs of CJK characters emit overlapping BIGRAMS (a
    lone CJK char emits itself), non-CJK runs emit normal word tokens."""
    import unicodedata

    if text is None:
        return []
    out: list[str] = []
    for m in _CJK_TOKEN_RE.finditer(unicodedata.normalize("NFKC", text).lower()):
        cjk, word = m.group(1), m.group(2)
        if word:
            out.append(word)
        elif len(cjk) == 1:
            out.append(cjk)
        else:
            out.extend(cjk[i : i + 2] for i in range(len(cjk) - 1))
    return out


def register_cjk_bigram_chain(name: str = "text_cjk") -> None:
    """Register the schema's text_cjk fieldType: the no-dictionary CJK
    chain (bigrams match any two consecutive ideographs, so queries and
    documents align without segmentation). Positions are bigram-stream
    indexes (Lucene emits successive positions the same way), so phrase
    queries over the bigram stream behave like Lucene's."""
    from .analysis import (
        HIGHLIGHT_TOKEN_PATTERNS,
        POSITION_ANALYZERS,
        QUERY_ANALYZERS,
        TOKEN_NORMALIZERS,
    )

    def positions_of(text: str | None) -> dict[str, list[int]]:
        m: dict[str, list[int]] = {}
        for i, tok in enumerate(cjk_bigram_tokens(text)):
            m.setdefault(tok, []).append(i)
        return m

    QUERY_ANALYZERS[name] = cjk_bigram_tokens
    POSITION_ANALYZERS[name] = positions_of
    TOKEN_NORMALIZERS[name] = cjk_bigram_tokens
    HIGHLIGHT_TOKEN_PATTERNS[name] = rf"[{_CJK_RANGE}]{{1,2}}|[^\W_]+"


def parse_stoptags_file(path: str) -> frozenset[str]:
    """Parse a Lucene ``stoptags_ja.txt`` part-of-speech tag list
    (JapanesePartOfSpeechStopFilter input, managed-schema.xml:871): ``#``
    comments, one IPADIC POS tag per line (hierarchy levels joined with
    ``-``, e.g. ``助詞-格助詞-一般``)."""
    with open(path, encoding="utf-8") as f:
        return frozenset(
            ln.strip()
            for ln in f
            if ln.strip() and not ln.lstrip().startswith("#")
        )


# text_ja fallback script classes. 々 (U+3005) continues a kanji word
# (人々); ー (U+30FC) continues a katakana word. The word class excludes
# every CJK range so an "abc漢字" run still splits at the script boundary.
_JA_RUN_RE = re.compile(
    r"(?P<kanji>[々㐀-䶿一-鿿豈-﫿]+)"
    r"|(?P<kata>[ァ-ヺー]+)"
    r"|(?P<hira>[ぁ-ゖゝゞ]+)"
    r"|(?P<word>[^\W_々ぁ-ヿ㐀-鿿豈-﫿]+)",
    re.UNICODE,
)


def make_japanese_fallback_analyzer(
    stop_set: frozenset[str], pos_stop: bool = True
):
    """Dictionary-free approximation of the reference's ``text_ja`` chain
    (managed-schema.xml:838-880: JapaneseTokenizer(search) -> baseForm ->
    partOfSpeechStop(stoptags_ja) -> cjkWidth -> stop(stopwords_ja) ->
    katakanaStem(min=4) -> lowercase). Kuromoji's statistical model is not
    reproducible offline, so each stage maps to a no-dictionary stand-in:

    - tokenizer: script-run segmentation (kanji / katakana / hiragana /
      romaji boundaries are Japanese's strongest no-dictionary word
      boundary signal); punctuation is discarded, as kuromoji's
      ``discardPunctuation`` default and the 記号* stoptags prescribe.
    - kanji runs emit overlapping bigrams (the schema's own text_cjk
      fallback semantics) -- query and index agree without segmentation.
    - katakana runs stay whole (loanwords; kuromoji keeps compounds as
      synonyms of parts) and take the japaneseKatakanaStem rule: drop one
      trailing ー from tokens of length >= 4.
    - hiragana runs: a run that IS a stopword surface form (the particles
      and auxiliaries stopwords_ja.txt lists -- the surface shapes of the
      助詞/助動詞 POS classes stoptags_ja.txt drops) is removed when
      ``pos_stop``; other runs emit bigrams like kanji.
    - cjkWidth + lowercase: NFKC fold (full-width romaji -> half, half-
      width kana -> full) then str.lower, applied before everything.
    - baseForm has no dictionary-free analog: inflected verbs stay
      surface-form; bigram overlap keeps stem-sharing forms retrievable
      (食べた/食べる share the 食べ bigram window).

    The stop filter applies to every emitted token, matching the chain's
    stop stage running on the token stream."""
    import unicodedata

    def analyze(text: str | None) -> list[str]:
        if text is None:
            return []
        out: list[str] = []
        for m in _JA_RUN_RE.finditer(
            unicodedata.normalize("NFKC", text).lower()
        ):
            kanji, kata, hira, word = m.group("kanji", "kata", "hira", "word")
            if word:
                out.append(word)
            elif kata:
                if len(kata) >= 4 and kata.endswith("ー"):
                    kata = kata[:-1]
                out.append(kata)
            else:
                run = kanji or hira
                if hira and pos_stop and run in stop_set:
                    continue
                if len(run) == 1:
                    out.append(run)
                else:
                    out.extend(run[i : i + 2] for i in range(len(run) - 1))
        return [t for t in out if t not in stop_set]

    return analyze


def register_japanese_fallback_chain(
    lang_dir: str, name: str = "text_ja"
) -> None:
    """Register the dictionary-free ``text_ja`` fallback against a
    configset ``lang/`` dir (reads ``stopwords_ja.txt`` and
    ``stoptags_ja.txt``; see make_japanese_fallback_analyzer for the
    kuromoji-stage mapping). The hiragana particle-run stop behavior is
    enabled iff the stoptags file actually drops the particle class
    (助詞), mirroring JapanesePartOfSpeechStopFilter honoring its tags
    config."""
    from .analysis import (
        HIGHLIGHT_TOKEN_PATTERNS,
        POSITION_ANALYZERS,
        QUERY_ANALYZERS,
        TOKEN_NORMALIZERS,
    )

    stops = parse_stopwords_file(
        os.path.join(lang_dir, "stopwords_ja.txt"), fmt="wordset"
    )
    tags = parse_stoptags_file(os.path.join(lang_dir, "stoptags_ja.txt"))
    analyze = make_japanese_fallback_analyzer(stops, pos_stop="助詞" in tags)

    def positions_of(text: str | None) -> dict[str, list[int]]:
        m: dict[str, list[int]] = {}
        for i, tok in enumerate(analyze(text)):
            m.setdefault(tok, []).append(i)
        return m

    QUERY_ANALYZERS[name] = analyze
    POSITION_ANALYZERS[name] = positions_of
    TOKEN_NORMALIZERS[name] = analyze
    HIGHLIGHT_TOKEN_PATTERNS[name] = (
        r"[々㐀-䶿一-鿿豈-﫿]{1,2}"
        r"|[ァ-ヺー]+"
        r"|[ぁ-ゖゝゞ]{1,2}"
        r"|[^\W_々ぁ-ヿ㐀-鿿豈-﫿]+"
    )


# Thai character-cluster (TCC) unit: optional leading vowel (เแโใไ) +
# consonant + trailing vowel/tone combining marks. Thai line-breaking and
# no-dictionary segmentation both build on these clusters (Theeramunkong
# et al., "Character Cluster Based Thai Information Retrieval", IRAL'00):
# a cluster never splits mid-grapheme, so bigrams over clusters align
# between query and index the way CJK bigrams do for ideographs.
_TH_CLUSTER_RE = re.compile(
    "[เ-ไ]?[ก-ฮ][ะ-ฺๅ็-๎]*"
    "|[฀-๿]"
)
_TH_RUN_RE = re.compile(
    "(?P<thai>[ก-๛]+)|(?P<word>[^\\W_฀-๿]+)", re.UNICODE
)


def make_thai_fallback_analyzer(stop_set: frozenset[str]):
    """Dictionary-free approximation of the reference's ``text_th`` chain
    (managed-schema.xml:1004-1009: ThaiTokenizer -> lowercase ->
    stop(stopwords_th)). ThaiTokenizer's BreakIterator dictionary is not
    available offline; the stand-in segments Thai runs into character
    clusters (see _TH_CLUSTER_RE) and emits overlapping cluster BIGRAMS --
    a two-cluster word (most Thai content words) becomes one exact token,
    and query/index always agree without a dictionary. A run that IS a
    stopword surface form drops whole, and the stop filter applies to
    every emitted token; non-Thai runs tokenize as lowercased words."""
    import unicodedata

    def analyze(text: str | None) -> list[str]:
        if text is None:
            return []
        out: list[str] = []
        for m in _TH_RUN_RE.finditer(
            unicodedata.normalize("NFKC", text).lower()
        ):
            thai, word = m.group("thai", "word")
            if word:
                out.append(word)
                continue
            if thai in stop_set:
                continue
            cl = _TH_CLUSTER_RE.findall(thai)
            if len(cl) == 1:
                out.append(cl[0])
            else:
                out.extend(cl[i] + cl[i + 1] for i in range(len(cl) - 1))
        return [t for t in out if t not in stop_set]

    return analyze


def register_thai_fallback_chain(lang_dir: str, name: str = "text_th") -> None:
    """Register the dictionary-free ``text_th`` fallback against a
    configset ``lang/`` dir (reads ``stopwords_th.txt``; see
    make_thai_fallback_analyzer)."""
    from .analysis import (
        HIGHLIGHT_TOKEN_PATTERNS,
        POSITION_ANALYZERS,
        QUERY_ANALYZERS,
        TOKEN_NORMALIZERS,
    )

    stops = parse_stopwords_file(
        os.path.join(lang_dir, "stopwords_th.txt"), fmt="wordset"
    )
    analyze = make_thai_fallback_analyzer(stops)

    def positions_of(text: str | None) -> dict[str, list[int]]:
        m: dict[str, list[int]] = {}
        for i, tok in enumerate(analyze(text)):
            m.setdefault(tok, []).append(i)
        return m

    QUERY_ANALYZERS[name] = analyze
    POSITION_ANALYZERS[name] = positions_of
    TOKEN_NORMALIZERS[name] = analyze
    HIGHLIGHT_TOKEN_PATTERNS[name] = (
        "[ก-๛]+|[^\\W_฀-๿]+"
    )


# text_ko fallback script classes. Hangul = precomposed syllables +
# compatibility jamo (the blocks KoreanTokenizer segments); hanja = the
# same CJK-ideograph ranges as the kanji class (Korean mixed-script text).
# The word class excludes both so "abc학교" still splits at the boundary.
_KO_RUN_RE = re.compile(
    r"(?P<hangul>[가-힣ㄱ-ㆎᄀ-ᇿ]+)"
    r"|(?P<hanja>[㐀-䶿一-鿿豈-﫿]+)"
    r"|(?P<word>[^\W_가-힣ㄱ-ㆎᄀ-ᇿ㐀-䶿一-鿿豈-﫿]+)",
    re.UNICODE,
)


def make_korean_fallback_analyzer(stop_set: frozenset[str] = frozenset()):
    """Dictionary-free approximation of the reference's ``text_ko`` chain
    (managed-schema.xml:885-905: KoreanTokenizer(nori, decompoundMode=
    discard) -> koreanPartOfSpeechStop -> koreanReadingForm -> lowercase).
    Nori's mecab-ko-dic statistical model is not reproducible offline, so
    each stage maps to a no-dictionary stand-in -- the exact recipe of the
    r3 ``text_ja`` fallback, adapted to hangul:

    - tokenizer: script-run segmentation (hangul / hanja / romaji), then
      hangul runs emit overlapping SYLLABLE BIGRAMS -- Lucene's own
      no-dictionary Korean treatment (CJKBigramFilter han+hangul; the
      schema's text_cjk bigrams hangul the same way). A noun+particle
      eojeol (학교에) shares the bare noun's bigram (학교), so queries
      match without segmentation; a lone syllable emits itself.
    - koreanPartOfSpeechStop (drops particles/endings, "basically
      equivalent to stemming" per the schema comment) has no
      dictionary-free analog; bigram overlap substitutes -- the particle
      syllables only add low-idf bigrams at run edges. An optional
      ``stop_set`` drops whole-run surface forms (no stopwords_ko.txt
      ships in the reference configset, so the default is empty).
    - koreanReadingForm (hanja -> hangul reading) needs a reading
      dictionary; hanja runs instead emit ideograph bigrams (the text_cjk
      han treatment), so query and index still agree on hanja-for-hanja.
    - lowercase + width: NFKC fold then str.lower before everything
      (full-width romaji -> ascii, half-width forms -> full)."""
    import unicodedata

    def analyze(text: str | None) -> list[str]:
        if text is None:
            return []
        out: list[str] = []
        for m in _KO_RUN_RE.finditer(
            unicodedata.normalize("NFKC", text).lower()
        ):
            hangul, hanja, word = m.group("hangul", "hanja", "word")
            if word:
                out.append(word)
                continue
            run = hangul or hanja
            if run in stop_set:
                continue
            if len(run) == 1:
                out.append(run)
            else:
                out.extend(run[i : i + 2] for i in range(len(run) - 1))
        return [t for t in out if t not in stop_set]

    return analyze


def register_korean_fallback_chain(
    lang_dir: str | None = None, name: str = "text_ko"
) -> None:
    """Register the dictionary-free ``text_ko`` fallback. ``lang_dir`` is
    accepted for symmetry with the ja/th registrars and read IF a
    ``stopwords_ko.txt`` is present (the reference configset ships none --
    nori stops by part-of-speech tags instead, which need the
    dictionary)."""
    from .analysis import (
        HIGHLIGHT_TOKEN_PATTERNS,
        POSITION_ANALYZERS,
        QUERY_ANALYZERS,
        TOKEN_NORMALIZERS,
    )

    stops: frozenset[str] = frozenset()
    if lang_dir is not None:
        p = os.path.join(lang_dir, "stopwords_ko.txt")
        if os.path.exists(p):
            stops = parse_stopwords_file(p, fmt="wordset")
    analyze = make_korean_fallback_analyzer(stops)

    def positions_of(text: str | None) -> dict[str, list[int]]:
        m: dict[str, list[int]] = {}
        for i, tok in enumerate(analyze(text)):
            m.setdefault(tok, []).append(i)
        return m

    QUERY_ANALYZERS[name] = analyze
    POSITION_ANALYZERS[name] = positions_of
    TOKEN_NORMALIZERS[name] = analyze
    HIGHLIGHT_TOKEN_PATTERNS[name] = (
        r"[가-힣ㄱ-ㆎᄀ-ᇿ]{1,2}"
        r"|[㐀-䶿一-鿿豈-﫿]{1,2}"
        r"|[^\W_가-힣ㄱ-ㆎᄀ-ᇿ㐀-䶿一-鿿豈-﫿]+"
    )


def register_reference_configset(lang_dir: str) -> list[str]:
    """One call registers EVERY analysis fieldType the reference schema
    declares against a configset ``lang/`` dir: the 29 space-delimited
    stopword languages, the 3 segmenter-language fallbacks (ja/th/ko), the
    schema's own ``text_cjk``, and the minor types (``text_ws``,
    ``lowercase``, ``phonetic_en``, ``text_general_rev``). Built-ins
    (text_general/text_en/WDG chains) are already registered at import.
    Returns the chain names registered by THIS call -- after it, every
    fieldType in managed-schema.xml resolves as a ``BuildConfig.analyzer``.
    """
    from .analysis import QUERY_ANALYZERS
    from .field_types import (
        register_lowercase_chain,
        register_text_general_rev_chain,
        register_text_ws_chain,
    )
    from .phonetic import register_phonetic_en_chain

    out = register_language_chains(lang_dir)
    extras = {
        "text_cjk": register_cjk_bigram_chain,
        "text_ja": lambda: register_japanese_fallback_chain(lang_dir),
        "text_th": lambda: register_thai_fallback_chain(lang_dir),
        "text_ko": lambda: register_korean_fallback_chain(lang_dir),
        "text_ws": register_text_ws_chain,
        "lowercase": register_lowercase_chain,
        "phonetic_en": register_phonetic_en_chain,
        "text_general_rev": register_text_general_rev_chain,
    }
    for name, fn in extras.items():
        if name not in QUERY_ANALYZERS:
            fn()
            out.append(name)
    return out


def register_language_chains(
    lang_dir: str,
    languages: list[str] | None = None,
    prefix: str = "text_",
    overwrite: bool = False,
) -> list[str]:
    """Register ``text_XX`` for every ``stopwords_XX.txt`` in a configset
    ``lang/`` directory (the reference ships 31); ``contractions_XX.txt``
    particles merge into the stop set (see module docstring for the
    elision mechanism). Returns the registered chain names; each is then
    usable as ``BuildConfig(analyzer="text_fr")`` etc.

    A name that is already registered is SKIPPED unless ``overwrite=True``:
    the schema's ``text_en`` is the stop+Porter chain, and a configset dir
    containing ``stopwords_en.txt`` must not silently downgrade it to
    stop-only."""
    from .analysis import QUERY_ANALYZERS

    registered = []
    for fname in sorted(os.listdir(lang_dir)):
        m = re.fullmatch(r"stopwords_([a-z]{2})\.txt", fname)
        if not m:
            continue
        code = m.group(1)
        if code in UNSEGMENTED:
            continue  # see UNSEGMENTED: regex tokenization would be wrong
        if languages is not None and code not in languages:
            continue
        if not overwrite and (prefix + code) in QUERY_ANALYZERS:
            continue
        stops = set(parse_stopwords_file(os.path.join(lang_dir, fname)))
        contr = os.path.join(lang_dir, f"contractions_{code}.txt")
        if os.path.exists(contr):
            stops.update(parse_wordlist_file(contr))
        if code in TOKEN_TRANSFORMS:
            # the chain stops AFTER the token transform (text_fa's schema
            # order) — compare normalized tokens against a normalized set
            stops = {TOKEN_TRANSFORMS[code](w) for w in stops}
        register_analysis_chain(
            prefix + code,
            stop_set=stops,
            stem_fn=STEMMERS.get(code),
            token_transform=TOKEN_TRANSFORMS.get(code),
            post_stop_transform=POST_STOP_TRANSFORMS.get(code),
            token_re=_UNI_RE,
            highlight_pattern=UNICODE_TOKEN_PATTERN,
        )
        registered.append(prefix + code)
    return registered
