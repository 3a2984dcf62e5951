"""Porter stemmer — the algorithm behind the reference's PorterStemFilter
(analysis/common/.../en/PorterStemFilter.java wrapping PorterStemmer.java,
itself Martin Porter's 1980 algorithm, public knowledge). Implemented from
the published algorithm definition; golden-tested against the canonical
vocabulary examples.

Also EnglishPossessiveFilter semantics (en/EnglishPossessiveFilter.java):
strip a trailing ``'s`` / ``’s`` (already-lowercased input).
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """Number of VC sequences in [C](VC){m}[V]."""
    m = 0
    i = 0
    n = len(w)
    while i < n and _is_cons(w, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(w, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(w, i):
            i += 1
    return m


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def porter_stem(w: str) -> str:
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
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
                w += "e"
            elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
        ("logi", "log"),
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 4
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue
            if _measure(stem) > 1:
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def strip_possessive(w: str) -> str:
    """EnglishPossessiveFilter: drop trailing 's / ’s."""
    if len(w) >= 2 and w[-1] == "s" and w[-2] in ("'", "’", "＇"):
        return w[:-2]
    return w


# Latin letters with NO NFKD decomposition that the reference's switch maps
# explicitly (analysis/miscellaneous/ASCIIFoldingFilter.java) — standard
# Unicode romanizations, stroked/crossed/hooked letters and ligatures, plus
# common punctuation folds. NFKD + mark-stripping covers everything else.
_FOLD_MAP = str.maketrans({
    "Æ": "AE", "æ": "ae", "Œ": "OE", "œ": "oe", "ß": "ss", "ẞ": "SS",
    "Ð": "D", "ð": "d", "Þ": "TH", "þ": "th", "Đ": "D", "đ": "d",
    "Ø": "O", "ø": "o", "Ł": "L", "ł": "l", "Ħ": "H", "ħ": "h",
    "Ŋ": "NG", "ŋ": "ng", "Ŧ": "T", "ŧ": "t", "ĸ": "q",
    "Ɓ": "B", "ɓ": "b", "Ƃ": "B", "ƃ": "b", "Ƈ": "C", "ƈ": "c",
    "Ɗ": "D", "ɗ": "d", "Ƌ": "D", "ƌ": "d", "Ɛ": "E", "ɛ": "e",
    "Ƒ": "F", "ƒ": "f", "Ɠ": "G", "ɠ": "g", "ǥ": "g", "Ǥ": "G",
    "Ɨ": "I", "ɨ": "i", "Ƙ": "K", "ƙ": "k", "Ɯ": "M", "ɯ": "m",
    "Ɲ": "N", "ɲ": "n", "Ɔ": "O", "ɔ": "o", "Ƥ": "P", "ƥ": "p",
    "Ʀ": "R", "ʀ": "r", "Ƭ": "T", "ƭ": "t", "Ʈ": "T", "ʈ": "t",
    "Ʊ": "U", "ʊ": "u", "Ʋ": "V", "ʋ": "v", "Ƴ": "Y", "ƴ": "y",
    "Ƶ": "Z", "ƶ": "z", "Ʒ": "ZH", "ʒ": "zh", "ǝ": "e", "Ə": "E", "ə": "e",
    "ƚ": "l", "Ƚ": "L", "ȴ": "l", "ȵ": "n", "ȶ": "t", "ȿ": "s", "ɀ": "z",
    "Ȥ": "Z", "ȥ": "z", "Ƿ": "W", "ƿ": "w", "Ȝ": "G", "ȝ": "g",
    "ſ": "s", "ƛ": "l", "ƍ": "d",
    # quotes / dashes the reference folds to ASCII
    "‘": "'", "’": "'", "‚": "'", "‛": "'", "“": '"', "”": '"', "„": '"',
    "‟": '"', "«": '"', "»": '"', "‐": "-", "‑": "-", "‒": "-", "–": "-",
    "—": "-", "―": "-", "⁄": "/",
})


def ascii_fold(w: str) -> str:
    """ASCIIFoldingFilter fold (analysis/miscellaneous/ASCIIFoldingFilter
    .java): NFKD-decompose and drop combining marks, plus the explicit table
    above for Latin letters NFKD cannot decompose (Æ→AE, ß→ss, Ø→O, Þ→TH,
    stroked/hooked letters, typographic quotes/dashes)."""
    import unicodedata

    if w.isascii():
        return w
    folded = "".join(
        c for c in unicodedata.normalize("NFKD", w) if not unicodedata.combining(c)
    )
    return folded.translate(_FOLD_MAP)


# ------------------------------------------------- German (UniNE light)


def german_normalize(w: str) -> str:
    """GermanNormalizationFilter (de/GermanNormalizationFilter.java:47-105),
    the German2-snowball heuristic: ß→ss, ä/ö/ü→a/o/u, and an 'e' is
    deleted when it follows a letter in the umlaut FSM state (so 'ae', 'oe'
    fold to 'a', 'o', and 'ue' folds to 'u' unless it follows a vowel or
    q — 3-state FSM port, character for character)."""
    N, V, U = 0, 1, 2
    state = N
    out = []
    for c in w:
        if c in ("a", "o"):
            out.append(c)
            state = U
        elif c == "u":
            out.append(c)
            state = U if state == N else V
        elif c == "e":
            if state == U:
                state = V
                continue  # e-deletion (the i-- re-scan is a no-op here)
            out.append(c)
            state = V
        elif c in ("i", "q", "y"):
            out.append(c)
            state = V
        elif c == "ä":
            out.append("a")
            state = V
        elif c == "ö":
            out.append("o")
            state = V
        elif c == "ü":
            out.append("u")
            state = V
        elif c == "ß":
            out.append("ss")
            state = N
        else:
            out.append(c)
            state = N
    return "".join(out)


def _de_st_ending(c: str) -> bool:
    return c in "bdfghklmnt"


def german_light_stem(w: str) -> str:
    """GermanLightStemmer (de/GermanLightStemmer.java:63-135): Savoy's UniNE
    light stemmer — accent fold, then two suffix-strip steps."""
    s = list(w)
    for i, c in enumerate(s):
        if c in "äàáâ":
            s[i] = "a"
        elif c in "öòóô":
            s[i] = "o"
        elif c in "ïìíî":
            s[i] = "i"
        elif c in "üùúû":
            s[i] = "u"
    L = len(s)
    # step 1
    if L > 5 and s[L - 3] == "e" and s[L - 2] == "r" and s[L - 1] == "n":
        L -= 3
    elif L > 4 and s[L - 2] == "e" and s[L - 1] in "mnrs":
        L -= 2
    elif L > 3 and s[L - 1] == "e":
        L -= 1
    elif L > 3 and s[L - 1] == "s" and _de_st_ending(s[L - 2]):
        L -= 1
    # step 2
    if L > 5 and s[L - 3] == "e" and s[L - 2] == "s" and s[L - 1] == "t":
        L -= 3
    elif L > 4 and s[L - 2] == "e" and s[L - 1] in "rn":
        L -= 2
    elif L > 4 and s[L - 2] == "s" and s[L - 1] == "t" and _de_st_ending(s[L - 3]):
        L -= 2
    return "".join(s[:L])


# ------------------------------------------------- French (UniNE light)

FRENCH_ARTICLES = frozenset(
    ["l", "m", "t", "qu", "n", "s", "j", "d", "c",
     "jusqu", "quoiqu", "lorsqu", "puisqu"])


def french_elide(w: str) -> str:
    """ElisionFilter (util/ElisionFilter.java:48-70) with FrenchAnalyzer's
    DEFAULT_ARTICLES (fr/FrenchAnalyzer.java:56-62): if the text before the
    FIRST apostrophe (' or ’) is an article, strip it and the apostrophe."""
    for i, c in enumerate(w):
        if c in ("'", "’"):
            if w[:i] in FRENCH_ARTICLES:
                return w[i + 1:]
            return w
    return w


def _ew(s: list, L: int, suf: str) -> bool:
    return L >= len(suf) and s[L - len(suf):L] == list(suf)


def _fr_norm(s: list, L: int) -> str:
    """FrenchLightStemmer.norm (fr/FrenchLightStemmer.java:212-258)."""
    s = s[:L]
    L = len(s)
    if L > 4:
        for i in range(L):
            c = s[i]
            if c in "àáâ":
                s[i] = "a"
            elif c == "ô":
                s[i] = "o"
            elif c in "èéê":
                s[i] = "e"
            elif c in "ùû":
                s[i] = "u"
            elif c == "î":
                s[i] = "i"
            elif c == "ç":
                s[i] = "c"
        ch = s[0]
        i = 1
        while i < L:
            if s[i] == ch and s[i].isalpha():
                del s[i]
                L -= 1
            else:
                ch = s[i]
                i += 1
    if L > 4 and _ew(s, L, "ie"):
        L -= 2
    if L > 4:
        if s[L - 1] == "r":
            L -= 1
        if s[L - 1] == "e":
            L -= 1
        if s[L - 1] == "e":
            L -= 1
        if s[L - 1] == s[L - 2] and s[L - 1].isalpha():
            L -= 1
    return "".join(s[:L])


def french_light_stem(w: str) -> str:
    """FrenchLightStemmer (fr/FrenchLightStemmer.java:55-210): Savoy's UniNE
    light stemmer, branch-for-branch."""
    s = list(w)
    L = len(s)
    if L > 5 and s[L - 1] == "x":
        if s[L - 3] == "a" and s[L - 2] == "u" and s[L - 4] != "e":
            s[L - 2] = "l"
        L -= 1
    if L > 3 and s[L - 1] == "x":
        L -= 1
    if L > 3 and s[L - 1] == "s":
        L -= 1
    if L > 9 and _ew(s, L, "issement"):
        L -= 6
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 8 and _ew(s, L, "issant"):
        L -= 4
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 6 and _ew(s, L, "ement"):
        L -= 4
        if L > 3 and _ew(s, L, "ive"):
            L -= 1
            s[L - 1] = "f"
        return _fr_norm(s, L)
    if L > 11 and _ew(s, L, "ficatrice"):
        L -= 5
        s[L - 2] = "e"
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 10 and _ew(s, L, "ficateur"):
        L -= 4
        s[L - 2] = "e"
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 9 and _ew(s, L, "catrice"):
        L -= 3
        s[L - 4] = "q"
        s[L - 3] = "u"
        s[L - 2] = "e"
        return _fr_norm(s, L)
    if L > 8 and _ew(s, L, "cateur"):
        L -= 2
        s[L - 4] = "q"
        s[L - 3] = "u"
        s[L - 2] = "e"
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 8 and _ew(s, L, "atrice"):
        L -= 4
        s[L - 2] = "e"
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 7 and _ew(s, L, "ateur"):
        L -= 3
        s[L - 2] = "e"
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 6 and _ew(s, L, "trice"):
        L -= 1
        s[L - 3] = "e"
        s[L - 2] = "u"
        s[L - 1] = "r"
    if L > 5 and _ew(s, L, "ième"):
        return _fr_norm(s, L - 4)
    if L > 7 and _ew(s, L, "teuse"):
        L -= 2
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 6 and _ew(s, L, "teur"):
        L -= 1
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 5 and _ew(s, L, "euse"):
        return _fr_norm(s, L - 2)
    if L > 8 and _ew(s, L, "ère"):
        L -= 1
        s[L - 2] = "e"
        return _fr_norm(s, L)
    if L > 7 and _ew(s, L, "ive"):
        L -= 1
        s[L - 1] = "f"
        return _fr_norm(s, L)
    if L > 4 and (_ew(s, L, "folle") or _ew(s, L, "molle")):
        L -= 2
        s[L - 1] = "u"
        return _fr_norm(s, L)
    if L > 9 and _ew(s, L, "nnelle"):
        return _fr_norm(s, L - 5)
    if L > 9 and _ew(s, L, "nnel"):
        return _fr_norm(s, L - 3)
    if L > 4 and _ew(s, L, "ète"):
        L -= 1
        s[L - 2] = "e"
    if L > 8 and _ew(s, L, "ique"):
        L -= 4
    if L > 8 and _ew(s, L, "esse"):
        return _fr_norm(s, L - 3)
    if L > 7 and _ew(s, L, "inage"):
        return _fr_norm(s, L - 3)
    if L > 9 and _ew(s, L, "isation"):
        L -= 7
        if L > 5 and _ew(s, L, "ual"):
            s[L - 2] = "e"
        return _fr_norm(s, L)
    if L > 9 and _ew(s, L, "isateur"):
        return _fr_norm(s, L - 7)
    if L > 8 and _ew(s, L, "ation"):
        return _fr_norm(s, L - 5)
    if L > 8 and _ew(s, L, "ition"):
        return _fr_norm(s, L - 5)
    return _fr_norm(s, L)


# ------------------------------------------------- Spanish (UniNE light)

_ES_ACCENTS = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def spanish_light_stem(w: str) -> str:
    """SpanishLightStemmer (es/SpanishLightStemmer.java:63-111): Savoy's
    CLEF-2001 light stemmer. Words under 5 chars pass through UNTOUCHED
    (accents included); otherwise accents fold to bare vowels, then one
    final-vowel / plural suffix strip."""
    if len(w) < 5:
        return w
    s = w.translate(_ES_ACCENTS)
    last = s[-1]
    if last in "oae":
        return s[:-1]
    if last == "s":
        if s[-2] == "e" and s[-3] == "s" and s[-4] == "e":
            return s[:-2]
        if s[-2] == "e" and s[-3] == "c":
            return s[:-3] + "z"
        if s[-2] in "oae":
            return s[:-2]
    return s


# ------------------------------------------------- Italian (UniNE light)

ITALIAN_ARTICLES = frozenset(
    ["c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
     "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s",
     "v", "d"])


def elide(w: str, articles: frozenset) -> str:
    """ElisionFilter (util/ElisionFilter.java:48-70) for an arbitrary
    article set: if the text before the FIRST apostrophe (' or ’) is an
    article, strip it and the apostrophe."""
    for i, c in enumerate(w):
        if c in ("'", "’"):
            if w[:i] in articles:
                return w[i + 1:]
            return w
    return w


def italian_elide(w: str) -> str:
    """ElisionFilter with ItalianAnalyzer's DEFAULT_ARTICLES
    (it/ItalianAnalyzer.java:48-54)."""
    return elide(w, ITALIAN_ARTICLES)


def italian_light_stem(w: str) -> str:
    """ItalianLightStemmer (it/ItalianLightStemmer.java:61-116): Savoy's
    CLEF-2001 light stemmer. Words under 6 chars pass through untouched;
    otherwise accents fold, then the final vowel strips (two chars when
    preceded by i/h per the published plural rules)."""
    if len(w) < 6:
        return w
    s = w.translate(_ES_ACCENTS)
    last, prev = s[-1], s[-2]
    if last == "e":
        return s[:-2] if prev in ("i", "h") else s[:-1]
    if last == "i":
        return s[:-2] if prev in ("h", "i") else s[:-1]
    if last == "a":
        return s[:-2] if prev == "i" else s[:-1]
    if last == "o":
        return s[:-2] if prev == "i" else s[:-1]
    return s


# ------------------------------------------------- Portuguese (UniNE light)

_PT_ACCENTS = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaoooooeeeeuuuuiiiic")


def _pt_remove_suffix(s: list, L: int) -> int:
    """PortugueseLightStemmer.removeSuffix (pt/PortugueseLightStemmer.java:
    139-170): plural / adverb suffix normalization, accent-aware (runs
    BEFORE the final accent fold, so 'óis'/'ões'/'ães' match literally)."""
    if L > 4 and _ew(s, L, "es") and s[L - 3] in ("r", "s", "l", "z"):
        return L - 2
    if L > 3 and _ew(s, L, "ns"):
        s[L - 2] = "m"
        return L - 1
    if L > 4 and (_ew(s, L, "eis") or _ew(s, L, "éis")):
        s[L - 3] = "e"
        s[L - 2] = "l"
        return L - 1
    if L > 4 and _ew(s, L, "ais"):
        s[L - 2] = "l"
        return L - 1
    if L > 4 and _ew(s, L, "óis"):
        s[L - 3] = "o"
        s[L - 2] = "l"
        return L - 1
    if L > 4 and _ew(s, L, "is"):
        s[L - 1] = "l"
        return L
    if L > 3 and (_ew(s, L, "ões") or _ew(s, L, "ães")):
        L -= 1
        s[L - 2] = "ã"
        s[L - 1] = "o"
        return L
    if L > 6 and _ew(s, L, "mente"):
        return L - 5
    if L > 3 and s[L - 1] == "s":
        return L - 1
    return L


def _pt_norm_feminine(s: list, L: int) -> int:
    """PortugueseLightStemmer.normFeminine (pt/PortugueseLightStemmer.java:
    172-210): feminine → masculine base form."""
    if L > 7 and (_ew(s, L, "inha") or _ew(s, L, "iaca") or _ew(s, L, "eira")):
        s[L - 1] = "o"
        return L
    if L > 6:
        if (_ew(s, L, "osa") or _ew(s, L, "ica") or _ew(s, L, "ida")
                or _ew(s, L, "ada") or _ew(s, L, "iva") or _ew(s, L, "ama")):
            s[L - 1] = "o"
            return L
        if _ew(s, L, "ona"):
            s[L - 3] = "ã"
            s[L - 2] = "o"
            return L - 1
        if _ew(s, L, "ora"):
            return L - 1
        if _ew(s, L, "esa"):
            s[L - 3] = "ê"
            return L - 1
        if _ew(s, L, "na"):
            s[L - 1] = "o"
            return L
    return L


def portuguese_light_stem(w: str) -> str:
    """PortugueseLightStemmer (pt/PortugueseLightStemmer.java:63-137): Savoy's
    UniNE light stemmer — suffix removal, feminine normalization, final-vowel
    strip, THEN the accent fold (order matters: suffix rules match accented
    forms and normFeminine writes ã/ê back before the fold)."""
    if len(w) < 4:
        return w
    s = list(w)
    L = _pt_remove_suffix(s, len(s))
    if L > 3 and s[L - 1] == "a":
        L = _pt_norm_feminine(s, L)
    if L > 4 and s[L - 1] in ("e", "a", "o"):
        L -= 1
    return "".join(s[:L]).translate(_PT_ACCENTS)


# ------------------------------------------------- Russian (Dolamic-Savoy light)

_RU_SUF4 = ("иями", "оями")
_RU_SUF3 = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
            "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_SUF2 = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
            "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
            "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")


def russian_light_stem(w: str) -> str:
    """RussianLightStemmer (ru/RussianLightStemmer.java:61-160): Dolamic &
    Savoy's light stemmer — case-suffix removal + normalization. This is the
    RussianLightStemFilter chain; the default RussianAnalyzer uses the
    snowball stemmer instead (documented divergence)."""
    s = w
    L = len(s)
    # removeCase
    if L > 6 and s.endswith(_RU_SUF4):
        L -= 4
    elif L > 5 and s[:L].endswith(_RU_SUF3):
        L -= 3
    elif L > 4 and s[:L].endswith(_RU_SUF2):
        L -= 2
    elif L > 3 and s[L - 1] in "аеиоуйыяь":
        L -= 1
    # normalize
    if L > 3:
        c = s[L - 1]
        if c in ("ь", "и"):
            L -= 1
        elif c == "н" and s[L - 2] == "н":
            L -= 1
    return s[:L]


# ------------------------------------------------- Swedish (Savoy CLEF-2003)


def swedish_light_stem(w: str) -> str:
    """SwedishLightStemmer (sv/SwedishLightStemmer.java:63-101): Savoy's
    CLEF-2003 light stemmer (the SwedishLightStemFilter chain; the default
    SwedishAnalyzer uses snowball — documented divergence)."""
    s = w
    L = len(s)
    if L > 4 and s[L - 1] == "s":
        L -= 1
    t = s[:L]
    if L > 7 and (t.endswith("elser") or t.endswith("heten")):
        return s[:L - 5]
    if L > 6 and t.endswith(("arne", "erna", "ande", "else", "aste", "orna",
                             "aren")):
        return s[:L - 4]
    if L > 5 and t.endswith(("are", "ast", "het")):
        return s[:L - 3]
    if L > 4 and t.endswith(("ar", "er", "or", "en", "at", "te", "et")):
        return s[:L - 2]
    if L > 3 and s[L - 1] in "taen":
        return s[:L - 1]
    return s[:L]


# ------------------------------------------------- Finnish (Savoy CLEF-2003)

_FI_VOWELS = frozenset("aeiouy")


def _fi_step1(s: list, L: int) -> int:
    if L > 8:
        if _ew(s, L, "kin"):
            return _fi_step1(s, L - 3)
        if _ew(s, L, "ko"):
            return _fi_step1(s, L - 2)
    if L > 11:
        if _ew(s, L, "dellinen"):
            return L - 8
        if _ew(s, L, "dellisuus"):
            return L - 9
    return L


def _fi_step2(s: list, L: int) -> int:
    if L > 5:
        if _ew(s, L, "lla") or _ew(s, L, "tse") or _ew(s, L, "sti"):
            return L - 3
        if _ew(s, L, "ni"):
            return L - 2
        if _ew(s, L, "aa"):
            return L - 1
    return L


def _fi_step3(s: list, L: int) -> int:
    if L > 8:
        if _ew(s, L, "nnen"):
            s[L - 4] = "s"
            return L - 3
        if _ew(s, L, "ntena"):
            s[L - 5] = "s"
            return L - 4
        if _ew(s, L, "tten"):
            return L - 4
        if _ew(s, L, "eiden"):
            return L - 5
    if L > 6:
        if (_ew(s, L, "neen") or _ew(s, L, "niin") or _ew(s, L, "seen")
                or _ew(s, L, "teen") or _ew(s, L, "inen")):
            return L - 4
        if s[L - 3] == "h" and s[L - 2] in _FI_VOWELS and s[L - 1] == "n":
            return L - 3
        if _ew(s, L, "den"):
            s[L - 3] = "s"
            return L - 2
        if _ew(s, L, "ksen"):
            s[L - 4] = "s"
            return L - 3
        if (_ew(s, L, "ssa") or _ew(s, L, "sta") or _ew(s, L, "lla")
                or _ew(s, L, "lta") or _ew(s, L, "tta") or _ew(s, L, "ksi")
                or _ew(s, L, "lle")):
            return L - 3
    if L > 5:
        if _ew(s, L, "na") or _ew(s, L, "ne"):
            return L - 2
        if _ew(s, L, "nei"):
            return L - 3
    if L > 4:
        if _ew(s, L, "ja") or _ew(s, L, "ta"):
            return L - 2
        if s[L - 1] == "a":
            return L - 1
        if s[L - 1] == "n" and s[L - 2] in _FI_VOWELS:
            return L - 2
        if s[L - 1] == "n":
            return L - 1
    return L


def _fi_norm1(s: list, L: int) -> int:
    if L > 5 and _ew(s, L, "hde"):
        s[L - 3] = "k"
        s[L - 2] = "s"
        s[L - 1] = "i"
    if L > 4 and (_ew(s, L, "ei") or _ew(s, L, "at")):
        return L - 2
    if L > 3 and s[L - 1] in "tsjeai":
        return L - 1
    return L


def _fi_norm2(s: list, L: int) -> int:
    if L > 8 and s[L - 1] in "eou":
        L -= 1
    if L > 4:
        if s[L - 1] == "i":
            L -= 1
        if L > 4:
            ch = s[0]
            i = 1
            while i < L:
                if s[i] == ch and ch in ("k", "p", "t"):
                    del s[i]
                    L -= 1
                else:
                    ch = s[i]
                    i += 1
    return L


def finnish_light_stem(w: str) -> str:
    """FinnishLightStemmer (fi/FinnishLightStemmer.java:63-240): Savoy's
    CLEF-2003 light stemmer (the FinnishLightStemFilter chain; the default
    FinnishAnalyzer uses snowball — documented divergence)."""
    if len(w) < 4:
        return w
    s = [("a" if c in "äå" else "o" if c == "ö" else c) for c in w]
    L = len(s)
    L = _fi_step1(s, L)
    L = _fi_step2(s, L)
    L = _fi_step3(s, L)
    L = _fi_norm1(s, L)
    L = _fi_norm2(s, L)
    return "".join(s[:L])


# ------------------------------------------------- Hungarian (UniNE light)

_HU_ACCENTS = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")


def _hu_remove_case(s: str, L: int) -> int:
    t = s[:L]
    if L > 6 and t.endswith("kent"):
        return L - 4
    if L > 5:
        if t.endswith(("nak", "nek", "val", "vel", "ert", "rol", "ban",
                       "ben", "bol", "nal", "nel", "hoz", "hez", "tol")):
            return L - 3
        if t.endswith(("al", "el")):
            if s[L - 3] not in _FI_VOWELS and s[L - 3] == s[L - 4]:
                return L - 3
    if L > 4:
        if t.endswith(("at", "et", "ot", "va", "ve", "ra", "re", "ba", "be",
                       "ul", "ig")):
            return L - 2
        if t.endswith(("on", "en")) and s[L - 3] not in _FI_VOWELS:
            return L - 2
        c = s[L - 1]
        if c in ("t", "n"):
            return L - 1
        if c in ("a", "e") and s[L - 2] == s[L - 3] and s[L - 2] not in _FI_VOWELS:
            return L - 2
    return L


def _hu_remove_possessive(s: str, L: int) -> int:
    t = s[:L]
    if L > 6:
        if s[L - 5] not in _FI_VOWELS and t.endswith(("atok", "otok", "etek")):
            return L - 4
        if t.endswith(("itek", "itok")):
            return L - 4
    if L > 5:
        if s[L - 4] not in _FI_VOWELS and t.endswith(("unk", "tok", "tek")):
            return L - 3
        if s[L - 4] in _FI_VOWELS and t.endswith("juk"):
            return L - 3
        if t.endswith("ink"):
            return L - 3
    if L > 4:
        if s[L - 3] not in _FI_VOWELS and t.endswith(
                ("am", "em", "om", "ad", "ed", "od", "uk")):
            return L - 2
        if s[L - 3] in _FI_VOWELS and t.endswith(("nk", "ja", "je")):
            return L - 2
        if t.endswith(("im", "id", "ik")):
            return L - 2
    if L > 3:
        c = s[L - 1]
        if c in ("a", "e"):
            if s[L - 2] not in _FI_VOWELS:
                return L - 1
        elif c in ("m", "d"):
            if s[L - 2] in _FI_VOWELS:
                return L - 1
        elif c == "i":
            return L - 1
    return L


def hungarian_light_stem(w: str) -> str:
    """HungarianLightStemmer (hu/HungarianLightStemmer.java:61-228): Savoy's
    UniNE light stemmer (the HungarianLightStemFilter chain; the default
    HungarianAnalyzer uses snowball — documented divergence)."""
    s = w.translate(_HU_ACCENTS)
    L = len(s)
    L = _hu_remove_case(s, L)
    L = _hu_remove_possessive(s, L)
    # removePlural (intentional fallthrough: -2 only when vowel+k and L>4)
    if L > 3 and s[L - 1] == "k":
        if s[L - 2] in "aoe" and L > 4:
            L -= 2
        else:
            L -= 1
    # normalize
    if L > 3 and s[L - 1] in "aeio":
        L -= 1
    return s[:L]


# ------------------------------------------------- Arabic (Larkey-Savoy light)

# ArabicNormalizer (ar/ArabicNormalizer.java:36-99): hamza forms → bare
# alef, dotless yeh → yeh, teh marbuta → heh; tatweel + harakat deleted.
_AR_MAP = str.maketrans("آأإىة", "ااايه")
_AR_DEL = dict.fromkeys(map(ord, "ـًٌٍَُِّْ"))


def arabic_normalize(w: str) -> str:
    """ArabicNormalizer (ar/ArabicNormalizer.java:66-99)."""
    return w.translate(_AR_MAP).translate(_AR_DEL)


_AR_PREFIXES = ("ال", "وال", "بال",
                "كال", "فال", "لل",
                "و")
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")


def arabic_stem(w: str) -> str:
    """ArabicStemmer (ar/ArabicStemmer.java:76-156): light stemming — ONE
    definite-article/waw prefix (wa- needs ≥3 chars left, others ≥2), then
    every matching suffix in table order (each needs ≥2 chars left)."""
    for p in _AR_PREFIXES:
        if w.startswith(p):
            if len(p) == 1 and len(w) < 4:
                continue
            if len(w) < len(p) + 2:
                continue
            w = w[len(p):]
            break
    for suf in _AR_SUFFIXES:
        if w.endswith(suf) and len(w) >= len(suf) + 2:
            w = w[:-len(suf)]
    return w


# ------------------------------------------------- Persian (normalization only)

_FA_MAP = str.maketrans({"ی": "ي",   # farsi yeh → yeh
                         "ے": "ي",   # yeh barree → yeh
                         "ک": "ك",   # keheh → kaf
                         "ۀ": "ه",   # heh+yeh → heh
                         "ہ": "ه",   # heh goal → heh
                         "ٔ": None})      # hamza above deleted


def persian_normalize(w: str) -> str:
    """PersianNormalizer (fa/PersianNormalizer.java:59-86): farsi yeh / yeh
    barree → yeh, keheh → kaf, heh-yeh / heh-goal → heh, hamza-above
    removed. The PersianAnalyzer chain applies ArabicNormalizer first."""
    return w.translate(_FA_MAP)


# ------------------------------------------------- Sorani Kurdish (ckb)

_CKB_MAP = str.maketrans({"ي": "ی", "ى": "ی",  # yeh forms → farsi yeh
                          "ك": "ک",                       # kaf → keheh
                          "ة": "ە",                       # teh marbuta → ae
                          "ڒ": "ڕ"})                      # reh above → rreh
_CKB_DEL = frozenset("ـًٌٍَُِّْ")


def sorani_normalize(w: str) -> str:
    """SoraniNormalizer (ckb/SoraniNormalizer.java:59-118): yeh/kaf/teh-
    marbuta folding plus the position-dependent rules — ZWNJ deletion turns
    a preceding heh into ae, final heh becomes ae, initial reh becomes
    rreh, tatweel/harakat delete."""
    import unicodedata

    t = w.translate(_CKB_MAP)
    out: list[str] = []
    for i, c in enumerate(t):
        if c == "‌":  # ZWNJ
            if out and out[-1] == "ه":
                out[-1] = "ە"
            continue
        if c in _CKB_DEL:
            continue
        if c == "ر" and not out:  # initial reh → rreh
            c = "ڕ"
        elif c == "ه" and i == len(t) - 1:
            # heh → ae only when LAST of the input at visit time — a heh
            # exposed as final by a LATER deletion stays heh (the Java loop
            # checks i == len-1 before later chars are processed)
            c = "ە"
        elif c == "ھ":
            # heh doachashmee → plain heh (its OWN switch branch in the
            # reference, so the final-heh→ae rule never applies to it; a
            # following ZWNJ then sees a heh and turns it into ae)
            c = "ه"
        elif not c.isascii() and unicodedata.category(c) == "Cf":
            continue  # FORMAT chars (bidi controls etc.) delete
        out.append(c)
    return "".join(out)


def sorani_stem(w: str) -> str:
    """SoraniStemmer (ckb/SoraniStemmer.java:40-120): possessive-pronoun
    strip, then ONE suffix from the ordered else-chain (indefinite/definite
    singular+plural, ezafe, demonstratives)."""
    s = w
    L = len(s)
    # postposition
    if L > 5 and s[:L].endswith("دا"):
        L -= 2
    elif L > 4 and s[:L].endswith("نا"):
        L -= 1
    elif L > 6 and s[:L].endswith("ەوە"):
        L -= 3
    # possessive pronoun (no else-chain with the rest)
    if L > 6 and s[:L].endswith(("مان", "یان", "تان")):
        L -= 3
    t = s[:L]
    if L > 6 and t.endswith("ێکی"):
        return s[:L - 3]
    if L > 7 and t.endswith("یەکی"):
        return s[:L - 4]
    if L > 5 and t.endswith("ێک"):
        return s[:L - 2]
    if L > 6 and t.endswith("یەک"):
        return s[:L - 3]
    if L > 6 and t.endswith("ەکە"):
        return s[:L - 3]
    if L > 5 and t.endswith("کە"):
        return s[:L - 2]
    if L > 7 and t.endswith("ەکان"):
        return s[:L - 4]
    if L > 6 and t.endswith("کان"):
        return s[:L - 3]
    if L > 7 and t.endswith("یانی"):
        return s[:L - 4]
    if L > 6 and t.endswith("انی"):
        return s[:L - 3]
    if L > 6 and t.endswith("یان"):
        return s[:L - 3]
    if L > 5 and t.endswith("ان"):
        return s[:L - 2]
    if L > 7 and t.endswith("یانە"):
        return s[:L - 4]
    if L > 6 and t.endswith("انە"):
        return s[:L - 3]
    if L > 5 and (t.endswith("ایە") or t.endswith("ەیە")):
        return s[:L - 2]
    if L > 4 and t.endswith("ە"):
        return s[:L - 1]
    if L > 4 and t.endswith("ی"):
        return s[:L - 1]
    return s[:L]


# ------------------------------------------------- Hindi (Devanagari)

# IndicNormalizer decomposition rows (in/IndicNormalizer.java:64-229)
# restricted per script flag — exact for each chain since the reference
# dispatches rules by the codepoint's script block. (ch0, ch1, ch2|-1,
# composed) relative to the script base; ch2 == 0xFF means ZWJ. Tables
# verified complete against the reference source programmatically.
_HI_DECOMP = (
    (0x05, 0x3E, 0x45, 0x11), (0x05, 0x3E, 0x46, 0x12),
    (0x05, 0x3E, 0x47, 0x13), (0x05, 0x3E, 0x48, 0x14),
    (0x05, 0x3E, -1, 0x06),
    (0x05, 0x45, -1, 0x72), (0x05, 0x46, -1, 0x04),
    (0x05, 0x49, -1, 0x11), (0x05, 0x4A, -1, 0x12),
    (0x05, 0x4B, -1, 0x13), (0x05, 0x4C, -1, 0x14),
    (0x06, 0x45, -1, 0x11), (0x06, 0x46, -1, 0x12),
    (0x06, 0x47, -1, 0x13), (0x06, 0x48, -1, 0x14),
    (0x09, 0x41, -1, 0x0A),
    (0x0F, 0x45, -1, 0x0D), (0x0F, 0x46, -1, 0x0E), (0x0F, 0x47, -1, 0x10),
    (0x15, 0x3C, -1, 0x58), (0x16, 0x3C, -1, 0x59), (0x17, 0x3C, -1, 0x5A),
    (0x1C, 0x3C, -1, 0x5B), (0x21, 0x3C, -1, 0x5C), (0x22, 0x3C, -1, 0x5D),
    (0x28, 0x3C, -1, 0x29), (0x2B, 0x3C, -1, 0x5E), (0x2F, 0x3C, -1, 0x5F),
    (0x30, 0x3C, -1, 0x31), (0x33, 0x3C, -1, 0x34),
    (0x3E, 0x45, -1, 0x49), (0x3E, 0x46, -1, 0x4A),
    (0x3E, 0x47, -1, 0x4B), (0x3E, 0x48, -1, 0x4C),
)
_HI_DECOMP_FIRST = frozenset(r[0] for r in _HI_DECOMP)


def _indic_normalize(w: str, base: int, table, first) -> str:
    """IndicNormalizer (in/IndicNormalizer.java:236-290) scan/compose loop,
    parameterized by script base and rule table."""
    hi = base + 0x7F
    s = list(w)
    i = 0
    while i < len(s):
        cp = ord(s[i])
        if base <= cp <= hi and (cp - base) in first:
            ch0 = cp - base
            if i + 1 < len(s):
                c1 = ord(s[i + 1])
                if base <= c1 <= hi:
                    ch1 = c1 - base
                    ch2 = -1
                    if i + 2 < len(s):
                        c2 = ord(s[i + 2])
                        if c2 == 0x200D:  # ZWJ
                            ch2 = 0xFF
                        elif base <= c2 <= hi:
                            ch2 = c2 - base
                    for a, b, c, comp in table:
                        if a == ch0 and b == ch1 and (c < 0 or c == ch2):
                            s[i] = chr(base + comp)
                            del s[i + 1]
                            if c >= 0:
                                del s[i + 1]
                            break
        i += 1
    return "".join(s)


def indic_normalize(w: str) -> str:
    """Devanagari-script IndicNormalizer rules (the Hindi chain)."""
    return _indic_normalize(w, 0x0900, _HI_DECOMP, _HI_DECOMP_FIRST)


_HI_MAP = str.maketrans({
    "ँ": "ं",                       # candrabindu → bindu
    "ऩ": "न", "ऱ": "र",   # nukta-composed consonants
    "ऴ": "ळ", "क़": "क", "ख़": "ख",
    "ग़": "ग", "ज़": "ज", "ड़": "ड",
    "ढ़": "ढ", "फ़": "फ", "य़": "य",
    "ॅ": "े", "ॆ": "े",   # chandra/short e forms
    "ॉ": "ो", "ॊ": "ो",
    "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ", "ॲ": "अ",
    "आ": "अ", "ई": "इ",   # long → short vowels
    "ऊ": "उ", "ॠ": "ऋ", "ॡ": "ऌ",
    "ऐ": "ए", "औ": "ओ",
    "ी": "ि", "ू": "ु",   # long → short dep. vowels
    "ॄ": "ृ", "ॣ": "ॢ",
    "ै": "े", "ौ": "ो",
})
_HI_DEL = frozenset("़‍‌्")


def hindi_normalize(w: str) -> str:
    """HindiNormalizer (hi/HindiNormalizer.java:40-177): dead n → bindu,
    per-char folds, nukta / ZWJ / ZWNJ / virama deletion."""
    out: list[str] = []
    n = len(w)
    i = 0
    while i < n:
        c = w[i]
        if c == "न" and i + 1 < n and w[i + 1] == "्":
            out.append("ं")  # dead n → bindu, virama consumed
            i += 2
            continue
        if c in _HI_DEL:
            i += 1
            continue
        out.append(c.translate(_HI_MAP))
        i += 1
    return "".join(out)


_HI_SUF5 = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
_HI_SUF4 = ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
            "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
            "ियों", "ियां")
_HI_SUF3 = ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
            "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
            "ुआं")
_HI_SUF2 = ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
            "ती", "ता", "ाँ", "ां", "ों", "ें")
_HI_SUF1 = ("ो", "े", "ू", "ु", "ी", "ि", "ा")


def hindi_stem(w: str) -> str:
    """HindiStemmer (hi/HindiStemmer.java:28-112): lightweight suffix strip
    (Ramanathan & Rao), longest class first with length guards."""
    L = len(w)
    if L > 6 and w.endswith(_HI_SUF5):
        return w[:-5]
    if L > 5 and w.endswith(_HI_SUF4):
        return w[:-4]
    if L > 4 and w.endswith(_HI_SUF3):
        return w[:-3]
    if L > 3 and w.endswith(_HI_SUF2):
        return w[:-2]
    if L > 2 and w.endswith(_HI_SUF1):
        return w[:-1]
    return w


# ------------------------------------------------- Bulgarian (light)


def _bg_remove_article(s: list, L: int) -> int:
    if L > 6 and _ew(s, L, "ият"):
        return L - 3
    if L > 5 and (_ew(s, L, "ът") or _ew(s, L, "то") or _ew(s, L, "те")
                  or _ew(s, L, "та") or _ew(s, L, "ия")):
        return L - 2
    if L > 4 and _ew(s, L, "ят"):
        return L - 2
    return L


def _bg_remove_plural(s: list, L: int) -> int:
    if L > 6:
        if _ew(s, L, "овци"):
            return L - 3
        if _ew(s, L, "ове"):
            return L - 3
        if _ew(s, L, "еве"):
            s[L - 3] = "й"
            return L - 2
    if L > 5:
        if _ew(s, L, "ища"):
            return L - 3
        if _ew(s, L, "та"):
            return L - 2
        if _ew(s, L, "ци"):
            s[L - 2] = "к"
            return L - 1
        if _ew(s, L, "зи"):
            s[L - 2] = "г"
            return L - 1
        if s[L - 3] == "е" and s[L - 1] == "и":
            s[L - 3] = "я"
            return L - 1
    if L > 4:
        if _ew(s, L, "си"):
            s[L - 2] = "х"
            return L - 1
        if _ew(s, L, "и"):
            return L - 1
    return L


def bulgarian_stem(w: str) -> str:
    """BulgarianStemmer (bg/BulgarianStemmer.java:30-136): the light
    stemmer from Nakov's BulStem (with the reference's ен→н fix) — article
    removal, plural normalization, final-vowel strips, ъN→N."""
    if len(w) < 4:
        return w
    s = list(w)
    L = len(s)
    if L > 5 and _ew(s, L, "ища"):
        return "".join(s[:L - 3])
    L = _bg_remove_article(s, L)
    L = _bg_remove_plural(s, L)
    if L > 3:
        if _ew(s, L, "я"):
            L -= 1
        if _ew(s, L, "а") or _ew(s, L, "о") or _ew(s, L, "е"):
            L -= 1
    if L > 4 and _ew(s, L, "ен"):
        s[L - 2] = "н"
        L -= 1
    if L > 5 and s[L - 2] == "ъ":
        s[L - 2] = s[L - 1]
        L -= 1
    return "".join(s[:L])


# ------------------------------------------------- Indonesian


def indonesian_stem(w: str, stem_derivational: bool = True) -> str:
    """IndonesianStemmer (id/IndonesianStemmer.java:40-268): Asian,
    Williams & Tahaghoghi's stemmer — inflectional particles/possessives,
    then first-order prefix / suffix / second-order prefix with rule-firing
    interplay and the REMOVED_* flag guards, ported branch-for-branch."""
    KE, PENG, DI, MENG, TER, BER, PE = 1, 2, 4, 8, 16, 32, 64
    state = {"flags": 0, "syll": sum(c in "aeiou" for c in w)}
    s = list(w)

    def ends(suffix):
        return "".join(s).endswith(suffix)

    def starts(prefix):
        return "".join(s).startswith(prefix)

    def remove_particle():
        if ends("kah") or ends("lah") or ends("pun"):
            state["syll"] -= 1
            del s[-3:]

    def remove_possessive():
        if ends("ku") or ends("mu"):
            state["syll"] -= 1
            del s[-2:]
        elif ends("nya"):
            state["syll"] -= 1
            del s[-3:]

    def first_order_prefix():
        t = "".join(s)
        if t.startswith("meng"):
            state["flags"] |= MENG; state["syll"] -= 1; del s[:4]; return True
        if t.startswith("meny") and len(t) > 4 and t[4] in "aeiou":
            state["flags"] |= MENG; state["syll"] -= 1
            s[3] = "s"; del s[:3]; return True
        if t.startswith("men"):
            state["flags"] |= MENG; state["syll"] -= 1; del s[:3]; return True
        if t.startswith("mem"):
            state["flags"] |= MENG; state["syll"] -= 1; del s[:3]; return True
        if t.startswith("me"):
            state["flags"] |= MENG; state["syll"] -= 1; del s[:2]; return True
        if t.startswith("peng"):
            state["flags"] |= PENG; state["syll"] -= 1; del s[:4]; return True
        if t.startswith("peny") and len(t) > 4 and t[4] in "aeiou":
            state["flags"] |= PENG; state["syll"] -= 1
            s[3] = "s"; del s[:3]; return True
        if t.startswith("peny"):
            state["flags"] |= PENG; state["syll"] -= 1; del s[:4]; return True
        if t.startswith("pen") and len(t) > 3 and t[3] in "aeiou":
            state["flags"] |= PENG; state["syll"] -= 1
            s[2] = "t"; del s[:2]; return True
        if t.startswith("pen"):
            state["flags"] |= PENG; state["syll"] -= 1; del s[:3]; return True
        if t.startswith("pem"):
            state["flags"] |= PENG; state["syll"] -= 1; del s[:3]; return True
        if t.startswith("di"):
            state["flags"] |= DI; state["syll"] -= 1; del s[:2]; return True
        if t.startswith("ter"):
            state["flags"] |= TER; state["syll"] -= 1; del s[:3]; return True
        if t.startswith("ke"):
            state["flags"] |= KE; state["syll"] -= 1; del s[:2]; return True
        return False

    def second_order_prefix():
        t = "".join(s)
        if t.startswith("ber"):
            state["flags"] |= BER; state["syll"] -= 1; del s[:3]; return
        if len(t) == 7 and t.startswith("belajar"):
            state["flags"] |= BER; state["syll"] -= 1; del s[:3]; return
        if (t.startswith("be") and len(t) > 4 and t[2] not in "aeiou"
                and t[3] == "e" and t[4] == "r"):
            state["flags"] |= BER; state["syll"] -= 1; del s[:2]; return
        if t.startswith("per"):
            state["syll"] -= 1; del s[:3]; return
        if len(t) == 7 and t.startswith("pelajar"):
            state["syll"] -= 1; del s[:3]; return
        if t.startswith("pe"):
            state["flags"] |= PE; state["syll"] -= 1; del s[:2]; return

    def remove_suffix():
        f = state["flags"]
        if ends("kan") and not f & KE and not f & PENG and not f & PE:
            state["syll"] -= 1
            del s[-3:]
        elif ends("an") and not f & DI and not f & MENG and not f & TER:
            state["syll"] -= 1
            del s[-2:]
        elif (ends("i") and not ends("si") and not f & BER and not f & KE
                and not f & PENG):
            state["syll"] -= 1
            del s[-1:]

    if state["syll"] > 2:
        remove_particle()
    if state["syll"] > 2:
        remove_possessive()
    if stem_derivational:
        fired = False
        if state["syll"] > 2:
            fired = first_order_prefix()
        if fired:
            old = len(s)
            if state["syll"] > 2:
                remove_suffix()
            if len(s) != old and state["syll"] > 2:
                second_order_prefix()
        else:
            if state["syll"] > 2:
                second_order_prefix()
            if state["syll"] > 2:
                remove_suffix()
    return "".join(s)


# ------------------------------------------------- Czech (light)

_CZ_SUF3 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
            "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
            "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CZ_SUF2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
            "mi", "ou")


def czech_stem(w: str) -> str:
    """CzechStemmer (cz/CzechStemmer.java:33-157): Dolamic & Savoy's light
    stemmer — case suffixes, possessives, palatalization normalization."""
    s = list(w)
    L = len(s)
    # removeCase
    if L > 7 and _ew(s, L, "atech"):
        L -= 5
    elif L > 6 and (_ew(s, L, "ětem") or _ew(s, L, "etem")
                    or _ew(s, L, "atům")):
        L -= 4
    elif L > 5 and "".join(s[:L]).endswith(_CZ_SUF3):
        L -= 3
    elif L > 4 and "".join(s[:L]).endswith(_CZ_SUF2):
        L -= 2
    elif L > 3 and s[L - 1] in "aeiouůyáéíýě":
        L -= 1
    # removePossessives
    if L > 5 and (_ew(s, L, "ov") or _ew(s, L, "in") or _ew(s, L, "ův")):
        L -= 2
    # normalize
    if L > 0:
        if _ew(s, L, "čt"):
            s[L - 2] = "c"
            s[L - 1] = "k"
        elif _ew(s, L, "št"):
            s[L - 2] = "s"
            s[L - 1] = "k"
        elif s[L - 1] in ("c", "č"):
            s[L - 1] = "k"
        elif s[L - 1] in ("z", "ž"):
            s[L - 1] = "h"
        elif L > 1 and s[L - 2] == "e":
            s[L - 2] = s[L - 1]
            L -= 1
        elif L > 2 and s[L - 2] == "ů":
            s[L - 2] = "o"
    return "".join(s[:L])


# ------------------------------------------------- Norwegian (light, Bokmål)


def norwegian_light_stem(w: str, *, bokmaal: bool = True,
                         nynorsk: bool = False) -> str:
    """NorwegianLightStemmer (no/NorwegianLightStemmer.java:66-183) — the
    NorwegianLightStemFilter chain with the factory's Bokmål default; pass
    nynorsk=True (or both) for the other variants. The default
    NorwegianAnalyzer stems with snowball (documented divergence)."""
    if not (bokmaal or nynorsk):
        raise ValueError("at least one of bokmaal/nynorsk required")
    s = w
    L = len(s)
    if L > 4 and s[L - 1] == "s":  # possessive
        L -= 1
    t = s[:L]
    if L > 7 and ((bokmaal and t.endswith(("heter", "heten")))
                  or (nynorsk and t.endswith("heita"))):
        return s[:L - 5]
    if L > 8 and nynorsk and t.endswith(("heiter", "leiken", "leikar")):
        return s[:L - 6]
    if L > 5 and (t.endswith("dom") or (bokmaal and t.endswith("het"))):
        return s[:L - 3]
    if L > 6 and nynorsk and t.endswith(("heit", "semd", "leik")):
        return s[:L - 4]
    if L > 7 and t.endswith(("elser", "elsen")):
        return s[:L - 5]
    if L > 6 and ((bokmaal and t.endswith(("ende", "este", "eren")))
                  or (nynorsk and t.endswith(("ande", "aste", "aren")))
                  or t.endswith("else")):
        return s[:L - 4]
    if L > 5 and ((bokmaal and t.endswith(("ere", "est")))
                  or (nynorsk and t.endswith(("are", "ast", "ane")))
                  or t.endswith("ene")):
        return s[:L - 3]
    if L > 4 and (t.endswith(("er", "en", "et", "te"))
                  or (nynorsk and t.endswith("ar"))
                  or (bokmaal and t.endswith("st"))):
        return s[:L - 2]
    if L > 3 and s[L - 1] in "aen":
        return s[:L - 1]
    return s[:L]


# ------------------------------------------------- Latvian (light)

# (affix, vowel-count guard, fires palatalization) — order matters
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False), ("am", 1, False),
    ("ēm", 1, False), ("īm", 1, False), ("im", 1, False), ("um", 1, False),
    ("us", 1, True), ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False), ("ēs", 1, False),
    ("is", 1, False), ("ie", 1, False), ("u", 1, True), ("a", 1, True),
    ("i", 1, True), ("e", 1, False), ("ā", 1, False), ("ē", 1, False),
    ("ī", 1, False), ("ū", 1, False), ("o", 1, False), ("s", 0, False),
    ("š", 0, False),
)


def _lv_unpalatalize(s: list, removed: str) -> str:
    L = len(s)
    t = "".join(s)
    if removed == "u":
        # 2nd/5th/6th declension genitive plural rules
        if t.endswith("kš"):
            return t[:-2] + "kst"
        if t.endswith("ņņ"):
            return t[:-2] + "nn"
    if t.endswith(("pj", "bj", "mj", "vj")):  # labial consonant
        return t[:-1]
    for suf, rep in (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"),
                     ("žļ", "zl"), ("ļņ", "ln"), ("ļļ", "ll")):
        if t.endswith(suf):
            return t[:-2] + rep
    if L and t[-1] == "č":
        return t[:-1] + "c"
    if L and t[-1] == "ļ":
        return t[:-1] + "l"
    if L and t[-1] == "ņ":
        return t[:-1] + "n"
    return t


def latvian_stem(w: str) -> str:
    """LatvianStemmer (lv/LatvianStemmer.java:30-180, Karlis Kreslins' light
    approach): strip ONE inflectional affix (vowel-count guarded), then
    un-palatalize the exposed stem."""
    nv = sum(c in "aeiouāīēū" for c in w)
    for affix, vc, pal in _LV_AFFIXES:
        if nv > vc and len(w) >= len(affix) + 3 and w.endswith(affix):
            stem = w[:len(w) - len(affix)]
            if pal:
                return _lv_unpalatalize(list(stem), affix[0])
            return stem
    return w


# ------------------------------------------------- Bengali
# IndicNormalizer rows with the BENGALI flag (base U+0980) — complete vs
# the reference table (verified programmatically).
_BN_DECOMP = (
    (0x05, 0x3E, -1, 0x06), (0x21, 0x3C, -1, 0x5C), (0x22, 0x3C, -1, 0x5D),
    (0x24, 0x4D, 0xFF, 0x4E), (0x2F, 0x3C, -1, 0x5F),
    (0x47, 0x3E, -1, 0x4B), (0x47, 0x57, -1, 0x4C),
)
_BN_DECOMP_FIRST = frozenset(r[0] for r in _BN_DECOMP)


def indic_normalize_bengali(w: str) -> str:
    """Bengali-script IndicNormalizer rules (the Bengali chain)."""
    return _indic_normalize(w, 0x0980, _BN_DECOMP, _BN_DECOMP_FIRST)


def bengali_normalize(w: str) -> str:
    """BengaliNormalizer (bn/BengaliNormalizer.java:27-150): chandrabindu
    deletion, long→short kars, khio/ja-phala/ba-phalaa rewrites, visarga
    handling, sh/na/ra folds — ported with the reference's index arithmetic
    (several rules are position- and context-dependent)."""
    s = list(w)
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\u0981":
            del s[i]
            i -= 1
        elif c == "\u09C0":
            s[i] = "\u09BF"
        elif c == "\u09C2":
            s[i] = "\u09C1"
        elif c == "\u0995":
            if (i + 2 < len(s) and s[i + 1] == "\u09CD"
                    and s[i + 2] == "\u09BF"):
                if i == 0:
                    s[i] = "\u0996"
                    del s[i + 2]
                    del s[i + 1]
                else:
                    s[i + 1] = "\u0996"
                    del s[i + 2]
        elif c == "\u0999":
            s[i] = "\u0982"
        elif c == "\u09AF":
            if i - 2 == 0 and s[i - 1] == "\u09CD":
                s[i - 1] = "\u09C7"
                if i + 1 < len(s) and s[i + 1] == "\u09BE":
                    del s[i + 1]
                del s[i]
                i -= 1
            elif i - 1 >= 0 and s[i - 1] == "\u09CD":
                del s[i]
                del s[i - 1]
                i -= 2
        elif c == "\u09AC":
            if i == 0 or s[i - 1] != "\u09CD":
                pass
            elif i - 2 == 0:
                del s[i]
                del s[i - 1]
                i -= 2
            elif i - 5 >= 0 and s[i - 3] == "\u09CD":
                del s[i]
                del s[i - 1]
                i -= 2
            elif i - 2 >= 0:
                s[i - 1] = s[i - 2]
                del s[i]
                i -= 1
        elif c == "\u0983":
            if i == len(s) - 1:
                if len(s) <= 3:
                    s[i] = "\u09B9"
                else:
                    del s[i]
                    i -= 1
            else:
                s[i] = s[i + 1]
        elif c in ("\u09B6", "\u09B7"):
            s[i] = "\u09B8"
        elif c == "\u09A3":
            s[i] = "\u09A8"
        elif c in ("\u09DC", "\u09DD"):
            s[i] = "\u09B0"
        elif c == "\u09CE":
            s[i] = "\u09A4"
        i += 1
    return "".join(s)
_BN_SUF8 = (  # strip 8, guard len > 9
    "িয়াছিলাম", "িতেছিলাম", "িতেছিলেন", "ইতেছিলেন", "িয়াছিলেন",
    "ইয়াছিলেন"
)
_BN_SUF7 = (  # strip 7, guard len > 8
    "িতেছিলি", "িতেছিলে", "িয়াছিলা", "িয়াছিলে", "িতেছিলা", "িয়াছিলি",
    "য়েদেরকে"
)
_BN_SUF6 = (  # strip 6, guard len > 7
    "িতেছিস", "িতেছেন", "িয়াছিস", "িয়াছেন", "েছিলাম", "েছিলেন",
    "েদেরকে"
)
_BN_SUF5 = (  # strip 5, guard len > 6
    "িতেছি", "িতেছা", "িতেছে", "ছিলাম", "ছিলেন", "িয়াছি", "িয়াছা",
    "িয়াছে", "েছিলে", "েছিলা", "য়েদের", "দেরকে"
)
_BN_SUF4 = (  # strip 4, guard len > 5
    "িলাম", "িলেন", "িতাম", "িতেন", "িবেন", "ছিলি", "ছিলে", "ছিলা",
    "তেছে", "িতেছ", "খানা", "খানি", "গুলো", "গুলি", "য়েরা", "েদের"
)
_BN_SUF3 = (  # strip 3, guard len > 4
    "লাম", "িলি", "ইলি", "িলে", "ইলে", "লেন", "িলা", "ইলা", "তাম",
    "িতি", "ইতি", "িতে", "ইতে", "তেন", "িতা", "িবা", "ইবা", "িবি",
    "ইবি", "বেন", "িবে", "ইবে", "ছেন", "য়োন", "য়ের", "েরা", "দের"
)
_BN_SUF2 = (  # strip 2, guard len > 3
    "িস", "েন", "লি", "লে", "লা", "তি", "তে", "তা", "বি", "বে", "বা",
    "ছি", "ছা", "ছে", "ুন", "ুক", "টা", "টি", "নি", "ের", "তে", "রা",
    "কে"
)
_BN_SUF1 = (  # strip 1, guard len > 2
    "ি", "ী", "া", "ো", "ে", "ব", "ত"
)


def bengali_stem(w: str) -> str:
    """BengaliStemmer (bn/BengaliStemmer.java:28-163): longest suffix class
    first with length guards (tables generated from the reference source,
    exact codepoints)."""
    L = len(w)
    if L > 9 and w.endswith(_BN_SUF8):
        return w[:-8]
    if L > 8 and w.endswith(_BN_SUF7):
        return w[:-7]
    if L > 7 and w.endswith(_BN_SUF6):
        return w[:-6]
    if L > 6 and w.endswith(_BN_SUF5):
        return w[:-5]
    if L > 5 and w.endswith(_BN_SUF4):
        return w[:-4]
    if L > 4 and w.endswith(_BN_SUF3):
        return w[:-3]
    if L > 3 and w.endswith(_BN_SUF2):
        return w[:-2]
    if L > 2 and w.endswith(_BN_SUF1):
        return w[:-1]
    return w


# ------------------------------------------------- Greek (Ntais/Saroukos)

_EL_FOLD = str.maketrans({"ς": "σ", "ά": "α", "έ": "ε", "ή": "η",
                          "ί": "ι", "ϊ": "ι", "ΐ": "ι",
                          "ύ": "υ", "ϋ": "υ", "ΰ": "υ",
                          "ό": "ο", "ώ": "ω"})


def greek_lowercase(w: str) -> str:
    """GreekLowerCaseFilter (el/GreekLowerCaseFilter.java:49-113) applied
    AFTER str.lower(): final sigma → sigma, tonos/dialytika diacritics
    stripped (capital forms already lowered to the small-with-diacritic
    forms this table folds)."""
    return w.lower().translate(_EL_FOLD)


_EL_VOWELS = frozenset("αεηιουω")
_EL_VOWELS_NO_Y = frozenset("αεηιοω")

_EL_EXC4 = frozenset(["θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"])
_EL_EXC6 = frozenset([
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ"])
_EL_EXC7 = frozenset(["αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ",
                      "πεθ", "πικρ", "ποτ", "σιχ", "χ"])
_EL_EXC8A = frozenset(["τρ", "τσ"])
_EL_EXC8B = frozenset([
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
    "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π",
    "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ",
    "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ",
    "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
    "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
    "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
    "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
    "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
    "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
    "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ",
    "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ",
    "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ"])
_EL_EXC9 = frozenset([
    "αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ", "βαρον",
    "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ", "σκελ",
    "συρφ", "τοκ", "υ", "δ", "εμ", "θαρρ", "θ"])
_EL_EXC12A = frozenset(["π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"])
_EL_EXC12B = frozenset(["αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ",
                        "προ", "νισ"])
_EL_EXC13 = frozenset(["διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"])
_EL_EXC14 = frozenset([
    "φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ", "λεχ",
    "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ", "αιθ",
    "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
    "τσα"])
_EL_EXC15A = frozenset([
    "αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
    "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ",
    "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ",
    "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ",
    "αποτ", "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ",
    "ναυ", "ουλαμ", "ουρ", "π", "τρ", "μ"])
_EL_EXC15B = frozenset(["ψοφ", "ναυλοχ"])
_EL_EXC16 = frozenset(["ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον",
                       "επταν"])
_EL_EXC17 = frozenset(["ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
                       "ευχρ", "κοινοχρ", "παλιμψ"])
_EL_EXC18 = frozenset(["ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"])
_EL_EXC19 = frozenset(["παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ",
                       "ασουσ"])


def greek_stem(w: str) -> str:  # noqa: C901 — rule-per-rule reference port
    """GreekStemmer (el/GreekStemmer.java:42-883): Ntais' stemmer with the
    Saroukos extensions — 22 ordered rules with per-rule exception sets
    (full-stem matches) and add-back suffixes, ported expression-for-
    expression (including the reference's own || precedence quirks in
    rules 0 and 8)."""
    if len(w) < 4:
        return w
    s = list(w)
    L = len(s)
    orig = L

    def ew(n, suf):
        return _ew(s, n, suf)

    def word(n):
        return "".join(s[:n])

    def vowel(n):
        return n > 0 and s[n - 1] in _EL_VOWELS

    def vowel_no_y(n):
        return n > 0 and s[n - 1] in _EL_VOWELS_NO_Y

    # rule 0
    if L > 9 and (ew(L, "καθεστωτοσ") or ew(L, "καθεστωτων")):
        L -= 4
    elif L > 8 and (ew(L, "γεγονοτοσ") or ew(L, "γεγονοτων")):
        L -= 4
    elif L > 8 and ew(L, "καθεστωτα"):
        L -= 3
    elif L > 7 and (ew(L, "τατογιου") or ew(L, "τατογιων")):
        L -= 4
    elif L > 7 and ew(L, "γεγονοτα"):
        L -= 3
    elif L > 7 and ew(L, "καθεστωσ"):
        L -= 2
    elif ((L > 6 and ew(L, "σκαγιου")) or ew(L, "σκαγιων") or ew(L, "ολογιου")
          or ew(L, "ολογιων") or ew(L, "κρεατοσ") or ew(L, "κρεατων")
          or ew(L, "περατοσ") or ew(L, "περατων") or ew(L, "τερατοσ")
          or ew(L, "τερατων")):
        L -= 4
    elif L > 6 and ew(L, "τατογια"):
        L -= 3
    elif L > 6 and ew(L, "γεγονοσ"):
        L -= 2
    elif L > 5 and (ew(L, "φαγιου") or ew(L, "φαγιων") or ew(L, "σογιου")
                    or ew(L, "σογιων")):
        L -= 4
    elif L > 5 and (ew(L, "σκαγια") or ew(L, "ολογια") or ew(L, "κρεατα")
                    or ew(L, "περατα") or ew(L, "τερατα")):
        L -= 3
    elif L > 4 and (ew(L, "φαγια") or ew(L, "σογια") or ew(L, "φωτοσ")
                    or ew(L, "φωτων")):
        L -= 3
    elif L > 4 and (ew(L, "κρεασ") or ew(L, "περασ") or ew(L, "τερασ")):
        L -= 2
    elif L > 3 and ew(L, "φωτα"):
        L -= 2
    elif L > 2 and ew(L, "φωσ"):
        L -= 1

    # rule 1
    if L > 4 and (ew(L, "αδεσ") or ew(L, "αδων")):
        L -= 4
        if not (ew(L, "οκ") or ew(L, "μαμ") or ew(L, "μαν") or ew(L, "μπαμπ")
                or ew(L, "πατερ") or ew(L, "γιαγι") or ew(L, "νταντ")
                or ew(L, "κυρ") or ew(L, "θει") or ew(L, "πεθερ")):
            L += 2  # add back -αδ
    # rule 2
    if L > 4 and (ew(L, "εδεσ") or ew(L, "εδων")):
        L -= 4
        if (ew(L, "οπ") or ew(L, "ιπ") or ew(L, "εμπ") or ew(L, "υπ")
                or ew(L, "γηπ") or ew(L, "δαπ") or ew(L, "κρασπ")
                or ew(L, "μιλ")):
            L += 2  # add back -εδ
    # rule 3
    if L > 5 and (ew(L, "ουδεσ") or ew(L, "ουδων")):
        L -= 5
        if (ew(L, "αρκ") or ew(L, "καλιακ") or ew(L, "πεταλ") or ew(L, "λιχ")
                or ew(L, "πλεξ") or ew(L, "σκ") or ew(L, "σ") or ew(L, "φλ")
                or ew(L, "φρ") or ew(L, "βελ") or ew(L, "λουλ")
                or ew(L, "χν") or ew(L, "σπ") or ew(L, "τραγ")
                or ew(L, "φε")):
            L += 3  # add back -ουδ
    # rule 4
    if L > 3 and (ew(L, "εωσ") or ew(L, "εων")):
        L -= 3
        if word(L) in _EL_EXC4:
            L += 1  # add back -ε
    # rule 5
    if L > 2 and ew(L, "ια"):
        L -= 2
        if vowel(L):
            L += 1  # add back -ι
    elif L > 3 and (ew(L, "ιου") or ew(L, "ιων")):
        L -= 3
        if vowel(L):
            L += 1
    # rule 6
    removed = False
    if L > 3 and (ew(L, "ικα") or ew(L, "ικο")):
        L -= 3
        removed = True
    elif L > 4 and (ew(L, "ικου") or ew(L, "ικων")):
        L -= 4
        removed = True
    if removed and (vowel(L) or word(L) in _EL_EXC6):
        L += 2  # add back -ικ
    # rule 7
    if L == 5 and ew(L, "αγαμε"):
        L -= 1
    else:
        if L > 7 and ew(L, "ηθηκαμε"):
            L -= 7
        elif L > 6 and ew(L, "ουσαμε"):
            L -= 6
        elif L > 5 and (ew(L, "αγαμε") or ew(L, "ησαμε") or ew(L, "ηκαμε")):
            L -= 5
        if L > 3 and ew(L, "αμε"):
            L -= 3
            if word(L) in _EL_EXC7:
                L += 2  # add back -αμ
    # rule 8 (the ||-precedence quirks kept verbatim)
    removed = False
    if L > 8 and ew(L, "ιουντανε"):
        L -= 8
        removed = True
    elif (L > 7 and ew(L, "ιοντανε")) or ew(L, "ουντανε") or ew(L, "ηθηκανε"):
        L -= 7
        removed = True
    elif (L > 6 and ew(L, "ιοτανε")) or ew(L, "οντανε") or ew(L, "ουσανε"):
        L -= 6
        removed = True
    elif (L > 5 and ew(L, "αγανε")) or ew(L, "ησανε") or ew(L, "οτανε") \
            or ew(L, "ηκανε"):
        L -= 5
        removed = True
    if removed and word(L) in _EL_EXC8A:
        L += 4
        s[L - 4:L] = ["α", "γ", "α", "ν"]
    if L > 3 and ew(L, "ανε"):
        L -= 3
        if vowel_no_y(L) or word(L) in _EL_EXC8B:
            L += 2  # add back -αν
    # rule 9
    if L > 5 and ew(L, "ησετε"):
        L -= 5
    if L > 3 and ew(L, "ετε"):
        L -= 3
        if (word(L) in _EL_EXC9 or vowel_no_y(L) or ew(L, "οδ")
                or ew(L, "αιρ") or ew(L, "φορ") or ew(L, "ταθ")
                or ew(L, "διαθ") or ew(L, "σχ") or ew(L, "ενδ")
                or ew(L, "ευρ") or ew(L, "τιθ") or ew(L, "υπερθ")
                or ew(L, "ραθ") or ew(L, "ενθ") or ew(L, "ροθ")
                or ew(L, "σθ") or ew(L, "πυρ") or ew(L, "αιν")
                or ew(L, "συνδ") or ew(L, "συν") or ew(L, "συνθ")
                or ew(L, "χωρ") or ew(L, "πον") or ew(L, "βρ")
                or ew(L, "καθ") or ew(L, "ευθ") or ew(L, "εκθ")
                or ew(L, "νετ") or ew(L, "ρον") or ew(L, "αρκ")
                or ew(L, "βαρ") or ew(L, "βολ") or ew(L, "ωφελ")):
            L += 2  # add back -ετ
    # rule 10
    if L > 5 and (ew(L, "οντασ") or ew(L, "ωντασ")):
        L -= 5
        if L == 3 and ew(L, "αρχ"):
            L += 3
            s[L - 3] = "ο"
            s[L - 2] = "ν"
            s[L - 1] = "τ"
        if ew(L, "κρε"):
            L += 3
            s[L - 3] = "ω"
            s[L - 2] = "ν"
            s[L - 1] = "τ"
    # rule 11
    if L > 6 and ew(L, "ομαστε"):
        L -= 6
        if L == 2 and ew(L, "ον"):
            L += 5  # add back -ομαστ
            s[L - 5:L] = ["ο", "μ", "α", "σ", "τ"]
    elif L > 7 and ew(L, "ιομαστε"):
        L -= 7
        if L == 2 and ew(L, "ον"):
            L += 5
            s[L - 5:L] = ["ο", "μ", "α", "σ", "τ"]
    # rule 12
    if L > 5 and ew(L, "ιεστε"):
        L -= 5
        if word(L) in _EL_EXC12A:
            L += 4  # add back -ιεστ
    if L > 4 and ew(L, "εστε"):
        L -= 4
        if word(L) in _EL_EXC12B:
            L += 3  # add back -εστ
    # rule 13
    if L > 6 and ew(L, "ηθηκεσ"):
        L -= 6
    elif L > 5 and (ew(L, "ηθηκα") or ew(L, "ηθηκε")):
        L -= 5
    removed = False
    if L > 4 and ew(L, "ηκεσ"):
        L -= 4
        removed = True
    elif L > 3 and (ew(L, "ηκα") or ew(L, "ηκε")):
        L -= 3
        removed = True
    if removed and (word(L) in _EL_EXC13 or ew(L, "σκωλ") or ew(L, "σκουλ")
                    or ew(L, "ναρθ") or ew(L, "σφ") or ew(L, "οθ")
                    or ew(L, "πιθ")):
        L += 2  # add back -ηκ
    # rule 14
    removed = False
    if L > 5 and ew(L, "ουσεσ"):
        L -= 5
        removed = True
    elif L > 4 and (ew(L, "ουσα") or ew(L, "ουσε")):
        L -= 4
        removed = True
    if removed and (word(L) in _EL_EXC14 or vowel(L) or ew(L, "ποδαρ")
                    or ew(L, "βλεπ") or ew(L, "πανταχ") or ew(L, "φρυδ")
                    or ew(L, "μαντιλ") or ew(L, "μαλλ") or ew(L, "κυματ")
                    or ew(L, "λαχ") or ew(L, "ληγ") or ew(L, "φαγ")
                    or ew(L, "ομ") or ew(L, "πρωτ")):
        L += 3  # add back -ουσ
    # rule 15
    removed = False
    if L > 4 and ew(L, "αγεσ"):
        L -= 4
        removed = True
    elif L > 3 and (ew(L, "αγα") or ew(L, "αγε")):
        L -= 3
        removed = True
    if removed:
        cond1 = (word(L) in _EL_EXC15A or ew(L, "οφ") or ew(L, "πελ")
                 or ew(L, "χορτ") or ew(L, "λλ") or ew(L, "σφ")
                 or ew(L, "ρπ") or ew(L, "φρ") or ew(L, "πρ")
                 or ew(L, "λοχ") or ew(L, "σμην"))
        cond2 = word(L) in _EL_EXC15B or ew(L, "κολλ")
        if cond1 and not cond2:
            L += 2  # add back -αγ
    # rule 16
    removed = False
    if L > 4 and ew(L, "ησου"):
        L -= 4
        removed = True
    elif L > 3 and (ew(L, "ησε") or ew(L, "ησα")):
        L -= 3
        removed = True
    if removed and word(L) in _EL_EXC16:
        L += 2  # add back -ησ
    # rule 17
    if L > 4 and ew(L, "ηστε"):
        L -= 4
        if word(L) in _EL_EXC17:
            L += 3  # add back -ηστ
    # rule 18
    removed = False
    if L > 6 and (ew(L, "ησουνε") or ew(L, "ηθουνε")):
        L -= 6
        removed = True
    elif L > 4 and ew(L, "ουνε"):
        L -= 4
        removed = True
    if removed and word(L) in _EL_EXC18:
        L += 3
        s[L - 3:L] = ["ο", "υ", "ν"]
    # rule 19
    removed = False
    if L > 6 and (ew(L, "ησουμε") or ew(L, "ηθουμε")):
        L -= 6
        removed = True
    elif L > 4 and ew(L, "ουμε"):
        L -= 4
        removed = True
    if removed and word(L) in _EL_EXC19:
        L += 3
        s[L - 3:L] = ["ο", "υ", "μ"]
    # rule 20
    if L > 5 and (ew(L, "ματων") or ew(L, "ματοσ")):
        L -= 3
    elif L > 4 and ew(L, "ματα"):
        L -= 2
    # rule 21 (the long list) only when nothing above fired
    if L == orig:
        if L > 9 and ew(L, "ιοντουσαν"):
            L -= 9
        elif L > 8 and (ew(L, "ιομασταν") or ew(L, "ιοσασταν")
                        or ew(L, "ιουμαστε") or ew(L, "οντουσαν")):
            L -= 8
        elif L > 7 and (ew(L, "ιεμαστε") or ew(L, "ιεσαστε")
                        or ew(L, "ιομουνα") or ew(L, "ιοσαστε")
                        or ew(L, "ιοσουνα") or ew(L, "ιουνται")
                        or ew(L, "ιουνταν") or ew(L, "ηθηκατε")
                        or ew(L, "ομασταν") or ew(L, "οσασταν")
                        or ew(L, "ουμαστε")):
            L -= 7
        elif L > 6 and (ew(L, "ιομουν") or ew(L, "ιονταν") or ew(L, "ιοσουν")
                        or ew(L, "ηθειτε") or ew(L, "ηθηκαν")
                        or ew(L, "ομουνα") or ew(L, "οσαστε")
                        or ew(L, "οσουνα") or ew(L, "ουνται")
                        or ew(L, "ουνταν") or ew(L, "ουσατε")):
            L -= 6
        elif L > 5 and (ew(L, "αγατε") or ew(L, "ιεμαι") or ew(L, "ιεται")
                        or ew(L, "ιεσαι") or ew(L, "ιοταν") or ew(L, "ιουμα")
                        or ew(L, "ηθεισ") or ew(L, "ηθουν") or ew(L, "ηκατε")
                        or ew(L, "ησατε") or ew(L, "ησουν") or ew(L, "ομουν")
                        or ew(L, "ονται") or ew(L, "ονταν") or ew(L, "οσουν")
                        or ew(L, "ουμαι") or ew(L, "ουσαν")):
            L -= 5
        elif L > 4 and (ew(L, "αγαν") or ew(L, "αμαι") or ew(L, "ασαι")
                        or ew(L, "αται") or ew(L, "ειτε") or ew(L, "εσαι")
                        or ew(L, "εται") or ew(L, "ηδεσ") or ew(L, "ηδων")
                        or ew(L, "ηθει") or ew(L, "ηκαν") or ew(L, "ησαν")
                        or ew(L, "ησει") or ew(L, "ησεσ") or ew(L, "ομαι")
                        or ew(L, "οταν")):
            L -= 4
        elif L > 3 and (ew(L, "αει") or ew(L, "εισ") or ew(L, "ηθω")
                        or ew(L, "ησω") or ew(L, "ουν") or ew(L, "ουσ")):
            L -= 3
        elif L > 2 and (ew(L, "αν") or ew(L, "ασ") or ew(L, "αω")
                        or ew(L, "ει") or ew(L, "εσ") or ew(L, "ησ")
                        or ew(L, "οι") or ew(L, "οσ") or ew(L, "ου")
                        or ew(L, "υσ") or ew(L, "ων")):
            L -= 2
        elif L > 1 and vowel(L):
            L -= 1
    # rule 22
    if ew(L, "εστερ") or ew(L, "εστατ"):
        L -= 5
    elif (ew(L, "οτερ") or ew(L, "οτατ") or ew(L, "υτερ") or ew(L, "υτατ")
          or ew(L, "ωτερ") or ew(L, "ωτατ")):
        L -= 4
    return "".join(s[:L])


# ------------------------------------------------- minimal stemmers

_DE_MIN_FOLD = str.maketrans("äöü", "aou")


def german_minimal_stem(w: str) -> str:
    """GermanMinimalStemmer (de/GermanMinimalStemmer.java:57-105): umlaut
    fold + plural suffix strip only (the conservative variant)."""
    if len(w) < 5:
        return w
    s = w.translate(_DE_MIN_FOLD)
    L = len(s)
    if L > 6 and s.endswith("nen"):
        return s[:L - 3]
    if L > 5 and s.endswith(("en", "se", "es", "er")):
        return s[:L - 2]
    if s[L - 1] in "nesr":
        return s[:L - 1]
    return s


def french_minimal_stem(w: str) -> str:
    """FrenchMinimalStemmer (fr/FrenchMinimalStemmer.java:56-71)."""
    if len(w) < 6:
        return w
    s = list(w)
    L = len(s)
    if s[L - 1] == "x":
        if s[L - 3] == "a" and s[L - 2] == "u":
            s[L - 2] = "l"
        return "".join(s[:L - 1])
    if s[L - 1] == "s":
        L -= 1
    if s[L - 1] == "r":
        L -= 1
    if s[L - 1] == "e":
        L -= 1
    if s[L - 1] == "é":
        L -= 1
    if s[L - 1] == s[L - 2] and s[L - 1].isalpha():
        L -= 1
    return "".join(s[:L])


def english_minimal_stem(w: str) -> str:
    """EnglishMinimalStemmer (en/EnglishMinimalStemmer.java:26-46): the
    S-stemmer (Donna Harman) — plural-only stripping."""
    if len(w) < 3 or w[-1] != "s":
        return w
    c = w[-2]
    if c in ("u", "s"):
        return w
    if c == "e":
        if len(w) > 3 and w[-3] == "i" and w[-4] not in ("a", "e"):
            return w[:-3] + "y"
        if w[-3] in ("i", "a", "o", "e"):
            return w
    return w[:-1]


# ------------------------------------------------- phonetic encoders

# commons-codec US-English Soundex mapping for A..Z (the encoders behind
# the reference's analysis/phonetic module are public-domain algorithms;
# goldens from phonetic/TestPhoneticFilter.java)
_SOUNDEX_MAP = "01230120022455012623010202"
_RSOUNDEX_MAP = "01360240043788015936020505"


def soundex(w: str) -> str:
    """American Soundex, commons-codec semantics: first letter kept, codes
    appended unless equal to the previous code, vowels reset the duplicate
    window, a consonant after H/W is silent when the letter before the H/W
    shares its code; padded/truncated to 4."""
    s = [c for c in w.upper() if "A" <= c <= "Z"]
    if not s:
        return ""

    def code(c):
        return _SOUNDEX_MAP[ord(c) - 65]

    out = [s[0]]
    last = code(s[0])
    for i in range(1, len(s)):
        if len(out) >= 4:
            break
        c = s[i]
        m = code(c)
        if m != "0" and i > 1 and s[i - 1] in "HW":
            p2 = s[i - 2]
            if p2 in "HW" or code(p2) == m:
                m = "0"
            if m == "0":
                continue  # silenced by the H/W rule: window unchanged
        if m != "0":
            if m != last:
                out.append(m)
            last = m
        elif c not in "HW":
            last = "0"  # vowels reset the duplicate window
    return "".join(out).ljust(4, "0")


def refined_soundex(w: str) -> str:
    """Refined Soundex (commons-codec): first letter + every code (vowels
    as 0), adjacent duplicates collapsed, no length cap."""
    s = [c for c in w.upper() if "A" <= c <= "Z"]
    if not s:
        return ""
    out = [s[0]]
    last = None
    for c in s:
        m = _RSOUNDEX_MAP[ord(c) - 65]
        if m != last:
            out.append(m)
        last = m
    return "".join(out)
