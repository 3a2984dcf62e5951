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
