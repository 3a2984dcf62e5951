"""Snowball (tartarus) stemmers — the reference's DEFAULT stemmers for the
Russian/Swedish/Finnish/Hungarian analyzers plus Porter2 ("english").

These are ports of the published Snowball 2.0.0 algorithms
(https://snowballstem.org/algorithms/ — public domain algorithm
descriptions); the reference wraps the same generated stemmers via
``SnowballFilter`` (analysis/common/src/java/org/apache/lucene/analysis/
snowball/SnowballFilter.java:33, generated classes under
org/tartarus/snowball/ext/). Every stemmer here is validated against the
reference's full published vocabulary zips
(analysis/common/src/test/.../snowball/{russian,swedish,finnish,hungarian,
english}.zip — 2000 word/stem pairs each) in tests/test_snowball.py.

Region conventions (snowball spec): ``R1`` = region after the first
non-vowel following a vowel; ``R2`` = R1 of R1; ``RV`` (russian pV) =
region after the first vowel. A backward suffix match is only valid when
it lies entirely inside the region (find_among_b under limit_backward) —
longer candidates blocked by the region boundary fall back to shorter ones,
but a matched entry whose side-condition fails does NOT fall back.
"""

from __future__ import annotations

__all__ = [
    "russian_snowball_stem",
    "swedish_snowball_stem",
    "finnish_snowball_stem",
    "hungarian_snowball_stem",
    "english_snowball_stem",
]


def _r1r2(w: str, vowels: frozenset) -> tuple[int, int]:
    """Standard R1/R2 start offsets (len(w) when absent)."""
    n = len(w)
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in vowels:
        i += 1
    i += 1
    while i < n and w[i] in vowels:
        i += 1
    if i < n:
        p1 = i + 1
    i = p1
    while i < n and w[i] not in vowels:
        i += 1
    i += 1
    while i < n and w[i] in vowels:
        i += 1
    if i < n:
        p2 = i + 1
    return p1, p2


def _match(w: str, limit: int, among) -> tuple[str, int]:
    """Longest suffix of ``w`` from ``among`` (pre-sorted len desc) whose
    start is >= ``limit`` — find_among_b under limit_backward."""
    for suf, case in among:
        if w.endswith(suf) and len(w) - len(suf) >= limit:
            return suf, case
    return "", 0


def _by_len(entries) -> tuple:
    return tuple(sorted(entries, key=lambda e: -len(e[0])))


# ---------------------------------------------------------------------------
# Russian (RussianStemmer.java — snowball russian.sbl)

_RU_VOWELS = frozenset("аеиоуыэюя")

_RU_PERF_GERUND = _by_len([
    ("в", 1), ("ив", 2), ("ыв", 2),
    ("вши", 1), ("ивши", 2), ("ывши", 2),
    ("вшись", 1), ("ившись", 2), ("ывшись", 2),
])
_RU_ADJECTIVE = _by_len([
    ("ее", 1), ("ие", 1), ("ое", 1), ("ые", 1), ("ими", 1), ("ыми", 1),
    ("ей", 1), ("ий", 1), ("ой", 1), ("ый", 1), ("ем", 1), ("им", 1),
    ("ом", 1), ("ым", 1), ("его", 1), ("ого", 1), ("ему", 1), ("ому", 1),
    ("их", 1), ("ых", 1), ("ею", 1), ("ою", 1), ("ую", 1), ("юю", 1),
    ("ая", 1), ("яя", 1),
])
_RU_PARTICIPLE = _by_len([
    ("ем", 1), ("нн", 1), ("вш", 1), ("ивш", 2), ("ывш", 2),
    ("щ", 1), ("ющ", 1), ("ующ", 2),
])
_RU_REFLEXIVE = _by_len([("сь", 1), ("ся", 1)])
_RU_VERB = _by_len([
    ("ла", 1), ("ила", 2), ("ыла", 2), ("на", 1), ("ена", 2),
    ("ете", 1), ("ите", 2), ("йте", 1), ("ейте", 2), ("уйте", 2),
    ("ли", 1), ("или", 2), ("ыли", 2), ("й", 1), ("ей", 2), ("уй", 2),
    ("л", 1), ("ил", 2), ("ыл", 2), ("ем", 1), ("им", 2), ("ым", 2),
    ("н", 1), ("ен", 2), ("ло", 1), ("ило", 2), ("ыло", 2), ("но", 1),
    ("ено", 2), ("нно", 1), ("ет", 1), ("ует", 2), ("ит", 2), ("ыт", 2),
    ("ют", 1), ("уют", 2), ("ят", 2), ("ны", 1), ("ены", 2), ("ть", 1),
    ("ить", 2), ("ыть", 2), ("ешь", 1), ("ишь", 2), ("ю", 2), ("ую", 2),
])
_RU_NOUN = _by_len([
    ("а", 1), ("ев", 1), ("ов", 1), ("е", 1), ("ие", 1), ("ье", 1),
    ("и", 1), ("еи", 1), ("ии", 1), ("ами", 1), ("ями", 1), ("иями", 1),
    ("й", 1), ("ей", 1), ("ией", 1), ("ий", 1), ("ой", 1), ("ам", 1),
    ("ем", 1), ("ием", 1), ("ом", 1), ("ям", 1), ("иям", 1), ("о", 1),
    ("у", 1), ("ах", 1), ("ях", 1), ("иях", 1), ("ы", 1), ("ь", 1),
    ("ю", 1), ("ию", 1), ("ью", 1), ("я", 1), ("ия", 1), ("ья", 1),
])
_RU_DERIVATIONAL = _by_len([("ост", 1), ("ость", 1)])
_RU_TIDY = _by_len([("ейше", 1), ("ейш", 1), ("н", 2), ("ь", 3)])


def _ru_pv_p2(w: str) -> tuple[int, int]:
    """pV = after first vowel; p2 = standard R2 start."""
    n = len(w)
    pv = p2 = n
    i = 0
    while i < n and w[i] not in _RU_VOWELS:
        i += 1
    if i == n:
        return pv, p2
    i += 1
    pv = i
    while i < n and w[i] in _RU_VOWELS:
        i += 1
    if i == n:
        return pv, p2
    i += 1
    while i < n and w[i] not in _RU_VOWELS:
        i += 1
    if i == n:
        return pv, p2
    i += 1
    while i < n and w[i] in _RU_VOWELS:
        i += 1
    if i == n:
        return pv, p2
    p2 = i + 1
    return pv, p2


def _preceded_a_ya(w: str, cut: int, pv: int) -> bool:
    i = cut - 1
    return i >= pv and w[i] in "ая"


def russian_snowball_stem(w: str) -> str:
    """Snowball Russian (ru/RussianAnalyzer.java:141 default stemmer).

    'ё' folds to 'е' first (the algorithm's own substitution), then the
    suffix steps run inside RV: step 1 (perfective gerund | [reflexive]
    adjectival/verb/noun), trailing-'и' removal, derivational (R2),
    tidy-up (superlative / нн undouble / ь)."""
    w = w.replace("ё", "е")
    pv, p2 = _ru_pv_p2(w)
    if pv >= len(w):
        return w

    # step 1: perfective gerund, else [reflexive] adjectival|verb|noun
    suf, case = _match(w, pv, _RU_PERF_GERUND)
    done = False
    if case == 1 and _preceded_a_ya(w, len(w) - len(suf), pv):
        w = w[: len(w) - len(suf)]
        done = True
    elif case == 2:
        w = w[: len(w) - len(suf)]
        done = True
    if not done:
        suf, case = _match(w, pv, _RU_REFLEXIVE)
        if case:
            w = w[: len(w) - len(suf)]
        # adjectival = adjective [participle]
        suf, case = _match(w, pv, _RU_ADJECTIVE)
        if case:
            w = w[: len(w) - len(suf)]
            suf, case = _match(w, pv, _RU_PARTICIPLE)
            if case == 2 or (case == 1
                             and _preceded_a_ya(w, len(w) - len(suf), pv)):
                w = w[: len(w) - len(suf)]
        else:
            suf, case = _match(w, pv, _RU_VERB)
            if case == 2 or (case == 1
                             and _preceded_a_ya(w, len(w) - len(suf), pv)):
                w = w[: len(w) - len(suf)]
            else:
                suf, case = _match(w, pv, _RU_NOUN)
                if case:
                    w = w[: len(w) - len(suf)]

    # step 2: trailing и
    if w.endswith("и") and len(w) - 1 >= pv:
        w = w[:-1]

    # step 3: derivational, start must be in R2
    suf, case = _match(w, pv, _RU_DERIVATIONAL)
    if case and len(w) - len(suf) >= p2:
        w = w[: len(w) - len(suf)]

    # step 4: tidy up
    suf, case = _match(w, pv, _RU_TIDY)
    if case == 1:  # superlative; then undouble нн if present
        w = w[: len(w) - len(suf)]
        if w.endswith("нн") and len(w) - 2 >= pv:
            w = w[:-1]
    elif case == 2:  # matched single н — undouble only when doubled
        if w.endswith("нн") and len(w) - 2 >= pv:
            w = w[:-1]
    elif case == 3:
        w = w[: len(w) - len(suf)]
    return w


# ---------------------------------------------------------------------------
# Swedish (SwedishStemmer.java — snowball swedish.sbl)

_SV_VOWELS = frozenset("aeiouyäåö")
_SV_S_ENDING = frozenset("bcdfghjklmnoprtvy")
_SV_MAIN = _by_len([
    ("a", 1), ("arna", 1), ("erna", 1), ("heterna", 1), ("orna", 1),
    ("ad", 1), ("e", 1), ("ade", 1), ("ande", 1), ("arne", 1), ("are", 1),
    ("aste", 1), ("en", 1), ("anden", 1), ("aren", 1), ("heten", 1),
    ("ern", 1), ("ar", 1), ("er", 1), ("heter", 1), ("or", 1), ("s", 2),
    ("as", 1), ("arnas", 1), ("ernas", 1), ("ornas", 1), ("es", 1),
    ("ades", 1), ("andes", 1), ("ens", 1), ("arens", 1), ("hetens", 1),
    ("erns", 1), ("at", 1), ("andet", 1), ("het", 1), ("ast", 1),
])
_SV_PAIR = _by_len([(s, 1) for s in
                    ("dd", "gd", "nn", "dt", "gt", "kt", "tt")])
_SV_OTHER = _by_len([("ig", 1), ("lig", 1), ("els", 1),
                     ("fullt", 3), ("löst", 2)])


def _sv_p1(w: str) -> int:
    """R1 start, adjusted so the region before it is at least 3 chars."""
    n = len(w)
    if n < 3:
        return n
    p1, _ = _r1r2(w, _SV_VOWELS)
    return max(p1, 3)


def swedish_snowball_stem(w: str) -> str:
    """Snowball Swedish (sv/SwedishAnalyzer.java default stemmer)."""
    p1 = _sv_p1(w)
    # main suffix (in R1); the s-ending precondition char is NOT R1-bound
    suf, case = _match(w, p1, _SV_MAIN)
    if case == 1:
        w = w[: len(w) - len(suf)]
    elif case == 2 and len(w) >= 2 and w[-2] in _SV_S_ENDING:
        w = w[:-1]
    # consonant pair fully in R1 -> drop last char
    suf, case = _match(w, p1, _SV_PAIR)
    if case and len(w) > p1:
        w = w[:-1]
    # other suffix (in R1)
    suf, case = _match(w, p1, _SV_OTHER)
    if case == 1:
        w = w[: len(w) - len(suf)]
    elif case == 2:
        w = w[: len(w) - len(suf)] + "lös"
    elif case == 3:
        w = w[: len(w) - len(suf)] + "full"
    return w


# ---------------------------------------------------------------------------
# English / Porter2 (EnglishStemmer.java — snowball english.sbl)

_EN_VOWELS = frozenset("aeiouy")
_EN_V_WXY = frozenset("aeiouywxY")
_EN_VALID_LI = frozenset("cdeghkmnrt")
_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

_EN_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariant forms
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
# whole-word invariants checked after step 1a; skip steps 1b-5 when hit
_EN_EXCEPTION2 = frozenset((
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
))
# special prefixes that force the R1 start (mark_regions a_0)
_EN_R1_OVERRIDES = ("gener", "commun", "arsen")
_EN_STEP1A = _by_len([("sses", 1), ("ied", 2), ("ies", 2), ("s", 3),
                      ("ss", -1), ("us", -1)])
_EN_STEP1B = _by_len([("eedly", 1), ("eed", 1), ("edly", 2), ("ed", 2),
                      ("ingly", 2), ("ing", 2)])
_EN_STEP2 = _by_len([
    ("tional", "tion"), ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("entli", "ent"), ("ization", "ize"), ("izer", "ize"),
    ("ational", "ate"), ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("aliti", "al"), ("alli", "al"), ("fulness", "ful"), ("fulli", "ful"),
    ("ousness", "ous"), ("ousli", "ous"), ("iveness", "ive"),
    ("iviti", "ive"), ("biliti", "ble"), ("bli", "ble"), ("ogi", "@og"),
    ("lessli", "less"), ("li", "@"),
])
_EN_STEP3 = _by_len([
    ("tional", "tion"), ("ational", "ate"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"), ("ful", ""),
    ("ness", ""), ("ative", "@2"),
])
_EN_STEP4 = _by_len([
    ("al", 1), ("ance", 1), ("ence", 1), ("er", 1), ("ic", 1), ("able", 1),
    ("ible", 1), ("ant", 1), ("ement", 1), ("ment", 1), ("ent", 1),
    ("ion", 2), ("ism", 1), ("ate", 1), ("iti", 1), ("ous", 1),
    ("ive", 1), ("ize", 1),
])


def _en_shortv(w: str, p1: int) -> bool:
    """True when the word ends in a 'short syllable' (porter2 shortv):
    non-vowel + vowel + non-vowel-not-wxY, or a length-2 vowel+non-vowel
    word."""
    n = len(w)
    if n >= 3 and w[-1] not in _EN_V_WXY and w[-2] in _EN_VOWELS \
            and w[-3] not in _EN_VOWELS:
        return True
    return n == 2 and w[-2] in _EN_VOWELS and w[-1] not in _EN_VOWELS


def english_snowball_stem(w: str) -> str:
    """Snowball "english" / Porter2 — the reference's
    EnglishAnalyzer-with-SnowballFilter option and the `porter2`
    SnowballPorterFilterFactory language."""
    if len(w) < 3:
        return w
    exc = _EN_EXCEPTION1.get(w)
    if exc is not None:
        return exc
    # prelude
    if w.startswith("'"):
        w = w[1:]
    y_found = False
    if w.startswith("y"):
        w = "Y" + w[1:]
        y_found = True
    chars = list(w)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _EN_VOWELS:
            chars[i] = "Y"
            y_found = True
    w = "".join(chars)
    p1, p2 = _r1r2(w, _EN_VOWELS)
    # mark_regions override: for gener-/commun-/arsen- words R1 starts right
    # after the prefix and R2 is recomputed from there (english.sbl a_0).
    for pre in _EN_R1_OVERRIDES:
        if w.startswith(pre):
            p1 = len(pre)
            i, n = p1, len(w)
            while i < n and w[i] not in _EN_VOWELS:
                i += 1
            i += 1
            while i < n and w[i] in _EN_VOWELS:
                i += 1
            p2 = i + 1 if i < n else n
            break

    # step 1a (always runs; apostrophe strip first)
    for apo in ("'s'", "'s", "'"):
        if w.endswith(apo):
            w = w[: len(w) - len(apo)]
            break
    suf, case = _match(w, 0, _EN_STEP1A)
    if case == 1:
        w = w[:-4] + "ss"
    elif case == 2:
        w = w[:-3] + ("i" if len(w) - 3 >= 2 else "ie")
    elif case == 3:
        if any(c in _EN_VOWELS for c in w[:-2]):
            w = w[:-1]

    # exception list 2 (english.sbl exception2): these eight words stop
    # HERE, after step 1a — inning/proceed etc. stay invariant
    if w in _EN_EXCEPTION2:
        return w

    # step 1b
    suf, case = _match(w, 0, _EN_STEP1B)
    if case == 1:
        if len(w) - len(suf) >= p1:
            w = w[: len(w) - len(suf)] + "ee"
    elif case == 2:
        stem = w[: len(w) - len(suf)]
        if any(c in _EN_VOWELS for c in stem):
            w = stem
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif w.endswith(_EN_DOUBLES):
                w = w[:-1]
            elif len(w) == p1 and _en_shortv(w, p1):
                w += "e"

    # step 1c: y/Y after a non-vowel that is not the first char -> i
    if len(w) >= 3 and w[-1] in "yY" and w[-2] not in _EN_VOWELS:
        w = w[:-1] + "i"

    # step 2 (suffix in R1)
    suf, repl = _match(w, 0, _EN_STEP2)
    if suf and len(w) - len(suf) >= p1:
        if repl == "@":          # li: preceded by valid_LI
            if len(w) > 2 and w[-3] in _EN_VALID_LI:
                w = w[:-2]
        elif repl == "@og":      # ogi: preceded by l
            if w.endswith("logi"):
                w = w[:-1]
        else:
            w = w[: len(w) - len(suf)] + repl

    # step 3 (suffix in R1; ative needs R2)
    suf, repl = _match(w, 0, _EN_STEP3)
    if suf and len(w) - len(suf) >= p1:
        if repl == "@2":
            if len(w) - len(suf) >= p2:
                w = w[: len(w) - len(suf)]
        else:
            w = w[: len(w) - len(suf)] + repl

    # step 4 (suffix in R2)
    suf, case = _match(w, 0, _EN_STEP4)
    if suf and len(w) - len(suf) >= p2:
        if case == 1:
            w = w[: len(w) - len(suf)]
        elif case == 2 and len(w) > 3 and w[-4] in "st":
            w = w[:-3]

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= p2 or (len(w) - 1 >= p1
                                and not _en_shortv(w[:-1], p1)):
            w = w[:-1]
    elif w.endswith("ll") and len(w) - 1 >= p2:
        w = w[:-1]

    if y_found:
        w = w.replace("Y", "y")
    return w


# ---------------------------------------------------------------------------
# Finnish (FinnishStemmer.java — snowball finnish.sbl)

_FI_V1 = frozenset("aeiouyäö")
_FI_V2 = frozenset("aeiouäö")
_FI_PARTICLE_END = _FI_V1 | frozenset("nt")
_FI_C = frozenset("bcdfghjklmnpqrstvwxz")
_FI_AEI = frozenset("aeiä")
_FI_LONGV = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

_FI_PARTICLE = _by_len([
    ("kin", 1), ("kaan", 1), ("kään", 1), ("ko", 1), ("kö", 1),
    ("han", 1), ("hän", 1), ("pa", 1), ("pä", 1), ("sti", 2),
])
_FI_POSS = _by_len([
    ("si", 1), ("ni", 2), ("nsa", 3), ("nsä", 3), ("mme", 3), ("nne", 3),
    ("an", 4), ("än", 5), ("en", 6),
])
_FI_AN_PRE = ("lla", "na", "ssa", "ta", "lta", "sta")
_FI_AEN_PRE = ("llä", "nä", "ssä", "tä", "ltä", "stä")
_FI_EN_PRE = ("lle", "ine")


def _fi_long(w: str, cut: int, lim: int) -> bool:
    """r_LONG under limit_backward ``lim``: stem ends with a long vowel."""
    return cut - 2 >= lim and w[cut - 2:cut] in _FI_LONGV


def _fi_vi(w: str, cut: int, lim: int) -> bool:
    """r_VI: stem ends with 'i' preceded by a V2 vowel, inside the limit."""
    return cut - 2 >= lim and w[cut - 1] == "i" and w[cut - 2] in _FI_V2


# (suffix, case, among-level condition) — conditions fail over to shorter
# entries exactly like find_among_b's substring chain.
_FI_CASE = _by_len([
    ("a", 8, None), ("lla", 0, None), ("na", 0, None), ("ssa", 0, None),
    ("ta", 0, None), ("lta", 0, None), ("sta", 0, None), ("tta", 2, None),
    ("lle", 0, None), ("ine", 0, None), ("ksi", 0, None), ("n", 7, None),
    ("han", 1, None), ("den", 0, _fi_vi), ("seen", 0, _fi_long),
    ("hen", 2, None), ("tten", 0, _fi_vi), ("hin", 3, None),
    ("siin", 0, _fi_vi), ("hon", 4, None), ("hän", 5, None),
    ("hön", 6, None), ("ä", 8, None), ("llä", 0, None), ("nä", 0, None),
    ("ssä", 0, None), ("tä", 0, None), ("ltä", 0, None), ("stä", 0, None),
    ("ttä", 2, None),
])
_FI_CASE_VOWEL = {1: "a", 2: "e", 3: "i", 4: "o", 5: "ä", 6: "ö"}
_FI_OTHER = _by_len([
    ("eja", 0), ("ejä", 0), ("mma", 1), ("imma", 0), ("mpa", 1),
    ("impa", 0), ("mmi", 1), ("immi", 0), ("mpi", 1), ("impi", 0),
    ("mmä", 1), ("immä", 0), ("mpä", 1), ("impä", 0),
])


def _match_c(w: str, limit: int, among) -> tuple[str, int]:
    """_match with among-level conditions (find_among_b method fallback)."""
    for suf, case, cond in among:
        cut = len(w) - len(suf)
        if cut >= limit and w.endswith(suf):
            if cond is None or cond(w, cut, limit):
                return suf, case
    return "", 0


def finnish_snowball_stem(w: str) -> str:
    """Snowball Finnish (fi/FinnishAnalyzer.java default stemmer).

    Steps per finnish.sbl: particle_etc, possessive, case_ending,
    other_endings (R2), i_plural|t_plural, tidy. Region variables keep
    their pre-deletion values (all edits are suffix-only)."""
    p1, p2 = _r1r2(w, _FI_V1)
    ending_removed = False

    # particle_etc (suffix in R1; preceding-char check unbounded)
    suf, case = _match(w, p1, _FI_PARTICLE)
    if case == 1:
        cut = len(w) - len(suf)
        if cut >= 1 and w[cut - 1] in _FI_PARTICLE_END:
            w = w[:cut]
    elif case == 2:
        if len(w) - len(suf) >= p2:
            w = w[: len(w) - len(suf)]

    # possessive (suffix in R1; context checks unbounded)
    suf, case = _match(w, p1, _FI_POSS)
    cut = len(w) - len(suf)
    if case == 1:
        if not (cut >= 1 and w[cut - 1] == "k"):
            w = w[:cut]
    elif case == 2:
        w = w[:cut]
        if w.endswith("kse"):
            w = w[:-1] + "i"
    elif case == 3:
        w = w[:cut]
    elif case == 4:
        if w[:cut].endswith(_FI_AN_PRE):
            w = w[:cut]
    elif case == 5:
        if w[:cut].endswith(_FI_AEN_PRE):
            w = w[:cut]
    elif case == 6:
        if w[:cut].endswith(_FI_EN_PRE):
            w = w[:cut]

    # case_ending (suffix + among conditions in R1; switch checks unbounded)
    suf, case = _match_c(w, p1, _FI_CASE)
    if suf:
        cut = len(w) - len(suf)
        if case in _FI_CASE_VOWEL:
            if cut >= 1 and w[cut - 1] == _FI_CASE_VOWEL[case]:
                w = w[:cut]
                ending_removed = True
        elif case == 7:  # 'n': extend by one when stem ends LONG or 'ie'
            if cut >= 2 and (w[cut - 2:cut] in _FI_LONGV
                             or w[cut - 2:cut] == "ie"):
                cut -= 1
            w = w[:cut]
            ending_removed = True
        elif case == 8:  # 'a'/'ä' after consonant+vowel
            if cut >= 2 and w[cut - 1] in _FI_V1 and w[cut - 2] in _FI_C:
                w = w[:cut]
                ending_removed = True
        else:
            w = w[:cut]
            ending_removed = True

    # other_endings (suffix in R2; 'po' veto unbounded)
    suf, case = _match(w, p2, _FI_OTHER)
    if suf:
        cut = len(w) - len(suf)
        if case == 1:
            if not w[:cut].endswith("po"):
                w = w[:cut]
        else:
            w = w[:cut]

    if ending_removed:
        # i_plural: trailing i/j in R1
        if w[-1:] in ("i", "j") and len(w) - 1 >= p1:
            w = w[:-1]
    else:
        # t_plural: 't' preceded by a V1 vowel (vowel check bounded by R1:
        # eq_s_b('t') needs len-1 >= p1, in_grouping_b needs len-1 > p1)
        if w.endswith("t") and len(w) - 2 >= p1 and w[-2] in _FI_V1:
            w = w[:-1]
            suf, case = _match(w, p2, _by_len([("mma", 1), ("imma", 0)]))
            if suf:
                cut = len(w) - len(suf)
                if case == 1:
                    if not w[:cut].endswith("po"):
                        w = w[:cut]
                else:
                    w = w[:cut]

    # tidy (all checks bounded by R1)
    n = len(w)
    if n - 2 >= p1 and w[n - 2:] in _FI_LONGV:
        w = w[:-1]
    n = len(w)
    if n >= p1 + 2 and w[n - 1] in _FI_AEI and w[n - 2] in _FI_C:
        w = w[:-1]
    n = len(w)
    if n - 1 >= p1 and w.endswith("j") and n - 2 >= p1 and w[n - 2] in "ou":
        w = w[:-1]
    n = len(w)
    if n - 1 >= p1 and w.endswith("o") and n - 2 >= p1 and w[n - 2] == "j":
        w = w[:-1]
    # undouble the last consonant when doubled (scan back past vowels;
    # UNBOUNDED — finnish.sbl restores limit_backward before this step)
    c = len(w)
    while c > 0 and w[c - 1] in _FI_V1:
        c -= 1
    if c >= 2 and w[c - 1] in _FI_C and w[c - 2] == w[c - 1]:
        w = w[: c - 1] + w[c:]
    return w


# ---------------------------------------------------------------------------
# Hungarian (HungarianStemmer.java — snowball hungarian.sbl)

_HU_V = frozenset("aeiouáéíóöúüőű")
_HU_START_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = ("ccs", "zzs", "ggy", "lly", "nny", "tty", "ssz",
               "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm",
               "nn", "pp", "rr", "ss", "tt", "vv", "zz")
_HU_CASE = _by_len([(s, 1) for s in (
    "ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel", "ul",
    "nál", "nél", "ból", "ról", "tól", "ül", "ből", "ről", "től",
    "n", "an", "ban", "en", "ben", "képpen", "on", "ön", "képp", "kor",
    "t", "at", "et", "ként", "anként", "enként", "onként", "ot", "ért",
    "öt", "hez", "hoz", "höz", "vá", "vé",
)])
# replacement tables: "" = delete, otherwise the whole suffix becomes repl
_HU_CASE_SPECIAL = _by_len([("ánként", "a"), ("án", "a"), ("én", "e")])
_HU_CASE_OTHER = _by_len([
    ("stul", ""), ("astul", ""), ("ástul", "a"),
    ("stül", ""), ("estül", ""), ("éstül", "e"),
])
_HU_OWNED = _by_len([
    ("éi", ""), ("áéi", "a"), ("ééi", "e"), ("é", ""), ("ké", ""),
    ("aké", ""), ("eké", ""), ("oké", ""), ("áké", "a"), ("éké", "e"),
    ("öké", ""), ("éé", "e"),
])
_HU_SING_OWNER = _by_len([
    ("a", ""), ("ja", ""), ("d", ""), ("ad", ""), ("ed", ""), ("od", ""),
    ("ád", "a"), ("éd", "e"), ("öd", ""), ("e", ""), ("je", ""),
    ("nk", ""), ("unk", ""), ("ánk", "a"), ("énk", "e"), ("ünk", ""),
    ("uk", ""), ("juk", ""), ("ájuk", "a"), ("ük", ""), ("jük", ""),
    ("éjük", "e"), ("m", ""), ("am", ""), ("em", ""), ("om", ""),
    ("ám", "a"), ("ém", "e"), ("o", ""), ("á", "a"), ("é", "e"),
])
_HU_PLUR_OWNER = _by_len([
    ("id", ""), ("aid", ""), ("jaid", ""), ("eid", ""), ("jeid", ""),
    ("áid", "a"), ("éid", "e"), ("i", ""), ("ai", ""), ("jai", ""),
    ("ei", ""), ("jei", ""), ("ái", "a"), ("éi", "e"), ("itek", ""),
    ("eitek", ""), ("jeitek", ""), ("éitek", "e"), ("ik", ""),
    ("aik", ""), ("jaik", ""), ("eik", ""), ("jeik", ""), ("áik", "a"),
    ("éik", "e"), ("ink", ""), ("aink", ""), ("jaink", ""), ("eink", ""),
    ("jeink", ""), ("áink", "a"), ("éink", "e"), ("aitok", ""),
    ("jaitok", ""), ("áitok", "a"), ("im", ""), ("aim", ""),
    ("jaim", ""), ("eim", ""), ("jeim", ""), ("áim", "a"), ("éim", "e"),
])
_HU_PLURAL = _by_len([
    ("k", ""), ("ak", ""), ("ek", ""), ("ok", ""), ("ök", ""),
    ("ák", "a"), ("ék", "e"),
])


def _hu_p1(w: str) -> int:
    """hungarian.sbl mark_regions: vowel-initial words end R1 after the
    first consonant (a digraph from a_0 counts as one consonant);
    consonant-initial words end R1 after the first vowel."""
    n = len(w)
    if n == 0:
        return 0
    if w[0] in _HU_V:
        i = 0
        while i < n and w[i] in _HU_V:
            i += 1
        if i >= n:
            return n
        for d in _HU_START_DIGRAPHS:
            if w.startswith(d, i):
                return i + len(d)
        return i + 1
    i = 0
    while i < n and w[i] not in _HU_V:
        i += 1
    if i >= n:
        return n
    return i + 1


def _hu_replace(w: str, p1: int, among) -> str:
    """Longest unbounded suffix match from ``among``; apply when the
    suffix starts in R1 (no fallback on an R1 miss — r_R1 runs AFTER
    find_among_b in every Hungarian routine)."""
    for suf, repl in among:
        if w.endswith(suf):
            cut = len(w) - len(suf)
            if cut >= p1:
                return w[:cut] + repl
            return w
    return w


def hungarian_snowball_stem(w: str) -> str:
    """Snowball Hungarian (hu/HungarianAnalyzer.java default stemmer).

    Routine order per hungarian.sbl stem(): instrum, case, case_special,
    case_other, factive, owned, sing_owner, plur_owner, plural."""
    p1 = _hu_p1(w)

    # instrum: al/el after a doubled consonant -> delete + undouble
    suf, case = _match(w, 0, _by_len([("al", 1), ("el", 1)]))
    if case:
        cut = len(w) - len(suf)
        if cut >= p1 and w[:cut].endswith(_HU_DOUBLES):
            w = w[:cut]
            w = w[:-2] + w[-1]

    # case: delete case ending, then á->a / é->e on the new ending
    for suf, _case in _HU_CASE:
        if w.endswith(suf):
            cut = len(w) - len(suf)
            if cut >= p1:
                w = w[:cut]
                if w.endswith("á") and len(w) - 1 >= p1:
                    w = w[:-1] + "a"
                elif w.endswith("é") and len(w) - 1 >= p1:
                    w = w[:-1] + "e"
            break

    w = _hu_replace(w, p1, _HU_CASE_SPECIAL)
    w = _hu_replace(w, p1, _HU_CASE_OTHER)

    # factive: á/é after a doubled consonant -> delete + undouble
    suf, case = _match(w, 0, _by_len([("á", 1), ("é", 1)]))
    if case:
        cut = len(w) - len(suf)
        if cut >= p1 and w[:cut].endswith(_HU_DOUBLES):
            w = w[:cut]
            w = w[:-2] + w[-1]

    w = _hu_replace(w, p1, _HU_OWNED)
    w = _hu_replace(w, p1, _HU_SING_OWNER)
    w = _hu_replace(w, p1, _HU_PLUR_OWNER)
    w = _hu_replace(w, p1, _HU_PLURAL)
    return w
