"""Korean morphological tokenizer (nori-lite) — a dictionary-driven
Viterbi segmenter with the reference's lattice + POS-filter shape
(analysis/nori/src/java/.../ko/KoreanTokenizer.java:95,
ko/KoreanPartOfSpeechStopFilter.java:36, ko/dict/UserDictionary.java:30)
over a REDUCED public dictionary:

* user dictionary — the reference's nori userdict format: one entry per
  line, either a noun (``세종``) or a compound with its segmentation
  (``세종시 세종 시`` — surface first, then the parts). A matched user
  entry outranks every other path (UserDictionary.WORD_COST = -100000)
  and decompounds per ``decompound_mode``:
  - ``discard`` (the reference default, DecompoundMode.DISCARD): emit the
    parts only;
  - ``none``: emit the whole surface;
  - ``mixed``: emit the surface AND the parts (surface first, same start
    offset — DecompoundMode.MIXED).
* built-in function-morpheme lexicon — the common josa (particles, POS J)
  and eomi (verbal endings, POS E): standard textbook Korean grammar,
  public knowledge, standing in for the mecab-ko-dic entries the
  reference bundles as binary data. The lattice strips them off the END
  of a Hangul run when that beats absorbing them (a run-internal match
  would cost an extra unknown arc and never wins), which reproduces the
  noun+josa / stem+eomi splits the full dictionary produces for regular
  words.
* unknown words — CharType-style rules: Hangul spans of ANY length inside
  a run are candidate unknown arcs (cost grows with length, so stripping
  a known suffix always beats absorbing it); Latin-alpha and digit runs
  group into one token (SL / SN); Hanja are single-character tokens (SH;
  the reference resolves most Hanja through mecab-ko-dic — documented
  divergence); punctuation/space tokens carry POS SP and are dropped by
  ``discard_punctuation`` / the POS filter.

POS tags use the reference's POS.Tag names (J folds JKS/JKB/JX/JC like
KoreanPartOfSpeechStopFilter's J group). KoreanReadingFormFilter (Hanja →
Hangul reading) is a documented no-op: readings require the full
mecab-ko-dic. KoreanNumberFilter is provided separately
(``korean_number_normalize``).

Viterbi minimizes summed word costs exactly like the kuromoji-lite
lattice (functions/kuromoji.py); connection costs fold to zero (no POS
matrix in the reduced dictionary)."""

from __future__ import annotations

__all__ = [
    "KoreanTokenizer", "parse_user_dict", "pos_stop_filter",
    "korean_number_normalize", "DEFAULT_STOP_TAGS", "JOSA", "EOMI",
]

# cost model shared with ja/zh — see functions/lattice.py
from lucene_ray.functions.lattice import (KNOWN_COST as _KNOWN_COST,
                                          UNK_CHAR_COST as _UNK_CHAR_COST,
                                          UNK_GROUP_BASE as _UNK_GROUP_BASE,
                                          UNK_GROUP_PER_CHAR
                                          as _UNK_GROUP_PER_CHAR,
                                          USER_COST as _USER_COST,
                                          viterbi_segment)

_MAX_UNK_SPAN = 24  # lattice arcs per position bound (runs are whitespace-delimited)

# josa — case/topic/conjunctive particles (POS group J)
JOSA = frozenset((
    "은", "는", "이", "가", "을", "를", "의", "에", "에서", "에게",
    "께", "께서", "로", "으로", "로서", "으로서", "로써", "으로써",
    "와", "과", "도", "만", "보다", "부터", "까지", "처럼", "조차",
    "마저", "라도", "이라도", "나", "이나", "든지", "이든지", "야",
    "아", "랑", "이랑", "하고", "대로", "만큼", "밖에", "한테",
    "더러", "같이", "마다", "야말로", "이야말로",
))

# eomi — sentence-final / connective verbal endings (POS group E)
EOMI = frozenset((
    "다", "요", "죠", "네", "며", "고", "면", "니", "지만", "거나",
    "려고", "면서", "도록", "으며", "으면", "다가", "습니다", "습니까",
    "니다", "었다", "았다", "였다", "는다", "네요", "어요", "아요",
    "예요", "에요", "했다", "한다", "하다", "해서", "하여", "하고",
    "되다", "된다", "됐다", "였습니다", "았습니다", "었습니다",
    "합니다", "됩니다", "입니다", "합니까", "했습니다",
))

# KoreanPartOfSpeechStopFilter.DEFAULT_STOP_TAGS (ko/KoreanPartOfSpeech
# StopFilter.java:36-56)
DEFAULT_STOP_TAGS = frozenset((
    "E", "IC", "J", "MAG", "MAJ", "MM", "SP", "SSC", "SSO", "SC", "SE",
    "XPN", "XSA", "XSN", "XSV", "UNA", "NA", "VSV",
))


def _char_class(c: str) -> str:
    o = ord(c)
    if 0xAC00 <= o <= 0xD7A3 or 0x1100 <= o <= 0x11FF or 0x3130 <= o <= 0x318F:
        return "hangul"
    if (0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF
            or 0x20000 <= o <= 0x2FA1F or 0xF900 <= o <= 0xFAFF):
        return "hanja"
    if c.isalpha():
        return "alpha"
    if c.isdigit():
        return "digit"
    if c.isspace():
        return "space"
    return "punct"


# classes whose unknown runs GROUP into one token; hangul spans get
# variable-length arcs instead (see module docstring), hanja is per-char
_GROUPING = {"alpha", "digit", "space", "punct"}
_CLS_POS = {"alpha": "SL", "digit": "SN", "hanja": "SH",
            "space": "SP", "punct": "SP", "hangul": "UNKNOWN"}


def parse_user_dict(lines) -> dict[str, tuple[str, ...]]:
    """nori userdict → {surface: (segment, ...)}. ``세종`` → ("세종",);
    ``세종시 세종 시`` → ("세종", "시")."""
    out: dict[str, tuple[str, ...]] = {}
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        surface = parts[0]
        segs = tuple(parts[1:]) if len(parts) > 1 else (surface,)
        if "".join(segs) != surface:
            # UserDictionary.java rejects a segmentation that doesn't
            # concatenate to its surface; accepting it silently would drop
            # text / emit wrong offsets
            raise ValueError(
                f"user dictionary entry {line!r}: segments "
                f"{' '.join(segs)!r} do not concatenate to {surface!r}")
        out[surface] = segs
    return out


class KoreanTokenizer:
    """→ [(surface, start, end, pos)] per ``tokenize``; POS filtering is
    a separate step (``pos_stop_filter``) matching the reference's
    tokenizer/filter split."""

    def __init__(self, user_dict=None, decompound_mode: str = "discard",
                 discard_punctuation: bool = True,
                 josa=None, eomi=None):
        if isinstance(user_dict, (list, tuple)) or user_dict is None:
            self.user = parse_user_dict(user_dict or ())
        else:
            self.user = dict(user_dict)
        if decompound_mode not in ("discard", "none", "mixed"):
            raise ValueError(f"decompound_mode: {decompound_mode!r}")
        self.mode = decompound_mode
        self.discard_punctuation = discard_punctuation
        self.josa = frozenset(JOSA if josa is None else josa)
        self.eomi = frozenset(EOMI if eomi is None else eomi)
        self._max_user = max((len(s) for s in self.user), default=0)
        self._max_josa = max((len(s) for s in self.josa), default=0)
        self._max_eomi = max((len(s) for s in self.eomi), default=0)

    def _suffix_arcs(self, text: str, classes, run_end):
        """{position: ((length, tag), ...)} for josa/eomi arcs that sit on
        a valid SUFFIX CHAIN of a Hangul run: every arc is followed (to
        the run's end) by further josa/eomi arcs only, and at least one
        stem character precedes the chain. Stacked particles (에서+는)
        chain; run-initial matches never strip."""
        out: dict[int, list[tuple[int, str]]] = {}
        mx = max(self._max_josa, self._max_eomi)
        i = 0
        n = len(text)
        while i < n:
            if classes[i] != "hangul":
                i += 1
                continue
            end = run_end[i]
            # ok[k] = suffix text[k:end] decomposes into lexicon entries
            ok = [False] * (end - i + 1)
            ok[end - i] = True
            for k in range(end - 1, i, -1):  # k > i: stem must precede
                arcs_here = []
                for ln in range(1, min(mx, end - k) + 1):
                    if not ok[k + ln - i]:
                        continue
                    frag = text[k:k + ln]
                    if frag in self.josa:
                        arcs_here.append((ln, "J"))
                    elif frag in self.eomi:
                        arcs_here.append((ln, "E"))
                if arcs_here:
                    ok[k - i] = True
                    out[k] = arcs_here
            i = end
        return out

    def tokenize(self, text: str) -> list[tuple[str, int, int, str]]:
        n = len(text)
        if n == 0:
            return []
        classes = [_char_class(c) for c in text]
        # end of the contiguous same-class run starting at each position
        run_end = [0] * n
        j = n
        for i in range(n - 1, -1, -1):
            if i == n - 1 or classes[i] != classes[i + 1]:
                j = i + 1
            run_end[i] = j

        suffix_arcs = self._suffix_arcs(text, classes, run_end)

        def arcs_at(i):
            # user-dictionary arcs
            for ln in range(min(self._max_user, n - i), 0, -1):
                segs = self.user.get(text[i:i + ln])
                if segs is not None:
                    yield ln, _USER_COST + ln, "user", segs
            # josa / eomi arcs (function morphemes): suffix chains only —
            # precomputed per run (see _suffix_arcs); a run-initial or
            # run-internal match would shave the unknown arc by its length
            # at +100, stripping common noun syllables
            for ln, tag in suffix_arcs.get(i, ()):
                yield ln, _KNOWN_COST, tag, None
            cls = classes[i]
            if cls == "hangul":
                # variable-length unknown spans within the run: stripping a
                # known suffix is cheaper than absorbing it
                stop = min(run_end[i], i + _MAX_UNK_SPAN)
                for j2 in range(i + 1, stop + 1):
                    ln = j2 - i
                    yield (ln, _UNK_GROUP_BASE + _UNK_GROUP_PER_CHAR * ln,
                           "hangul", None)
            elif cls in _GROUPING:
                ln = run_end[i] - i
                yield ln, _UNK_GROUP_BASE + _UNK_GROUP_PER_CHAR * ln, cls, None
            # single-char fallback (hanja; keeps the lattice connected)
            yield 1, _UNK_CHAR_COST, "char:" + cls, None

        spans = viterbi_segment(n, arcs_at)
        out: list[tuple[str, int, int, str]] = []
        for i, j, kind, segs in spans:
            cls = kind[5:] if kind.startswith("char:") else kind
            if cls in ("punct", "space"):
                if not self.discard_punctuation:
                    out.append((text[i:j], i, j, "SP"))
                continue
            if kind == "user" and segs is not None:
                if self.mode in ("none", "mixed"):
                    out.append((text[i:j], i, j, "NNG"))
                # discard: parts only; mixed: parts too unless the entry is
                # a plain noun (single segment == its own surface)
                if self.mode == "discard" or (self.mode == "mixed"
                                              and len(segs) > 1):
                    pos = i
                    for seg in segs:
                        out.append((seg, pos, pos + len(seg), "NNG"))
                        pos += len(seg)
            elif kind in ("J", "E"):
                out.append((text[i:j], i, j, kind))
            else:
                out.append((text[i:j], i, j, _CLS_POS.get(cls, "UNKNOWN")))
        return out

    def tokenize_surfaces(self, text: str,
                          stop_tags=DEFAULT_STOP_TAGS) -> list[str]:
        """Tokenize + KoreanPartOfSpeechStopFilter in one call (the
        analyzer chain's hot path)."""
        return [s for s, _a, _b, p in self.tokenize(text)
                if p not in stop_tags]


def pos_stop_filter(tokens, stop_tags=DEFAULT_STOP_TAGS):
    """KoreanPartOfSpeechStopFilter (ko/KoreanPartOfSpeechStopFilter.java):
    drop tokens whose POS tag is in ``stop_tags``."""
    return [t for t in tokens if t[3] not in stop_tags]


_KO_DIGITS = {"영": 0, "일": 1, "이": 2, "삼": 3, "사": 4,
              "오": 5, "육": 6, "칠": 7, "팔": 8, "구": 9}
_KO_SMALL = {"십": 10, "백": 100, "천": 1000}
_KO_BIG = {"만": 10_000, "억": 100_000_000, "조": 1_000_000_000_000}


def korean_number_normalize(token: str) -> str:
    """KoreanNumberFilter (ko/KoreanNumberFilter.java): normalize Korean
    hanja-style numerals to Arabic digits — ``일조육백만십일`` →
    ``1000006000011``. Non-numeral tokens pass through unchanged; mixed
    digit+numeral tokens (``3천`` → 3000) are supported like the
    reference's combined spans."""
    if not token:
        return token
    ok = all(c in _KO_DIGITS or c in _KO_SMALL or c in _KO_BIG
             or c.isdigit() or c in ".," for c in token)
    if not ok or not any(c in _KO_DIGITS or c in _KO_SMALL or c in _KO_BIG
                         for c in token):
        return token
    total = 0       # sum of completed big-unit groups
    section = 0     # current group below the next big unit
    num = 0         # current literal number run
    digits = ""     # pending ascii-digit run
    for c in token:
        if c in ",":
            continue
        if c.isdigit():
            digits += c
            continue
        if digits:
            num = int(digits)
            digits = ""
        if c in _KO_DIGITS:
            num = num * 10 + _KO_DIGITS[c]
        elif c in _KO_SMALL:
            section += (num if num else 1) * _KO_SMALL[c]
            num = 0
        elif c in _KO_BIG:
            total += (section + (num if num else (1 if section == 0 else 0))
                      ) * _KO_BIG[c]
            section = 0
            num = 0
        else:  # '.' — decimal point: bail out, pass through unchanged
            return token
    if digits:
        num = int(digits)
    value = total + section + num
    return str(value)
