"""Japanese morphological tokenizer (kuromoji-lite) — a dictionary-driven
Viterbi segmenter with the reference's lattice shape
(analysis/kuromoji/src/java/.../ja/JapaneseTokenizer.java:95,
dict/UserDictionary.java, dict/UnknownDictionary.java) over a REDUCED
public dictionary:

* user dictionary — the reference's userdict.txt format
  (``surface,seg1 seg2 ...,reading1 reading2 ...,pos``); a matched user
  entry strongly outranks every other path and is emitted as its
  SEGMENTATION (one token per segment, offsets split accordingly), exactly
  UserDictionary's behavior.
* built-in lexicon — a small set of common Japanese function words
  (particles, copula/auxiliary forms, demonstratives: standard textbook
  grammar, public knowledge), standing in for the MeCab-ipadic entries the
  reference bundles as binary data. Extendable per instance.
* unknown words — the CharacterDefinition class rules: KATAKANA, LATIN
  (alpha), and DIGIT runs group into one token; KANJI and HIRAGANA are
  single-character tokens; punctuation/space tokens are produced and then
  dropped when ``discard_punctuation`` (the analyzer default).

Viterbi minimizes summed word costs (user << known << unknown; unknown
cost grows with length so two known words beat one unknown span).
Connection costs are folded to zero — the reduced dictionary has no POS
matrix; divergences from full-ipadic segmentation are expected and the
goldens below only assert cases the user dictionary / unknown rules
determine. Mode SEARCH's long-token decomposition penalty is a no-op
without the big dictionary; the ``mode`` argument is accepted for API
parity."""

from __future__ import annotations

import unicodedata

__all__ = ["JapaneseTokenizer", "parse_user_dict", "cjk_width_fold",
           "katakana_stem", "JAPANESE_STOP_WORDS", "DEFAULT_JA_LEXICON"]

# costs: any user path beats any non-user path; a known word beats unknown
# single chars covering the same span; unknown groups are preferred over
# per-char unknown splits (one arc vs many). Shared with ko/zh — see
# functions/lattice.py.
from lucene_ray.functions.lattice import (KNOWN_COST as _KNOWN_COST,
                                          UNK_CHAR_COST as _UNK_CHAR_COST,
                                          UNK_GROUP_BASE as _UNK_GROUP_BASE,
                                          UNK_GROUP_PER_CHAR
                                          as _UNK_GROUP_PER_CHAR,
                                          USER_COST as _USER_COST,
                                          viterbi_segment)

# common function words — particles, copula/auxiliary inflections,
# demonstratives, frequent adverbs (textbook Japanese grammar)
DEFAULT_JA_LEXICON = frozenset((
    "これ", "それ", "あれ", "この", "その", "あの", "ここ", "そこ",
    "あそこ", "こと", "もの", "ため", "よう", "ところ",
    "は", "が", "を", "に", "で", "と", "も", "の", "や", "へ", "から",
    "まで", "より", "ね", "よ", "か", "な", "なら", "ので", "のに",
    "けど", "けれど", "しかし", "そして", "また",
    "です", "ます", "でし", "まし", "ません", "でした", "ました",
    "だ", "だっ", "であ", "ある", "あり", "ない", "なく", "なかっ",
    "する", "し", "せ", "さ", "れる", "れ", "られ", "いる", "い",
    "う", "た", "て", "ても", "たら", "たり", "ば", "ず", "ぬ",
    "なる", "なり", "なっ", "でき", "その他",
))

# ja/stopwords.txt (the reference JapaneseAnalyzer default stop set)
JAPANESE_STOP_WORDS = frozenset((
    "の", "に", "は", "を", "た", "が", "で", "て", "と", "し", "れ",
    "さ", "ある", "いる", "も", "する", "から", "な", "こと", "として",
    "い", "や", "れる", "など", "なっ", "ない", "この", "ため", "その",
    "あっ", "よう", "また", "もの", "という", "あり", "まで", "られ",
    "なる", "へ", "か", "だ", "これ", "によって", "により", "おり",
    "より", "による", "ず", "なり", "られる", "において", "ば", "なかっ",
    "なく", "しかし", "について", "せ", "だっ", "その後", "できる",
    "それ", "う", "ので", "なお", "のみ", "でき", "き", "つ", "における",
    "および", "いう", "さらに", "でも", "ら", "たり", "その他",
    "に関する", "たち", "ます", "ん", "なら", "に対して", "特に",
    "せる", "及び", "これら", "とき", "では", "にて", "ほか", "ながら",
    "うち", "そして", "とともに", "ただし", "かつて", "それぞれ",
    "または", "お", "ほど", "ものの", "に対する", "ほとんど", "と共に",
    "といった", "です", "とも", "ところ", "ここ",
))


def _char_class(c: str) -> str:
    o = ord(c)
    if 0x30A0 <= o <= 0x30FF or 0x31F0 <= o <= 0x31FF:
        return "katakana"
    if 0x3040 <= o <= 0x309F:
        return "hiragana"
    if (0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF
            or 0x20000 <= o <= 0x2FA1F or 0xF900 <= o <= 0xFAFF):
        return "kanji"
    if c.isalpha():
        return "alpha"
    if c.isdigit():
        return "digit"
    if c.isspace():
        return "space"
    return "punct"


# classes whose unknown runs GROUP into one token (CharacterDefinition:
# KATAKANA/ALPHA/NUMERIC group=true; KANJI/HIRAGANA group=false)
_GROUPING = {"katakana", "alpha", "digit", "punct", "space"}


def parse_user_dict(lines) -> dict[str, tuple[str, ...]]:
    """userdict.txt → {surface: (segment, ...)} (readings/POS kept out of
    the token stream like the reference's surface-only CharTermAttribute)."""
    out: dict[str, tuple[str, ...]] = {}
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = [p.strip() for p in line.split(",")]
        if len(parts) < 2:
            continue
        surface, segs = parts[0], tuple(parts[1].split())
        if surface and segs:
            if "".join(segs) != surface:
                # dict/UserDictionary.java throws on a segmentation that
                # doesn't add back up to the surface (offset misalignment)
                raise ValueError(
                    f"user dictionary entry {raw!r}: segments "
                    f"{parts[1]!r} do not concatenate to {surface!r}")
            out[surface] = segs
    return out


class JapaneseTokenizer:
    def __init__(self, user_dict=None, lexicon=None,
                 discard_punctuation: bool = True, mode: str = "search"):
        if isinstance(user_dict, (list, tuple)) or user_dict is None:
            self.user = parse_user_dict(user_dict or ())
        else:
            self.user = dict(user_dict)
        self.lexicon = frozenset(
            DEFAULT_JA_LEXICON if lexicon is None else lexicon)
        self.discard_punctuation = discard_punctuation
        self.mode = mode
        self._max_user = max((len(s) for s in self.user), default=0)
        self._max_known = max((len(s) for s in self.lexicon), default=0)

    def tokenize(self, text: str) -> list[tuple[str, int, int]]:
        """→ [(surface, start_offset, end_offset)] — user entries already
        split into their segments."""
        n = len(text)
        if n == 0:
            return []
        classes = [_char_class(c) for c in text]

        def arcs_at(i):
            # user-dictionary arcs
            for ln in range(min(self._max_user, n - i), 0, -1):
                segs = self.user.get(text[i:i + ln])
                if segs is not None:
                    yield ln, _USER_COST + ln, "user", segs
            # known-lexicon arcs
            for ln in range(min(self._max_known, n - i), 0, -1):
                if text[i:i + ln] in self.lexicon:
                    yield ln, _KNOWN_COST, "known", None
            # unknown arcs by character class
            cls = classes[i]
            if cls in _GROUPING:
                j = i + 1
                while j < n and classes[j] == cls:
                    j += 1
                ln = j - i
                yield ln, _UNK_GROUP_BASE + _UNK_GROUP_PER_CHAR * ln, cls, None
            # single-char unknown always available (kanji/hiragana, and the
            # fallback that keeps the lattice connected)
            yield 1, _UNK_CHAR_COST, "char:" + cls, None

        spans = viterbi_segment(n, arcs_at)
        out: list[tuple[str, int, int]] = []
        for i, j, kind, segs in spans:
            cls = kind[5:] if kind.startswith("char:") else kind
            if self.discard_punctuation and cls in ("punct", "space"):
                continue
            if kind == "user" and segs is not None:
                pos = i
                for seg in segs:
                    out.append((seg, pos, pos + len(seg)))
                    pos += len(seg)
            else:
                out.append((text[i:j], i, j))
        return out

    def tokenize_surfaces(self, text: str) -> list[str]:
        return [s for s, _a, _b in self.tokenize(text)]


def cjk_width_fold(t: str) -> str:
    """CJKWidthFilter (analysis/common/.../cjk/CJKWidthFilter.java): fold
    fullwidth ASCII variants to basic latin and halfwidth katakana to
    fullwidth (NFKC on exactly those compatibility classes)."""
    if t.isascii():
        return t
    out = []
    folded = False
    for c in t:
        o = ord(c)
        # exactly the reference's two ranges (CJKWidthFilter.java:36-44):
        # fullwidth ASCII and halfwidth katakana (+ the voiced-sound
        # marks at FF9E/FF9F inside that range) — NOT halfwidth
        # punctuation/Hangul/signs, which the filter leaves untouched
        if 0xFF01 <= o <= 0xFF5E or 0xFF65 <= o <= 0xFF9F:
            out.append(unicodedata.normalize("NFKC", c))
            folded = True
        else:
            out.append(c)
    s = "".join(out)
    # halfwidth voiced-sound marks fold to combining marks — compose them
    # (the reference combines ｶ+ﾞ into ガ)
    return unicodedata.normalize("NFC", s) if folded else s


def katakana_stem(t: str, minimum_length: int = 4) -> str:
    """JapaneseKatakanaStemFilter: drop one trailing prolonged-sound mark
    (U+30FC) from katakana terms of at least ``minimum_length`` chars."""
    if len(t) >= minimum_length and t.endswith("ー") \
            and all(_char_class(c) == "katakana" for c in t):
        return t[:-1]
    return t
