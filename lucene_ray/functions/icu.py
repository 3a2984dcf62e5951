"""ICU-style normalization — the NFKC_Casefold slice of the reference's
ICU module implementable from pure Unicode data (analysis/icu/src/java/
.../ICUNormalizer2Filter.java:47, default normalizer ``nfkc_cf``).

Per Unicode (UAX #44 NFKC_CF): casefold + NFKC iterated to a fixpoint,
then Default_Ignorable_Code_Point characters removed. The ignorable set
here is the format-character core of that property: category Cf MINUS the
prepended concatenation marks (Arabic number signs etc., which are NOT
default-ignorable), plus variation selectors, the combining grapheme
joiner, Mongolian free variation selectors, and the Hangul filler
letters."""

from __future__ import annotations

import unicodedata

__all__ = ["icu_normalize"]

# Cf code points that are Prepended_Concatenation_Mark (NOT ignorable)
_PCM = frozenset((0x0600, 0x0601, 0x0602, 0x0603, 0x0604, 0x0605,
                  0x06DD, 0x070F, 0x0890, 0x0891, 0x08E2, 0x110BD,
                  0x110CD))
# non-Cf default ignorables handled explicitly
_EXTRA_IGNORABLE = frozenset((0x034F, 0x115F, 0x1160, 0x17B4, 0x17B5,
                              0x3164, 0xFFA0))


def _is_default_ignorable(c: str) -> bool:
    o = ord(c)
    if o in _EXTRA_IGNORABLE:
        return True
    if 0xFE00 <= o <= 0xFE0F or 0xE0100 <= o <= 0xE01EF \
            or 0x180B <= o <= 0x180F or o == 0xE0001 \
            or 0xE0020 <= o <= 0xE007F:
        return True
    # Cf code points EXCLUDED from Default_Ignorable_Code_Point besides
    # the PCM set: interlinear-annotation controls and Egyptian-hieroglyph
    # format controls (PropList.txt)
    if 0xFFF9 <= o <= 0xFFFB or 0x13430 <= o <= 0x1345F:
        return False
    return unicodedata.category(c) == "Cf" and o not in _PCM


def icu_normalize(t: str) -> str:
    """NFKC_Casefold analogue: ``nfkc_cf`` of ICUNormalizer2Filter's
    default chain. ASCII fast path keeps the hot loop cheap (ASCII is
    closed under NFKC; casefold = lower there)."""
    if t.isascii():
        return t.lower()
    prev = None
    while t != prev:
        prev = t
        t = unicodedata.normalize("NFKC", t.casefold())
    if any(_is_default_ignorable(c) for c in t):
        t = "".join(c for c in t if not _is_default_ignorable(c))
    return t


# ------------------------------------------------------ collation sort keys

_LEVEL_SEP = "\x01"  # sorts before every letter, after the empty string


def collation_key(text: str, strength: str = "tertiary") -> str:
    """ICUCollationKeyAnalyzer analogue (analysis/icu/src/java/.../
    ICUCollationKeyAnalyzer.java): map a field value to a SORTABLE key so
    byte order == collation order. The reference emits ICU binary sort
    keys for a full tailored locale; this is the UCA root-order slice
    implementable from pure Unicode data — a level-concatenated key:

    * primary — NFKD base letters, casefolded (accents and case ignored);
    * secondary — the combining marks in occurrence order (accents break
      primary ties: cote < coté < côte < côté, since U+0301 < U+0302 and
      a mark-less prefix sorts first);
    * tertiary — case bits per base char (lowercase before uppercase,
      the UCA default).

    ``strength`` ∈ {"primary", "secondary", "tertiary"} truncates levels
    like Collator.setStrength. Locale tailorings (sv å>z, de-phonebook
    ä=ae, ...) are out of scope — documented divergence; root order only.
    Keys from different strengths are not mutually comparable."""
    import unicodedata

    nfd = unicodedata.normalize("NFKD", text)
    primary: list[str] = []
    secondary: list[str] = []
    tertiary: list[str] = []
    for c in nfd:
        if unicodedata.category(c) == "Mn":
            # positional: the mark REPLACES this slot's common weight so
            # the same accent on different letters compares at the right
            # index (cóte != coté; UCA secondary weights are a sequence)
            secondary.append(c)
            continue
        primary.append(c.casefold())
        secondary.append("\x02")  # common secondary weight, < any mark
        if c.isalpha():
            tertiary.append("b" if c.isupper() else "a")
        else:
            tertiary.append("a")
    key = "".join(primary)
    if strength == "primary":
        return key
    key += _LEVEL_SEP + "".join(secondary)
    if strength == "secondary":
        return key
    if strength != "tertiary":
        raise ValueError(f"strength: {strength!r}")
    return key + _LEVEL_SEP + "".join(tertiary)


def collation_keys_batch(texts, strength: str = "tertiary"):
    """Arrow-friendly helper: list/array of strings → list of keys (use
    inside ``map_batches`` to add a sortable docvalue column)."""
    return [collation_key(t, strength) if t is not None else None
            for t in texts]
