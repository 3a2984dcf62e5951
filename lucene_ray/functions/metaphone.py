"""Double Metaphone phonetic encoder — Lawrence Philips' published
algorithm (C/C++ Users Journal, June 2000), the commons-codec
``language/DoubleMetaphone`` semantics the reference's
DoubleMetaphoneFilter wraps
(analysis/phonetic/src/java/.../DoubleMetaphoneFilter.java:28).

``double_metaphone_codes(value, max_len)`` returns (primary, alternate)
codes, both capped at ``max_len`` (commons-codec default 4). Encoding is
over the cleaned input: trimmed, uppercased; empty → ("", "")."""

from __future__ import annotations

__all__ = ["double_metaphone_codes", "double_metaphone"]

_VOWELS = "AEIOUY"
_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = (
    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


class _Result:
    __slots__ = ("primary", "alternate", "max_len")

    def __init__(self, max_len: int):
        self.primary = []
        self.alternate = []
        self.max_len = max_len

    def append(self, p: str, a: str | None = None):
        self.append_primary(p)
        self.append_alternate(p if a is None else a)

    def append_primary(self, s: str):
        room = self.max_len - len(self.primary)
        if room > 0:
            self.primary.extend(s[:room])

    def append_alternate(self, s: str):
        room = self.max_len - len(self.alternate)
        if room > 0:
            self.alternate.extend(s[:room])

    def complete(self) -> bool:
        return (len(self.primary) >= self.max_len
                and len(self.alternate) >= self.max_len)


def _char(v: str, i: int) -> str:
    return v[i] if 0 <= i < len(v) else "\0"


def _is_vowel(c: str) -> bool:
    return c in _VOWELS


def _contains(v: str, start: int, length: int, *criteria: str) -> bool:
    if start < 0 or start + length > len(v):
        return False
    return v[start:start + length] in criteria


def _slavo_germanic(v: str) -> bool:
    return "W" in v or "K" in v or "CZ" in v or "WITZ" in v


def _cond_c0(v: str, i: int) -> bool:
    if _contains(v, i, 4, "CHIA"):
        return True
    if i <= 1:
        return False
    if _is_vowel(_char(v, i - 2)):
        return False
    if not _contains(v, i - 1, 3, "ACH"):
        return False
    c = _char(v, i + 2)
    return (c != "I" and c != "E") or _contains(v, i - 2, 6, "BACHER",
                                                "MACHER")


def _cond_ch0(v: str, i: int) -> bool:
    if i != 0:
        return False
    if not (_contains(v, i + 1, 5, "HARAC", "HARIS")
            or _contains(v, i + 1, 3, "HOR", "HYM", "HIA", "HEM")):
        return False
    return not _contains(v, 0, 5, "CHORE")


def _cond_ch1(v: str, i: int) -> bool:
    return ((_contains(v, 0, 4, "VAN ", "VON ") or _contains(v, 0, 3, "SCH"))
            or _contains(v, i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
            or _contains(v, i + 2, 1, "T", "S")
            or ((_contains(v, i - 1, 1, "A", "O", "U", "E") or i == 0)
                and (_contains(v, i + 2, 1, *_L_R_N_M_B_H_F_V_W_SPACE)
                     or i + 1 == len(v) - 1)))


def _handle_ch(v, r, i):
    if i > 0 and _contains(v, i, 4, "CHAE"):
        r.append("K", "X")
        return i + 2
    if _cond_ch0(v, i):
        r.append("X")
        return i + 2
    if _cond_ch1(v, i):
        r.append("K")
        return i + 2
    if i > 0:
        if _contains(v, 0, 2, "MC"):
            r.append("K")
        else:
            r.append("X", "K")
    else:
        r.append("X")
    return i + 2


def _handle_cc(v, r, i):
    if _contains(v, i + 2, 1, "I", "E", "H") \
            and not _contains(v, i + 2, 2, "HU"):
        if (i == 1 and _char(v, i - 1) == "A") \
                or _contains(v, i - 1, 5, "UCCEE", "UCCES"):
            r.append("KS")
        else:
            r.append("X")
        return i + 3
    r.append("K")
    return i + 2


def _handle_c(v, r, i):
    if _cond_c0(v, i):
        r.append("K")
        return i + 2
    if i == 0 and _contains(v, i, 6, "CAESAR"):
        r.append("S")
        return i + 2
    if _contains(v, i, 2, "CH"):
        return _handle_ch(v, r, i)
    if _contains(v, i, 2, "CZ") and not _contains(v, i - 2, 4, "WICZ"):
        r.append("S", "X")
        return i + 2
    if _contains(v, i + 1, 3, "CIA"):
        r.append("X")
        return i + 3
    if _contains(v, i, 2, "CC") and not (i == 1 and _char(v, 0) == "M"):
        return _handle_cc(v, r, i)
    if _contains(v, i, 2, "CK", "CG", "CQ"):
        r.append("K")
        return i + 2
    if _contains(v, i, 2, "CI", "CE", "CY"):
        if _contains(v, i, 3, "CIO", "CIE", "CIA"):
            r.append("S", "X")
        else:
            r.append("S")
        return i + 2
    r.append("K")
    if _contains(v, i + 1, 2, " C", " Q", " G"):
        return i + 3
    if _contains(v, i + 1, 1, "C", "K", "Q") \
            and not _contains(v, i + 1, 2, "CE", "CI"):
        return i + 2
    return i + 1


def _handle_d(v, r, i):
    if _contains(v, i, 2, "DG"):
        if _contains(v, i + 2, 1, "I", "E", "Y"):
            r.append("J")
            return i + 3
        r.append("TK")
        return i + 2
    if _contains(v, i, 2, "DT", "DD"):
        r.append("T")
        return i + 2
    r.append("T")
    return i + 1


def _handle_gh(v, r, i):
    if i > 0 and not _is_vowel(_char(v, i - 1)):
        r.append("K")
        return i + 2
    if i == 0:
        if _char(v, i + 2) == "I":
            r.append("J")
        else:
            r.append("K")
        return i + 2
    if (i > 1 and _contains(v, i - 2, 1, "B", "H", "D")) \
            or (i > 2 and _contains(v, i - 3, 1, "B", "H", "D")) \
            or (i > 3 and _contains(v, i - 4, 1, "B", "H")):
        return i + 2  # silent
    if i > 2 and _char(v, i - 1) == "U" \
            and _contains(v, i - 3, 1, "C", "G", "L", "R", "T"):
        r.append("F")
    elif i > 0 and _char(v, i - 1) != "I":
        r.append("K")
    return i + 2


def _handle_g(v, r, i, slavo):
    if _char(v, i + 1) == "H":
        return _handle_gh(v, r, i)
    if _char(v, i + 1) == "N":
        if i == 1 and _is_vowel(_char(v, 0)) and not slavo:
            r.append("KN", "N")
        elif not _contains(v, i + 2, 2, "EY") and _char(v, i + 1) != "Y" \
                and not slavo:
            r.append("N", "KN")
        else:
            r.append("KN")
        return i + 2
    if _contains(v, i + 1, 2, "LI") and not slavo:
        r.append("KL", "L")
        return i + 2
    if i == 0 and (_char(v, i + 1) == "Y" or _contains(
            v, i + 1, 2, *_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)):
        r.append("K", "J")
        return i + 2
    if (_contains(v, i + 1, 2, "ER") or _char(v, i + 1) == "Y") \
            and not _contains(v, 0, 6, "DANGER", "RANGER", "MANGER") \
            and not _contains(v, i - 1, 1, "E", "I") \
            and not _contains(v, i - 1, 3, "RGY", "OGY"):
        r.append("K", "J")
        return i + 2
    if _contains(v, i + 1, 1, "E", "I", "Y") \
            or _contains(v, i - 1, 4, "AGGI", "OGGI"):
        if _contains(v, 0, 4, "VAN ", "VON ") or _contains(v, 0, 3, "SCH") \
                or _contains(v, i + 1, 2, "ET"):
            r.append("K")
        elif _contains(v, i + 1, 3, "IER"):
            r.append("J")
        else:
            r.append("J", "K")
        return i + 2
    if _char(v, i + 1) == "G":
        r.append("K")
        return i + 2
    r.append("K")
    return i + 1


def _handle_h(v, r, i):
    if (i == 0 or _is_vowel(_char(v, i - 1))) and _is_vowel(_char(v, i + 1)):
        r.append("H")
        return i + 2
    return i + 1


def _handle_j(v, r, i, slavo):
    if _contains(v, i, 4, "JOSE") or _contains(v, 0, 4, "SAN "):
        if (i == 0 and (_char(v, i + 4) == " " or len(v) == 4)) \
                or _contains(v, 0, 4, "SAN "):
            r.append("H")
        else:
            r.append("J", "H")
        return i + 1
    if i == 0:
        r.append("J", "A")
    elif _is_vowel(_char(v, i - 1)) and not slavo \
            and (_char(v, i + 1) == "A" or _char(v, i + 1) == "O"):
        r.append("J", "H")
    elif i == len(v) - 1:
        r.append("J", " ")
    elif not _contains(v, i + 1, 1, *_L_T_K_S_N_M_B_Z) \
            and not _contains(v, i - 1, 1, "S", "K", "L"):
        r.append("J")
    # else silent
    return i + 2 if _char(v, i + 1) == "J" else i + 1


def _cond_l0(v, i):
    if i == len(v) - 3 and _contains(v, i - 1, 4, "ILLO", "ILLA", "ALLE"):
        return True
    return ((_contains(v, len(v) - 2, 2, "AS", "OS")
             or _contains(v, len(v) - 1, 1, "A", "O"))
            and _contains(v, i - 1, 4, "ALLE"))


def _handle_l(v, r, i):
    if _char(v, i + 1) == "L":
        if _cond_l0(v, i):
            r.append_primary("L")  # alternate is silent
        else:
            r.append("L")
        return i + 2
    r.append("L")
    return i + 1


def _cond_m0(v, i):
    if _char(v, i + 1) == "M":
        return True
    return _contains(v, i - 1, 3, "UMB") \
        and (i + 1 == len(v) - 1 or _contains(v, i + 2, 2, "ER"))


def _handle_p(v, r, i):
    if _char(v, i + 1) == "H":
        r.append("F")
        return i + 2
    r.append("P")
    return i + 2 if _contains(v, i + 1, 1, "P", "B") else i + 1


def _handle_r(v, r, i, slavo):
    if i == len(v) - 1 and not slavo and _contains(v, i - 2, 2, "IE") \
            and not _contains(v, i - 4, 2, "ME", "MA"):
        r.append_alternate("R")
    else:
        r.append("R")
    return i + 2 if _char(v, i + 1) == "R" else i + 1


def _handle_sc(v, r, i):
    if _char(v, i + 2) == "H":
        if _contains(v, i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
            if _contains(v, i + 3, 2, "ER", "EN"):
                r.append("X", "SK")
            else:
                r.append("SK")
        else:
            if i == 0 and not _is_vowel(_char(v, 3)) and _char(v, 3) != "W":
                r.append("X", "S")
            else:
                r.append("X")
    elif _contains(v, i + 2, 1, "I", "E", "Y"):
        r.append("S")
    else:
        r.append("SK")
    return i + 3


def _handle_s(v, r, i, slavo):
    if _contains(v, i - 1, 3, "ISL", "YSL"):
        return i + 1  # silent
    if i == 0 and _contains(v, i, 5, "SUGAR"):
        r.append("X", "S")
        return i + 1
    if _contains(v, i, 2, "SH"):
        if _contains(v, i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            r.append("S")
        else:
            r.append("X")
        return i + 2
    if _contains(v, i, 3, "SIO", "SIA") or _contains(v, i, 4, "SIAN"):
        if slavo:
            r.append("S")
        else:
            r.append("S", "X")
        return i + 3
    if (i == 0 and _contains(v, i + 1, 1, "M", "N", "L", "W")) \
            or _contains(v, i + 1, 1, "Z"):
        r.append("S", "X")
        return i + 2 if _contains(v, i + 1, 1, "Z") else i + 1
    if _contains(v, i, 2, "SC"):
        return _handle_sc(v, r, i)
    if i == len(v) - 1 and _contains(v, i - 2, 2, "AI", "OI"):
        r.append_alternate("S")
    else:
        r.append("S")
    return i + 2 if _contains(v, i + 1, 1, "S", "Z") else i + 1


def _handle_t(v, r, i):
    if _contains(v, i, 4, "TION"):
        r.append("X")
        return i + 3
    if _contains(v, i, 3, "TIA", "TCH"):
        r.append("X")
        return i + 3
    if _contains(v, i, 2, "TH") or _contains(v, i, 3, "TTH"):
        if _contains(v, i + 2, 2, "OM", "AM") \
                or _contains(v, 0, 4, "VAN ", "VON ") \
                or _contains(v, 0, 3, "SCH"):
            r.append("T")
        else:
            r.append("0", "T")
        return i + 2
    r.append("T")
    return i + 2 if _contains(v, i + 1, 1, "T", "D") else i + 1


def _handle_w(v, r, i):
    if _contains(v, i, 2, "WR"):
        r.append("R")
        return i + 2
    if i == 0 and (_is_vowel(_char(v, i + 1)) or _contains(v, i, 2, "WH")):
        if _is_vowel(_char(v, i + 1)):
            r.append("A", "F")
        else:
            r.append("A")
        return i + 1
    if (i == len(v) - 1 and _is_vowel(_char(v, i - 1))) \
            or _contains(v, i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY") \
            or _contains(v, 0, 3, "SCH"):
        r.append_alternate("F")
        return i + 1
    if _contains(v, i, 4, "WICZ", "WITZ"):
        r.append("TS", "FX")
        return i + 4
    return i + 1


def _handle_x(v, r, i):
    if i == 0:
        r.append("S")
        return i + 1
    if not (i == len(v) - 1
            and (_contains(v, i - 3, 3, "IAU", "EAU")
                 or _contains(v, i - 2, 2, "AU", "OU"))):
        r.append("KS")
    return i + 2 if _contains(v, i + 1, 1, "C", "X") else i + 1


def _handle_z(v, r, i, slavo):
    if _char(v, i + 1) == "H":
        r.append("J")
        return i + 2
    if _contains(v, i + 1, 2, "ZO", "ZI", "ZA") \
            or (slavo and i > 0 and _char(v, i - 1) != "T"):
        r.append("S", "TS")
    else:
        r.append("S")
    return i + 2 if _char(v, i + 1) == "Z" else i + 1


def double_metaphone_codes(value: str, max_len: int = 4) -> tuple[str, str]:
    """(primary, alternate) Double Metaphone codes; ("", "") for input
    with no encodable letters."""
    v = value.strip().upper()
    if not v:
        return "", ""
    slavo = _slavo_germanic(v)
    i = 1 if v.startswith(_SILENT_START) else 0
    r = _Result(max_len)
    n = len(v)
    while not r.complete() and i < n:
        c = v[i]
        if c in _VOWELS:
            if i == 0:
                r.append("A")
            i += 1
        elif c == "B":
            r.append("P")
            i += 2 if _char(v, i + 1) == "B" else 1
        elif c == "Ç":  # Ç
            r.append("S")
            i += 1
        elif c == "C":
            i = _handle_c(v, r, i)
        elif c == "D":
            i = _handle_d(v, r, i)
        elif c == "F":
            r.append("F")
            i += 2 if _char(v, i + 1) == "F" else 1
        elif c == "G":
            i = _handle_g(v, r, i, slavo)
        elif c == "H":
            i = _handle_h(v, r, i)
        elif c == "J":
            i = _handle_j(v, r, i, slavo)
        elif c == "K":
            r.append("K")
            i += 2 if _char(v, i + 1) == "K" else 1
        elif c == "L":
            i = _handle_l(v, r, i)
        elif c == "M":
            r.append("M")
            i += 2 if _cond_m0(v, i) else 1
        elif c == "N":
            r.append("N")
            i += 2 if _char(v, i + 1) == "N" else 1
        elif c == "Ñ":  # Ñ
            r.append("N")
            i += 1
        elif c == "P":
            i = _handle_p(v, r, i)
        elif c == "Q":
            r.append("K")
            i += 2 if _char(v, i + 1) == "Q" else 1
        elif c == "R":
            i = _handle_r(v, r, i, slavo)
        elif c == "S":
            i = _handle_s(v, r, i, slavo)
        elif c == "T":
            i = _handle_t(v, r, i)
        elif c == "V":
            r.append("F")
            i += 2 if _char(v, i + 1) == "V" else 1
        elif c == "W":
            i = _handle_w(v, r, i)
        elif c == "X":
            i = _handle_x(v, r, i)
        elif c == "Z":
            i = _handle_z(v, r, i, slavo)
        else:
            i += 1
    return "".join(r.primary), "".join(r.alternate)


def double_metaphone(value: str, alternate: bool = False,
                     max_len: int = 4) -> str:
    p, a = double_metaphone_codes(value, max_len)
    return a if alternate else p


# ------------------------------------------------------------ classic (1990)

_FRONTV = "EIY"    # letters that soften a preceding C/G/D
_VARSON = "CSPTG"  # H is silent after these


def metaphone(txt: str, max_len: int = 4) -> str:
    """Classic Metaphone — Lawrence Philips' 1990 algorithm with the
    commons-codec ``language/Metaphone`` semantics (the other encoder the
    reference's PhoneticFilter factory accepts,
    analysis/phonetic/.../PhoneticFilterFactory.java). Letters only are
    considered; output capped at ``max_len`` (commons-codec default 4)."""
    txt = "".join(c for c in txt.upper() if "A" <= c <= "Z")
    if not txt:
        return ""
    if len(txt) == 1:
        return txt

    # initial-pair rules
    first2 = txt[:2]
    if first2 in ("AE", "GN", "KN", "PN", "WR"):
        local = txt[1:]
    elif txt[0] == "X":
        local = "S" + txt[1:]
    elif first2 == "WH":
        local = "W" + txt[2:]
    else:
        local = txt

    wdsz = len(local)
    code: list[str] = []
    n = 0
    while len(code) < max_len and n < wdsz:
        symb = local[n]
        # drop duplicate letters except C
        if symb != "C" and n > 0 and local[n - 1] == symb:
            n += 1
            continue
        if symb in "AEIOU":
            if n == 0:
                code.append(symb)
        elif symb == "B":
            if not (n == wdsz - 1 and n > 0 and local[n - 1] == "M"):
                code.append("B")
        elif symb == "C":
            # SCE/SCI/SCY discard runs FIRST (commons-codec order: FASCIA
            # hits the discard, not the CIA rule)
            if n > 0 and local[n - 1] == "S" and n + 1 < wdsz \
                    and local[n + 1] in _FRONTV:
                pass
            elif local.startswith("CIA", n):
                code.append("X")
            elif n + 1 < wdsz and local[n + 1] in _FRONTV:
                code.append("S")
            elif n > 0 and local[n - 1] == "S" and n + 1 < wdsz \
                    and local[n + 1] == "H":
                code.append("K")            # SCH
            elif n + 1 < wdsz and local[n + 1] == "H":
                # commons-codec: word-initial CH with a vowel at index 2
                # hardens to K (CHARACTER -> K...), otherwise CH -> X
                if n == 0 and wdsz >= 3 and local[2] in "AEIOU":
                    code.append("K")
                else:
                    code.append("X")
            else:
                code.append("K")
        elif symb == "D":
            if n + 2 < wdsz and local[n + 1] == "G" \
                    and local[n + 2] in _FRONTV:
                code.append("J")            # DGE/DGI/DGY
                n += 2
            else:
                code.append("T")
        elif symb == "G":
            silent = False
            if n + 1 < wdsz and local[n + 1] == "H":
                # GH silent at end or before a consonant
                if n + 2 == wdsz or (n + 2 < wdsz
                                     and local[n + 2] not in "AEIOU"):
                    silent = True
            if n > 0 and local.startswith("GN", n):
                silent = True               # any non-initial GN (+GNED)
            if not silent:
                hard = n > 0 and local[n - 1] == "G"
                if n + 1 < wdsz and local[n + 1] in _FRONTV and not hard:
                    code.append("J")
                else:
                    code.append("K")
        elif symb == "H":
            if n + 1 == wdsz:
                pass                        # terminal H silent
            elif n > 0 and local[n - 1] in _VARSON:
                pass                        # silent after C/S/P/T/G
            elif local[n + 1] in "AEIOU":
                code.append("H")            # H sounds only before a vowel
            # else silent (consonant follows)
        elif symb in "FJLMNR":
            code.append(symb)
        elif symb == "K":
            if not (n > 0 and local[n - 1] == "C"):
                code.append("K")
        elif symb == "P":
            code.append("F" if n + 1 < wdsz and local[n + 1] == "H" else "P")
        elif symb == "Q":
            code.append("K")
        elif symb == "S":
            if local.startswith("SH", n) or local.startswith("SIO", n) \
                    or local.startswith("SIA", n):
                code.append("X")
            else:
                code.append("S")
        elif symb == "T":
            if local.startswith("TIA", n) or local.startswith("TIO", n):
                code.append("X")
            elif local.startswith("TCH", n):
                pass                        # silent in -TCH-
            elif local.startswith("TH", n):
                code.append("0")            # theta
            else:
                code.append("T")
        elif symb == "V":
            code.append("F")
        elif symb in "WY":
            if n + 1 < wdsz and local[n + 1] in "AEIOU":
                code.append(symb)
        elif symb == "X":
            code.append("K")
            if len(code) < max_len:
                code.append("S")
        elif symb == "Z":
            code.append("S")
        n += 1
    return "".join(code[:max_len])
