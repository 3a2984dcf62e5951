"""CharFilters — pre-tokenizer character-stream transforms with offset
correction.

Reference surface (analysis/common/.../charfilter/):

- ``MappingCharFilter`` + ``NormalizeCharMap`` (MappingCharFilter.java:36,
  NormalizeCharMap.java): greedy longest-match literal rewrites; replacement
  text is NEVER rescanned (the scan pointer advances past the match).
- ``HTMLStripCharFilter`` (HTMLStripCharFilter.jflex): markup removal —
  inline-element tags vanish, every other tag / BR / script / style block
  becomes one ``\\n``, comments / processing instructions vanish, character
  entities decode to their codepoint.
- ``PatternReplaceCharFilter`` (pattern/PatternReplaceCharFilter.java):
  regex rewrite; the reference itself documents its offset correction as
  approximate, and this port mirrors the cumulative-diff-at-replacement-end
  convention.

Offset bookkeeping is BaseCharFilter's (BaseCharFilter.java:41-95): an
ascending array of OUTPUT offsets with the cumulative (input − output)
diff in force from that offset on; ``correct(o) = o + diffs[last offset
≤ o]``.  Token spans produced over the filtered text are mapped back to
the original stored text with one vectorized ``searchsorted`` per doc.

CharFilters run in the per-doc Python tokenize path (a single compiled
combined regex per filter — C-speed scanning); they are opt-in per field,
exactly like the reference's custom-analyzer configuration, so the Arrow
megastring fast path is unaffected when no filter is configured.
"""
from __future__ import annotations

import html
import re

import numpy as np


class OffsetMap:
    """BaseCharFilter's offsets/diffs pair in OUTPUT space."""

    __slots__ = ("offsets", "diffs")

    def __init__(self):
        self.offsets: list[int] = []
        self.diffs: list[int] = []

    def add(self, off: int, cumulative_diff: int) -> None:
        # BaseCharFilter.addOffCorrectMap: same-offset updates overwrite
        if self.offsets and off == self.offsets[-1]:
            self.diffs[-1] = cumulative_diff
            return
        self.offsets.append(off)
        self.diffs.append(cumulative_diff)

    @property
    def last_cumulative_diff(self) -> int:
        return self.diffs[-1] if self.diffs else 0

    def correct_many(self, offs: np.ndarray) -> np.ndarray:
        """Vectorized BaseCharFilter.correct over an int array."""
        if not self.offsets:
            return offs
        pts = np.asarray(self.offsets, dtype=np.int64)
        dfs = np.asarray(self.diffs, dtype=np.int64)
        idx = np.searchsorted(pts, offs, side="right") - 1
        d = np.where(idx >= 0, dfs[np.clip(idx, 0, len(dfs) - 1)], 0)
        return offs + d

    def correct(self, off: int) -> int:
        return int(self.correct_many(np.asarray([off], dtype=np.int64))[0])


def _sub_with_map(text: str, pattern: re.Pattern, repl_fn) -> tuple[str, OffsetMap]:
    """One left-to-right scan: each match is replaced by ``repl_fn(m)`` and
    the offset map records the cumulative diff per the reference convention
    (shorter replacement → one entry after it; longer replacement → the
    extra chars all map back to the match end, MappingCharFilter.java:148-156)."""
    out_parts: list[str] = []
    omap = OffsetMap()
    out_len = 0
    last = 0
    for m in pattern.finditer(text):
        lit = text[last:m.start()]
        out_parts.append(lit)
        out_len += len(lit)
        rep = repl_fn(m)
        mlen = m.end() - m.start()
        rlen = len(rep)
        diff = mlen - rlen
        prev = omap.last_cumulative_diff
        if diff > 0:
            omap.add(out_len + rlen, prev + diff)
        elif diff < 0:
            for extra in range(-diff):
                omap.add(out_len + mlen + extra, prev - extra - 1)
        out_parts.append(rep)
        out_len += rlen
        last = m.end()
    out_parts.append(text[last:])
    return "".join(out_parts), omap


# ------------------------------------------------------------- Mapping


class MappingCharFilter:
    """Greedy longest-match literal rewrites (MappingCharFilter.java:36).

    ``rules`` maps match strings to replacements. The combined regex lists
    alternatives longest-first, which reproduces the FST's longest-match
    policy at every scan position; matched input is consumed, so rule
    outputs are never rescanned — same as the reference.
    """

    def __init__(self, rules: dict[str, str]):
        if not rules:
            raise ValueError("MappingCharFilter needs at least one rule")
        self.rules = dict(rules)
        alts = sorted(self.rules, key=len, reverse=True)
        self._re = re.compile("|".join(re.escape(a) for a in alts))

    def __call__(self, text: str) -> tuple[str, OffsetMap]:
        rules = self.rules
        return _sub_with_map(text, self._re, lambda m: rules[m.group()])


# ------------------------------------------------------------- PatternReplace


class PatternReplaceCharFilter:
    """Regex rewrite (pattern/PatternReplaceCharFilter.java). Replacement
    supports group references (``$1`` in the reference, ``\\1`` here —
    both accepted). Offset correction is the coarse cumulative-diff model,
    matching the reference's documented approximation."""

    def __init__(self, pattern: str, replacement: str):
        self._re = re.compile(pattern)
        # the reference uses Java's $N syntax; accept it alongside \N
        self.replacement = re.sub(r"\$(\d+)", r"\\\1", replacement)

    def __call__(self, text: str) -> tuple[str, OffsetMap]:
        return _sub_with_map(text, self._re, lambda m: m.expand(self.replacement))


# ------------------------------------------------------------- HTMLStrip

# Inline elements vanish without replacement (HTMLStripCharFilter.jflex:116-141);
# every other tag is "block level" and becomes \n.
_INLINE_ELEMENTS = (
    "a|b|i|q|s|u|abbr|acronym|basefont|bdo|big|cite|code|dfn|em|font|img|"
    "input|kbd|label|samp|select|small|span|strike|strong|sub|sup|textarea|"
    "tt|var"
)

_HTML_RE = re.compile(
    r"(?P<comment><!--.*?-->)"
    r"|(?P<script><script(?:\s[^>]*)?>.*?</script\s*>)"
    r"|(?P<style><style(?:\s[^>]*)?>.*?</style\s*>)"
    r"|(?P<br><\s*br(?:\s[^>]*|\s*/)?\s*>)"
    rf"|(?P<inline></?(?:{_INLINE_ELEMENTS})(?:[\s/][^>]*)?>)"
    r"|(?P<pi><\?[^>]*[/?]>)"
    r"|(?P<tag></?!?[a-zA-Z][^>]*>)"
    r"|(?P<entity>&(?:[a-zA-Z][a-zA-Z0-9]{0,30}|#[0-9]{1,10}|#[xX][0-9a-fA-F]{1,8});)",
    re.DOTALL | re.IGNORECASE,
)


def _html_repl(m: re.Match) -> str:
    kind = m.lastgroup
    if kind in ("comment", "inline", "pi"):
        return ""
    if kind in ("script", "style", "br", "tag"):
        return "\n"
    # entity: decode; unknown named entities pass through verbatim.
    # The reference maps the NAMED nbsp entity to a plain space
    # (htmlentity.py:30) while numeric &#160; stays U+00A0.
    if m.group() == "&nbsp;":
        return " "
    return html.unescape(m.group())


class HTMLStripCharFilter:
    """Markup removal (HTMLStripCharFilter.jflex semantics): inline-element
    tags vanish, other tags / BR / whole script+style blocks become ``\\n``,
    comments and processing instructions vanish, entities decode.
    ``escaped_tags`` names elements whose tags pass through verbatim
    (setEscapedTags)."""

    def __init__(self, escaped_tags: tuple = ()):
        self.escaped_tags = frozenset(t.lower() for t in escaped_tags)

    def __call__(self, text: str) -> tuple[str, OffsetMap]:
        esc = self.escaped_tags

        def repl(m: re.Match) -> str:
            if esc and m.lastgroup in ("inline", "tag", "br"):
                name = re.match(r"<\s*/?\s*([a-zA-Z]+)", m.group())
                if name and name.group(1).lower() in esc:
                    return m.group()
            return _html_repl(m)

        return _sub_with_map(text, _HTML_RE, repl)


# ------------------------------------------------------------- spec plumbing


def build_char_filter(spec):
    """Instantiate one filter from a JSON-able spec dict (the form that
    rides the index manifest): ``{"type": "html_strip"|"mapping"|
    "pattern_replace", ...params}``. A bare string is shorthand for a
    parameterless type."""
    if isinstance(spec, str):
        spec = {"type": spec}
    kind = spec.get("type")
    if kind == "html_strip":
        return HTMLStripCharFilter(tuple(spec.get("escaped_tags", ())))
    if kind == "mapping":
        return MappingCharFilter(dict(spec["rules"]))
    if kind == "pattern_replace":
        return PatternReplaceCharFilter(spec["pattern"], spec["replacement"])
    raise ValueError(f"unknown char filter type {kind!r}")


def apply_char_filters(text: str, filters) -> tuple[str, list[OffsetMap]]:
    """Run a filter chain; returns the final text and one OffsetMap per
    stage (composed outer-to-inner at correction time: a span in the final
    text is corrected through the LAST stage first)."""
    maps = []
    for f in filters:
        text, omap = f(text)
        maps.append(omap)
    return text, maps


def correct_spans(starts: np.ndarray, ends: np.ndarray, maps) -> tuple:
    """Map token spans from filtered-text space back to original-text
    space through a stage list (reverse order — each stage's map converts
    its OUTPUT offsets to its INPUT offsets)."""
    for omap in reversed(maps):
        starts = omap.correct_many(starts)
        ends = omap.correct_many(ends)
    return starts, ends
