"""WordDelimiterGraphFilter — intra-word split/catenate token rewriting.

Port of ``analysis/common/.../miscellaneous/WordDelimiterGraphFilter.java``
(flags :93-144, bufferWordParts/flushConcatenation/PositionSorter) and its
``WordDelimiterIterator.java`` (next :146-180, isBreak :225-243, charType
:300-358): tokens split on intra-word delimiters, case transitions and
letter↔number transitions; leading/trailing delimiters and English
possessives strip; CATENATE_* emit joined runs and PRESERVE_ORIGINAL the
unmodified token, stacked on the part positions as a token graph
(posInc/posLen).

The expansion of a token is a pure function of its text, so the index
integration runs it at VOCAB level (once per distinct term per batch) and
splices the parts into the flat position arrays with numpy — no per-token
Python in the hot path beyond the per-distinct-term rewrite itself.
"""
from __future__ import annotations

import unicodedata
from functools import lru_cache

# subword char types (WordDelimiterIterator.java:29-35)
LOWER = 0x01
UPPER = 0x02
DIGIT = 0x04
SUBWORD_DELIM = 0x08
ALPHA = LOWER | UPPER

# flags (WordDelimiterGraphFilter.java:93-147)
GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256
IGNORE_KEYWORDS = 512

# the Solr factory defaults (WordDelimiterGraphFilterFactory: generate
# word/number parts + all three split behaviors on, catenate/preserve off)
DEFAULT_FLAGS = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
                 | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
                 | STEM_ENGLISH_POSSESSIVE)

_DONE = -1


def _char_type(ch: str) -> int:
    """WordDelimiterIterator.getType (:313-358) via unicodedata category."""
    cat = unicodedata.category(ch)
    if cat == "Lu":
        return UPPER
    if cat == "Ll":
        return LOWER
    if cat in ("Lt", "Lm", "Lo", "Mn", "Me", "Mc"):
        return ALPHA
    if cat in ("Nd", "Nl", "No"):
        return DIGIT
    if cat == "Cs":  # unpaired surrogate: prevent splitting
        return ALPHA | DIGIT
    return SUBWORD_DELIM


class _Iterator:
    """WordDelimiterIterator port (single token)."""

    def __init__(self, text: str, split_case: bool, split_num: bool,
                 stem_poss: bool):
        self.text = text
        self.types = [_char_type(c) for c in text]
        self.split_case = split_case
        self.split_num = split_num
        self.stem_poss = stem_poss
        self.skip_possessive = False
        self.has_final_possessive = False
        n = len(text)
        # setBounds (:263-276)
        sb = 0
        while sb < n and self.types[sb] & SUBWORD_DELIM:
            sb += 1
        eb = n
        while eb > sb and self.types[eb - 1] & SUBWORD_DELIM:
            eb -= 1
        self.start_bounds, self.end_bounds = sb, eb
        if self._ends_with_possessive(eb):
            self.has_final_possessive = True
        self.current = sb
        self.end = 0 if n else _DONE

    def _ends_with_possessive(self, pos: int) -> bool:
        t = self.text
        return (self.stem_poss and pos > 2 and t[pos - 2] == "'"
                and t[pos - 1] in ("s", "S")
                and (self.types[pos - 3] & ALPHA) != 0
                and (pos == self.end_bounds
                     or (self.types[pos] & SUBWORD_DELIM) != 0))

    def _is_break(self, last: int, cur: int) -> bool:
        if cur & last:
            return False
        if not self.split_case and (last & ALPHA) and (cur & ALPHA):
            return False
        if (last & UPPER) and (cur & ALPHA):
            return False
        if not self.split_num and (((last & ALPHA) and (cur & DIGIT))
                                   or ((last & DIGIT) and (cur & ALPHA))):
            return False
        return True

    def next(self) -> int:
        self.current = self.end
        if self.current == _DONE:
            return _DONE
        if self.skip_possessive:
            self.current += 2
            self.skip_possessive = False
        last = 0
        while (self.current < self.end_bounds
               and (last := self.types[self.current]) & SUBWORD_DELIM):
            self.current += 1
        if self.current >= self.end_bounds:
            self.end = _DONE
            return _DONE
        self.end = self.current + 1
        while self.end < self.end_bounds:
            t = self.types[self.end]
            if self._is_break(last, t):
                break
            last = t
            self.end += 1
        if (self.end < self.end_bounds - 1
                and self._ends_with_possessive(self.end + 2)):
            self.skip_possessive = True
        return self.end

    def type(self) -> int:
        if self.end == _DONE:
            return 0
        t = self.types[self.current]
        return ALPHA if t in (LOWER, UPPER) else t

    def is_single_word(self) -> bool:
        end = self.end_bounds - 2 if self.has_final_possessive else self.end_bounds
        return self.current == self.start_bounds and self.end == end


def expand_token(word: str, flags: int = DEFAULT_FLAGS,
                 protected: frozenset = frozenset()):
    """Expand ONE token; returns ``(entries, advance)`` where ``entries`` is
    ``[(term, start_pos, pos_len)]`` in emission order (PositionSorter:
    start asc, longer first; PRESERVE_ORIGINAL stays first) and ``advance``
    is how many graph positions the token occupies (the amount the next
    token's base shifts). ``entries == None`` means passthrough (single word
    with no delimiters, or a protected word); ``entries == []`` means the
    token was all delimiters and is swallowed (a one-position hole)."""
    has = lambda f: flags & f  # noqa: E731
    it = _Iterator(word, bool(has(SPLIT_ON_CASE_CHANGE)),
                   bool(has(SPLIT_ON_NUMERICS)),
                   bool(has(STEM_ENGLISH_POSSESSIVE)))
    it.next()
    if (it.current == 0 and it.end == len(word)) or word in protected:
        return None, 1
    if it.end == _DONE:
        if has(PRESERVE_ORIGINAL):
            return [(word, 0, 1)], 1
        return [], 1

    # bufferWordParts (WordDelimiterGraphFilter.java:330-417)
    buf: list = []  # (term, start_pos, end_pos, start_part, end_part)
    word_pos = 0
    last_concat_count = 0
    concat = {"parts": [], "type": 0, "start_part": 0, "end_part": 0,
              "start_pos": 0}
    concat_all = {"parts": [], "type": 0, "start_part": 0, "end_part": 0,
                  "start_pos": 0}

    def concat_write(c):
        buf.append(("".join(c["parts"]), c["start_pos"], word_pos,
                    c["start_part"], c["end_part"]))

    def concat_clear(c):
        c["parts"] = []
        c["type"] = 0

    def should_generate(word_type):
        return ((has(GENERATE_WORD_PARTS) and word_type & ALPHA)
                or (has(GENERATE_NUMBER_PARTS) and word_type & DIGIT))

    def should_concat(word_type):
        return ((has(CATENATE_WORDS) and word_type & ALPHA)
                or (has(CATENATE_NUMBERS) and word_type & DIGIT))

    def concatenate(c):
        if not c["parts"]:
            c["type"] = it.type()
            c["start_part"] = it.current
            c["start_pos"] = word_pos
        c["parts"].append(word[it.current:it.end])
        c["end_part"] = it.end

    def flush_concat():
        nonlocal word_pos, last_concat_count
        if word_pos == concat["start_pos"]:
            word_pos += 1
        last_concat_count = len(concat["parts"])
        if len(concat["parts"]) != 1 or not should_generate(concat["type"]):
            concat_write(concat)
        concat_clear(concat)

    if has(PRESERVE_ORIGINAL):
        buf.append((word, 0, 1, 0, len(word)))

    if it.is_single_word():
        buf.append((word[it.current:it.end], word_pos, word_pos + 1,
                    it.current, it.end))
        word_pos += 1
        it.next()
    else:
        while it.end != _DONE:
            word_type = it.type()
            if concat["parts"] and not (concat["type"] & word_type):
                flush_concat()
            if should_concat(word_type):
                concatenate(concat)
            if has(CATENATE_ALL):
                concatenate(concat_all)
            if should_generate(word_type):
                buf.append((word[it.current:it.end], word_pos, word_pos + 1,
                            it.current, it.end))
                word_pos += 1
            it.next()
        if concat["parts"]:
            flush_concat()
        if concat_all["parts"]:
            if len(concat_all["parts"]) > last_concat_count:
                if word_pos == concat_all["start_pos"]:
                    word_pos += 1
                concat_write(concat_all)
            concat_clear(concat_all)

    if has(PRESERVE_ORIGINAL):
        if word_pos == 0:
            word_pos += 1
        buf[0] = (buf[0][0], 0, word_pos, buf[0][3], buf[0][4])

    # PositionSorter (start asc, end desc); PRESERVE_ORIGINAL stays first
    head = 1 if has(PRESERVE_ORIGINAL) else 0
    buf[head:] = sorted(buf[head:], key=lambda b: (b[3], -b[4]))
    entries = [(t, sp, ep - sp) for t, sp, ep, _s, _e in buf]
    return entries, word_pos


def word_delimiter_stream(tokens, flags: int = DEFAULT_FLAGS,
                          protected: frozenset = frozenset(),
                          pos_incs=None):
    """Filter-level surface (the reference's assertTokenStreamContents
    shape): list of ``(term, pos_inc, pos_len)`` for a token stream.
    ``pos_incs`` defaults to 1 per input token."""
    out: list[tuple] = []
    accum = 0
    for i, tok in enumerate(tokens):
        accum += pos_incs[i] if pos_incs is not None else 1
        entries, _adv = expand_token(tok, flags, protected)
        if entries is None:
            out.append((tok, accum, 1))
            accum = 0
            continue
        if not entries:
            continue  # swallowed: hole accumulates
        word_pos = 0
        for j, (term, sp, plen) in enumerate(entries):
            if j == 0:
                out.append((term, accum + sp - word_pos, plen))
                accum = 0
            else:
                out.append((term, sp - word_pos, plen))
            word_pos = sp
    return out


@lru_cache(maxsize=65536)
def _expand_cached(word: str, flags: int, protected: frozenset):
    return expand_token(word, flags, protected)


def expand_vocab(vocab, flags: int = DEFAULT_FLAGS,
                 protected: frozenset = frozenset()):
    """Vocab-level expansion for the index path: for each distinct term,
    ``(parts, rel_positions, advance)`` with parts in position order.
    posLen is dropped (position length is not indexed — same as the
    reference, where posLen only affects query-time graphs)."""
    table = []
    for w in vocab:
        entries, adv = _expand_cached(w, flags, protected)
        if entries is None:
            table.append(([w], [0], 1))
        else:
            table.append(([t for t, _, _ in entries],
                          [sp for _, sp, _ in entries], adv))
    return table
