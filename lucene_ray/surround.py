"""Surround query language parser (queryparser/surround/parser/QueryParser
.jj): span-oriented proximity syntax with infix and prefix operators.

Grammar (loosest to tightest): ``OR`` < ``AND`` < ``NOT`` < ``N`` < ``W``
< primary. Operators are case-insensitive; the non-unary ones also take
prefix form ``OP(a, b, c)``. ``W`` (ordered) and ``N`` (unordered) accept a
2–99 distance prefix (``3W(a, b)`` = within three positions, i.e. span slop
= distance − 1, surround/query/DistanceQuery.java:97); default distance 1 =
adjacent. Terms support ``*`` / ``?`` truncation (SrndPrefixQuery /
SrndTruncQuery) and ``"quoted"`` literals; any primary takes ``^boost``.

Distance operands may be terms, truncations, OR-groups of those (the
SpanOr + SpanMultiTermQueryWrapper combinations the reference's
SpanNearClauseFactory accepts), or — under an ORDERED operator — a nested
distance query (spans inside spans, matched by extent chaining).
Same-order/same-distance chains splice into one span query (left
association). A nested distance under N (unordered parent) is rejected
with a parse error — a documented narrowing of the reference. Distance
queries map onto SpanNearQuery slots; boolean operators map onto
BooleanQuery.
"""

from __future__ import annotations

import re

from lucene_ray.query import (
    BooleanQuery,
    BoostQuery,
    MatchAllDocsQuery,
    PrefixQuery,
    Query,
    QueryParseError,
    SpanNearQuery,
    TermQuery,
    WildcardQuery,
)

_TOK = re.compile(
    r"""\s*(?:
        (?P<lp>\()
      | (?P<rp>\))
      | (?P<comma>,)
      | \^(?P<boost>\d+(?:\.\d+)?)
      | (?P<dist>\d{1,2})?(?P<wn>[wWnN])(?![\w*?])
      | (?P<bool>[aA][nN][dD]|[oO][rR]|[nN][oO][tT])(?![\w*?])
      | "(?P<quoted>[^"]*)"
      | (?P<word>[^\s(),^"]+)
    )""",
    re.VERBOSE,
)


def _lex(s: str):
    out, i = [], 0
    while i < len(s):
        m = _TOK.match(s, i)
        if m is None or m.end() == i:
            if s[i:].strip():
                raise QueryParseError(f"bad surround syntax at {i} in {s!r}")
            break
        i = m.end()
        if m.group("lp"):
            out.append(("LP", None))
        elif m.group("rp"):
            out.append(("RP", None))
        elif m.group("comma"):
            out.append(("COMMA", None))
        elif m.group("boost") is not None:
            out.append(("BOOST", float(m.group("boost"))))
        elif m.group("wn"):
            d = int(m.group("dist")) if m.group("dist") else 1
            if not 1 <= d <= 99:
                raise QueryParseError(f"distance {d} out of range in {s!r}")
            out.append(("DIST", (m.group("wn").lower() == "w", d)))
        elif m.group("bool"):
            out.append((m.group("bool").upper(), None))
        elif m.group("quoted") is not None:
            out.append(("QUOTED", m.group("quoted")))
        else:
            out.append(("WORD", m.group("word")))
    return out


class _SurroundParser:
    def __init__(self, toks, normalize):
        self.toks = toks
        self.i = 0
        self.normalize = normalize

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    # ---- leaf handling -------------------------------------------------

    def _leaf_spec(self, kind, val):
        """A distance operand as a SpanNearQuery slot item."""
        if kind == "QUOTED":
            return self.normalize(val)
        if "*" in val or "?" in val:
            if val.endswith("*") and len(val) > 1 and not any(
                c in "*?" for c in val[:-1]
            ):
                return ("prefix", self.normalize(val[:-1]))
            return ("wildcard", val.lower())
        return self.normalize(val)

    def _leaf_query(self, kind, val) -> Query:
        """A standalone (non-distance) leaf as a full query."""
        spec = self._leaf_spec(kind, val)
        if isinstance(spec, str):
            return TermQuery(spec)
        if spec[0] == "prefix":
            return PrefixQuery(spec[1])
        return WildcardQuery(spec[1])

    # ---- grammar -------------------------------------------------------

    def parse(self) -> Query:
        q = self.parse_or()
        if self.peek()[0] is not None:
            raise QueryParseError(f"unexpected trailing token {self.peek()}")
        return q

    def _infix(self, sub, kinds):
        parts = [sub()]
        while self.peek()[0] in kinds:
            self.next()
            parts.append(sub())
        return parts

    def parse_or(self) -> Query:
        parts = self._infix(self.parse_and, ("OR",))
        return parts[0] if len(parts) == 1 else BooleanQuery(should=parts)

    def parse_and(self) -> Query:
        parts = self._infix(self.parse_not, ("AND",))
        return parts[0] if len(parts) == 1 else BooleanQuery(must=parts)

    def parse_not(self) -> Query:
        parts = self._infix(self.parse_dist, ("NOT",))
        if len(parts) == 1:
            return parts[0]
        return BooleanQuery(must=[parts[0]], must_not=parts[1:])

    def parse_dist(self) -> Query:
        # N binds looser than W: a W b N c == (a W b) N c
        q = self.parse_w()
        while self.peek()[0] == "DIST" and not self.peek()[1][0]:
            _, (_, d) = self.next()
            rhs = self.parse_w()
            q = self._distance([q, rhs], d, in_order=False)
        return q

    def parse_w(self) -> Query:
        q = self.parse_primary()
        while self.peek()[0] == "DIST" and self.peek()[1][0]:
            _, (_, d) = self.next()
            rhs = self.parse_primary()
            q = self._distance([q, rhs], d, in_order=True)
        return q

    def _to_slot(self, q: Query):
        """Convert an operand query to a SpanNearQuery slot, enforcing the
        reference's operand restriction (SpanNearClauseFactory: term,
        truncation, OR of those; an existing adjacent distance query of the
        same order splices its slots in — left association)."""
        if isinstance(q, TermQuery):
            return (q.term,)
        if isinstance(q, PrefixQuery):
            return (("prefix", q.prefix),)
        if isinstance(q, WildcardQuery):
            return (("wildcard", q.pattern),)
        if isinstance(q, BooleanQuery) and q.should and not (q.must or q.must_not):
            items = []
            for sub in q.should:
                slot = self._to_slot(sub)
                if len(slot) != 1 and not isinstance(sub, SpanNearQuery):
                    raise QueryParseError(
                        "distance operator operand too complex (term, "
                        "truncation, or OR of those required)")
                items.extend(slot)
            return tuple(items)
        raise QueryParseError(
            f"operand not allowed inside distance operator: {q!r}")

    def _distance(self, operands, d, in_order) -> Query:
        slots = []
        for op in operands:
            if isinstance(op, SpanNearQuery):
                if op.in_order == in_order and op.slop == d - 1:
                    # left-associative chain: (a W b) W c keeps one span query
                    slots.extend(op.terms)
                elif in_order:
                    # spans inside spans — extent chaining under an ordered
                    # parent (NearSpansOrdered nesting)
                    slots.append(op)
                else:
                    raise QueryParseError(
                        "a nested distance operator under N (unordered) is "
                        "not supported; nest under W instead")
            else:
                slots.append(self._to_slot(op))
        norm = [s if isinstance(s, (tuple, SpanNearQuery)) else (s,) for s in slots]
        return SpanNearQuery(norm, slop=d - 1, in_order=in_order)

    def parse_primary(self) -> Query:
        kind, val = self.next() if self.peek()[0] is not None else (None, None)
        if kind is None:
            raise QueryParseError("unexpected end of surround query")
        if kind == "LP":
            q = self.parse_or()
            if self.peek()[0] != "RP":
                raise QueryParseError("missing ) in surround query")
            self.next()
        elif kind in ("OR", "AND", "NOT") or kind == "DIST":
            # prefix operator form: OP(a, b, ...)
            args = self._prefix_args()
            if kind == "OR":
                q = BooleanQuery(should=args)
            elif kind == "AND":
                q = BooleanQuery(must=args)
            elif kind == "NOT":
                q = BooleanQuery(must=[args[0]], must_not=args[1:])
            else:
                in_order, d = val
                q = self._distance(args, d, in_order)
        elif kind in ("WORD", "QUOTED"):
            q = self._leaf_query(kind, val)
        else:
            raise QueryParseError(f"unexpected token {kind} in surround query")
        if self.peek()[0] == "BOOST":
            _, b = self.next()
            q = BoostQuery(q, b)
        return q

    def _prefix_args(self):
        if self.peek()[0] != "LP":
            raise QueryParseError("prefix operator requires ( args )")
        self.next()
        args = [self.parse_or()]
        while self.peek()[0] == "COMMA":
            self.next()
            args.append(self.parse_or())
        if self.peek()[0] != "RP":
            raise QueryParseError("missing ) after prefix operator args")
        self.next()
        if len(args) < 2:
            raise QueryParseError("prefix operator requires >= 2 args")
        return args


def parse_surround_query(s: str, normalize=None) -> Query:
    """Parse the surround span-query language; see module docstring."""
    normalize = normalize or (lambda w: w.lower())
    toks = _lex(s)
    if not toks:
        return MatchAllDocsQuery()
    return _SurroundParser(toks, normalize).parse()
