"""Query tree + a classic-syntax parser subset.

Reference query types (lucene/core/src/java/org/apache/lucene/search/):
TermQuery.java:36-118, BooleanQuery.java (occurs MUST/SHOULD/MUST_NOT/FILTER,
BooleanClause.java), PhraseQuery.java:71-147, PrefixQuery/MultiTermQuery,
TermInSetQuery, MatchAllDocsQuery, ConstantScoreQuery, BoostQuery,
DisjunctionMaxQuery. Parser subset of
queryparser/.../classic/QueryParserBase.java: terms, quoted phrases, AND/OR/
NOT, +/- prefixes, parentheses, trailing-* prefix queries, ^boost.

Queries are plain immutable Python values; the physical execution plan (which
scorer runs) is chosen by the searcher, mirroring Boolean2ScorerSupplier
(search/Boolean2ScorerSupplier.java:30-247).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Query:
    """Marker base class."""

    __slots__ = ()


@dataclass(frozen=True)
class TermQuery(Query):
    term: str
    field: str | None = None  # None = the index's default field

    def __str__(self):
        return f"{self.field}:{self.term}" if self.field else self.term


@dataclass(frozen=True)
class PhraseQuery(Query):
    terms: tuple
    slop: int = 0
    field: str | None = None

    def __init__(self, terms, slop: int = 0, field: str | None = None):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "slop", int(slop))
        object.__setattr__(self, "field", field)

    def __str__(self):
        return '"' + " ".join(self.terms) + '"'


@dataclass(frozen=True)
class PrefixQuery(Query):
    prefix: str
    field: str | None = None

    def __str__(self):
        return self.prefix + "*"


@dataclass(frozen=True)
class WildcardQuery(Query):
    """``?`` = one char, ``*`` = any run (search/WildcardQuery.java) —
    executed as a compiled-regex scan over the sorted term dictionary, the
    moral equivalent of the automaton∩term-dict intersection."""

    pattern: str


@dataclass(frozen=True)
class RegexpQuery(Query):
    """RE2-style regexp over the term dictionary (search/RegexpQuery.java);
    anchored at both ends like the reference."""

    pattern: str


@dataclass(frozen=True)
class FuzzyQuery(Query):
    """Terms within Levenshtein distance ``max_edits`` (≤2, like
    search/FuzzyQuery.java); ``prefix_length`` chars must match exactly.
    Rewrites to a blended constant-score-ish OR: the reference scores each
    expanded term with a boost of (1 - edits/len); we reproduce that."""

    term: str
    max_edits: int = 2
    prefix_length: int = 0


@dataclass(frozen=True)
class TermRangeQuery(Query):
    """lower ≤ term ≤ upper lexicographic range scan (TermRangeQuery.java)."""

    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class NumericRangeQuery(Query):
    """lo ≤ value(field) ≤ hi over a numeric doc-values column — the
    PointRangeQuery / IndexOrDocValuesQuery analogue (document/LongPoint
    range factory; search/IndexOrDocValuesQuery.java picks the doc-values
    execution for selective outer queries, which is exactly this engine's
    physical plan). Non-scoring (constant score 1·boost), composes as a
    FILTER/MUST clause."""

    field: str
    lower: float | int | None = None
    upper: float | int | None = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class PointBoxQuery(Query):
    """2-D box over two numeric doc-values columns, served by the BKD-style
    k-d index (util/bkd/BKDWriter.java:76 + PointRangeQuery 2-dim case).
    Non-scoring (constant score), composes as FILTER/MUST."""

    field_x: str
    field_y: str
    x0: float
    x1: float
    y0: float
    y1: float


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase with MULTIPLE accepted terms per position (search/
    MultiPhraseQuery.java:47, e.g. "microsoft (app OR office)"): position j
    matches if ANY of ``positions[j]``'s terms occurs there. Matched like
    ExactPhraseMatcher over per-slot UNION postings (the reference's
    UnionPostingsEnum), scored with the idf sum over every term in the query
    (terms absent from the collection contribute nothing, as in the
    reference where they carry no TermStates)."""

    positions: tuple  # tuple[tuple[str, ...], ...]
    slop: int = 0
    field: str | None = None

    def __init__(self, positions, slop: int = 0, field: str | None = None):
        object.__setattr__(
            self, "positions", tuple(tuple(slot) for slot in positions)
        )
        object.__setattr__(self, "slop", int(slop))
        object.__setattr__(self, "field", field)


@dataclass(frozen=True)
class CoveringQuery(Query):
    """Matches docs where the number of matching sub-queries ≥ a PER-DOC
    minimum read from a numeric doc-values column — sandbox/search/
    CoveringQuery.java:49 with LongValuesSource.fromLongField semantics.
    Score = sum of the matching sub-scores. Evaluation is union-driven, so
    the per-doc minimum is effectively clamped to ≥ 1 (a doc matching zero
    clauses never matches, exactly as in the reference's scorer)."""

    queries: tuple
    min_match_field: str

    def __init__(self, queries, min_match_field: str):
        object.__setattr__(self, "queries", tuple(queries))
        object.__setattr__(self, "min_match_field", min_match_field)


@dataclass(frozen=True)
class GeoDistanceQuery(Query):
    """All docs whose (lat, lon) doc values lie within ``radius_m`` meters of
    the center — LatLonPoint.newDistanceQuery (document/LatLonPoint.java:281)
    semantics: BKD box pruning (the 2-D kd index over the lat/lon columns)
    followed by exact haversine verification (util/SloppyMath.java:47
    haversinMeters, same op order). Non-scoring (constant score 1·boost),
    composes as FILTER/MUST."""

    lat_field: str
    lon_field: str
    lat: float
    lon: float
    radius_m: float


@dataclass(frozen=True)
class SynonymQuery(Query):
    """Multi-term scored as ONE pseudo-term: summed tf per doc, idf from the
    blended (max) docFreq (search/SynonymQuery.java:52-214)."""

    terms: tuple

    def __init__(self, terms):
        object.__setattr__(self, "terms", tuple(terms))


@dataclass(frozen=True)
class CombinedFieldQuery(Query):
    """BM25F-style combined-field scoring (sandbox/search/CombinedFieldQuery
    .java:84-91): treats the listed fields as one synthetic field. All
    (field, term) postings merge into ONE pseudo-term — per-doc
    freq = Σ_f w_f·freq(f,t), per-doc length = Σ_f w_f·dl_f, pseudo term
    stats df = max over pairs / ttf = Σ w_f·ttf (:295-305), pseudo
    collection stats docCount = max_f, sumTotalTermFreq = Σ w_f·sumTtf_f
    (:318-334); the norm sum mirrors MultiNormsLeafSimScorer's
    MultiFieldNormValues (exact lengths here instead of the re-encoded
    SmallFloat byte)."""

    terms: tuple
    fields: tuple  # ((field, weight), ...)

    def __init__(self, terms, fields):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(
            self, "fields", tuple((str(f), float(w)) for f, w in fields)
        )


@dataclass(frozen=True)
class TermInSetQuery(Query):
    terms: tuple

    def __init__(self, terms):
        object.__setattr__(self, "terms", tuple(sorted(set(terms))))


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    pass


@dataclass(frozen=True)
class JoinQuery(Query):
    """Query-time scored join (join/JoinUtil.createJoinQuery semantics):
    evaluate ``from_query``, project the matching docs' ``from_field``
    doc values with their scores aggregated per value (ScoreMode
    none/sum/max/avg), then match every doc whose ``to_field`` value is in
    that set, scoring it with the aggregated from-score."""

    from_query: Query
    from_field: str
    to_field: str
    score_mode: str = "avg"


@dataclass(frozen=True)
class SpanNearQuery(Query):
    """Proximity query with minimal-interval semantics (spans/SpanNearQuery
    .java:42 ordered/unordered; queries/.../intervals/IntervalQuery.java:59
    Intervals.ordered/unordered): matches docs where all terms occur within
    ``slop`` slack positions, optionally in order; freq = Σ 1/(1+width) over
    minimal intervals (SpanScorer sloppyFreq)."""

    terms: tuple
    slop: int = 0
    in_order: bool = False

    def __init__(self, terms, slop: int = 0, in_order: bool = False):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "slop", int(slop))
        object.__setattr__(self, "in_order", bool(in_order))


@dataclass(frozen=True)
class IntervalQuery(Query):
    """Minimal-interval algebra query (queries/.../intervals/IntervalQuery
    .java:59): matches docs where ``source`` (built with the factories in
    functions/interval_algebra — term/phrase/ordered/unordered/or/maxgaps/
    containing/...) produces at least one interval. Score is similarity-
    independent: per-doc freq = Σ 1/max(extent - minExtent + 1, 1) over the
    emitted minimal intervals, passed through a saturation function
    ``boost * (1 - pivot/(pivot + freq))`` (IntervalScoreFunction.java), or
    a sigmoid when ``exp`` is set."""

    field: str | None
    source: object  # an interval_algebra.IvSource
    pivot: float = 1.0
    exp: float | None = None


@dataclass(frozen=True)
class ToParentBlockJoinQuery(Query):
    """Join child matches up to their parent doc (join/ToParentBlockJoinQuery
    .java:63): blocks are indexed children-first with the parent LAST;
    ``score_mode`` ∈ {none, sum, max, avg} aggregates child scores per parent
    (ScoreMode.{None,Total,Max,Avg})."""

    child_query: Query
    score_mode: str = "sum"


@dataclass(frozen=True)
class ToChildBlockJoinQuery(Query):
    """Join parent matches down to every child in the block
    (join/ToChildBlockJoinQuery.java): each child inherits its parent's
    score."""

    parent_query: Query


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    query: Query
    score: float = 1.0


@dataclass(frozen=True)
class BoostQuery(Query):
    query: Query
    boost: float


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """max over sub-scores + tie_breaker * sum of the others
    (search/DisjunctionMaxQuery.java)."""

    disjuncts: tuple
    tie_breaker: float = 0.0

    def __init__(self, disjuncts, tie_breaker: float = 0.0):
        object.__setattr__(self, "disjuncts", tuple(disjuncts))
        object.__setattr__(self, "tie_breaker", float(tie_breaker))


@dataclass(frozen=True)
class FunctionScoreQuery(Query):
    """Rescore a sub-query with a user expression over (scores, doc-values)
    — the FunctionScoreQuery / expressions-module surface
    (queries/.../function/FunctionScoreQuery.java; expressions compile
    JS-like formulas against scores and doc values). Here the expression is
    a plain vectorized callable ``fn(scores: np.ndarray, doc_values:
    dict[str, np.ndarray]) -> np.ndarray`` — the Python-native user
    extension point."""

    query: Query
    fn: object = None

    def __init__(self, query, fn):
        object.__setattr__(self, "query", query)
        object.__setattr__(self, "fn", fn)


@dataclass(frozen=True)
class BooleanQuery(Query):
    """must scored-AND, should scored-OR, must_not exclusion, filter =
    non-scoring must; minimum_should_match as in BooleanQuery.java."""

    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()
    filter: tuple = ()
    minimum_should_match: int = 0

    def __init__(self, must=(), should=(), must_not=(), filter=(), minimum_should_match=0):
        object.__setattr__(self, "must", tuple(must))
        object.__setattr__(self, "should", tuple(should))
        object.__setattr__(self, "must_not", tuple(must_not))
        object.__setattr__(self, "filter", tuple(filter))
        object.__setattr__(self, "minimum_should_match", int(minimum_should_match))

    MAX_CLAUSE_COUNT = 1024  # BooleanQuery.java maxClauseCount default

    def __post_init__(self):
        n = len(self.must) + len(self.should) + len(self.must_not) + len(self.filter)
        if n > self.MAX_CLAUSE_COUNT:
            raise ValueError(f"maxClauseCount is set to {self.MAX_CLAUSE_COUNT}")


# --------------------------------------------------------------- parser


class QueryParseError(ValueError):
    """Malformed query string (the ParseException analogue)."""


class _Tok:
    def __init__(self, kind, value=None):
        self.kind = kind
        self.value = value

    def __repr__(self):
        return f"{self.kind}:{self.value}"


def _lex(s: str):
    i, n = 0, len(s)
    out = []
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
        elif c == "(":
            out.append(_Tok("LP")); i += 1
        elif c == ")":
            out.append(_Tok("RP")); i += 1
        elif c == "+":
            out.append(_Tok("PLUS")); i += 1
        elif c == "-":
            out.append(_Tok("MINUS")); i += 1
        elif c == '"':
            j = s.find('"', i + 1)
            if j < 0:
                raise QueryParseError(
                    f"unbalanced quote at offset {i} in query: {s!r}"
                )
            out.append(_Tok("PHRASE", s[i + 1 : j]))
            i = j + 1
        else:
            j = i
            while j < n and not s[j].isspace() and s[j] not in '()"':
                j += 1
            word = s[i:j]
            if word == "AND":
                out.append(_Tok("AND"))
            elif word == "OR":
                out.append(_Tok("OR"))
            elif word == "NOT":
                out.append(_Tok("NOT"))
            else:
                out.append(_Tok("WORD", word))
            i = j
    return out


class _Parser:
    def __init__(self, toks, normalize):
        self.toks = toks
        self.i = 0
        self.normalize = normalize

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self) -> Query:
        return self.parse_or()

    def parse_or(self) -> Query:
        parts = [self.parse_and()]
        while self.peek() and self.peek().kind == "OR":
            self.next()
            parts.append(self.parse_and())
        if len(parts) == 1:
            return parts[0]
        return BooleanQuery(should=parts)

    def parse_and(self) -> Query:
        parts = [self.parse_clause()]
        ops = []
        while self.peek() and self.peek().kind in ("AND", "NOT"):
            ops.append(self.next().kind)
            parts.append(self.parse_clause())
        if len(parts) == 1:
            return parts[0]
        must, must_not = [parts[0]], []
        for op, p in zip(ops, parts[1:]):
            (must_not if op == "NOT" else must).append(p)
        return BooleanQuery(must=must, must_not=must_not)

    def parse_clause(self) -> Query:
        # a space-separated run of atoms (classic default-OR with +/- modifiers)
        must, should, must_not = [], [], []
        while True:
            t = self.peek()
            if t is None or t.kind in ("AND", "OR", "NOT", "RP"):
                break
            occur = "should"
            if t.kind == "PLUS":
                self.next(); occur = "must"
            elif t.kind == "MINUS":
                self.next(); occur = "must_not"
            q = self.parse_atom()
            {"must": must, "should": should, "must_not": must_not}[occur].append(q)
        if len(should) == 1 and not must and not must_not:
            return should[0]
        if len(must) == 1 and not should and not must_not:
            return must[0]
        return BooleanQuery(must=must, should=should, must_not=must_not)

    def parse_atom(self) -> Query:
        t = self.next()
        if t.kind == "LP":
            q = self.parse_or()
            if self.peek() and self.peek().kind == "RP":
                self.next()
            return self._maybe_boost(q)
        if t.kind == "PHRASE":
            terms = [self.normalize(w) for w in t.value.split()]
            return self._maybe_boost(PhraseQuery(terms))
        if t.kind == "WORD":
            w = t.value
            fieldname = None
            if ":" in w:  # classic field:term syntax
                fieldname, w = w.split(":", 1)
            boost = None
            if "^" in w:
                w, bs = w.rsplit("^", 1)
                boost = float(bs)
            if w.endswith("*") and len(w) > 1:
                q: Query = PrefixQuery(self.normalize(w[:-1]), field=fieldname)
            else:
                q = TermQuery(self.normalize(w), field=fieldname)
            if boost is not None:
                q = BoostQuery(q, boost)
            return q
        raise ValueError(f"unexpected token {t}")

    def _maybe_boost(self, q: Query) -> Query:
        return q


def parse_query(s: str, normalize=None) -> Query:
    """Parse the classic-syntax subset. ``normalize`` defaults to lowercase
    (the reference applies the analyzer's normalize chain to query terms,
    StandardAnalyzer.java:98-101)."""
    normalize = normalize or (lambda w: w.lower())
    toks = _lex(s)
    if not toks:
        return MatchAllDocsQuery()
    return _Parser(toks, normalize).parse()


def extract_terms(q: Query) -> set[str]:
    """All positively-scored terms in a query tree (for stats gathering)."""
    if isinstance(q, TermQuery):
        return {q.term}
    if isinstance(q, PhraseQuery):
        return set(q.terms)
    if isinstance(q, (TermInSetQuery, SynonymQuery)):
        return set(q.terms)
    if isinstance(q, (BoostQuery, ConstantScoreQuery)):
        return extract_terms(q.query)
    if isinstance(q, DisjunctionMaxQuery):
        return set().union(*[extract_terms(d) for d in q.disjuncts]) if q.disjuncts else set()
    if isinstance(q, BooleanQuery):
        out: set[str] = set()
        for sub in (*q.must, *q.should, *q.filter, *q.must_not):
            out |= extract_terms(sub)
        return out
    return set()
