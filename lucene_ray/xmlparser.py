"""XML query parser (queryparser/xml/CoreParser.java): build Query trees
from the reference's XML element vocabulary.

Supported elements (CoreParser.java:72-115 builder registrations):
``TermQuery``, ``TermsQuery``, ``MatchAllDocsQuery``, ``BooleanQuery`` /
``Clause occurs=must|should|mustNot|filter``, ``RangeQuery``,
``PointRangeQuery``, ``DisjunctionMaxQuery``, ``ConstantScoreQuery``,
``UserQuery`` (classic syntax), ``BoostingTermQuery``, ``SpanTerm``,
``SpanOr``, ``SpanOrTerms``, ``SpanNear``, ``SpanFirst``,
``SpanPositionRange``, ``SpanNot`` (with ``Include``/``Exclude`` children).
Attribute conventions follow the reference builders: ``fieldName``
(inherited from the enclosing element), ``boost``, ``lowerTerm``/
``upperTerm`` + ``includeLower``/``includeUpper``,
``minimumNumberShouldMatch``, ``tieBreaker``, ``slop``/``inOrder``,
``start``/``end``.

Not carried over: the LikeThis/FuzzyLikeThis builders — MoreLikeThis is
available programmatically on the searcher.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from lucene_ray.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    NumericRangeQuery,
    Query,
    QueryParseError,
    SpanNearQuery,
    SpanNotQuery,
    SpanPositionRangeQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    parse_query,
)


def parse_xml_query(
    xml: str,
    normalize=None,
    default_field: str | None = None,
    numeric_fields=(),
) -> Query:
    """Parse one XML query document into a Query tree."""
    normalize = normalize or (lambda w: w.lower())
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as e:
        raise QueryParseError(f"malformed query XML: {e}") from e
    return _Builder(normalize, frozenset(numeric_fields)).build(root, default_field)


def _bool_attr(el, name, default=True):
    v = el.get(name)
    return default if v is None else v.strip().lower() in ("true", "1", "yes")


class _Builder:
    def __init__(self, normalize, numeric_fields):
        self.normalize = normalize
        self.numeric_fields = numeric_fields

    def build(self, el: ET.Element, field: str | None) -> Query:
        field = el.get("fieldName", field)
        q = self._dispatch(el, field)
        boost = el.get("boost")
        if boost is not None:
            q = BoostQuery(q, float(boost))
        return q

    def _children(self, el):
        return [c for c in el if isinstance(c.tag, str)]

    def _text(self, el) -> str:
        return (el.text or "").strip()

    def _dispatch(self, el: ET.Element, field) -> Query:
        tag = el.tag
        if tag in ("TermQuery", "BoostingTermQuery", "SpanTerm"):
            return TermQuery(self.normalize(self._text(el)), field=field)
        if tag == "TermsQuery":
            terms = [self.normalize(w) for w in self._text(el).split()]
            return TermInSetQuery(terms, field=field)
        if tag == "MatchAllDocsQuery":
            return MatchAllDocsQuery()
        if tag == "UserQuery":
            return parse_query(
                self._text(el),
                normalize=self.normalize,
                default_field=field,
                numeric_fields=self.numeric_fields,
            )
        if tag == "BooleanQuery":
            must, should, must_not, filt = [], [], [], []
            for clause in self._children(el):
                if clause.tag != "Clause":
                    raise QueryParseError(
                        f"BooleanQuery child must be Clause, got {clause.tag}")
                occurs = (clause.get("occurs") or "should").strip()
                subs = self._children(clause)
                if len(subs) != 1:
                    raise QueryParseError("Clause must hold exactly one query")
                q = self.build(subs[0], field)
                {"must": must, "should": should, "mustNot": must_not,
                 "filter": filt}.get(occurs, should).append(q)
            return BooleanQuery(
                must=must, should=should, must_not=must_not, filter=filt,
                minimum_should_match=int(el.get("minimumNumberShouldMatch", 0)),
            )
        if tag == "RangeQuery":
            lo, hi = el.get("lowerTerm"), el.get("upperTerm")
            return TermRangeQuery(
                self.normalize(lo) if lo is not None else None,
                self.normalize(hi) if hi is not None else None,
                _bool_attr(el, "includeLower"),
                _bool_attr(el, "includeUpper"),
                field=field,
            )
        if tag == "PointRangeQuery":
            if field is None:
                raise QueryParseError("PointRangeQuery requires fieldName")
            lo, hi = el.get("lowerTerm"), el.get("upperTerm")
            return NumericRangeQuery(
                field,
                float(lo) if lo is not None else None,
                float(hi) if hi is not None else None,
                _bool_attr(el, "includeLower"),
                _bool_attr(el, "includeUpper"),
            )
        if tag == "DisjunctionMaxQuery":
            subs = [self.build(c, field) for c in self._children(el)]
            return DisjunctionMaxQuery(subs, float(el.get("tieBreaker", 0.0)))
        if tag == "ConstantScoreQuery":
            subs = self._children(el)
            if len(subs) != 1:
                raise QueryParseError("ConstantScoreQuery holds exactly one query")
            return ConstantScoreQuery(self.build(subs[0], field))
        if tag == "SpanNear":
            slots = [self._span_slot(c) for c in self._children(el)]
            if not slots:
                raise QueryParseError("SpanNear needs at least one child")
            return SpanNearQuery(
                slots,
                slop=int(el.get("slop", 0)),
                in_order=_bool_attr(el, "inOrder"),
            )
        if tag in ("SpanOr", "SpanOrTerms"):
            # standalone span disjunction = 1-slot near query
            return SpanNearQuery([self._span_slot(el)], slop=0, in_order=False)
        if tag in ("SpanFirst", "SpanPositionRange"):
            subs = self._children(el)
            if len(subs) != 1:
                raise QueryParseError(f"{tag} holds exactly one span query")
            match = self._span_query(subs[0], field)
            start = 0 if tag == "SpanFirst" else int(el.get("start", 1))
            return SpanPositionRangeQuery(match, start, int(el.get("end", 1)))
        if tag == "SpanNot":
            inc = [c for c in self._children(el) if c.tag == "Include"]
            exc = [c for c in self._children(el) if c.tag == "Exclude"]
            if len(inc) != 1 or len(exc) != 1:
                raise QueryParseError("SpanNot needs Include and Exclude")
            return SpanNotQuery(
                self._span_query(self._children(inc[0])[0], field),
                self._span_query(self._children(exc[0])[0], field),
            )
        raise QueryParseError(f"unsupported query element <{tag}>")

    def _span_query(self, el: ET.Element, field) -> Query:
        """A child element as a span query (SpanNear passes through, span
        leaves become 1-slot near queries)."""
        q = self._dispatch(el, el.get("fieldName", field))
        if isinstance(q, SpanNearQuery):
            return q
        if isinstance(q, TermQuery):
            return SpanNearQuery([(q.term,)], slop=0, in_order=True)
        raise QueryParseError(f"<{el.tag}> is not a span query")

    def _span_slot(self, el: ET.Element):
        """A span child as one SpanNearQuery slot (tuple of terms)."""
        if el.tag == "SpanTerm":
            return (self.normalize(self._text(el)),)
        if el.tag == "SpanOrTerms":
            terms = tuple(self.normalize(w) for w in self._text(el).split())
            if not terms:
                raise QueryParseError("SpanOrTerms is empty")
            return terms
        if el.tag == "SpanOr":
            out = []
            for c in self._children(el):
                out.extend(self._span_slot(c))
            if not out:
                raise QueryParseError("SpanOr is empty")
            return tuple(out)
        raise QueryParseError(f"unsupported span element <{el.tag}>")
