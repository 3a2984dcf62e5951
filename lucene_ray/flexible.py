"""Flexible query-parser pipeline — the StandardQueryParser surface.

Reference: queryparser/flexible/standard/StandardQueryParser.java:73 — the
"flexible" framework splits parsing into a syntax parser → a configurable
chain of query-node PROCESSORS → a builder, all driven by a config handler
(default operator, multi-fields, fuzzy/phrase defaults, points config,
allow-leading-wildcard). This module reproduces that CONTRACT functionally:
the classic grammar produces the query tree (syntax is identical between
classic and flexible in the reference), the config knobs are first-class,
and user processors are composable Query→Query passes run in order —
exactly how QueryNodeProcessorPipeline.process chains node processors.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from lucene_ray.query import (
    BooleanQuery,
    BoostQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    PhraseQuery,
    Query,
    TermQuery,
    WildcardQuery,
    parse_query,
)


@dataclass
class StandardQueryConfig:
    """QueryConfigHandler analogue (flexible/standard/config/
    StandardQueryConfigHandler.java): the knobs processors consult."""

    default_operator: str = "OR"          # OR | AND
    multi_fields: tuple = ()              # ((field, boost), ...) expansion
    phrase_slop: int = 0
    fuzzy_max_edits: int = 2
    allow_leading_wildcard: bool = False
    numeric_fields: tuple = ()            # points-config map
    analyzer: object = None               # normalize provider


class StandardQueryParser:
    """parse(query[, default_field]) → Query through the processor pipeline.

    Built-in processors (mirroring the default pipeline's visible effects):
    default-operator rewrite, multi-field expansion, phrase-slop default,
    fuzzy-edits clamp, leading-wildcard guard. ``add_processor`` appends
    user Query→Query passes (QueryNodeProcessorPipeline.add analogue)."""

    def __init__(self, analyzer=None, config: StandardQueryConfig | None = None):
        from lucene_ray.functions.analysis import get_analyzer

        self.config = config or StandardQueryConfig()
        self.analyzer = (get_analyzer(analyzer) if isinstance(analyzer, str)
                         else analyzer)
        self._processors: list = []

    # ------------------------------------------------------- configuration

    def set_default_operator(self, op: str) -> "StandardQueryParser":
        op = op.upper()
        if op not in ("AND", "OR"):
            raise ValueError("operator must be AND or OR")
        self.config.default_operator = op
        return self

    def set_multi_fields(self, fields) -> "StandardQueryParser":
        """Unfielded terms expand over these (field, boost) pairs as a
        disjunction — setMultiFields semantics."""
        self.config.multi_fields = tuple(
            (f, 1.0) if isinstance(f, str) else (f[0], float(f[1]))
            for f in fields)
        return self

    def set_phrase_slop(self, slop: int) -> "StandardQueryParser":
        self.config.phrase_slop = int(slop)
        return self

    def set_fuzzy_max_edits(self, edits: int) -> "StandardQueryParser":
        self.config.fuzzy_max_edits = int(edits)
        return self

    def set_allow_leading_wildcard(self, allow: bool) -> "StandardQueryParser":
        self.config.allow_leading_wildcard = bool(allow)
        return self

    def set_numeric_fields(self, fields) -> "StandardQueryParser":
        self.config.numeric_fields = tuple(fields)
        return self

    def add_processor(self, fn) -> "StandardQueryParser":
        """Append a Query→Query pass, run after the built-in ones."""
        self._processors.append(fn)
        return self

    # ------------------------------------------------------------- parsing

    def parse(self, s: str, default_field: str | None = None) -> Query:
        normalize = (self.analyzer.normalize if self.analyzer
                     else (lambda w: w.lower()))
        q = parse_query(s, normalize=normalize, default_field=default_field,
                        numeric_fields=self.config.numeric_fields)
        for proc in self._builtin_processors() + self._processors:
            q = proc(q)
        return q

    def _builtin_processors(self):
        procs = [self._leading_wildcard_guard, self._fuzzy_clamp,
                 self._phrase_slop_default]
        if self.config.default_operator == "AND":
            procs.append(self._and_operator)
        if self.config.multi_fields:
            procs.append(self._multi_field_expand)
        return procs

    # -------------------------------------------------- builtin processors

    def _walk(self, q: Query, fn) -> Query:
        """Bottom-up tree rewrite (the node-processor visitation order)."""
        if isinstance(q, BooleanQuery):
            new = BooleanQuery(
                must=[self._walk(c, fn) for c in q.must],
                should=[self._walk(c, fn) for c in q.should],
                must_not=[self._walk(c, fn) for c in q.must_not],
                filter=[self._walk(c, fn) for c in q.filter],
                minimum_should_match=q.minimum_should_match,
            )
            if getattr(q, "_explicit_or", False):
                object.__setattr__(new, "_explicit_or", True)
            q = new
        elif isinstance(q, BoostQuery):
            q = BoostQuery(self._walk(q.query, fn), q.boost)
        elif isinstance(q, DisjunctionMaxQuery):
            q = DisjunctionMaxQuery(
                [self._walk(c, fn) for c in q.disjuncts], q.tie_breaker)
        return fn(q)

    def _leading_wildcard_guard(self, q: Query) -> Query:
        if self.config.allow_leading_wildcard:
            return q

        def check(node: Query) -> Query:
            if isinstance(node, WildcardQuery) and node.pattern[:1] in ("*", "?"):
                raise ValueError(
                    "leading wildcard not allowed "
                    "(setAllowLeadingWildcard(true) to enable)")
            return node

        return self._walk(q, check)

    def _fuzzy_clamp(self, q: Query) -> Query:
        def clamp(node: Query) -> Query:
            if isinstance(node, FuzzyQuery) and node.max_edits > self.config.fuzzy_max_edits:
                return FuzzyQuery(node.term, max_edits=self.config.fuzzy_max_edits,
                                  prefix_length=node.prefix_length,
                                  field=node.field)
            return node

        return self._walk(q, clamp)

    def _phrase_slop_default(self, q: Query) -> Query:
        if not self.config.phrase_slop:
            return q

        def slop(node: Query) -> Query:
            if isinstance(node, PhraseQuery) and node.slop == 0:
                return PhraseQuery(node.terms, slop=self.config.phrase_slop,
                                   field=node.field)
            return node

        return self._walk(q, slop)

    def _and_operator(self, q: Query) -> Query:
        """EVERY implicit-juxtaposition boolean becomes all-MUST (the
        DefaultOperatorAttribute=AND rewrite applies to each GroupQueryNode,
        so ``a b (c d)`` yields ``+a +b +(+c +d)``), while EXPLICIT
        ``a OR b`` groups keep their disjunction — exactly the reference's
        distinction (the default operator only fills in unspecified
        occurrences)."""

        def rewrite(node: Query) -> Query:
            if isinstance(node, BooleanQuery) and node.should \
                    and not node.must and not node.must_not \
                    and not node.filter and not node.minimum_should_match \
                    and not getattr(node, "_explicit_or", False):
                return BooleanQuery(must=list(node.should))
            return node

        return self._walk(q, rewrite)

    def _multi_field_expand(self, q: Query) -> Query:
        fields = self.config.multi_fields

        def expand(node: Query) -> Query:
            if isinstance(node, TermQuery) and node.field is None:
                subs = []
                for f, b in fields:
                    tq = TermQuery(node.term, f)
                    subs.append(tq if b == 1.0 else BoostQuery(tq, b))
                return subs[0] if len(subs) == 1 else DisjunctionMaxQuery(subs, 0.0)
            if isinstance(node, PhraseQuery) and node.field is None:
                subs = [PhraseQuery(node.terms, slop=node.slop, field=f)
                        for f, _b in fields]
                return subs[0] if len(subs) == 1 else DisjunctionMaxQuery(subs, 0.0)
            return node

        return self._walk(q, expand)
