"""JS-like scoring expression compiler — the reference ``expressions``
module (expressions/.../js/JavascriptCompiler.java:178, grammar in
js/package-info.java) re-expressed as a recursive-descent parser that
compiles to a VECTORIZED numpy evaluator (no per-doc interpretation).

Supported (same surface as the reference grammar):

* arithmetic ``+ - * / %`` (``%`` = Java double remainder = fmod)
* bitwise ``| & ^ ~ << >> >>>`` (operands cast double→int64 like the
  JVM's ``(long)`` cast; shift counts masked to 6 bits; ``>>>`` unsigned)
* boolean ``&& || !`` and the ternary ``?:`` (nonzero = true; results 0/1)
* comparison ``< <= == != >= >``
* decimal / hex (``0x``) / octal (``0``-prefixed) integer and decimal
  float literals
* the DEFAULT_FUNCTIONS table (JavascriptCompiler.properties): abs acos
  acosh asin asinh atan atan2 atanh ceil cos cosh exp floor haversin ln
  log10 logn max min pow sin sinh sqrt tan tanh
* free variables resolve from the evaluation environment — ``_score`` (or
  ``score``) binds to the sub-query's scores, any other name to a numeric
  doc-values column (SimpleBindings.java analogue).

``compile_expression(src)`` returns an :class:`Expression` whose
``evaluate(env)`` maps ``dict[str, ndarray|float] -> ndarray`` and whose
``as_score_fn()`` adapts it to the ``FunctionScoreQuery.fn(scores,
doc_values)`` callable surface.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

__all__ = ["compile_expression", "Expression", "ExpressionError"]


class ExpressionError(ValueError):
    """Parse / binding error with position info."""


def _f(x):
    return np.asarray(x, dtype=np.float64)


def _long(x):
    # JVM (long) cast: truncate toward zero, NaN -> 0, saturate at bounds
    a = _f(x)
    out = np.where(np.isnan(a), 0.0, np.trunc(a))
    out = np.clip(out, np.iinfo(np.int64).min, np.iinfo(np.int64).max)
    return out.astype(np.int64)


def _haversin_km(lat1, lon1, lat2, lon2):
    # SloppyMath.haversinKilometers semantics (great-circle, mean radius)
    p1, p2 = np.radians(_f(lat1)), np.radians(_f(lat2))
    dlat = p2 - p1
    dlon = np.radians(_f(lon2)) - np.radians(_f(lon1))
    h = np.sin(dlat / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlon / 2) ** 2
    return 2 * 6371.0087714 * np.arcsin(np.sqrt(h))


FUNCTIONS = {
    "abs": (1, np.abs), "acos": (1, np.arccos), "acosh": (1, np.arccosh),
    "asin": (1, np.arcsin), "asinh": (1, np.arcsinh), "atan": (1, np.arctan),
    "atan2": (2, np.arctan2), "atanh": (1, np.arctanh), "ceil": (1, np.ceil),
    "cos": (1, np.cos), "cosh": (1, np.cosh), "exp": (1, np.exp),
    "floor": (1, np.floor), "haversin": (4, _haversin_km), "ln": (1, np.log),
    "log10": (1, np.log10),
    "logn": (2, lambda b, x: np.log(_f(x)) / np.log(_f(b))),
    "max": (2, np.maximum), "min": (2, np.minimum), "pow": (2, np.power),
    "sin": (1, np.sin), "sinh": (1, np.sinh), "sqrt": (1, np.sqrt),
    "tan": (1, np.tan), "tanh": (1, np.tanh),
}

_TOKEN = re.compile(r"""
    \s*(?:
      (?P<num>0[xX][0-9a-fA-F]+|\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?
             |\d+(?:[eE][+-]?\d+)?)
    | (?P<id>[A-Za-z_][A-Za-z0-9_.]*)
    | (?P<op>>>>|<<|>>|<=|>=|==|!=|&&|\|\||[-+*/%()&|^~!?:,<>])
    )""", re.VERBOSE)


def _lex(src: str):
    toks, i = [], 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m or m.end() == m.start():
            if src[i:].strip() == "":
                break
            raise ExpressionError(f"unexpected character at {i}: {src[i:i+10]!r}")
        if m.group("num") is not None:
            t = m.group("num")
            if t.startswith(("0x", "0X")):
                v = float(int(t, 16))
            elif re.fullmatch(r"0[0-7]+", t):
                v = float(int(t, 8))  # octal literal (reference grammar)
            else:
                v = float(t)
            toks.append(("num", v, m.start()))
        elif m.group("id") is not None:
            toks.append(("id", m.group("id"), m.start()))
        else:
            toks.append(("op", m.group("op"), m.start()))
        i = m.end()
    toks.append(("eof", None, len(src)))
    return toks


@dataclass
class Expression:
    """A compiled expression: ``source``, free ``variables`` and a
    vectorized ``evaluate(env)``."""

    source: str
    variables: tuple
    _fn: object

    def evaluate(self, env: dict) -> np.ndarray:
        missing = [v for v in self.variables if v not in env]
        if missing:
            raise ExpressionError(f"unbound variables {missing} in {self.source!r}")
        return _f(self._fn(env))

    def as_score_fn(self):
        """Adapter to ``FunctionScoreQuery.fn(scores, doc_values)``; binds
        ``_score``/``score`` to the sub-query scores."""

        def fn(scores, doc_values):
            env = dict(doc_values)
            env["_score"] = scores
            env["score"] = scores
            return self.evaluate(env)

        return fn


class _Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks = _lex(src)
        self.i = 0
        self.vars: list[str] = []

    def peek(self):
        return self.toks[self.i]

    def take(self, kind=None, val=None):
        t = self.toks[self.i]
        if kind and t[0] != kind or (val is not None and t[1] != val):
            raise ExpressionError(
                f"expected {val or kind} at {t[2]} in {self.src!r}, got {t[1]!r}")
        self.i += 1
        return t

    # precedence climbing: each level returns fn(env) -> ndarray/scalar
    def parse(self):
        fn = self.ternary()
        if self.peek()[0] != "eof":
            t = self.peek()
            raise ExpressionError(f"trailing input at {t[2]}: {t[1]!r}")
        return fn

    def ternary(self):
        cond = self.or_()
        if self.peek()[:2] == ("op", "?"):
            self.take()
            a = self.ternary()
            self.take("op", ":")
            b = self.ternary()
            return lambda e: np.where(_f(cond(e)) != 0.0, _f(a(e)), _f(b(e)))
        return cond

    def _binop(self, sub, ops, impl):
        fn = sub()
        while self.peek()[0] == "op" and self.peek()[1] in ops:
            op = self.take()[1]
            rhs = sub()
            fn = impl(op, fn, rhs)
        return fn

    def or_(self):
        return self._binop(self.and_, ("||",), lambda _o, a, b:
                           lambda e: ((_f(a(e)) != 0) | (_f(b(e)) != 0)).astype(np.float64))

    def and_(self):
        return self._binop(self.bitor, ("&&",), lambda _o, a, b:
                           lambda e: ((_f(a(e)) != 0) & (_f(b(e)) != 0)).astype(np.float64))

    def bitor(self):
        return self._binop(self.bitxor, ("|",), lambda _o, a, b:
                           lambda e: (_long(a(e)) | _long(b(e))).astype(np.float64))

    def bitxor(self):
        return self._binop(self.bitand, ("^",), lambda _o, a, b:
                           lambda e: (_long(a(e)) ^ _long(b(e))).astype(np.float64))

    def bitand(self):
        return self._binop(self.eq, ("&",), lambda _o, a, b:
                           lambda e: (_long(a(e)) & _long(b(e))).astype(np.float64))

    def eq(self):
        def impl(op, a, b):
            if op == "==":
                return lambda e: (_f(a(e)) == _f(b(e))).astype(np.float64)
            return lambda e: (_f(a(e)) != _f(b(e))).astype(np.float64)
        return self._binop(self.cmp, ("==", "!="), impl)

    def cmp(self):
        def impl(op, a, b):
            f = {"<": np.less, "<=": np.less_equal,
                 ">": np.greater, ">=": np.greater_equal}[op]
            return lambda e: f(_f(a(e)), _f(b(e))).astype(np.float64)
        return self._binop(self.shift, ("<", "<=", ">", ">="), impl)

    def shift(self):
        def impl(op, a, b):
            if op == "<<":
                return lambda e: (_long(a(e)) << (_long(b(e)) & 63)).astype(np.float64)
            if op == ">>":
                return lambda e: (_long(a(e)) >> (_long(b(e)) & 63)).astype(np.float64)
            return lambda e: (_long(a(e)).astype(np.uint64)
                              >> (_long(b(e)).astype(np.uint64) & np.uint64(63))
                              ).astype(np.int64).astype(np.float64)
        return self._binop(self.add, ("<<", ">>", ">>>"), impl)

    def add(self):
        def impl(op, a, b):
            if op == "+":
                return lambda e: _f(a(e)) + _f(b(e))
            return lambda e: _f(a(e)) - _f(b(e))
        return self._binop(self.mul, ("+", "-"), impl)

    def mul(self):
        def impl(op, a, b):
            if op == "*":
                return lambda e: _f(a(e)) * _f(b(e))
            if op == "/":
                def div(e, a=a, b=b):
                    with np.errstate(divide="ignore", invalid="ignore"):
                        return np.divide(_f(a(e)), _f(b(e)))
                return div
            return lambda e: np.fmod(_f(a(e)), _f(b(e)))  # Java double %
        return self._binop(self.unary, ("*", "/", "%"), impl)

    def unary(self):
        t = self.peek()
        if t[0] == "op" and t[1] in ("-", "+", "!", "~"):
            self.take()
            sub = self.unary()
            if t[1] == "-":
                return lambda e: -_f(sub(e))
            if t[1] == "+":
                return sub
            if t[1] == "!":
                return lambda e: (_f(sub(e)) == 0.0).astype(np.float64)
            return lambda e: (~_long(sub(e))).astype(np.float64)
        return self.postfix()

    def postfix(self):
        t = self.peek()
        if t[:1] == ("num",):
            self.take()
            v = t[1]
            return lambda e: v
        if t[0] == "op" and t[1] == "(":
            self.take()
            fn = self.ternary()
            self.take("op", ")")
            return fn
        if t[0] == "id":
            name = self.take()[1]
            if self.peek()[:2] == ("op", "("):
                if name not in FUNCTIONS:
                    raise ExpressionError(f"unknown function {name!r} at {t[2]}")
                arity, impl = FUNCTIONS[name]
                self.take()
                args = [self.ternary()]
                while self.peek()[:2] == ("op", ","):
                    self.take()
                    args.append(self.ternary())
                self.take("op", ")")
                if len(args) != arity:
                    raise ExpressionError(
                        f"{name} takes {arity} args, got {len(args)} at {t[2]}")

                def call(e, impl=impl, args=args):
                    with np.errstate(invalid="ignore", divide="ignore"):
                        return impl(*[_f(a(e)) for a in args])
                return call
            if name not in self.vars:
                self.vars.append(name)
            return lambda e: e[name]
        raise ExpressionError(f"unexpected token {t[1]!r} at {t[2]} in {self.src!r}")


def compile_expression(source: str) -> Expression:
    """Compile ``source`` to a vectorized evaluator (JavascriptCompiler.
    compile analogue). Raises :class:`ExpressionError` on bad syntax,
    unknown functions, or wrong arity — at compile time, like the
    reference."""
    p = _Parser(source)
    fn = p.parse()
    return Expression(source=source, variables=tuple(p.vars), _fn=fn)
