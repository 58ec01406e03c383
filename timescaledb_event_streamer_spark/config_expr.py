"""expr-lang condition -> Spark SQL translator (sink event filters).

The reference compiles FULL expr-lang programs for its event filters
(internal/eventing/eventfiltering/eventfilter.go:21-22, the
github.com/expr-lang/expr VM). Config files exercise a small surface
of that language (config.example.toml:23:
``value.op == "u" && value.before.id == 2``); this module translates
that surface to Spark SQL and — the part the old regex pass lacked —
REJECTS anything outside it with an error naming the construct, so a
silently-parseable-but-semantically-different condition can never
reach the pipeline (r7 verdict item 7).

Supported (the expr-lang operators/builtins plausible in sink
filters):

- literals: int/float, single/double-quoted strings (backslash
  escapes kept verbatim — both languages read them the same),
  ``true``/``false``/``nil``, and ``[...]`` lists after ``in``
- struct access: dotted identifiers (``value.before.id``)
- comparison: ``== != < <= > >=`` (``==`` -> ``=``)
- boolean: ``&& || !`` and the word forms ``and or not``
- membership: ``x in [a, b]`` / ``x not in [a, b]`` -> ``IN/NOT IN``
- string operators: ``startsWith endsWith contains matches`` ->
  ``startswith() endswith() contains() RLIKE``
- arithmetic: ``+ - * / %``, unary ``-``
- ternary ``c ? a : b`` -> ``IF(c, a, b)``
- builtins: ``len`` -> ``length``, ``abs``, ``lower``, ``upper``,
  ``trim``, ``int``/``float``/``string`` -> casts

Everything else (anchors into maps, closures, ranges ``..``, pipe
``|``, ``??``, unknown functions, stray tokens) raises
ExprTranslationError at CONFIG time, before any data flows.
"""

from __future__ import annotations

import re


class ExprTranslationError(ValueError):
    """A sink.filters condition uses expr-lang constructs outside the
    translated subset."""


_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<number>\d+\.\d+|\d+)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
  | (?P<op>&&|\|\||==|!=|<=|>=|[<>!?:+\-*/%(),\[\]])
    """,
    re.VERBOSE,
)

#: expr-lang builtin -> Spark SQL emission. Casts mirror expr-lang
#: semantics (int() truncates toward zero, as Spark's cast does).
_FUNCS = {
    "len": lambda a: f"length({a})",
    "abs": lambda a: f"abs({a})",
    "lower": lambda a: f"lower({a})",
    "upper": lambda a: f"upper({a})",
    "trim": lambda a: f"trim({a})",
    "int": lambda a: f"CAST({a} AS BIGINT)",
    "float": lambda a: f"CAST({a} AS DOUBLE)",
    "string": lambda a: f"CAST({a} AS STRING)",
}

_STRING_OPS = {
    "startsWith": lambda a, b: f"startswith({a}, {b})",
    "endsWith": lambda a, b: f"endswith({a}, {b})",
    "contains": lambda a, b: f"contains({a}, {b})",
    "matches": lambda a, b: f"({a} RLIKE {b})",
}

_COMPARE = {"==": "=", "!=": "!=", "<": "<", "<=": "<=", ">": ">", ">=": ">="}

#: identifiers that are operators/keywords, never column references
_KEYWORDS = {
    "in", "not", "and", "or", "true", "false", "nil",
    *_STRING_OPS, *_FUNCS,
}


def _tokenize(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise ExprTranslationError(
                f"unrecognized character {text[pos]!r} at offset {pos} "
                f"in condition {text!r}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group(0)))
    return out


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = _tokenize(text)
        self.i = 0

    # -- token helpers ----------------------------------------------------

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        tok = self.peek()
        if tok is None:
            raise ExprTranslationError(
                f"unexpected end of condition {self.text!r}"
            )
        self.i += 1
        return tok

    def accept(self, value: str) -> bool:
        tok = self.peek()
        if tok and tok[1] == value:
            self.i += 1
            return True
        return False

    def expect(self, value: str) -> None:
        tok = self.next()
        if tok[1] != value:
            raise ExprTranslationError(
                f"expected {value!r}, got {tok[1]!r} in condition {self.text!r}"
            )

    # -- grammar (expr-lang precedence, low to high) ----------------------

    def parse(self) -> str:
        sql = self.ternary()
        if self.peek() is not None:
            raise ExprTranslationError(
                f"trailing {self.peek()[1]!r} is outside the translated "
                f"expr-lang subset (condition {self.text!r})"
            )
        return sql

    def ternary(self) -> str:
        cond = self.or_()
        if self.accept("?"):
            then = self.ternary()
            self.expect(":")
            other = self.ternary()
            return f"IF({cond}, {then}, {other})"
        return cond

    def or_(self) -> str:
        left = self.and_()
        while True:
            if self.accept("||") or self.accept("or"):
                left = f"({left} OR {self.and_()})"
            else:
                return left

    def and_(self) -> str:
        left = self.not_()
        while True:
            if self.accept("&&") or self.accept("and"):
                left = f"({left} AND {self.not_()})"
            else:
                return left

    def not_(self) -> str:
        # word-form 'not' binds looser than comparisons (expr-lang /
        # Python style: `not x in [..]` == `not (x in [..])`) ...
        if self.peek() and self.peek()[1] == "not" and self._peek2() != "in":
            self.next()
            return f"(NOT {self.not_()})"
        return self.comparison()

    def comparison(self) -> str:
        left = self.additive()
        while True:
            tok = self.peek()
            if tok is None:
                return left
            if tok[1] in _COMPARE:
                self.next()
                left = f"({left} {_COMPARE[tok[1]]} {self.additive()})"
            elif tok[1] in _STRING_OPS:
                self.next()
                left = _STRING_OPS[tok[1]](left, self.additive())
            elif tok[1] == "in":
                self.next()
                left = f"({left} IN {self.list_()})"
            elif tok[1] == "not" and self._peek2() == "in":
                self.next()
                self.next()
                left = f"({left} NOT IN {self.list_()})"
            else:
                return left

    def _peek2(self) -> str | None:
        return (
            self.toks[self.i + 1][1] if self.i + 1 < len(self.toks) else None
        )

    def additive(self) -> str:
        left = self.mult()
        while True:
            tok = self.peek()
            if tok and tok[1] in ("+", "-"):
                self.next()
                left = f"({left} {tok[1]} {self.mult()})"
            else:
                return left

    def mult(self) -> str:
        left = self.unary()
        while True:
            tok = self.peek()
            if tok and tok[1] in ("*", "/", "%"):
                self.next()
                left = f"({left} {tok[1]} {self.unary()})"
            else:
                return left

    def unary(self) -> str:
        # ... while '!' binds tighter than comparisons (`!a == b` is
        # `(!a) == b` in expr-lang)
        if self.accept("-"):
            return f"(- {self.unary()})"
        if self.accept("!"):
            return f"(NOT {self.unary()})"
        return self.primary()

    def list_(self) -> str:
        self.expect("[")
        items = []
        if not self.accept("]"):
            items.append(self.ternary())
            while self.accept(","):
                items.append(self.ternary())
            self.expect("]")
        if not items:
            raise ExprTranslationError(
                f"empty list in condition {self.text!r}"
            )
        return "(" + ", ".join(items) + ")"

    def primary(self) -> str:
        kind, value = self.next()
        if kind in ("string", "number"):
            return value
        if value == "(":
            inner = self.ternary()
            self.expect(")")
            return f"({inner})"
        if value == "[":
            raise ExprTranslationError(
                "list literals are only supported after 'in' "
                f"(condition {self.text!r})"
            )
        if kind == "ident":
            if value == "true":
                return "TRUE"
            if value == "false":
                return "FALSE"
            if value == "nil":
                return "NULL"
            if value in _FUNCS:
                self.expect("(")
                arg = self.ternary()
                self.expect(")")
                return _FUNCS[value](arg)
            if value in _KEYWORDS:
                raise ExprTranslationError(
                    f"{value!r} cannot start an expression "
                    f"(condition {self.text!r})"
                )
            nxt = self.peek()
            if nxt and nxt[1] == "(":
                raise ExprTranslationError(
                    f"unknown function {value!r} — not in the translated "
                    f"expr-lang builtin set (condition {self.text!r})"
                )
            return value  # dotted struct access translates verbatim
        raise ExprTranslationError(
            f"unsupported token {value!r} in condition {self.text!r}"
        )


def translate_condition(condition: str) -> str:
    """expr-lang condition -> Spark SQL, raising ExprTranslationError
    on anything outside the translated subset."""
    if not condition or not condition.strip():
        raise ExprTranslationError("empty filter condition")
    return _Parser(condition).parse()
