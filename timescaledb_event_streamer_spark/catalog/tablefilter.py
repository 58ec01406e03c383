"""Include/exclude table filtering with the reference's wildcard
pattern language.

Reference parity: internal/systemcatalog/tablefiltering/tablefilter.go
— patterns are ``schema.table`` terms where ``*`` -> ``.*?``,
``?`` -> ``.{1}``, ``+`` -> ``.+?`` (tablefilter.go:252-261), tokens
are folded to lowercase unless double-quoted (tablefilter.go:190),
regexes are anchored ``^...$`` (tablefilter.go:125,131), excludes are
evaluated before includes, and a miss falls back to
``acceptedByDefault`` (tablefilter.go:69-90).

Two evaluation paths:

* :meth:`TableFilter.enabled` — driver-side, for catalog decisions
  (mirrors the reference's cached per-table check).
* :meth:`TableFilter.column` — a Spark ``Column`` predicate compiled
  from the same regexes, so filtering runs distributed inside the
  scan (predicate pushdown keeps it JVM-side; no Python UDF).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_WILDCARDS = {"*": ".*?", "?": ".{1}", "+": ".+?"}


def pattern_to_regex(token: str) -> str:
    """Convert one schema-or-table token to an anchored regex string."""
    quoted = len(token) >= 2 and token[0] == '"' and token[-1] == '"'
    if not quoted:
        token = token.lower()
    body = token[1:-1] if quoted else token
    out: list[str] = []
    i = 0
    while i < len(body):
        ch = body[i]
        if quoted and ch == "\\" and i + 1 < len(body) and body[i + 1] in _WILDCARDS:
            out.append("\\" + body[i + 1])
            i += 2
            continue
        if ch in _WILDCARDS:
            out.append(_WILDCARDS[ch])
        elif ch.isalnum() or ch == "_" or quoted:
            out.append(re.escape(ch) if quoted else ch)
        else:
            raise ValueError(f"illegal character {ch!r} in pattern {token!r}")
        i += 1
    return f"^{''.join(out)}$"


@dataclass(frozen=True)
class _Term:
    namespace_re: str
    table_re: str

    def matches(self, namespace: str, table: str) -> bool:
        return bool(re.match(self.namespace_re, namespace)) and bool(
            re.match(self.table_re, table)
        )


def _parse(term: str) -> _Term:
    tokens = term.split(".")
    if len(tokens) != 2:
        raise ValueError(f"failed parsing filter term: {term}")
    return _Term(pattern_to_regex(tokens[0]), pattern_to_regex(tokens[1]))


class TableFilter:
    def __init__(
        self,
        includes: list[str] | None = None,
        excludes: list[str] | None = None,
        accepted_by_default: bool = True,
    ) -> None:
        self.includes = [_parse(t) for t in (includes or [])]
        self.excludes = [_parse(t) for t in (excludes or [])]
        self.accepted_by_default = accepted_by_default

    def enabled(self, namespace: str, table: str) -> bool:
        for ex in self.excludes:
            if ex.matches(namespace, table):
                return False
        for inc in self.includes:
            if inc.matches(namespace, table):
                return True
        return self.accepted_by_default

    def column(self, namespace: Column | str, table: Column | str) -> Column:
        """Same decision as :meth:`enabled`, as a Spark predicate."""
        ns = F.col(namespace) if isinstance(namespace, str) else namespace
        tb = F.col(table) if isinstance(table, str) else table
        excluded = F.lit(False)
        for ex in self.excludes:
            excluded = excluded | (ns.rlike(ex.namespace_re) & tb.rlike(ex.table_re))
        included = F.lit(False)
        for inc in self.includes:
            included = included | (ns.rlike(inc.namespace_re) & tb.rlike(inc.table_re))
        return F.when(excluded, F.lit(False)).otherwise(
            F.when(included, F.lit(True)).otherwise(F.lit(self.accepted_by_default))
        )
