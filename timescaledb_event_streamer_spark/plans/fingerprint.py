"""Source fingerprints for registered queries (change-aware recert).

The driver certifies each registered query once (FIFO waitlist) and
never re-samples it. That leaves one hole in the correctness story:
a query REWRITTEN after its last green cert keeps its stale
certification forever (r7 verdict: ``dedup_sparse_cosine`` was
certified in r5, rewritten in r7, and under pure FIFO the driver
would never look at it again).

This module closes the hole by fingerprinting each query's SOURCE:
a sha256 over the transitive closure of repo-internal code the
builder touches —

- the builder function's own source (``inspect.getsource``, which
  includes the ``@register`` decorator and therefore the oracle SQL),
- every repo-internal function/class it references, recursively
  (globals named in the code objects, nested code objects included,
  closure cells included),
- the full file text of any repo-internal MODULE it references by
  name (module-level granularity when a plan says ``ann.probe(...)``
  instead of importing the function),
- the repr of module-level constants it references (``_INROW_DF``
  style knobs), keyed by name.

``plans/certification_waitlist.json`` stores the fingerprint each
query had when it was last driver-certified green (snapshotted by
``tools/waitlist.py`` immediately after the round's CORRECTNESS
artifact lands, before any new edits — so snapshot time ≈ cert
time).  ``registry._is_certified`` treats a certified query whose
CURRENT fingerprint differs from the stored one as *pending
re-certification*: it re-enters the driver's 50-entry oracle window
ahead of newly registered queries.

Everything here is stdlib-only and deterministic: sources are read
from the repo files, the part set is sorted before hashing, and no
timestamps or ids enter the digest.
"""

from __future__ import annotations

import hashlib
import inspect
import types
from pathlib import Path

_PKG = "timescaledb_event_streamer_spark"

_SCALAR_TYPES = (int, float, complex, str, bytes, bool, tuple, frozenset)


def _code_names(fn: types.FunctionType) -> set[str]:
    """All global names referenced by fn's code object, including
    nested code objects (lambdas, comprehensions, inner defs)."""
    names: set[str] = set()
    stack = [fn.__code__]
    while stack:
        code = stack.pop()
        names.update(code.co_names)
        for const in code.co_consts:
            if isinstance(const, types.CodeType):
                stack.append(const)
    return names


def _in_pkg(obj: object) -> bool:
    mod = getattr(obj, "__module__", None) or ""
    return mod.startswith(_PKG)


def source_fingerprint(builder: types.FunctionType, oracle: str | None) -> str:
    """Deterministic 16-hex-digit fingerprint of a query's source
    closure (builder + oracle + reachable repo-internal code)."""
    parts: list[str] = [f"oracle:{oracle or ''}"]
    seen: set[int] = set()
    stack: list[object] = [builder]
    while stack:
        obj = stack.pop()
        if id(obj) in seen:
            continue
        seen.add(id(obj))
        if isinstance(obj, types.FunctionType):
            if not _in_pkg(obj):
                continue
            try:
                parts.append(inspect.getsource(obj))
            except (OSError, TypeError):
                parts.append(f"fn:{obj.__module__}.{obj.__qualname__}")
            if obj.__closure__:
                for cell in obj.__closure__:
                    try:
                        stack.append(cell.cell_contents)
                    except ValueError:
                        pass
            g = obj.__globals__
            for name in sorted(_code_names(obj)):
                if name not in g:
                    continue
                val = g[name]
                if isinstance(val, types.FunctionType):
                    stack.append(val)
                elif isinstance(val, types.ModuleType):
                    if (val.__name__ or "").startswith(_PKG):
                        f = getattr(val, "__file__", None)
                        if f:
                            try:
                                parts.append(Path(f).read_text())
                            except OSError:
                                parts.append(f"mod:{val.__name__}")
                elif isinstance(val, type):
                    if _in_pkg(val):
                        try:
                            parts.append(inspect.getsource(val))
                        except (OSError, TypeError):
                            parts.append(f"cls:{val.__module__}.{val.__qualname__}")
                elif val is None or isinstance(val, _SCALAR_TYPES):
                    parts.append(f"const:{name}={val!r}")
                elif isinstance(val, (list, dict, set)):
                    try:
                        parts.append(f"const:{name}={sorted(map(repr, val))!r}")
                    except TypeError:
                        parts.append(f"const:{name}=<unorderable>")
        elif isinstance(obj, types.MethodType):
            stack.append(obj.__func__)
    digest = hashlib.sha256("\x00".join(sorted(set(parts))).encode()).hexdigest()
    return digest[:16]
