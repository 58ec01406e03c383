"""Session-scoped cache lifecycle for in-plan persists.

Several query builders persist an intermediate that multiple plan
branches consume (the materialized-source-column pattern: winnowing
fingerprints, minhash signatures, rendered wal2json lines, the
container router's sniffed frame). ``DataFrame.persist`` alone leaks
in long-lived sessions: CacheManager dedups identical canonicalized
plans, but every distinct (builder, sf_dir) pair is a distinct plan,
so repeated invocations pile up MEMORY_AND_DISK entries that live
until the session dies (r11 ADVICE on cdc_wal2json_roundtrip).

``scoped_persist`` bounds that to ONE live entry per call-site tag:
re-invoking the same builder unpersists the previous handle before
registering the new one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: live handles, one per call-site tag
_SCOPED_PERSISTS: dict[str, DataFrame] = {}


def scoped_persist(df: DataFrame, tag: str, level=None) -> DataFrame:
    """Persist ``df``, releasing the previous persist registered under
    the same ``tag`` first. Tags are call-site constants (query or
    operator name), so a session holds at most one cached corpus per
    persist-bearing code path regardless of how many times or with how
    many sf_dirs the builders run."""
    from pyspark import StorageLevel

    prev = _SCOPED_PERSISTS.pop(tag, None)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass  # session may be gone; nothing to release
    out = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    _SCOPED_PERSISTS[tag] = out
    return out
