"""Query registry — single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers here with a Spark builder
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a DuckDB
oracle SQL string over the pre-registered views (region nation
customer supplier part orders lineitem events documents embeddings).

Column-name discipline: the driver sorts columns by name and hashes
values, so the Spark result and oracle result must use identical
column aliases. Float-producing aggregates are rounded identically
on both sides to keep the value-hash stable across summation orders.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    family: str
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, *, oracle: str | None = None, family: str = "misc", doc: str = ""
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, family=family, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


def _load_all() -> None:
    # import side-effect: populate REGISTRY
    from timescaledb_event_streamer_spark.plans import (  # noqa: F401
        queries_cdc,
        queries_cdc2,
        queries_events,
        queries_ext,
        queries_llm,
        queries_olap,
        queries_olap2,
        queries_pgext,
        queries_timeseries,
        queries_timeseries2,
    )


def _certified_prior_rounds() -> frozenset[str]:
    """Names already certified by a prior driver round.

    The driver caps its per-round oracle run (50 entries); iteration
    order below puts never-certified queries FIRST so successive
    rounds certify the remaining block instead of re-running the same
    alphabetical prefix. Derived from the committed CORRECTNESS_r*.json
    files at call time (not hard-coded), so each round's results
    automatically rotate the next round's sample. A query counts as
    certified only if some round recorded a pass: hash-green, or a
    nonzero rows-only check for declared no-oracle queries — a
    recorded failure keeps it at the front of the queue.
    """
    import json
    from pathlib import Path

    certified: set[str] = set()
    repo_root = Path(__file__).resolve().parents[2]
    for path in sorted(repo_root.glob("CORRECTNESS_r*.json")):
        try:
            results = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in results.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                certified.add(name)
            elif row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0:
                certified.add(name)
    return frozenset(certified)


_CERTIFIED_PRIOR_ROUNDS = _certified_prior_rounds()


def _iteration_order() -> list[str]:
    return sorted(REGISTRY, key=lambda n: (n in _CERTIFIED_PRIOR_ROUNDS, n))


def all_queries() -> dict[str, Builder]:
    _load_all()
    return {name: REGISTRY[name].builder for name in _iteration_order()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: REGISTRY[name].oracle
        for name in _iteration_order()
        if REGISTRY[name].oracle is not None
    }
