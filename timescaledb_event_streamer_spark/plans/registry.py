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
        queries_timeseries,
        queries_timeseries2,
    )


def all_queries() -> dict[str, Builder]:
    _load_all()
    return {name: spec.builder for name, spec in sorted(REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in sorted(REGISTRY.items()) if spec.oracle is not None
    }
