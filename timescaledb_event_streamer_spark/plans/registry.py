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


# Names the driver's 50-entry certification sample already covered in
# rounds 1-2 (keys of CORRECTNESS_r02.json). The driver caps its
# per-round oracle run; iteration order below puts never-certified
# queries FIRST so successive rounds certify the remaining block
# instead of re-running the same alphabetical prefix.
_CERTIFIED_PRIOR_ROUNDS = frozenset({
    "ann_batch_topk", "ann_bruteforce_topk", "ann_ivf_topk", "ann_knn_graph",
    "ann_lsh_topk", "ann_radius_search", "cdc_chunk_resolution",
    "cdc_compression_markers", "cdc_dlq_routing", "cdc_envelope_read",
    "cdc_envelope_stream", "cdc_event_filter", "cdc_kafka_roundtrip",
    "cdc_key_extraction", "cdc_message_events", "cdc_offset_tracking",
    "cdc_ordering_audit", "cdc_publication_routing", "cdc_replica_identity",
    "cdc_schema_registry", "cdc_sink_delivery_stats",
    "cdc_snapshot_stream_merge", "cdc_snapshot_watermarks",
    "cdc_table_filter", "cdc_toast_backfill", "cdc_tombstones",
    "cdc_topic_naming", "cdc_transaction_stats", "cdc_wal2json_roundtrip",
    "dedup_clusters", "dedup_containment", "dedup_cross_source",
    "dedup_embedding_cosine", "dedup_embedding_lsh", "dedup_exact",
    "dedup_exact_normalized", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_semantic_clusters", "dedup_simhash", "embedding_centroid_stats",
    "embedding_quantize_int8", "pg_array_text_codec", "pg_ltree_ops",
    "pg_network_types", "pg_range_point_types", "pg_timetz",
    "pg_type_conversion", "pipeline_clean_corpus", "q10_returned_items",
})


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
