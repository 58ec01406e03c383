"""Plan audits: the physical plans must have the shape that survives
100 TB — pushed filters, pruned columns, broadcast dims, and no
Python row UDFs in any registered query."""

from __future__ import annotations

import pytest

from timescaledb_event_streamer_spark.plans.registry import all_queries
from timescaledb_event_streamer_spark.sources.tables import load


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_time_filter_pushed_to_scan(spark, sf_small):
    df = all_queries()["ts_chunk_pruning"](spark, sf_small)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(ts)" in plan or "GreaterThanOrEqual(ts" in plan, plan[:1500]


def test_q1_scan_prunes_columns(spark, sf_small):
    plan = _plan(all_queries()["q1_pricing_summary"](spark, sf_small))
    scan = plan[plan.index("ReadSchema") :][:400]
    assert "l_orderkey" not in scan, f"q1 must not read unused columns: {scan}"
    assert "l_extendedprice" in scan


def test_q5_broadcasts_only_dims(spark, sf_small):
    plan = _plan(all_queries()["q5_local_supplier"](spark, sf_small))
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_python_row_udfs_anywhere(spark, sf_small, name):
    df = all_queries()[name](spark, sf_small)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan, f"{name} fell back to a row-at-a-time Python UDF"


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_unpartitioned_data_grain_windows(spark, sf_small, name):
    """No single-partition global-order window over scan-grain rows
    anywhere in the registry — the one shuffle shape that cannot
    survive 100 TB. Bounded inputs (aggregate / limit / bounded
    broadcast candidate join below the window) are allowed; the
    distributed replacement is operators/ranking.global_row_number."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from plan_audit import unpartitioned_data_windows

    jplan = all_queries()[name](spark, sf_small)._jdf.queryExecution().executedPlan()
    bad = unpartitioned_data_windows(jplan)
    assert not bad, f"{name}: unpartitioned data-grain window: {bad}"


def test_whole_stage_codegen_in_scan_aggs(spark, sf_small):
    df = all_queries()["ts_time_bucket"](spark, sf_small)
    df.collect()  # finalize the adaptive plan
    plan = _plan(df)
    # codegen stages appear as '*(n)' markers in the final plan
    assert "*(" in plan, plan[:1500]


def test_chunk_resolution_broadcasts_catalog(spark, sf_small):
    """The chunk catalog must broadcast — the event side never
    shuffles (the reference's in-memory-map property). Targets the
    resolve_chunks operator directly: the registered query folds its
    chunk-grain stats into the catalog aggregation and no longer
    joins at all."""
    from timescaledb_event_streamer_spark.catalog.chunks import (
        chunk_catalog,
        resolve_chunks,
    )

    events = load(spark, sf_small, "events")
    plan = _plan(resolve_chunks(events, chunk_catalog(events)))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_asof_join_is_window_not_range_join(spark, sf_small):
    """The as-of join must compile to union + window (one shuffle per
    input branch), never a nested-loop range join."""
    plan = _plan(all_queries()["ts_asof_join"](spark, sf_small))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "Window" in plan


def test_range_join_stays_hash_join(spark, sf_small):
    """Bucket-candidate explode keeps the range join an equi hash
    join; a naive t BETWEEN a AND b join degenerates to BNLJ."""
    plan = _plan(all_queries()["ts_range_join"](spark, sf_small))
    assert "BroadcastNestedLoopJoin" not in plan


def test_events_scan_only_needed_columns(spark, sf_small):
    df = load(spark, sf_small, "events").select("event_id")
    plan = _plan(df)
    scan = plan[plan.index("ReadSchema") :][:200]
    assert "props" not in scan


# exact-pairwise oracle (scale path: dedup_embedding_lsh) and
# bounded-broadcast joins — all deliberately BNLJ. A BNLJ whose
# broadcast side is a single-row aggregate (or a handful of query
# vectors) is the correct 100 TB plan: every task receives the tiny
# side via broadcast, the big side streams through exactly once, and
# no shuffle is introduced. The audit exists to catch *accidental*
# O(n*m) degeneration, not these bounded shapes.
_BNLJ_OK = {
    "dedup_embedding_cosine",
    "ann_knn_graph",
    "ann_mutual_knn_audit",  # composes on ann_knn_graph's adjudicated build
    "q22_global_sales_opportunity",
    "q11_important_stock",
    "ts_retention_policy",  # single-row broadcast cutoff cross join
    "ts_funnel",  # single-row broadcast base-count cross join
    "text_domain_mix",  # single-row broadcast corpus-total cross join
    "text_domain_mix_bpe",  # single-row broadcast bpe-token total
    "corpus_curriculum_order",  # single-row broadcast token total
    "ann_batch_topk",  # 4-row broadcast query set, non-equi self-exclusion
    "cdc_snapshot_stream_merge",  # single-row broadcast watermark
    "cdc_offset_tracking",  # single-row broadcast head-LSN
    "cdc_compression_markers",  # single-row broadcast compress horizon
    "ts_gapfill_locf",  # single-row broadcast bucket bounds
    "ts_interpolate",  # single-row broadcast bucket bounds
    "corpus_mix_planner",  # single-row broadcast budget cross join
    "cdc_pgoutput_messages",  # single-row broadcast max-LSN cross join
    "ann_ivf_seeded",  # broadcast seed table assign + 1-row query vector
    "ann_ivfpq_seeded",  # same bounded <=100-row broadcast seed assign
    "ann_ivf_sq8",  # same seed-assign shape + 1-row query broadcast
    "text_perplexity_proxy",  # single-row broadcast corpus-token total
    "pipeline_training_corpus",  # same total via the perplexity branch
    "cdc_replication_channel_stats",  # single-row broadcast restart-LSN
    "cdc_slot_retention_lag",  # single-row broadcast confirmed_flush
    "text_vocab_concentration",  # single-row broadcast totals (r11 rework)
    "corpus_temperature_mix",  # 1-row total + 4-row alpha broadcast unfold
    "dedup_cascade_ledger",  # 1-row stage-count aggregate cross joins
    "dedup_semdedup",  # broadcast seed-table assign (bounded codebook)
    "cdc_relation_versioning",  # 1-row broadcast max-LSN + broadcast
    #   interval join to the metadata-sized version table
    "ts_audience_overlap",  # 10-pair x 32-mask broadcast expansion +
    #   non-equi type-pair self-join, both metadata-sized
    "text_bloom_decontamination",  # single-row broadcast Bloom bitmap
    "cdc_snapshot_modes",  # single-row broadcast slot LSN
    "text_bigram_surprise",  # single-row broadcast vocab size
    "dedup_threshold_sweep",  # all-pairs over a bounded ~500-vector
    #   calibration sample + 1-row broadcast sample modulus
    "text_tfidf_topk",  # single-row broadcast corpus doc count
    "dedup_sparse_cosine",  # same single-row N broadcast via _tfidf_weights
    "dedup_sparse_cosine_capped",  # same single-row N broadcast (idf + df cap)
    "text_bm25_search",  # single-row broadcast N/avgdl/df stats
    "corpus_js_divergence",  # metadata-sized source-pair expansion
    #   (distinct sources self-join); the data joins are equi-joins
    "cdc_incremental_snapshot",  # single-row broadcast snapshot-LSN
    "text_cooccurrence_pmi",  # single-row broadcast token/pair totals
    "corpus_leakage_safe_split",  # single-row broadcast violation proof
    "cdc_dropped_chunk_filter",  # single-row broadcast retention horizon
    "cdc_implicit_decompression",  # single-row broadcast compress horizon
    "cdc_known_chunks_reload",  # single-row broadcast pause-LSN
    "ts_cagg_refresh_policy",  # single-row broadcast policy scalars
    "embedding_quantization_error",  # single-row broadcast scale array
    "corpus_vocab_coverage",  # single-row broadcast corpus totals
    "corpus_quality_strata",  # single-row broadcast N + cuts array
    "ann_nprobe_sweep",  # single-row broadcast query vector / totals
    "ann_ivfpq_nprobe_sweep",  # same: <=100-row broadcast seed assign
    #   + 1-row query/total broadcasts per sweep branch
    "ann_graph_beam_search",  # graph build is banded-LSH candidate
    #   equi-join + exact rerank (candidate-bounded, r10); the BNLJ
    #   here is only the 1-row entry/query broadcasts per hop
    "text_trigram_backoff_score",  # single-row broadcast corpus-token
    #   total (the OOV floor denominator)
    "ann_hybrid_rrf",  # the BM25 leg's single-row broadcast
    #   N/avgdl/df stats cross join (same bound as text_bm25_search)
    "corpus_vocab_growth",  # 10-row broadcast checkpoint table x the
    #   type-grain firsts (conditional aggregate, bounded expansion)
    "corpus_mixture_entropy",  # single-row broadcast totals / fold rows
    "text_burstiness",  # single-row broadcast corpus-N cross join
    "embedding_label_centroid_confusion",  # label-count-sized (10-row)
    #   centroid broadcast cross join for the scoring pass
    "text_heaps_fit",  # 1-row broadcast max-doc-id (bucket modulus)
    #   + 1-row broadcast OLS-sums cross join over the 10-row
    #   checkpoint table
    "cdc_wal_growth_forecast",  # 1-row broadcast slot posture
    #   (confirmed_flush) + 1-row broadcast total-rate cross join
    #   over the table-grain rated rows
}


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_cartesian_or_nested_loop_joins(spark, sf_small, name):
    plan = _plan(all_queries()[name](spark, sf_small))
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in _BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} degenerated to BNLJ"


def test_partitioned_hypertable_layout_prunes(spark, sf_small, tmp_path):
    """SURVEY §6: events written partitioned by (event_type, chunk)
    — a time+relation predicate must become PartitionFilters, the
    partition-pruning form of TimescaleDB chunk exclusion."""
    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.catalog.chunks import chunk_start_epoch

    events = load(spark, sf_small, "events")
    path = str(tmp_path / "hypertable")
    (
        events.withColumn("chunk_s", chunk_start_epoch(F.col("ts")))
        .write.partitionBy("event_type", "chunk_s")
        .mode("overwrite")
        .parquet(path)
    )
    one_chunk = (
        events.filter(F.col("event_type") == "click")
        .select(chunk_start_epoch(F.col("ts")).alias("c"))
        .first()["c"]
    )
    pruned = (
        spark.read.parquet(path)
        .filter((F.col("event_type") == "click") & (F.col("chunk_s") == one_chunk))
    )
    plan = _plan(pruned)
    assert "PartitionFilters: [" in plan
    assert "isnotnull(event_type" in plan or "event_type" in plan[plan.index("PartitionFilters"):][:300]
    # pruning actually cut the scan: one chunk of one hypertable
    n_all = events.count()
    n_pruned = pruned.count()
    assert 0 < n_pruned < n_all / 10


def test_space_partitioned_hypertable_layout_prunes_2d(spark, sf_small, tmp_path):
    """SURVEY §6 + VERDICT r4 item 4: a SPACE-partitioned hypertable
    (time x hash-slice chunks, spi/systemcatalog/column.go:242) written
    as a (event_type, chunk_s, slice_id) partitioned layout — a
    time+slice predicate must prune on BOTH dimensions, and every event
    resolves to exactly one 2-D chunk."""
    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.catalog.chunks import (
        SPACE_PARTITIONS,
        chunk_catalog_2d,
        chunk_start_epoch,
        resolve_chunks_2d,
        space_slice,
    )

    events = load(spark, sf_small, "events")

    # resolution: every event lands in exactly one 2-D chunk
    catalog = chunk_catalog_2d(events)
    resolved = resolve_chunks_2d(events, catalog)
    assert resolved.count() == events.count()
    # the slice ranges tile the 32-bit hash space with no overlap
    slices = (
        catalog.select("slice_id", "slice_hash_start", "slice_hash_end")
        .distinct().orderBy("slice_id").collect()
    )
    assert [s["slice_id"] for s in slices] == list(range(SPACE_PARTITIONS))
    for s in slices:
        assert s["slice_hash_end"] - s["slice_hash_start"] == (1 << 32) // SPACE_PARTITIONS
    assert slices[0]["slice_hash_start"] == 0
    assert slices[-1]["slice_hash_end"] == 1 << 32

    # physical layout: both dimensions reach PartitionFilters
    path = str(tmp_path / "hypertable2d")
    (
        events.withColumn("chunk_s", chunk_start_epoch(F.col("ts")))
        .withColumn("slice_id", space_slice(F.col("user_id")))
        .write.partitionBy("event_type", "chunk_s", "slice_id")
        .mode("overwrite")
        .parquet(path)
    )
    probe = events.filter(F.col("event_type") == "click").select(
        chunk_start_epoch(F.col("ts")).alias("c"),
        space_slice(F.col("user_id")).alias("s"),
    ).first()
    pruned = spark.read.parquet(path).filter(
        (F.col("event_type") == "click")
        & (F.col("chunk_s") == probe["c"])
        & (F.col("slice_id") == probe["s"])
    )
    plan = _plan(pruned)
    assert "PartitionFilters: [" in plan
    pf = plan[plan.index("PartitionFilters"):][:400]
    assert "chunk_s" in pf and "slice_id" in pf
    n_all, n_pruned = events.count(), pruned.count()
    # 2-D pruning cuts deeper than time alone: one slice of one chunk
    assert 0 < n_pruned < n_all / (10 * SPACE_PARTITIONS / 2)
