"""Semantic tests for the round-1 tail queries (queries_ext.py).

Oracle equivalence is covered by tools/check.py / the driver gate;
these assert the operator-level invariants directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.registry import all_queries
from timescaledb_event_streamer_spark.sources.tables import load


def test_freq_agg_heavy_hitters_only(spark, sf_mid):
    rows = all_queries()["ts_freq_agg"](spark, sf_mid).collect()
    assert rows
    for r in rows:
        assert r.freq >= 0.008
    # shares within one partition can never exceed 1
    by_type: dict[str, float] = {}
    for r in rows:
        by_type[r.event_type] = by_type.get(r.event_type, 0.0) + r.freq
    assert all(s <= 1.0 + 1e-6 for s in by_type.values())


def test_radius_search_contains_query_vector(spark, sf_mid):
    rows = all_queries()["ann_radius_search"](spark, sf_mid).collect()
    by_id = {r.vec_id: r.cosine for r in rows}
    assert by_id[0] == 1.0  # the query vector itself
    assert all(c >= 0.3 for c in by_id.values())


def test_radius_search_superset_of_topk_above_threshold(spark, sf_mid):
    """Every top-k hit with cosine >= radius must appear in the radius
    result — the two search shapes agree where they overlap."""
    qs = all_queries()
    radius = {r.vec_id for r in qs["ann_radius_search"](spark, sf_mid).collect()}
    topk = qs["ann_bruteforce_topk"](spark, sf_mid).collect()
    for r in topk:
        if r.cosine >= 0.3:
            assert r.vec_id in radius


def test_delivery_stats_account_for_every_event(spark, sf_mid):
    stats = all_queries()["cdc_sink_delivery_stats"](spark, sf_mid).collect()
    assert {r.op for r in stats} == {"c", "u", "d"}
    assert all(r.topic.startswith("timescaledb.public.") for r in stats)
    total = load(spark, sf_mid, "events").count()
    assert sum(r.n_events for r in stats) == total
    assert all(r.n_bytes > 0 for r in stats)


def test_q20_suppliers_restricted_to_nations(spark, sf_mid):
    df = all_queries()["q20_part_promotion"](spark, sf_mid)
    assert df.columns == ["s_name", "s_acctbal"]
    rows = df.collect()
    assert rows
    # every returned supplier must belong to the three target nations
    s = load(spark, sf_mid, "supplier")
    n = load(spark, sf_mid, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    allowed = {
        r.s_name
        for r in s.join(n, s["s_nationkey"] == n["n_nationkey"]).select("s_name").collect()
    }
    assert {r.s_name for r in rows} <= allowed


def test_q20_broadcasts_part_and_nation(spark, sf_mid):
    plan = (
        all_queries()["q20_part_promotion"](spark, sf_mid)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_counter_agg_resets_never_negative(spark, sf_mid):
    """counter_agg total_increase must be >= the plain delta sum (every
    reset replaces a negative step with a positive restart value)."""
    qs = all_queries()
    rows = {r.event_type: r for r in qs["ts_counter_agg"](spark, sf_mid).collect()}
    assert rows
    for r in rows.values():
        assert r.n_resets > 0  # the random-walk testdata always has drops
        assert r.total_increase > 0
        assert r.n_resets <= r.n_deltas


def test_ngram_freq_topk_sorted_and_bounded(spark, sf_mid):
    rows = all_queries()["text_ngram_freq"](spark, sf_mid).collect()
    assert len(rows) == 50
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True)
    # tie-break: within equal counts, bigrams ascend
    for a, b in zip(rows, rows[1:]):
        if a.n == b.n:
            assert a.bigram < b.bigram


def test_cagg_invalidation_covers_all_mutations(spark, sf_mid):
    """Every u/d event lands in exactly one dirty bucket; read events
    never invalidate."""
    from timescaledb_event_streamer_spark.cdc.envelope import derive_op

    inv = all_queries()["ts_cagg_invalidation"](spark, sf_mid).collect()
    assert inv
    assert all(r.n_invalidating == r.n_deletes + r.n_updates for r in inv)
    muts = (
        load(spark, sf_mid, "events")
        .withColumn("op", derive_op(F.col("event_id")))
        .filter(F.col("op").isin("u", "d"))
        .count()
    )
    assert sum(r.n_invalidating for r in inv) == muts


def test_decontamination_benchmark_docs_excluded(spark, sf_mid):
    rows = all_queries()["text_decontamination"](spark, sf_mid).collect()
    assert rows
    assert all(r.doc_id % 100 != 0 for r in rows)
    for r in rows:
        assert 0 <= r.n_hits <= r.n_shingles
        assert r.flagged == (r.n_hits / r.n_shingles >= 0.3)


def test_decontamination_broadcasts_benchmark(spark, sf_mid):
    plan = (
        all_queries()["text_decontamination"](spark, sf_mid)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_network_types_roundtrip(spark, sf_mid):
    rows = all_queries()["pg_network_types"](spark, sf_mid).limit(500).collect()
    assert rows
    for r in rows:
        octets = r.inet_text.split("/")[0].split(".")
        assert r.addr_num == sum(int(o) << (8 * (3 - i)) for i, o in enumerate(octets))
        assert r.masklen == 24
        assert r.network_addr == r.addr_num - int(octets[3])
        assert len(r.macaddr) == 17 and r.macaddr.count(":") == 5


def test_corpus_mix_planner_budget_properties(spark):
    """The sampling plan must (a) never oversample (rate <= 1, expected
    <= bucket tokens), (b) yield ~the per-language target for languages
    OVER the target and everything for languages under it, and (c) keep
    the within-language rate uniform across that language's sources."""
    rows = all_queries()["corpus_mix_planner"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        assert 0.0 < r["sample_rate"] <= 1.0
        assert 0 <= r["expected_tokens"] <= r["n_tokens"]
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rates = {r["sample_rate"] for r in rs}
        assert len(rates) == 1, f"{lang}: non-uniform within-language rate"
        target = rs[0]["target_tokens"]
        lang_tokens = rs[0]["lang_tokens"]
        yielded = sum(r["expected_tokens"] for r in rs)
        if lang_tokens <= target:
            # under-target language: keep everything (floor rounding
            # can drop at most one token per bucket)
            assert yielded >= lang_tokens - len(rs)
        else:
            assert yielded <= target
