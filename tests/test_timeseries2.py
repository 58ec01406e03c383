"""Unit tests for the toolkit-part-2 operators: as-of join semantics
vs pandas merge_asof, LTTB invariants, IVF recall + scan-fraction."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.functions.downsample import _lttb_indices, lttb
from timescaledb_event_streamer_spark.functions.timeseries import asof_join
from timescaledb_event_streamer_spark.operators.ann import brute_force_topk, ivf_topk
from timescaledb_event_streamer_spark.sources.tables import load


def _ts(s: str):
    return pd.Timestamp(s)


def test_asof_join_matches_pandas_merge_asof(spark):
    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2],
            "ts": [_ts("2024-01-01 10:00"), _ts("2024-01-01 10:30"),
                   _ts("2024-01-01 09:00"), _ts("2024-01-01 10:00"),
                   _ts("2024-01-01 11:00")],
            "lv": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 2],
            "ts": [_ts("2024-01-01 09:30"), _ts("2024-01-01 10:30"),
                   _ts("2024-01-01 10:30")],
            "rv": [10.0, 20.0, 30.0],
        }
    )
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts", by=["k"], value_cols=["rv"],
        )
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            left.sort_values("ts"), right.sort_values("ts"), on="ts", by="k",
            direction="backward",
        )
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "ts", "lv", "rv"]], want[["k", "ts", "lv", "rv"]])


def test_asof_join_tolerance_nulls_stale_matches(spark):
    left = pd.DataFrame({"k": [1], "ts": [_ts("2024-01-01 12:00")], "lv": [1.0]})
    right = pd.DataFrame({"k": [1], "ts": [_ts("2024-01-01 09:00")], "rv": [9.0]})
    got = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="ts", by=["k"], value_cols=["rv"], tolerance_s=3600,
    ).toPandas()
    assert got["rv"].isna().all()  # 3h-old match exceeds 1h tolerance


def test_lttb_indices_keep_endpoints_and_extremes():
    import numpy as np

    x = np.arange(100, dtype=float)
    y = np.zeros(100)
    y[57] = 100.0  # a spike LTTB must keep
    keep = _lttb_indices(x, y, 12)
    assert len(keep) == 12
    assert keep[0] == 0 and keep[-1] == 99
    assert 57 in keep
    assert (np.diff(keep) > 0).all()


def test_lttb_batched_seam_matches_per_group_reference(spark, sf_small):
    """The r11 mapInPandas seam (series-contiguous blocks, carry
    across Arrow batch edges, vectorized take-all for short series)
    must reproduce the per-group reference exactly: same kept rows,
    same values, for every series."""
    import numpy as np

    events = load(spark, sf_small, "events").select(
        "event_type", "user_id", "event_id", "ts", "value"
    )
    got = (
        lttb(events, ["event_type", "user_id"], "ts", "value", n_out=20,
             order_tiebreak="event_id")
        .toPandas()
        .sort_values(["event_type", "user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    src = events.toPandas()
    parts = []
    for _, g in src.groupby(["event_type", "user_id"], sort=False):
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        x = g["ts"].astype("int64").to_numpy(dtype=np.float64)
        y = g["value"].to_numpy(dtype=np.float64)
        parts.append(g.iloc[_lttb_indices(x, y, 20)])
    want = (
        pd.concat(parts, ignore_index=True)
        .sort_values(["event_type", "user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_lttb_dataframe_bounds_series_size(spark, sf_small):
    events = load(spark, sf_small, "events").select(
        "event_type", "user_id", "event_id", "ts", "value"
    )
    out = lttb(events, ["event_type", "user_id"], "ts", "value", n_out=20,
               order_tiebreak="event_id").toPandas()
    sizes = out.groupby(["event_type", "user_id"]).size()
    assert (sizes <= 20).all()
    # endpoints preserved per series
    first = events.groupBy("event_type", "user_id").agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).toPandas().set_index(["event_type", "user_id"])
    got = out.groupby(["event_type", "user_id"])["ts"].agg(["min", "max"])
    for key, row in got.iterrows():
        assert row["min"] == first.loc[key, "lo"]
        assert row["max"] == first.loc[key, "hi"]


def test_ivf_recall_and_scan_fraction(spark, sf_mid):
    emb = load(spark, sf_mid, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = {r["vec_id"] for r in brute_force_topk(emb, qv, k=10).collect()}
    approx = {r["vec_id"] for r in ivf_topk(emb, qv, k=10, n_centroids=16, nprobe=8).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"ivf recall {recall}"


def test_cagg_merge_is_associative_and_exact(spark, sf_small):
    """merge(partials(any split)) == partials(all): 1-way, 2-way and
    4-way splits all land on the identical materialization."""
    from timescaledb_event_streamer_spark.functions.cagg import cagg_partials, merge_cagg

    events = load(spark, sf_small, "events")
    full = cagg_partials(events, ["event_type"], 3600)

    def canon(df):
        pdf = df.orderBy("event_type", "bucket_s").toPandas()
        pdf["sum_value"] = pdf["sum_value"].round(6)
        return pdf

    want = canon(full)
    splits = [events.filter(F.pmod(F.col("event_id"), F.lit(4)) == i) for i in range(4)]
    two = merge_cagg(
        ["event_type"],
        cagg_partials(splits[0].unionByName(splits[1]), ["event_type"], 3600),
        cagg_partials(splits[2].unionByName(splits[3]), ["event_type"], 3600),
    )
    four = merge_cagg(
        ["event_type"], *[cagg_partials(s, ["event_type"], 3600) for s in splits]
    )
    pd.testing.assert_frame_equal(canon(two), want, check_dtype=False)
    pd.testing.assert_frame_equal(canon(four), want, check_dtype=False)


def test_salted_join_matches_plain_join_and_spreads_hot_key(spark):
    from timescaledb_event_streamer_spark.functions.skew import salted_join

    # power-law: key 0 holds 90% of the rows
    big = spark.range(10_000).selectExpr(
        "id", "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 7 END AS k"
    )
    small = spark.range(7).selectExpr("id AS k", "id * 100 AS v")
    plain = big.join(small, "k").selectExpr("id", "k", "v")
    salted = salted_join(big, small, on="k", salt_from=F.col("id"), n_salts=8)
    got = sorted((r["id"], r["k"], r["v"]) for r in salted.collect())
    want = sorted((r["id"], r["k"], r["v"]) for r in plain.collect())
    assert got == want
    # the hot key must occupy >1 shuffle partition after salting
    parts = (
        salted.filter(F.col("k") == 0)
        .repartition(8, "k", F.pmod(F.abs(F.xxhash64("id")), F.lit(8)))
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert parts > 1


def test_approx_count_distinct_error_vs_exact(spark, sf_mid):
    """The 100 TB swap-in for ts_count_distinct: HLL++ must stay
    within 2% of exact at default rsd."""
    events = load(spark, sf_mid, "events")
    both = (
        events.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id").alias("approx"),
        )
        .collect()
    )
    for r in both:
        assert abs(r["approx"] - r["exact"]) / r["exact"] <= 0.02, dict(r.asDict())


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000), st.floats(0, 100)),
        min_size=1,
        max_size=30,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000), st.floats(0, 100)),
        min_size=0,
        max_size=30,
    ),
)
def test_asof_join_property_matches_merge_asof(spark, left, right):
    """Union+LOCF as-of join ≡ pandas merge_asof on arbitrary keyed
    series (right deduped per (key, ts) as the contract requires)."""
    lpd = pd.DataFrame(left, columns=["k", "t_s", "lv"])
    lpd["ts"] = pd.to_datetime(lpd["t_s"], unit="s")
    rpd = pd.DataFrame(right, columns=["k", "t_s", "rv"])
    rpd["ts"] = pd.to_datetime(rpd["t_s"], unit="s")
    rpd = rpd.sort_values(["k", "ts"]).groupby(["k", "ts"], as_index=False).agg(
        rv=("rv", "max")
    )
    rpd = rpd.astype({"k": "int64", "ts": "datetime64[ns]", "rv": "float64"})
    sdf_l = spark.createDataFrame(lpd[["k", "ts", "lv"]])
    if len(rpd):
        sdf_r = spark.createDataFrame(rpd[["k", "ts", "rv"]])
    else:
        sdf_r = spark.createDataFrame([], "k BIGINT, ts TIMESTAMP, rv DOUBLE")
    got = (
        asof_join(sdf_l, sdf_r, on="ts", by=["k"], value_cols=["rv"])
        .toPandas()
        .sort_values(["k", "ts", "lv"])
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            lpd[["k", "ts", "lv"]].sort_values("ts", kind="mergesort"),
            rpd[["k", "ts", "rv"]].sort_values("ts", kind="mergesort")
            if len(rpd)
            else rpd[["k", "ts", "rv"]],
            on="ts",
            by="k",
            direction="backward",
        )
        .sort_values(["k", "ts", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "ts", "lv", "rv"]], want[["k", "ts", "lv", "rv"]], check_dtype=False
    )

def test_lttb_null_series_keys_group_as_one_series(spark):
    """Null series keys must behave exactly like groupBy(): one series
    per distinct-or-null key, even when the null-keyed series spans an
    Arrow batch boundary (r12 null-safe carry/group masks). Before the
    fix, NaN != NaN split a null-keyed series into per-row fragments."""
    import numpy as np

    rows = []
    for key in ["a", None, "b"]:
        for i in range(120):
            rows.append((key, i, float((i * 37) % 101)))
    df = spark.createDataFrame(rows, "grp string, ts long, value double")

    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
    try:
        got = (
            lttb(df, ["grp"], "ts", "value", n_out=10)
            .toPandas()
            .sort_values(["grp", "ts"], na_position="first")
            .reset_index(drop=True)
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batch)

    src = df.toPandas()
    parts = []
    for _, g in src.groupby("grp", sort=False, dropna=False):
        g = g.sort_values("ts").reset_index(drop=True)
        x = g["ts"].astype("int64").to_numpy(dtype=np.float64)
        y = g["value"].to_numpy(dtype=np.float64)
        parts.append(g.iloc[_lttb_indices(x, y, 10)])
    want = (
        pd.concat(parts, ignore_index=True)
        .sort_values(["grp", "ts"], na_position="first")
        .reset_index(drop=True)
    )
    assert len(got) == 30  # 3 series x n_out, NOT one fragment per row
    pd.testing.assert_frame_equal(got, want)
