"""Semantic pins for the round-8b indicator family (B83–B87).

Each test checks the registered query against an INDEPENDENT
formulation — pandas ewm / rolling, or the textbook recursion run in
pure Python — not against the query's own algebra.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from timescaledb_event_streamer_spark.plans.registry import all_queries


def _daily_close(spark, sf_dir) -> pd.DataFrame:
    """Independent daily close-cents frame built with pandas only."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ts = pd.to_datetime(ev["ts"])
    ev = ev.assign(
        day_s=(ts.astype("int64") // 1_000_000 // 86400) * 86400,
        cents=np.rint(ev["value"] * 100).astype("int64"),
        vol=ev["props"].str.extract(r'"k": (\d+)')[0].astype("int64"),
    )
    ev = ev.sort_values("event_id")
    g = ev.groupby(["event_type", "day_s"])
    return pd.DataFrame(
        {
            "hc": g["cents"].max(),
            "lc": g["cents"].min(),
            "cc": g["cents"].last(),  # max event_id = last after sort
            "vol": g["vol"].sum(),
        }
    ).reset_index()


def test_cusum_matches_textbook_recursion(spark, sf_small):
    """S+_t = max(0, S+_{t-1} + x_t - mu) run literally in Python
    equals the prefix-algebra form the query uses."""
    out = (
        all_queries()["ts_cusum"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    for series, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day_s")
        x = grp["cc"].to_numpy(dtype=float)
        mu = x.mean()
        sp, sn = 0.0, 0.0
        want_pos, want_neg = [], []
        for v in x:
            sp = max(0.0, sp + (v - mu))
            sn = max(0.0, sn + (mu - v))
            want_pos.append(sp)
            want_neg.append(sn)
        got = out[out["series"] == series]
        np.testing.assert_allclose(
            got["cusum_pos"].to_numpy(),
            np.round(np.array(want_pos) / 100.0, 6),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            got["cusum_neg"].to_numpy(),
            np.round(np.array(want_neg) / 100.0, 6),
            atol=1e-6,
        )


def test_cusum_alarm_threshold_is_mad_scaled(spark, sf_small):
    out = all_queries()["ts_cusum"](spark, sf_small).toPandas()
    daily = _daily_close(spark, sf_small)
    for series, grp in daily.groupby("event_type"):
        x = grp["cc"].to_numpy(dtype=float)
        mad = np.abs(x - x.mean()).mean()
        got = out[out["series"] == series]
        want = got["cusum_pos"].to_numpy() * 100.0 > 4 * mad + 1e-9
        # exact integer compare upstream; rounding slack only here
        close = np.abs(got["cusum_pos"].to_numpy() * 100.0 - 4 * mad) < 1e-3
        assert ((got["alarm_pos"].to_numpy() == want) | close).all()


def test_macd_matches_pandas_ewm(spark, sf_small):
    """At sf0.001 the series spans < 40 days, so the query's bounded
    window covers the full history and must equal pandas
    ewm(adjust=True) exactly."""
    out = (
        all_queries()["ts_macd"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    assert daily.groupby("event_type").size().max() <= 40
    for series, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day_s")
        close = grp["cc"].astype(float)
        fast = close.ewm(span=12, adjust=True).mean()
        slow = close.ewm(span=26, adjust=True).mean()
        macd = fast - slow
        signal = macd.ewm(span=9, adjust=True).mean()
        got = out[out["series"] == series]
        np.testing.assert_allclose(
            got["macd"].to_numpy(), (macd / 100.0).round(6), atol=2e-6
        )
        np.testing.assert_allclose(
            got["signal"].to_numpy(), (signal / 100.0).round(6), atol=2e-6
        )
        np.testing.assert_allclose(
            got["histogram"].to_numpy(),
            ((macd - signal) / 100.0).round(6),
            atol=2e-6,
        )


def test_stochastic_matches_pandas_rolling(spark, sf_small):
    out = (
        all_queries()["ts_stochastic"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    for series, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day_s")
        hh = grp["hc"].rolling(14, min_periods=1).max()
        ll = grp["lc"].rolling(14, min_periods=1).min()
        k = ((grp["cc"] - ll) * 100.0 / (hh - ll)).round(6)
        k[hh == ll] = np.nan
        d = k.rolling(3, min_periods=3).mean().round(6)
        got = out[out["series"] == series]
        np.testing.assert_allclose(
            got["pct_k"].to_numpy(), k.to_numpy(), atol=1e-6
        )
        np.testing.assert_allclose(
            got["pct_d"].to_numpy(), d.to_numpy(), atol=1e-6
        )


def test_obv_matches_pandas(spark, sf_small):
    out = (
        all_queries()["ts_obv"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    for series, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day_s")
        direction = np.sign(grp["cc"].diff().fillna(0)).astype(int)
        obv = (direction * grp["vol"]).cumsum()
        got = out[out["series"] == series]
        assert got["direction"].tolist() == direction.tolist()
        assert got["obv"].tolist() == obv.tolist()


def test_vwap_is_volume_weighted_not_plain_mean(spark, sf_small):
    """VWAP must weight by props.$.k — on real data it differs from
    the unweighted daily mean somewhere, and equals the independent
    pandas weighted mean everywhere."""
    out = (
        all_queries()["ts_vwap"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    ev = pd.read_parquet(f"{sf_small}/events.parquet")
    ts = pd.to_datetime(ev["ts"])
    ev = ev.assign(
        day_s=(ts.astype("int64") // 1_000_000 // 86400) * 86400,
        cents=np.rint(ev["value"] * 100).astype("int64"),
        vol=ev["props"].str.extract(r'"k": (\d+)')[0].astype("int64"),
    )
    g = ev.groupby(["event_type", "day_s"])
    pv = g.apply(
        lambda d: (d["cents"] * d["vol"]).sum() / d["vol"].sum() / 100.0,
        include_groups=False,
    )
    mean = g["cents"].mean() / 100.0
    want = pv.round(6).reset_index(name="vwap")
    merged = out.merge(
        want, left_on=["series", "day_s"], right_on=["event_type", "day_s"]
    )
    assert len(merged) == len(out)
    np.testing.assert_allclose(
        merged["vwap_day"].to_numpy(), merged["vwap"].to_numpy(), atol=1e-6
    )
    assert (pv.round(6) != mean.round(6)).any()


def test_vwap_running_anchored_at_series_start(spark, sf_small):
    out = all_queries()["ts_vwap"](spark, sf_small).toPandas()
    first = out.sort_values("day_s").groupby("series").first()
    np.testing.assert_allclose(
        first["vwap_running"].to_numpy(), first["vwap_day"].to_numpy()
    )
