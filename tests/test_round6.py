"""Round-6 operator tests: embedding covariance (E18) and the
Bollinger/RSI/drawdown trio (B72-B74) against pure-Python references
on planted data."""

from __future__ import annotations

import datetime
import math

import numpy as np
import pytest

from timescaledb_event_streamer_spark.plans.queries_round6 import (
    embedding_covariance,
    ts_bollinger,
    ts_drawdown,
    ts_rsi,
)

T0 = datetime.datetime(2024, 3, 1)


def _events_daily(spark, tmp_path, series: dict[str, list[list[float]]]) -> str:
    rows, eid = [], 0
    for name, days in series.items():
        for di, vals in enumerate(days):
            for v in vals:
                rows.append((eid, T0 + datetime.timedelta(days=di), 1, name, v, "p"))
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    return sf


def _xq(vals: list[float]) -> int:
    """Floored micro-cent day mean — the shared integer day value."""
    sc = sum(round(v * 100) for v in vals)
    return (sc * 10000) // len(vals)


def test_embedding_covariance_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(11)
    vecs = rng.uniform(-0.3, 0.3, size=(40, 64)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist(), 0) for i in range(len(vecs))],
        "vec_id long, embedding array<float>, label int",
    )
    sf = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    got = {
        (r["dim_i"], r["dim_j"]): r
        for r in embedding_covariance(spark, sf).collect()
    }
    assert len(got) == 64 * 65 // 2
    q = np.round(vecs.astype(np.float64) * 1e6).astype(np.int64)
    n = len(q)
    for i, j in ((0, 0), (0, 1), (5, 63), (63, 63), (17, 30)):
        spq = int((q[:, i] * q[:, j]).sum())
        si, sj = int(q[:, i].sum()), int(q[:, j].sum())
        sii = int((q[:, i] ** 2).sum())
        sjj = int((q[:, j] ** 2).sum())
        cov = (spq - si * sj / n) / n / 1e6 / 1e6
        corr = (spq - si * sj / n) / math.sqrt(
            (sii - si * si / n) * (sjj - sj * sj / n)
        )
        r = got[(i, j)]
        assert r["n_vecs"] == n
        assert r["covariance"] == pytest.approx(cov, abs=2e-9)
        assert r["correlation"] == pytest.approx(corr, abs=2e-6)
    # diagonal correlation is exactly 1
    assert got[(7, 7)]["correlation"] == 1.0


def test_bollinger_matches_reference(spark, tmp_path):
    days = [[10.0], [12.0, 14.0], [9.0], [11.0], [10.2], [10.5], [10.0],
            [9.5], [2.0], [50.0]]  # crash + spike after the window fills
    sf = _events_daily(spark, tmp_path, {"m": days})
    rows = sorted(ts_bollinger(spark, sf).collect(), key=lambda r: r["day"])
    xqs = [_xq(d) for d in days]
    for idx, r in enumerate(rows):
        lo = max(0, idx - 6)
        w = xqs[lo : idx + 1]
        nd = len(w)
        sx, sxx = sum(w), sum(v * v for v in w)
        mean = sx / nd
        sigma = math.sqrt(max(sxx / nd - mean * mean, 0.0))
        assert r["n_days"] == nd
        assert r["day_mean"] == round(xqs[idx] / 1e6, 6)
        # engine rounds the micro-unit value at scale 0 (half away
        # from zero for these positive domains) then divides
        assert r["sma"] == math.floor(mean + 0.5) / 1e6
        assert r["sigma"] == math.floor(sigma + 0.5) / 1e6
        full = nd >= 7
        assert r["above_upper"] == (full and xqs[idx] > mean + 2.0 * sigma)
        assert r["below_lower"] == (full and xqs[idx] < mean - 2.0 * sigma)
    # the spike day and the crash day actually flag once the window fills
    assert any(r["above_upper"] or r["below_lower"] for r in rows)


def test_rsi_reference_and_flat_neutral(spark, tmp_path):
    series = {
        "trend": [[10.0], [11.0], [10.5], [12.0], [12.5], [11.0], [13.0]],
        "flat": [[5.0]] * 6,
    }
    sf = _events_daily(spark, tmp_path, series)
    rows = [r for r in ts_rsi(spark, sf).collect()]
    flat = [r for r in rows if r["series"] == "flat"]
    assert flat and all(r["rsi"] == 50.0 for r in flat)
    trend = sorted(
        (r for r in rows if r["series"] == "trend"), key=lambda r: r["day"]
    )
    xqs = [_xq(d) for d in series["trend"]]
    deltas = [b - a for a, b in zip(xqs, xqs[1:])]
    for idx, r in enumerate(trend):
        w = deltas[max(0, idx - 13) : idx + 1]
        g = sum(d for d in w if d > 0)
        l = sum(-d for d in w if d < 0)
        assert r["n_deltas"] == len(w)
        want = 50.0 if g + l == 0 else math.floor(1e8 * g / (g + l) + 0.5) / 1e6
        assert r["rsi"] == want, idx
    # strictly-up first two deltas -> RSI 100 early on
    assert trend[0]["rsi"] == 100.0


def test_drawdown_known_series(spark, tmp_path):
    # cumulative: 10, 30, 25, 40, 22, 31  (cents x100)
    days = [[10.0], [20.0], [-5.0], [15.0], [-18.0], [9.0]]
    sf = _events_daily(spark, tmp_path, {"m": days})
    rows = sorted(ts_drawdown(spark, sf).collect(), key=lambda r: r["day"])
    cums = np.cumsum([sum(round(v * 100) for v in d) for d in days])
    peaks = np.maximum.accumulate(cums)
    dds = peaks - cums
    for idx, r in enumerate(rows):
        assert r["cumulative"] == round(cums[idx] / 100.0, 6)
        assert r["running_peak"] == round(peaks[idx] / 100.0, 6)
        assert r["drawdown"] == round(dds[idx] / 100.0, 6)
        assert r["max_drawdown"] == round(dds.max() / 100.0, 6)
        assert r["is_max_drawdown_day"] == (dds[idx] == dds.max())
    assert rows[4]["is_max_drawdown_day"] is True  # the -18 day


def test_covariance_single_exchange_and_partial_agg(spark, sf_small):
    """The scale contract, both halves: (1) the sums BUILD is one
    hash-partial aggregation with a single 2144-key exchange —
    shuffle traffic independent of corpus size; (2) the projection
    reads the checkpointed sums (zero parquet scans in its executed
    plan), so the five reshape branches never re-run the corpus
    pipeline."""
    import re

    from timescaledb_event_streamer_spark.plans.queries_round6 import (
        covariance_sums,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    build = (
        covariance_sums(load(spark, sf_small, "embeddings"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange (?:hash|range|Single)", build)) == 1
    assert "HashAggregate" in build
    assert "BatchEvalPython" not in build

    proj = (
        embedding_covariance(spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Scan parquet" not in proj  # checkpointed sums, built once
    assert "BatchEvalPython" not in proj


def test_ngram_novelty_planted(spark, tmp_path):
    """First doc is fully novel; an exact copy later is fully
    redundant; a half-overlap doc scores in between."""
    from timescaledb_event_streamer_spark.plans.queries_round6 import (
        text_ngram_novelty,
    )

    texts = [
        (0, "a b c d e"),          # 3-grams: abc bcd cde -> all novel
        (1, "a b c d e"),          # exact copy -> novelty 0
        (2, "a b c x y z"),        # abc seen; bcx cxy xyz novel
    ]
    df = spark.createDataFrame(
        [(i, t, "s", "en", len(t)) for i, t in texts],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = {r["doc_id"]: r for r in text_ngram_novelty(spark, sf).collect()}
    assert got[0]["novelty"] == 1.0 and got[0]["mostly_redundant"] is False
    assert got[1]["novelty"] == 0.0 and got[1]["mostly_redundant"] is True
    assert got[2]["n_shingles"] == 4 and got[2]["n_novel"] == 3
    assert got[2]["novelty"] == 0.75


def test_importance_resample_contract(spark, sf_mid):
    """Acceptance is exactly u8 < weight-threshold: re-derive the md5
    decision in Python for every doc and compare the kept set; long
    docs (weight 1.0) are always kept."""
    import hashlib

    import duckdb

    from timescaledb_event_streamer_spark.plans.queries_round6 import (
        corpus_importance_resample,
    )

    kept = {r["doc_id"]: r for r in corpus_importance_resample(spark, sf_mid).collect()}
    docs = duckdb.sql(
        f"SELECT doc_id, len(string_split(text, ' ')) AS n "
        f"FROM '{sf_mid}/documents.parquet'"
    ).fetchall()
    for doc_id, n in docs:
        w = min(1.0, n / 200.0)
        u8 = hashlib.md5(f"resample:{doc_id}".encode()).hexdigest()[:8]
        thr = format(int(round(w * 4294967295)), "08x")
        assert (doc_id in kept) == (u8 < thr), doc_id
        if w == 1.0:
            assert doc_id in kept
    assert 0 < len(kept) < len(docs)


def test_candlestick_vwap_hand_computed(spark, tmp_path):
    """B75: OHLC by LSN order, volume from props.k, VWAP =
    turnover/volume with micro-unit scale-0 rounding."""
    import json

    from timescaledb_event_streamer_spark.plans.queries_round6 import (
        ts_candlestick,
    )

    rows = [
        (0, T0, 1, "m", 10.00, json.dumps({"k": 2})),   # open
        (1, T0, 1, "m", 30.00, json.dumps({"k": 1})),   # high
        (2, T0, 1, "m", 5.00, json.dumps({"k": 3})),    # low
        (3, T0, 1, "m", 20.00, json.dumps({"k": 4})),   # close
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = ts_candlestick(spark, str(tmp_path)).collect()[0]
    assert (r["open"], r["high"], r["low"], r["close"]) == (10.0, 30.0, 5.0, 20.0)
    assert r["n_trades"] == 4 and r["volume"] == 10
    # turnover = 1000*2 + 3000*1 + 500*3 + 2000*4 = 14500 cents
    assert r["turnover_cents"] == 14500
    # vwap = 14500/10 cents = 14.5 -> micro round exact
    assert r["vwap"] == 14.5
