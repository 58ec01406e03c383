"""Semantic pins for the round-9 additions.

ts_kama is checked against the textbook KAMA recursion run literally
in pure Python (independent of the query's fold algebra), and its
regime-adaptivity property (trending ER -> fast tracking, choppy ER
-> heavy smoothing) is asserted on constructed series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.test_round8b import _daily_close
from timescaledb_event_streamer_spark.plans.registry import all_queries

_N = 10
_FAST = 2.0 / 3.0
_SLOW = 2.0 / 31.0


def _pure_python_kama(cc: np.ndarray) -> tuple[list, list]:
    """The public Kaufman formulation, run step by step."""
    ers, kamas = [], []
    kama = None
    for t in range(_N, len(cc)):
        signal = abs(cc[t] - cc[t - _N])
        noise = sum(
            abs(cc[i] - cc[i - 1]) for i in range(max(t - _N + 1, 1), t + 1)
        )
        er = signal / noise if noise > 0 else 0.0
        if kama is None:
            kama = float(cc[t])
        else:
            sc = (er * (_FAST - _SLOW) + _SLOW) ** 2
            kama = kama + sc * (cc[t] - kama)
        ers.append(er)
        kamas.append(kama)
    return ers, kamas


def test_kama_matches_textbook_recursion(spark, sf_small):
    out = (
        all_queries()["ts_kama"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    for series, grp in daily.groupby("event_type"):
        cc = grp.sort_values("day_s")["cc"].to_numpy(dtype=float)
        want_er, want_kama = _pure_python_kama(cc)
        got = out[out["series"] == series]
        assert len(got) == max(len(cc) - _N, 0)
        np.testing.assert_allclose(
            got["efficiency_ratio"].to_numpy(), np.round(want_er, 6),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            got["kama_cents"].to_numpy(), want_kama, rtol=1e-9, atol=1e-6
        )
        # KAMA stays inside the running price envelope
        assert (got["kama_cents"] >= cc.min() - 1e-6).all()
        assert (got["kama_cents"] <= cc.max() + 1e-6).all()


def test_kama_adapts_to_regime(spark, sf_small):
    """The defining KAMA property: on a pure trend (ER=1) it tracks
    at the fast alpha; on pure chop (ER~0) it barely moves."""
    trend = np.arange(100, dtype=float) * 100  # monotone: ER = 1
    _, kama_t = _pure_python_kama(trend)
    # fast smoothing constant: sc = fast^2 = (2/3)^2; after a while the
    # lag behind a linear trend converges to step * (1-sc)/sc
    step = 100.0
    sc_fast = _FAST**2
    expected_lag = step * (1 - sc_fast) / sc_fast
    assert abs((trend[-1] - kama_t[-1]) - expected_lag) < 1.0

    chop = np.array([1000.0, 1100.0] * 50)  # alternating: signal ~ 0
    ers_c, kama_c = _pure_python_kama(chop)
    assert max(ers_c) <= 0.12  # chop: ER pinned near zero
    # smoothing is near the slow alpha: the average barely drifts from
    # its seed relative to the oscillation amplitude
    assert abs(kama_c[-1] - kama_c[0]) < 25.0


def test_streaming_kama_matches_batch(spark, sf_small, tmp_path):
    """I36: KAMA's recursion needs the previous day's OUTPUT plus the
    rolling ER window, so it streams as keyed applyInPandasWithState.
    Daily close partials are fed in TWO time-ordered micro-batches so
    both the kama value and the (N+1)-close buffer must genuinely
    cross a batch boundary; the result must equal the batch ts_kama
    query row-for-row."""
    import time as _t

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        streaming_kama,
    )

    daily = _daily_ohlcv(spark, sf_small).select("series", "day_s", "cc")
    split_day = daily.agg(
        F.expr("percentile_approx(day_s, 0.5)").alias("m")
    ).first()["m"]
    log_dir = tmp_path / "kama_log"
    log_dir.mkdir()
    daily.filter(F.col("day_s") <= split_day).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b0"))
    _t.sleep(1.1)
    daily.filter(F.col("day_s") > split_day).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b1"))
    stream = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(log_dir))
    )
    q = (
        streaming_kama(stream)
        .writeStream.format("memory")
        .queryName("kama_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["series"], r["day_s"]): (
            r["close_cents"], r["efficiency_ratio"], r["kama_cents"],
            r["above_kama"],
        )
        for r in spark.sql("SELECT * FROM kama_stream").collect()
    }
    want = {
        (r["series"], r["day_s"]): (
            r["close_cents"], r["efficiency_ratio"], r["kama_cents"],
            r["above_kama"],
        )
        for r in all_queries()["ts_kama"](spark, sf_small).collect()
    }
    assert len(got) == len(want) > 0
    for k, g in got.items():
        w = want[k]
        assert g[0] == w[0], k  # exact integer close
        assert g[3] == w[3], k  # above/below flag
        # the query output is scale-6-rounded; the streamed floats are
        # raw — compare after the same rounding
        np.testing.assert_allclose(round(g[1] * 1e6) / 1e6, w[1], atol=1e-9)
        np.testing.assert_allclose(round(g[2] * 1e6) / 1e6, w[2], atol=1e-9)


def test_supertrend_matches_textbook_recursion(spark, sf_small):
    """B101: the literal supertrend recursion (carried bands + trend
    + prev close) run step by step in Python equals the query's fold
    algebra."""
    out = (
        all_queries()["ts_supertrend"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    n, m = 10, 3.0
    for series, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day_s").reset_index(drop=True)
        hc, lc, cc = (
            grp["hc"].to_numpy(float),
            grp["lc"].to_numpy(float),
            grp["cc"].to_numpy(float),
        )
        tr = [None] + [
            max(
                hc[i] - lc[i],
                abs(hc[i] - cc[i - 1]),
                abs(lc[i] - cc[i - 1]),
            )
            for i in range(1, len(grp))
        ]
        rows = []
        fub = flb = trend = pc = None
        for i in range(n, len(grp)):
            atr = sum(tr[i - n + 1 : i + 1]) / n
            hl2 = (hc[i] + lc[i]) / 2.0
            bub, blb = hl2 + m * atr, hl2 - m * atr
            if trend is None:
                fub, flb = bub, blb
                trend = "up" if cc[i] >= hl2 else "down"
            else:
                fub = bub if (bub < fub or pc > fub) else fub
                flb = blb if (blb > flb or pc < flb) else flb
                if trend == "up":
                    trend = "down" if cc[i] < flb else "up"
                else:
                    trend = "up" if cc[i] > fub else "down"
            pc = cc[i]
            rows.append((grp["day_s"][i], fub, flb, trend))
        got = out[out["series"] == series].reset_index(drop=True)
        assert len(got) == len(rows)
        for j, (day_s, fub, flb, trend) in enumerate(rows):
            assert got["day_s"][j] == day_s
            assert got["trend"][j] == trend, (series, day_s)
            np.testing.assert_allclose(got["final_upper"][j], fub, atol=1e-6)
            np.testing.assert_allclose(got["final_lower"][j], flb, atol=1e-6)
            want_st = flb if trend == "up" else fub
            np.testing.assert_allclose(got["supertrend"][j], want_st, atol=1e-6)


def test_winnowing_guarantee_planted_shared_run(spark, tmp_path):
    """D24: the paper's guarantee — any shared token run of length
    >= k + w - 1 (= 6) produces at least one shared fingerprint, so
    the planted pair MUST surface; unrelated docs with disjoint
    vocabulary must NOT pair."""
    import pandas as pd

    from timescaledb_event_streamer_spark.plans.queries_round9 import (
        dedup_winnowing,
    )

    rng = np.random.default_rng(5)
    shared = " ".join(f"run{i}" for i in range(8))  # 8 >= k+w-1
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha beta gamma " + shared + " delta epsilon zeta",
                "one two three four five " + shared + " six seven",
                " ".join(f"x{i}" for i in range(30)),
                " ".join(f"y{i}" for i in range(30)),
            ],
            "source": ["s"] * 4,
            "lang": ["en"] * 4,
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    docs.to_parquet(str(d / "documents.parquet"))
    # the query loads only documents.parquet from the sf dir
    out = dedup_winnowing(spark, str(d)).toPandas()
    pairs = {tuple(sorted((r.doc_a, r.doc_b))) for r in out.itertuples()}
    assert (1, 2) in pairs
    assert not any({3, 4} & set(p) for p in pairs)
    row = out[(out["doc_a"] == 1) & (out["doc_b"] == 2)].iloc[0]
    assert row["n_shared"] >= 2 and 0 < row["overlap_score"] <= 1


def test_streaming_supertrend_matches_batch(spark, sf_small, tmp_path):
    """I37: the two-sided recursive carry (bands + trend + prev
    close + rolling TR window) crosses a micro-batch boundary and
    equals the batch ts_supertrend row-for-row."""
    import time as _t

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        streaming_supertrend,
    )

    daily = _daily_ohlcv(spark, sf_small).select(
        "series", "day_s", "hc", "lc", "cc"
    )
    split_day = daily.agg(
        F.expr("percentile_approx(day_s, 0.5)").alias("m")
    ).first()["m"]
    log_dir = tmp_path / "st_log"
    log_dir.mkdir()
    daily.filter(F.col("day_s") <= split_day).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b0"))
    _t.sleep(1.1)
    daily.filter(F.col("day_s") > split_day).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b1"))
    stream = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(log_dir))
    )
    q = (
        streaming_supertrend(stream)
        .writeStream.format("memory")
        .queryName("st_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["series"], r["day_s"]): (
            r["close_cents"], r["final_upper"], r["final_lower"],
            r["trend"], r["supertrend"],
        )
        for r in spark.sql("SELECT * FROM st_stream").collect()
    }
    want = {
        (r["series"], r["day_s"]): (
            r["close_cents"], r["final_upper"], r["final_lower"],
            r["trend"], r["supertrend"],
        )
        for r in all_queries()["ts_supertrend"](spark, sf_small).collect()
    }
    assert len(got) == len(want) > 0
    for k, g in got.items():
        w = want[k]
        assert g[0] == w[0] and g[3] == w[3], k
        for gi, wi in ((g[1], w[1]), (g[2], w[2]), (g[4], w[4])):
            np.testing.assert_allclose(round(gi * 1e6) / 1e6, wi, atol=1e-9)


def test_adx_matches_textbook_wilder_recursion(spark, sf_small):
    """B104: the literal Wilder chain (DM/TR -> smoothing -> DI ->
    DX -> smoothed ADX) run step by step in Python equals the fold."""
    out = (
        all_queries()["ts_adx"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    n = 7
    for series, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day_s").reset_index(drop=True)
        hc, lc, cc = (
            grp["hc"].to_numpy(float),
            grp["lc"].to_numpy(float),
            grp["cc"].to_numpy(float),
        )
        rows = []
        sp = sm = st = None
        dxs, adx = 0.0, None
        for i in range(1, len(grp)):
            rn = i + 1
            up, dn = hc[i] - hc[i - 1], lc[i - 1] - lc[i]
            dmp = up if (up > dn and up > 0) else 0.0
            dmm = dn if (dn > up and dn > 0) else 0.0
            tr = max(hc[i] - lc[i], abs(hc[i] - cc[i - 1]),
                     abs(lc[i] - cc[i - 1]))
            if sp is None:
                sp, sm, st = dmp, dmm, tr
            elif rn <= n + 1:
                sp, sm, st = sp + dmp, sm + dmm, st + tr
            else:
                sp = sp - sp / n + dmp
                sm = sm - sm / n + dmm
                st = st - st / n + tr
            dip = 100.0 * sp / st if st > 0 else 0.0
            dim = 100.0 * sm / st if st > 0 else 0.0
            dx_raw = (
                100.0 * abs(dip - dim) / (dip + dim)
                if dip + dim > 0
                else 0.0
            )
            if n + 1 <= rn <= 2 * n:
                dxs += dx_raw
            if rn == 2 * n:
                adx = dxs / n
            elif rn > 2 * n:
                adx = (adx * (n - 1) + dx_raw) / n
            if rn >= 2 * n:
                rows.append((grp["day_s"][i], dip, dim, dx_raw, adx))
        got = out[out["series"] == series].reset_index(drop=True)
        assert len(got) == len(rows)
        for j, (day_s, dip, dim, dx, adx_v) in enumerate(rows):
            assert got["day_s"][j] == day_s
            np.testing.assert_allclose(got["plus_di"][j], dip, atol=1e-6)
            np.testing.assert_allclose(got["minus_di"][j], dim, atol=1e-6)
            np.testing.assert_allclose(got["dx"][j], dx, atol=1e-6)
            np.testing.assert_allclose(got["adx"][j], adx_v, atol=1e-6)
            assert 0 <= got["adx"][j] <= 100


def test_winnowing_density_matches_paper(spark, tmp_path):
    """D24: Schleimer et al.'s expected fingerprint density on random
    input is 2/(w+1) of the k-gram positions — with w=4 that is 0.4;
    a long random-vocabulary document should land near it (selected
    fingerprints are DISTINCT hashes, which undercounts slightly, so
    assert a generous band around the theoretical value)."""
    import pandas as pd

    from timescaledb_event_streamer_spark.plans.queries_round9 import (
        _WIN_K,
        _WIN_PACK,
        _WIN_W,
    )

    rng = np.random.default_rng(77)
    toks = [f"w{rng.integers(0, 10**9)}" for _ in range(4000)]
    # run the selection rule directly in Python over md5 hashes (the
    # same packed rightmost-min rule the query uses)
    import hashlib as _h

    kg = [
        int(
            _h.md5(" ".join(toks[i : i + _WIN_K]).encode()).hexdigest()[:10],
            16,
        )
        for i in range(len(toks) - _WIN_K + 1)
    ]
    packed = [
        h * _WIN_PACK + (_WIN_PACK - 1 - (i + 1)) for i, h in enumerate(kg)
    ]
    sel = {
        min(packed[i : i + _WIN_W]) // _WIN_PACK
        for i in range(len(packed) - _WIN_W + 1)
    }
    density = len(sel) / len(kg)
    expect = 2.0 / (_WIN_W + 1)
    assert abs(density - expect) < 0.05, density


def test_power_iteration_matches_numpy_eig(spark, sf_small):
    """E27: the power-iteration direction and Rayleigh quotient agree
    with numpy's dense eigendecomposition of the same covariance
    (up to sign and the iteration's convergence tolerance)."""
    import pandas as pd

    out = (
        all_queries()["embedding_top_eigvec_power"](spark, sf_small)
        .toPandas()
        .sort_values("dim")
    )
    emb = pd.read_parquet(f"{sf_small}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    Xq = np.rint(X * 1e6)
    C = np.cov(Xq, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(C)
    top = evecs[:, -1]
    lam = evals[-1]
    got_v = out["eigvec"].to_numpy()
    # sign-align, then compare: 8 iterations converge well when the
    # spectral gap is decent
    if np.dot(got_v, top) < 0:
        top = -top
    cos = np.dot(got_v, top) / (
        np.linalg.norm(got_v) * np.linalg.norm(top)
    )
    assert cos > 0.999, cos
    np.testing.assert_allclose(
        out["top_eigenvalue"].iloc[0], lam / 1e12, rtol=0.01
    )
    assert 0 < out["explained_ratio"].iloc[0] <= 1


def test_streaming_adx_matches_batch(spark, sf_small, tmp_path):
    """I38: both chained Wilder recursions cross a micro-batch
    boundary and equal the batch ts_adx row-for-row."""
    import time as _t

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        streaming_adx,
    )

    daily = _daily_ohlcv(spark, sf_small).select(
        "series", "day_s", "hc", "lc", "cc"
    )
    split_day = daily.agg(
        F.expr("percentile_approx(day_s, 0.5)").alias("m")
    ).first()["m"]
    log_dir = tmp_path / "adx_log"
    log_dir.mkdir()
    daily.filter(F.col("day_s") <= split_day).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b0"))
    _t.sleep(1.1)
    daily.filter(F.col("day_s") > split_day).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b1"))
    stream = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(log_dir))
    )
    q = (
        streaming_adx(stream)
        .writeStream.format("memory")
        .queryName("adx_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["series"], r["day_s"]): (
            r["plus_di"], r["minus_di"], r["dx"], r["adx"]
        )
        for r in spark.sql("SELECT * FROM adx_stream").collect()
    }
    want = {
        (r["series"], r["day_s"]): (
            r["plus_di"], r["minus_di"], r["dx"], r["adx"]
        )
        for r in all_queries()["ts_adx"](spark, sf_small).collect()
    }
    assert len(got) == len(want) > 0
    for k, g in got.items():
        w = want[k]
        for gi, wi in zip(g, w):
            np.testing.assert_allclose(
                round(gi * 1e6) / 1e6, wi, atol=1e-9
            )
