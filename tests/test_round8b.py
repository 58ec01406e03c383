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


def test_sq8_topk_matches_numpy_quantization(spark, sf_small):
    """Independent numpy re-quantization reproduces the approx scores,
    and the flagged recall is high (int8 error is small at dim 64)."""
    out = all_queries()["ann_sq8_topk"](spark, sf_small).toPandas()
    emb = pd.read_parquet(f"{sf_small}/embeddings.parquet")
    V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    q = V[ids == 0][0]
    qsc = np.abs(q).max() / 127.0
    qq = np.clip(np.floor(q / qsc + 0.5), -127, 127)
    sc = np.abs(V).max(axis=1) / 127.0
    Z = np.clip(np.floor(V / sc[:, None] + 0.5), -127, 127)
    approx = (Z @ qq) * qsc * sc
    exact = V @ q
    by_id = dict(zip(ids, approx))
    for _, row in out.iterrows():
        assert abs(by_id[row["vec_id"]] - row["sq8_dot"]) < 1e-4
    # approx ranking must recover most of the exact top-20
    exact_top = set(ids[np.argsort(-exact)][:20])
    got_flags = out["in_exact_topk"].sum()
    assert got_flags == len(set(out["vec_id"]) & exact_top)
    assert got_flags >= 15, f"sq8 recall@20 too low: {got_flags}/20"


def test_zipf_fit_matches_numpy_polyfit(spark, sf_small):
    out = all_queries()["text_zipf_fit"](spark, sf_small).toPandas()
    docs = pd.read_parquet(f"{sf_small}/documents.parquet")
    for source, grp in docs.groupby("source"):
        words = pd.Series(
            [w for t in grp["text"] for w in str(t).split(" ") if w]
        )
        cnt = words.value_counts()
        top = (
            cnt.reset_index()
            .sort_values(["count", words.name or "index"])
            .sort_values("count", ascending=False, kind="stable")
            .head(100)
        )
        x = np.log(np.arange(1, len(top) + 1))
        y = np.log(top["count"].to_numpy())
        slope = np.polyfit(x, y, 1)[0]
        r = np.corrcoef(x, y)[0, 1]
        got = out[out["source"] == source].iloc[0]
        assert got["n_terms"] == len(top)
        np.testing.assert_allclose(got["zipf_slope"], slope, atol=1e-5)
        np.testing.assert_allclose(got["zipf_r2"], r * r, atol=1e-5)
        assert -3.0 < got["zipf_slope"] < -0.1


def test_hapax_stats_match_pandas(spark, sf_small):
    out = all_queries()["text_hapax_stats"](spark, sf_small).toPandas()
    docs = pd.read_parquet(f"{sf_small}/documents.parquet")
    for source, grp in docs.groupby("source"):
        words = pd.Series(
            [w for t in grp["text"] for w in str(t).split(" ") if w]
        )
        cnt = words.value_counts()
        got = out[out["source"] == source].iloc[0]
        assert got["n_tokens"] == len(words)
        assert got["vocab"] == len(cnt)
        assert got["hapax"] == int((cnt == 1).sum())
        assert got["dis"] == int((cnt == 2).sum())
        np.testing.assert_allclose(
            got["herdan_c"],
            np.log(len(cnt)) / np.log(len(words)),
            atol=1e-6,
        )


def test_sax_matches_float_reference(spark, sf_small):
    """Independent float z-normalized PAA + quartile quantization in
    numpy yields the same symbols (no test point sits near enough a
    breakpoint for float error to matter), and paa values match."""
    out = (
        all_queries()["ts_sax"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "frame_idx"])
    )
    daily = _daily_close(spark, sf_small)
    b = 0.6745
    for series, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day_s")
        x = grp["cc"].to_numpy(dtype=float)
        mu, sigma = x.mean(), x.std()  # population std
        got = out[out["series"] == series]
        for _, row in got.iterrows():
            lo = int(row["frame_idx"]) * 8
            frame = x[lo : lo + 8]
            assert row["flen"] == len(frame)
            paa = frame.mean()
            np.testing.assert_allclose(
                row["paa"], round(paa / 100.0, 6), atol=1e-6
            )
            z = (paa - mu) / sigma
            want = "a" if z < -b else "b" if z < 0 else "c" if z <= b else "d"
            assert row["symbol"] == want, (series, row["frame_idx"], z)


def test_streaming_cusum_matches_batch(spark, sf_small, tmp_path):
    """I29: streaming CUSUM with the batch query's series means as
    reference targets reproduces ts_cusum across a genuine micro-
    batch boundary (two time-ordered file triggers)."""
    import time as _t

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.sources.tables import load
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        streaming_cusum,
    )

    events = load(spark, sf_small, "events")
    es = F.expr("unix_micros(ts) div 1000000")
    c = F.round(F.col("value") * 100, 0).cast("long")
    daily = (
        events.withColumn("_es", es)
        .groupBy(
            F.col("event_type").alias("series"),
            (F.col("_es") - F.pmod(F.col("_es"), F.lit(86400))).alias(
                "day_s"
            ),
        )
        .agg(F.max_by(c, F.col("event_id")).alias("cc"))
    )
    targets = {
        r["series"]: r["mu"]
        for r in daily.groupBy("series")
        .agg((F.sum("cc") / F.count(F.lit(1))).alias("mu"))
        .collect()
    }
    split_day = daily.agg(
        F.expr("percentile_approx(day_s, 0.5)").alias("m")
    ).first()["m"]
    log_dir = tmp_path / "cusum_log"
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
        streaming_cusum(stream, targets)
        .writeStream.format("memory")
        .queryName("cusum_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["series"], r["day_s"]): (r["cusum_pos"], r["cusum_neg"])
        for r in spark.sql("SELECT * FROM cusum_stream").collect()
    }
    want = {
        (r["series"], r["day_s"]): (r["cusum_pos"], r["cusum_neg"])
        for r in all_queries()["ts_cusum"](spark, sf_small).collect()
    }
    assert len(got) == len(want) > 0
    for k, (gp, gn) in got.items():
        wp, wn = want[k]
        np.testing.assert_allclose(gp, wp, atol=1e-5)
        np.testing.assert_allclose(gn, wn, atol=1e-5)


def test_kaufman_er_matches_pandas(spark, sf_small):
    out = (
        all_queries()["ts_kaufman_er"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    for series, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day_s")
        cc = grp["cc"].astype(float)
        signal = (cc - cc.shift(10)).abs()
        noise = cc.diff().abs().rolling(10, min_periods=1).sum()
        er = (signal / noise).where(noise > 0)
        got = out[out["series"] == series]
        want = er.iloc[10:].round(6)
        np.testing.assert_allclose(
            got["efficiency_ratio"].to_numpy(), want.to_numpy(), atol=1e-6
        )
        assert ((got["efficiency_ratio"].dropna() >= 0).all())
        assert ((got["efficiency_ratio"].dropna() <= 1).all())


def test_aroon_latest_tie_and_values(spark, sf_small):
    """Independent python loop with the explicit latest-occurrence
    tie-break reproduces days_since_high/low and the aroon values."""
    out = (
        all_queries()["ts_aroon"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    n = 25
    for series, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day_s").reset_index(drop=True)
        got = out[out["series"] == series].reset_index(drop=True)
        k = 0
        for t in range(n - 1, len(grp)):
            win_h = grp["hc"].iloc[t - n + 1 : t + 1].to_numpy()
            win_l = grp["lc"].iloc[t - n + 1 : t + 1].to_numpy()
            # latest occurrence of the max/min
            hi_pos = n - 1 - int(np.argmax(win_h[::-1]))
            lo_pos = n - 1 - int(np.argmin(win_l[::-1]))
            dsh, dsl = n - 1 - hi_pos, n - 1 - lo_pos
            row = got.iloc[k]
            assert row["days_since_high"] == dsh, (series, t)
            assert row["days_since_low"] == dsl, (series, t)
            np.testing.assert_allclose(
                row["aroon_up"], round((n - dsh) * 100.0 / n, 6)
            )
            np.testing.assert_allclose(
                row["aroon_down"], round((n - dsl) * 100.0 / n, 6)
            )
            k += 1
        assert k == len(got)


def test_acf_matches_numpy(spark, sf_small):
    out = (
        all_queries()["ts_acf"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "lag"])
    )
    daily = _daily_close(spark, sf_small)
    for series, grp in daily.groupby("event_type"):
        x = grp.sort_values("day_s")["cc"].to_numpy(dtype=float)
        d = x - x.mean()
        den = (d * d).sum()
        got = out[out["series"] == series]
        assert got["lag"].tolist() == list(range(1, 8))
        for k in range(1, 8):
            want = (d[:-k] * d[k:]).sum() / den
            np.testing.assert_allclose(
                got[got["lag"] == k]["acf"].iloc[0], want, atol=1e-6
            )


def test_bigram_lm_score_matches_python(spark, sf_small):
    from collections import Counter

    out = all_queries()["text_bigram_lm_score"](spark, sf_small).toPandas()
    docs = pd.read_parquet(f"{sf_small}/documents.parquet")
    bf, ctx, per_doc = Counter(), Counter(), {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = [t for t in str(text).split(" ") if t]
        bigs = list(zip(toks, toks[1:]))
        if bigs:
            per_doc[doc_id] = bigs
            bf.update(bigs)
            ctx.update(p for p, _ in bigs)
    assert len(out) == len(per_doc)
    for doc_id, bigs in list(per_doc.items())[:200]:
        h = -sum(np.log2(bf[b] / ctx[b[0]]) for b in bigs) / len(bigs)
        row = out[out["doc_id"] == doc_id].iloc[0]
        assert row["n_bigrams"] == len(bigs)
        np.testing.assert_allclose(
            row["bigram_entropy_bits"], h, atol=1e-5
        )


def test_matrix_profile_matches_bruteforce(spark, sf_small):
    """Literal O(n^2) numpy brute force (exclusion zone, first-min
    tie on packed order) reproduces profile values and neighbors."""
    out = (
        all_queries()["ts_matrix_profile"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "start_day"])
    )
    daily = _daily_close(spark, sf_small)
    m, excl = 7, 4
    for series, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day_s").reset_index(drop=True)
        x = grp["cc"].to_numpy(dtype=np.int64)
        n_win = len(x) - m + 1
        got = out[out["series"] == series].reset_index(drop=True)
        assert len(got) == max(n_win, 0)
        for t in range(n_win):
            best = None
            for u in range(n_win):
                if abs(t - u) < excl:
                    continue
                d2 = int(((x[t : t + m] - x[u : u + m]) ** 2).sum())
                key = (d2, u + 1)  # 1-based rn, packed tie order
                if best is None or key < best:
                    best = key
            row = got.iloc[t]
            assert row["start_day"] == grp["day_s"].iloc[t]
            assert row["nn_dist2_cents"] == best[0], (series, t)
            assert row["nn_start"] == best[1], (series, t)
        # motif/discord sanity: profile has spread (not all equal)
        assert got["nn_dist2_cents"].nunique() > 1


def test_exif_probe_both_endiannesses_and_rejects(spark):
    """Hand-built EXIF payloads (II and MM, with/without APP0, plus a
    JPEG without EXIF and a non-JPEG) parse to the exact planted
    fields / typed NULLs."""
    import struct

    from timescaledb_event_streamer_spark.operators.multimodal import (
        parse_exif_headers,
    )

    def tiff(le, orientation, num, den):
        e = "<" if le else ">"
        out = (b"II" if le else b"MM") + struct.pack(e + "HI", 42, 8)
        out += struct.pack(e + "H", 3)
        out += struct.pack(e + "HHI", 0x0112, 3, 1) + struct.pack(
            e + "H", orientation
        ) + b"\x00\x00"
        out += struct.pack(e + "HHI", 0x011A, 5, 1) + struct.pack(e + "I", 50)
        out += struct.pack(e + "HHI", 0x8769, 4, 1) + struct.pack(e + "I", 0)
        out += struct.pack(e + "I", 0)
        out += struct.pack(e + "II", num, den)
        return out

    def jpeg(le, orientation, num, den, app0=False):
        body = b"Exif\x00\x00" + tiff(le, orientation, num, den)
        app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
        pre = (
            b"\xff\xe0\x00\x10JFIF\x00" + b"\x00" * 9 if app0 else b""
        )
        return b"\xff\xd8" + pre + app1 + b"\xff\xd9"

    import pandas as pd

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2, 3, 4],
                "payload": [
                    jpeg(True, 6, 300, 2, app0=False),
                    jpeg(False, 8, 72, 1, app0=True),
                    b"\xff\xd8\xff\xd9",  # JPEG, no EXIF
                    b"BMnot-a-jpeg",
                ],
            }
        )
    )
    rows = {r["media_id"]: r for r in parse_exif_headers(media).collect()}
    r1 = rows[1]
    assert (r1["byte_order"], r1["orientation"]) == ("II", 6)
    assert (r1["xres_num"], r1["xres_den"]) == (300, 2)
    assert r1["xresolution"] == 150.0
    r2 = rows[2]
    assert (r2["byte_order"], r2["orientation"]) == ("MM", 8)
    assert (r2["xres_num"], r2["xres_den"]) == (72, 1)
    assert r2["n_ifd_entries"] == 3
    r3 = rows[3]
    assert r3["is_jpeg"] and not r3["has_exif"]
    assert r3["orientation"] is None and r3["xresolution"] is None
    r4 = rows[4]
    assert not r4["is_jpeg"] and not r4["has_exif"]


def test_ivf_sq8_stages_consistent(spark, sf_small):
    """The three-stage result is internally consistent: shortlist
    membership comes from the sq8 ranking, final rank from the exact
    rerank, and the top hit beats brute force only through candidates
    the probe admitted (recall sanity vs full brute force)."""
    out = all_queries()["ann_ivf_sq8"](spark, sf_small).toPandas()
    assert len(out) == 10
    assert out["rnk"].tolist() == list(range(1, 11))
    # rerank order is by exact dot desc, tie vec_id
    ed = out.sort_values("rnk")["exact_dot"].to_numpy()
    assert (np.diff(ed) <= 1e-12).all()
    # sq8 scores approximate the exact dot well at dim 64
    rel = np.abs(out["sq8_dot"] - out["exact_dot"]) / np.abs(
        out["exact_dot"]
    ).clip(lower=1e-9)
    assert rel.max() < 0.2
    # recall vs exact brute force over the whole corpus
    emb = pd.read_parquet(f"{sf_small}/embeddings.parquet")
    V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    q = V[ids == 1][0]
    exact = V @ q
    mask = ids != 1
    order = np.argsort(-exact[mask])
    top10 = set(ids[mask][order][:10])
    assert len(set(out["vec_id"]) & top10) >= 5


def test_rake_matches_pure_python(spark, sf_small):
    """Literal RAKE (Rose et al.) in pure Python — regex phrase split,
    deg/freq word scores, phrase-sum — reproduces top-3 per doc."""
    import re

    out = all_queries()["text_rake_keywords"](spark, sf_small).toPandas()
    docs = pd.read_parquet(f"{sf_small}/documents.parquet")
    delim = re.compile(r"\b(?:the|a|of|and|in|to|is)\b")
    for doc_id, text in list(zip(docs["doc_id"], docs["text"]))[:100]:
        phrases = [
            re.sub(" +", " ", p).strip()
            for p in delim.split(str(text))
        ]
        phrases = [p for p in phrases if p]
        freq, deg = {}, {}
        for p in phrases:
            words = p.split(" ")
            for w in words:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(words)
        scores = {}
        for p in set(phrases):
            scores[p] = round(
                sum(deg[w] / freq[w] for w in p.split(" ")), 6
            )
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        got = out[out["doc_id"] == doc_id].sort_values("rnk")
        assert len(got) == len(want)
        for (wp, wscore), (_, row) in zip(want, got.iterrows()):
            assert row["phrase"] == wp, doc_id
            np.testing.assert_allclose(row["score"], wscore, atol=1e-5)


def test_haar_energy_matches_pywt_free_reference(spark, sf_small):
    """Independent normalized-Haar DWT in numpy: the query's
    unnormalized integer energies relate by exact powers of two, and
    parseval_ok is True everywhere."""
    out = (
        all_queries()["ts_haar_energy"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "frame_idx"])
    )
    assert out["parseval_ok"].all()
    daily = _daily_close(spark, sf_small)
    for series, grp in daily.groupby("event_type"):
        x = grp.sort_values("day_s")["cc"].to_numpy(dtype=float)
        got = out[out["series"] == series].reset_index(drop=True)
        assert len(got) == len(x) // 8
        for f in range(len(x) // 8):
            fr = x[f * 8 : (f + 1) * 8]
            # orthonormal Haar detail coefficients
            d1 = (fr[0::2] - fr[1::2]) / np.sqrt(2)
            s1 = (fr[0::2] + fr[1::2]) / np.sqrt(2)
            d2 = (s1[0::2] - s1[1::2]) / np.sqrt(2)
            s2 = (s1[0::2] + s1[1::2]) / np.sqrt(2)
            d3 = (s2[0] - s2[1]) / np.sqrt(2)
            s3 = (s2[0] + s2[1]) / np.sqrt(2)
            row = got.iloc[f]
            # unnormalized integer energies = 2^level x orthonormal
            np.testing.assert_allclose(row["e1_cents2"], 2 * (d1**2).sum())
            np.testing.assert_allclose(row["e2_cents2"], 4 * (d2**2).sum())
            np.testing.assert_allclose(row["e3_cents2"], 8 * d3**2)
            np.testing.assert_allclose(
                row["approx_mean"], round(fr.mean() / 100.0, 6), atol=1e-6
            )
            # Parseval in the orthonormal basis too
            np.testing.assert_allclose(
                (d1**2).sum() + (d2**2).sum() + d3**2 + s3**2,
                (fr**2).sum(),
            )


def test_theil_sen_matches_numpy_median(spark, sf_small):
    out = all_queries()["ts_theil_sen"](spark, sf_small).toPandas()
    daily = _daily_close(spark, sf_small)
    for series, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day_s")
        days = grp["day_s"].to_numpy(dtype=float) / 86400.0
        x = grp["cc"].to_numpy(dtype=float)
        n = len(x)
        slopes = [
            (x[j] - x[i]) / (days[j] - days[i])
            for i in range(n)
            for j in range(i + 1, n)
        ]
        row = out[out["series"] == series].iloc[0]
        assert row["n_pairs"] == len(slopes)
        np.testing.assert_allclose(
            row["theil_sen_slope"],
            round(float(np.median(slopes)) / 100.0, 6),
            atol=1e-6,
        )


def test_mann_kendall_matches_literal_formula(spark, sf_small):
    out = all_queries()["ts_mann_kendall"](spark, sf_small).toPandas()
    daily = _daily_close(spark, sf_small)
    for series, grp in daily.groupby("event_type"):
        x = grp.sort_values("day_s")["cc"].to_numpy()
        n = len(x)
        s = sum(
            np.sign(x[j] - x[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        _, counts = np.unique(x, return_counts=True)
        tie = sum(int(t * (t - 1) * (2 * t + 5)) for t in counts if t > 1)
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        z = (
            (s - 1) / np.sqrt(var)
            if s > 0
            else (s + 1) / np.sqrt(var)
            if s < 0
            else 0.0
        )
        row = out[out["series"] == series].iloc[0]
        assert row["s_stat"] == s
        assert row["var18"] == n * (n - 1) * (2 * n + 5) - tie
        np.testing.assert_allclose(row["z_score"], z, atol=1e-6)


def test_readability_matches_pure_python(spark, sf_small):
    import re

    out = all_queries()["text_readability"](spark, sf_small).toPandas()
    docs = pd.read_parquet(f"{sf_small}/documents.parquet")
    checked = 0
    for doc_id, text in list(zip(docs["doc_id"], docs["text"]))[:100]:
        text = str(text)
        ns = max(len(re.findall(r"[.!?]+", text)), 1)
        nw = len(re.findall(r"[^ ]+", text))
        if nw == 0:
            continue
        nsy = max(len(re.findall(r"[aeiouy]+", text.lower())), 1)
        row = out[out["doc_id"] == doc_id].iloc[0]
        assert (row["n_sentences"], row["n_words"], row["n_syllables"]) == (
            ns, nw, nsy,
        )
        np.testing.assert_allclose(
            row["flesch_ease"],
            round(206.835 - 1.015 * nw / ns - 84.6 * nsy / nw, 6),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            row["fk_grade"],
            round(0.39 * nw / ns + 11.8 * nsy / nw - 15.59, 6),
            atol=1e-6,
        )
        checked += 1
    assert checked > 50


def test_hurst_rs_matches_literal_rescaled_range(spark, sf_small):
    out = all_queries()["ts_hurst_rs"](spark, sf_small).toPandas()
    daily = _daily_close(spark, sf_small)
    for series, grp in daily.groupby("event_type"):
        x = grp.sort_values("day_s")["cc"].to_numpy(dtype=float)
        rs_by_k = {}
        for k in (8, 16):
            vals = []
            for b in range(len(x) // k):
                blk = x[b * k : (b + 1) * k]
                z = np.cumsum(blk - blk.mean())
                s = blk.std()  # population
                if s > 0:
                    # include the zero anchor implicitly: z ends at 0
                    vals.append((z.max() - z.min()) / s)
            rs_by_k[k] = float(np.mean(vals))
        row = out[out["series"] == series].iloc[0]
        np.testing.assert_allclose(row["rs8"], rs_by_k[8], atol=1e-5)
        np.testing.assert_allclose(row["rs16"], rs_by_k[16], atol=1e-5)
        np.testing.assert_allclose(
            row["hurst"], np.log2(rs_by_k[16] / rs_by_k[8]), atol=1e-5
        )
        assert 0.0 < row["hurst"] < 1.5


def test_dedup_rate_report_consistent_with_components(spark, sf_small):
    """Cross-checks against the independently certified components:
    exact removals match a pandas text-hash group count; near flags
    match the dedup_minhash_md5 pair membership."""
    out = all_queries()["dedup_rate_report"](spark, sf_small).toPandas()
    docs = pd.read_parquet(f"{sf_small}/documents.parquet")
    canon = docs.groupby("text")["doc_id"].transform("min")
    docs = docs.assign(is_dup=docs["doc_id"] != canon)
    want = docs.groupby("source").agg(
        n_docs=("doc_id", "size"), exact=("is_dup", "sum")
    )
    got = out.set_index("source")
    for src, row in want.iterrows():
        assert got.loc[src, "n_docs"] == row["n_docs"]
        assert got.loc[src, "exact_dup_docs"] == row["exact"]
    pairs = all_queries()["dedup_minhash_md5"](spark, sf_small).toPandas()
    near_ids = set(pairs["doc_a"]) | set(pairs["doc_b"])
    near_surviving = docs[
        docs["doc_id"].isin(near_ids) & ~docs["is_dup"]
    ]
    want_near = near_surviving.groupby("source").size()
    for src in got.index:
        assert got.loc[src, "near_dup_docs"] == want_near.get(src, 0)


def test_curriculum_phases_partition_and_order(spark, sf_small):
    out = (
        all_queries()["corpus_curriculum_order"](spark, sf_small)
        .toPandas()
        .sort_values("phase")
    )
    assert out["phase"].tolist() == [1, 2, 3, 4]
    # phases tile the corpus and grades are non-decreasing across them
    docs = pd.read_parquet(f"{sf_small}/documents.parquet")
    n_scored = (docs["text"].astype(str).str.strip() != "").sum()
    assert out["n_docs"].sum() == n_scored
    assert abs(out["token_share"].sum() - 1.0) < 1e-4
    for i in range(3):
        assert out["grade_max"].iloc[i] <= out["grade_min"].iloc[i + 1] + 1e-9
    # ntile remainder goes to leading phases
    sizes = out["n_docs"].tolist()
    assert max(sizes) - min(sizes) <= 1 and sizes == sorted(sizes, reverse=True)


def test_streaming_heavy_hitters_matches_reference_spacesaving(
    spark, sf_small, tmp_path
):
    """I30: the streamed SpaceSaving state across two micro-batches
    equals a pure-Python SpaceSaving fed the same rows in the same
    order, and the classic guarantees hold vs true counts."""
    import time as _t

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.sources.tables import load
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        _spacesaving_update,
        streaming_heavy_hitters,
    )

    events = load(spark, sf_small, "events")
    tagged = events.select(
        F.col("event_type").alias("series"),
        F.col("user_id").cast("string").alias("item"),
        F.col("event_id").alias("seq"),
    )
    split = tagged.agg(F.expr("percentile_approx(seq, 0.5)").alias("m")).first()["m"]
    log_dir = tmp_path / "hh_log"
    log_dir.mkdir()
    tagged.filter(F.col("seq") <= split).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b0"))
    _t.sleep(1.1)
    tagged.filter(F.col("seq") > split).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b1"))
    stream = (
        spark.readStream.schema(tagged.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(log_dir))
    )
    q = (
        streaming_heavy_hitters(stream, m=16, emit_top=5)
        .writeStream.format("memory")
        .queryName("hh_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM hh_stream").toPandas()
    final = out[out["update_seq"] == 2]
    assert out["update_seq"].max() == 2  # state genuinely crossed batches
    ref = tagged.orderBy("seq").toPandas()
    for series, grp in ref.groupby("series"):
        counters = {}
        for item in grp.sort_values("seq")["item"]:
            _spacesaving_update(counters, str(item), 16)
        want_top = sorted(
            counters.items(), key=lambda kv: (-kv[1][0], kv[0])
        )[:5]
        got = final[final["series"] == series].sort_values("rank")
        assert len(got) == len(want_top)
        for (item, (cnt, err)), (_, row) in zip(want_top, got.iterrows()):
            assert (row["item"], row["est_count"], row["max_err"]) == (
                item, cnt, err,
            ), series
        # classic SpaceSaving guarantees vs TRUE counts
        true = grp["item"].value_counts()
        n = len(grp)
        for item, c in true.items():
            if c > n / 16:
                assert item in counters, (series, item)
        for item, (cnt, err) in counters.items():
            t = int(true.get(item, 0))
            assert t <= cnt <= t + err, (series, item)


def test_streaming_p2_quantile_tracks_true_median(spark, sf_small, tmp_path):
    """I31: the P-square state carries across two micro-batches, the
    streamed fold equals a pure-Python P-square on the same ordered
    values, and the estimate lands near the true median."""
    import json
    import time as _t

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.sources.tables import load
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        _p2_init,
        _p2_update,
        streaming_p2_quantile,
    )

    events = load(spark, sf_small, "events")
    tagged = events.select(
        F.col("event_type").alias("series"),
        F.col("value").alias("x"),
        F.col("event_id").alias("seq"),
    )
    split = tagged.agg(F.expr("percentile_approx(seq, 0.5)").alias("m")).first()["m"]
    log_dir = tmp_path / "p2_log"
    log_dir.mkdir()
    tagged.filter(F.col("seq") <= split).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b0"))
    _t.sleep(1.1)
    tagged.filter(F.col("seq") > split).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b1"))
    stream = (
        spark.readStream.schema(tagged.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(log_dir))
    )
    q = (
        streaming_p2_quantile(stream, p=0.5)
        .writeStream.format("memory")
        .queryName("p2_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM p2_stream").toPandas()
    final = out[out["update_seq"] == 2].set_index("series")
    assert out["update_seq"].max() == 2
    ref = tagged.orderBy("seq").toPandas()
    for series, grp in ref.groupby("series"):
        xs = grp.sort_values("seq")["x"].astype(float).tolist()
        st = None
        for x in xs:
            if st is None:
                boot = [x]
                st = {"boot": boot}
            elif "q" not in st:
                st["boot"].append(x)
                if len(st["boot"]) == 5:
                    st = _p2_init(st["boot"])
            else:
                _p2_update(st, x, 0.5)
        want = st["q"][2]
        got = final.loc[series]
        assert got["n_seen"] == len(xs)
        np.testing.assert_allclose(got["q_estimate"], want, rtol=1e-12)
        # accuracy vs the true median (P-square is approximate)
        true_med = float(np.median(xs))
        spread = float(np.percentile(xs, 75) - np.percentile(xs, 25))
        assert abs(got["q_estimate"] - true_med) < 0.15 * spread, series


def test_exif_probe_hostile_payloads_yield_typed_nulls(spark):
    """200 random payloads (some with JPEG/EXIF-ish prefixes) through
    the codegen TIFF-IFD walk: never an execution error, and the
    field-gating invariants hold on every row."""
    import os

    import pandas as pd

    from timescaledb_event_streamer_spark.operators.multimodal import (
        parse_exif_headers,
    )

    rng = np.random.default_rng(123)
    payloads = []
    for i in range(200):
        body = bytes(rng.integers(0, 256, size=int(rng.integers(0, 80)), dtype=np.uint8))
        prefix = [b"", b"\xff\xd8", b"\xff\xd8\xff\xe1\x00\x08Exif\x00\x00", os.urandom(4)][i % 4]
        payloads.append(prefix + body)
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": range(200), "payload": payloads})
    )
    out = parse_exif_headers(media).toPandas()
    assert len(out) == 200
    for _, r in out.iterrows():
        if not r["is_jpeg"]:
            assert not r["has_exif"]
        if not r["has_exif"]:
            for c in ("byte_order", "n_ifd_entries", "orientation",
                      "xres_num", "xres_den", "xresolution"):
                assert r[c] is None or (isinstance(r[c], float) and np.isnan(r[c])), (
                    r["media_id"], c, r[c],
                )


def test_streaming_reservoir_matches_deterministic_replay(
    spark, sf_small, tmp_path
):
    """I32: the reservoir after two micro-batches equals a pure-Python
    replay of the same decisions on the same ordered items, and
    admission frequency is ~uniform over positions."""
    import time as _t

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.sources.tables import load
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        _reservoir_decision,
        streaming_reservoir_sample,
    )

    events = load(spark, sf_small, "events")
    tagged = events.select(
        F.col("event_type").alias("series"),
        F.col("event_id").cast("string").alias("item"),
        F.col("event_id").alias("seq"),
    )
    split = tagged.agg(F.expr("percentile_approx(seq, 0.5)").alias("m")).first()["m"]
    log_dir = tmp_path / "res_log"
    log_dir.mkdir()
    tagged.filter(F.col("seq") <= split).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b0"))
    _t.sleep(1.1)
    tagged.filter(F.col("seq") > split).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b1"))
    stream = (
        spark.readStream.schema(tagged.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(log_dir))
    )
    q = (
        streaming_reservoir_sample(stream, k=8)
        .writeStream.format("memory")
        .queryName("res_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM res_stream").toPandas()
    final = out[out["update_seq"] == 2]
    assert out["update_seq"].max() == 2
    ref = tagged.orderBy("seq").toPandas()
    for series, grp in ref.groupby("series"):
        res = []
        n = 0
        for item in grp.sort_values("seq")["item"]:
            n += 1
            slot = _reservoir_decision(series, n, 8)
            if slot is not None:
                if slot == len(res):
                    res.append(str(item))
                else:
                    res[slot] = str(item)
        got = final[final["series"] == series].sort_values("slot")
        assert got["n_seen"].iloc[0] == n
        assert got["item"].tolist() == res, series
        # sampled items span the stream, not just its head/tail
        ids = np.array([int(x) for x in res], dtype=float)
        lo, hi = grp["seq"].min(), grp["seq"].max()
        frac = (ids - lo) / (hi - lo)
        assert frac.min() < 0.5 < frac.max(), series


def test_streaming_ewma_alerts_match_replay_and_fire_on_plant(
    spark, sf_small, tmp_path
):
    """I33: cross-batch equality with a pure-Python West recurrence,
    plus a planted 10-sigma spike in batch 2 that MUST alert."""
    import time as _t

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.sources.tables import load
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        streaming_ewma_alerts,
    )

    events = load(spark, sf_small, "events")
    es = F.expr("unix_micros(ts) div 1000000")
    daily = (
        events.withColumn("_es", es)
        .groupBy(
            F.col("event_type").alias("series"),
            (F.col("_es") - F.pmod(F.col("_es"), F.lit(86400))).alias(
                "day_s"
            ),
        )
        .agg(F.avg("value").alias("x"))
    )
    split = daily.agg(F.expr("percentile_approx(day_s, 0.5)").alias("m")).first()["m"]
    log_dir = tmp_path / "ew_log"
    log_dir.mkdir()
    daily.filter(F.col("day_s") <= split).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b0"))
    _t.sleep(1.1)
    late = daily.filter(F.col("day_s") > split)
    max_day = daily.agg(F.max("day_s")).first()[0]
    spike = late.limit(0).unionByName(
        daily.limit(1).select(
            "series", F.lit(max_day + 86400).alias("day_s"),
            (F.col("x") * 50 + 10000).alias("x"),
        )
    )
    late.unionByName(spike).coalesce(1).write.mode("overwrite").parquet(
        str(log_dir / "b1")
    )
    stream = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(log_dir))
    )
    q = (
        streaming_ewma_alerts(stream)
        .writeStream.format("memory")
        .queryName("ew_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM ew_stream").toPandas()
    ref = daily.unionByName(spike).toPandas()
    alerts = 0
    for series, grp in ref.groupby("series"):
        grp = grp.sort_values("day_s")
        mean = var = None
        n = 0
        got = out[out["series"] == series].sort_values("day_s").reset_index(drop=True)
        assert len(got) == len(grp)
        for i, (_, r) in enumerate(grp.iterrows()):
            x = float(r["x"])
            if mean is None:
                mean, var, z, alert = x, 0.0, 0.0, False
            else:
                sd = var ** 0.5
                z = (x - mean) / sd if sd > 0 else 0.0
                alert = n >= 5 and abs(z) > 3.0
                delta = x - mean
                incr = 0.2 * delta
                mean += incr
                var = 0.8 * (var + delta * incr)
            n += 1
            row = got.iloc[i]
            np.testing.assert_allclose(row["ewma"], mean, rtol=1e-12)
            np.testing.assert_allclose(row["ewvar"], var, rtol=1e-9, atol=1e-12)
            assert row["alert"] == alert, (series, i)
            alerts += int(alert)
        # the planted spike is the LAST day of the spiked series
        if grp["day_s"].max() > ref["day_s"].max() - 86400 / 2:
            pass
    assert out["alert"].sum() >= 1  # the plant fired
    assert out[out["alert"]]["day_s"].max() == ref["day_s"].max()


def test_streaming_hll_equals_batch_hll_md5(spark, sf_small, tmp_path):
    """I34: after two micro-batches the streaming HLL estimate must
    EQUAL the driver-certified batch ts_hll_md5 (register max-merge
    is order-blind), closing the streaming==batch==oracle triangle."""
    import time as _t

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.sources.tables import load
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        streaming_hll_distinct,
    )

    events = load(spark, sf_small, "events")
    tagged = events.select(
        F.col("event_type").alias("series"),
        F.col("user_id").cast("string").alias("item"),
        F.col("event_id").alias("seq"),
    )
    split = tagged.agg(F.expr("percentile_approx(seq, 0.5)").alias("m")).first()["m"]
    log_dir = tmp_path / "hll_log"
    log_dir.mkdir()
    tagged.filter(F.col("seq") <= split).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b0"))
    _t.sleep(1.1)
    tagged.filter(F.col("seq") > split).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b1"))
    stream = (
        spark.readStream.schema(tagged.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(log_dir))
    )
    q = (
        streaming_hll_distinct(stream.drop("seq"))
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM hll_stream").toPandas()
    final = out[out["update_seq"] == 2].set_index("series")
    assert out["update_seq"].max() == 2
    batch = (
        all_queries()["ts_hll_md5"](spark, sf_small)
        .toPandas()
        .set_index("event_type")
    )
    assert set(final.index) == set(batch.index)
    for series in batch.index:
        assert final.loc[series, "n_regs"] == batch.loc[series, "n_regs"], series
        np.testing.assert_allclose(
            final.loc[series, "n_approx"],
            batch.loc[series, "n_approx"],
            rtol=0,
            atol=1e-9,
        )
        assert final.loc[series, "n_items"] == int(
            (
                pd.read_parquet(f"{sf_small}/events.parquet")["event_type"]
                == series
            ).sum()
        )


def test_streaming_cms_equals_batch_sketch(spark, sf_small, tmp_path):
    """I35: after two micro-batches the streamed CMS point estimates
    equal the driver-certified batch ts_count_min_sketch for every
    tracked item (register increments are associative)."""
    import time as _t

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.sources.tables import load
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        streaming_count_min,
    )

    events = load(spark, sf_small, "events")
    tagged = events.select(
        F.col("event_type").alias("series"),
        F.col("user_id").cast("string").alias("item"),
        F.col("event_id").alias("seq"),
    )
    split = tagged.agg(F.expr("percentile_approx(seq, 0.5)").alias("m")).first()["m"]
    log_dir = tmp_path / "cms_log"
    log_dir.mkdir()
    tagged.filter(F.col("seq") <= split).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b0"))
    _t.sleep(1.1)
    tagged.filter(F.col("seq") > split).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b1"))
    stream = (
        spark.readStream.schema(tagged.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(log_dir))
    )
    q = (
        streaming_count_min(stream.drop("seq"), tracked=range(20))
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM cms_stream").toPandas()
    final = out[out["update_seq"] == 2]
    assert out["update_seq"].max() == 2
    batch = all_queries()["ts_count_min_sketch"](spark, sf_small).toPandas()
    got = {
        (r["series"], int(r["item"])): r["n_cms"]
        for _, r in final.iterrows()
    }
    assert len(batch) > 0
    for _, r in batch.iterrows():
        key = (r["event_type"], int(r["user_id"]))
        assert got[key] == r["n_cms"], key
        assert got[key] >= r["n_exact"]  # one-sided guarantee survives
