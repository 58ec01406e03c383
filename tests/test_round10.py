"""Semantic pins for the round-10 additions: each indicator is
checked against its textbook formulation run literally in pure
Python/pandas (independent of the query's window algebra), and the
dedup/text additions against hand-computable invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.test_round8b import _daily_close
from timescaledb_event_streamer_spark.plans.registry import all_queries


def _per_series(daily: pd.DataFrame):
    for series, grp in daily.groupby("event_type"):
        yield series, grp.sort_values("day_s").reset_index(drop=True)


def test_williams_r_matches_textbook(spark, sf_small):
    out = (
        all_queries()["ts_williams_r"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    n = 14
    for series, g in _per_series(daily):
        hh = g["hc"].rolling(n).max()
        ll = g["lc"].rolling(n).min()
        want = (-100.0 * (hh - g["cc"]) / (hh - ll)).iloc[n - 1 :]
        got = out[out["series"] == series]["williams_r"].to_numpy()
        np.testing.assert_allclose(
            got, np.round(want.to_numpy(), 6), atol=1e-6
        )
        assert ((got <= 0) & (got >= -100)).all()


def test_vortex_matches_textbook(spark, sf_small):
    out = (
        all_queries()["ts_vortex"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    n = 14
    for series, g in _per_series(daily):
        vmp = (g["hc"] - g["lc"].shift(1)).abs()
        vmm = (g["lc"] - g["hc"].shift(1)).abs()
        tr = pd.concat(
            [
                g["hc"] - g["lc"],
                (g["hc"] - g["cc"].shift(1)).abs(),
                (g["lc"] - g["cc"].shift(1)).abs(),
            ],
            axis=1,
        ).max(axis=1)
        # rows 1.. (first bar has no prev), window n
        svp = vmp.iloc[1:].rolling(n).sum()
        svm = vmm.iloc[1:].rolling(n).sum()
        str_ = tr.iloc[1:].rolling(n).sum()
        want_vip = (svp / str_).dropna()
        got = out[out["series"] == series]
        np.testing.assert_allclose(
            got["vi_plus"].to_numpy(),
            np.round(want_vip.to_numpy(), 6),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            got["vi_minus"].to_numpy(),
            np.round((svm / str_).dropna().to_numpy(), 6),
            atol=1e-6,
        )


def test_mfi_matches_textbook(spark, sf_small):
    out = (
        all_queries()["ts_money_flow_index"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    n = 14
    for series, g in _per_series(daily):
        tp3 = g["hc"] + g["lc"] + g["cc"]
        up = (tp3 > tp3.shift(1)).astype(int)
        dn = (tp3 < tp3.shift(1)).astype(int)
        pos = (tp3 * g["vol"] * up).iloc[1:].rolling(n).sum()
        neg = (tp3 * g["vol"] * dn).iloc[1:].rolling(n).sum()
        want = (100.0 * pos / (pos + neg)).dropna()
        got = out[out["series"] == series]["mfi"].to_numpy()
        np.testing.assert_allclose(
            got, np.round(want.to_numpy(), 6), atol=1e-6
        )
        assert ((got >= 0) & (got <= 100)).all()


def test_cmf_matches_textbook(spark, sf_small):
    out = (
        all_queries()["ts_chaikin_money_flow"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    n = 20
    for series, g in _per_series(daily):
        rng = g["hc"] - g["lc"]
        mfv_u = np.where(
            rng > 0,
            np.rint(
                g["vol"] * (2 * g["cc"] - g["hc"] - g["lc"]) * 1e6 / rng
            ),
            0,
        )
        smfv = pd.Series(mfv_u).rolling(n).sum()
        svol = g["vol"].rolling(n).sum()
        want = (smfv / svol / 1e6).dropna()
        got = out[out["series"] == series]["cmf"].to_numpy()
        np.testing.assert_allclose(
            got, np.round(want.to_numpy(), 6), atol=1e-6
        )
        assert ((got >= -1.0 - 1e-9) & (got <= 1.0 + 1e-9)).all()


def test_ulcer_matches_textbook(spark, sf_small):
    out = (
        all_queries()["ts_ulcer_index"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    n = 14
    for series, g in _per_series(daily):
        maxc = g["cc"].rolling(n, min_periods=1).max()
        dd_u = np.rint(1e6 * 100.0 * (g["cc"] - maxc) / maxc)
        ssq = pd.Series(dd_u * dd_u).rolling(n).sum()
        want = (np.sqrt(ssq / n) / 1e6).dropna()
        got = out[out["series"] == series]["ulcer_index"].to_numpy()
        np.testing.assert_allclose(
            got, np.round(want.to_numpy(), 6), atol=1e-6
        )
        assert (got >= 0).all()


def _ewma_ref(arr: np.ndarray, span: int) -> float:
    d = 1.0 - 2.0 / (span + 1.0)
    w = d ** np.arange(len(arr) - 1, -1, -1)
    return float((arr * w).sum() / w.sum())


def test_elder_ray_matches_bounded_ewma(spark, sf_small):
    out = (
        all_queries()["ts_elder_ray"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    win, span = 40, 13
    for series, g in _per_series(daily):
        cc = g["cc"].to_numpy(dtype=float)
        emas = [
            _ewma_ref(cc[max(0, t - win + 1) : t + 1], span)
            for t in range(span - 1, len(cc))
        ]
        got = out[out["series"] == series]
        np.testing.assert_allclose(
            got["ema13"].to_numpy(),
            np.round(np.asarray(emas) / 100.0, 6),
            atol=1e-6,
        )
        # bull >= bear always (high >= low)
        assert (
            got["bull_power"].to_numpy() >= got["bear_power"].to_numpy()
        ).all()


def test_force_index_matches_bounded_ewma(spark, sf_small):
    out = (
        all_queries()["ts_force_index"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    win, span = 40, 13
    for series, g in _per_series(daily):
        raw = ((g["cc"] - g["cc"].shift(1)) * g["vol"]).iloc[1:].to_numpy(
            dtype=float
        )
        # first emitted row is rn == span+1, i.e. the (span-1)-th raw
        # diff (rn counts the pre-diff seed row the query filters)
        want = [
            _ewma_ref(raw[max(0, t - win + 1) : t + 1], span) / 100.0
            for t in range(span - 1, len(raw))
        ]
        got = out[out["series"] == series]["force_index"].to_numpy()
        np.testing.assert_allclose(got, np.round(want, 6), atol=1e-6)


def test_survivorship_invariants(spark, sf_small):
    """The ledger's books must balance: survivor carries the max
    n_chars of its cluster, cluster ids are the min member id,
    removed + 1 == size, and the survivor is a cluster member."""
    out = all_queries()["dedup_survivorship"](spark, sf_small).toPandas()
    cc = (
        all_queries()["dedup_clusters"](spark, sf_small)
        .toPandas()
        .groupby("cluster_id")
    )
    docs = pd.read_parquet(f"{sf_small}/documents.parquet").set_index(
        "doc_id"
    )
    assert len(out) == cc.ngroups
    for row in out.itertuples():
        members = cc.get_group(row.cluster_id)["doc_id"].tolist()
        assert row.survivor_doc_id in members
        assert row.cluster_size == len(members)
        assert row.n_removed == len(members) - 1
        chars = docs.loc[members, "n_chars"]
        assert row.chars_kept == chars.max()
        assert row.chars_kept + row.chars_removed == chars.sum()
        assert row.cluster_id == min(members)


def test_burstiness_flags_topical_tokens(spark, sf_small):
    """VMR must exceed 1 for tokens concentrated in few docs and sit
    near the Poisson line for evenly-spread ones; exact identity
    checked against a pandas recompute."""
    out = all_queries()["text_burstiness"](spark, sf_small).toPandas()
    docs = pd.read_parquet(f"{sf_small}/documents.parquet")
    n_docs = len(docs)
    toks = (
        docs.assign(t=docs["text"].str.split(" "))
        .explode("t")
        .query("t != ''")
        .groupby(["doc_id", "t"])
        .size()
        .rename("c")
        .reset_index()
    )
    ref = toks.groupby("t").agg(
        rdf=("c", "size"), tot=("c", "sum"), sumsq=("c", lambda s: (s * s).sum())
    )
    ref = ref[ref["rdf"] >= 10]
    merged = out.set_index("token").join(ref, how="inner")
    assert len(merged) == len(out) == len(ref)
    want = (n_docs * merged["sumsq"] - merged["tot"] ** 2) / (
        n_docs * merged["tot"]
    )
    np.testing.assert_allclose(
        merged["vmr"].to_numpy(), np.round(want.to_numpy(), 6), atol=1e-6
    )
    assert (merged["vmr"] > 0).all()


def test_yule_k_orders_repetition(spark, sf_small):
    """K grows with repetition: per-doc K recomputed in pandas must
    match, and a doc of one repeated token must out-K a same-length
    all-distinct doc (checked on the formula directly)."""
    out = (
        all_queries()["text_yule_k"](spark, sf_small)
        .toPandas()
        .set_index("doc_id")
    )
    docs = pd.read_parquet(f"{sf_small}/documents.parquet")
    for row in docs.head(40).itertuples():
        toks = [t for t in row.text.split(" ") if t]
        n = len(toks)
        if n <= 1:
            assert pd.isna(out.loc[row.doc_id, "yule_k"])
            continue
        counts = pd.Series(toks).value_counts()
        k = 10000.0 * (float((counts**2).sum()) - n) / (float(n) * n)
        assert abs(out.loc[row.doc_id, "yule_k"] - round(k, 6)) < 1e-6

    def yule(tokens):
        c = pd.Series(tokens).value_counts()
        n = len(tokens)
        return 10000.0 * (float((c**2).sum()) - n) / (float(n) * n)

    assert yule(["a"] * 50) > yule([f"w{i}" for i in range(50)])


def _pure_python_sar(g: pd.DataFrame):
    """Wilder's SAR with the two-bar clamp, run step by step."""
    hc = g["hc"].to_numpy()
    lc = g["lc"].to_numpy()
    cc = g["cc"].to_numpy()
    out = []
    if len(cc) < 2:
        return out
    trend = "up" if cc[1] >= cc[0] else "down"
    sar = float(lc[0] if trend == "up" else hc[0])
    ep = int(hc[1] if trend == "up" else lc[1])
    stp = 1
    out.append((trend, sar, ep, stp, False))
    for t in range(2, len(cc)):
        raw = sar + (stp * 0.02) * (ep - sar)
        if trend == "up":
            clamped = min(raw, lc[t - 1], lc[t - 2])
            if lc[t] < clamped:
                trend, sar, ep, stp, rev = "down", float(ep), int(lc[t]), 1, True
            else:
                sar = clamped
                if hc[t] > ep:
                    stp = min(stp + 1, 10)
                ep = max(ep, int(hc[t]))
                rev = False
        else:
            clamped = max(raw, hc[t - 1], hc[t - 2])
            if hc[t] > clamped:
                trend, sar, ep, stp, rev = "up", float(ep), int(hc[t]), 1, True
            else:
                sar = clamped
                if lc[t] < ep:
                    stp = min(stp + 1, 10)
                ep = min(ep, int(lc[t]))
                rev = False
        out.append((trend, sar, ep, stp, rev))
    return out


def test_parabolic_sar_matches_textbook(spark, sf_small):
    out = (
        all_queries()["ts_parabolic_sar"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    for series, g in _per_series(daily):
        want = _pure_python_sar(g)
        got = out[out["series"] == series].reset_index(drop=True)
        assert len(got) == len(want)
        for i, (trend, sar, ep, stp, rev) in enumerate(want):
            assert got.loc[i, "trend"] == trend, (series, i)
            assert abs(got.loc[i, "sar_cents"] - sar) < 1e-5, (series, i)
            assert got.loc[i, "ep_cents"] == ep
            assert abs(got.loc[i, "af"] - stp * 0.02) < 1e-9
            assert bool(got.loc[i, "reversed"]) == rev
        # SAR sits outside the trend side's range: below lows in an
        # uptrend (after the seed), above highs in a downtrend
        assert (got["trend"].isin(["up", "down"])).all()


def test_streaming_parabolic_sar_matches_batch(spark, sf_small, tmp_path):
    """I39: the SAR recursion (including a mid-stream reversal and
    the two-bar clamp state) crosses a micro-batch boundary and
    equals the batch ts_parabolic_sar row-for-row."""
    import time as _t

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        streaming_parabolic_sar,
    )

    daily = _daily_ohlcv(spark, sf_small).select(
        "series", "day_s", "hc", "lc", "cc"
    )
    split_day = daily.agg(
        F.expr("percentile_approx(day_s, 0.5)").alias("m")
    ).first()["m"]
    log_dir = tmp_path / "sar_log"
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
        streaming_parabolic_sar(stream)
        .writeStream.format("memory")
        .queryName("sar_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["series"], r["day_s"]): (
            r["close_cents"], r["sar_cents"], r["trend"],
            r["ep_cents"], r["af"], r["reversed"],
        )
        for r in spark.sql("SELECT * FROM sar_stream").collect()
    }
    want = {
        (r["series"], r["day_s"]): (
            r["close_cents"], r["sar_cents"], r["trend"],
            r["ep_cents"], r["af"], r["reversed"],
        )
        for r in all_queries()["ts_parabolic_sar"](spark, sf_small).collect()
    }
    assert len(got) == len(want) > 0
    assert any(g[5] for g in got.values())  # a reversal actually fired
    for k, g in got.items():
        w = want[k]
        assert g[0] == w[0] and g[2] == w[2] and g[3] == w[3]
        np.testing.assert_allclose(round(g[1] * 1e6) / 1e6, w[1], atol=1e-9)
        np.testing.assert_allclose(g[4], w[4], atol=1e-9)
        assert bool(g[5]) == bool(w[5])


def test_cci_matches_textbook(spark, sf_small):
    """CCI recomputed the classic way (TP, SMA, mean deviation in
    floats) must equal the integer-algebra form."""
    out = (
        all_queries()["ts_cci"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    n = 20
    for series, g in _per_series(daily):
        tp = (g["hc"] + g["lc"] + g["cc"]) / 3.0
        sma = tp.rolling(n).mean()
        md = tp.rolling(n).apply(
            lambda w: np.abs(w - w.mean()).mean(), raw=True
        )
        want = ((tp - sma) / (0.015 * md)).iloc[n - 1 :]
        got = out[out["series"] == series]["cci"].to_numpy()
        np.testing.assert_allclose(
            got, np.round(want.to_numpy(), 6), atol=2e-6
        )


def test_dpo_matches_textbook(spark, sf_small):
    out = (
        all_queries()["ts_dpo"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    n, shift = 10, 6
    for series, g in _per_series(daily):
        sma = g["cc"].rolling(n).mean()
        want = ((g["cc"] - sma.shift(shift)) / 100.0).dropna()
        got = out[out["series"] == series]["dpo"].to_numpy()
        np.testing.assert_allclose(
            got, np.round(want.to_numpy(), 6), atol=1e-6
        )


def test_beam_graph_banded_build_recall(spark, sf_small):
    """r10 rework evidence for ann_graph_beam_search: the banded-LSH
    candidate generation must retain most of the EXACT top-deg kNN
    graph's edges (strong edges collide with high probability), and
    the candidate set must be a strict subset of all pairs (the
    pruning that makes the build survive 100x)."""
    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.operators.ann import dot
    from timescaledb_event_streamer_spark.plans import queries_round9 as r9
    from timescaledb_event_streamer_spark.sources.tables import load

    emb = load(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    nodes = emb.filter(F.col("vec_id") % r9._BEAM_NODE_MOD == 0)
    n = nodes.count()

    # exact top-deg edges (brute force on the tiny sf0.001 shard)
    import numpy as np_

    rows = nodes.collect()
    ids = np_.array([r["vec_id"] for r in rows])
    V = np_.array([r["v"] for r in rows])
    Vn = V / np_.linalg.norm(V, axis=1, keepdims=True)
    sims = Vn @ Vn.T
    np_.fill_diagonal(sims, -2.0)
    exact_edges = set()
    for i in range(len(ids)):
        order = np_.lexsort((ids, -np_.round(sims[i], 6)))
        for j in order[: r9._BEAM_DEG]:
            exact_edges.add((int(ids[i]), int(ids[j])))

    # banded build straight from the registered query's plan pieces
    planes = r9._beam_planes()
    bands = []
    for bi in range(r9._BEAM_BANDS):
        bucket = F.lit(0).cast("long")
        for j in range(r9._BEAM_BAND_BITS):
            plane = F.array(
                *[F.lit(c) for c in planes[bi * r9._BEAM_BAND_BITS + j]]
            )
            bucket = bucket.bitwiseOR(
                F.shiftleft((dot(F.col("v"), plane) > 0).cast("long"), j)
            )
        bands.append(
            F.struct(F.lit(bi).alias("band"), bucket.alias("bucket"))
        )
    banded = nodes.select(
        F.col("vec_id").alias("vid"),
        F.explode(F.array(*bands)).alias("bb"),
    ).select("vid", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") != F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("src"), F.col("b.vid").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    cand_pairs = {(r["src"], r["dst"]) for r in cand.collect()}

    # pruning: strictly fewer candidates than all ordered pairs
    assert len(cand_pairs) < n * (n - 1)
    # recall of the exact graph's edges inside the candidate set.
    # This corpus's top-5 neighbors sit at moderate cosine (~0.4-0.6
    # -> per-plane collision p ~= 1 - theta/pi ~= 0.6), so the
    # 8-band/4-bit OR-construction retains 1-(1-p^4)^8 ~= 0.65 of
    # exact edges — measured 0.644. That IS the banded graph the
    # oracle certifies end-to-end; the property pinned here is that
    # the banding keeps the majority of strong edges while pruning
    # the pair space (graph routing needs connectivity, not the
    # exact kNN edge set — the query's in_exact_topk column shows
    # the beam still reaching true top-k neighbors).
    kept = sum(1 for e in exact_edges if e in cand_pairs)
    recall = kept / len(exact_edges)
    assert recall >= 0.55, f"banded edge recall {recall:.3f}"


def test_trix_matches_chained_ewma(spark, sf_small):
    out = (
        all_queries()["ts_trix"](spark, sf_small)
        .toPandas()
        .sort_values(["series", "day_s"])
    )
    daily = _daily_close(spark, sf_small)
    win, span = 40, 15
    for series, g in _per_series(daily):
        x = g["cc"].to_numpy(dtype=float)
        for _stage in range(3):
            x = np.array(
                [
                    _ewma_ref(x[max(0, t - win + 1) : t + 1], span)
                    for t in range(len(x))
                ]
            )
        trix = 10000.0 * (x[1:] - x[:-1]) / x[:-1]
        got = out[out["series"] == series]
        np.testing.assert_allclose(
            got["trix"].to_numpy(),
            np.round(trix[span - 1 :], 6),
            atol=1e-6,
        )


def test_shard_planner_balances_tokens(spark, sf_small):
    """Serpentine assignment must balance better than the worst
    shard being 2x the ideal, cover every doc exactly once, and
    shares must sum to 1."""
    out = all_queries()["corpus_shard_planner"](spark, sf_small).toPandas()
    docs = pd.read_parquet(f"{sf_small}/documents.parquet")
    total = sum(len([t for t in s.split(" ") if t]) for s in docs["text"])
    assert out["shard_tokens"].sum() == total
    assert out["n_docs"].sum() == len(docs)
    assert len(out) == 8
    assert abs(out["token_share"].sum() - 1.0) < 1e-5
    assert (out["skew_vs_ideal"] < 1.1).all()  # near-balanced
    assert (out["skew_vs_ideal"] > 0.9).all()


def test_label_centroid_confusion_diagonal(spark, sf_small):
    """Sanity on the audit itself: every vector lands somewhere
    (matrix mass == corpus size), row shares sum to 1 per true
    label, and the synthetic labels are at least better than random
    (diagonal mass > 1/n_labels)."""
    out = all_queries()["embedding_label_centroid_confusion"](
        spark, sf_small
    ).toPandas()
    emb = pd.read_parquet(f"{sf_small}/embeddings.parquet")
    assert out["n"].sum() == len(emb)
    shares = out.groupby("true_label")["row_share"].sum()
    assert ((shares - 1.0).abs() < 1e-4).all()
    diag = out[out["on_diagonal"]]["n"].sum() / out["n"].sum()
    assert diag > 1.0 / emb["label"].nunique()
