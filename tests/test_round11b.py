"""Round-11b components: planted-value pins for the B125-B130
indicator family, E31 binary-Hamming ANN, F56 Heaps fit, and the
G22 Ogg probe golden/hostile battery."""

from __future__ import annotations

import datetime as _dt
import math

from timescaledb_event_streamer_spark.plans.registry import all_queries


def _plant_events(spark, tmp_path, rows):
    """rows: (event_id, day_offset, event_type, value, vol)"""
    base = _dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [
            (i, base + _dt.timedelta(days=d, hours=1 + (i % 3)), 1, et, v,
             '{"k": %d}' % k)
            for (i, d, et, v, k) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _plant_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, source)"""
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for (i, t, s) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _plant_embeddings(spark, tmp_path, rows):
    """rows: (vec_id, vector, label)"""
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    return str(tmp_path)


def test_ultimate_oscillator_steady_rise_is_100(spark, tmp_path):
    """One event per day, strictly rising: BP == TR every day, so
    every average is 1 and UO == 100 * (4+2+1)/7 == 100 exactly."""
    rows = [(i, i, "m", 10.0 + i, 1) for i in range(25)]
    sf = _plant_events(spark, tmp_path, rows)
    out = all_queries()["ts_ultimate_oscillator"](spark, sf).collect()
    assert len(out) == 25 - 21 + 1
    for r in out:
        assert r["bp_sum20"] == r["tr_sum20"] > 0
        assert r["uo"] == 100.0


def test_ease_of_movement_constant_midpoint_is_zero(spark, tmp_path):
    """H/L fixed at 12/10 every day: the midpoint never moves, so
    every EMV term and the SMA are exactly 0."""
    rows = []
    for d in range(20):
        rows.append((2 * d, d, "m", 10.0, 1))
        rows.append((2 * d + 1, d, "m", 12.0, 1))
    sf = _plant_events(spark, tmp_path, rows)
    out = all_queries()["ts_ease_of_movement"](spark, sf).collect()
    assert len(out) == 20 - 15 + 1
    for r in out:
        assert r["emv_num"] == 0
        assert r["emv"] == 0.0 and r["emv_sma"] == 0.0


def test_kst_constant_close_is_zero(spark, tmp_path):
    """Constant close: every ROC is 0, every SMA is 0, KST == 0."""
    rows = [(i, i, "m", 42.0, 1) for i in range(25)]
    sf = _plant_events(spark, tmp_path, rows)
    out = all_queries()["ts_kst"](spark, sf).collect()
    assert len(out) == 25 - 14 - 8
    for r in out:
        assert r["kst"] == 0.0 and r["kst_signal"] == 0.0


def test_pvt_hand_computed(spark, tmp_path):
    """3 days, hand math: term = vol * delta / prev_close."""
    rows = [
        (0, 0, "m", 10.0, 1),
        (1, 1, "m", 12.0, 7),
        (2, 2, "m", 9.0, 3),
    ]
    sf = _plant_events(spark, tmp_path, rows)
    out = sorted(
        all_queries()["ts_pvt"](spark, sf).collect(),
        key=lambda r: r["day_s"],
    )
    assert len(out) == 2
    t1 = 7 * (1200 - 1000) / 1000.0   # 1.4
    t2 = 3 * (900 - 1200) / 1200.0    # -0.75
    assert out[0]["pvt_term"] == round(t1, 6)
    assert out[0]["pvt"] == round(t1, 6)
    assert out[1]["pvt_term"] == round(t2, 6)
    assert out[1]["pvt"] == round(t1 + t2, 6)


def test_balance_of_power_full_conviction_is_one(spark, tmp_path):
    """Every day opens at the low and closes at the high: BOP == 1
    exactly, and so does its SMA."""
    rows = []
    for d in range(16):
        rows.append((2 * d, d, "m", 10.0, 1))   # open (and low)
        rows.append((2 * d + 1, d, "m", 20.0, 1))  # close (and high)
    sf = _plant_events(spark, tmp_path, rows)
    out = all_queries()["ts_balance_of_power"](spark, sf).collect()
    assert len(out) == 16 - 14 + 1
    for r in out:
        assert r["co_cents"] == r["range_cents"] == 1000
        assert r["bop"] == 1.0 and r["bop_sma"] == 1.0


def test_tsi_steady_rise_is_100(spark, tmp_path):
    """Strictly rising close: momentum == |momentum| every day, the
    double-smoothed chains are identical, TSI == 100 exactly."""
    rows = [(i, i, "m", 10.0 + 2 * i, 1) for i in range(20)]
    sf = _plant_events(spark, tmp_path, rows)
    out = all_queries()["ts_tsi"](spark, sf).collect()
    assert len(out) == 20 - 15 + 1
    for r in out:
        assert r["tsi"] == 100.0


def test_hamming_topk_planted_sketches(spark, tmp_path):
    """Sign-planted vectors give exact Hamming distances: the query
    (all +), a same-sign vector (0), a half-flipped one (32), an
    all-flipped one (64); rerank orders by the exact dot."""
    dim = 64
    rows = [
        (0, [1.0] * dim, 0),
        (1, [0.5] * dim, 0),                       # hamming 0, dot 32
        (2, [-1.0] * 32 + [1.0] * 32, 0),          # hamming 32, dot 0
        (3, [-1.0] * dim, 0),                      # hamming 64, dot -64
    ]
    sf = _plant_embeddings(spark, tmp_path, rows)
    out = {r["vec_id"]: r for r in
           all_queries()["ann_hamming_topk"](spark, sf).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["hamming"] == 0 and out[0]["exact_dot"] == 64.0
    assert out[1]["hamming"] == 0 and out[1]["exact_dot"] == 32.0
    assert out[2]["hamming"] == 32 and out[2]["exact_dot"] == 0.0
    assert out[3]["hamming"] == 64 and out[3]["exact_dot"] == -64.0
    assert all(r["in_exact_topk"] for r in out.values())


def test_heaps_fit_matches_brute_force(spark, tmp_path):
    """5 docs -> buckets 0/2/4/6/8; recompute the bigram checkpoint
    table and the log-log OLS in plain Python and pin every row."""
    texts = [
        "a b a b",       # bigrams: a b, b a, a b
        "c d",           # c d
        "a b c",         # a b, b c
        "e f g h",       # e f, f g, g h
        "a b",           # a b
    ]
    sf = _plant_docs(
        spark, tmp_path, [(i, t, "s") for i, t in enumerate(texts)]
    )
    out = sorted(
        all_queries()["text_heaps_fit"](spark, sf).collect(),
        key=lambda r: r["checkpoint"],
    )
    # brute force
    m = 5
    per, first = {}, {}
    for i, t in enumerate(texts):
        b = i * 10 // m
        ws = t.split()
        for j in range(len(ws) - 1):
            big = f"{ws[j]} {ws[j + 1]}"
            per[b] = per.get(b, 0) + 1
            first.setdefault(big, b)
            first[big] = min(first[big], b)
    cks = sorted(per)
    pts = []
    for k in cks:
        n = sum(v for b, v in per.items() if b <= k)
        v = sum(1 for fb in first.values() if fb <= k)
        pts.append((k, n, v))
    xs = [math.log(n) for _, n, _ in pts]
    ys = [math.log(v) for _, _, v in pts]
    nn = float(len(pts))
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    beta = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    kk = math.exp((sy - beta * sx) / nn)
    assert [r["checkpoint"] for r in out] == cks
    for r, (k, n, v) in zip(out, pts):
        assert (r["n_tokens"], r["vocab"]) == (n, v)
        assert abs(r["heaps_beta"] - beta) < 1e-5
        assert abs(r["heaps_k"] - kk) < 1e-5
        assert abs(r["fitted_vocab"] - kk * n**beta) < 1e-4


def test_ogg_probe_golden_and_hostile(spark):
    """Golden Ogg pages built independently with struct-style byte
    packing, plus version/truncation/foreign-magic hostiles and a
    2-segment lacing table exercising the dynamic packet offset."""
    from timescaledb_event_streamer_spark.operators.ogg_probe import (
        parse_ogg_headers,
    )

    def probe(payload: bytes):
        df = spark.createDataFrame(
            [(1, payload)], "media_id long, payload binary"
        )
        return parse_ogg_headers(df).collect()[0]

    def page(packet: bytes, segs=None, version=0, htype=2, serial=77):
        lacing = bytes(segs) if segs else bytes([len(packet)])
        return (
            b"OggS"
            + bytes([version, htype])
            + b"\x00" * 8
            + serial.to_bytes(4, "little")
            + (5).to_bytes(4, "little")
            + b"\x00" * 4
            + bytes([len(lacing)])
            + lacing
            + packet
        )

    opus = (
        b"OpusHead" + b"\x01" + bytes([2])
        + (312).to_bytes(2, "little")
        + (48000).to_bytes(4, "little")
        + b"\x00\x00" + b"\x00"
    )
    r = probe(page(opus))
    assert r.is_ogg and r.is_bos and r.serial == 77 and r.page_seq == 5
    assert (r.codec, r.channels, r.sample_rate) == ("opus", 2, 48000)
    assert r.preskip == 312 and r.bitrate_nominal_bps is None

    vorbis = (
        b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([1])
        + (44100).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (128000).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + b"\xb8\x01"
    )
    rv = probe(page(vorbis))
    assert (rv.codec, rv.channels, rv.sample_rate) == ("vorbis", 1, 44100)
    assert rv.bitrate_nominal_bps == 128000 and rv.preskip is None

    # 2-segment lacing: packet still starts right after the table
    r2 = probe(page(opus, segs=[10, len(opus) - 10]))
    assert r2.n_segments == 2 and r2.codec == "opus" and r2.channels == 2

    # hostile: nonzero stream-structure version
    rb = probe(page(opus, version=1))
    assert rb.is_ogg is False and rb.codec is None

    # hostile: unknown packet magic -> ogg yes, codec null
    ru = probe(page(b"XXXXXXXX" + b"\x00" * 12))
    assert ru.is_ogg is True and ru.codec is None and ru.channels is None

    # truncated after the fixed header: still an Ogg page, codec
    # unreadable -> null fields, no error
    rt = probe(page(opus)[:30])
    assert rt.is_ogg is True and rt.codec is None

    # truncated inside the fixed header
    rt2 = probe(page(opus)[:10])
    assert rt2.is_ogg is False

    # not ogg at all
    rn = probe(b"\x89PNG" + b"\x00" * 60)
    assert rn.is_ogg is False and rn.serial is None


def test_id3_frames_golden_and_hostile(spark):
    """Golden ID3v2.3 tag built independently byte-by-byte, plus
    oversize-frame / UTF-16 / padding / duplicate-frame hostiles."""
    from timescaledb_event_streamer_spark.operators.mp3_probe import (
        parse_id3_frames,
    )

    def probe(payload: bytes):
        df = spark.createDataFrame(
            [(1, payload)], "media_id long, payload binary"
        )
        return parse_id3_frames(df).collect()[0]

    def frame(fid: bytes, text: bytes, enc: int = 0) -> bytes:
        body = bytes([enc]) + text
        return fid + len(body).to_bytes(4, "big") + b"\x00\x00" + body

    def tag(frames: bytes, pad: int = 0) -> bytes:
        n = len(frames) + pad
        ss = bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
        )
        return b"ID3\x03\x00\x00" + ss + frames + b"\x00" * pad

    g = tag(
        frame(b"TIT2", b"Blue Train")
        + frame(b"TPE1", b"John Coltrane")
        + frame(b"TALB", b"Blue Train")
        + frame(b"TRCK", b"1"),
        pad=7,
    )
    r = probe(g + b"\xff\xfb\xa4\x00")
    assert r.is_id3 and r.n_frames == 4
    assert (r.title, r.artist) == ("Blue Train", "John Coltrane")
    assert (r.album, r.track) == ("Blue Train", "1")

    # duplicate TIT2: first one wins
    rd = probe(tag(frame(b"TIT2", b"first") + frame(b"TIT2", b"second")))
    assert rd.title == "first" and rd.n_frames == 2

    # UTF-16 frame counts but reads null (honest encoding gate)
    ru = probe(tag(frame(b"TIT2", "x".encode("utf-16-le"), enc=1)
                   + frame(b"TRCK", b"9")))
    assert ru.n_frames == 2 and ru.title is None and ru.track == "9"

    # hostile: frame size runs past the declared tag end -> stop
    bad = frame(b"TIT2", b"ok")
    oversz = bad[:4] + (10_000).to_bytes(4, "big") + bad[8:]
    ro = probe(tag(oversz + frame(b"TRCK", b"2")))
    assert ro.n_frames == 0 and ro.title is None

    # padding-only tag
    rp = probe(tag(b"", pad=16))
    assert rp.is_id3 and rp.n_frames == 0

    # not id3
    rn = probe(b"OggS" + b"\x00" * 30)
    assert rn.is_id3 is False and rn.n_frames is None


def test_streaming_pvt_matches_batch_b128(spark, sf_small, tmp_path):
    """I44: daily close/volume partials in two time-ordered
    micro-batches so the cumulative AND the lagged close cross a
    batch boundary; result must equal batch ts_pvt row-for-row."""
    import time as _t

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        streaming_pvt,
    )

    daily = _daily_ohlcv(spark, sf_small).select(
        "series", "day_s", "cc", "vol"
    )
    split_day = daily.agg(
        F.expr("percentile_approx(day_s, 0.5)")
    ).first()[0]
    log_dir = tmp_path / "pvt_log"
    log_dir.mkdir()
    daily.filter(F.col("day_s") <= split_day).coalesce(1).write.parquet(
        str(log_dir / "b0")
    )
    _t.sleep(1.1)
    daily.filter(F.col("day_s") > split_day).coalesce(1).write.parquet(
        str(log_dir / "b1")
    )
    stream = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(log_dir))
    )
    q = (
        streaming_pvt(stream)
        .writeStream.format("memory")
        .queryName("pvt_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["series"], r["day_s"]): (r["pvt_num"], r["pvt_term"], r["pvt"])
        for r in spark.sql("SELECT * FROM pvt_stream").collect()
    }
    want = {
        (r["series"], r["day_s"]): (r["pvt_num"], r["pvt_term"], r["pvt"])
        for r in all_queries()["ts_pvt"](spark, sf_small).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want


def test_hamming_blocking_planted(spark, tmp_path):
    """Three vectors share the 12-bit sign prefix (two same-label
    with cosine 1, one other-label with cosine -0.625); a fourth
    with a flipped first sign lands in its own block and emits no
    row. Hand-pinned masses."""
    dim = 64
    rows = [
        (0, [1.0] * dim, 0),
        (1, [1.0] * dim, 0),
        (2, [1.0] * 12 + [-1.0] * 52, 1),
        (3, [-1.0] + [1.0] * 63, 0),
    ]
    sf = _plant_embeddings(spark, tmp_path, rows)
    out = all_queries()["dedup_hamming_blocking"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["block_size"] == 3 and r["candidate_pairs"] == 3
    assert r["same_label_pairs"] == 1
    assert r["label_precision"] == round(1 / 3, 6)
    # cos(v0,v1)=1, cos(v0,v2)=cos(v1,v2)=-40/64
    assert r["cos_mass_micro"] == 1_000_000 - 2 * 625_000
    assert r["mean_cos"] == round((1 - 2 * 0.625) / 3, 6)


def test_connors_rsi_planted(spark, tmp_path):
    """Strictly rising close by a GROWING step: every delta positive
    -> RSI3 == 100, one unbroken up-run -> streak == day index and
    streak deltas all +1 -> streak RSI == 100; returns strictly
    increase (step grows faster than the base) -> percent rank ==
    100; CRSI == 100 exactly."""
    vals, v = [], 100.0
    for i in range(16):
        v += 1.0 + i * 0.5   # growing step: return strictly rises
        vals.append(v)
    rows = [(i, i, "m", vals[i], 1) for i in range(16)]
    sf = _plant_events(spark, tmp_path, rows)
    out = sorted(
        all_queries()["ts_connors_rsi"](spark, sf).collect(),
        key=lambda r: r["day_s"],
    )
    assert len(out) == 16 - 12 + 1
    for r in out:
        assert r["rsi3"] == 100.0 and r["streak_rsi2"] == 100.0
        assert r["pct_rank"] == 100.0
        assert r["crsi"] == 100.0
        assert r["streak"] > 0


def test_streaming_media_router_matches_batch_g19(spark, sf_small, tmp_path):
    """I45: the same mixed eight-format payload frame fed as two
    micro-batches through the stateless streaming router must equal
    the batch router's probe rows for those payloads exactly."""
    import time as _t

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.streaming.pipelines import (
        streaming_media_router,
    )

    batch = all_queries()["media_container_router"](spark, sf_small)
    want = {r["media_id"]: tuple(r) for r in batch.collect()}

    # rebuild the same mixed payloads the batch query synthesizes
    from timescaledb_event_streamer_spark.operators.ebml_probe import (
        synthesize_ebml_headers,
    )
    from timescaledb_event_streamer_spark.operators.mp3_probe import (
        synthesize_mp3_headers,
    )
    from timescaledb_event_streamer_spark.operators.mp4_probe import (
        synthesize_mp4_headers,
    )
    from timescaledb_event_streamer_spark.operators.multimodal import (
        synthesize_jpeg_headers,
        synthesize_media_headers,
    )
    from timescaledb_event_streamer_spark.operators.ogg_probe import (
        synthesize_ogg_headers,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    ev = load(spark, sf_small, "events")
    rid = F.col("event_id") % 8
    mixed = (
        synthesize_media_headers(ev.filter(rid <= 2))
        .unionByName(synthesize_jpeg_headers(ev.filter(rid == 3)))
        .unionByName(synthesize_mp4_headers(ev.filter(rid == 4)))
        .unionByName(synthesize_mp3_headers(ev.filter(rid == 5)))
        .unionByName(synthesize_ebml_headers(ev.filter(rid == 6)))
        .unionByName(synthesize_ogg_headers(ev.filter(rid == 7)))
    )
    log_dir = tmp_path / "media_log"
    log_dir.mkdir()
    mixed.filter(F.col("media_id") % 2 == 0).coalesce(1).write.parquet(
        str(log_dir / "b0")
    )
    _t.sleep(1.1)
    mixed.filter(F.col("media_id") % 2 == 1).coalesce(1).write.parquet(
        str(log_dir / "b1")
    )
    stream = (
        spark.readStream.schema(mixed.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(log_dir))
    )
    q = (
        streaming_media_router(stream)
        .writeStream.format("memory")
        .queryName("media_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["media_id"]: tuple(r)
        for r in spark.sql("SELECT * FROM media_stream").collect()
    }
    assert len(got) == len(want) > 0
    assert got == want


def test_decontamination_near_planted(spark, tmp_path):
    """doc 0 (benchmark: id % 7 == 0) and doc 8 (train) share all
    but one word -> banded collision with high est-Jaccard; doc 9
    is unrelated -> no row. doc 7 is ALSO benchmark, so its copy of
    the text emits no train-side row."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    rows = [
        (0, base, "s"),
        (7, base, "s"),                          # benchmark too
        (8, near, "s"),                          # contaminated train doc
        (9, "one two three four five six seven", "s"),
    ]
    sf = _plant_docs(spark, tmp_path, rows)
    out = all_queries()["text_decontamination_near"](spark, sf).collect()
    got = {(r["train_doc"], r["bench_doc"]) for r in out}
    assert got == {(8, 0), (8, 7)}
    for r in out:
        assert r["contaminated"] is True
        assert r["est_jaccard"] >= 0.5


def test_wal_growth_forecast_linear(spark, tmp_path):
    """One event per second with LSN == elapsed seconds: a perfect
    line, so the OLS rate is exactly 3600 LSN/hour; one table, so
    it pins the slot and retains exactly its own pending tail."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    n = 40
    spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=i), 1, "m", 1.0, '{"k": 1}')
            for i in range(n)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = all_queries()["cdc_wal_growth_forecast"](
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == n and r["head_lsn"] == n - 1
    assert r["rate_lsn_per_hour"] == 3600.0
    # ack position = ceil(0.9*40) = 36th event (id 35); retained =
    # events with id > 35 -> 4
    assert r["retained_by_slot"] == 4 and r["total_retained"] == 4
    assert r["breach_within_24h"] is False


def test_id3_seam_matches_catalyst_fold(spark, sf_small):
    """The r11 Arrow ID3 walk must be row-identical to the Catalyst
    fold on the synthesized corpus and on hostile payloads — or fail
    the row in both (strict ANSI decode)."""
    import random

    from timescaledb_event_streamer_spark.operators.mp3_probe import (
        _parse_id3_frames_catalyst,
        parse_id3_frames,
        synthesize_id3_frames,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    media = synthesize_id3_frames(load(spark, sf_small, "events").limit(128))
    got = sorted(map(tuple, parse_id3_frames(media).collect()))
    want = sorted(map(tuple, _parse_id3_frames_catalyst(media).collect()))
    assert got == want and len(got) == 128

    base = bytes(media.limit(1).collect()[0]["payload"])
    rng = random.Random(11)
    n_ok = n_both = 0
    for i in range(16):
        b2 = bytearray(base)
        k = rng.randrange(4)
        if k == 0:
            b2 = b2[: rng.randrange(0, len(b2))]
        elif k == 1:
            for _ in range(rng.randrange(1, 8)):
                b2[rng.randrange(len(b2))] = rng.randrange(256)
        elif k == 2:
            b2 = bytearray(b"ID3") + bytearray(
                rng.randrange(256) for _ in range(rng.randrange(0, 60))
            )
        else:
            b2 = bytearray(rng.randrange(256) for _ in range(rng.randrange(0, 40)))
        df = spark.createDataFrame([(i, bytes(b2))], "media_id long, payload binary")
        try:
            cat, ce = sorted(map(tuple, _parse_id3_frames_catalyst(df).collect())), False
        except Exception:
            cat, ce = None, True
        try:
            new, ne = sorted(map(tuple, parse_id3_frames(df).collect())), False
        except Exception:
            new, ne = None, True
        assert ce == ne, f"raise parity on {bytes(b2).hex()}"
        if ce:
            n_both += 1
        else:
            assert cat == new, f"row parity on {bytes(b2).hex()}"
            n_ok += 1
    assert n_ok > 0
