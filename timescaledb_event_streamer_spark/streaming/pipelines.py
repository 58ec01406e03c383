"""Streaming operators (SURVEY.md §2.I): the reference's
resolve->wrap->filter->route->publish pipeline as Structured
Streaming, plus the continuous-aggregate and keyed-state paths.

Scale notes: watermarks bound all state; the latest-state operator
keys state by (relation, key) — the same layout as a compacted
changelog topic — and applyInPandasWithState processes Arrow
batches, not rows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from timescaledb_event_streamer_spark.catalog.naming import DEFAULT_PREFIX, event_topic
from timescaledb_event_streamer_spark.catalog.tablefilter import TableFilter
from timescaledb_event_streamer_spark.cdc.envelope import SOURCE_SCHEMA, derive_op, ts_ms


def streaming_envelope(events: DataFrame, prefix: str = DEFAULT_PREFIX) -> DataFrame:
    """Stateless envelope for the streaming phase (replica identity
    DEFAULT: no before image, so no keyed state needed). Identical
    column contract to cdc/envelope.stream_envelope."""
    op = derive_op(F.col("event_id"))
    is_delete = op == "d"
    return events.select(
        event_topic(F.lit(SOURCE_SCHEMA), F.col("event_type"), prefix).alias("topic"),
        op.alias("op"),
        F.lit(SOURCE_SCHEMA).alias("source_schema"),
        F.col("event_type").alias("source_table"),
        F.col("event_id").alias("lsn"),
        ts_ms(F.col("ts")).alias("ts_ms"),
        F.col("ts").alias("ts"),
        F.col("user_id").alias("key_user_id"),
        F.when(~is_delete, F.col("value")).alias("after_value"),
        F.when(~is_delete, F.col("props")).alias("after_props"),
    )


def filtered_routed(
    events: DataFrame,
    table_filter: TableFilter | None = None,
    prefix: str = DEFAULT_PREFIX,
) -> DataFrame:
    """Full pipeline: envelope -> table filter -> topic routing
    (resolver + eventfiltering + namingstrategy in one plan)."""
    env = streaming_envelope(events, prefix)
    if table_filter is not None:
        env = env.filter(
            table_filter.column(F.col("source_schema"), F.col("source_table"))
        )
    return env


def streaming_cagg(
    events: DataFrame, bucket: str = "1 hour", watermark: str = "1 day"
) -> DataFrame:
    """Continuous aggregate in streaming mode: watermarked tumbling
    window per relation. Late data beyond the watermark is dropped —
    the same refresh-lag contract a cagg materializer has."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", bucket).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("bucket"),
            "event_type",
            "n",
            "sum_value",
        )
    )


_STATE_SCHEMA = "last_lsn LONG, last_value DOUBLE, last_ts TIMESTAMP"
_OUT_SCHEMA = (
    "event_type STRING, user_id LONG, last_lsn LONG, last_value DOUBLE, last_ts TIMESTAMP"
)


def _latest_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last_lsn, last_value, last_ts = (
        state.get if state.exists else (None, None, None)
    )
    for pdf in pdfs:
        idx = pdf["event_id"].idxmax()
        if last_lsn is None or pdf["event_id"][idx] > last_lsn:
            last_lsn = int(pdf["event_id"][idx])
            last_value = float(pdf["value"][idx])
            last_ts = pdf["ts"][idx]
    state.update((last_lsn, last_value, last_ts))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "user_id": [key[1]],
            "last_lsn": [last_lsn],
            "last_value": [last_value],
            "last_ts": [last_ts],
        }
    )


def latest_state_stream(events: DataFrame) -> DataFrame:
    """Keyed latest-state over the stream (the reference's
    snapshot+stream merged view, maintained incrementally). State is
    one row per (relation, key); Arrow-batched updates."""
    return events.groupBy("event_type", "user_id").applyInPandasWithState(
        _latest_state_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_TOAST_STATE_SCHEMA = "carried_props STRING"
_TOAST_OUT_SCHEMA = (
    "source_table STRING, key_user_id LONG, lsn LONG, op STRING, "
    "after_value DOUBLE, after_props STRING, was_toasted BOOLEAN"
)


def _toast_backfill_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    carried = state.get[0] if state.exists else None
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("event_id")
    work = pdf[pdf["op"] != "d"].copy()
    if len(work):
        toasted = work["op"] == "u"
        wire = work["props"].where(~toasted)
        filled = wire.ffill()
        if carried is not None:
            filled = filled.fillna(carried)
        non_null = wire.dropna()
        if len(non_null):
            carried = non_null.iloc[-1]
        state.update((carried,))
        yield pd.DataFrame(
            {
                "source_table": work["event_type"],
                "key_user_id": work["user_id"],
                "lsn": work["event_id"],
                "op": work["op"],
                "after_value": work["value"],
                "after_props": filled,
                "was_toasted": toasted,
            }
        )
    else:
        state.update((carried,))


def toast_backfill_stream(events: DataFrame) -> DataFrame:
    """Unchanged-TOAST reconstruction on the LIVE stream (the batch
    A16 operator's semantics, maintained incrementally): logical
    replication omits a TOASTed column from an UPDATE tuple when it
    did not change (decoderplan.go:57-59), so the full after-image is
    rebuilt by carrying the last transmitted value per (table, key) as
    keyed state. Assumes per-key LSN-ordered delivery across
    micro-batches — the guarantee WAL shipping provides; rows are
    sorted by LSN within each batch."""
    from timescaledb_event_streamer_spark.cdc.envelope import derive_op

    keyed = events.withColumn("op", derive_op(F.col("event_id")))
    return keyed.groupBy("event_type", "user_id").applyInPandasWithState(
        _toast_backfill_fn,
        outputStructType=_TOAST_OUT_SCHEMA,
        stateStructType=_TOAST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def resolved_stream(events: DataFrame, catalog: DataFrame) -> DataFrame:
    """Chunk→hypertable resolution on the LIVE stream: a
    stream-static broadcast join against the (batch) chunk catalog —
    the exact shape of the reference's hot path, where every
    replication event is resolved against the in-memory catalog
    before wrapping (replicationresolver.go). The stream side never
    shuffles; the catalog re-broadcasts per micro-batch, which is
    what keeps a catalog refresh visible to the stream."""
    from timescaledb_event_streamer_spark.catalog.chunks import chunk_start_epoch

    keyed = events.withColumn("range_start_s", chunk_start_epoch(F.col("ts")))
    return keyed.join(
        F.broadcast(catalog),
        on=[
            keyed["event_type"] == catalog["hypertable_name"],
            keyed["range_start_s"] == catalog["range_start_s"],
        ],
    ).drop(catalog["range_start_s"])


def streaming_sessions(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessionization on the live stream via native
    session windows (the streaming twin of the batch ts_sessionize
    query). The watermark closes sessions whose gap has passed, so
    state is bounded; output is one row per closed session."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            "n_events",
            "session_start",
            "session_end",
            F.col("session_window.start").alias("window_start"),
        )
    )


def deduped_stream(env: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop replayed envelopes by LSN: an at-least-once source (WAL
    replay after restart, the reference's offset-recovery path)
    becomes effectively-once downstream. State is bounded by the
    watermark horizon — the same role the SQS sink's broker-side
    MessageDeduplicationId plays (sinks/encoders.sqs_shaped), done
    engine-side."""
    return env.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["lsn"])


def attribution_stream(
    events: DataFrame, horizon: str = "30 minutes", watermark: str = "10 days"
) -> DataFrame:
    """Stream-stream event-time interval join: each purchase joins
    the same user's clicks from the preceding ``horizon`` (click->
    purchase attribution). Both sides carry watermarks, and the join
    condition bounds click_ts to a window ending at purchase_ts, so
    Spark can expire click state once the watermark passes the
    horizon — per-key state is bounded by (watermark + horizon) of
    events, not the stream's lifetime. The default watermark here is
    generous because the test log replays unordered batches; a live
    deployment would use minutes.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("click_user"),
            F.col("event_id").alias("click_lsn"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_lsn"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        F.expr(
            f"""
            user_id = click_user
            AND click_ts < purchase_ts
            AND click_ts >= purchase_ts - INTERVAL {horizon}
            """
        ),
    ).select(
        "user_id",
        "purchase_lsn",
        "purchase_ts",
        "purchase_value",
        "click_lsn",
        "click_ts",
    )


_ASOF_STATE_SCHEMA = "p_ts TIMESTAMP, p_value DOUBLE"
_ASOF_OUT_SCHEMA = (
    "user_id LONG, event_id LONG, ts TIMESTAMP, click_value DOUBLE, "
    "match_age_s LONG, purchase_value_fresh DOUBLE, match_status STRING"
)


def _make_asof_state_fn(tolerance_s: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        p_ts, p_value = state.get if state.exists else (None, None)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        rights = pdf[pdf["side"] == 1][["ts", "value"]].rename(
            columns={"value": "p_value"}
        )
        if p_ts is not None:
            rights = pd.concat(
                [pd.DataFrame({"ts": [p_ts], "p_value": [p_value]}), rights],
                ignore_index=True,
            )
        if len(rights):
            # batch contract (ts_asof_tolerance): right side unique per
            # ts, ties resolved by max(value) — dedupe here so a
            # duplicate-ts purchase inside one micro-batch matches the
            # batch result instead of whichever row sorted last
            rights = (
                rights.groupby("ts", as_index=False)["p_value"]
                .max()
                .sort_values("ts", kind="stable")
            )
        rights["p_ts"] = rights["ts"]
        lefts = (
            pdf[pdf["side"] == 0][["event_id", "ts", "value"]]
            .rename(columns={"value": "click_value"})
            .sort_values("ts", kind="stable")
        )
        if len(rights):
            latest = rights.iloc[-1]
            state.update((latest["ts"], float(latest["p_value"])))
        if not len(lefts):
            return
        if len(rights):
            m = pd.merge_asof(lefts, rights, on="ts", direction="backward")
        else:
            m = lefts.copy()
            m["p_value"] = None
            m["p_ts"] = pd.NaT
        # freshness compares the raw timedelta (microsecond precision,
        # matching batch age_us <= tol_us); the floored whole-second
        # value is only the match_age_s output column — flooring before
        # the comparison would call a match aged (tol, tol+1s) fresh
        age_td = m["ts"] - m["p_ts"]
        fresh = age_td <= pd.Timedelta(seconds=tolerance_s)
        age = age_td // pd.Timedelta(seconds=1)
        out = pd.DataFrame(
            {
                "user_id": key[0],
                "event_id": m["event_id"],
                "ts": m["ts"],
                "click_value": m["click_value"],
                "match_age_s": age.astype("Int64"),
                "purchase_value_fresh": m["p_value"].where(fresh),
                "match_status": pd.Series(
                    ["none"] * len(m), index=m.index
                ).where(
                    m["p_ts"].isna(),
                    pd.Series(["stale"] * len(m), index=m.index).where(
                        ~fresh, "fresh"
                    ),
                ),
            }
        )
        yield out

    return fn


def asof_join_stream(tagged: DataFrame, tolerance_s: int) -> DataFrame:
    """Streaming tolerance-bounded as-of join (I22) — the live form of
    the batch union+LOCF as-of: one union-tagged stream (side=0 left /
    side=1 right, columns event_id/ts/value) grouped by user_id;
    per-key state carries the most recent right row across
    micro-batches, and within each batch a vectorized pandas
    merge_asof matches the batch's left rows against batch rights +
    carried state (Arrow-batched — the custom-stateful-operator slow
    path is one merge_asof per key-batch, never per row). Right rows
    sharing a timestamp collapse to max(value) before matching — the
    same tie contract as the batch ts_asof_tolerance — and freshness
    is decided on the raw (microsecond) timedelta, with match_age_s
    floored to whole seconds only for output.

    Ordering contract: correct when micro-batches arrive in event-time
    order per key ACROSS batches (the WAL-delivery guarantee the
    reference's transaction log provides); rows within a batch are
    sorted here. A right row arriving after a left row it should have
    matched is the generic late-data problem — watermark the source
    if the transport can reorder."""
    return tagged.groupBy("user_id").applyInPandasWithState(
        _make_asof_state_fn(tolerance_s),
        outputStructType=_ASOF_OUT_SCHEMA,
        stateStructType=_ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming Heikin-Ashi (I28): a genuinely SEQUENTIAL per-key
# operator (each day's output depends on the previous day's OUTPUT),
# so unlike the associative partial tables (I23/I25/I27) it cannot
# run as a complete-mode aggregation — this is exactly what
# applyInPandasWithState exists for: keyed state carrying
# (last_day, last_ha_open, last_ha_close) across micro-batches.

_HA_STATE_SCHEMA = "last_day LONG, po DOUBLE, pc DOUBLE"
_HA_OUT_SCHEMA = (
    "series STRING, day_s LONG, ha_open DOUBLE, ha_close DOUBLE, "
    "ha_high DOUBLE, ha_low DOUBLE, bullish BOOLEAN"
)


def _heikin_ashi_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last_day, po, pc = state.get if state.exists else (None, None, None)
    rows = []
    # concatenate ALL Arrow chunks before sorting: when one key's
    # micro-batch spans multiple chunks, per-chunk sorting does not
    # give cross-chunk day order, and an earlier day arriving in a
    # later chunk would be silently dropped by the replay guard
    # below — missing candles and a wrong recursion state (r7
    # advice). One concat per (key, batch); chunk count is bounded
    # by the micro-batch size, not the stream length.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        allpdf = pd.concat(chunks, ignore_index=True).sort_values("day_s")
        for r in allpdf.itertuples():
            if last_day is not None and r.day_s <= last_day:
                continue  # replayed/duplicate day partial
            hc = (r.o + r.h + r.l + r.c) / 4.0
            ho = (r.o + r.c) / 2.0 if po is None else (po + pc) / 2.0
            rows.append(
                {
                    "series": key[0],
                    "day_s": int(r.day_s),
                    "ha_open": ho,
                    "ha_close": hc,
                    "ha_high": max(r.h, ho, hc),
                    "ha_low": min(r.l, ho, hc),
                    "bullish": hc > ho,
                }
            )
            po, pc, last_day = ho, hc, int(r.day_s)
    state.update((last_day, po, pc))
    yield pd.DataFrame(
        rows,
        columns=[
            "series", "day_s", "ha_open", "ha_close",
            "ha_high", "ha_low", "bullish",
        ],
    )


def streaming_heikin_ashi(daily: DataFrame) -> DataFrame:
    """Heikin-Ashi over a stream of DAILY OHLC partials (I28): keyed
    state per series carries the previous candle's output across
    micro-batches, emitting each new day's smoothed candle in append
    mode. Ordering contract: day partials arrive in day order per
    series across batches (the cagg-refresh delivery shape);
    replayed days are idempotently skipped via last_day."""
    return daily.groupBy("series").applyInPandasWithState(
        _heikin_ashi_state_fn,
        outputStructType=_HA_OUT_SCHEMA,
        stateStructType=_HA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming CUSUM (I29): the batch form (ts_cusum, B86) collapses
# the recursion to prefix algebra because it can see the whole
# series; a DEPLOYED change detector knows only a fixed reference
# level per series and must carry the recursion state across
# micro-batches. State is three numbers — the prefix sum P and its
# zero-anchored running extrema — so S+ = P - minP and S- = maxP - P
# reproduce the textbook recursion incrementally, exactly the same
# closed form the batch query certifies.

_CUSUM_STATE_SCHEMA = "last_day LONG, p DOUBLE, minp DOUBLE, maxp DOUBLE"
_CUSUM_OUT_SCHEMA = (
    "series STRING, day_s LONG, cusum_pos DOUBLE, cusum_neg DOUBLE"
)


def _make_cusum_state_fn(targets: dict):
    """targets: series -> reference level mu in cents (the
    'in-control' mean a deployment calibrates offline — the batch
    query's series mean plays this role in the parity test)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_day, p, minp, maxp = (
            state.get if state.exists else (None, 0.0, 0.0, 0.0)
        )
        mu = float(targets[key[0]])
        rows = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allpdf = pd.concat(chunks, ignore_index=True).sort_values(
                "day_s"
            )
            for r in allpdf.itertuples():
                if last_day is not None and r.day_s <= last_day:
                    continue  # replayed/duplicate day partial
                p += float(r.cc) - mu
                minp = min(minp, p)  # zero-anchored: starts at 0.0
                maxp = max(maxp, p)
                rows.append(
                    {
                        "series": key[0],
                        "day_s": int(r.day_s),
                        "cusum_pos": (p - minp) / 100.0,
                        "cusum_neg": (maxp - p) / 100.0,
                    }
                )
                last_day = int(r.day_s)
        state.update((last_day, p, minp, maxp))
        yield pd.DataFrame(
            rows, columns=["series", "day_s", "cusum_pos", "cusum_neg"]
        )

    return fn


def streaming_cusum(daily: DataFrame, targets: dict) -> DataFrame:
    """Open-ended CUSUM over a stream of daily close partials (I29):
    keyed applyInPandasWithState carrying (P, min P, max P) so the
    change statistic accumulates across micro-batches; append mode,
    idempotent replay skip via last_day. `daily` needs columns
    (series, day_s, cc) with cc the day's close in cents."""
    return daily.groupBy("series").applyInPandasWithState(
        _make_cusum_state_fn(targets),
        outputStructType=_CUSUM_OUT_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming heavy hitters (I30): SpaceSaving (Metwally et al. 2005)
# per key — the bounded-memory top-k the batch ts_freq_agg family
# approximates offline, maintained INCREMENTALLY across micro-batches.
# State is m counters (item, count, overestimation error); the
# classic guarantees hold per key at any prefix of the stream:
# every item with true frequency > N/m is tracked, and
# true <= est <= true + err for tracked items.

_SS_STATE_SCHEMA = "state_json STRING"
_SS_OUT_SCHEMA = (
    "series STRING, update_seq LONG, rank LONG, item STRING, "
    "est_count LONG, max_err LONG, n_seen LONG"
)


def _spacesaving_update(counters: dict, item: str, m: int) -> None:
    """One SpaceSaving step: counters maps item -> [count, err]."""
    if item in counters:
        counters[item][0] += 1
    elif len(counters) < m:
        counters[item] = [1, 0]
    else:
        victim = min(counters, key=lambda k: (counters[k][0], k))
        vcount = counters[victim][0]
        del counters[victim]
        counters[item] = [vcount + 1, vcount]


def _make_spacesaving_state_fn(m: int, emit_top: int):
    import json

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
            counters = {k: v for k, v in st["c"]}
            n_seen, seq = st["n"], st["s"]
        else:
            counters, n_seen, seq = {}, 0, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allpdf = pd.concat(chunks, ignore_index=True)
            # event order within the batch is the arrival order the
            # source delivered (the WAL contract I28/I29 rely on)
            if "seq" in allpdf.columns:
                allpdf = allpdf.sort_values("seq")
            for item in allpdf["item"]:
                _spacesaving_update(counters, str(item), m)
                n_seen += 1
            seq += 1
        state.update(
            (json.dumps({"c": sorted(counters.items()), "n": n_seen, "s": seq}),)
        )
        top = sorted(
            counters.items(), key=lambda kv: (-kv[1][0], kv[0])
        )[:emit_top]
        yield pd.DataFrame(
            [
                {
                    "series": key[0],
                    "update_seq": seq,
                    "rank": r + 1,
                    "item": item,
                    "est_count": cnt,
                    "max_err": err,
                    "n_seen": n_seen,
                }
                for r, (item, (cnt, err)) in enumerate(top)
            ],
            columns=[
                "series", "update_seq", "rank", "item",
                "est_count", "max_err", "n_seen",
            ],
        )

    return fn


def streaming_heavy_hitters(
    tagged: DataFrame, m: int = 16, emit_top: int = 5
) -> DataFrame:
    """SpaceSaving top-k over a stream (I30): keyed
    applyInPandasWithState carrying the m-counter summary; each
    micro-batch emits the current per-key top `emit_top` snapshot
    tagged with the update sequence. `tagged` needs columns
    (series, item[, seq]); at 100 TB each key's state is O(m)
    regardless of stream length — the whole point of the sketch."""
    return tagged.groupBy("series").applyInPandasWithState(
        _make_spacesaving_state_fn(m, emit_top),
        outputStructType=_SS_OUT_SCHEMA,
        stateStructType=_SS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming quantile estimation (I31): the P-square algorithm
# (Jain & Chlamtac 1985) per key — a CONSTANT-state (5 markers)
# running quantile, the streaming counterpart of the batch
# percentile family (B10/B59): no buffer of observations, no
# histogram, just 5 heights + positions updated per event with
# piecewise-parabolic interpolation.

_P2_STATE_SCHEMA = "state_json STRING"
_P2_OUT_SCHEMA = (
    "series STRING, update_seq LONG, n_seen LONG, q_estimate DOUBLE"
)


def _p2_init(xs):
    xs = sorted(xs[:5])
    return {"q": xs, "n": [1, 2, 3, 4, 5], "count": 5}


def _p2_update(st: dict, x: float, p: float) -> None:
    """One P-square step for quantile p (textbook update: locate
    cell, bump marker positions, nudge interior markers toward
    their desired positions with the parabolic formula, linear
    fallback when the parabola would leave the bracket)."""
    q, n = st["q"], st["n"]
    st["count"] += 1
    if x < q[0]:
        q[0] = x
        k = 0
    elif x >= q[4]:
        q[4] = x
        k = 3
    else:
        k = next(i for i in range(4) if q[i] <= x < q[i + 1])
    for i in range(k + 1, 5):
        n[i] += 1
    desired = [
        1,
        1 + p * (st["count"] - 1) / 2.0,
        1 + p * (st["count"] - 1),
        1 + (1 + p) * (st["count"] - 1) / 2.0,
        float(st["count"]),
    ]
    for i in (1, 2, 3):
        d = desired[i] - n[i]
        if (d >= 1 and n[i + 1] - n[i] > 1) or (d <= -1 and n[i - 1] - n[i] < -1):
            d = 1 if d >= 1 else -1
            # piecewise-parabolic prediction
            qp = q[i] + d / (n[i + 1] - n[i - 1]) * (
                (n[i] - n[i - 1] + d) * (q[i + 1] - q[i]) / (n[i + 1] - n[i])
                + (n[i + 1] - n[i] - d) * (q[i] - q[i - 1]) / (n[i] - n[i - 1])
            )
            if not (q[i - 1] < qp < q[i + 1]):
                # linear fallback
                qp = q[i] + d * (q[i + d] - q[i]) / (n[i + d] - n[i])
            q[i] = qp
            n[i] += d


def _make_p2_state_fn(p: float):
    import json

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"boot": [], "q": None, "n": None, "count": 0, "s": 0}
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allpdf = pd.concat(chunks, ignore_index=True)
            if "seq" in allpdf.columns:
                allpdf = allpdf.sort_values("seq")
            for x in allpdf["x"]:
                x = float(x)
                if st["q"] is None:
                    st["boot"].append(x)
                    if len(st["boot"]) == 5:
                        init = _p2_init(st["boot"])
                        st.update(q=init["q"], n=init["n"], count=5, boot=[])
                else:
                    _p2_update(st, x, p)
            st["s"] += 1
        state.update((json.dumps(st),))
        if st["q"] is not None:
            est = st["q"][2]
            n_seen = st["count"]
        elif st["boot"]:
            xs = sorted(st["boot"])
            est = xs[min(int(p * len(xs)), len(xs) - 1)]
            n_seen = len(xs)
        else:
            yield pd.DataFrame(
                [], columns=["series", "update_seq", "n_seen", "q_estimate"]
            )
            return
        yield pd.DataFrame(
            [
                {
                    "series": key[0],
                    "update_seq": st["s"],
                    "n_seen": n_seen,
                    "q_estimate": est,
                }
            ]
        )

    return fn


def streaming_p2_quantile(tagged: DataFrame, p: float = 0.5) -> DataFrame:
    """P-square running quantile per key (I31): 5 markers of keyed
    state — O(1) per key regardless of stream length — emitting the
    current estimate each micro-batch. `tagged` needs columns
    (series, x[, seq])."""
    return tagged.groupBy("series").applyInPandasWithState(
        _make_p2_state_fn(p),
        outputStructType=_P2_OUT_SCHEMA,
        stateStructType=_P2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming reservoir sample (I32): Algorithm R per key with the
# repo's DETERMINISTIC-decision discipline (corpus_stratified_sample
# / corpus_epoch_shuffle use salted md5 instead of RNG state for the
# same reason): the j-th item's admission and its replacement slot
# derive from md5(key, j), so a replayed stream reproduces the exact
# same reservoir — testable bit-for-bit, resumable from state alone.

_RES_STATE_SCHEMA = "state_json STRING"
_RES_OUT_SCHEMA = (
    "series STRING, update_seq LONG, n_seen LONG, slot LONG, item STRING"
)


def _reservoir_decision(key: str, j: int, k: int) -> int | None:
    """Deterministic Algorithm R step for the j-th item (1-based):
    returns the slot to replace, or None to skip. For j <= k the
    slot is j-1; after that the item is admitted with probability
    k/j via md5(key|j) mod j < k — the same distribution as the
    classic uniform draw, with no RNG state to checkpoint."""
    import hashlib

    if j <= k:
        return j - 1
    r = (
        int.from_bytes(
            hashlib.md5(f"{key}|{j}".encode()).digest()[:8], "big"
        )
        % j
    )
    return r if r < k else None


def _make_reservoir_state_fn(k: int):
    import json

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"res": [], "n": 0, "s": 0}
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allpdf = pd.concat(chunks, ignore_index=True)
            if "seq" in allpdf.columns:
                allpdf = allpdf.sort_values("seq")
            for item in allpdf["item"]:
                st["n"] += 1
                slot = _reservoir_decision(key[0], st["n"], k)
                if slot is not None:
                    if slot == len(st["res"]):
                        st["res"].append(str(item))
                    else:
                        st["res"][slot] = str(item)
            st["s"] += 1
        state.update((json.dumps(st),))
        yield pd.DataFrame(
            [
                {
                    "series": key[0],
                    "update_seq": st["s"],
                    "n_seen": st["n"],
                    "slot": i,
                    "item": item,
                }
                for i, item in enumerate(st["res"])
            ],
            columns=["series", "update_seq", "n_seen", "slot", "item"],
        )

    return fn


def streaming_reservoir_sample(tagged: DataFrame, k: int = 8) -> DataFrame:
    """Uniform k-reservoir per key over a stream (I32): O(k) state
    regardless of stream length, deterministic salted-hash admission
    decisions (replay-stable, no RNG in the checkpoint), per-batch
    snapshot emission. `tagged` needs columns (series, item[, seq])."""
    return tagged.groupBy("series").applyInPandasWithState(
        _make_reservoir_state_fn(k),
        outputStructType=_RES_OUT_SCHEMA,
        stateStructType=_RES_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming EWMA anomaly alerts (I33): exponentially-weighted
# mean/variance per key (West's recurrence) with 3-sigma alerting —
# the monitoring loop a deployment runs over its own stream metrics
# (per-batch lag, event volume, value drift). Two floats of state;
# the recursion is the adjust=False EWMA the batch B38/B33 family
# models in its bounded-window form.

_EW_STATE_SCHEMA = "last_day LONG, mean DOUBLE, var DOUBLE, n LONG"
_EW_OUT_SCHEMA = (
    "series STRING, day_s LONG, x DOUBLE, ewma DOUBLE, ewvar DOUBLE, "
    "zscore DOUBLE, alert BOOLEAN"
)


def _make_ewma_alert_state_fn(alpha: float, z_threshold: float, warmup: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_day, mean, var, n = (
            state.get if state.exists else (None, None, 0.0, 0)
        )
        rows = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allpdf = pd.concat(chunks, ignore_index=True).sort_values(
                "day_s"
            )
            for r in allpdf.itertuples():
                if last_day is not None and r.day_s <= last_day:
                    continue  # idempotent replay skip
                x = float(r.x)
                if mean is None:
                    mean, var = x, 0.0
                    z, alert = 0.0, False
                else:
                    # z against the PRE-update statistics: the point
                    # is judged by the history, then absorbed
                    sd = var ** 0.5
                    z = (x - mean) / sd if sd > 0 else 0.0
                    alert = n >= warmup and abs(z) > z_threshold
                    delta = x - mean
                    incr = alpha * delta
                    mean = mean + incr
                    var = (1.0 - alpha) * (var + delta * incr)
                n += 1
                rows.append(
                    {
                        "series": key[0],
                        "day_s": int(r.day_s),
                        "x": x,
                        "ewma": mean,
                        "ewvar": var,
                        "zscore": z,
                        "alert": bool(alert),
                    }
                )
                last_day = int(r.day_s)
        state.update((last_day, mean, var, n))
        yield pd.DataFrame(
            rows,
            columns=[
                "series", "day_s", "x", "ewma", "ewvar", "zscore", "alert",
            ],
        )

    return fn


def streaming_ewma_alerts(
    daily: DataFrame,
    alpha: float = 0.2,
    z_threshold: float = 3.0,
    warmup: int = 5,
) -> DataFrame:
    """EWMA mean/variance anomaly detector per key (I33): each point
    is z-scored against the PRE-update exponential statistics, then
    absorbed (West's recurrence — two floats of state); alerts fire
    past `warmup` observations at |z| > threshold. `daily` needs
    columns (series, day_s, x)."""
    return daily.groupBy("series").applyInPandasWithState(
        _make_ewma_alert_state_fn(alpha, z_threshold, warmup),
        outputStructType=_EW_OUT_SCHEMA,
        stateStructType=_EW_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming distinct count (I34): the md5-HLL of B60/B63 carried
# as keyed state — registers merge by max, so the streaming fold is
# ORDER-INDEPENDENT and the final estimate must equal the batch
# ts_hll_md5 (and therefore its DuckDB oracle) bit-for-bit on the
# same data; the pytest pins exactly that three-way identity.

_HLL_STATE_SCHEMA = "state_json STRING"
_HLL_OUT_SCHEMA = (
    "series STRING, update_seq LONG, n_items LONG, n_regs LONG, "
    "n_approx DOUBLE"
)
_HLL_STREAM_M = 512


def _hll_register(item: str) -> tuple[int, int]:
    """(idx, rho) with the EXACT bit recipe of the batch ts_hll_md5:
    idx = first 12 md5 bits mod m, rho from the next 60 bits."""
    import hashlib

    hx = hashlib.md5(item.encode()).hexdigest()
    idx = int(hx[0:3], 16) % _HLL_STREAM_M
    w = int(hx[3:18], 16)
    rho = 61 if w == 0 else 61 - w.bit_length()
    return idx, rho


def _hll_estimate_py(regs: dict) -> float:
    """The batch query's estimate expression replayed in Python with
    the same operation order (idx-sorted sequential fold, exact
    2^-rho terms, linear-counting correction below 2.5m)."""
    import math

    m = _HLL_STREAM_M
    s = 0.0
    for idx in sorted(regs):
        s = s + 2.0 ** (-regs[idx])
    n_regs = len(regs)
    z = m - n_regs
    raw = (0.7213 / (1.0 + 1.079 / m)) * m * m / (s + z * 1.0)
    if raw <= 2.5 * m and z > 0:
        return m * math.log(m * 1.0 / z)
    return raw


def _make_hll_state_fn():
    import json

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
            regs = {int(k): v for k, v in st["r"].items()}
            n_items, seq = st["n"], st["s"]
        else:
            regs, n_items, seq = {}, 0, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allpdf = pd.concat(chunks, ignore_index=True)
            for item in allpdf["item"]:
                idx, rho = _hll_register(str(item))
                if rho > regs.get(idx, 0):
                    regs[idx] = rho
                n_items += 1
            seq += 1
        state.update(
            (json.dumps({"r": {str(k): v for k, v in regs.items()},
                         "n": n_items, "s": seq}),)
        )
        yield pd.DataFrame(
            [
                {
                    "series": key[0],
                    "update_seq": seq,
                    "n_items": n_items,
                    "n_regs": len(regs),
                    "n_approx": round(_hll_estimate_py(regs), 4),
                }
            ]
        )

    return fn


def streaming_hll_distinct(tagged: DataFrame) -> DataFrame:
    """Streaming distinct count per key (I34): 512 max-merged HLL
    registers in keyed state — O(m) per key regardless of stream
    length or cardinality, and because max-merge is order-blind the
    running estimate equals the batch md5-HLL on the same data
    exactly. `tagged` needs columns (series, item)."""
    return tagged.groupBy("series").applyInPandasWithState(
        _make_hll_state_fn(),
        outputStructType=_HLL_OUT_SCHEMA,
        stateStructType=_HLL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming count-min sketch (I35): B78's d=4 x w=64 md5 sketch as
# keyed state — register increments are associative, so after any
# prefix the streamed sketch equals the batch register table on the
# same rows; the pytest pins the streaming==batch==oracle triangle
# the way I34 does for HLL.

_CMS_STATE_SCHEMA = "state_json STRING"
_CMS_OUT_SCHEMA = (
    "series STRING, update_seq LONG, item STRING, n_cms LONG"
)
_CMS_STREAM_D, _CMS_STREAM_W = 4, 64


def _cms_indexes(item: str) -> list[int]:
    """The d register columns of `item` — byte-identical to the
    batch recipe (md5('j:' + item) first 8 hex chars mod w)."""
    import hashlib

    return [
        int(hashlib.md5(f"{j}:{item}".encode()).hexdigest()[:8], 16)
        % _CMS_STREAM_W
        for j in range(_CMS_STREAM_D)
    ]


def _make_cms_state_fn(tracked):
    import json

    tracked = [str(t) for t in tracked]

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {
                "t": [[0] * _CMS_STREAM_W for _ in range(_CMS_STREAM_D)],
                "s": 0,
            }
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allpdf = pd.concat(chunks, ignore_index=True)
            for item in allpdf["item"]:
                for j, idx in enumerate(_cms_indexes(str(item))):
                    st["t"][j][idx] += 1
            st["s"] += 1
        state.update((json.dumps(st),))
        yield pd.DataFrame(
            [
                {
                    "series": key[0],
                    "update_seq": st["s"],
                    "item": t,
                    "n_cms": min(
                        st["t"][j][idx]
                        for j, idx in enumerate(_cms_indexes(t))
                    ),
                }
                for t in tracked
            ],
            columns=["series", "update_seq", "item", "n_cms"],
        )

    return fn


def streaming_count_min(tagged: DataFrame, tracked) -> DataFrame:
    """Streaming CMS frequency estimates per key (I35): 4 x 64
    registers of keyed state (O(256) per key at any stream length /
    cardinality), per-batch point estimates (min over the item's d
    registers) for the tracked item list. `tagged` needs columns
    (series, item)."""
    return tagged.groupBy("series").applyInPandasWithState(
        _make_cms_state_fn(tracked),
        outputStructType=_CMS_OUT_SCHEMA,
        stateStructType=_CMS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming KAMA (I36): the live form of ts_kama (B97). Like
# Heikin-Ashi (I28) the recursion needs the previous day's OUTPUT, so
# it streams as keyed applyInPandasWithState; unlike I28 the state
# also carries the rolling (N+1)-close window that feeds Kaufman's
# efficiency ratio — still O(N) per key at any stream length.

_KAMA_N = 10
_KAMA_FAST = 2.0 / 3.0
_KAMA_SLOW = 2.0 / 31.0
_KAMA_STATE_SCHEMA = "state_json STRING"
_KAMA_OUT_SCHEMA = (
    "series STRING, day_s LONG, close_cents LONG, "
    "efficiency_ratio DOUBLE, kama_cents DOUBLE, above_kama BOOLEAN"
)


def _kama_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import json

    if state.exists:
        st = json.loads(state.get[0])
    else:
        st = {"d": None, "k": None, "buf": []}
    rows = []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        allpdf = pd.concat(chunks, ignore_index=True).sort_values("day_s")
        for r in allpdf.itertuples():
            if st["d"] is not None and r.day_s <= st["d"]:
                continue  # replayed/duplicate day partial
            cc = int(r.cc)
            st["buf"].append(cc)
            if len(st["buf"]) > _KAMA_N + 1:
                st["buf"] = st["buf"][-(_KAMA_N + 1) :]
            st["d"] = int(r.day_s)
            if len(st["buf"]) <= _KAMA_N:
                continue  # ER not yet computable: no output (rn <= N)
            buf = st["buf"]
            noise = sum(
                abs(buf[i] - buf[i - 1]) for i in range(1, len(buf))
            )
            er = abs(cc - buf[0]) / noise if noise > 0 else 0.0
            if st["k"] is None:
                kama = float(cc)
            else:
                sc = er * (_KAMA_FAST - _KAMA_SLOW) + _KAMA_SLOW
                kama = st["k"] + (sc * sc) * (cc - st["k"])
            st["k"] = kama
            rows.append(
                {
                    "series": key[0],
                    "day_s": int(r.day_s),
                    "close_cents": cc,
                    "efficiency_ratio": er,
                    "kama_cents": kama,
                    "above_kama": cc > kama,
                }
            )
    state.update((json.dumps(st),))
    yield pd.DataFrame(
        rows,
        columns=[
            "series", "day_s", "close_cents",
            "efficiency_ratio", "kama_cents", "above_kama",
        ],
    )


def streaming_kama(daily: DataFrame) -> DataFrame:
    """Kaufman adaptive moving average over a stream of daily close
    partials (I36): keyed state carries (last_day, kama, rolling
    N+1-close window) across micro-batches; output starts at the
    first ER-computable day exactly like the batch form, replayed
    days are idempotently skipped. `daily` needs columns
    (series, day_s, cc) with cc in integer cents."""
    return daily.groupBy("series").applyInPandasWithState(
        _kama_state_fn,
        outputStructType=_KAMA_OUT_SCHEMA,
        stateStructType=_KAMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming Supertrend (I37): the live form of ts_supertrend
# (B101). State per series = (last_day, final bands, trend, prev
# close) plus the rolling TR window feeding the ATR — the I36 shape
# with a two-sided recursive carry.

_ST_N = 10
_ST_MULT = 3.0
_ST_STATE_SCHEMA = "state_json STRING"
_ST_OUT_SCHEMA = (
    "series STRING, day_s LONG, close_cents LONG, final_upper DOUBLE, "
    "final_lower DOUBLE, trend STRING, supertrend DOUBLE"
)


def _supertrend_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import json

    if state.exists:
        st = json.loads(state.get[0])
    else:
        st = {"d": None, "fub": None, "flb": None, "t": None,
              "pc": None, "trs": [], "seen": 0}
    rows = []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        allpdf = pd.concat(chunks, ignore_index=True).sort_values("day_s")
        for r in allpdf.itertuples():
            if st["d"] is not None and r.day_s <= st["d"]:
                continue  # replayed/duplicate day partial
            hc, lc, cc = int(r.hc), int(r.lc), int(r.cc)
            if st["seen"] > 0:
                tr = max(hc - lc, abs(hc - st["last_cc"]),
                         abs(lc - st["last_cc"]))
                st["trs"].append(tr)
                if len(st["trs"]) > _ST_N:
                    st["trs"] = st["trs"][-_ST_N:]
            st["seen"] += 1
            st["last_cc"] = cc
            st["d"] = int(r.day_s)
            if st["seen"] <= _ST_N:
                continue  # rn <= N: ATR window not yet full
            atr = sum(st["trs"]) / _ST_N
            hl2 = (hc + lc) / 2.0
            bub, blb = hl2 + _ST_MULT * atr, hl2 - _ST_MULT * atr
            if st["t"] is None:
                fub, flb = bub, blb
                trend = "up" if cc >= hl2 else "down"
            else:
                fub = bub if (bub < st["fub"] or st["pc"] > st["fub"]) \
                    else st["fub"]
                flb = blb if (blb > st["flb"] or st["pc"] < st["flb"]) \
                    else st["flb"]
                if st["t"] == "up":
                    trend = "down" if cc < flb else "up"
                else:
                    trend = "up" if cc > fub else "down"
            st["fub"], st["flb"], st["t"], st["pc"] = fub, flb, trend, cc
            rows.append(
                {
                    "series": key[0],
                    "day_s": int(r.day_s),
                    "close_cents": cc,
                    "final_upper": fub,
                    "final_lower": flb,
                    "trend": trend,
                    "supertrend": flb if trend == "up" else fub,
                }
            )
    state.update((json.dumps(st),))
    yield pd.DataFrame(
        rows,
        columns=[
            "series", "day_s", "close_cents", "final_upper",
            "final_lower", "trend", "supertrend",
        ],
    )


def streaming_supertrend(daily: DataFrame) -> DataFrame:
    """Supertrend over a stream of daily OHLC partials (I37): keyed
    state carries (bands, trend, prev close, rolling TR window)
    across micro-batches; output starts once the ATR window fills,
    exactly like the batch form; replayed days idempotently skipped.
    `daily` needs columns (series, day_s, hc, lc, cc) in integer
    cents."""
    return daily.groupBy("series").applyInPandasWithState(
        _supertrend_state_fn,
        outputStructType=_ST_OUT_SCHEMA,
        stateStructType=_ST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming ADX (I38): the live form of ts_adx (B104) — the most
# state-heavy fold in the indicator family: TWO chained Wilder
# recursions (smoothed +DM/-DM/TR, then smoothed DX) per series key.

_ADX_N = 7
_ADX_STATE_SCHEMA = "state_json STRING"
_ADX_OUT_SCHEMA = (
    "series STRING, day_s LONG, plus_di DOUBLE, minus_di DOUBLE, "
    "dx DOUBLE, adx DOUBLE"
)


def _adx_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import json

    n = _ADX_N
    if state.exists:
        st = json.loads(state.get[0])
    else:
        st = {"d": None, "rn": 0, "ph": None, "pl": None, "pc": None,
              "sp": None, "sm": None, "stt": None, "dxs": 0.0,
              "adx": None}
    rows = []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        allpdf = pd.concat(chunks, ignore_index=True).sort_values("day_s")
        for r in allpdf.itertuples():
            if st["d"] is not None and r.day_s <= st["d"]:
                continue  # replayed/duplicate day partial
            hc, lc, cc = int(r.hc), int(r.lc), int(r.cc)
            st["d"] = int(r.day_s)
            st["rn"] += 1
            rn = st["rn"]
            if rn == 1:
                st["ph"], st["pl"], st["pc"] = hc, lc, cc
                continue
            up, dn = hc - st["ph"], st["pl"] - lc
            dmp = up if (up > dn and up > 0) else 0
            dmm = dn if (dn > up and dn > 0) else 0
            tr = max(hc - lc, abs(hc - st["pc"]), abs(lc - st["pc"]))
            st["ph"], st["pl"], st["pc"] = hc, lc, cc
            if st["sp"] is None:
                st["sp"], st["sm"], st["stt"] = float(dmp), float(dmm), float(tr)
            elif rn <= n + 1:
                st["sp"] += dmp
                st["sm"] += dmm
                st["stt"] += tr
            else:
                st["sp"] = st["sp"] - st["sp"] / n + dmp
                st["sm"] = st["sm"] - st["sm"] / n + dmm
                st["stt"] = st["stt"] - st["stt"] / n + tr
            dip = 100.0 * st["sp"] / st["stt"] if st["stt"] > 0 else 0.0
            dim = 100.0 * st["sm"] / st["stt"] if st["stt"] > 0 else 0.0
            dx_raw = (
                100.0 * abs(dip - dim) / (dip + dim)
                if dip + dim > 0
                else 0.0
            )
            if n + 1 <= rn <= 2 * n:
                st["dxs"] += dx_raw
            if rn == 2 * n:
                st["adx"] = st["dxs"] / n
            elif rn > 2 * n:
                st["adx"] = (st["adx"] * (n - 1) + dx_raw) / n
            if rn >= 2 * n:
                rows.append(
                    {
                        "series": key[0],
                        "day_s": int(r.day_s),
                        "plus_di": dip,
                        "minus_di": dim,
                        "dx": dx_raw,
                        "adx": st["adx"],
                    }
                )
    state.update((json.dumps(st),))
    yield pd.DataFrame(
        rows,
        columns=["series", "day_s", "plus_di", "minus_di", "dx", "adx"],
    )


def streaming_adx(daily: DataFrame) -> DataFrame:
    """ADX over a stream of daily OHLC partials (I38): keyed state
    carries both Wilder recursions (smoothed +DM/-DM/TR and the
    smoothed DX) plus the previous day's H/L/C — O(1) state per key
    at any stream length; output starts at the second smoothing's
    seed exactly like the batch form. `daily` needs columns
    (series, day_s, hc, lc, cc) in integer cents."""
    return daily.groupBy("series").applyInPandasWithState(
        _adx_state_fn,
        outputStructType=_ADX_OUT_SCHEMA,
        stateStructType=_ADX_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming Parabolic SAR (I39): the live form of ts_parabolic_sar
# (B112) — Wilder's stop-and-reverse with the two-bar clamp as O(1)
# keyed state: (trend, sar, ep, af-step) plus the two previous bars'
# extremes and the previous close, carried across micro-batches.

_SAR_STATE_SCHEMA = "state_json STRING"
_SAR_OUT_SCHEMA = (
    "series STRING, day_s LONG, close_cents LONG, sar_cents DOUBLE, "
    "trend STRING, ep_cents LONG, af DOUBLE, reversed BOOLEAN"
)
_SAR_AF = 0.02
_SAR_MAX_STEP = 10


def _sar_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import json

    if state.exists:
        st = json.loads(state.get[0])
    else:
        st = {"rn": 0, "last": None, "pc": None, "p1l": None,
              "p2l": None, "p1h": None, "p2h": None, "trend": None,
              "sar": None, "ep": None, "stp": 1}
    rows = []
    for pdf in pdfs:
        for r in pdf.sort_values("day_s").itertuples():
            day_s, hc, lc, cc = (
                int(r.day_s), int(r.hc), int(r.lc), int(r.cc)
            )
            if st["last"] is not None and day_s <= st["last"]:
                continue  # replayed day: idempotent skip
            st["last"] = day_s
            st["rn"] += 1
            if st["rn"] == 1:
                pass  # no output before the seed bar
            elif st["rn"] == 2:
                st["trend"] = "up" if cc >= st["pc"] else "down"
                st["sar"] = float(
                    st["p1l"] if st["trend"] == "up" else st["p1h"]
                )
                st["ep"] = hc if st["trend"] == "up" else lc
                st["stp"] = 1
                rows.append(
                    (key[0], day_s, cc, st["sar"], st["trend"],
                     st["ep"], st["stp"] * _SAR_AF, False)
                )
            else:
                raw = st["sar"] + (st["stp"] * _SAR_AF) * (
                    st["ep"] - st["sar"]
                )
                if st["trend"] == "up":
                    clamped = min(raw, st["p1l"], st["p2l"])
                    if lc < clamped:
                        st.update(
                            trend="down", sar=float(st["ep"]), ep=lc,
                            stp=1,
                        )
                        rev = True
                    else:
                        if hc > st["ep"]:
                            st["stp"] = min(st["stp"] + 1, _SAR_MAX_STEP)
                        st.update(sar=clamped, ep=max(st["ep"], hc))
                        rev = False
                else:
                    clamped = max(raw, st["p1h"], st["p2h"])
                    if hc > clamped:
                        st.update(
                            trend="up", sar=float(st["ep"]), ep=hc,
                            stp=1,
                        )
                        rev = True
                    else:
                        if lc < st["ep"]:
                            st["stp"] = min(st["stp"] + 1, _SAR_MAX_STEP)
                        st.update(sar=clamped, ep=min(st["ep"], lc))
                        rev = False
                rows.append(
                    (key[0], day_s, cc, st["sar"], st["trend"],
                     st["ep"], st["stp"] * _SAR_AF, rev)
                )
            st["p2l"], st["p1l"] = st["p1l"], lc
            st["p2h"], st["p1h"] = st["p1h"], hc
            st["pc"] = cc
    state.update((json.dumps(st),))
    yield pd.DataFrame(
        rows,
        columns=[
            "series", "day_s", "close_cents", "sar_cents", "trend",
            "ep_cents", "af", "reversed",
        ],
    )


def streaming_parabolic_sar(daily: DataFrame) -> DataFrame:
    """Parabolic SAR over a stream of daily OHLC partials (I39): the
    full Wilder recursion INCLUDING the two-bar clamp as keyed state
    — (trend, sar, ep, af-step) plus the two prior bars' extremes,
    O(1) per key at any stream length; replayed days idempotently
    skipped. `daily` needs (series, day_s, hc, lc, cc) integer
    cents. Equals the batch ts_parabolic_sar row-for-row (pinned in
    tests/test_round10.py)."""
    return daily.groupBy("series").applyInPandasWithState(
        _sar_state_fn,
        outputStructType=_SAR_OUT_SCHEMA,
        stateStructType=_SAR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming incremental dedup admission (I40): the live form of
# dedup_incremental_minhash (D25). The production ingest gate a
# 100 TB pipeline actually runs: keyed state on (band, bucket)
# carries the HISTORICAL index signatures for that LSH bucket; each
# micro-batch of new documents probes only the buckets it collides
# with, so per-batch cost is |batch| x collision rate — never
# corpus^2, never a full index scan. The banding below is pinned to
# D25's (md5-portable base hash, xxhash64 band buckets) by the
# batch-parity pytest in tests/test_round11.py — edit both or
# neither.

_INC_DEDUP_STATE_SCHEMA = "state_json STRING"
_INC_DEDUP_OUT_SCHEMA = (
    "new_id LONG, index_id LONG, est_jaccard DOUBLE, band INT"
)


def _inc_dedup_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import json

    from timescaledb_event_streamer_spark.operators.dedup import (
        MINHASH_PERMS,
    )

    idx: list = json.loads(state.get[0]) if state.exists else []
    out: list[dict] = []
    chunks = [p for p in pdfs if len(p)]
    if chunks:
        allpdf = pd.concat(chunks, ignore_index=True)
        # index rows first: a bucket's historical membership must be
        # visible to new rows probing in the same micro-batch
        allpdf = allpdf.sort_values(["is_new", "doc_id"])
        known = {d for d, _ in idx}
        for r in allpdf.itertuples():
            sig = [int(x) for x in r.sig]
            if not r.is_new:
                if r.doc_id not in known:
                    idx.append([int(r.doc_id), sig])
                    known.add(r.doc_id)
                continue
            for iid, isig in idx:
                agree = sum(1 for a, b in zip(sig, isig) if a == b)
                out.append(
                    {
                        "new_id": int(r.doc_id),
                        "index_id": int(iid),
                        "est_jaccard": agree / float(MINHASH_PERMS),
                        "band": int(key[0]),
                    }
                )
    state.update((json.dumps(idx),))
    yield pd.DataFrame(
        out, columns=["new_id", "index_id", "est_jaccard", "band"]
    )


def streaming_incremental_dedup(sigs: DataFrame) -> DataFrame:
    """LSH-bucket-keyed incremental dedup probe (I40): `sigs` is a
    STREAM of (doc_id LONG, sig ARRAY<LONG>, is_new BOOLEAN) — index
    rows seed/extend the bucket state (no output), new rows emit one
    candidate row per (band,bucket) collision with est_jaccard from
    full-signature agreement. Candidates are verdict-reduced by
    incremental_dedup_verdicts (batch algebra shared with D25:
    dedup across bands, best match, 0.5 admission threshold)."""
    from timescaledb_event_streamer_spark.operators.dedup import (
        MINHASH_BANDS,
        MINHASH_PERMS,
    )

    rows = MINHASH_PERMS // MINHASH_BANDS
    banded = sigs.select(
        "doc_id",
        "sig",
        "is_new",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[bi * rows + ri].cast("string")
                                    for ri in range(rows)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(MINHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", "is_new", "bb.band", "bb.bucket")
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _inc_dedup_state_fn,
        outputStructType=_INC_DEDUP_OUT_SCHEMA,
        stateStructType=_INC_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def incremental_dedup_verdicts(
    candidates: DataFrame, new_docs: DataFrame
) -> DataFrame:
    """Admission verdicts from streamed candidate rows — the same
    tail algebra as batch D25: cross-band dedup on (new_id,
    index_id), candidate count, best match (highest est_jaccard,
    lowest-id tie), admit when best < 0.5; no-candidate docs admit
    with the -1 / 0.0 sentinels. `new_docs` must carry doc_id for
    every new document in the window (sentinel rows come from it)."""
    from pyspark.sql import Window

    cand = candidates.dropDuplicates(["new_id", "index_id"])
    wbest = Window.partitionBy("new_id").orderBy(
        F.col("est_jaccard").desc(), "index_id"
    )
    best = (
        cand.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select("new_id", "index_id", "est_jaccard")
    )
    counts = cand.groupBy("new_id").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    return (
        new_docs.select("doc_id")
        .join(counts, F.col("doc_id") == counts["new_id"], "left")
        .drop("new_id")
        .join(best, F.col("doc_id") == best["new_id"], "left")
        .drop("new_id")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
            F.coalesce("index_id", F.lit(-1)).cast("long").alias("best_match_id"),
            F.coalesce("est_jaccard", F.lit(0.0)).alias("best_est_jaccard"),
            (F.coalesce("est_jaccard", F.lit(0.0)) < 0.5).alias("admitted"),
        )
    )


# -- streaming URL-canonical admission (I41): the live form of
# dedup_url_canonical (D28). The crawl-frontier gate: normalize each
# arriving URL with the SHARED codegen canonicalizer
# (operators/urls.py) and admit only the FIRST document per
# canonical form — later micro-batches carrying case-mangled /
# utm-tagged / fragment-bearing variants of an admitted URL are
# dropped by keyed dropDuplicates state. First-arrival-wins is the
# streaming analogue of D28's min-doc_id canonical election; state
# is one row per DISTINCT canonical URL (the admitted set itself),
# which is exactly the frontier a crawler must hold anyway.


def streaming_url_admission(docs: DataFrame) -> DataFrame:
    """`docs` is a STREAM of (doc_id LONG, url STRING); emits the
    admitted rows (doc_id, canonical_url, had_utm, had_fragment,
    had_port) — one per canonical form, first arrival wins."""
    from timescaledb_event_streamer_spark.operators.urls import (
        canonicalize_url,
    )

    cols = canonicalize_url(F.col("url"))
    normalized = docs.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()]
    )
    return normalized.dropDuplicates(["canonical_url"])


# -- streaming slot-retention monitor (I42): the live form of
# cdc_slot_retention_lag (A34). State per source table = (head LSN,
# acked LSN, the unacked-LSN buffer, update seq); data rows advance
# the head and join the buffer, ack rows (is_ack=true, ack_lsn)
# advance the consumer cursor and drain the buffer. The buffer is
# bounded by the CONSUMER LAG, not the stream length — the same
# bound the reference's transaction tracker carries for unacked
# WAL — and pending is exact even when acks arrive out of order
# within a batch (rows are applied in (is_ack, lsn) order).

_SLOT_STATE_SCHEMA = "state_json STRING"
_SLOT_OUT_SCHEMA = (
    "source_table STRING, head_lsn LONG, acked_lsn LONG, "
    "pending LONG, seq LONG"
)


def _slot_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import json

    st = (
        json.loads(state.get[0])
        if state.exists
        else {"head": None, "acked": 0, "buf": [], "seq": 0}
    )
    chunks = [p for p in pdfs if len(p)]
    if chunks:
        allpdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["is_ack", "lsn"]
        )
        for r in allpdf.itertuples():
            if r.is_ack:
                st["acked"] = max(st["acked"], int(r.lsn))
                st["buf"] = [x for x in st["buf"] if x > st["acked"]]
            else:
                lsn = int(r.lsn)
                st["head"] = lsn if st["head"] is None else max(st["head"], lsn)
                if lsn > st["acked"]:
                    st["buf"].append(lsn)
    st["seq"] += 1
    state.update((json.dumps(st),))
    yield pd.DataFrame(
        [
            {
                "source_table": key[0],
                "head_lsn": st["head"],
                "acked_lsn": st["acked"],
                "pending": len(st["buf"]),
                "seq": st["seq"],
            }
        ],
        columns=["source_table", "head_lsn", "acked_lsn", "pending", "seq"],
    )


def streaming_slot_monitor(rows: DataFrame) -> DataFrame:
    """`rows` is a STREAM of (source_table STRING, lsn LONG, is_ack
    BOOLEAN); emits one per-table lag row per micro-batch (take the
    max-seq row per table for the current posture; the slot-level
    confirmed_flush = min over tables is a metadata-sized batch
    reduce over the emitted rows)."""
    return rows.groupBy("source_table").applyInPandasWithState(
        _slot_state_fn,
        outputStructType=_SLOT_OUT_SCHEMA,
        stateStructType=_SLOT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming Fisher Transform (I43): the live form of
# ts_fisher_transform (B122). Like KAMA (I36) the recursion needs
# the previous day's OUTPUT (v and fisher carries), plus the rolling
# 10-day midprice channel — O(N) state per key at any stream length;
# the +-0.999 clamp rides inside the step exactly as in the batch
# fold, replayed days are idempotently skipped.

_FT_STATE_SCHEMA = "state_json STRING"
_FT_OUT_SCHEMA = (
    "series STRING, day_s LONG, value1 DOUBLE, fisher DOUBLE, "
    "bullish BOOLEAN"
)
_FT_CHANNEL = 10


def _fisher_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import json

    st = (
        json.loads(state.get[0])
        if state.exists
        else {"d": None, "buf": [], "pv": 0.0, "pf": 0.0}
    )
    rows = []
    chunks = [p for p in pdfs if len(p)]
    if chunks:
        allpdf = pd.concat(chunks, ignore_index=True).sort_values("day_s")
        for r in allpdf.itertuples():
            if st["d"] is not None and r.day_s <= st["d"]:
                continue  # replayed/duplicate day partial
            st["d"] = int(r.day_s)
            st["buf"].append(int(r.mid2))
            if len(st["buf"]) > _FT_CHANNEL:
                st["buf"] = st["buf"][-_FT_CHANNEL:]
            if len(st["buf"]) < _FT_CHANNEL:
                continue  # channel not yet full: no output (rn < N)
            hh2, ll2 = max(st["buf"]), min(st["buf"])
            pos = (
                (st["buf"][-1] - ll2) / (hh2 - ll2) if hh2 > ll2 else 0.5
            )
            v = 0.66 * (pos - 0.5) + 0.67 * st["pv"]
            v = max(min(v, 0.999), -0.999)
            import math

            fisher = 0.5 * math.log((1.0 + v) / (1.0 - v)) + 0.5 * st["pf"]
            st["pv"], st["pf"] = v, fisher
            rows.append(
                {
                    "series": key[0],
                    "day_s": int(r.day_s),
                    "value1": v,
                    "fisher": fisher,
                    "bullish": fisher > 0,
                }
            )
    state.update((json.dumps(st),))
    yield pd.DataFrame(
        rows, columns=["series", "day_s", "value1", "fisher", "bullish"]
    )


def streaming_fisher_transform(daily: DataFrame) -> DataFrame:
    """Fisher Transform over a stream of daily midprice partials
    (I43): `daily` needs (series, day_s, mid2) with mid2 = H+L in
    integer 2x cents; keyed state carries (last day, channel buffer,
    v/fisher carries) across micro-batches."""
    return daily.groupBy("series").applyInPandasWithState(
        _fisher_state_fn,
        outputStructType=_FT_OUT_SCHEMA,
        stateStructType=_FT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming PVT (I44): the live form of ts_pvt (B128). Unlike the
# windowed indicator streams, PVT's state is the UNBOUNDED cumulative
# itself — which is exactly why the keyed-state form matters: the
# stream carries (last day, previous qualifying close, running PVT)
# per series, O(1) regardless of stream length, where a batch rerun
# would rescan the whole day history.

_PVT_STATE_SCHEMA = "state_json STRING"
_PVT_OUT_SCHEMA = (
    "series STRING, day_s LONG, pvt_num LONG, pvt_term DOUBLE, "
    "pvt DOUBLE"
)


def _pvt_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import json

    if state.exists:
        st = json.loads(state.get[0])
    else:
        st = {"d": None, "pc": None, "pvt": 0.0}
    rows = []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        allpdf = pd.concat(chunks, ignore_index=True).sort_values("day_s")
        for r in allpdf.itertuples():
            if st["d"] is not None and r.day_s <= st["d"]:
                continue  # replayed/duplicate day partial
            cc, vol = int(r.cc), int(r.vol)
            if cc <= 0:
                continue  # the batch form excludes zero-close days
            st["d"] = int(r.day_s)
            if st["pc"] is None:
                st["pc"] = cc
                continue  # first qualifying day seeds the lag only
            num = vol * (cc - st["pc"])
            term = num / float(st["pc"])
            st["pvt"] += term
            st["pc"] = cc
            rows.append(
                {
                    "series": key[0],
                    "day_s": int(r.day_s),
                    "pvt_num": num,
                    "pvt_term": round(term, 6),
                    "pvt": round(st["pvt"], 6),
                }
            )
    state.update((json.dumps(st),))
    yield pd.DataFrame(
        rows, columns=["series", "day_s", "pvt_num", "pvt_term", "pvt"]
    )


def streaming_pvt(daily: DataFrame) -> DataFrame:
    """Price Volume Trend over a stream of daily (series, day_s, cc,
    vol) partials (I44): keyed state carries the previous qualifying
    close and the running cumulative across micro-batches; replayed
    days are idempotently skipped; zero-close days are excluded
    exactly like batch ts_pvt."""
    return daily.groupBy("series").applyInPandasWithState(
        _pvt_state_fn,
        outputStructType=_PVT_OUT_SCHEMA,
        stateStructType=_PVT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming media router (I45): G19's sniff+route live on an
# ingest stream. Stateless — the whole point: because every probe is
# a pure projection (codegen column expressions, no keyed state, no
# shuffle), the SAME route-and-probe plan runs unchanged under
# readStream, so a media lake's ingest path classifies payloads
# micro-batch by micro-batch at projection cost and the batch/stream
# results are identical by construction. The union branches each
# filter the sniffed frame; Structured Streaming pushes the filters
# into each branch exactly like the batch plan.


def streaming_media_router(media: DataFrame) -> DataFrame:
    """Route a stream of (media_id, payload) rows to the matching
    container probe and emit the unified media-grain row (container,
    width/height, duration_ms, codec) — the live form of
    media_container_router over all eight container families."""
    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.operators.ebml_probe import (
        parse_ebml_headers,
    )
    from timescaledb_event_streamer_spark.operators.mp3_probe import (
        parse_mp3_headers,
    )
    from timescaledb_event_streamer_spark.operators.mp4_probe import (
        parse_mp4_headers,
    )
    from timescaledb_event_streamer_spark.operators.multimodal import (
        parse_jpeg_headers,
        parse_media_headers,
        sniff_format,
    )
    from timescaledb_event_streamer_spark.operators.ogg_probe import (
        parse_ogg_headers,
    )

    sniffed = media.select(
        "media_id", "payload", sniff_format(F.col("payload")).alias("c")
    )
    out_cols = [
        "media_id", "container", "width", "height", "duration_ms", "codec"
    ]
    fixed = parse_media_headers(
        sniffed.filter(F.col("c").isin("png", "riff", "gif"))
    ).select(
        "media_id",
        "container",
        "width",
        "height",
        "duration_ms",
        F.when(F.col("container") == "wav", "pcm16le").alias("codec"),
    )
    jpeg = parse_jpeg_headers(sniffed.filter(F.col("c") == "jpeg")).select(
        "media_id",
        F.lit("jpeg").alias("container"),
        "width",
        "height",
        F.lit(None).cast("long").alias("duration_ms"),
        F.when(F.col("progressive"), "jpeg_progressive")
        .otherwise("jpeg_baseline")
        .alias("codec"),
    )
    mp4 = parse_mp4_headers(sniffed.filter(F.col("c") == "mp4")).select(
        "media_id",
        F.lit("mp4").alias("container"),
        "width",
        "height",
        "duration_ms",
        F.col("video_codec").alias("codec"),
    )
    mp3 = parse_mp3_headers(sniffed.filter(F.col("c") == "mp3")).select(
        "media_id",
        F.lit("mp3").alias("container"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.when(
            (F.col("mpeg_version") == 1) & (F.col("layer") == 3),
            "mpeg1_layer3",
        ).alias("codec"),
    )
    webm = parse_ebml_headers(sniffed.filter(F.col("c") == "webm")).select(
        "media_id",
        F.col("doc_type").alias("container"),
        "width",
        "height",
        F.lit(None).cast("long").alias("duration_ms"),
        F.col("video_codec").alias("codec"),
    )
    ogg = parse_ogg_headers(sniffed.filter(F.col("c") == "ogg")).select(
        "media_id",
        F.lit("ogg").alias("container"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.col("codec"),
    )
    return (
        fixed.select(out_cols)
        .unionByName(jpeg.select(out_cols))
        .unionByName(mp4.select(out_cols))
        .unionByName(mp3.select(out_cols))
        .unionByName(webm.select(out_cols))
        .unionByName(ogg.select(out_cols))
    )
