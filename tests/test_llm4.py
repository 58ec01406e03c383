"""Planted-value tests for plans/queries_llm4.py (TF-IDF top-k, BM25
scoring, Jensen-Shannon source divergence) and the Holt linear
smoother (plans/queries_timeseries3.py ts_holt_linear) — each checked
against a pure-Python re-derivation, not against the operator itself."""

from __future__ import annotations

import datetime
import math

from timescaledb_event_streamer_spark.plans.queries_llm4 import (
    bm25_search,
    js_divergence,
    tfidf_topk,
)
from timescaledb_event_streamer_spark.plans.queries_timeseries3 import holt_linear


def _docs(spark, rows):
    """rows: list of (text, source)."""
    return spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, source string",
    )


# ---------------------------------------------------------------- tfidf


def test_tfidf_rare_term_outranks_common_term(spark):
    docs = _docs(
        spark,
        [
            ("apple apple zebra", "s"),  # zebra appears only here
            ("apple banana", "s"),
            ("apple banana", "s"),
        ],
    )
    out = [r.asDict() for r in tfidf_topk(docs, k=1).collect()]
    top0 = next(r for r in out if r["doc_id"] == 0)
    # doc 0: tf(apple)=2 df=3 -> 2*(ln(4/4)+1)=2.0
    #        tf(zebra)=1 df=1 -> 1*(ln(4/2)+1)=1.693...
    # the common term wins on raw tf here; check the exact value
    assert top0["term"] == "apple"
    assert top0["tfidf"] == 2.0
    top1 = next(r for r in out if r["doc_id"] == 1)
    # apple and banana both tf=1; banana df=2 idf=ln(4/3)+1=1.2876...
    # beats apple df=3 idf=1.0
    assert top1["term"] == "banana"
    assert top1["tfidf"] == round(math.log(4 / 3) + 1, 6)


def test_tfidf_rank_ties_break_on_term(spark):
    docs = _docs(spark, [("x y", "s"), ("x y", "s")])
    out = [r.asDict() for r in tfidf_topk(docs, k=2).collect()]
    d0 = sorted((r for r in out if r["doc_id"] == 0), key=lambda r: r["rk"])
    assert [r["term"] for r in d0] == ["x", "y"]  # equal score -> lexical


# ----------------------------------------------------------------- bm25


def _bm25_ref(corpus, terms, k1=1.2, b=0.75):
    toks = [t.split(" ") for t in corpus]
    n = len(corpus)
    avgdl = sum(len(t) for t in toks) / n
    df = {q: sum(1 for t in toks if q in t) for q in terms}
    out = []
    for i, t in enumerate(toks):
        s = 0.0
        for q in terms:
            tf = t.count(q)
            if tf:
                idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
                s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        out.append((i, round(s, 6)))
    return dict(out)


def test_bm25_matches_pure_python_reference(spark):
    corpus = [
        "join join hash scan filter",
        "row batch merge sort window",
        "join vector vector spark table",
        "scan scan scan scan scan scan scan scan",
    ]
    docs = _docs(spark, [(t, "s") for t in corpus])
    terms = ("join", "scan", "vector")
    got = {r["doc_id"]: r["bm25"] for r in bm25_search(docs, terms, top_n=10).collect()}
    ref = _bm25_ref(corpus, terms)
    for i in range(len(corpus)):
        if ref[i] > 0:
            assert got[i] == ref[i], f"doc {i}: {got[i]} != {ref[i]}"
    # the no-match doc is scored 0 and still ranked (top_n covers all)
    assert got[1] == 0.0


def test_bm25_tf_saturation_prefers_term_diversity(spark):
    # one doc spams a single term, another matches two distinct terms;
    # with k1=1.2 saturation the diverse doc must win
    docs = _docs(
        spark,
        [
            ("join join join join join join join join", "s"),
            ("join scan filler filler filler filler filler filler", "s"),
            ("filler other words here again more stuff pad", "s"),
        ],
    )
    rows = bm25_search(docs, ("join", "scan"), top_n=3).collect()
    assert rows[0]["doc_id"] == 1 and rows[0]["n_terms_matched"] == 2


# ------------------------------------------------------------------ jsd


def test_jsd_identical_sources_is_zero(spark):
    docs = _docs(spark, [("a b c", "s1"), ("a b c", "s2")])
    row = js_divergence(docs).collect()[0]
    assert row["jsd_bits"] == 0.0
    assert row["n_union_tokens"] == 3 and row["n_shared_tokens"] == 3


def test_jsd_disjoint_sources_is_one_bit(spark):
    docs = _docs(spark, [("a a b", "s1"), ("c d e", "s2")])
    row = js_divergence(docs).collect()[0]
    assert row["jsd_bits"] == 1.0  # maximal JSD in bits
    assert row["n_shared_tokens"] == 0 and row["n_union_tokens"] == 5


def test_jsd_matches_pure_python_reference(spark):
    docs = _docs(
        spark,
        [("a a b c", "s1"), ("a b b d", "s2"), ("c c c a", "s3")],
    )
    dist = {
        "s1": {"a": 0.5, "b": 0.25, "c": 0.25},
        "s2": {"a": 0.25, "b": 0.5, "d": 0.25},
        "s3": {"c": 0.75, "a": 0.25},
    }

    def jsd(p, q):
        # mirror the engine's association exactly: the per-token
        # contribution is one A+B+C expression, THEN the fold adds it
        tot = 0.0
        for t in sorted(set(p) | set(q)):
            pv, qv = p.get(t, 0.0), q.get(t, 0.0)
            m = (pv + qv) / 2
            jc = (
                -(m * math.log2(m))
                + (0.5 * pv * math.log2(pv) if pv else 0.0)
                + (0.5 * qv * math.log2(qv) if qv else 0.0)
            )
            tot += jc
        return round(tot, 6)

    got = {
        (r["source_a"], r["source_b"]): r["jsd_bits"]
        for r in js_divergence(docs).collect()
    }
    for (a, b), v in got.items():
        assert v == jsd(dist[a], dist[b]), f"{a}/{b}"
    assert len(got) == 3


# ----------------------------------------------------------------- holt


def _events(spark, series):
    """series: dict name -> list of daily values (one event per day)."""
    rows = []
    eid = 0
    for name, vals in series.items():
        for i, v in enumerate(vals):
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i),
                    1,
                    name,
                    float(v),
                    "{}",
                )
            )
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _round6(x):
    """Round to 6 dp the way Spark's F.round does for doubles —
    BigDecimal.valueOf(x).setScale(6, HALF_UP): the SHORTEST decimal
    repr of the double (repr(x) == Double.toString(x) numerically),
    ties away from zero. Python's round() is half-to-even on the
    exact binary value, which disagrees exactly on 7th-digit ties
    (e.g. 75.6336125 -> 75.633612 vs Spark/DuckDB 75.633613) — the
    adjudicated r5 Holt property flake."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def _holt_ref(xs, alpha=0.5, beta=0.3):
    # standard init: level at the SECOND point, trend = first diff
    lvl, tr = xs[1], xs[1] - xs[0]
    for y in xs[2:]:
        nl = alpha * y + (1 - alpha) * (lvl + tr)
        tr = beta * (nl - lvl) + (1 - beta) * tr
        lvl = nl
    return _round6(lvl), _round6(tr), _round6(lvl + tr)


def test_holt_matches_pure_python_recurrence(spark):
    series = {
        "up": [1.0, 2.0, 3.5, 4.0, 6.0, 7.25],
        "noisy": [10.0, 8.0, 11.0, 7.5, 12.0],
    }
    out = {r["series"]: r for r in holt_linear(_events(spark, series)).collect()}
    for name, vals in series.items():
        lvl, tr, fc = _holt_ref(vals)
        assert out[name]["n_days"] == len(vals)
        assert out[name]["level"] == lvl
        assert out[name]["trend"] == tr
        assert out[name]["forecast_1"] == fc


def test_holt_rounding_tie_regression(spark):
    """Pinned counterexamples from the r5 property flake: series whose
    level/trend/forecast land exactly on a 7th-decimal-digit tie
    (…125, …625), where Python round() (half-even) and Spark F.round
    (HALF_UP) disagree. The fold was adjudicated correct — Spark and
    DuckDB both round half-up — so the reference must too."""
    tie_series = [
        [[-4833, 4626], [5966, 8396, 9791], [-8725], [680, 225]],
        [[1302], [3849, -5549, -2905], [4261, -5346], [222, -4203]],
        [[-453, -6048], [-4946, 1272], [-3875], [6361, -2507]],
    ]
    rows, eid = [], 0
    for ex, days in enumerate(tie_series):
        for di, vals in enumerate(days):
            for v in vals:
                rows.append(
                    (
                        eid,
                        datetime.datetime(2024, 1, 1) + datetime.timedelta(days=di),
                        1,
                        f"tie{ex}",
                        v / 100.0,
                        "{}",
                    )
                )
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r["series"]: r for r in holt_linear(df).collect()}
    for ex, days in enumerate(tie_series):
        xs = [sum(vals) / (100.0 * len(vals)) for vals in days]
        lvl, tr, fc = _holt_ref(xs)
        r = got[f"tie{ex}"]
        assert (r["level"], r["trend"], r["forecast_1"]) == (lvl, tr, fc), ex
    # the first series' forecast is the canonical tie: 75.6336125
    assert got["tie0"]["forecast_1"] == 75.633613  # HALF_UP, not 75.633612


def test_holt_linear_series_forecasts_next_point(spark):
    # a perfectly linear series: level tracks the last point, trend
    # the slope, so the 1-step forecast is the exact next value
    vals = [2.0 + 3.0 * i for i in range(8)]
    out = holt_linear(_events(spark, {"lin": vals})).collect()[0]
    assert out["forecast_1"] == vals[-1] + 3.0
    assert out["trend"] == 3.0


def test_holt_requires_three_days(spark):
    out = holt_linear(_events(spark, {"short": [1.0, 2.0]})).collect()
    assert out == []


# ------------------------------------------------------- streaming JSD


def test_jsd_stream_counts_match_batch(spark, tmp_path):
    """I18: the JSD drift monitor in LIVE mode — token counting is an
    associative aggregate, so it runs as a complete-mode streaming
    aggregation over a document stream; the JSD read over those
    counts on each trigger must equal the batch operator."""
    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.plans.queries_llm4 import (
        js_divergence,
        js_divergence_from_counts,
    )

    docs = _docs(
        spark,
        [
            ("a a b c join", "s1"),
            ("a b b d scan", "s2"),
            ("c c c a join scan", "s3"),
            ("b d d a a scan", "s1"),
        ],
    )
    d = str(tmp_path / "docs_stream")
    docs.write.parquet(d)

    stream = spark.readStream.schema(docs.schema).parquet(d)
    cnt = (
        stream.select("source", F.explode(F.split("text", " ")).alias("t"))
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    q = (
        cnt.writeStream.format("memory")
        .queryName("jsd_counts_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["source_a"], r["source_b"]): r.asDict()
        for r in js_divergence_from_counts(
            spark.sql("SELECT * FROM jsd_counts_stream")
        ).collect()
    }
    want = {
        (r["source_a"], r["source_b"]): r.asDict()
        for r in js_divergence(docs).collect()
    }
    assert set(got) == set(want) and len(want) == 3
    for k in want:
        assert got[k] == want[k], k


# -------------------------------------------------------- sparse cosine


def test_sparse_cosine_identical_docs_score_one(spark):
    from timescaledb_event_streamer_spark.plans.queries_llm4 import (
        sparse_cosine_pairs,
    )

    docs = _docs(
        spark,
        [
            ("alpha beta gamma delta", "s"),
            ("alpha beta gamma delta", "s"),
            ("epsilon zeta eta theta", "s"),
        ],
    )
    rows = sparse_cosine_pairs(docs, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["cosine"] == 1.0 and r["n_shared_terms"] == 4


def test_sparse_cosine_matches_pure_python_reference(spark):
    import math

    from timescaledb_event_streamer_spark.plans.queries_llm4 import (
        sparse_cosine_pairs,
    )

    corpus = [
        "join hash scan join",
        "join hash merge sort",
        "scan scan filter scan",
    ]
    docs = _docs(spark, [(t, "s") for t in corpus])
    n = len(corpus)
    tf = [{} for _ in corpus]
    for i, t in enumerate(corpus):
        for w_ in t.split(" "):
            tf[i][w_] = tf[i].get(w_, 0) + 1
    dfc = {}
    for d in tf:
        for w_ in d:
            dfc[w_] = dfc.get(w_, 0) + 1
    wts = [
        {t: c * (math.log((1 + n) / (1 + dfc[t])) + 1) for t, c in d.items()}
        for d in tf
    ]

    def cos(a, b):
        shared = sorted(set(a) & set(b))
        if not shared:
            return None
        dot = 0.0
        for t in shared:
            dot += a[t] * b[t]
        na = math.sqrt(sum(a[t] * a[t] for t in sorted(a)))
        nb = math.sqrt(sum(b[t] * b[t] for t in sorted(b)))
        return round(dot / (na * nb), 6)

    got = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in sparse_cosine_pairs(docs, threshold=0.0).collect()
    }
    for i in range(n):
        for j in range(i + 1, n):
            ref = cos(wts[i], wts[j])
            if ref is not None:
                assert got[(i, j)] == ref, (i, j)


def test_sparse_cosine_max_df_drops_stopword_grade_terms(spark):
    from timescaledb_event_streamer_spark.plans.queries_llm4 import (
        sparse_cosine_pairs,
    )

    # "the" appears in every doc; the real overlap is only via "the"
    docs = _docs(
        spark,
        [
            ("the alpha beta", "s"),
            ("the gamma delta", "s"),
            ("the epsilon zeta", "s"),
        ],
    )
    open_pairs = sparse_cosine_pairs(docs, threshold=0.0).collect()
    assert len(open_pairs) == 3  # every pair shares "the"
    capped = sparse_cosine_pairs(docs, threshold=0.0, max_df=2).collect()
    assert capped == []  # df("the")=3 > 2 -> no candidates at all


def test_sparse_cosine_relative_cap_binds_and_bounds_term_groups(spark):
    """D21 contract: max_df_denom resolves to max(ceil(N/denom), 2)
    in-plan, drops stopword-grade terms from CANDIDATE GENERATION
    (not just scoring), and therefore bounds every per-term join
    group by the cap."""
    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.plans.queries_llm4 import (
        _tfidf_weights,
        sparse_cosine_pairs,
    )

    # 6 docs; "the" in all 6, "big" in 3, distinctive tail elsewhere.
    # N=6, denom=2 -> cap = max(ceil(6/2), 2) = 3: "the" (df 6) is
    # dropped, "big" (df 3) survives.
    texts = [
        ("the big alpha beta", "s"),
        ("the big alpha beta", "s"),
        ("the big gamma delta", "s"),
        ("the epsilon zeta", "s"),
        ("the eta theta", "s"),
        ("the iota kappa", "s"),
    ]
    docs = _docs(spark, texts)
    capped = {
        (r["doc_a"], r["doc_b"]): r
        for r in sparse_cosine_pairs(docs, threshold=0.0, max_df_denom=2).collect()
    }
    # pairs joined ONLY via "the" vanish entirely (candidate-level drop)
    assert (3, 4) not in capped and (3, 5) not in capped and (4, 5) not in capped
    # identical docs still score 1.0 on their surviving terms
    assert capped[(0, 1)]["cosine"] == 1.0
    # "big"-sharing pair survives; after dropping "the" the shared
    # vocabulary is exactly {big}
    assert capped[(0, 2)]["n_shared_terms"] == 1

    # per-term group bound: no surviving term has df above the cap
    w = _tfidf_weights(docs)
    cap = 3
    surviving = (
        w.filter(F.col("df") <= F.greatest(
            F.expr("(n_docs + 1) div 2"), F.lit(2).cast("long")))
        .groupBy("term").agg(F.count(F.lit(1)).alias("g"))
        .agg(F.max("g").alias("m")).collect()[0]["m"]
    )
    assert surviving <= cap


def test_sparse_cosine_inrow_dots_parity(spark):
    """r11: the short-vector in-row dot fold (the D20 sample-form
    path) must produce row-for-row identical output to the default
    per-shared-term shuffle fold — same pairs, same n_shared_terms,
    same cosine doubles — including with a df cap in play."""
    from timescaledb_event_streamer_spark.plans.queries_llm4 import (
        sparse_cosine_pairs,
    )

    texts = [
        ("join hash scan join vector", "s"),
        ("join hash merge sort spark", "s"),
        ("scan scan filter scan join", "s"),
        ("vector spark join hash scan", "s"),
        ("the the the alpha beta", "s"),
        ("the gamma beta alpha zeta", "s"),
    ]
    docs = _docs(spark, texts)

    def canon(df):
        return sorted(
            (r["doc_a"], r["doc_b"], r["n_shared_terms"], repr(r["cosine"]))
            for r in df.collect()
        )

    for kw in ({}, {"max_df_denom": 2}):
        shuffle = canon(sparse_cosine_pairs(docs, threshold=0.0, **kw))
        inrow = canon(
            sparse_cosine_pairs(docs, threshold=0.0, inrow_dots=True, **kw)
        )
        assert shuffle == inrow, kw
        assert len(shuffle) > 0, kw


def test_dedup_sparse_cosine_capped_shingle_form(spark, sf_small):
    """The registered D21 runs UNSAMPLED: its doc population equals
    every document with >= 3 tokens (no calibration-sample modulus),
    near-dup pairs survive the cap, and scores stay in (0, 1]."""
    from timescaledb_event_streamer_spark.plans.queries_llm4 import (
        dedup_sparse_cosine_capped,
    )

    rows = dedup_sparse_cosine_capped(spark, sf_small).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0.9 <= r["cosine"] <= 1.0
        assert r["n_shared_terms"] > 0


# --------------------------------------------------------- recall eval


def test_recall_eval_consistent_with_its_inputs(spark, sf_small):
    """The summary row must be exactly the join of the two certified
    inputs: recall = |lsh_top20 ∩ exact_top20| / 20, and the deepest
    retrieved exact rank can't exceed k."""
    from timescaledb_event_streamer_spark.plans.queries_llm4 import ann_recall_eval
    from timescaledb_event_streamer_spark.plans.registry import all_queries

    row = ann_recall_eval(spark, sf_small).collect()[0]
    exact = [
        r["vec_id"] for r in all_queries()["ann_bruteforce_topk"](spark, sf_small).collect()
    ]
    approx = {
        r["vec_id"] for r in all_queries()["ann_lsh_topk"](spark, sf_small).collect()
    }
    hits = [i + 1 for i, v in enumerate(exact) if v in approx]
    assert row["k"] == 20
    assert row["n_hits"] == len(hits) > 0
    assert row["recall"] == round(len(hits) / 20.0, 6)
    assert row["max_exact_rank_hit"] == max(hits) <= 20


# ------------------------------------------------------ property tests


def test_holt_property_matches_reference_on_random_series(spark):
    """Property: on arbitrary multi-event-per-day series (2-dp
    values, so the integer-cents daily mean is exact in both
    engines), the fold equals the pure-Python recurrence exactly.
    Examples are generated up front and namespaced by series name so
    ONE Spark run covers them all."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    cents = st.integers(min_value=-10000, max_value=10000)
    day = st.lists(cents, min_size=1, max_size=3)  # events per day
    series = st.lists(day, min_size=3, max_size=10)

    collected = []

    @settings(max_examples=20, deadline=None)
    @given(series)
    def gen(s):
        collected.append(s)

    gen()

    rows, eid = [], 0
    for ex, s in enumerate(collected):
        for di, vals in enumerate(s):
            for v in vals:
                rows.append(
                    (
                        eid,
                        datetime.datetime(2024, 1, 1) + datetime.timedelta(days=di),
                        1,
                        f"s{ex}",
                        v / 100.0,
                        "{}",
                    )
                )
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r["series"]: r for r in holt_linear(df).collect()}
    for ex, s in enumerate(collected):
        xs = [sum(vals) / (100.0 * len(vals)) for vals in s]
        lvl, tr, fc = _holt_ref(xs)
        r = got[f"s{ex}"]
        assert r["n_days"] == len(s)
        assert (r["level"], r["trend"], r["forecast_1"]) == (lvl, tr, fc), ex


def test_sparse_cosine_inrow_and_join_paths_agree(spark, monkeypatch):
    """The r7 hybrid candidate generator: posting lists <= _INROW_DF
    pair in-row, longer ones keep the distributed self-join. Forcing
    the boundary to 0 (all join) and to huge (all in-row) must give
    the identical pair set as the default hybrid."""
    import timescaledb_event_streamer_spark.plans.queries_llm4 as q4

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d f"),
            (3, "a b c g h"),
            (4, "x y z w v"),
            (5, "x y z w u"),
        ],
        "doc_id long, text string",
    )

    def run():
        return sorted(
            tuple(r)
            for r in q4.sparse_cosine_pairs(docs, threshold=0.0).collect()
        )

    default = run()
    monkeypatch.setattr(q4, "_INROW_DF", 0)  # everything via the join
    all_join = run()
    monkeypatch.setattr(q4, "_INROW_DF", 1 << 20)  # everything in-row
    all_inrow = run()
    assert default == all_join == all_inrow
    assert len(default) > 0
