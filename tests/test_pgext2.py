"""Tests for plans/queries_pgext2.py: enum/domain type-kind
semantics."""

from __future__ import annotations

import datetime

T0 = datetime.datetime(2024, 3, 1)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        [(i, T0, uid, et, v, "p") for i, (uid, et, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_enum_catalog_ordinals_and_domain_checks(spark, tmp_path):
    """Three labels -> sort orders 1..3 in registration (label) order;
    cumulative counts follow the ORDINAL order; values outside
    [0, 100] count as domain violations."""
    from timescaledb_event_streamer_spark.plans.queries_pgext2 import (
        pg_enum_domain,
    )

    rows = [
        (1, "beta", 50.0),
        (2, "beta", 150.0),   # domain violation (> 100)
        (3, "alpha", -1.0),   # domain violation (< 0)
        (4, "gamma", 99.99),
        (5, "beta", 0.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {r["enumlabel"]: r for r in pg_enum_domain(spark, sf).collect()}
    assert [out[k]["enumsortorder"] for k in ("alpha", "beta", "gamma")] == [1, 2, 3]
    assert all(r["enumtypid"] == 16384 for r in out.values())
    # cumulative in ordinal order: alpha(1) -> +beta(3) -> +gamma(1)
    assert out["alpha"]["cum_events_by_ordinal"] == 1
    assert out["beta"]["cum_events_by_ordinal"] == 4
    assert out["gamma"]["cum_events_by_ordinal"] == 5
    assert out["alpha"]["n_domain_violations"] == 1
    assert out["beta"]["n_domain_violations"] == 1
    assert out["gamma"]["n_domain_violations"] == 0
    assert out["beta"]["violation_rate"] == round(1 / 3, 6)


def test_enum_ordinal_differs_from_insertion(spark, tmp_path):
    """Sort order binds to the catalog, not to event arrival order:
    a label seen later but sorting earlier gets the lower ordinal."""
    from timescaledb_event_streamer_spark.plans.queries_pgext2 import (
        pg_enum_domain,
    )

    rows = [(1, "zz_last", 1.0), (2, "aa_first", 2.0)]
    sf = _write_events(spark, tmp_path, rows)
    out = {r["enumlabel"]: r for r in pg_enum_domain(spark, sf).collect()}
    assert out["aa_first"]["enumsortorder"] == 1
    assert out["zz_last"]["enumsortorder"] == 2


def test_enum_array_resolves_per_element(spark, tmp_path):
    """Enum ARRAYS decode element-wise through the same catalog (the
    reference wires arrayConverter(enum2string) for enum element
    types, internal/typemanager/typemanager.go:256): a '{a,b}' wire
    literal parses with the J6 brace-strip idiom and every element
    resolves to its enumsortorder."""
    import pyspark.sql.functions as F

    from timescaledb_event_streamer_spark.plans.queries_pgext2 import (
        pg_enum_domain,
    )

    rows = [(1, "red", 1.0), (2, "green", 2.0), (3, "blue", 3.0)]
    sf = _write_events(spark, tmp_path, rows)
    catalog = pg_enum_domain(spark, sf).select("enumlabel", "enumsortorder")
    wire = spark.createDataFrame(
        [(10, "{red,blue}"), (11, "{green,green,red}")], "row_id long, arr string"
    )
    decoded = wire.select(
        "row_id",
        F.posexplode(
            F.split(F.regexp_replace("arr", r"[{}]", ""), ",")
        ).alias("pos", "enumlabel"),
    ).join(catalog, "enumlabel")
    got = {
        (r["row_id"], r["pos"]): (r["enumlabel"], r["enumsortorder"])
        for r in decoded.collect()
    }
    # catalog order: blue=1, green=2, red=3 (label order)
    assert got[(10, 0)] == ("red", 3)
    assert got[(10, 1)] == ("blue", 1)
    assert got[(11, 0)] == ("green", 2)
    assert got[(11, 2)] == ("red", 3)
    # every element resolved (no unknown labels dropped by the join)
    assert len(got) == 5


def test_interval_flattening_and_uuid_audit(spark, tmp_path):
    """Planted ids exercise singular ('1 mon 1 day'), plural, and
    zero-date interval forms; flattening uses the reference's exact
    month constant (365.25/12 days = 2_629_800_000_000 us). UUID
    version/variant nibbles recompute from hashlib."""
    import hashlib

    from timescaledb_event_streamer_spark.plans.queries_pgext2 import (
        _US_PER_DAY,
        _US_PER_MONTH,
        pg_uuid_interval,
    )

    # (event_id, user_id): event 1/user 1 -> 1 mon 1 day; event 0/user 0
    # -> zero date part; event 3/user 82 -> 3 mons 2 days
    rows = [(1, "a", 1.0), (0, "a", 1.0), (3, "a", 1.0)]
    uids = {1: 1, 0: 0, 3: 82}

    spark.createDataFrame(
        [
            (eid, T0, uids[eid], et, v, "p")
            for (eid, et, v) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["event_id"]: r for r in pg_uuid_interval(spark, str(tmp_path)).collect()}

    r1 = out[1]
    assert r1["interval_text"].startswith("1 mon 1 day ")
    t1 = (1 * 7919) % 86_400_000_000
    assert r1["interval_us"] == t1 + 1 * _US_PER_DAY + 1 * _US_PER_MONTH

    r0 = out[0]
    assert r0["interval_text"] == "00:00:00.000000"
    assert r0["interval_us"] == 0

    r3 = out[3]
    assert "3 mons 2 days" in r3["interval_text"]
    t3 = (3 * 7919) % 86_400_000_000
    assert r3["interval_us"] == t3 + 2 * _US_PER_DAY + 3 * _US_PER_MONTH

    for eid, r in out.items():
        hx = hashlib.md5(str(eid).encode()).hexdigest()
        want_uuid = f"{hx[:8]}-{hx[8:12]}-{hx[12:16]}-{hx[16:20]}-{hx[20:32]}"
        assert r["uuid_text"] == want_uuid
        assert r["uuid_version"] == int(hx[12], 16)
        assert r["uuid_variant_rfc"] == (8 <= int(hx[16], 16) <= 11)
