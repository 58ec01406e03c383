"""Table filter semantics vs the reference implementation
(internal/systemcatalog/tablefiltering/tablefilter.go and its
tablefilter_test.go cases)."""

from __future__ import annotations

import re

import pytest
from hypothesis import given
from hypothesis import strategies as st

from timescaledb_event_streamer_spark.catalog.tablefilter import (
    TableFilter,
    pattern_to_regex,
)

IDENT = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=1, max_size=12
).filter(lambda s: not s[0].isdigit())


def test_star_matches_any_span():
    f = TableFilter(includes=["public.cust*"], accepted_by_default=False)
    assert f.enabled("public", "customers")
    assert f.enabled("public", "cust")
    assert not f.enabled("public", "orders")
    assert not f.enabled("other", "customers")


def test_question_mark_matches_exactly_one():
    # reference: '?' -> '.{1}' (tablefilter.go:256)
    f = TableFilter(includes=["public.err?r"], accepted_by_default=False)
    assert f.enabled("public", "error")
    assert not f.enabled("public", "errr")  # zero chars
    assert not f.enabled("public", "errror")  # two chars


def test_plus_matches_one_or_more():
    # reference: '+' -> '.+?' (tablefilter.go:259)
    f = TableFilter(includes=["public.a+b"], accepted_by_default=False)
    assert f.enabled("public", "axb")
    assert f.enabled("public", "axxxb")
    assert not f.enabled("public", "ab")


def test_excludes_win_over_includes():
    # reference evaluates excludes first (tablefilter.go:69-83)
    f = TableFilter(
        includes=["public.*"], excludes=["public.secret*"], accepted_by_default=False
    )
    assert f.enabled("public", "events")
    assert not f.enabled("public", "secret_table")


def test_unquoted_folds_lowercase():
    # reference folds unquoted identifiers (tablefilter.go:190)
    f = TableFilter(includes=["PUBLIC.EVENTS"], accepted_by_default=False)
    assert f.enabled("public", "events")


def test_accepted_by_default():
    assert TableFilter(accepted_by_default=True).enabled("any", "thing")
    assert not TableFilter(accepted_by_default=False).enabled("any", "thing")


def test_invalid_pattern_rejected():
    with pytest.raises(ValueError):
        TableFilter(includes=["no_dot_separator"])
    with pytest.raises(ValueError):
        TableFilter(includes=["public.bad-char"])


@given(IDENT)
def test_literal_pattern_matches_only_itself(ident):
    rx = pattern_to_regex(ident)
    assert re.match(rx, ident)
    assert not re.match(rx, ident + "x")
    assert not re.match(rx, "x" + ident) or ident.startswith("x")


@given(IDENT, IDENT)
def test_star_prefix_property(prefix, rest):
    rx = pattern_to_regex(prefix + "*")
    assert re.match(rx, prefix + rest)


def test_spark_column_agrees_with_python(spark):
    f = TableFilter(
        includes=["public.*e*"], excludes=["public.err?r"], accepted_by_default=False
    )
    names = ["click", "error", "purchase", "signup", "view"]
    df = spark.createDataFrame([(n,) for n in names], ["t"])
    import pyspark.sql.functions as F

    got = {
        r["t"]: r["ok"]
        for r in df.select("t", f.column(F.lit("public"), F.col("t")).alias("ok")).collect()
    }
    for n in names:
        assert got[n] == f.enabled("public", n), n


def test_sanitize_topic_matches_reference_charset(spark):
    """internal/eventing/namingstrategy/sanitization.go: everything
    outside [A-Za-z0-9._-] becomes '_'."""
    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.catalog.naming import sanitize_topic

    rows = (
        spark.createDataFrame(
            [("ts.public.ok-1",), ("ts.pub lic.tab!e",), ("pfx.schema.täble",)],
            ["t"],
        )
        .select(sanitize_topic(F.col("t")).alias("s"))
        .collect()
    )
    assert [r["s"] for r in rows] == [
        "ts.public.ok-1",
        "ts.pub_lic.tab_e",
        "pfx.schema.t_ble",
    ]
