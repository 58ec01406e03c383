"""Moment-sum dtype flag (VERDICT r6 item 7): the DECIMAL(38,0) path
must be value-identical to the int64 path on the testdata — same
plans, same final doubles — so flipping SPARK_GRAFT_MOMENT_SUMS at
100 TB is purely a headroom change, never a value change."""

from __future__ import annotations

import pytest

from timescaledb_event_streamer_spark.functions.exact import (
    MOMENT_SUM_ENV,
    moment_sum_mode,
)
from timescaledb_event_streamer_spark.plans.registry import all_queries

MOMENT_QUERIES = ["ts_stats_agg_2d", "embedding_covariance"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", MOMENT_QUERIES)
def test_decimal_moment_sums_match_long_exactly(spark, sf_small, name, monkeypatch):
    q = all_queries()[name]
    monkeypatch.delenv(MOMENT_SUM_ENV, raising=False)
    long_df = q(spark, sf_small)
    long_rows = _rows(long_df)
    monkeypatch.setenv(MOMENT_SUM_ENV, "decimal")
    dec_df = q(spark, sf_small)
    # the OUTPUT schema is dtype-flag-invariant (sums cast to double
    # before the final expressions), so the driver contract is stable
    assert dec_df.schema == long_df.schema
    assert _rows(dec_df) == long_rows
    assert len(long_rows) > 0


def test_decimal_mode_actually_aggregates_decimal(spark, sf_small, monkeypatch):
    """The flag must reach the aggregate: under decimal mode the
    covariance partial-sum column is DECIMAL(38,0)."""
    from timescaledb_event_streamer_spark.plans.queries_round6 import (
        covariance_sums,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    emb = load(spark, sf_small, "embeddings")
    monkeypatch.setenv(MOMENT_SUM_ENV, "decimal")
    assert covariance_sums(emb).schema["s"].dataType.simpleString() == "decimal(38,0)"
    monkeypatch.delenv(MOMENT_SUM_ENV)
    assert covariance_sums(emb).schema["s"].dataType.simpleString() == "bigint"


def test_bad_mode_rejected(monkeypatch):
    monkeypatch.setenv(MOMENT_SUM_ENV, "float")
    with pytest.raises(ValueError, match="long.*decimal"):
        moment_sum_mode()
