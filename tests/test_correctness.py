"""Spark-vs-DuckDB oracle cross-check at sf0.001 (fast) — the same
comparison the driver gate runs at sf0.01. tools/check.py runs the
full set; here we run every oracle-backed query at the small SF so
regressions surface in the unit suite."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from timescaledb_event_streamer_spark.plans.registry import all_oracles, all_queries
from timescaledb_event_streamer_spark.sources.tables import TABLES

from tools.check import canon


@pytest.fixture(scope="module")
def oracle_con(sf_small):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_small}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(all_oracles()))
def test_matches_duckdb_oracle(spark, sf_small, oracle_con, name):
    sdf = all_queries()[name](spark, sf_small).toPandas()
    odf = oracle_con.sql(all_oracles()[name]).df()
    s, o = canon(sdf), canon(odf)
    assert list(s.columns) == list(o.columns)
    assert len(s) == len(o)
    pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name", sorted(set(all_queries()) - set(all_oracles())))
def test_rows_only_queries_return_rows(spark, sf_small, name):
    df = all_queries()[name](spark, sf_small)
    assert len(df.columns) > 0
    df.limit(1).collect()  # plan executes
