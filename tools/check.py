"""Local replica of the driver's correctness gate.

Runs every queries() entry at a given SF, runs the matching
oracle_sql() in DuckDB over the same parquet views, and compares
row count, column names, and order-insensitive values (exact string
match after canonicalization — stricter than needed, so passing here
should imply passing the driver's hash compare).

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from timescaledb_event_streamer_spark.session import get_spark
from timescaledb_event_streamer_spark.sources.tables import TABLES


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            # normalize int widths (DuckDB int32/int128 vs Spark
            # int64) to the driver's serialization
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            vals = df[c].dropna()
            if len(vals) and all(
                isinstance(v, int) and not isinstance(v, bool) for v in vals
            ):
                # DuckDB HUGEINT arrives as Python ints — a dtype
                # divergence the driver's hash would see. Nullable
                # Int64 so int+None columns don't abort the run.
                df[c] = df[c].astype("Int64" if len(vals) < len(df[c]) else "int64")
            else:
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from __spark_entry__ import oracle_sql, queries

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = queries()
    oracles = oracle_sql()
    failures = []
    for name, builder in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = builder(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only) [{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                print(f"      WARNING: {name} returned 0 rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        s, o = canon(sdf), canon(odf)
        if list(s.columns) != list(o.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(s.columns)} != {list(o.columns)}")
            continue
        if len(s) != len(o):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(s)} != {len(o)}")
            continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=True, check_exact=True)
        except AssertionError as e:
            failures.append(name)
            print(f"FAIL  {name}: values differ: {str(e)[:500]}")
            continue
        print(f"ok    {name}: {len(s)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures / {len(qs)} queries")
    if failures:
        print("failed:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
