"""Dump `.explain("formatted")` for named queries to files.

Writes <out_dir>/<query>_<tag>.txt for each query — the before/after
plan artifacts the optimization rounds commit under plans/rNN/.

Usage: python tools/explain_dump.py <out_dir> <tag> [sf_dir] [query ...]
       (no query names => the bench HEADLINE list)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from timescaledb_event_streamer_spark.plans.registry import all_queries
from timescaledb_event_streamer_spark.session import get_spark


def main() -> None:
    out_dir = sys.argv[1]
    tag = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-dump")
    qs = all_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")


if __name__ == "__main__":
    main()
