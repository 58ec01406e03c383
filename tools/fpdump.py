"""Dump {query_name: source_fingerprint} as JSON for the repo tree
this script runs inside.

Used by the change-aware recert bootstrap: run at HEAD and inside a
git worktree of each past round's artifact commit, then diff the
maps to find queries whose source changed since their last green
driver cert. The fingerprint implementation is loaded from the path
in $FPMOD (defaults to this repo's plans/fingerprint.py) so old
worktrees that predate the module can still be fingerprinted with
the CURRENT algorithm.

Usage: PYTHONPATH=<tree> [FPMOD=<fingerprint.py>] python tools/fpdump.py
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
from pathlib import Path

TREE = Path(os.environ.get("FPTREE", Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(TREE))

FPMOD = os.environ.get(
    "FPMOD",
    str(TREE / "timescaledb_event_streamer_spark/plans/fingerprint.py"),
)


def main() -> None:
    spec = importlib.util.spec_from_file_location("_fp_standalone", FPMOD)
    assert spec and spec.loader
    fp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fp)

    from timescaledb_event_streamer_spark.plans import registry

    registry._load_all()
    out = {
        name: fp.source_fingerprint(s.builder, s.oracle)
        for name, s in registry.REGISTRY.items()
    }
    json.dump(out, sys.stdout, indent=0, sort_keys=True)


if __name__ == "__main__":
    main()
