"""Regenerate plans/certification_waitlist.json.

Run AFTER a new driver CORRECTNESS_r*.json artifact is committed and
BEFORE registering new queries for the next round. The waitlist
freezes the set of registered-but-never-certified names at that
moment; registry._iteration_order sorts these ahead of queries
registered later, so the driver's 50-entry oracle cap certifies
longest-waiting queries first (FIFO across rounds) instead of letting
an alphabetically-early newcomer starve an old one.

Usage: python tools/waitlist.py
"""

from __future__ import annotations

import json
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]


def main() -> None:
    from timescaledb_event_streamer_spark.plans import registry

    registry._load_all()
    artifacts = sorted(p.name for p in REPO_ROOT.glob("CORRECTNESS_r*.json"))
    pending = [n for n in registry._iteration_order() if not registry._is_certified(n)]
    out = REPO_ROOT / "timescaledb_event_streamer_spark/plans/certification_waitlist.json"
    out.write_text(
        json.dumps(
            {"frozen_after": artifacts[-1] if artifacts else None, "pending": pending},
            indent=1,
        )
        + "\n"
    )
    print(f"waitlist: {len(pending)} pending names frozen after {artifacts[-1] if artifacts else 'none'}")


if __name__ == "__main__":
    main()
