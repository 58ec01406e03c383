"""Regenerate plans/certification_waitlist.json.

Run AFTER a new driver CORRECTNESS_r*.json artifact is committed and
BEFORE registering or editing any query for the next round. The file
freezes two things:

- "pending": the registered-but-never-certified names at this moment;
  registry._iteration_order sorts these ahead of queries registered
  later, so the driver's 50-entry oracle cap certifies longest-waiting
  queries first (FIFO across rounds) instead of letting an
  alphabetically-early newcomer starve an old one.

- "fingerprints": for each certified query, the source fingerprint it
  carried when LAST certified green. A query green in the newest
  artifact gets its CURRENT fingerprint (the artifact was produced
  against this code — that is why this script must run before any
  edits); every other certified query carries its previous snapshot
  forward unchanged. registry._is_certified compares the snapshot to
  the live fingerprint and re-queues any certified query whose source
  changed since its last cert (change-aware rotation, r8).

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

    green_latest: set[str] = set()
    if artifacts:
        results = json.loads((REPO_ROOT / artifacts[-1]).read_text())
        for name, row in results.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0
            ):
                green_latest.add(name)

    out = REPO_ROOT / "timescaledb_event_streamer_spark/plans/certification_waitlist.json"
    try:
        prev_fp = dict(json.loads(out.read_text()).get("fingerprints", {}))
    except (OSError, ValueError):
        prev_fp = {}

    fingerprints: dict[str, str] = {}
    for name in sorted(registry.REGISTRY):
        if name in green_latest:
            # just recertified against this code — snapshot now
            fingerprints[name] = registry._current_fingerprint(name)
        elif name in prev_fp:
            # certified in an older round; carry that cert's snapshot
            fingerprints[name] = prev_fp[name]

    pending = [n for n in registry._iteration_order() if not registry._is_green(n)]
    recert = [
        n
        for n in registry._iteration_order()
        if registry._is_green(n) and not registry._is_certified(n)
    ]
    out.write_text(
        json.dumps(
            {
                "frozen_after": artifacts[-1] if artifacts else None,
                "pending": pending,
                "fingerprints": fingerprints,
            },
            indent=1,
        )
        + "\n"
    )
    print(
        f"waitlist: {len(pending)} pending, {len(recert)} awaiting re-cert "
        f"(source changed since last cert), frozen after "
        f"{artifacts[-1] if artifacts else 'none'}"
    )
    if recert:
        print("recert queue: " + ", ".join(recert))


if __name__ == "__main__":
    main()
