"""Registry contract tests — certification-rotation ordering.

The driver's per-round oracle run is capped (50 entries) and consumes
``queries()`` in iteration order, so the rotation in
plans/registry.py:_iteration_order is load-bearing: never-certified
queries MUST precede certified ones or a block of queries can stay
uncertified forever (the r3 bug). These tests pin that invariant so a
refactor can't silently wedge certification again (VERDICT r4 item 1).
"""

from __future__ import annotations

import json
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]


def _registry():
    from timescaledb_event_streamer_spark.plans import registry

    registry._load_all()
    return registry


def test_uncertified_queries_sort_first():
    registry = _registry()
    names = list(registry.all_queries())
    certified_flags = [registry._is_certified(n) for n in names]
    # monotone: once a certified name appears, no uncertified follows
    assert certified_flags == sorted(certified_flags), (
        "certification rotation broken: an uncertified query sorts after "
        "a certified one — the driver's 50-entry cap would skip it"
    )


def test_rotation_blocks_are_ordered():
    """Tier-0 (frozen waitlist) is ordered by frozen position so
    cross-round seniority survives regeneration (an alphabetically-late
    query must not starve across rounds once pending exceeds the
    driver's 50-entry cap); tier-1 (re-certification: green before but
    source changed since) sorts ahead of tier-2 newcomers; tiers 1-3
    stay alphabetical."""
    registry = _registry()
    names = list(registry.all_queries())
    pending = [
        n
        for n in names
        if not registry._is_green(n) and n in registry._WAITLIST
    ]
    recert = [n for n in names if registry._is_green(n) and not registry._is_certified(n)]
    newcomers = [
        n
        for n in names
        if not registry._is_green(n) and n not in registry._WAITLIST
    ]
    cert = [n for n in names if registry._is_certified(n)]
    assert pending == sorted(pending, key=registry._WAITLIST.__getitem__)
    assert recert == sorted(recert)
    assert newcomers == sorted(newcomers)
    assert cert == sorted(cert)
    assert names == pending + recert + newcomers + cert


def test_waitlist_precedes_newcomers():
    """Uncertified queries frozen on the waitlist at the last driver
    round must sort before uncertified queries registered after the
    freeze — otherwise an alphabetically-early newcomer could evict a
    long-waiting query from the driver's 50-entry oracle cap."""
    registry = _registry()
    names = list(registry.all_queries())
    tiers = [
        (registry._is_certified(n), n not in registry._WAITLIST) for n in names
    ]
    assert tiers == sorted(tiers)
    # the frozen waitlist only contains real registered queries
    assert set(registry._WAITLIST) <= set(registry.REGISTRY), (
        set(registry._WAITLIST) - set(registry.REGISTRY)
    )
    # the waitlist file exists and was frozen against a committed artifact
    wl_path = (
        REPO_ROOT
        / "timescaledb_event_streamer_spark/plans/certification_waitlist.json"
    )
    frozen_after = json.loads(wl_path.read_text())["frozen_after"]
    assert (REPO_ROOT / frozen_after).exists()


def test_certified_set_derived_from_committed_artifacts():
    """The green set must come from CORRECTNESS_r*.json on disk,
    never a hard-coded list: every hash-green name in the committed
    artifacts is recognized as green, and a name absent from every
    artifact is not. Full certification additionally requires the
    stored last-cert fingerprint to match the live source (the
    change-aware rule)."""
    registry = _registry()
    hash_green: set[str] = set()
    for path in sorted(REPO_ROOT.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(path.read_text()).items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                hash_green.add(name)
    assert hash_green, "no committed correctness artifacts found"
    for name in hash_green & set(registry.REGISTRY):
        assert registry._is_green(name), name
        if registry._is_certified(name):
            assert registry._CERT_FINGERPRINTS.get(
                name
            ) == registry._current_fingerprint(name), name
    never_seen = set(registry.REGISTRY) - hash_green
    # queries never hash-certified must not be marked certified unless
    # they are rows-only-certified AND still have no oracle
    for name in never_seen:
        if registry._is_certified(name):
            assert (
                name in registry._ROWS_CERTIFIED
                and registry.REGISTRY[name].oracle is None
            ), name


def test_changed_fingerprint_requeues():
    """The change-aware rule (r8): a certified query whose source
    fingerprint no longer matches its last-cert snapshot must re-sort
    as uncertified, AHEAD of queries registered after the freeze —
    a rewrite-induced regression in an already-certified query must
    re-enter the driver's 50-entry oracle window."""
    registry = _registry()
    fresh = [n for n in registry._iteration_order() if registry._is_certified(n)]
    assert fresh, "no certified-fresh query to simulate with"
    victim = fresh[0]
    saved = registry._CERT_FINGERPRINTS.get(victim)
    try:
        # simulate an edit: the stored snapshot no longer matches
        registry._CERT_FINGERPRINTS[victim] = "0" * 16
        assert not registry._is_certified(victim)
        assert registry._is_green(victim)
        names = registry._iteration_order()
        # requeued ahead of every never-certified newcomer
        newcomers = [
            n
            for n in names
            if not registry._is_green(n) and n not in registry._WAITLIST
        ]
        for n in newcomers:
            assert names.index(victim) < names.index(n)
        # and ahead of the certified block entirely
        first_cert = next(
            (i for i, n in enumerate(names) if registry._is_certified(n)),
            len(names),
        )
        assert names.index(victim) < first_cert
    finally:
        if saved is None:
            registry._CERT_FINGERPRINTS.pop(victim, None)
        else:
            registry._CERT_FINGERPRINTS[victim] = saved


def test_missing_fingerprint_snapshot_requeues():
    """A green query with NO stored fingerprint (bootstrap found its
    source changed since its last cert, so the snapshot was withheld)
    is pending re-certification — stale certs never count."""
    registry = _registry()
    for name in registry.REGISTRY:
        if registry._is_green(name) and name not in registry._CERT_FINGERPRINTS:
            assert not registry._is_certified(name), name


def test_fingerprint_is_deterministic_and_source_sensitive(tmp_path):
    """source_fingerprint: stable across calls, changes when the
    builder's source or the oracle changes, and follows repo-internal
    helper references (the dedup_sparse_cosine failure mode — the
    r7 rewrite happened in a shared helper, not the builder)."""
    import importlib.util
    import textwrap

    from timescaledb_event_streamer_spark.plans.fingerprint import (
        source_fingerprint,
    )

    def load(body: str):
        p = tmp_path / f"m{abs(hash(body)) % 10**8}.py"
        p.write_text(textwrap.dedent(body))
        spec = importlib.util.spec_from_file_location(
            "timescaledb_event_streamer_spark._fp_test_mod", p
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    m1 = load(
        """
        def helper(x):
            return x + 1
        def builder(spark, sf_dir):
            return helper(2)
        """
    )
    m2 = load(
        """
        def helper(x):
            return x + 2
        def builder(spark, sf_dir):
            return helper(2)
        """
    )
    fp1a = source_fingerprint(m1.builder, "SELECT 1")
    fp1b = source_fingerprint(m1.builder, "SELECT 1")
    assert fp1a == fp1b
    # helper body changed, builder identical -> fingerprint changes
    assert source_fingerprint(m2.builder, "SELECT 1") != fp1a
    # oracle changed -> fingerprint changes
    assert source_fingerprint(m1.builder, "SELECT 2") != fp1a


def test_oracle_upgrade_requeues():
    """A rows-only-certified query that has since gained an oracle
    re-sorts as uncertified (stronger verification gets re-exercised)."""
    registry = _registry()
    for name in registry._ROWS_CERTIFIED:
        if name in registry.REGISTRY and registry.REGISTRY[name].oracle is not None:
            if name not in registry._HASH_CERTIFIED:
                assert not registry._is_certified(name), name


def test_every_registered_query_is_in_survey():
    """SURVEY.md §2 is the judge's coverage checklist; a query
    registered without a survey row silently under-reports coverage
    (the r3 inventory-drift bug, in the other direction)."""
    import re

    registry = _registry()
    text = (REPO_ROOT / "SURVEY.md").read_text()
    names = set(re.findall(r"`([a-z0-9_]+)`", text))
    missing = sorted(set(registry.REGISTRY) - names)
    assert not missing, f"registered but not in SURVEY.md: {missing}"


def test_certifying_a_waitlisted_query_keeps_blocks_sorted():
    """Regression: once a waitlisted query certifies (before the
    freeze is regenerated), it must merge into the certified block
    alphabetically — the stale waitlist bit must not reorder
    certified entries."""
    from timescaledb_event_streamer_spark.plans import registry

    registry._load_all()
    wl_uncert = [
        n
        for n in registry._WAITLIST
        if n in registry.REGISTRY and not registry._is_certified(n)
    ]
    if not wl_uncert:
        return  # nothing left on the waitlist to simulate with
    saved = registry._HASH_CERTIFIED
    try:
        registry._HASH_CERTIFIED = frozenset(saved | {max(wl_uncert)})
        names = registry._iteration_order()
        cert = [n for n in names if registry._is_certified(n)]
        assert cert == sorted(cert)
        flags = [registry._is_certified(n) for n in names]
        assert flags == sorted(flags)
    finally:
        registry._HASH_CERTIFIED = saved
