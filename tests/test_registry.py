"""Registry invariants: the external driver verifies only the first
50 queries() keys, so the priority window must stay <= 50 and every
SURVEY §2 / LLM-pipeline operator family must stay driver-FRESH: at
least one representative either sits in the current window (verified
this round) or was driver-green within the last 2 completed rounds
(CORRECTNESS_r*.json ledger). The window ROTATES each round
(COVERAGE.md is the cumulative ledger; tools/plan_window.py computes
the rotation), and since r12 the forced set (never-green + 2-rounds
stale) can fill all 50 slots — so the invariant is ledger freshness,
not per-window coverage. Pinning exact keys, or even per-window
family coverage, would make a correct forced rotation a failure."""

from __future__ import annotations

import __spark_entry__ as entry_mod

from tools.plan_window import WINDOW_FAMILIES, load_ledger

# Operator families map is shared with the rotation planner so the
# planner and this invariant can never disagree (r14).


def test_every_family_is_driver_fresh():
    """Each family has a rep in the current window (verified next
    driver run) OR driver-green within the last 2 completed rounds.
    This is the rotation-safe form of per-window family coverage."""
    keys, last_green, cur = load_ledger()
    window = set(keys[: entry_mod._DRIVER_WINDOW])
    stale_floor = cur - 1  # green in round cur or cur-1 counts as fresh
    missing = [
        fam for fam, reps in WINDOW_FAMILIES.items()
        if not any(
            k in window or last_green.get(k, -10) >= stale_floor
            for k in reps
        )
    ]
    assert not missing, f"families with no fresh driver rep: {missing}"
    # ... and the family map itself must not drift from the registry
    unknown = {
        k for reps in WINDOW_FAMILIES.values() for k in reps
    } - set(keys)
    assert not unknown, f"family map names unknown keys: {unknown}"


def test_oracle_keys_are_queries():
    qs = set(entry_mod.queries())
    extra = set(entry_mod.oracle_sql()) - qs
    assert not extra, f"oracle_sql keys without queries entry: {extra}"


def test_no_duplicate_keys_across_tiers():
    prio = set(entry_mod._priority_queries())
    tail = set(entry_mod._extra_queries())
    assert not prio & tail, f"duplicated keys: {prio & tail}"
