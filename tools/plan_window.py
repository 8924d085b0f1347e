#!/usr/bin/env python
"""Compute the NEXT round's driver-window rotation from the
cumulative ledger: forced slots = never-driver-green keys + keys
whose last green would be >= 3 rounds behind the NEXT round (i.e.
already 2+ rounds stale today); any free slots are filled with the
STALEST remaining greens first, so freshness debt never accumulates
silently.

Usage: python tools/plan_window.py [next_round_number]
Prints the proposed 50-key window in order plus the spill list if
the forced set overflows. Purely advisory — apply by reordering
_priority_queries() in __spark_entry__.py next round.

`load_ledger()` is importable (tests/test_registry.py uses it to
assert the family-freshness invariant across rotations).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def load_ledger() -> tuple[list[str], dict[str, int], int]:
    """Return (registry keys, key -> last driver-green round, latest
    round number seen in CORRECTNESS_r*.json)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry

    keys = list(entry.queries().keys())
    last_green: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnum = int(re.search(r"_r(\d+)", path).group(1))
        rounds.append(rnum)
        try:
            rec = json.load(open(path))
        except Exception:
            continue
        items = rec.items() if isinstance(rec, dict) else []
        for name, row in items:
            if not isinstance(row, dict):
                continue
            ok = (
                row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            if name in keys and ok:
                last_green[name] = max(last_green.get(name, 0), rnum)
    cur = max(rounds) if rounds else 0
    return keys, last_green, cur


def compute_window(
    keys: list[str], last_green: dict[str, int], nxt: int
) -> tuple[list[str], list[str], list[str]]:
    """(window, spill, never) for round ``nxt`` — THE rotation policy,
    shared by the advisory printer below and tools/apply_window.py so
    plan and rewrite can never disagree (code review r12)."""
    never = [k for k in keys if k not in last_green]
    stale = sorted(
        (k for k in keys if k in last_green and nxt - last_green[k] >= 3),
        key=lambda k: last_green[k],
    )
    forced = never + stale
    # free slots: stalest greens first (ascending last_green), so the
    # next-due cohort starts rotating back in early.
    fresh = sorted(
        (k for k in keys if k in last_green and nxt - last_green[k] < 3),
        key=lambda k: (last_green[k], k),
    )
    window = forced[:WINDOW]
    spill = forced[WINDOW:]
    window = window + fresh[: WINDOW - len(window)]
    return window, spill, never


def main() -> None:
    keys, last_green, cur = load_ledger()
    nxt = int(sys.argv[1]) if len(sys.argv) > 1 else cur + 1
    window, spill, never = compute_window(keys, last_green, nxt)
    stale = [
        k for k in keys if k in last_green and nxt - last_green[k] >= 3
    ]

    print(f"# proposed r{nxt} window ({len(window)} slots; "
          f"{len(never)} never-green, {len(stale)} stale-forced)")
    for k in window:
        tag = "never" if k in never else f"last r{last_green[k]}"
        print(f"  {k}  [{tag}]")
    if spill:
        print(f"# OVERFLOW — {len(spill)} forced keys spill to r{nxt + 1}:")
        for k in spill:
            print(f"  {k}")


if __name__ == "__main__":
    main()
