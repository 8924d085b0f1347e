#!/usr/bin/env python
"""Compute the NEXT round's driver-window rotation from the
cumulative ledger: forced slots = never-driver-green keys + keys
whose last green is >= 2 rounds stale; free slots filled with the
freshest greens (family reps last verified most recently rest).

Usage: python tools/plan_window.py [next_round_number]
Prints the proposed 50-key window in order plus the spill list if
the forced set overflows. Purely advisory — apply by reordering
_priority_queries() in __spark_entry__.py next round.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def main() -> None:
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
    nxt = int(sys.argv[1]) if len(sys.argv) > 1 else cur + 1

    never = [k for k in keys if k not in last_green]
    stale = sorted(
        (k for k in keys if k in last_green and nxt - last_green[k] >= 3),
        key=lambda k: last_green[k],
    )
    forced = never + stale
    fresh = sorted(
        (k for k in keys if k in last_green and nxt - last_green[k] < 3),
        key=lambda k: (last_green[k], k),
    )
    window = forced[:WINDOW]
    spill = forced[WINDOW:]
    free = WINDOW - len(window)
    window += fresh[:free]

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
