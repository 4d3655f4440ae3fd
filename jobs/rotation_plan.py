#!/usr/bin/env python
"""Driver-window rotation planner — the bookkeeping behind the 50-key
correctness-window discipline, as a tool instead of a hand-audit.

    python jobs/rotation_plan.py            # evidence table + proposal
    python jobs/rotation_plan.py --limit 50 # driver cap override

The driver verifies only the FIRST 50 registry keys each round, so keys
must rotate through the window to keep their driver evidence fresh.
This reads every CORRECTNESS_r*.json in the repo root, computes each
registry key's newest GREEN driver round (rows+schema+hash all true),
and prints:

  - per-key: newest green round, age in rounds, whether it is in the
    current window;
  - a proposed next window: never-driver-checked keys first, then
    oldest evidence first, with ties broken by registry order.

The proposal is a starting point, not a command — keys whose backing
functions change in a round MUST be in that round's window regardless
of age (the test_driver_window_composition pin encodes the final
decision)."""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=50)
    ap.add_argument("--repo", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    keys = list(entry_mod.queries())
    newest_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(args.repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except Exception:  # noqa: BLE001 — a malformed round file is skippable
            continue
        rows = data.get("queries", data) if isinstance(data, dict) else {}
        for k, v in rows.items():
            if not isinstance(v, dict):
                continue
            green = (
                v.get("rows_match") and v.get("schema_match")
                and v.get("hash_match") and not v.get("err")
            )
            if green and rnd >= newest_green.get(k, -1):
                newest_green[k] = rnd
    latest_round = max(newest_green.values(), default=0)

    window = set(keys[: args.limit])
    table = []
    for i, k in enumerate(keys):
        last = newest_green.get(k)
        table.append({
            "key": k,
            "pos": i,
            "in_window": k in window,
            "newest_green_round": last,
            "age_rounds": None if last is None else latest_round - last,
        })
    for row in table:
        print(json.dumps(row))

    # proposal: never-checked first, then oldest evidence, then registry
    # order; keys already carrying the freshest possible evidence fill
    # the remainder in registry order
    def _prio(row: dict) -> tuple:
        last = row["newest_green_round"]
        return (0 if last is None else 1, -(latest_round - (last or 0)),
                row["pos"])

    proposal = [r["key"] for r in sorted(table, key=_prio)][: args.limit]
    print(json.dumps({
        "registry_size": len(keys),
        "window": args.limit,
        "latest_driver_round": latest_round,
        "never_checked": [r["key"] for r in table
                          if r["newest_green_round"] is None],
        "stale_2plus": [r["key"] for r in table
                        if r["age_rounds"] is not None and r["age_rounds"] >= 2],
        "proposed_next_window": proposal,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
