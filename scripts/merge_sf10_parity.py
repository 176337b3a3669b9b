"""Merge sf10 parity-sweep logs into the cumulative SF10_PARITY_rN.json.

    python scripts/merge_sf10_parity.py --round 12 --prior SF10_PARITY_r11.json \
        --log /tmp/sweep1.log --log /tmp/sweep2.log [--drop name ...]

Reads `name: ok (...)` lines from each parity_sweep.py log, unions them
with the prior round's `queries_green` (names whose plan or oracle
changed this round should be passed via --drop so their PRIOR green is
discarded and only a fresh sweep on current code counts), and writes
the round-stamped cumulative artifact the judge reads.
"""

from __future__ import annotations

import argparse
import json
import re


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--prior", default=None)
    ap.add_argument("--log", action="append", default=[])
    ap.add_argument("--drop", action="append", default=[],
                    help="names whose PRIOR green is stale (plan/oracle"
                         " changed this round); they must re-appear in a"
                         " --log to count")
    ap.add_argument("--dir", default="/tmp/sf10")
    args = ap.parse_args()

    green: set[str] = set()
    prior_green: set[str] = set()
    if args.prior:
        with open(args.prior) as fh:
            prior_green = set(json.load(fh)["queries_green"])
        green |= prior_green - set(args.drop)

    fresh: set[str] = set()
    fails: set[str] = set()
    for path in args.log:
        with open(path) as fh:
            txt = fh.read().replace("\r", "\n")
        fresh |= set(re.findall(r"^(\w+): ok \(", txt, re.M))
        fails |= set(re.findall(r"^(\w+): (?:FAIL|ERROR)", txt, re.M))
    green |= fresh

    out = {
        "sf": 10,
        "dir": f"{args.dir} (make_scale.py --factor 100, seeded)",
        "protocol": "scripts/parity_sweep.py -- DuckDB rows+schema+hash,"
                    " the driver's compare, at a decade above sf1",
        "round": args.round,
        "n_green": len(green),
        "n_fresh_this_round": len(fresh),
        "n_carried_from_prior": len(green - fresh),
        "dropped_stale_prior": sorted(set(args.drop) & prior_green),
        "fails_latest": sorted(fails - fresh),
        "queries_green": sorted(green),
    }
    dest = f"SF10_PARITY_r{args.round}.json"
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"{dest}: {len(green)} green ({len(fresh)} fresh,"
          f" {len(green - fresh)} carried); fails: {sorted(fails - fresh)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
