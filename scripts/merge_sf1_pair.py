"""Merge a Spark `bench.py --all` run and a DuckDB `bench.py --duck
--all` run at sf1 into the judge-facing pair sidecar
``bench_details_sf1.json``:

    {"spark_queries": {name: sec}, "duckdb_queries": {name: sec},
     "spark_total": s, "spark_total_with_prime": s, "duckdb_total": s,
     "schema_version": 2,
     "ratio": r,              # queries-only (historical r1-r9 meaning)
     "ratio_with_prime": r,   # fairness headline incl. shared-build prime
     "n_common": n, "sf": 1}

Usage:
    python scripts/merge_sf1_pair.py SPARK_DETAILS.json DUCK_STDOUT.json

where SPARK_DETAILS.json is the sidecar bench.py wrote for the sf1 run
(its ``queries`` map) and DUCK_STDOUT.json is the one-line JSON the
--duck mode printed (its ``queries`` map). Totals and the ratio are
computed over the intersection (queries the duck side skips — no
oracle — stay in spark_queries but out of the ratio).
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    spark_path, duck_path = sys.argv[1], sys.argv[2]
    with open(spark_path) as fh:
        spark_details = json.load(fh)
    spark_q = spark_details["queries"]
    with open(duck_path) as fh:
        duck_q = json.load(fh)["queries"]
    common = sorted(set(spark_q) & set(duck_q))
    s_tot = round(sum(spark_q[k] for k in common), 3)
    d_tot = round(sum(duck_q[k] for k in common), 3)
    # Engine-vs-engine fairness: Spark's memoized shared builds are
    # primed outside the per-query timings (and priced in
    # shared_build_prime_sec), while DuckDB recomputes those subplans
    # inside each query — so the headline ratio must charge Spark the
    # prime cost. spark_total stays the pure per-query sum.
    prime = round(sum(spark_details.get("shared_build_prime_sec", {}).values()), 3)
    # Layout writes are priced like the prime: a one-time load-side
    # cost the per-query probe numbers exclude, charged to the
    # fairness headline (DuckDB's oracle pays no layout either, but
    # Spark DID do the work inside the run).
    layout = round(
        sum(
            v
            for k, v in spark_details.get("layout_write_sec", {}).items()
            if k in common
        ),
        3,
    )
    s_with_prime = round(s_tot + prime + layout, 3)
    out = {
        "spark_queries": spark_q,
        "duckdb_queries": duck_q,
        "spark_total": s_tot,
        "spark_total_with_prime": s_with_prime,
        "duckdb_total": d_tot,
        # schema v2: "ratio" keeps its historical r1-r9 meaning
        # (queries-only, no prime) so cross-round trend reads stay
        # apples-to-apples; the fairness-adjusted headline lives in
        # "ratio_with_prime".
        "schema_version": 2,
        "ratio": round(s_tot / d_tot, 3) if d_tot else None,
        "ratio_with_prime": round(s_with_prime / d_tot, 3) if d_tot else None,
        "n_common": len(common),
        "sf": 1,
    }
    # Carry the per-query annotations through so the pair file is
    # self-describing: streaming rows measure micro-batch machinery
    # against a batch oracle; shared-build rows assume the primed
    # memoized builds, whose cold cost is priced separately.
    for key in ("query_flags", "shared_build_prime_sec", "layout_write_sec"):
        if key in spark_details:
            out[key] = spark_details[key]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = os.path.join(here, "bench_details_sf1.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(
        f"{dest}: {len(common)} paired, spark {s_with_prime}s"
        f" (incl {prime}s shared-build prime; {s_tot}s queries-only)"
        f" vs duck {d_tot}s = {out['ratio_with_prime']}x"
    )


if __name__ == "__main__":
    main()
