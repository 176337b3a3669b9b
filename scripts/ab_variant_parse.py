"""A/B: Spark JSON-extraction strategies for variant_props_aggregate.

    python scripts/ab_variant_parse.py [--dir /tmp/sf1] [--reps 2]

Round-12 evidence for the `json-parse-floor` flag on
variant_props_aggregate (VERDICT r11 item 6): the query's ~10x ratio
vs the DuckDB oracle is Spark's row-wise JSON parse machinery, not
the plan.  Three strategies over the same aggregate, one warm session,
alternating reps:

  variant          parse_json -> variant_get/try_variant_get (the
                   registered plan; the VARIANT feature demo)
  from_json        explicit-schema struct parse
  get_json_object  per-path string re-parse (x2 paths)

Measured (sf1, round 12): variant 2.9/3.3 s, from_json 2.5/2.7 s,
get_json_object 4.4/5.7 s, DuckDB oracle ~0.3 s.  VARIANT is within
~15% of the best Spark alternative; the production answer at scale is
shredded VARIANT parquet (parse at ingest), not a faster re-parse.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from aws_etl_global_footprint_network_spark.session import get_spark
from aws_etl_global_footprint_network_spark.sources.readers import read_testdata


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="ab-variant-parse")
    ev = read_testdata(spark, args.dir, "events").persist()
    ev.count()

    def agg(df):
        return (
            df.groupBy((F.col("k") % 10).cast("bigint").alias("k_mod"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("k").cast("bigint").alias("sum_k"),
                F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_missing"),
            )
        )

    def variant_plan():
        parsed = ev.select(F.parse_json("props").alias("v"))
        return agg(
            parsed.select(
                F.variant_get("v", "$.k", "int").alias("k"),
                F.try_variant_get("v", "$.missing", "string").alias("missing"),
            )
        )

    def from_json_plan():
        parsed = ev.select(
            F.from_json("props", "k int, missing string").alias("s")
        )
        return agg(
            parsed.select(
                F.col("s.k").alias("k"), F.col("s.missing").alias("missing")
            )
        )

    def gjo_plan():
        return agg(
            ev.select(
                F.get_json_object("props", "$.k").cast("int").alias("k"),
                F.get_json_object("props", "$.missing").alias("missing"),
            )
        )

    plans = {
        "variant": variant_plan,
        "from_json": from_json_plan,
        "get_json_object": gjo_plan,
    }
    results = {}
    for name, fn in plans.items():  # warm codegen + assert same answer
        results[name] = sorted(tuple(r) for r in fn().collect())
    first = next(iter(results.values()))
    assert all(v == first for v in results.values()), "plans disagree"

    walls: dict[str, list[float]] = {n: [] for n in plans}
    for _ in range(args.reps):
        for name, fn in plans.items():
            t0 = time.perf_counter()
            fn().count()
            walls[name].append(round(time.perf_counter() - t0, 2))

    print(json.dumps({
        "dir": args.dir,
        "walls": walls,
        "min": {k: min(v) for k, v in walls.items()},
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
