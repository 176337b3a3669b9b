"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Usage:
    python bench.py                  # headline set
    python bench.py --all            # every registered query
    python bench.py --explain NAME   # formatted plan for one query
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_etl_global_footprint_network_spark.registry import load_all
from aws_etl_global_footprint_network_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one representative per operator family, weighted
# toward the scan/join/agg/window shapes that dominate real 100 TB
# workloads.
HEADLINE = [
    "q1_pricing_summary",
    "top_orders_by_revenue",
    "regional_supplier_revenue",
    "customer_order_stats_left",
    "priority_distinct_customers",
    "rollup_lineitem_qty",
    "top3_parts_per_brand",
    "events_sessionization",
    "weekly_compound_by_user",
    "compound_evolution_by_user",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_cosine_topk_vectorized",
    "ann_lsh_pairs",
    "ivf_assignments",
    "asof_last_purchase",
    "session_window_native",
    "window_analytic_suite",
    "text_quality_stats",
    "doc_fingerprint",
    "token_count_per_source",
    "streaming_daily_counts",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(os.path.normpath(d))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    specs = load_all()
    names = list(specs) if "--all" in sys.argv else HEADLINE
    spark = get_spark(app_name="bench")

    if "--explain" in sys.argv:
        name = sys.argv[sys.argv.index("--explain") + 1]
        specs[name].builder(spark, SF_DIR).explain("formatted")
        return

    # Warm the JVM/readers on the smallest SF so JIT/classloading time
    # doesn't land in the first measured query.
    warm = os.path.join(os.path.dirname(os.path.normpath(SF_DIR)), "sf0.001")
    if os.path.isdir(warm):
        specs["q1_pricing_summary"].builder(spark, warm).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        n = specs[name].builder(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
