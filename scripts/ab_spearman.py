"""A/B: spearman_rank_corr split two-pass value tables + HLL dispatch
scan (round-10 shape) vs combined one-pass value table + exact counts
(round-11), one warm session, alternating, cache cleared between runs.

    python scripts/ab_spearman.py [--dir /tmp/sf1] [--rounds 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.functions.cache import CacheScope
from aws_etl_global_footprint_network_spark.functions.compat import round_compat
from aws_etl_global_footprint_network_spark.registry import load_all
from aws_etl_global_footprint_network_spark.session import get_spark
from aws_etl_global_footprint_network_spark.sources.readers import read_testdata


def split_variant(spark, sf_dir):
    """The round-10 shape: HLL dispatch scan + two independent
    value-table builds."""
    from aws_etl_global_footprint_network_spark.functions.ranking import (
        ADAPTIVE_WINDOW_CAP,
        adaptive_cumsum,
        hll_dispatch_estimate,
    )

    scope = CacheScope("ab_spearman_split")
    li = read_testdata(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    est = li.agg(
        F.approx_count_distinct(F.struct("flag", "x")).alias("nx"),
        F.approx_count_distinct(F.struct("flag", "y")).alias("ny"),
    ).first()

    def rank_table(col, out, n_vals):
        t = li.groupBy("flag", col).agg(F.count(F.lit(1)).alias("t"))
        c = adaptive_cumsum(
            t, "flag", [F.col(col)], {"cb": "t"}, scope, n_rows=n_vals
        )
        return c.select(
            "flag", col, (2 * F.col("cb") + F.col("t") + 1).alias(out)
        )

    vx = rank_table("x", "r2x", hll_dispatch_estimate(est["nx"]))
    vy = rank_table("y", "r2y", hll_dispatch_estimate(est["ny"]))
    if est["nx"] <= ADAPTIVE_WINDOW_CAP:
        vx = F.broadcast(vx)
    if est["ny"] <= ADAPTIVE_WINDOW_CAP:
        vy = F.broadcast(vy)
    ranked = li.join(vx, ["flag", "x"]).join(vy, ["flag", "y"])
    dec = "decimal(38,0)"
    r2xd, r2yd = F.col("r2x").cast(dec), F.col("r2y").cast(dec)
    s = ranked.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(r2xd).alias("s1"),
        F.sum(r2yd).alias("s2"),
        F.sum(r2xd * r2xd).alias("s11"),
        F.sum(r2yd * r2yd).alias("s22"),
        F.sum(r2xd * r2yd).alias("s12"),
    )
    nd = F.col("n").cast("double")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    d1 = nd * F.col("s11").cast("double") - s1d * s1d
    d2 = nd * F.col("s22").cast("double") - s2d * s2d
    num = nd * F.col("s12").cast("double") - s1d * s2d
    return s.select(
        F.col("flag").alias("l_returnflag"),
        F.col("n").cast("bigint").alias("n"),
        F.when((d1 > 0) & (d2 > 0), round_compat(num / F.sqrt(d1 * d2), 6)).alias(
            "spearman_r6"
        ),
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()
    specs = load_all()
    spark = get_spark(app_name="ab-spearman")
    combined = specs["spearman_rank_corr"].builder
    split_variant(spark, "/root/testdata/sf0.001").count()
    combined(spark, "/root/testdata/sf0.001").count()
    a = sorted(map(tuple, split_variant(spark, "/root/testdata/sf0.01").collect()))
    b = sorted(map(tuple, combined(spark, "/root/testdata/sf0.01").collect()))
    assert a == b, "variants differ"
    print("# variants agree at sf0.01", flush=True)
    for r in range(args.rounds):
        for label, fn in (("split", split_variant), ("combined", combined)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = fn(spark, args.dir).count()
            print(
                f"round {r} {label}: {time.perf_counter() - t0:.3f}s ({n} rows)",
                flush=True,
            )
