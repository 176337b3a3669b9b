"""Spearman floor A/B (round 13): the committed pair-grain plan vs a
direct-value-table variant (vx/vy as two groupBys over the persisted
pair table instead of the explode+regroup union table).

    python scripts/ab_spearman_r13.py [--dir /root/testdata/sf0.1] [--rounds 3]

MEASURED RESULT (2026-08-18, warm alternating, sf0.1, noop sink):
    round 0: old=8.00s new=5.60s   (old's first round pays codegen)
    round 1: old=5.18s new=5.52s
    round 2: old=5.47s new=5.53s
— a wash, results identical. Together with the round-12 rejection of
the shuffle-free row path (broadcast rank joins onto the raw
relation: wash at sf0.1, LOST at sf1 — OPTIMIZATION_r12.md "Not yet
optimized" item 5), three structural alternatives now bracket the
committed plan within noise: the cost is the rank-grain itself (the
regenerated seed made l_extendedprice ~unique, so the pair/value
tables are ~row-cardinality at sf0.1 and two full shuffles + a
per-flag rank window are irreducible for an exact tied-rank
statistic). The registry row is tagged ``rank-grain-floor``.
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
from aws_etl_global_footprint_network_spark.functions.ranking import (
    ADAPTIVE_WINDOW_CAP,
    adaptive_cumsum,
)
from aws_etl_global_footprint_network_spark.functions.width import (
    INT64_SAFE_BOUND,
    table_num_rows,
)
from aws_etl_global_footprint_network_spark.session import get_spark
from aws_etl_global_footprint_network_spark.sources.readers import read_testdata


def variant(spark, sf_dir):
    """Direct vx/vy from the pair table (no explode union table)."""
    scope = CacheScope("spearman_variant")
    li = read_testdata(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    p = scope.persist(
        li.groupBy("flag", "x", "y").agg(F.count(F.lit(1)).alias("txy"))
    )
    vx = scope.persist(
        p.groupBy("flag", F.col("x").alias("val")).agg(F.sum("txy").alias("t"))
    )
    vy = scope.persist(
        p.groupBy("flag", F.col("y").alias("val")).agg(F.sum("txy").alias("t"))
    )
    nx, ny = vx.count(), vy.count()

    def rank_table(vt, col, out, n):
        c = adaptive_cumsum(
            vt.select("flag", F.col("val").alias(col), "t"),
            "flag",
            [F.col(col)],
            {"cb": "t"},
            scope,
            n_rows=n,
        )
        return c.select(
            "flag", col, "t", (2 * F.col("cb") + F.col("t") + 1).alias(out)
        )

    vxr = rank_table(vx, "x", "r2x", nx)
    vyr = rank_table(vy, "y", "r2y", ny)
    n_rows = table_num_rows(sf_dir, "lineitem")
    narrow = (
        n_rows is not None
        and n_rows * float(2 * n_rows + 2) ** 2 < INT64_SAFE_BOUND
    )
    dec = "long" if narrow else "decimal(38,0)"

    def moments(vt, out, s1n, s11n):
        td, rd = F.col("t").cast(dec), F.col(out).cast(dec)
        return vt.groupBy("flag").agg(
            F.sum(td * rd).alias(s1n), F.sum(td * rd * rd).alias(s11n)
        )

    mom_x = moments(vxr, "r2x", "s1", "s11")
    mom_y = moments(vyr, "r2y", "s2", "s22")
    bx = F.broadcast(vxr) if nx <= ADAPTIVE_WINDOW_CAP else vxr
    by = F.broadcast(vyr) if ny <= ADAPTIVE_WINDOW_CAP else vyr
    ranked = p.join(bx.drop("t"), ["flag", "x"]).join(
        by.drop("t"), ["flag", "y"]
    )
    r2xd, r2yd = F.col("r2x").cast(dec), F.col("r2y").cast(dec)
    txyd = F.col("txy").cast(dec)
    s = (
        ranked.groupBy("flag")
        .agg(
            F.sum("txy").cast("bigint").alias("n"),
            F.sum(txyd * r2xd * r2yd).alias("s12"),
        )
        .join(mom_x, "flag")
        .join(mom_y, "flag")
    )
    nd = F.col("n").cast("double")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    d1 = nd * F.col("s11").cast("double") - s1d * s1d
    d2 = nd * F.col("s22").cast("double") - s2d * s2d
    num = nd * F.col("s12").cast("double") - s1d * s2d
    return s.select(
        F.col("flag").alias("l_returnflag"),
        F.col("n").cast("bigint").alias("n"),
        F.when(
            (d1 > 0) & (d2 > 0), round_compat(num / F.sqrt(d1 * d2), 6)
        ).alias("spearman_r6"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from aws_etl_global_footprint_network_spark.registry import load_all

    specs = load_all()
    spark = get_spark(app_name="ab-spearman-r13")
    old_rows = sorted(
        map(tuple, specs["spearman_rank_corr"].builder(spark, args.dir).collect())
    )
    new_rows = sorted(map(tuple, variant(spark, args.dir).collect()))
    print("identical:", old_rows == new_rows)
    assert old_rows == new_rows
    for i in range(args.rounds):
        t0 = time.perf_counter()
        specs["spearman_rank_corr"].builder(spark, args.dir).write.format(
            "noop"
        ).mode("overwrite").save()
        to = time.perf_counter() - t0
        t0 = time.perf_counter()
        variant(spark, args.dir).write.format("noop").mode("overwrite").save()
        tn = time.perf_counter() - t0
        print(f"round {i}: old={to:.2f}s new={tn:.2f}s", flush=True)


if __name__ == "__main__":
    main()
