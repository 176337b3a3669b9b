"""Skew mitigation utilities (SURVEY §4: skewed keys at 100 TB).

AQE's skew-join splitting handles most cases automatically
(spark.sql.adaptive.skewJoin.enabled, on in our session factory);
``salted_join`` is the explicit fallback for joins AQE can't split
(e.g. a broadcast-ineligible dimension with one pathological key, or
aggregations feeding the join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the LEFT side is large and skewed on ``key``.

    Left rows get a deterministic salt in [0, n_salt); the right side
    is replicated n_salt times; the join runs on (key, salt), so one
    hot key spreads over n_salt shuffle partitions instead of one
    straggler task. Result is identical to ``left.join(right, key,
    how)`` for ``inner`` and ``left``/``left_outer`` ONLY (pinned by
    test) — right/full outer would emit each unmatched right row
    n_salt times (once per replica), so those are rejected. Cost is
    n_salt x the right side, so keep the right side the smaller input.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "right/full outer would duplicate unmatched right rows per salt"
        )
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))
    l = left.withColumn("_salt", salt)
    r = right.crossJoin(
        F.broadcast(
            l.sparkSession.range(n_salt).select(F.col("id").cast("long").alias("_salt"))
        )
    )
    out = l.join(r, [key, "_salt"], how)
    return out.drop("_salt")


from pyspark.sql import SparkSession

from aws_etl_global_footprint_network_spark.functions.compat import round_compat
from aws_etl_global_footprint_network_spark.registry import register
from aws_etl_global_footprint_network_spark.sources.readers import read_testdata


@register(
    "salted_join_revenue",
    """
    WITH fact AS (
      SELECT CAST(l_orderkey % 5 AS BIGINT) AS hot_key,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS revc
      FROM lineitem),
    dim AS (
      SELECT CAST(n_nationkey % 5 AS BIGINT) AS hot_key,
             MIN(n_name) AS bucket_name
      FROM nation GROUP BY 1)
    SELECT d.bucket_name, COUNT(*) AS n,
           SUM(f.revc) / 10000.0 AS revenue
    FROM fact f JOIN dim d USING (hot_key)
    GROUP BY d.bucket_name
    """,
    "salted skew join, driver-checked: a 5-hot-key fact x dim join run"
    " through salted_join; the oracle is the PLAIN join — pinning that"
    " salting is semantically transparent",
    tags=("join", "skew"),
)
def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The worst-case shuffle-join shape at 100 TB: a fact keyed on a
    handful of hot values (here l_orderkey % 5 — every row is a hot
    key). salted_join spreads each hot key over n_salt sub-partitions
    so no single task owns a key's full row set; the oracle runs the
    unsalted join, so the hash gate proves the rewrite changes the
    schedule, never the answer.

    Revenue is exact integer cents x discount-percent (the bloom/Q1
    formulation): the round-12 sf10 sweep caught the float SUM
    diverging in the LAST CENT (605039463814.88 vs .87) — at ~6e11
    magnitudes over 12M rows per bucket, the two engines' different
    summation orders accumulate enough rounding to cross the 0.01
    grain; integer sums are order-independent (bound: rows x 5e7
    cents x 100 < 2^62 through ~sf1000)."""
    li = read_testdata(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 5).cast("bigint").alias("hot_key"),
        (
            F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            * (100 - F.round(F.col("l_discount") * 100, 0).cast("long"))
        ).alias("revc"),
    )
    n = read_testdata(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") % 5).cast("bigint").alias("hot_key"), "n_name"
    ).groupBy("hot_key").agg(F.min("n_name").alias("bucket_name"))
    joined = salted_join(li, n, "hot_key", n_salt=8, how="inner")
    return joined.groupBy("bucket_name").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("revc") / 10000.0).alias("revenue"),
    )
