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
             l_extendedprice * (1 - l_discount) AS rev
      FROM lineitem),
    dim AS (
      SELECT CAST(n_nationkey % 5 AS BIGINT) AS hot_key,
             MIN(n_name) AS bucket_name
      FROM nation GROUP BY 1)
    SELECT d.bucket_name, COUNT(*) AS n,
           ROUND(SUM(f.rev) * 100, 0) / 100 AS revenue
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
    schedule, never the answer."""
    li = read_testdata(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 5).cast("bigint").alias("hot_key"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    n = read_testdata(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") % 5).cast("bigint").alias("hot_key"), "n_name"
    ).groupBy("hot_key").agg(F.min("n_name").alias("bucket_name"))
    joined = salted_join(li, n, "hot_key", n_salt=8, how="inner")
    return joined.groupBy("bucket_name").agg(
        F.count(F.lit(1)).alias("n"),
        round_compat(F.sum("rev"), 2).alias("revenue"),
    )
