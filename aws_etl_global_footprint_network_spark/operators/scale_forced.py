"""Forced over-cap dispatch queries (round-9 verdict item 6).

The cardinality-adaptive dispatchers (``functions/ranking.py``) pick
a plain window under the measured caps and the distributed-rank
recipes past them.  External correctness sampling runs at sf0.01,
which never exceeds the caps — so the driver's DuckDB-oracle hash
evidence only ever covered the UNDER-cap branch; the over-cap
recipes were pinned locally (``tests/test_round9_perf.py``
monkeypatches the caps) but carried no external sample.

These two queries close that gap by pinning the over-cap plan in the
registered spec itself: they call the distributed recipes DIRECTLY
(equivalent to a dispatch cap of 0), so at any scale — including the
driver's sf0.01 window — the executed plan is the one a 100 TB
relation would get.  The oracles state the same semantics with plain
ANSI window functions, so the hash compare certifies the recipes,
not the dispatch.

``forced_distributed_cumsum`` additionally pins
``partials_collect_cap=0``, forcing the joined-offsets fallback
(nothing collected to the driver) — the branch a web-scale group
column would take, previously covered only by a local
high-cardinality test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.functions.cache import CacheScope
from aws_etl_global_footprint_network_spark.functions.ranking import (
    distributed_cumsum,
    distributed_ntile,
    distributed_row_number,
)
from aws_etl_global_footprint_network_spark.registry import register
from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

FORCED_BUCKETS = 16


@register(
    "forced_distributed_rank_suite",
    f"""
    WITH e AS (
      SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, event_id) AS rn,
             NTILE({FORCED_BUCKETS}) OVER (ORDER BY cents, event_id)
               AS bucket
      FROM e)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(rn) AS BIGINT) AS sum_rn,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents
    FROM r GROUP BY bucket
    """,
    "global ROW_NUMBER + NTILE computed with the distributed-rank"
    " recipe UNCONDITIONALLY (dispatch cap pinned to the over-cap"
    " branch in the spec): range repartition + per-partition windows"
    " + broadcast offsets, never a single-task global sort",
    tags=("scale", "window", "forced-dispatch"),
)
def forced_distributed_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External evidence for the over-cap row_number/ntile recipes:
    both are computed by ``distributed_row_number`` /
    ``distributed_ntile`` directly — the exact plan
    ``adaptive_row_number``/``adaptive_ntile`` dispatch to past
    ``ROWSCALE_WINDOW_CAP`` — instead of through the dispatcher, so
    the driver's sf0.01 hash check certifies the recipe a billion-row
    relation would execute.  Each recipe runs its own range
    repartition + bounded offsets collect (the point is evidence for
    both code paths, not fusion — production callers go through the
    dispatchers, which never stack the two); the suite then
    aggregates to bucket grain so the result stays tiny while every
    row's (rn, bucket) pair feeds the checksum."""
    scope = CacheScope("forced_distributed_rank_suite")
    e = (
        read_testdata(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
    )
    order = [F.col("cents"), F.col("event_id")]
    rn = distributed_row_number(e, order, "rn", scope)
    ranked = distributed_ntile(rn, order, FORCED_BUCKETS, "bucket", scope)
    return ranked.groupBy(F.col("bucket").cast("int").alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("rn").cast("bigint").alias("sum_rn"),
        F.min("cents").cast("bigint").alias("min_cents"),
        F.max("cents").cast("bigint").alias("max_cents"),
    )


@register(
    "forced_distributed_cumsum",
    """
    WITH v AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, cents),
    c AS (
      SELECT event_type, cents, cnt,
             COALESCE(SUM(cnt) OVER (PARTITION BY event_type
               ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS excl
      FROM v)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(excl * cnt) AS BIGINT) AS excl_weighted,
           CAST(MAX(excl + cnt) AS BIGINT) AS total_rows
    FROM c GROUP BY event_type
    """,
    "per-group exclusive running count computed by the distributed"
    " cumsum recipe with the driver-collect path DISABLED"
    " (partials_collect_cap=0 pinned in the spec): offsets resolve"
    " via the joined-offsets window fallback, nothing reaches the"
    " driver",
    tags=("scale", "window", "forced-dispatch"),
)
def forced_distributed_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External evidence for BOTH over-cap cumsum layers at once:
    ``distributed_cumsum`` is called directly (the plan
    ``adaptive_cumsum`` dispatches to past ``ADAPTIVE_WINDOW_CAP``)
    and ``partials_collect_cap=0`` forces the joined-offsets branch
    (the ``PARTIALS_COLLECT_CAP`` fallback for unbounded group
    columns — exclusive window over the partials joined back on
    (partition id, group), zero driver collect).  The checksum
    ``SUM(excl * cnt)`` is order-independent integer arithmetic, so
    any offset mis-resolution anywhere in the frame flips the hash."""
    scope = CacheScope("forced_distributed_cumsum")
    v = (
        read_testdata(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    c = distributed_cumsum(
        v,
        "event_type",
        [F.col("cents")],
        {"excl": "cnt"},
        scope,
        partials_collect_cap=0,
    )
    return c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.sum(F.col("excl") * F.col("cnt")).cast("bigint").alias("excl_weighted"),
        F.max(F.col("excl") + F.col("cnt")).cast("bigint").alias("total_rows"),
    )
