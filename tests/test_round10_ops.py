"""Round-10 edge-case pins.

The re-planned quantile normalization computes NTILE bucket
membership ARITHMETICALLY from value-run rank intervals instead of
ranking rows; the oracle hash check already compares it against
DuckDB's real NTILE at three scales, but the driver testdata never
exercises the degenerate tie shapes (a run spanning every bucket,
groups smaller than the bucket count, single-row groups). These
tests build those shapes explicitly and compare against Spark's own
``F.ntile`` window — a third, in-engine derivation independent of
both the arithmetic recipe and DuckDB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.operators.mining import QN_BUCKETS
from aws_etl_global_footprint_network_spark.registry import load_all

SPECS = load_all()


def _write_events(spark, tmp_path, rows):
    """Stage a synthetic events table the builders can read as an
    sf_dir (they only touch events.parquet)."""
    d = str(tmp_path / "edge_sf")
    df = spark.createDataFrame(
        [(i, None, None, t, v, None) for i, (t, v) in enumerate(rows)],
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(d + "/events.parquet")
    return d


def _ntile_reference(spark, sf_dir):
    """The pre-round-10 formulation: real NTILE window per type over
    (cents, event_id), aggregated to bucket grain — the independent
    derivation the arithmetic recipe must reproduce exactly."""
    from aws_etl_global_footprint_network_spark.functions.compat import (
        round_compat,
    )
    from aws_etl_global_footprint_network_spark.sources.readers import (
        read_testdata,
    )

    e = (
        read_testdata(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    r = e.withColumn("bucket", F.ntile(QN_BUCKETS).over(w))
    ref = r.groupBy(F.col("bucket").alias("rb")).agg(
        F.sum("cents").cast("bigint").alias("ref_sum"),
        F.count(F.lit(1)).cast("bigint").alias("ref_n"),
    )
    return (
        r.groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("group_cents"),
        )
        .join(ref, F.col("rb") == F.col("bucket"))
        .select(
            "event_type",
            "bucket",
            "n_rows",
            "group_cents",
            round_compat(
                F.col("ref_sum") / (F.lit(100.0) * F.col("ref_n")), 6
            ).alias("normalized_value"),
        )
    )


@pytest.mark.parametrize(
    "shape",
    [
        # a single tie run spanning EVERY bucket (100 identical values)
        [("mono", 7.0)] * 100,
        # group smaller than the bucket count (n < B edge: base=0)
        [("tiny", float(v)) for v in (3, 1, 2)],
        # single-row group + a normal group + an all-ties group
        [("one", 42.0)]
        + [("norm", float(v % 37)) for v in range(95)]
        + [("ties", 5.0)] * 61,
        # ties straddling bucket boundaries irregularly
        [("mix", float(v // 10)) for v in range(83)],
    ],
    ids=["all-ties-span-all-buckets", "n-lt-B", "mixed-degenerate", "tie-runs"],
)
def test_quantile_normalize_arithmetic_matches_real_ntile(
    spark, tmp_path, shape
):
    sf_dir = _write_events(spark, tmp_path, shape)
    got = sorted(
        map(tuple, SPECS["quantile_normalize_events"].builder(spark, sf_dir).collect())
    )
    want = sorted(map(tuple, _ntile_reference(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_forced_rank_suite_matches_window_reference(spark, tmp_path):
    """The forced distributed recipes must agree with plain window
    functions on adversarial ties (their oracle uses DuckDB windows;
    this is the same check against Spark's own windows)."""
    rows = [("a", 5.0)] * 40 + [("b", float(v % 3)) for v in range(23)]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = sorted(
        map(
            tuple,
            SPECS["forced_distributed_rank_suite"].builder(spark, sf_dir).collect(),
        )
    )
    from aws_etl_global_footprint_network_spark.operators.scale_forced import (
        FORCED_BUCKETS,
    )
    from aws_etl_global_footprint_network_spark.sources.readers import (
        read_testdata,
    )

    e = (
        read_testdata(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
    )
    w = Window.orderBy("cents", "event_id")
    want = sorted(
        map(
            tuple,
            e.select(
                "cents",
                F.row_number().over(w).cast("long").alias("rn"),
                F.ntile(FORCED_BUCKETS).over(w).alias("bucket"),
            )
            .groupBy(F.col("bucket").cast("int").alias("bucket"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("rn").cast("bigint").alias("sum_rn"),
                F.min("cents").cast("bigint").alias("min_cents"),
                F.max("cents").cast("bigint").alias("max_cents"),
            )
            .collect(),
        )
    )
    assert got == want and len(got) == FORCED_BUCKETS
