"""Batch-9 (round-8, Spark 4 API surface) invariants beyond parity."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.registry import load_all

SPECS = load_all()


def test_recursion_matches_window_depths(spark, sf_dir):
    rows = SPECS["recursive_cte_order_depth"].builder(spark, sf_dir).collect()
    got = {r["depth"]: r["n_orders"] for r in rows}
    # depth histogram is monotonically non-increasing: a depth-k order
    # exists only under a depth-(k-1) predecessor
    depths = sorted(got)
    assert depths[0] == 0
    for a, b in zip(depths, depths[1:]):
        assert b == a + 1  # contiguous
        assert got[b] <= got[a]
    # depth 0 = number of customers with >= 1 order
    n_cust = duckdb.sql(
        f"SELECT COUNT(DISTINCT o_custkey) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]
    assert got[0] == n_cust


def test_lateral_topk_matches_window_formulation(spark, sf_dir):
    rows = SPECS["lateral_top2_per_nation"].builder(spark, sf_dir).collect()
    # independent window-based recomputation
    want = duckdb.sql(
        f"""
        SELECT CAST(c_nationkey AS BIGINT), c_custkey, c_acctbal
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
              ORDER BY c_acctbal DESC, c_custkey) rn
              FROM '{sf_dir}/customer.parquet')
        WHERE rn <= 2 ORDER BY 1, 3 DESC, 2
        """
    ).fetchall()
    assert [(r[0], r[1], float(r[2])) for r in rows] == [
        (w[0], w[1], float(w[2])) for w in want
    ]


def test_lateral_decorrelates_no_nested_loop(spark, sf_dir):
    df = SPECS["lateral_top2_per_nation"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_udtf_bounded_and_chars_conserved(spark, sf_dir):
    rows = SPECS["udtf_sentence_split"].builder(spark, sf_dir).collect()
    assert len(rows) <= 200
    for r in rows:
        assert r["n_sentences"] >= 1
        assert r["max_chars"] <= r["total_chars"]


def test_bitmap_equals_exact_distinct(spark, sf_dir):
    rows = SPECS["bitmap_distinct_users"].builder(spark, sf_dir).collect()
    want = dict(
        duckdb.sql(
            f"SELECT event_type, COUNT(DISTINCT user_id) "
            f"FROM '{sf_dir}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    assert {r["event_type"]: r["n_users"] for r in rows} == want


def test_hll_bound_flags_true(spark, sf_dir):
    rows = SPECS["hll_union_region_distinct"].builder(spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(r["approx_within_5pct"] for r in rows)
    assert all(r["exact_custs"] > 0 for r in rows)


def test_mode_agrees_with_bruteforce(spark, sf_dir):
    rows = SPECS["mode_brand_size"].builder(spark, sf_dir).collect()
    want = dict(
        duckdb.sql(
            f"""
            SELECT p_brand, p_size FROM (
              SELECT p_brand, p_size, COUNT(*) n,
                     ROW_NUMBER() OVER (PARTITION BY p_brand
                       ORDER BY COUNT(*) DESC, p_size) rn
              FROM '{sf_dir}/part.parquet' GROUP BY 1, 2)
            WHERE rn = 1
            """
        ).fetchall()
    )
    got = {r["p_brand"]: r["mode_size"] for r in rows}
    # the in-plan filter drops rows where mode(col,true) disagrees with
    # the argmax; full agreement means every brand survives
    assert got == want


def test_with_recursive_api(spark, sf_dir):
    """Spark 4 WITH RECURSIVE API surface (the production
    recursive_cte_order_depth query walks the same chain by pointer
    jumping — logarithmic rounds; this pins the linear recursion
    feature itself on a tiny slice and cross-checks the two)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    o = read_testdata(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    succ = o.select(
        "o_orderkey",
        F.lead("o_orderkey").over(w).alias("next_ok"),
        F.row_number().over(w).alias("rn"),
    ).localCheckpoint()
    succ.createOrReplaceTempView("succ_rcte_demo")
    got = {
        r["depth"]: r["n"]
        for r in spark.sql(
            """
            WITH RECURSIVE chain (o_orderkey, depth) AS (
              SELECT o_orderkey, 0 FROM succ_rcte_demo WHERE rn = 1
              UNION ALL
              SELECT s.next_ok, c.depth + 1
              FROM chain c JOIN succ_rcte_demo s ON s.o_orderkey = c.o_orderkey
              WHERE s.next_ok IS NOT NULL AND c.depth + 1 <= 8)
            SELECT depth, COUNT(*) AS n FROM chain GROUP BY depth
            """
        ).collect()
    }
    want = {
        r["depth"]: r["n_orders"]
        for r in SPECS["recursive_cte_order_depth"].builder(spark, sf_dir).collect()
    }
    assert got == want
