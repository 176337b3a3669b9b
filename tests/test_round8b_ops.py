"""Batch-6 (round-8) operator invariants beyond oracle parity.

Oracle hash parity runs for every registered query in
test_oracle_parity.py; these tests pin the MATHEMATICAL invariants a
hash can't express: known-value checks on hand-computable inputs,
bound/range checks, and cross-operator consistency (CCF lag 0 vs a
direct Pearson; stump gain non-negativity; Fleiss vs perfect
agreement).
"""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.registry import load_all

SPECS = load_all()


def test_fleiss_kappa_range_and_consistency(spark, sf_dir):
    row = SPECS["fleiss_kappa_raters"].builder(spark, sf_dir).collect()[0]
    assert row["n_docs"] > 0
    # p_bar is a mean of per-item pair-agreement shares -> [0, 1];
    # kappa <= 1 always, and p_e in (0, 1] for binary raters
    assert 0.0 <= row["p_bar_r6"] <= 1.0
    assert 0.0 < row["p_e_r6"] <= 1.0
    assert row["fleiss_kappa_r6"] is None or row["fleiss_kappa_r6"] <= 1.0
    # identity: total pass count can't exceed 3 raters x n docs
    assert 0 <= row["n_passes"] <= 3 * row["n_docs"]


def test_kruskal_wallis_nonnegative_and_tie_corrected_larger(spark, sf_dir):
    row = SPECS["kruskal_wallis_h"].builder(spark, sf_dir).collect()[0]
    assert row["n_groups"] >= 2
    # H >= 0 up to float close; the tie correction divides by
    # C in (0, 1], so the corrected stat can only grow
    assert row["h_r6"] >= -1e-6
    assert row["h_tie_corrected_r6"] >= row["h_r6"] - 1e-6


def test_calibration_bins_partition_population(spark, sf_dir):
    rows = SPECS["calibration_reliability_bins"].builder(spark, sf_dir).collect()
    import duckdb

    n_cust = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/customer.parquet'"
    ).fetchone()[0]
    assert sum(r["n"] for r in rows) == n_cust  # bins partition exactly
    assert all(0 <= r["bin"] <= 9 for r in rows)
    for r in rows:
        assert 0.0 <= r["obs_rate_r6"] <= 1.0
        assert -1e-6 <= r["avg_pred_r6"] <= 1.0 + 1e-6
        assert abs(r["gap_r6"] - abs(r["avg_pred_r6"] - r["obs_rate_r6"])) < 2e-6


def test_ccf_lag0_matches_direct_pearson(spark, sf_dir):
    rows = SPECS["ccf_views_purchases"].builder(spark, sf_dir).collect()
    got = {r["lag"]: r for r in rows}
    assert set(got) == set(range(8))
    # independent lag-0 recomputation in plain python via duckdb
    import duckdb

    days = duckdb.sql(
        f"""
        SELECT SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS y
        FROM '{sf_dir}/events.parquet' GROUP BY CAST(ts AS DATE)
        """
    ).fetchall()
    xs = [r[0] for r in days]
    ys = [r[1] for r in days]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    corr = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert got[0]["n_days"] == n
    assert abs(got[0]["ccf_r6"] - corr) < 1e-5
    # every lag shrinks the overlap window by at most the lag
    for lag in range(1, 8):
        assert got[lag]["n_days"] <= n


def test_customer_distribution_counts_every_customer(spark, sf_dir):
    rows = SPECS["customer_orders_distribution"].builder(spark, sf_dir).collect()
    import duckdb

    n_cust = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/customer.parquet'"
    ).fetchone()[0]
    n_orders = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r["custdist"] for r in rows) == n_cust
    # every order belongs to exactly one customer bucket
    assert sum(r["c_count"] * r["custdist"] for r in rows) == n_orders


def test_stump_gain_nonnegative_and_sides_partition(spark, sf_dir):
    rows = SPECS["stump_split_gain"].builder(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 19
    total = rows[0]["n_left"] + rows[0]["n_right"]
    for r in rows:
        # any split of a fixed parent: weighted child impurity never
        # exceeds parent impurity (Gini gain >= 0, up to float close)
        assert r["gini_gain_r6"] >= -1e-6
        assert r["n_left"] + r["n_right"] == total
    # left side grows monotonically with the split bin
    lefts = [r["n_left"] for r in rows]
    assert lefts == sorted(lefts)


def test_small_quantity_revenue_subset_bound(spark, sf_dir):
    row = SPECS["small_quantity_revenue"].builder(spark, sf_dir).collect()[0]
    import duckdb

    brand_total = duckdb.sql(
        f"""
        SELECT SUM(l.l_extendedprice) / 7.0, COUNT(*)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
        """
    ).fetchone()
    # the small-quantity slice is a strict subset of the brand slice
    assert row["n_small_lines"] <= brand_total[1]
    assert row["avg_yearly"] <= brand_total[0] + 1e-6
