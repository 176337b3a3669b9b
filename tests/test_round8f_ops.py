"""Batch-10 (round-8) operator invariants beyond oracle parity."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.registry import load_all

SPECS = load_all()


def test_t_closeness_in_unit_interval_and_ordered(spark, sf_dir):
    rows = SPECS["t_closeness_audit"].builder(spark, sf_dir).collect()
    assert rows
    vals = [r["t_closeness_r6"] for r in rows]
    # TVD is a metric in [0, 1]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals == sorted(vals, reverse=True)
    assert all(r["group_size"] >= 1 for r in rows)


def test_seasonal_anomalies_are_extreme_days(spark, sf_dir):
    rows = SPECS["seasonal_anomaly_days"].builder(spark, sf_dir).collect()
    # every reported day exceeds the threshold by construction
    assert all(abs(r["resid_z_r6"]) > 2.0 for r in rows)
    days = [r["day"] for r in rows]
    assert days == sorted(days)


def test_dirichlet_scores_negative_and_ranked(spark, sf_dir):
    rows = SPECS["dirichlet_ql_retrieval"].builder(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 25
    # log-probabilities of a 3-term query are strictly negative
    assert all(r["ql_score_r6"] < 0 for r in rows)
    scores = [r["ql_score_r6"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_hhi_bounds_and_equal_share_floor(spark, sf_dir):
    rows = SPECS["hhi_concentration"].builder(spark, sf_dir).collect()
    for r in rows:
        # HHI in [1/n, 1]; normalized variant in [0, 1]
        assert 1.0 / r["n_custs"] - 1e-6 <= r["hhi_r6"] <= 1.0 + 1e-6
        assert -1e-6 <= r["hhi_normalized_r6"] <= 1.0 + 1e-6


def test_feature_scaling_ranges(spark, sf_dir):
    rows = SPECS["feature_scaling_suite"].builder(spark, sf_dir).collect()
    assert len(rows) <= 1000
    for r in rows:
        assert -1e-6 <= r["minmax_r6"] <= 1.0 + 1e-6
    # robust scaling is unbounded but centered: the median row maps to 0
    med = duckdb.sql(
        f"""
        SELECT quantile_cont(CAST(ROUND(c_acctbal * 100) AS DOUBLE), 0.5)
        FROM '{sf_dir}/customer.parquet'
        """
    ).fetchone()[0]
    # at least one customer sits at/near the median -> robust ~ 0 exists
    assert any(abs(r["robust_r6"]) < 0.5 for r in rows)
