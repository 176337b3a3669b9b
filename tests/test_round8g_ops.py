"""Batch-11 (round-8) operator invariants beyond oracle parity."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.registry import load_all

SPECS = load_all()


def test_entity_clusters_multimember_and_canonical_is_min(spark, sf_dir):
    rows = SPECS["entity_resolution_clusters"].builder(spark, sf_dir).collect()
    assert rows
    # clusters derived from pairs always have >= 2 members
    assert all(r["n_members"] >= 2 for r in rows)
    sizes = [r["n_members"] for r in rows]
    assert sizes == sorted(sizes, reverse=True)


def test_qini_identities(spark, sf_dir):
    rows = SPECS["qini_uplift_by_bin"].builder(spark, sf_dir).collect()
    # bins walk DOWN the score
    bins = [r["bin"] for r in rows]
    assert bins == sorted(bins, reverse=True)
    for r in rows:
        assert 0 <= r["conv_t"] <= r["n_t"]
        assert 0 <= r["conv_c"] <= r["n_c"]
        if r["uplift_r6"] is not None:
            assert -1.0 <= r["uplift_r6"] <= 1.0
    # total population equals the user count
    n_users = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert sum(r["n_t"] + r["n_c"] for r in rows) == n_users


def test_gdpr_cascade_is_consistent(spark, sf_dir):
    rows = {
        r["table_name"]: r
        for r in SPECS["gdpr_delete_impact"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == {"customer", "orders", "lineitem"}
    for r in rows.values():
        assert r["n_deleted"] + r["n_remaining"] == r["n_rows"]
        assert 0.0 <= r["deleted_share_r6"] <= 1.0
    # independent cascade recomputation
    want = duckdb.sql(
        f"""
        SELECT COUNT(*) FROM '{sf_dir}/lineitem.parquet'
        WHERE l_orderkey IN (
          SELECT o_orderkey FROM '{sf_dir}/orders.parquet'
          WHERE o_custkey % 97 = 0)
        """
    ).fetchone()[0]
    assert rows["lineitem"]["n_deleted"] == want


def test_degree_bins_cover_all_nodes(spark, sf_dir):
    rows = SPECS["degree_distribution_log_bins"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # bin b holds degrees in [2^b, 2^(b+1))
        assert 2 ** r["log2_bin"] <= r["min_degree"]
        assert r["max_degree"] < 2 ** (r["log2_bin"] + 1)
        assert r["min_degree"] <= r["max_degree"]
        assert r["n_nodes"] >= 1
