"""Batch-8 (round-8) operator invariants beyond oracle parity."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.registry import load_all

SPECS = load_all()


def test_cochran_q_nonnegative_and_consistent_with_raters(spark, sf_dir):
    r = SPECS["cochran_q_raters"].builder(spark, sf_dir).collect()[0]
    assert r["n_docs"] > 0
    for c in ("pass_a", "pass_b", "pass_c"):
        assert 0 <= r[c] <= r["n_docs"]
    # Q is a chi-square-type statistic: nonnegative up to float close
    assert r["q_stat_r6"] is None or r["q_stat_r6"] >= -1e-6


def test_kendall_tau_within_bounds(spark, sf_dir):
    r = SPECS["kendall_tau_priority_price"].builder(spark, sf_dir).collect()[0]
    assert -1.0 <= r["tau_b_r6"] <= 1.0
    assert r["concordant"] >= 0 and r["discordant"] >= 0
    # concordant + discordant can never exceed total pairs n(n-1)/2
    assert (
        r["concordant"] + r["discordant"]
        <= r["n_orders"] * (r["n_orders"] - 1) / 2
    )


def test_tukey_fences_rates_and_quartile_order(spark, sf_dir):
    rows = SPECS["tukey_fences_outliers"].builder(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["q1_r4"] <= r["q3_r4"]
        assert 0 <= r["n_outliers"] <= r["n"]
        assert 0.0 <= r["outlier_rate_r6"] <= 1.0


def test_page_hinkley_stat_nonnegative(spark, sf_dir):
    r = SPECS["page_hinkley_drift"].builder(spark, sf_dir).collect()[0]
    # stat = cum - running_min(cum) >= 0 by construction
    assert r["ph_stat_r4"] >= 0.0
    assert r["n_days"] > 0
    assert r["drift_day"] is not None


def test_event_trigrams_counts_and_determinism(spark, sf_dir):
    a = SPECS["event_type_trigrams"].builder(spark, sf_dir).collect()
    b = SPECS["event_type_trigrams"].builder(spark, sf_dir).collect()
    assert a == b
    ns = [r["n"] for r in a]
    assert ns == sorted(ns, reverse=True)
    assert all(r["n"] >= 1 for r in a)


def test_friedman_nonnegative_and_block_complete(spark, sf_dir):
    r = SPECS["friedman_event_types"].builder(spark, sf_dir).collect()[0]
    assert r["n_treatments"] >= 2
    assert r["n_blocks"] > 0
    # chi-square-type statistic
    assert r["friedman_r6"] >= -1e-6


def test_hits_l1_normalised_and_scores_positive(spark, sf_dir):
    rows = SPECS["hits_hub_authority"].builder(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 25
    for r in rows:
        assert r["authority_r6"] >= 0.0
        assert r["hub_r6"] >= 0.0
    # L1 normalisation: the FULL authority vector sums to 1, so the
    # top-25 slice must sum to <= 1 (+ rounding slack)
    assert sum(r["authority_r6"] for r in rows) <= 1.0 + 25e-6
    scores = [r["authority_r6"] for r in rows]
    assert scores == sorted(scores, reverse=True)
