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


def test_kendall_tau_matches_bruteforce(spark, sf_dir):
    """Pin tau-b against an O(n^2) pairwise reference on the operator's
    own (priority, bucket) pairs — catches normalisation errors the
    oracle can't (both engines once shared a tau/2 bug)."""
    import duckdb
    import math

    pairs = duckdb.sql(
        f"""
        WITH o AS (
          SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pr,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS s
          FROM '{sf_dir}/orders.parquet'),
        mm AS (SELECT MIN(s) AS mn, MAX(s) AS mx FROM o)
        SELECT pr, CAST(((s - mn) * 5) // (mx - mn + 1) AS BIGINT) AS qb
        FROM o CROSS JOIN mm
        """
    ).fetchall()
    n = len(pairs)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            dp = pairs[i][0] - pairs[j][0]
            dq = pairs[i][1] - pairs[j][1]
            if dp * dq > 0:
                conc += 1
            elif dp * dq < 0:
                disc += 1
    from collections import Counter

    rt = Counter(p[0] for p in pairs)
    ct = Counter(p[1] for p in pairs)
    n0 = n * (n - 1) / 2
    n1 = sum(t * (t - 1) / 2 for t in rt.values())
    n2 = sum(t * (t - 1) / 2 for t in ct.values())
    want = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
    r = SPECS["kendall_tau_priority_price"].builder(spark, sf_dir).collect()[0]
    assert abs(r["tau_b_r6"] - want) < 1e-5, (r["tau_b_r6"], want)


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
