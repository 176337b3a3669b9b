"""Batch-7 (round-8) operator invariants beyond oracle parity:
causal-readout identities, forecast-metric bounds, Good-Turing mass
conservation, winnowing's substring-detection guarantee, and LPA
determinism.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.registry import load_all

SPECS = load_all()


def test_cuped_reduces_to_raw_mean_identity(spark, sf_dir):
    rows = SPECS["cuped_adjusted_ab"].builder(spark, sf_dir).collect()
    assert [r["variant"] for r in rows] == [0, 1]
    # CUPED preserves the POOLED mean: sum n_v * (mean_adj - mean_raw)
    # over variants telescopes to -theta * sum(x - xbar) = 0
    drift = sum(
        r["n_users"] * (r["mean_cuped_r6"] - r["mean_y_r6"]) for r in rows
    )
    total = sum(r["n_users"] for r in rows)
    assert abs(drift / total) < 1e-3  # rounding of the two means
    # both variants carry the same pooled theta
    assert rows[0]["theta_r6"] == rows[1]["theta_r6"]


def test_did_equals_cell_arithmetic(spark, sf_dir):
    r = SPECS["diff_in_diff_spend"].builder(spark, sf_dir).collect()[0]
    did = (r["treated_post_r6"] - r["treated_pre_r6"]) - (
        r["control_post_r6"] - r["control_pre_r6"]
    )
    assert abs(r["did_r6"] - did) < 5e-6


def test_stratified_ate_strata_partition_users(spark, sf_dir):
    rows = SPECS["stratified_ate_bins"].builder(spark, sf_dir).collect()
    assert all(0 <= r["stratum"] <= 4 for r in rows)
    assert all(0 <= r["n_treated"] <= r["n_users"] for r in rows)
    for r in rows:
        if r["mean_t_r6"] is not None and r["mean_c_r6"] is not None:
            assert abs(
                r["effect_r6"] - (r["mean_t_r6"] - r["mean_c_r6"])
            ) < 5e-6


def test_seasonal_naive_metric_bounds(spark, sf_dir):
    r = SPECS["seasonal_naive_backtest"].builder(spark, sf_dir).collect()[0]
    assert r["n_days"] > 0
    assert r["mae_r4"] >= 0
    # sMAPE is bounded in [0, 2] by construction
    assert 0.0 <= r["smape_r6"] <= 2.0
    assert r["mape_r6"] >= 0.0


def test_good_turing_mass_shares_sum_to_one(spark, sf_dir):
    rows = SPECS["good_turing_counts"].builder(spark, sf_dir).collect()
    # the synthetic corpus has < 25 count classes, so the LIMIT keeps
    # every class and the mass shares must partition the corpus
    if len(rows) < 25:
        assert abs(sum(r["mass_share_r6"] for r in rows) - 1.0) < 1e-4
    rs = [r["r"] for r in rows]
    assert rs == sorted(rs)
    for r in rows:
        if r["r_star_r6"] is not None:
            assert r["r_star_r6"] >= 0.0


def test_winnowing_catches_planted_duplicate(spark, tmp_path):
    # the winnowing guarantee: two docs sharing a long substring MUST
    # share at least one fingerprint (any k+w-1 window contains a
    # selected minimum) — plant a near-dup pair and assert detection
    import pandas as pd

    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [
        (1, base + "alpha ending one", "en", "s", len(base) + 16),
        (2, base + "totally different tail here", "en", "s", len(base) + 27),
        (3, "completely unrelated short text body", "en", "s", 37),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = str(tmp_path / "documents.parquet")
    pdf.to_parquet(d)
    # the operator reads <dir>/documents.parquet
    out = (
        SPECS["winnowing_neardup_pairs"]
        .builder(spark, str(tmp_path))
        .collect()
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    assert (1, 2) in pairs
    shared = {(r["doc_a"], r["doc_b"]): r["shared"] for r in out}
    # the planted pair shares far more fingerprints than any chance pair
    assert shared[(1, 2)] >= 3


def test_lpa_deterministic_and_members_positive(spark, sf_dir):
    a = SPECS["label_propagation_communities"].builder(spark, sf_dir).collect()
    b = SPECS["label_propagation_communities"].builder(spark, sf_dir).collect()
    assert a == b  # sync rounds + total tie-break = fully deterministic
    assert all(r["n_members"] >= 1 for r in a)
    sizes = [r["n_members"] for r in a]
    assert sizes == sorted(sizes, reverse=True)
