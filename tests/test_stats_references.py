"""Independent textbook references for the statistics family.

The round-8 Kendall tau-b lesson: a formula error shared by the Spark
plan and its DuckDB oracle is INVISIBLE to hash parity, because both
sides are usually derived from the same algebra. These tests
recompute each statistic from RAW data with straightforward numpy
implementations of the textbook formulas — a third, independent
derivation — and compare against the operator output at sf0.001.
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.registry import load_all

SPECS = load_all()

TOL = 2e-5  # operator outputs are rounded at 1e-6; references are float64


def _events_weekday_split(sf_dir):
    """(event_type, is_weekend, cents) rows exactly as the ops define."""
    return duckdb.sql(
        f"""
        SELECT event_type,
               CASE WHEN isodow(CAST(ts AS DATE)) IN (6, 7)
                    THEN 1 ELSE 0 END AS we,
               CAST(ROUND(value * 100) AS BIGINT) AS x
        FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL
        """
    ).fetchall()


def _midranks(values):
    """values -> {value: average rank (1-based)} with ties averaged."""
    c = Counter(values)
    ranks = {}
    below = 0
    for v in sorted(c):
        t = c[v]
        ranks[v] = below + (t + 1) / 2
        below += t
    return ranks


def test_welch_reference(spark, sf_dir):
    rows = _events_weekday_split(sf_dir)
    got = {
        r["event_type"]: r
        for r in SPECS["welch_mean_test"].builder(spark, sf_dir).collect()
    }
    by_type: dict = {}
    for et, we, x in rows:
        by_type.setdefault(et, ([], []))[we].append(x)
    for et, (wd, wk) in by_type.items():
        if len(wd) < 2 or len(wk) < 2:
            assert et not in got
            continue
        a, b = np.array(wd, float), np.array(wk, float)
        v1, v2 = a.var(ddof=1), b.var(ddof=1)
        se2 = v1 / len(a) + v2 / len(b)
        t = (a.mean() - b.mean()) / math.sqrt(se2)
        df = se2**2 / (
            (v1 / len(a)) ** 2 / (len(a) - 1)
            + (v2 / len(b)) ** 2 / (len(b) - 1)
        )
        r = got[et]
        assert abs(r["mean_diff_cents_r6"] - (a.mean() - b.mean())) < 1e-3
        assert abs(r["t_stat_r6"] - t) < TOL
        assert abs(r["welch_df_r6"] - df) < 1e-3


def test_ks_reference(spark, sf_dir):
    rows = _events_weekday_split(sf_dir)
    got = {
        r["event_type"]: r
        for r in SPECS["ks_two_sample"].builder(spark, sf_dir).collect()
    }
    by_type: dict = {}
    for et, we, x in rows:
        by_type.setdefault(et, ([], []))[we].append(x)
    for et, (wd, wk) in by_type.items():
        if et not in got:
            continue
        a, b = np.sort(np.array(wd, float)), np.sort(np.array(wk, float))
        grid = np.union1d(a, b)
        f1 = np.searchsorted(a, grid, side="right") / len(a)
        f2 = np.searchsorted(b, grid, side="right") / len(b)
        d = np.abs(f1 - f2).max()
        r = got[et]
        assert abs(r["ks_d_r6"] - d) < TOL
        scale = math.sqrt(len(a) * len(b) / (len(a) + len(b)))
        assert abs(r["ks_scaled_r6"] - d * scale) < 1e-4


def test_mann_whitney_reference(spark, sf_dir):
    rows = _events_weekday_split(sf_dir)
    got = {
        r["event_type"]: r
        for r in SPECS["mann_whitney_u"].builder(spark, sf_dir).collect()
    }
    by_type: dict = {}
    for et, we, x in rows:
        by_type.setdefault(et, ([], []))[we].append(x)
    for et, (wd, wk) in by_type.items():
        if et not in got:
            continue
        n1, n2 = len(wd), len(wk)
        ranks = _midranks(wd + wk)
        r1 = sum(ranks[v] for v in wd)
        u1 = r1 - n1 * (n1 + 1) / 2
        n = n1 + n2
        tie = sum(t**3 - t for t in Counter(wd + wk).values())
        mu = n1 * n2 / 2
        var = n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
        r = got[et]
        assert abs(r["u_stat_r6"] - u1) < 1e-3
        if var > 0:
            assert abs(r["z_stat_r6"] - (u1 - mu) / math.sqrt(var)) < TOL


def test_spearman_reference(spark, sf_dir):
    got = {
        r["l_returnflag"]: r
        for r in SPECS["spearman_rank_corr"].builder(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT l_returnflag,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT),
               CAST(l_quantity AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet'
        """
    ).fetchall()
    by_flag: dict = {}
    for fl, x, y in rows:
        by_flag.setdefault(fl, []).append((x, y))
    for fl, pts in by_flag.items():
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        rx = _midranks(xs)
        ry = _midranks(ys)
        a = np.array([rx[v] for v in xs])
        b = np.array([ry[v] for v in ys])
        rho = np.corrcoef(a, b)[0, 1]
        assert abs(got[fl]["spearman_r6"] - rho) < TOL, fl


def test_anova_reference(spark, sf_dir):
    r = SPECS["anova_f_oneway"].builder(spark, sf_dir).collect()[0]
    rows = _events_weekday_split(sf_dir)
    groups: dict = {}
    for et, _we, x in rows:
        groups.setdefault(et, []).append(x)
    arrs = [np.array(v, float) for v in groups.values()]
    grand = np.concatenate(arrs).mean()
    ssb = sum(len(a) * (a.mean() - grand) ** 2 for a in arrs)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in arrs)
    k = len(arrs)
    n = sum(len(a) for a in arrs)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["k_groups"] == k and r["n_total"] == n
    # the operator reports sums of squares in currency units
    # (dollars^2 = cents^2 / 1e4); the F statistic is unit-free
    assert abs(r["ss_between_r6"] - ssb / 1e4) / max(ssb / 1e4, 1) < 1e-6
    assert abs(r["ss_within_r6"] - ssw / 1e4) / max(ssw / 1e4, 1) < 1e-6
    assert abs(r["f_stat_r6"] - f) < TOL


def test_brown_forsythe_reference(spark, sf_dir):
    r = SPECS["brown_forsythe_test"].builder(spark, sf_dir).collect()[0]
    rows = _events_weekday_split(sf_dir)
    groups: dict = {}
    for et, _we, x in rows:
        groups.setdefault(et, []).append(x)
    # the operator uses the exact INTERPOLATED median (computed on a
    # doubled integer scale); mirror it
    zs = []
    for v in groups.values():
        v = sorted(v)
        n_v = len(v)
        med = (v[(n_v - 1) // 2] + v[n_v // 2]) / 2
        zs.append(np.abs(np.array(v, float) - med))
    grand = np.concatenate(zs).mean()
    k = len(zs)
    n = sum(len(a) for a in zs)
    ssb = sum(len(a) * (a.mean() - grand) ** 2 for a in zs)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in zs)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["k_groups"] == k and r["n_total"] == n
    assert abs(r["f_bf_r6"] - f) < TOL


def test_kruskal_reference(spark, sf_dir):
    r = SPECS["kruskal_wallis_h"].builder(spark, sf_dir).collect()[0]
    rows = _events_weekday_split(sf_dir)
    groups: dict = {}
    allx = []
    for et, _we, x in rows:
        groups.setdefault(et, []).append(x)
        allx.append(x)
    ranks = _midranks(allx)
    n = len(allx)
    h = 12 / (n * (n + 1)) * sum(
        sum(ranks[v] for v in g) ** 2 / len(g) for g in groups.values()
    ) - 3 * (n + 1)
    tie = sum(t**3 - t for t in Counter(allx).values())
    corr = 1 - tie / (n**3 - n)
    assert r["n_groups"] == len(groups) and r["n_total"] == n
    assert abs(r["h_r6"] - h) < 1e-4
    assert abs(r["h_tie_corrected_r6"] - h / corr) < 1e-4


def test_friedman_reference(spark, sf_dir):
    r = SPECS["friedman_event_types"].builder(spark, sf_dir).collect()[0]
    rows = duckdb.sql(
        f"""
        SELECT user_id, event_type,
               AVG(CAST(ROUND(value * 100) AS BIGINT)) AS v
        FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL
        GROUP BY 1, 2
        """
    ).fetchall()
    k_all = len({et for _u, et, _v in rows})
    blocks: dict = {}
    for u, et, v in rows:
        blocks.setdefault(u, {})[et] = v
    full = {u: d for u, d in blocks.items() if len(d) == k_all}
    rj: Counter = Counter()
    for d in full.values():
        ranks = _midranks(list(d.values()))
        for et, v in d.items():
            rj[et] += ranks[v]
    n, k = len(full), k_all
    stat = 12 / (n * k * (k + 1)) * sum(v**2 for v in rj.values()) - 3 * n * (
        k + 1
    )
    assert r["n_blocks"] == n and r["n_treatments"] == k
    assert abs(r["friedman_r6"] - stat) < 1e-4


def test_partial_corr_reference(spark, sf_dir):
    got = {
        r["l_returnflag"]: r
        for r in SPECS["partial_corr_price_qty"].builder(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT l_returnflag, l_extendedprice, l_quantity, l_discount
        FROM '{sf_dir}/lineitem.parquet'
        """
    ).fetchall()
    by_flag: dict = {}
    for fl, x, y, z in rows:
        by_flag.setdefault(fl, []).append((float(x), float(y), float(z)))
    for fl, pts in by_flag.items():
        m = np.array(pts)
        r_xy = np.corrcoef(m[:, 0], m[:, 1])[0, 1]
        r_xz = np.corrcoef(m[:, 0], m[:, 2])[0, 1]
        r_yz = np.corrcoef(m[:, 1], m[:, 2])[0, 1]
        want = (r_xy - r_xz * r_yz) / math.sqrt(
            (1 - r_xz**2) * (1 - r_yz**2)
        )
        assert abs(got[fl]["r_xy_r6"] - r_xy) < TOL
        assert abs(got[fl]["partial_r_r6"] - want) < TOL
