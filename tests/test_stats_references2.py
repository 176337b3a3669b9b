"""Second batch of independent textbook references (the tau-b lesson):
contingency/information statistics, the rater family, Gini, per-user
OLS, ACF, and source JSD — each recomputed from raw data with plain
numpy/python and compared against the operator output at sf0.001.
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
TOL = 2e-5


def _rater_labels(sf_dir):
    return duckdb.sql(
        f"""
        SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
               CASE WHEN length(text) - length(replace(text, ' ', ''))
                         + 1 >= 55 THEN 1 ELSE 0 END AS b,
               CASE WHEN text LIKE '% the %' THEN 1 ELSE 0 END AS c
        FROM '{sf_dir}/documents.parquet'
        """
    ).fetchall()


def test_chisq_and_cramers_reference(spark, sf_dir):
    obs_rows = duckdb.sql(
        f"""
        SELECT o_orderpriority, o_orderstatus, COUNT(*)
        FROM '{sf_dir}/orders.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    n = sum(r[2] for r in obs_rows)
    rt = Counter()
    ct = Counter()
    for p, s, c in obs_rows:
        rt[p] += c
        ct[s] += c
    chi2 = sum(
        (c - rt[p] * ct[s] / n) ** 2 / (rt[p] * ct[s] / n)
        for p, s, c in obs_rows
    )
    r = SPECS["cramers_v_priority_status"].builder(spark, sf_dir).collect()[0]
    assert r["n_rows"] == n
    assert abs(r["chi2_r6"] - chi2) < 1e-4
    m = min(len(rt), len(ct))
    v = math.sqrt(chi2 / (n * (m - 1)))
    assert abs(r["cramers_v_r6"] - v) < TOL
    # chisq_type_weekday: verify the term decomposition sums correctly
    rows = SPECS["chisq_type_weekday"].builder(spark, sf_dir).collect()
    ev = duckdb.sql(
        f"""
        SELECT event_type, isodow(CAST(ts AS DATE)) AS dow, COUNT(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    en = sum(x[2] for x in ev)
    ert = Counter()
    ect = Counter()
    for et, d, c in ev:
        ert[et] += c
        ect[d] += c
    want = {
        (et, d): (c, ert[et] * ect[d] / en) for et, d, c in ev
    }
    for row in rows:
        obs, exp = want[(row["event_type"], row["dow"])]
        assert row["obs"] == obs
        assert abs(row["expected_r6"] - exp) < 1e-4
        assert abs(row["chisq_term_r6"] - (obs - exp) ** 2 / exp) < 1e-4


def test_mutual_information_reference(spark, sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT o_orderpriority, o_orderstatus, COUNT(*)
        FROM '{sf_dir}/orders.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    n = sum(r[2] for r in rows)
    rt = Counter()
    ct = Counter()
    for p, s, c in rows:
        rt[p] += c
        ct[s] += c
    mi = sum(
        c / n * math.log(c * n / (rt[p] * ct[s])) for p, s, c in rows
    )
    r = SPECS["mutual_information_cats"].builder(spark, sf_dir).collect()[0]
    assert r["n_rows"] == n and r["n_cells"] == len(rows)
    assert abs(r["mi_nats_r6"] - mi) < TOL


def test_kappa_family_reference(spark, sf_dir):
    labs = _rater_labels(sf_dir)
    n = len(labs)
    # Cohen's kappa on raters A, B
    n11 = sum(1 for a, b, _ in labs if a == 1 and b == 1)
    n00 = sum(1 for a, b, _ in labs if a == 0 and b == 0)
    pa = sum(a for a, _, _ in labs) / n
    pb = sum(b for _, b, _ in labs) / n
    po = (n11 + n00) / n
    pe = pa * pb + (1 - pa) * (1 - pb)
    r = SPECS["cohens_kappa_labels"].builder(spark, sf_dir).collect()[0]
    assert r["n_docs"] == n and r["n11"] == n11 and r["n00"] == n00
    assert abs(r["po_r6"] - po) < TOL
    assert abs(r["pe_r6"] - pe) < TOL
    assert abs(r["kappa_r6"] - (po - pe) / (1 - pe)) < TOL
    # McNemar on A vs B
    n10 = sum(1 for a, b, _ in labs if a == 1 and b == 0)
    n01 = sum(1 for a, b, _ in labs if a == 0 and b == 1)
    rm = SPECS["mcnemar_rater_shift"].builder(spark, sf_dir).collect()[0]
    assert rm["n10"] == n10 and rm["n01"] == n01
    if n10 + n01:
        assert (
            abs(rm["mcnemar_chi2_r6"] - (n10 - n01) ** 2 / (n10 + n01))
            < 1e-4
        )
    # Fleiss' kappa on A, B, C
    p_bar = (
        sum(
            sum(x) * (sum(x) - 1) + (3 - sum(x)) * (2 - sum(x))
            for x in labs
        )
        / (n * 6)
    )
    p1 = sum(sum(x) for x in labs) / (3 * n)
    p_e = p1**2 + (1 - p1) ** 2
    rf = SPECS["fleiss_kappa_raters"].builder(spark, sf_dir).collect()[0]
    assert abs(rf["p_bar_r6"] - p_bar) < TOL
    assert abs(rf["fleiss_kappa_r6"] - (p_bar - p_e) / (1 - p_e)) < TOL
    # Cochran's Q on A, B, C
    cA = sum(a for a, _, _ in labs)
    cB = sum(b for _, b, _ in labs)
    cC = sum(c for _, _, c in labs)
    sr = cA + cB + cC
    sr2 = sum(sum(x) ** 2 for x in labs)
    den = 3 * sr - sr2
    rq = SPECS["cochran_q_raters"].builder(spark, sf_dir).collect()[0]
    if den > 0:
        q = 2 * (3 * (cA**2 + cB**2 + cC**2) - sr**2) / den
        assert abs(rq["q_stat_r6"] - q) < 1e-4


def test_gini_reference(spark, sf_dir):
    got = {
        r["c_mktsegment"]: r
        for r in SPECS["gini_revenue_concentration"]
        .builder(spark, sf_dir)
        .collect()
    }
    rows = duckdb.sql(
        f"""
        WITH rev AS (
          SELECT o_custkey,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x
          FROM '{sf_dir}/orders.parquet' GROUP BY 1)
        SELECT c.c_mktsegment, rev.x
        FROM rev JOIN '{sf_dir}/customer.parquet' c
          ON c.c_custkey = rev.o_custkey
        """
    ).fetchall()
    by_seg: dict = {}
    for seg, x in rows:
        by_seg.setdefault(seg, []).append(x)
    for seg, xs in by_seg.items():
        xs = np.sort(np.array(xs, float))
        n = len(xs)
        # textbook Gini: sum((2i - n - 1) x_i) / (n sum x), i = 1..n
        i = np.arange(1, n + 1)
        g = ((2 * i - n - 1) * xs).sum() / (n * xs.sum())
        assert abs(got[seg]["gini"] - g) < 1e-4, seg


def test_ols_reference(spark, sf_dir):
    got = {
        r["user_id"]: r
        for r in SPECS["spend_trend_ols"].builder(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT user_id,
               CAST(datediff('day', DATE '1970-01-01',
                    CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
        FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL
        GROUP BY 1, date_trunc('day', ts)
        """
    ).fetchall()
    by_user: dict = {}
    for u, x, y in rows:
        by_user.setdefault(u, []).append((x, y))
    checked = 0
    for u, pts in by_user.items():
        if u not in got:
            continue
        m = np.array(pts, float)
        x, y = m[:, 0], m[:, 1]
        slope, intercept = np.polyfit(x, y, 1)
        r = got[u]
        assert abs(r["slope_r6"] - slope) < max(1e-4, abs(slope) * 1e-5)
        assert abs(r["intercept_r6"] - intercept) < max(
            2e-3, abs(intercept) * 1e-5
        )
        checked += 1
    assert checked > 0


def test_acf_reference(spark, sf_dir):
    got = {
        (r["event_type"], r["lag_days"]): r
        for r in SPECS["acf_daily_counts"].builder(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE), COUNT(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    series: dict = {}
    for et, day, c in rows:
        series.setdefault(et, {})[day] = c
    import datetime

    checked = 0
    for et, d in series.items():
        for k in range(1, 8):
            pairs = [
                (d[day], d[day + datetime.timedelta(days=k)])
                for day in d
                if day + datetime.timedelta(days=k) in d
            ]
            if (et, k) not in got:
                continue
            m = np.array(pairs, float)
            r_ref = np.corrcoef(m[:, 0], m[:, 1])[0, 1]
            r = got[(et, k)]
            assert r["n_pairs"] == len(pairs)
            if not math.isnan(r_ref) and r["acf_r6"] is not None:
                assert abs(r["acf_r6"] - r_ref) < 1e-4
                checked += 1
    assert checked > 0


def test_jsd_reference(spark, sf_dir):
    got = {
        r["source"]: r
        for r in SPECS["source_jsd_divergence"].builder(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        WITH tok AS (
          SELECT source,
                 unnest(list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   t -> t <> '')) AS token
          FROM '{sf_dir}/documents.parquet')
        SELECT source, token, COUNT(*) FROM tok GROUP BY 1, 2
        """
    ).fetchall()
    per_src: dict = {}
    glob: Counter = Counter()
    for src, tok, c in rows:
        per_src.setdefault(src, Counter())[tok] = c
        glob[tok] += c
    n = sum(glob.values())
    for src, cnt in per_src.items():
        ns = sum(cnt.values())
        jsd = 0.0
        # JSD(P_src || P_global) with M = (P+Q)/2 over the union support
        for tok in set(cnt) | set(glob):
            p = cnt.get(tok, 0) / ns
            q = glob[tok] / n
            m = (p + q) / 2
            if p > 0:
                jsd += 0.5 * p * math.log(p / m)
            if q > 0:
                jsd += 0.5 * q * math.log(q / m)
        assert abs(got[src]["jsd"] - jsd) < 1e-4, src
