"""Third batch of independent textbook references: Theil-Sen,
Kaplan-Meier / Nelson-Aalen survival, Benford digit law, PSI, BM25.
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


def test_theil_sen_reference(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in SPECS["theil_sen_trend"].builder(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
        FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL
        GROUP BY 1, 2
        """
    ).fetchall()
    import datetime

    epoch = datetime.date(2024, 1, 1)
    series: dict = {}
    for et, day, c in rows:
        series.setdefault(et, []).append((day, c))
    for et, pts in series.items():
        if et not in got:
            continue
        slopes = []
        for i in range(len(pts)):
            for j in range(len(pts)):
                (da, ca), (db, cb) = pts[i], pts[j]
                if db > da:
                    slopes.append((cb - ca) / (db - da).days)
        slope = float(np.quantile(np.array(slopes), 0.5))
        icpt = float(
            np.quantile(
                np.array(
                    [c - slope * (d - epoch).days for d, c in pts]
                ),
                0.5,
            )
        )
        r = got[et]
        assert r["n_pairs"] == len(slopes)
        assert abs(r["sen_slope_r6"] - slope) < 1e-4
        assert abs(r["sen_intercept_r6"] - icpt) < 1e-3


def _lifetimes(sf_dir):
    return duckdb.sql(
        f"""
        WITH u AS (
          SELECT o_custkey,
                 MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS f,
                 MAX(year(o_orderdate) * 12 + month(o_orderdate)) AS l
          FROM '{sf_dir}/orders.parquet' GROUP BY 1),
        h AS (SELECT MAX(l) AS horizon FROM u)
        SELECT u.l - u.f AS t,
               CASE WHEN h.horizon - u.l <= 3 THEN 0 ELSE 1 END AS died
        FROM u CROSS JOIN h
        """
    ).fetchall()


def test_kaplan_meier_and_nelson_aalen_reference(spark, sf_dir):
    lts = _lifetimes(sf_dir)
    n = len(lts)
    deaths = Counter(t for t, d in lts if d == 1)
    anyone = Counter(t for t, _d in lts)
    km = {
        r["tenure_months"]: r
        for r in SPECS["kaplan_meier_churn"].builder(spark, sf_dir).collect()
    }
    na = {
        r["tenure_months"]: r
        for r in SPECS["nelson_aalen_hazard"].builder(spark, sf_dir).collect()
    }
    surv = 1.0
    cumhaz = 0.0
    varhaz = 0.0
    at_risk = n
    for t in sorted(anyone):
        d = deaths.get(t, 0)
        if t in km:
            r = km[t]
            assert r["n_at_risk"] == at_risk
            assert r["churned"] == d
        if d > 0:
            surv *= 1 - d / at_risk if d < at_risk else 0.0
            cumhaz += d / at_risk
            varhaz += d / (at_risk * at_risk)
        if t in km:
            assert abs(km[t]["survival_r6"] - surv) < TOL, t
        if t in na:
            assert abs(na[t]["cumhaz_r6"] - cumhaz) < TOL, t
            assert abs(na[t]["varhaz_r6"] - varhaz) < TOL, t
        at_risk -= anyone[t]


def test_benford_reference(spark, sf_dir):
    rows = SPECS["benford_first_digit"].builder(spark, sf_dir).collect()
    digs = duckdb.sql(
        f"""
        SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                    AS VARCHAR), 1, 1) AS INT) AS d, COUNT(*)
        FROM '{sf_dir}/orders.parquet' WHERE o_totalprice > 0 GROUP BY 1
        """
    ).fetchall()
    cnt = dict(digs)
    total = sum(cnt.values())
    for r in rows:
        d = r["digit"]
        assert r["cnt"] == cnt.get(d, 0)
        p_obs = cnt.get(d, 0) / total
        p_ben = math.log10(1 + 1 / d)
        assert abs(r["observed_p"] - p_obs) < TOL
        assert abs(r["benford_p"] - p_ben) < TOL
        exp = p_ben * total
        assert abs(r["chi2_term"] - (cnt.get(d, 0) - exp) ** 2 / exp) < 1e-3


def test_psi_reference(spark, sf_dir):
    rows = SPECS["psi_score_drift"].builder(spark, sf_dir).collect()
    raw = duckdb.sql(
        f"""
        SELECT c_custkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS s,
               c_custkey % 2 AS half
        FROM '{sf_dir}/customer.parquet'
        """
    ).fetchall()
    base = sorted(
        [(s, k) for k, s, h in raw if h == 0], key=lambda x: (x[0], x[1])
    )
    nb = len(base)
    # NTILE(10) edges: bucket i (1-based) gets ceil-sized leading groups
    sizes = [nb // 10 + (1 if i < nb % 10 else 0) for i in range(10)]
    edges = []
    pos = 0
    for sz in sizes[:9]:
        pos += sz
        edges.append(base[pos - 1][0])
    def bin_of(s):
        b = 1
        for e in edges:
            if s > e:
                b += 1
        return b
    cb = Counter(bin_of(s) for s, _k in base)
    cur = [s for k, s, h in raw if h == 1]
    cc = Counter(bin_of(s) for s in cur)
    n_cur = len(cur)
    for r in rows:
        b = r["bin"]
        assert r["n_base"] == cb.get(b, 0)
        assert r["n_cur"] == cc.get(b, 0)
        p = cb.get(b, 0) / nb
        q = cc.get(b, 0) / n_cur
        assert abs(r["p_r6"] - p) < TOL
        assert abs(r["q_r6"] - q) < TOL
        if p > 0 and q > 0:
            assert abs(r["psi_term_r6"] - (p - q) * math.log(p / q)) < 1e-4


def test_bm25_reference(spark, sf_dir):
    got = {
        r["doc_id"]: r
        for r in SPECS["bm25_topk"].builder(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           t -> t <> '') AS toks
        FROM '{sf_dir}/documents.parquet'
        """
    ).fetchall()
    terms = ("spark", "join", "window")
    docs = {r[0]: r[1] for r in rows}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {t: sum(1 for toks in docs.values() if t in toks) for t in terms}
    k1, b = 1.2, 0.75
    checked = 0
    for doc_id, r in got.items():
        toks = docs[doc_id]
        dl = len(toks)
        score = 0.0
        for t in terms:
            tf = toks.count(t)
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            score += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * dl / avgdl)
            )
        assert r["doc_len"] == dl
        assert abs(r["score"] - score) < 1e-4, doc_id
        checked += 1
    assert checked > 0
