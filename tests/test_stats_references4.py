"""Fourth batch of independent textbook references: Markov transition
probabilities and conditional entropy, token PMI, Zipf slope, rolling
regression beta, and the EWMA recurrence (recomputed RECURSIVELY —
the operator computes it closed-form, so this checks the algebraic
rewrite, not just the arithmetic).
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter, defaultdict

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.registry import load_all

SPECS = load_all()
TOL = 2e-5


def _transitions(sf_dir):
    return duckdb.sql(
        f"""
        WITH seq AS (
          SELECT event_type AS cur,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS nxt
          FROM '{sf_dir}/events.parquet')
        SELECT cur, nxt, COUNT(*) FROM seq
        WHERE nxt IS NOT NULL GROUP BY 1, 2
        """
    ).fetchall()


def test_markov_transitions_reference(spark, sf_dir):
    got = {
        (r["from_type"], r["to_type"]): r
        for r in SPECS["markov_event_transitions"].builder(spark, sf_dir).collect()
    }
    trans = _transitions(sf_dir)
    row_tot = Counter()
    for cur, _nxt, c in trans:
        row_tot[cur] += c
    for cur, nxt, c in trans:
        if (cur, nxt) not in got:
            continue
        r = got[(cur, nxt)]
        assert r["cnt"] == c
        assert abs(r["prob"] - c / row_tot[cur]) < TOL


def test_conditional_entropy_reference(spark, sf_dir):
    got = {
        r["cur_type"]: r
        for r in SPECS["conditional_entropy_markov"].builder(spark, sf_dir).collect()
    }
    trans = _transitions(sf_dir)
    by_cur: dict = defaultdict(list)
    for cur, _nxt, c in trans:
        by_cur[cur].append(c)
    for cur, cs in by_cur.items():
        tot = sum(cs)
        h = -sum(c / tot * math.log(c / tot) for c in cs)
        r = got[cur]
        assert r["n_out"] == tot
        assert r["n_next_states"] == len(cs)
        assert abs(r["h_next_given_cur_r6"] - h) < TOL


def test_token_pmi_reference(spark, sf_dir):
    rows = SPECS["token_pmi_bigrams"].builder(spark, sf_dir).collect()
    toks = duckdb.sql(
        f"""
        SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           t -> t <> '')
        FROM '{sf_dir}/documents.parquet'
        """
    ).fetchall()
    uni: Counter = Counter()
    bg: Counter = Counter()
    for (t,) in toks:
        uni.update(t)
        for i in range(len(t) - 1):
            bg[(t[i], t[i + 1])] += 1
    t_uni = sum(uni.values())
    t_bg = sum(bg.values())
    checked = 0
    for r in rows:
        a, b = r["bigram"].split(" ", 1)
        assert r["c_pair"] == bg[(a, b)]
        assert r["c_a"] == uni[a] and r["c_b"] == uni[b]
        p_ab = bg[(a, b)] / t_bg
        want = math.log(p_ab / ((uni[a] / t_uni) * (uni[b] / t_uni)))
        assert abs(r["pmi"] - want) < 1e-4, r["bigram"]
        checked += 1
    assert checked > 0


def test_zipf_slope_reference(spark, sf_dir):
    r = SPECS["zipf_slope_tokens"].builder(spark, sf_dir).collect()[0]
    freqs = duckdb.sql(
        f"""
        WITH tok AS (
          SELECT unnest(list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   t -> t <> '')) AS token
          FROM '{sf_dir}/documents.parquet')
        SELECT token, COUNT(*) AS f FROM tok GROUP BY token
        ORDER BY f DESC, token
        """
    ).fetchall()
    y = np.log([f for _t, f in freqs])
    x = np.log(np.arange(1, len(freqs) + 1))
    slope, intercept = np.polyfit(x, y, 1)
    assert r["n_vocab"] == len(freqs)
    assert abs(r["zipf_slope_r6"] - slope) < 1e-4
    assert abs(r["intercept_r6"] - intercept) < 1e-3
    ss_res = ((y - (slope * x + intercept)) ** 2).sum()
    ss_tot = ((y - y.mean()) ** 2).sum()
    assert abs(r["r2_r6"] - (1 - ss_res / ss_tot)) < 1e-4


def test_rolling_beta_reference(spark, sf_dir):
    got = {
        r["day"]: r
        for r in SPECS["rolling_regression_beta"].builder(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT CAST(ts AS DATE) AS day,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END),
               SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
        FROM '{sf_dir}/events.parquet' GROUP BY 1
        """
    ).fetchall()
    import datetime

    daily = {d: (v, p) for d, v, p in rows}
    checked = 0
    for d, r in got.items():
        win = [
            daily[d + datetime.timedelta(days=k)]
            for k in range(-3, 4)
            if d + datetime.timedelta(days=k) in daily
        ]
        assert r["n_days"] == len(win) == 7  # full windows only
        m = np.array(win, float)
        x, y = m[:, 0], m[:, 1]
        n = len(x)
        beta = (n * (x * y).sum() - x.sum() * y.sum()) / (
            n * (x * x).sum() - x.sum() ** 2
        )
        assert abs(r["beta_r6"] - beta) < max(1e-4, abs(beta) * 1e-5)
        checked += 1
    assert checked > 0


def test_ewma_recursive_reference(spark, sf_dir):
    """The operator computes the windowed EWMA CLOSED-FORM (ratio of
    two windowed sums of x * r^(n-i)); the reference computes the
    same quantity the obvious way — an explicit weighted mean over
    the trailing window per row — checking the algebraic rewrite."""
    rows = SPECS["ewma_spend_smoothing"].builder(spark, sf_dir).collect()
    daily = duckdb.sql(
        f"""
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS x
        FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict = defaultdict(list)
    for u, d, x in daily:
        series[u].append((d, x))
    W = 16  # EWMA_WINDOW
    want = {}
    for u, pts in series.items():
        for i in range(len(pts)):
            lo = max(0, i - (W - 1))
            xs = [x for _d, x in pts[lo : i + 1]]
            wts = [0.5 ** (len(xs) - 1 - j) for j in range(len(xs))]
            want[(u, pts[i][0])] = sum(
                x * w for x, w in zip(xs, wts)
            ) / sum(wts)
    checked = 0
    for r in rows:
        key = (r["user_id"], r["d"])
        assert abs(r["ewma_r6"] - want[key]) < 1e-3, key
        checked += 1
    assert checked > 0
