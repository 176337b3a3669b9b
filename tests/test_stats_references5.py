"""Fifth batch of independent references: CUSUM changepoints,
interarrival percentiles, decile lift, cohort LTV, retention, the
unigram LM score, and the token entropy gate.
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


def test_cusum_reference(spark, sf_dir):
    got = {
        r["user_id"]: r
        for r in SPECS["cusum_changepoint"].builder(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT user_id, event_id, CAST(ROUND(value * 100) AS BIGINT)
        FROM '{sf_dir}/events.parquet' ORDER BY user_id, ts, event_id
        """
    ).fetchall()
    series: dict = defaultdict(list)
    for u, eid, v in rows:
        series[u].append((eid, v))
    checked = 0
    for u, pts in series.items():
        if u not in got:
            continue
        n = len(pts)
        s_n = sum(v for _e, v in pts)
        best = None
        s_k = 0
        for k in range(1, n):
            s_k += pts[k - 1][1]
            d = abs(n * s_k - k * s_n)
            if best is None or d > best[0]:
                best = (d, k, pts[k - 1][0])
        r = got[u]
        assert r["n_events"] == n
        assert r["d_stat"] == best[0]
        assert r["cp_index"] == best[1]
        assert r["cp_event_id"] == best[2]
        checked += 1
    assert checked > 0


def test_interarrival_reference(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in SPECS["event_interarrival_stats"].builder(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT user_id, event_type, epoch_us(ts), event_id
        FROM '{sf_dir}/events.parquet'
        ORDER BY user_id, event_type, epoch_us(ts), event_id
        """
    ).fetchall()
    gaps: dict = defaultdict(list)
    prev: dict = {}
    for u, et, us, _eid in rows:
        key = (u, et)
        if key in prev:
            gaps[et].append(us - prev[key])
        prev[key] = us
    for et, g in gaps.items():
        a = np.array(sorted(g), float)
        r = got[et]
        assert r["n_gaps"] == len(a)
        assert abs(r["p50_seconds"] - np.quantile(a, 0.5) / 1e6) < 1e-3
        assert abs(r["p95_seconds"] - np.quantile(a, 0.95) / 1e6) < 1e-3
        assert r["max_gap_us"] == int(a[-1])


def test_decile_lift_reference(spark, sf_dir):
    rows = SPECS["decile_lift_table"].builder(spark, sf_dir).collect()
    raw = duckdb.sql(
        f"""
        SELECT c.c_custkey, CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS s,
               CASE WHEN o.o_custkey IS NULL THEN 0 ELSE 1 END AS resp
        FROM '{sf_dir}/customer.parquet' c
        LEFT JOIN (SELECT DISTINCT o_custkey FROM '{sf_dir}/orders.parquet'
                   WHERE o_orderpriority = '1-URGENT') o
          ON o.o_custkey = c.c_custkey
        ORDER BY s DESC, c.c_custkey
        """
    ).fetchall()
    n = len(raw)
    sizes = [n // 10 + (1 if i < n % 10 else 0) for i in range(10)]
    want = []
    pos = 0
    for i, sz in enumerate(sizes, start=1):
        chunk = raw[pos : pos + sz]
        pos += sz
        want.append((i, sz, sum(r[2] for r in chunk)))
    r_all = sum(w[2] for w in want)
    cum = 0
    base_rate = r_all / n
    for row, (d, sz, resp) in zip(rows, want):
        cum += resp
        assert row["decile"] == d
        assert row["n_customers"] == sz
        assert row["responders"] == resp
        assert abs(row["resp_rate_r6"] - resp / sz) < TOL
        assert abs(row["cum_capture_r6"] - cum / r_all) < TOL
        assert abs(row["lift_r6"] - (resp / sz) / base_rate) < 1e-4


def test_retention_reference(spark, sf_dir):
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_active"]
        for r in SPECS["retention_cohorts"].builder(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""
        WITH first_seen AS (
          SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cw
          FROM '{sf_dir}/events.parquet' GROUP BY 1),
        act AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('week', ts) AS DATE) AS aw
          FROM '{sf_dir}/events.parquet')
        SELECT f.cw, CAST((a.aw - f.cw) / 7 AS INT), COUNT(*)
        FROM first_seen f JOIN act a ON a.user_id = f.user_id
        GROUP BY 1, 2
        """
    ).fetchall()
    want = {(cw, off): cnt for cw, off, cnt in rows}
    assert got == want


def test_cohort_ltv_reference(spark, sf_dir):
    rows = SPECS["cohort_ltv_curve"].builder(spark, sf_dir).collect()
    raw = duckdb.sql(
        f"""
        WITH fm AS (
          SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS cd
          FROM '{sf_dir}/events.parquet' GROUP BY 1)
        SELECT fm.cd, epoch_us(e.ts) // 86400000000 - fm.cd AS off,
               SUM(CAST(ROUND(e.value * 100) AS BIGINT))
        FROM '{sf_dir}/events.parquet' e JOIN fm ON fm.user_id = e.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(e.ts) // 86400000000 - fm.cd BETWEEN 0 AND 5
        GROUP BY 1, 2
        """
    ).fetchall()
    users = dict(
        duckdb.sql(
            f"""
            WITH fm AS (SELECT user_id,
                        MIN(epoch_us(ts) // 86400000000) AS cd
                        FROM '{sf_dir}/events.parquet' GROUP BY 1)
            SELECT cd, COUNT(*) FROM fm GROUP BY cd
            """
        ).fetchall()
    )
    per: dict = defaultdict(dict)
    for cd, off, cents in raw:
        per[cd][off] = cents
    checked = 0
    for r in rows:
        cd, off = r["cohort_day"], r["offset_day"]
        assert r["day_cents"] == per[cd][off]
        cum = sum(c for o, c in per[cd].items() if o <= off)
        assert r["cum_cents"] == cum
        assert r["cohort_users"] == users[cd]
        assert abs(r["ltv_per_user"] - cum / 100.0 / users[cd]) < 1e-3
        checked += 1
    assert checked > 0


def test_unigram_lm_and_entropy_reference(spark, sf_dir):
    docs = duckdb.sql(
        f"""
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           t -> t <> '')
        FROM '{sf_dir}/documents.parquet'
        """
    ).fetchall()
    vocab: Counter = Counter()
    for _d, toks in docs:
        vocab.update(toks)
    total = sum(vocab.values())
    lm = {
        r["doc_id"]: r
        for r in SPECS["unigram_lm_score"].builder(spark, sf_dir).collect()
    }
    ent = {
        r["doc_id"]: r
        for r in SPECS["token_entropy_gate"].builder(spark, sf_dir).collect()
    }
    checked = 0
    for doc_id, toks in docs:
        if not toks:
            continue
        # corpus-unigram average log-probability
        lp = sum(math.log(vocab[t]) for t in toks) / len(toks) - math.log(
            total
        )
        if doc_id in lm:
            assert lm[doc_id]["n_tokens"] == len(toks)
            assert abs(lm[doc_id]["avg_logprob"] - lp) < 1e-4
        # within-doc token entropy: ln n - sum(c ln c)/n
        c = Counter(toks)
        n = len(toks)
        h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        if doc_id in ent:
            assert ent[doc_id]["n_distinct"] == len(c)
            assert abs(ent[doc_id]["entropy_nats"] - h) < 1e-4
        checked += 1
    assert checked > 0
