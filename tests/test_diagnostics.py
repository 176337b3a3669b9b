"""Semantic properties of the diagnostics operators — each result is
re-derived brute-force in Python from the raw tables, so the operators
are pinned beyond the oracle hash (which shares their SQL shape)."""

from __future__ import annotations

import hashlib
import math
import os
import sys
from collections import Counter

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.operators import diagnostics
from aws_etl_global_footprint_network_spark.sources.readers import read_testdata


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_ab_test_matches_bruteforce(spark, sf_dir):
    row = diagnostics.ab_test_conversion(spark, sf_dir).collect()[0]
    ev = (
        read_testdata(spark, sf_dir, "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    first_us: dict[int, int] = {}
    first_buy: dict[int, int] = {}
    for r in ev:
        first_us[r.user_id] = min(first_us.get(r.user_id, r.us), r.us)
        if r.event_type == "purchase":
            first_buy[r.user_id] = min(first_buy.get(r.user_id, r.us), r.us)
    arms = {0: [0, 0], 1: [0, 0]}  # variant -> [n, conv]
    for uid, fu in first_us.items():
        v = _md5_60(f"ab|{uid}") % 2
        arms[v][0] += 1
        if uid in first_buy and first_buy[uid] <= fu + diagnostics.AB_WINDOW_US:
            arms[v][1] += 1
    assert (row.n_a, row.conv_a) == tuple(arms[0])
    assert (row.n_b, row.conv_b) == tuple(arms[1])
    # z recomputed from the reported integer counts
    if row.z_stat is not None:
        p = (row.conv_a + row.conv_b) / (row.n_a + row.n_b)
        z = (row.conv_a / row.n_a - row.conv_b / row.n_b) / math.sqrt(
            p * (1 - p) * (1 / row.n_a + 1 / row.n_b)
        )
        assert abs(row.z_stat - z) < 1e-6


def test_k_anonymity_matches_bruteforce(spark, sf_dir):
    row = diagnostics.k_anonymity_audit(spark, sf_dir).collect()[0]
    cust = (
        read_testdata(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
        )
        .collect()
    )
    groups = Counter(
        (
            r.c_nationkey,
            r.c_mktsegment,
            (r.cents + diagnostics.BAL_OFFSET_CENTS)
            // diagnostics.BAL_BUCKET_CENTS,
        )
        for r in cust
    )
    viol = {g: c for g, c in groups.items() if c < diagnostics.K_ANON}
    assert row.n_groups == len(groups)
    assert row.n_violating_groups == len(viol)
    assert row.n_rows_at_risk == sum(viol.values())
    assert row.min_group_size == min(groups.values())
    assert abs(row.suppression_rate - sum(viol.values()) / len(cust)) < 1e-6


def test_join_size_estimate_equals_real_join(spark, sf_dir):
    """The whole point: sum(cnt²) must equal the ACTUAL self-join
    cardinality, verified by running the join at the small SF."""
    est = {
        r.join_key: r.predicted_self_join_rows
        for r in diagnostics.join_size_estimate(spark, sf_dir).collect()
    }
    li = read_testdata(spark, sf_dir, "lineitem")
    for key in ("l_partkey", "l_suppkey", "l_orderkey"):
        a = li.select(F.col(key).alias("k"))
        real = a.join(a, "k").count()
        assert est[key] == real, key


def test_key_skew_profile_matches_bruteforce(spark, sf_dir):
    rows = {r.key_name: r for r in diagnostics.key_skew_profile(spark, sf_dir).collect()}
    li = read_testdata(spark, sf_dir, "lineitem").collect()
    orders = read_testdata(spark, sf_dir, "orders").collect()
    for label, cnts in [
        ("lineitem.l_partkey", Counter(r.l_partkey for r in li)),
        ("lineitem.l_suppkey", Counter(r.l_suppkey for r in li)),
        ("orders.o_custkey", Counter(r.o_custkey for r in orders)),
    ]:
        r = rows[label]
        assert r.n_keys == len(cnts)
        assert r.n_rows == sum(cnts.values())
        assert r.max_cnt == max(cnts.values())
        avg = sum(cnts.values()) / len(cnts)
        assert abs(r.avg_cnt - avg) < 1e-6
        assert abs(r.skew_ratio - max(cnts.values()) / avg) < 1e-6
        assert r.max_cnt >= r.p99_cnt >= min(cnts.values())


def test_dp_noise_matches_inverse_cdf(spark, sf_dir):
    """The pseudo-Laplace noise equals the inverse-CDF formula
    re-derived in Python from the md5 uniform, and true counts match
    raw group counts."""
    rows = diagnostics.dp_noisy_counts(spark, sf_dir).collect()
    ev = Counter(
        r.event_type
        for r in read_testdata(spark, sf_dir, "events").select("event_type").collect()
    )
    assert {r.event_type for r in rows} == set(ev)
    for r in rows:
        assert r.true_n == ev[r.event_type]
        u = (
            _md5_60(f"dp|{r.event_type}") % ((1 << 52) - 1) + 1
        ) / diagnostics.DP_DENOM
        noise = (
            (1.0 if u < 0.5 else -1.0)
            * diagnostics.DP_SCALE
            * math.log(1.0 - 2.0 * abs(u - 0.5))
        )
        assert abs(r.noisy_n - (r.true_n + noise)) < 1e-3
        assert r.epsilon == diagnostics.DP_EPSILON


def test_signup_latency_matches_bruteforce(spark, sf_dir):
    from aws_etl_global_footprint_network_spark.operators import behavioral

    row = behavioral.signup_to_purchase_latency(spark, sf_dir).collect()[0]
    ev = (
        read_testdata(spark, sf_dir, "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    signup: dict[int, int] = {}
    buys: dict[int, list] = {}
    for r in ev:
        if r.event_type == "signup":
            signup[r.user_id] = min(signup.get(r.user_id, r.us), r.us)
        elif r.event_type == "purchase":
            buys.setdefault(r.user_id, []).append(r.us)
    lats = []
    for uid, t0 in signup.items():
        after = [t for t in buys.get(uid, []) if t >= t0]
        if after:
            lats.append(min(after) - t0)
    assert row.n_signup_users == len(signup)
    assert row.n_converted == len(lats)
    lats.sort()

    def q_cont(xs, q):
        h = (len(xs) - 1) * q
        lo = int(h)
        return xs[lo] + (h - lo) * (xs[min(lo + 1, len(xs) - 1)] - xs[lo])

    for col, q in [("p50_days", 0.5), ("p90_days", 0.9), ("p99_days", 0.99)]:
        assert abs(row[col] - q_cont(lats, q) / 86_400_000_000.0) < 1e-5, col


def test_cohort_ltv_is_cumulative_and_conserves(spark, sf_dir):
    from aws_etl_global_footprint_network_spark.operators import behavioral

    rows = behavioral.cohort_ltv_curve(spark, sf_dir).collect()
    assert rows
    by_cohort: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.offset_day <= behavioral.LTV_MAX_OFFSET
        by_cohort.setdefault(r.cohort_day, []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r.offset_day)
        run = 0
        for r in rs:
            run += r.day_cents
            assert r.cum_cents == run, (cohort, r.offset_day)
            assert abs(
                r.ltv_per_user - r.cum_cents / r.cohort_users / 100.0
            ) < 1e-5
    # conservation: sum of day_cents equals raw purchase cents inside
    # the offset window
    ev = (
        read_testdata(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("d"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .collect()
    )
    first_day: dict[int, int] = {}
    for r in ev:
        first_day[r.user_id] = min(first_day.get(r.user_id, r.d), r.d)
    expect = sum(
        r.cents
        for r in ev
        if r.event_type == "purchase"
        and 0 <= r.d - first_day[r.user_id] <= behavioral.LTV_MAX_OFFSET
    )
    assert sum(r.day_cents for r in rows) == expect


def test_interarrival_stats_match_bruteforce(spark, sf_dir):
    from aws_etl_global_footprint_network_spark.operators import analytics_plus

    rows = {
        r.event_type: r
        for r in analytics_plus.event_interarrival_stats(spark, sf_dir).collect()
    }
    ev = (
        read_testdata(spark, sf_dir, "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id")
        .collect()
    )
    seqs: dict[tuple, list] = {}
    for r in sorted(ev, key=lambda r: (r.us, r.event_id)):
        seqs.setdefault((r.user_id, r.event_type), []).append(r.us)
    gaps: dict[str, list] = {}
    for (uid, et), us in seqs.items():
        gaps.setdefault(et, []).extend(b - a for a, b in zip(us, us[1:]))

    def q_cont(xs, q):
        xs = sorted(xs)
        h = (len(xs) - 1) * q
        lo = int(h)
        return xs[lo] + (h - lo) * (xs[min(lo + 1, len(xs) - 1)] - xs[lo])

    assert set(rows) == set(gaps)
    for et, g in gaps.items():
        r = rows[et]
        assert r.n_gaps == len(g)
        assert r.max_gap_us == max(g)
        assert abs(r.p50_seconds - q_cont(g, 0.5) / 1e6) < 1e-5
        assert abs(r.p95_seconds - q_cont(g, 0.95) / 1e6) < 1e-5


def test_percent_rank_matches_bruteforce_with_ties(spark, sf_dir):
    from aws_etl_global_footprint_network_spark.operators import analytics_plus

    rows = analytics_plus.percent_rank_normalize(spark, sf_dir).collect()
    vals = sorted(r.bal_cents for r in rows)
    n = len(vals)
    import bisect

    for r in rows:
        rank = bisect.bisect_left(vals, r.bal_cents) + 1  # min rank of ties
        assert abs(r.pct_rank - (rank - 1) / (n - 1)) < 1e-6
    # boundary values
    assert min(r.pct_rank for r in rows) == 0.0
    assert max(r.pct_rank for r in rows) == 1.0


def test_bag_set_ops_match_multiset_math(spark, sf_dir):
    from aws_etl_global_footprint_network_spark.operators import analytics_plus

    rows = analytics_plus.bag_set_ops_quantities(spark, sf_dir).collect()
    assert 0 < len(rows) <= analytics_plus.BAG_TOP
    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_linenumber", "l_partkey"
    ).collect()
    a = Counter(r.l_partkey for r in li if r.l_linenumber == 1)
    b = Counter(r.l_partkey for r in li if r.l_linenumber == 2)
    for r in rows:
        if r.op == "except_all":
            assert r.cnt == max(a[r.l_partkey] - b[r.l_partkey], 0)
        else:
            assert r.cnt == min(a[r.l_partkey], b[r.l_partkey])


def test_median_two_element_formula_is_statistics_median():
    """The rolling-median operator's closed form — (arr[(n+1)//2-1] +
    arr[n//2]) / 2 over the sorted frame — must equal the textbook
    median for every length and any integers (hypothesis sweep)."""
    import statistics

    from hypothesis import given, strategies as st

    @given(st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=25))
    def check(xs):
        arr = sorted(xs)
        n = len(arr)
        got = (arr[(n + 1) // 2 - 1] + arr[n // 2]) / 2
        assert got == statistics.median(xs)

    check()


def test_percent_rank_min_tie_rule_matches_reference():
    """PERCENT_RANK's tie rule — every duplicate shares the MINIMUM
    rank — as implemented via bisect in the operator's verification,
    must match a direct O(n²) reference on random multisets."""
    from hypothesis import given, strategies as st
    import bisect

    @given(st.lists(st.integers(-50, 50), min_size=2, max_size=60))
    def check(xs):
        svals = sorted(xs)
        n = len(xs)
        for x in xs:
            rank_bisect = bisect.bisect_left(svals, x) + 1
            rank_direct = 1 + sum(1 for y in xs if y < x)
            assert rank_bisect == rank_direct
            pct = (rank_bisect - 1) / (n - 1)
            assert 0.0 <= pct <= 1.0

    check()
