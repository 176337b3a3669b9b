"""Semantic properties of the retrieval and analytics_plus operators —
invariants the oracle hash can't express (conservation, coverage,
probability-mass laws). Parity itself is covered by the all-query
sweep in test_oracle_parity.py.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.operators import analytics_plus, retrieval
from aws_etl_global_footprint_network_spark.sources.readers import read_testdata


def test_proration_conserves_order_total(spark, sf_dir):
    """The whole point of largest-remainder: per-order allocations sum
    to the order total EXACTLY, in cents, for every order."""
    alloc = analytics_plus.proration_largest_remainder(spark, sf_dir)
    totals = alloc.groupBy("l_orderkey").agg(
        F.sum("alloc_cents").alias("alloc_total")
    )
    o = read_testdata(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("total_cents"),
    )
    bad = totals.join(o, "l_orderkey").filter(
        F.col("alloc_total") != F.col("total_cents")
    )
    assert bad.count() == 0


def test_proration_shares_are_monotone_in_quantity(spark, sf_dir):
    """Within an order, a lineitem with strictly larger quantity never
    receives fewer cents (floor share is monotone; the +1 bonus goes
    to larger remainders, which can reorder only within 1 cent)."""
    alloc = analytics_plus.proration_largest_remainder(spark, sf_dir)
    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("qty_u"),
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
    # restrict to orders where it is, so the join below is 1:1.
    uniq = (
        li.groupBy("l_orderkey")
        .agg(
            (
                F.count(F.lit(1)) == F.countDistinct("l_linenumber")
            ).alias("ok")
        )
        .filter("ok")
        .select("l_orderkey")
    )
    li = li.join(uniq, "l_orderkey")
    j = alloc.join(li, ["l_orderkey", "l_linenumber"])
    a = j.select(
        F.col("l_orderkey").alias("k"),
        F.col("qty_u").alias("qa"),
        F.col("alloc_cents").alias("ca"),
    )
    b = j.select(
        F.col("l_orderkey").alias("k"),
        F.col("qty_u").alias("qb"),
        F.col("alloc_cents").alias("cb"),
    )
    # strictly-larger quantity but allocation more than 1 cent smaller
    viol = a.join(b, "k").filter(
        (F.col("qa") > F.col("qb")) & (F.col("ca") < F.col("cb") - 1)
    )
    assert viol.count() == 0


def test_gap_islands_are_maximal_and_disjoint(spark, sf_dir):
    """Islands of one customer never touch or overlap (adjacent runs
    would have been merged), and lengths match their endpoints."""
    isl = analytics_plus.gap_islands_order_months(spark, sf_dir).collect()
    by_cust: dict[int, list[tuple[int, int]]] = {}
    for r in isl:
        assert r.streak_months == r.end_idx - r.start_idx + 1
        by_cust.setdefault(r.o_custkey, []).append((r.start_idx, r.end_idx))
    for spans in by_cust.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1 + 1, "adjacent or overlapping islands must merge"


def test_markov_rows_sum_to_one(spark, sf_dir):
    t = analytics_plus.markov_event_transitions(spark, sf_dir)
    sums = t.groupBy("from_type").agg(F.sum("prob").alias("p")).collect()
    assert sums, "no transitions found"
    for r in sums:
        assert r.p == pytest.approx(1.0, abs=1e-4)


def test_benford_is_full_distribution(spark, sf_dir):
    b = analytics_plus.benford_first_digit(spark, sf_dir).collect()
    assert sorted(r.digit for r in b) == list(range(1, 10))
    assert sum(r.observed_p for r in b) == pytest.approx(1.0, abs=1e-4)
    assert sum(r.benford_p for r in b) == pytest.approx(1.0, abs=1e-4)
    assert all(r.chi2_term >= 0 for r in b)


def test_bm25_topk_docs_contain_a_query_term(spark, sf_dir):
    top = retrieval.bm25_topk(spark, sf_dir)
    rows = top.collect()
    assert 0 < len(rows) <= retrieval.BM25_TOPK
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    docs = read_testdata(spark, sf_dir, "documents")
    ids = [r.doc_id for r in rows]
    hit = docs.filter(F.col("doc_id").isin(ids)).select(
        "doc_id",
        *[
            F.lower("text").contains(t).alias(f"has_{t}")
            for t in retrieval.QUERY_TERMS
        ],
    )
    for r in hit.collect():
        assert any(r[f"has_{t}"] for t in retrieval.QUERY_TERMS)


def test_inverted_postings_df_bounds(spark, sf_dir):
    stats = retrieval.inverted_postings_stats(spark, sf_dir)
    n_docs = read_testdata(spark, sf_dir, "documents").count()
    for r in stats.collect():
        assert 1 <= r.df <= n_docs
        assert r.cf >= r.df  # total occurrences >= docs containing
        assert r.first_doc <= r.last_doc


def test_pareto_frontier_equals_bruteforce(spark, sf_dir):
    """Exact reference: the direct O(n^2) dominance filter on the raw
    relation (bounded here by the small test SF) must equal the
    two-phase distributed skyline."""
    from aws_etl_global_footprint_network_spark.operators import pareto

    got = {
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in pareto.pareto_frontier_parts(spark, sf_dir).collect()
    }
    parts = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in read_testdata(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    expected = {
        (k, pr, sz)
        for (k, pr, sz) in parts
        if not any(
            qpr <= pr and qsz <= sz and (qpr < pr or qsz < sz)
            for (_, qpr, qsz) in parts
        )
    }
    assert got == expected
    assert got, "frontier must be non-empty on non-empty input"


def test_rolling_median_matches_bruteforce(spark, sf_dir):
    """Trailing-7 median equals a Python re-derivation per user —
    catches frame-boundary and even/odd-count mistakes directly."""
    out = {
        r.event_id: r.trailing_median
        for r in analytics_plus.rolling_median_cents(spark, sf_dir).collect()
    }
    ev = (
        read_testdata(spark, sf_dir, "events")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: (r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for rows in by_user.values():
        for i, r in enumerate(rows):
            frame = sorted(x.v for x in rows[max(0, i - 6) : i + 1])
            n = len(frame)
            expect = (frame[(n + 1) // 2 - 1] + frame[n // 2]) / 200.0
            assert out[r.event_id] == expect
            checked += 1
    assert checked == len(ev)


def test_mad_stats_match_python_statistics(spark, sf_dir):
    """Median/MAD per nation equal ``statistics.median`` on the raw
    cents, and every flagged outlier really exceeds the threshold."""
    import statistics

    got = {
        r.nationkey: r for r in analytics_plus.mad_outlier_stats(spark, sf_dir).collect()
    }
    cust = (
        read_testdata(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal"),
        )
        .collect()
    )
    by_nation: dict[int, list[int]] = {}
    for r in cust:
        by_nation.setdefault(r.c_nationkey, []).append(r.bal)
    assert set(got) == set(by_nation)
    for nk, bals in by_nation.items():
        med = statistics.median(bals)
        mad = statistics.median(abs(b - med) for b in bals)
        row = got[nk]
        assert row.n_custs == len(bals)
        assert row.median_cents == med
        assert row.mad_cents == mad
        expect_out = sum(1 for b in bals if abs(b - med) > 3.0 * 1.4826 * mad)
        assert row.n_outliers == expect_out
        expect_mild = sum(1 for b in bals if abs(b - med) > 1.4826 * mad)
        assert row.n_mild == expect_mild
    # the mild band must actually fire somewhere, so BOTH branches of
    # the threshold comparison are exercised on real data
    assert any(r.n_mild > 0 for r in got.values())


def test_cusum_argmax_matches_bruteforce(spark, sf_dir):
    """The reported split maximises |n*S_k - k*S_n| with earliest-k
    tie-break — re-derived per user from raw prefix sums."""
    got = {
        r.user_id: (r.cp_index, r.d_stat)
        for r in analytics_plus.cusum_changepoint(spark, sf_dir).collect()
    }
    ev = (
        read_testdata(spark, sf_dir, "events")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        )
        .collect()
    )
    by_user: dict[int, list[int]] = {}
    for r in sorted(ev, key=lambda r: (r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r.v)
    for uid, vals in by_user.items():
        n = len(vals)
        if n < 2:
            assert uid not in got
            continue
        s_n, s_k, best = sum(vals), 0, (-1, 0)
        for k in range(1, n):
            s_k += vals[k - 1]
            d = abs(n * s_k - k * s_n)
            if d > best[1]:
                best = (k, d)
        assert got[uid] == best


def test_rrf_scores_follow_from_ranks(spark, sf_dir):
    """rrf_score is exactly 1/(60+rs) + 1/(60+rd) with absent ranks
    (sentinel 0) contributing nothing, and the result is sorted."""
    rows = retrieval.rrf_hybrid_retrieval(spark, sf_dir).collect()
    assert 0 < len(rows) <= retrieval.RRF_TOPK
    prev = None
    for r in rows:
        assert (r.sparse_rank, r.dense_rank) != (0, 0)
        assert 0 <= r.sparse_rank <= retrieval.RRF_POOL
        assert 0 <= r.dense_rank <= retrieval.RRF_POOL
        expect = 0.0
        if r.sparse_rank:
            expect += 1.0 / (retrieval.RRF_K + r.sparse_rank)
        if r.dense_rank:
            expect += 1.0 / (retrieval.RRF_K + r.dense_rank)
        assert abs(r.rrf_score - expect) < 1e-9
        if prev is not None:
            assert prev >= r.rrf_score
        prev = r.rrf_score


def test_rrf_pools_are_genuinely_hybrid(spark, sf_dir):
    """Fusion only means something if both rankers contribute: the
    fused top set must contain at least one doc ranked by BM25 and at
    least one ranked by the dense ranker."""
    rows = retrieval.rrf_hybrid_retrieval(spark, sf_dir).collect()
    assert any(r.sparse_rank > 0 for r in rows)
    assert any(r.dense_rank > 0 for r in rows)


def test_market_basket_counts_match_bruteforce(spark, sf_dir):
    """Every reported rule's co-occurrence count equals a Python
    re-derivation from raw baskets, and metrics follow from counts."""
    from collections import Counter

    rows = analytics_plus.market_basket_rules(spark, sf_dir).collect()
    assert 0 < len(rows) <= analytics_plus.BASKET_TOP
    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets: dict[int, set[int]] = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    pair_cnt: Counter = Counter()
    item_cnt: Counter = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for p in ps:
            item_cnt[p] += 1
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pair_cnt[(a, b)] += 1
    n_orders = len(baskets)
    max_cnt = max(pair_cnt.values())
    for r in rows:
        assert r.n_both == pair_cnt[(r.part_a, r.part_b)]
        assert r.n_a == item_cnt[r.part_a]
        assert r.n_b == item_cnt[r.part_b]
        assert r.n_both <= min(r.n_a, r.n_b)
        assert abs(r.support - r.n_both / n_orders) < 1e-6
        assert abs(r.confidence_ab - r.n_both / r.n_a) < 1e-6
        assert abs(r.lift - r.n_both * n_orders / (r.n_a * r.n_b)) < 1e-6
    # the cut keeps the genuinely most frequent pairs
    assert rows[0].n_both if hasattr(rows[0], "n_both") else True
    assert max(r.n_both for r in rows) == max_cnt


def test_snapshot_diff_partitions_key_universe(spark, sf_dir):
    """Status counts re-derived from the churn rules on raw keys:
    removed = keys %97, added = keys %101, changed = (%31 and not
    %97), and the four counts cover old ∪ new exactly."""
    ap = analytics_plus
    got = {r.status: r for r in ap.snapshot_diff_audit(spark, sf_dir).collect()}
    keys = [
        r.k
        for r in read_testdata(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("k"))
        .collect()
    ]
    removed = sum(1 for k in keys if k % ap.DIFF_DEL_MOD == 0)
    added = sum(1 for k in keys if k % ap.DIFF_INS_MOD == 0)
    changed = sum(
        1 for k in keys if k % ap.DIFF_UPD_MOD == 0 and k % ap.DIFF_DEL_MOD != 0
    )
    unchanged = len(keys) - removed - changed
    assert got["removed"].n_rows == removed
    assert got["added"].n_rows == added
    assert got["changed"].n_rows == changed
    assert got["unchanged"].n_rows == unchanged
    # changed rows drift exactly +1 cent each; unchanged drift 0
    assert (
        got["changed"].sum_new_cents - got["changed"].sum_old_cents == changed
    )
    assert got["unchanged"].sum_new_cents == got["unchanged"].sum_old_cents
