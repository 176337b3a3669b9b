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
