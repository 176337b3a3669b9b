"""Sorted-set-array combination generators (the basket-array recipe).

The round-8 rewrite family (co-purchase edges, item-item cosine,
frequent itemsets, skip-gram windows) all share one shape: collapse a
grouping to ONE sorted array per key, then generate ordered element
combinations MAP-SIDE with index-sequence explodes — plain codegen
generators, never higher-order-function lambdas (the repo's recurring
HOF-blocks-codegen lesson), and never a DISTINCT + self-join (two
extra corpus shuffles). This module owns the index arithmetic once so
the off-by-one-prone ``F.slice(arr, i + 2, ...)`` bounds live in a
single tested place.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_sorted_pairs(
    df: DataFrame,
    arr: str = "arr",
    a: str = "u",
    b: str = "v",
    max_span: int | None = None,
) -> DataFrame:
    """All ordered pairs (x_i, x_j), i < j, from a sorted-array column.

    Emits one row per pair with columns ``a`` = arr[i] and ``b`` =
    arr[j]; every other column of ``df`` is dropped (project what you
    need before calling). With ``max_span`` = W only pairs within W
    positions (j - i <= W) are generated — the skip-gram windowed
    variant; ``None`` generates the full C(len, 2) expansion — the
    basket-pair variant. Sorted input makes a < b free for the basket
    callers; positional callers (skip-gram) get positional order.

    Index arithmetic (1-based ``F.slice``): anchor index i ranges over
    0..len-2; partners are the slice STARTING at element i+2 (the
    element after the anchor, 1-based) of LENGTH len-i-1, capped at
    ``max_span``. Rows whose array has fewer than 2 elements are
    filtered before the generator — ``F.sequence(0, -1)`` would emit a
    DESCENDING [0, -1] sequence, not an empty one (the round-8 verify
    gotcha)."""
    size = F.size(arr)
    span: Column = size - F.col("__i") - 1
    if max_span is not None:
        span = F.least(F.lit(max_span), span)
    return (
        df.filter(size >= 2)
        .select(
            arr,
            F.explode(F.sequence(F.lit(0), size - 2)).alias("__i"),
        )
        .select(
            F.get(arr, F.col("__i")).alias(a),
            F.explode(F.slice(arr, F.col("__i") + 2, span)).alias(b),
        )
    )


def explode_sorted_triples(
    df: DataFrame,
    arr: str = "arr",
    a: str = "pa",
    b: str = "pb",
    c: str = "pc",
) -> DataFrame:
    """All ordered triples (x_i, x_j, x_k), i < j < k, from a sorted
    array column — the a-priori lattice level above
    :func:`explode_sorted_pairs`; same codegen-generator discipline,
    C(len, 3) rows per input row."""
    size = F.size(arr)
    return (
        df.filter(size >= 3)
        .select(
            arr,
            F.explode(F.sequence(F.lit(0), size - 3)).alias("__i"),
        )
        .select(
            arr,
            "__i",
            F.explode(
                F.sequence(F.col("__i") + 1, size - 2)
            ).alias("__j"),
        )
        .select(
            F.get(arr, F.col("__i")).alias(a),
            F.get(arr, F.col("__j")).alias(b),
            F.explode(
                F.slice(arr, F.col("__j") + 2, size - F.col("__j") - 1)
            ).alias(c),
        )
    )


# --------------------------------------------------------------------
# Shared materialized builds (round-8 verdict item 7)
# --------------------------------------------------------------------
#
# The whole graph/recsys family (co-purchase edges, HITS, LPA, BFS,
# k-core, item-item cosine, next-order transitions, market-basket,
# frequent itemsets) opens with the SAME expensive subplan: collapse
# lineitem to one sorted basket array per order (one corpus shuffle),
# and most then derive the support-filtered co-purchase pair list from
# it (a second shuffle). Before round 9 every query rebuilt these
# per invocation — at sf1 that is ~2 s (baskets) + ~4 s (pairs) of
# pure rework per graph query in a bench session. This memo is the
# engine-level fix: one persisted build per (session, input file
# generation, parameters), exactly the materialized-common-
# subexpression reuse a warehouse provides, keyed and evicted like
# sources.readers._READ_MEMO (stale application ids and stale file
# mtimes drop on insert; one live entry per build name keeps executor
# storage bounded — MEMORY_AND_DESERIALIZED with disk spill via plain
# persist(), so a 100 TB-scale basket frame degrades to disk, never
# OOM). Queries remain independently correct: a cold cache only costs
# the build they would have run anyway.

import os as _os

from pyspark.sql import SparkSession

_BUILD_MEMO: dict[str, tuple[tuple, DataFrame]] = {}


def memo_persisted(
    spark: SparkSession, name: str, key_extra: tuple, build
) -> DataFrame:
    """Return the persisted frame for ``name``, rebuilding only when
    the key (application id + input-file generation + parameters)
    changed; the superseded generation is unpersisted."""
    key = (spark.sparkContext.applicationId, *key_extra)
    hit = _BUILD_MEMO.get(name)
    if hit is not None and hit[0] == key:
        return hit[1]
    if hit is not None:
        try:
            hit[1].unpersist()
        except Exception:
            pass  # owning session already stopped
    df = build().persist()
    _BUILD_MEMO[name] = (key, df)
    return df


def release_builds() -> None:
    """Unpersist every memoized build (test teardown symmetry with
    cache.release_all)."""
    for name in list(_BUILD_MEMO):
        _, df = _BUILD_MEMO.pop(name)
        try:
            df.unpersist()
        except Exception:
            pass


def _table_mtime(sf_dir: str, table: str) -> tuple[str, float]:
    path = _os.path.abspath(_os.path.join(sf_dir, f"{table}.parquet"))
    try:
        return path, _os.path.getmtime(path)
    except OSError:
        return path, -1.0


def basket_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per order: ``l_orderkey``, ``arr`` = the sorted set of
    its part keys. The shared opening move of every basket-array
    query; memoized + persisted per (session, lineitem generation).
    Safe at any corpus scale: basket size is a domain constant, so
    the frame is O(orders)."""
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    return memo_persisted(
        spark,
        "basket_arrays",
        _table_mtime(sf_dir, "lineitem"),
        lambda: read_testdata(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("arr")),
    )


def transition_pair_counts(
    spark: SparkSession, sf_dir: str, min_count: int
) -> DataFrame:
    """Directed next-order transition pairs: for every consecutive
    order pair of one customer (lead over the FULL orders table, so
    basket-less orders still occupy a sequence position), every
    (src part of the earlier order, dst part of the later order),
    counted and support-filtered.  Columns ``src, dst, cnt`` (long).

    Shared by hits_hub_authority and next_order_transitions, which
    compute the identical frame before diverging (round-8 verdict
    item 7); memoized per (session, orders+lineitem generation,
    min_count — part of the name so diverging thresholds simply stop
    sharing).  The double explode fans out map-side; the only
    shuffles are the orders window, the two basket joins, and the
    pair count."""
    from pyspark.sql import Window

    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    def build() -> DataFrame:
        o = read_testdata(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderkey", "o_orderdate"
        )
        w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ord_ = o.select(
            "o_orderkey", F.lead("o_orderkey").over(w).alias("next_ok")
        ).filter(F.col("next_ok").isNotNull())
        bask = basket_arrays(spark, sf_dir)
        a_side = bask.select(
            F.col("l_orderkey").alias("ok_a"), F.col("arr").alias("src_arr")
        )
        b_side = bask.select(
            F.col("l_orderkey").alias("ok_b"), F.col("arr").alias("dst_arr")
        )
        return (
            ord_.join(a_side, F.col("ok_a") == F.col("o_orderkey"))
            .join(b_side, F.col("ok_b") == F.col("next_ok"))
            .select(F.explode("src_arr").alias("src"), "dst_arr")
            .select("src", F.explode("dst_arr").alias("dst"))
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .filter(F.col("cnt") >= min_count)
        )

    key = _table_mtime(sf_dir, "orders") + _table_mtime(sf_dir, "lineitem")
    return memo_persisted(
        spark, f"transition_pair_counts_min{min_count}", key, build
    )
