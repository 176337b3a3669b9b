"""Round-8 scale-posture gates (round-7 verdict items 3-5).

1. pareto_frontier_parts: the exact-dominance candidate broadcast is
   CAPPED — an adversarial anti-correlated distribution (frontier =
   whole relation) must take the unhinted-join fallback instead of
   forcing an O(n) broadcast, and produce the identical skyline.
2. cut_lineage: localCheckpoint locally, durable ``checkpoint`` when
   the context has a checkpoint dir — and k-core's result is backend-
   independent.
3. The value-window stats ops (spearman / MW-U / KS) now route their
   cumulative counts through functions.ranking.distributed_cumsum:
   their plans must carry no window partitioned only by the tiny
   group key (the implicit domain-boundedness precondition is gone).
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.functions.cache import cut_lineage
from aws_etl_global_footprint_network_spark.operators import pareto
from aws_etl_global_footprint_network_spark.plans.explain import unpartitioned_windows
from aws_etl_global_footprint_network_spark.registry import load_all

SPECS = load_all()


def _anticorrelated_candidates(spark, n: int):
    # price strictly ascending while size strictly descends: every
    # point is non-dominated, so the pruned candidate set IS the whole
    # relation — the worst case the broadcast cap exists for.
    return spark.range(n).select(
        F.col("id").alias("p_partkey"),
        (F.col("id") * 1.0).alias("p_retailprice"),
        (F.lit(n) - F.col("id")).cast("int").alias("p_size"),
    )


def test_pareto_dominance_fallback_anticorrelated(spark):
    cand = _anticorrelated_candidates(spark, 200).persist()
    try:
        out = pareto._exact_dominance(cand, max_broadcast=10)
        analyzed = out._jdf.queryExecution().analyzed().toString()
        # over the cap: no user hint anywhere — Catalyst alone picks
        # the strategy (it will never force-collect an O(n) frontier)
        assert "ResolvedHint" not in analyzed, analyzed[:500]
        assert out.count() == 200  # every point survives
    finally:
        cand.unpersist()


def test_pareto_dominance_broadcast_under_cap(spark):
    cand = _anticorrelated_candidates(spark, 200).persist()
    try:
        out = pareto._exact_dominance(cand, max_broadcast=10_000)
        analyzed = out._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" in analyzed  # small frontier: hint kept
        assert out.count() == 200
    finally:
        cand.unpersist()


def test_pareto_fallback_equals_broadcast_result(spark):
    # correlated data (realistic skyline): both paths, same frontier
    import random

    random.seed(8)
    rows = [
        (i, float(random.randint(1, 40)), random.randint(1, 40))
        for i in range(300)
    ]
    base = spark.createDataFrame(
        rows, "p_partkey bigint, p_retailprice double, p_size int"
    )
    cand = base.mapInPandas(pareto._local_frontier, pareto._CAND_SCHEMA).persist()
    try:
        want = sorted(
            map(tuple, pareto._exact_dominance(cand, 10_000).collect())
        )
        got = sorted(map(tuple, pareto._exact_dominance(cand, 0).collect()))
        assert got == want and len(got) > 0
    finally:
        cand.unpersist()


# --------------------------------------------------------------------
# cut_lineage backend toggle
# --------------------------------------------------------------------


def _set_checkpoint_dir_empty(spark):
    # Scala: @volatile var checkpointDir: Option[String] — reset to
    # None so the toggle test leaves the session as it found it.
    jsc = spark.sparkContext._jsc.sc()
    getattr(jsc, "checkpointDir_$eq")(spark._jvm.scala.Option.empty())


def test_cut_lineage_backend_toggle(spark, tmp_path):
    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("v"))
    assert spark.sparkContext.getCheckpointDir() is None
    local = cut_lineage(df)
    assert local.count() == 100

    ckpt = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    try:
        durable = cut_lineage(df)
        assert durable.count() == 100
        # the durable backend actually wrote checkpoint data
        found = [
            os.path.join(r, f)
            for r, _, fs in os.walk(ckpt)
            for f in fs
        ]
        assert found, "durable checkpoint wrote no files"
    finally:
        _set_checkpoint_dir_empty(spark)
    assert spark.sparkContext.getCheckpointDir() is None


def test_kcore_result_backend_independent(spark, sf_dir_mid, tmp_path):
    # sf0.01: the sf0.001 co-purchase graph is too sparse to keep a
    # non-empty k-core, which would make the equality check vacuous
    sf_dir = sf_dir_mid
    want = sorted(
        map(tuple, SPECS["kcore_copurchase"].builder(spark, sf_dir).collect())
    )
    spark.sparkContext.setCheckpointDir(str(tmp_path / "kcore-ckpt"))
    try:
        got = sorted(
            map(
                tuple,
                SPECS["kcore_copurchase"].builder(spark, sf_dir).collect(),
            )
        )
    finally:
        _set_checkpoint_dir_empty(spark)
    assert got == want and len(got) > 0


# --------------------------------------------------------------------
# Value-window stats ops: no tiny-key-partitioned windows remain
# --------------------------------------------------------------------


@pytest.mark.parametrize(
    "name", ["spearman_rank_corr", "mann_whitney_u", "ks_two_sample"]
)
def test_stats_ops_have_no_group_only_windows(spark, sf_dir, name):
    """The cumulative value counts must run through the distributed-
    rank recipe: every window in the plan is partitioned by the range-
    partition id (+ group), never by the 3-7-value group key alone.
    unpartitioned_windows catches the fully-global case; the group-
    only case is caught by asserting the __ntile_pid column keys every
    Window's partition spec."""
    df = SPECS[name].builder(spark, sf_dir)
    assert unpartitioned_windows(df) == []
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert "__ntile_pid" in spec, (name, spec)
