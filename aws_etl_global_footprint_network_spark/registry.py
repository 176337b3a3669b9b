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
# those 50 slots explicitly.  Round-10 composition, per the round-9
# verdict's items 1 and 6:
#   * the 5 queries never externally sampled in r1-r9
#     (feature_scaling_suite .. degree_distribution_log_bins);
#   * every round-9 plan-changed query whose NEW plan lacked an
#     external sample: the adaptive-dispatch stats trio
#     (spearman/mann-whitney/ks), customer_rfm, kcore_copurchase,
#     bucketed_join_colocated, grouped_pandas_rank,
#     multimodal_features, and the rank-recipe family minus
#     zipf_slope_tokens (already sampled ext-r9 on the new plan);
#   * the two forced-dispatch queries registered THIS round
#     (operators/scale_forced.py) — over-cap recipes pinned in the
#     spec so sf0.01 sampling certifies the distributed branch;
#   * every query whose plan changes THIS round
#     (quantile_normalize_events is re-planned onto the value-table
#     recipe; merge_rowlevel_cow / bpe_apply_segmentation /
#     weekly_vs_window_equivalence / streaming_first_seen_stateful
#     are the round-9 item-4/7 perf targets);
#   * the remainder filled with the LONGEST-unsampled queries (last
#     external sample r4) in registration order; the 15 r4 queries
#     that didn't fit (repetition_filters, split_contamination_check,
#     stratified_sample_exact, streaming_dedup_watermark,
#     streaming_session_window .. zorder_layout) head the round-11
#     rotation.
# Everything outside the window keeps local coverage via
# tests/test_oracle_parity.py (all queries, every test run) and the
# per-round sf1 sweep (scripts/parity_sweep.py).
DRIVER_WINDOW: tuple[str, ...] = (
    # never externally sampled before this round
    "feature_scaling_suite",
    "entity_resolution_clusters",
    "qini_uplift_by_bin",
    "gdpr_delete_impact",
    "degree_distribution_log_bins",
    # round-9 plan-changed: adaptive-dispatch stats trio
    "spearman_rank_corr",
    "mann_whitney_u",
    "ks_two_sample",
    # round-9 plan-changed: individual queries
    "customer_rfm",
    "kcore_copurchase",
    "bucketed_join_colocated",
    "grouped_pandas_rank",
    "multimodal_features",
    # round-9 plan-changed: rank-recipe family (zipf sampled ext-r9)
    "quantile_normalize_events",
    "gini_revenue_concentration",
    "percent_rank_normalize",
    "shard_assignment_balanced",
    "curriculum_schedule",
    "psi_score_drift",
    "equi_depth_histogram",
    "decile_lift_table",
    # round-10 forced over-cap dispatch (verdict item 6)
    "forced_distributed_rank_suite",
    "forced_distributed_cumsum",
    # round-10 perf-target plans (verdict items 4 + 7, plus two
    # weak-screen reworks: lone_fault one-exchange layout; psi's
    # map-only binning is covered by psi_score_drift above)
    "merge_rowlevel_cow",
    "bpe_apply_segmentation",
    "weekly_vs_window_equivalence",
    "streaming_first_seen_stateful",
    "lone_fault_suppliers",
    "ngram_novelty_score",
    "gap_islands_order_months",
    # longest-unsampled (ext-r4), registration order
    "acctbal_case_buckets",
    "asof_last_purchase",
    "chunk_sliding_windows",
    "domain_mix_sampling",
    "dsir_importance_weight",
    "dup_ngram_spans",
    "events_daily_agg",
    "events_json_extract",
    "events_topk_per_day",
    "events_year_week",
    "global_shuffle_shards",
    "incremental_upsert_partition",
    "ivfadc_rerank_topk",
    "median_order_value",
    "nation_check_avg",
    "orders_monthly_growth",
    "part_string_funcs",
    "pq_codes",
    "pq_train_codebooks",
    "price_quantity_correlation",
)

# Never-externally-sampled after this window (round-10 rotation class
# (a)): feature_scaling_suite, entity_resolution_clusters,
# qini_uplift_by_bin, gdpr_delete_impact, degree_distribution_log_bins;
# plus the round-9 plan-changed queries: the stats-dispatch trio
# (spearman_rank_corr, mann_whitney_u, ks_two_sample), auc_roc_score /
# kruskal_wallis_h (adaptive cumsum), and the shared-build graph
# family whose members are NOT already in this window —
# triangle_count_copurchase, kcore_copurchase, jaccard_link_prediction,
# item_item_cosine_topk, market_basket_rules, next_order_transitions,
# bfs_hops_copurchase (memoized basket/edge/transition builds); and
# the round-9 performance rewrites: the streaming family
# (streaming_first_seen_stateful, streaming_user_totals_stateful,
# streaming_foreachbatch_upsert, streaming_ohlc_bars,
# streaming_session_window, streaming_cdc_compaction,
# streaming_static_enrich, streaming_daily_counts — staged 2-file
# source, projected staging columns, input-sized state partitions),
# grouped_pandas_rank (hash-bucketed grouped map),
# bucketed_join_colocated (32 buckets + covering projection),
# spearman_rank_corr (broadcast bounded rank tables), and
# multimodal_features (header-only decode).  Each is re-verified per
# test run by tests/test_oracle_parity.py and by the per-round sf1
# sweep.


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
