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
# those 50 slots explicitly.  Round-6 composition: (a) the ten queries
# whose latest external evidence was round 2 — the cohort the round-5
# rotation deferred — plus bucketed_join_colocated, the only registered
# query with no external row in any round (the round-5 verdict's item 2,
# verbatim); (b) queries whose executed plan or oracle text changed this
# round and therefore need fresh hashes: bloom_semi_join_prune (residual
# semi join un-broadcast + exact-cents revenue), star_denormalize_revenue
# (exact-cents revenue), heavy_hitters_twopass (vectorized pass 1),
# pq_adc_topk / pq_adc_rerank_topk (partition-bounded ADC shortlist),
# ann_cosine_topk_vectorized (rank on rounded score + id tie-break),
# and streaming_user_totals_stateful (integer-cents GroupState —
# upgraded from the sheet's last rows-only row to oracle-paired);
# (c) the fifteen operators new this round (first external rows);
# (d) three flagship regressions; (e) rotation: remaining slots go to
# the round-3 cohort, now the oldest evidence (the rest of it waits
# for round 7 and stays green in the local all-query parity sweep
# every test run, as does the whole 160-query registry in the sf1
# sweep). Everything else keeps local coverage via
# tests/test_oracle_parity.py, which sweeps ALL registered queries.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- (a) round-2-stale cohort + never-sampled --------------------------
    "set_intersect_segments",
    "set_except_segments",
    "nation_region_cross",
    "set_union_segments",
    "customers_without_orders_anti",
    "priority_distinct_customers",
    "events_lag_delta",
    "events_running_sum",
    "grouping_sets_events",
    "events_sessionization",
    "bucketed_join_colocated",
    # -- (b) executed plan or oracle changed this round --------------------
    "bloom_semi_join_prune",
    "star_denormalize_revenue",
    "heavy_hitters_twopass",
    "pq_adc_topk",
    "pq_adc_rerank_topk",
    "ann_cosine_topk_vectorized",
    "streaming_user_totals_stateful",  # rows-only -> oracle-paired (cents state)
    # -- (c) new this round (first external rows) --------------------------
    "cdc_apply_compaction",
    "file_compaction_plan",
    "weighted_sample_topk",
    "token_entropy_gate",
    "bigram_lm_score",
    "hard_negative_mining",
    "shard_assignment_balanced",
    "semantic_dedup_drop",
    "ngram_novelty_score",
    "streaming_cdc_compaction",
    "source_jsd_divergence",
    "winsorized_acctbal_stats",
    "incremental_agg_maintenance",
    "rendezvous_shard_affinity",
    "cms_frequency_estimates",
    # -- (d) flagship regression -------------------------------------------
    "weekly_compound_by_user",
    "q1_pricing_summary",
    "dedup_minhash_lsh",
    # -- (e) queries registered AFTER the window above was first laid
    # down — zero external evidence in any round, which outranks the
    # round-3-stale rotation (never-sampled was the round-5 verdict's
    # sharpest staleness finding).  The r3 ANN/multimodal cohort
    # (ann_*, ivf_*, dedup_embedding_cosine, dedup_clusters,
    # pagerank_neardup_graph, image/audio/video) waits for round 7 and
    # stays green in the local all-query and sf1 sweeps meanwhile.
    "bm25_topk",
    "inverted_postings_stats",
    "proration_largest_remainder",
    "gap_islands_order_months",
    "benford_first_digit",
    "markov_event_transitions",
    "pareto_frontier_parts",
    "rrf_hybrid_retrieval",
    "rolling_median_cents",
    "mad_outlier_stats",
    "cusum_changepoint",
    "market_basket_rules",
    "snapshot_diff_audit",
    # -- (f) rotation: round-3 cohort (oldest external evidence) -----------
    "training_corpus_pipeline",
)

# Registered after the round-6 window filled: market_basket_rules is
# IN the window (slot swapped), but ab_test_conversion,
# k_anonymity_audit, join_size_estimate, key_skew_profile,
# dp_noisy_counts, signup_to_purchase_latency, cohort_ltv_curve,
# event_interarrival_stats, percent_rank_normalize and
# bag_set_ops_quantities are not —
# they are the FIRST candidates for round 7's window under the
# never-sampled-outranks-stale rule, alongside the deferred round-3
# ANN/multimodal cohort. All are swept locally (test_oracle_parity)
# and at sf1 (scripts/parity_sweep.py) every round meanwhile.


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module for its registration side effects.

    Returns the registry reordered so DRIVER_WINDOW occupies the first
    slots (in that order), followed by the remaining queries in
    registration order.
    """
    from aws_etl_global_footprint_network_spark.operators import (  # noqa: F401
        advanced,
        analytics_plus,
        behavioral,
        corpus_prep,
        curation,
        dedup,
        diagnostics,
        join_accel,
        layout,
        ml_prep,
        multimodal,
        multimodal_codecs,
        pareto,
        relational,
        relational2,
        retrieval,
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
