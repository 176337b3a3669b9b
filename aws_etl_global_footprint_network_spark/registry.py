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
# those 50 slots explicitly.  Round-11 composition, per the round-10
# verdict's item 8 (rotate by STALENESS on current code — with all 280
# queries externally sampled at least once, the window now tracks the
# longest-unsampled tail plus every plan changed this round):
#   * the 15 queries whose latest external sample is round 4 (the
#     oldest tail; includes token_pmi_bigrams, ALSO re-planned this
#     round onto the one-pass combined-gram form);
#   * every round-11 plan-changed query: spearman_rank_corr (one-pass
#     value table + exact-count dispatch), streaming_user_totals_
#     stateful (bucket-vectorised state), streaming_first_seen_
#     stateful (NULL-group dropna fix), bpe_apply_segmentation (ceil
#     coalesce), kcore_copurchase (DISK_ONLY lineage cuts in the
#     over-cap branch), gini_revenue_concentration (DECIMAL(38,0)
#     rank-product accumulator — the sf10 sweep caught the int64
#     overflow);
#   * the remainder filled with round-5-stale queries in name order;
#     the ones that did not fit (orders_ordered_limit,
#     parts_at_brand_max_price, price_percentiles_per_brand,
#     rollup_lineitem_qty, matryoshka_topk_overlap,
#     nation_acctbal_stats — displaced by the second session's six
#     plan-changed slots — plus scd2_lookup_join, scd2_merge_emulation,
#     sequence_packing, streaming_ohlc_bars, supplier_balance_zscore,
#     table_profile_orders, tfidf_top_terms, top3_parts_per_brand,
#     top_orders_by_revenue, train_test_split_hash) head the round-12
#     rotation, followed by the round-6 tail.
#   * second-session round-11 additions (plan+oracle changed, must be
#     externally re-sampled): ann_lsh_pairs_adaptive (new),
#     winnowing_neardup_pairs (Karp-Rabin contract),
#     dedup_embedding_cosine + semantic_dedup_drop (adaptive geometry).
# Max staleness after this window strictly decreases: nothing older
# than round 5 remains unsampled.  Everything outside the window keeps
# local coverage via tests/test_oracle_parity.py (all queries, every
# test run) and the per-round sf1 sweep (scripts/parity_sweep.py).
DRIVER_WINDOW: tuple[str, ...] = (
    # round-4-stale tail (longest unsampled)
    "repetition_filters",
    "split_contamination_check",
    "stratified_sample_exact",
    "streaming_dedup_watermark",
    "streaming_session_window",
    "streaming_sliding_counts",
    "streaming_stream_stream_join",
    "supplier_names_agg",
    "target_encode_priority",
    "token_pmi_bigrams",
    "top_tokens_exploded",
    "unigram_lm_score",
    "user_event_pivot",
    "vocab_coverage",
    "zorder_layout",
    # round-11 plan-changed
    "spearman_rank_corr",
    "streaming_user_totals_stateful",
    "streaming_first_seen_stateful",
    "bpe_apply_segmentation",
    "kcore_copurchase",
    "gini_revenue_concentration",
    # round-11 second session: the adaptive-geometry family (new query
    # + two plan+oracle re-pairs), the Karp-Rabin winnowing contract,
    # and the two stats whose closing arithmetic the sf10 sweep caught
    # (anova cancellation, welch int64 overflow — both re-paired)
    "ann_lsh_pairs_adaptive",
    "winnowing_neardup_pairs",
    "dedup_embedding_cosine",
    "semantic_dedup_drop",
    "anova_f_oneway",
    "welch_mean_test",
    # round-5-stale fill (name order)
    "acctbal_vs_global_avg",
    "array_functions_embeddings",
    "binary_payload_meta",
    "corpus_quality_gates",
    "cube_order_status_priority",
    "customer_order_stats_left",
    "customers_with_open_orders_semi",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dq_violation_report",
    "embedding_quantize_stats",
    "events_json_path",
    "events_ohlc_bars",
    "events_resample_ffill",
    "events_trailing_1h_avg",
    "fuzzy_name_pairs",
    "interval_overlap_join",
    "ivf_topk_probe",
    "last_touch_attribution",
    "lineitem_distinct_counts",
    "math_scalar_funcs",
    "regional_supplier_revenue",
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
