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


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module for its registration side effects."""
    from aws_etl_global_footprint_network_spark.operators import (  # noqa: F401
        advanced,
        behavioral,
        dedup,
        ml_prep,
        multimodal,
        relational,
        relational2,
        similarity,
        similarity_vectorized,
        skew,
        temporal,
        text_analysis,
        windows_suite,
    )
    from aws_etl_global_footprint_network_spark.sources import calendar  # noqa: F401
    from aws_etl_global_footprint_network_spark.streaming import jobs  # noqa: F401

    return REGISTRY
