"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(aws_etl_global_footprint_network_spark.registry): every implemented operator
from SURVEY.md §2 (+ [EXT] LLM-data operators) is exposed as a
``queries()`` entry, each paired with DuckDB oracle SQL in
``oracle_sql()`` unless the operator is inherently non-SQL-expressible
(approx sketches, Python-stub multimodal decode, arbitrary stateful
streaming) — those get the driver's rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from aws_etl_global_footprint_network_spark.registry import load_all

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    log-compound weekly return (SURVEY §2.5 A4 + §2.8 F1) applied to
    the events table."""
    spec = load_all()["weekly_compound_by_user"]
    return spec.builder(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; see registry for docs."""
    return {name: spec.builder for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
