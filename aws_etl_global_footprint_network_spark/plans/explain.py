"""Plan-inspection helpers: assert the physical plan we designed for
is the plan Catalyst actually produced (SURVEY §4). Used by tests and
by bench.py's --explain mode."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The formatted physical plan (post-AQE where applicable)."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every file scan in the plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen stages — wider/fewer is better.

    The plan's toString marks codegen stages as ``*(n)`` prefixes
    (formatted explain spells out WholeStageCodegen). Under AQE the
    codegen markers only appear in the FINAL plan of the SAME
    QueryExecution, so this collects the df first (``count()`` would
    build a different plan) — test-sized data only."""
    df.collect()
    plan = executed_plan(df)
    spans = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    spans |= set(re.findall(r"\*\((\d+)\)", plan))
    return len(spans)
