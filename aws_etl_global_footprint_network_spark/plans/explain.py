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


def _top_level_args(s: str) -> list[str]:
    args: list[str] = []
    depth, cur = 0, []
    for ch in s:
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        cur.append(ch)
    if cur:
        args.append("".join(cur).strip())
    return args


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window specs with an empty PARTITION BY — the single-task global
    sort that cannot scale past one executor core.

    Parses every ``windowspecdefinition(...)`` in the optimized plan:
    its arguments are partition columns, then ordering expressions
    (carrying ``ASC``/``DESC``), then the frame. A spec whose FIRST
    top-level argument is already an ordering (or the frame itself)
    has no partitioning."""
    plan = optimized_plan(df)
    hits = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        depth, i = 1, m.end()
        while i < len(plan) and depth:
            if plan[i] == "(":
                depth += 1
            elif plan[i] == ")":
                depth -= 1
            i += 1
        body = plan[m.end() : i - 1]
        args = _top_level_args(body)
        first = args[0] if args else ""
        if (
            first.startswith("specifiedwindowframe")
            or " ASC" in first
            or " DESC" in first
        ):
            hits.append(body)
    return hits


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
