"""Sorted-set-array combination generators (the basket-array recipe).

The round-8 rewrite family (co-purchase edges, item-item cosine,
frequent itemsets, skip-gram windows) all share one shape: collapse a
grouping to ONE sorted array per key, then generate ordered element
combinations MAP-SIDE with index-sequence explodes — plain codegen
generators, never higher-order-function lambdas (the repo's recurring
HOF-blocks-codegen lesson), and never a DISTINCT + self-join (two
extra corpus shuffles). This module owns the index arithmetic once so
the off-by-one-prone ``F.slice(arr, i + 2, ...)`` bounds live in a
single tested place.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_sorted_pairs(
    df: DataFrame,
    arr: str = "arr",
    a: str = "u",
    b: str = "v",
    max_span: int | None = None,
) -> DataFrame:
    """All ordered pairs (x_i, x_j), i < j, from a sorted-array column.

    Emits one row per pair with columns ``a`` = arr[i] and ``b`` =
    arr[j]; every other column of ``df`` is dropped (project what you
    need before calling). With ``max_span`` = W only pairs within W
    positions (j - i <= W) are generated — the skip-gram windowed
    variant; ``None`` generates the full C(len, 2) expansion — the
    basket-pair variant. Sorted input makes a < b free for the basket
    callers; positional callers (skip-gram) get positional order.

    Index arithmetic (1-based ``F.slice``): anchor index i ranges over
    0..len-2; partners are the slice STARTING at element i+2 (the
    element after the anchor, 1-based) of LENGTH len-i-1, capped at
    ``max_span``. Rows whose array has fewer than 2 elements are
    filtered before the generator — ``F.sequence(0, -1)`` would emit a
    DESCENDING [0, -1] sequence, not an empty one (the round-8 verify
    gotcha)."""
    size = F.size(arr)
    span: Column = size - F.col("__i") - 1
    if max_span is not None:
        span = F.least(F.lit(max_span), span)
    return (
        df.filter(size >= 2)
        .select(
            arr,
            F.explode(F.sequence(F.lit(0), size - 2)).alias("__i"),
        )
        .select(
            F.get(arr, F.col("__i")).alias(a),
            F.explode(F.slice(arr, F.col("__i") + 2, span)).alias(b),
        )
    )


def explode_sorted_triples(
    df: DataFrame,
    arr: str = "arr",
    a: str = "pa",
    b: str = "pb",
    c: str = "pc",
) -> DataFrame:
    """All ordered triples (x_i, x_j, x_k), i < j < k, from a sorted
    array column — the a-priori lattice level above
    :func:`explode_sorted_pairs`; same codegen-generator discipline,
    C(len, 3) rows per input row."""
    size = F.size(arr)
    return (
        df.filter(size >= 3)
        .select(
            arr,
            F.explode(F.sequence(F.lit(0), size - 3)).alias("__i"),
        )
        .select(
            arr,
            "__i",
            F.explode(
                F.sequence(F.col("__i") + 1, size - 2)
            ).alias("__j"),
        )
        .select(
            F.get(arr, F.col("__i")).alias(a),
            F.get(arr, F.col("__j")).alias(b),
            F.explode(
                F.slice(arr, F.col("__j") + 2, size - F.col("__j") - 1)
            ).alias(c),
        )
    )
