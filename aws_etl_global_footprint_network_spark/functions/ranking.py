"""Distributed exact ranking primitives.

``NTILE(n) OVER (ORDER BY ...)`` with no PARTITION BY moves the whole
relation through a single task (Spark logs "No Partition Defined for
Window operation"), which is a hard bottleneck once the relation is
billions of rows.  :func:`distributed_ntile` computes the *identical*
bucket assignment scale-safely with the classic distributed-rank
recipe:

1. ``repartitionByRange`` on the full ordering key — every partition
   holds a contiguous slice of the total order, partition ids ascend
   with it (Spark's RangePartitioner samples with a deterministic
   per-partition seed, so the assignment is reproducible).
2. ``row_number`` windowed *per range partition* (partitionBy the
   partition id — parallel, never a global sort).
3. A tiny per-partition row-count aggregate (≤ shuffle-partitions
   rows) is collected and turned into literal cumulative offsets;
   ``global row number = offset[pid] + local row number``.
4. The NTILE bucket is pure arithmetic on (global rn, total rows),
   using the SQL-standard split: the first ``total % n`` buckets get
   ``total // n + 1`` rows, the rest ``total // n`` — bit-identical
   to both Spark's and DuckDB's ``NTILE``.

The ordering must be TOTAL (callers append a unique tie-break column),
otherwise rows straddling a range boundary could land
nondeterministically — the same caveat the single-task form has.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.functions.cache import CacheScope

_PID = "__ntile_pid"


def _ranged_with_offsets(
    df: DataFrame, order_cols: list[Column], scope: CacheScope
) -> tuple[DataFrame, dict[int, int], int]:
    """Steps 1+3 of the distributed-rank recipe: range-repartition on
    the total order and compute cumulative per-partition row offsets
    (a bounded collect — one row per shuffle partition).

    The range-partitioned frame is persisted in ``scope`` because the
    per-partition counts job and the caller's main job must see the
    same partition assignment (and would otherwise scan twice)."""
    ranged = scope.persist(
        df.repartitionByRange(*order_cols).withColumn(_PID, F.spark_partition_id())
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in ranged.groupBy(F.col(_PID).alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    total = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    return ranged, offsets, total


def distributed_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str,
    scope: CacheScope,
) -> DataFrame:
    """Append ``out_col`` = exact global ``ROW_NUMBER()`` over the
    total order ``order_cols`` without a single-partition window:
    range repartition + per-partition row_number + broadcast offsets.
    The ordering must be total (append a unique tie-break column)."""
    ranged, offsets, _ = _ranged_with_offsets(df, order_cols, scope)
    if not offsets:
        return ranged.withColumn(out_col, F.lit(None).cast("long")).drop(_PID)
    off_map = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    local_rn = F.row_number().over(Window.partitionBy(_PID).orderBy(*order_cols))
    return ranged.withColumn(
        out_col,
        (F.element_at(off_map, F.col(_PID)) + local_rn).cast("long"),
    ).drop(_PID)


def distributed_ntile(
    df: DataFrame,
    order_cols: list[Column],
    n_buckets: int,
    out_col: str,
    scope: CacheScope,
) -> DataFrame:
    """Append ``out_col`` = exact NTILE(n_buckets) over the total order
    ``order_cols``, without a single-partition window."""
    ranged, offsets, total = _ranged_with_offsets(df, order_cols, scope)
    if not offsets:  # empty input: keep the schema, no rows to bucket
        return ranged.withColumn(out_col, F.lit(None).cast("int")).drop(_PID)
    off_map = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    local_rn = F.row_number().over(Window.partitionBy(_PID).orderBy(*order_cols))
    rn = F.element_at(off_map, F.col(_PID)) + local_rn
    base, rem = divmod(total, n_buckets)
    boundary = rem * (base + 1)
    # First `rem` buckets take base+1 rows each; the rest take base.
    # When total < n_buckets, boundary == total and only the first
    # branch fires (row i -> bucket i, the standard NTILE edge case);
    # max(base, 1) keeps the unused branch free of division by zero.
    bucket = F.when(
        rn <= F.lit(boundary), F.floor((rn - F.lit(1)) / F.lit(base + 1)) + 1
    ).otherwise(
        F.lit(rem) + F.floor((rn - F.lit(boundary) - 1) / F.lit(max(base, 1))) + 1
    )
    return ranged.withColumn(out_col, bucket.cast("int")).drop(_PID)


def distributed_cumsum(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    sums: dict[str, str],
    scope: CacheScope,
    inclusive: bool = False,
) -> DataFrame:
    """Append exact per-group running sums over a total order without
    a single-task window (round-7 verdict item 3).

    For each ``out_col -> in_col`` in ``sums``, appends ``out_col`` =
    ``SUM(in_col) OVER (PARTITION BY group_col ORDER BY order_cols
    ROWS UNBOUNDED PRECEDING [AND 1 PRECEDING])`` — but computed with
    the distributed-rank recipe instead of a window partitioned only
    by ``group_col`` (the rank-free stats operators run this over a
    VALUE-grouped table: sound while value cardinality is
    domain-bounded, a one-task-per-group bottleneck the moment the
    value column is genuinely continuous; this removes the implicit
    precondition):

    1. range-repartition on (group, order) — contiguous slices;
    2. per-(partition, group) partial sums, collected (bounded:
       shuffle partitions x groups rows);
    3. per-(partition, group) literal offsets = partial sums of the
       group in all earlier partitions;
    4. running sum = offset + a per-(partition, group) local window.

    (group, order_cols) must be a total order of ``df`` (the callers'
    value-grouped tables are unique on it by construction) and
    ``group_col`` must be map-key-able (string/int). Exclusive by
    default; ``inclusive=True`` includes the current row.
    """
    parts = [F.col(group_col), *order_cols]
    ranged = scope.persist(
        df.repartitionByRange(*parts).withColumn(_PID, F.spark_partition_id())
    )
    partials = (
        ranged.groupBy(F.col(_PID).alias("pid"), F.col(group_col).alias("g"))
        .agg(*[F.sum(c).alias(o) for o, c in sums.items()])
        .collect()
    )
    # NULL group values need an explicit sentinel on BOTH sides of the
    # lookup: concat_ws SKIPS nulls (the key would silently collapse to
    # just the pid and the coalesce below would mask the miss as a zero
    # offset), so the Python key and the Spark key both encode NULL as
    # a reserved NUL-prefixed token no real group string can equal.
    _NULLG = "\x00<null>"

    def _gkey(g) -> str:
        return _NULLG if g is None else str(g)

    acc: dict[str, dict[str, int]] = {o: {} for o in sums}
    offsets: list = []
    for r in sorted(partials, key=lambda r: r["pid"]):
        for o in sums:
            key = f"{r['pid']}|{_gkey(r['g'])}"
            acc_g = acc[o]
            offsets.append((o, key, acc_g.get(_gkey(r["g"]), 0)))
            acc_g[_gkey(r["g"])] = acc_g.get(_gkey(r["g"]), 0) + (r[o] or 0)
    lw = Window.partitionBy(_PID, group_col).orderBy(*order_cols)
    frame = lw.rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    out = ranged
    lookup = F.concat_ws(
        "|",
        F.col(_PID).cast("string"),
        F.coalesce(F.col(group_col).cast("string"), F.lit(_NULLG)),
    )
    for o, c in sums.items():
        entries = [x for oo, k, v in offsets if oo == o for x in (F.lit(k), F.lit(v))]
        off = (
            F.element_at(F.create_map(*entries), lookup)
            if entries
            else F.lit(0)
        )
        out = out.withColumn(
            o,
            (
                F.coalesce(off, F.lit(0))
                + F.coalesce(F.sum(c).over(frame), F.lit(0))
            ).cast("long"),
        )
    return out.drop(_PID)
