"""Accumulator-width dispatch for exact integer statistics.

Round-11's sf10 oracle sweep caught four int64 overflows in
closing-arithmetic stats (gini SUM(rank*x) ~1.4e19, welch n*Q ~5e19,
...), which round 11 fixed with blanket DECIMAL(38,0) accumulators —
correct, but the decimal aggregation taxed every scale (gini sf1
1.23 -> 4.09 s) to buy headroom only the big scales need.  This
module is the round-12 width dispatch (the same measured-cap pattern
as ``functions/ranking.adaptive_row_number``): keep the int64 fast
path below a PROVABLE bound on the accumulated magnitude, switch to
DECIMAL(38,0) above it, and log the decision to DISPATCH_LOG.  Both
paths produce bit-identical integers (they are exact), so the
cross-engine hash gate is width-independent — the dispatch is purely
a physical-plan choice.

The bound inputs come from parquet FOOTER statistics only
(``pyarrow.parquet`` row-group min/max + num_rows): no data scan, no
job.  On a real cluster the same role is played by catalog statistics
(ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS) or NOT NULL/CHECK
constraints; the footer read is the local-parquet equivalent.  If any
row group lacks min/max stats the helper returns None and callers
fall back to the wide (DECIMAL) path — conservative, never wrong.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

# 2^62, not 2^63: one spare doubling absorbs the float rounding in
# bound arithmetic and the +1 slop of deriving integer-cents bounds
# from float column stats.
INT64_SAFE_BOUND = float(1 << 62)


def parquet_column_bounds(
    sf_dir: str, table: str, column: str
) -> Optional[Tuple[int, float, float]]:
    """(num_rows, min, max) of ``column`` across all row groups of
    ``{sf_dir}/{table}.parquet``, read from footer metadata only.
    Returns None when stats are missing (caller goes wide) — NULLs do
    not participate in parquet min/max, matching aggregate semantics.
    """
    try:
        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, f"{table}.parquet")
        md = pq.ParquetFile(path).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ci = names.index(column)
        lo: Optional[float] = None
        hi: Optional[float] = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return None
            lo = st.min if lo is None else min(lo, float(st.min))
            hi = st.max if hi is None else max(hi, float(st.max))
        if lo is None or hi is None:
            return None
        return md.num_rows, float(lo), float(hi)
    except Exception:
        return None


def table_num_rows(sf_dir: str, table: str) -> Optional[int]:
    """Row count of ``{sf_dir}/{table}.parquet`` from footer metadata
    only — no scan, no job. None when unreadable (caller goes wide).
    Used by rank-statistic bounds of the form n·(2n)^2: a doubled
    tied-average rank is <= 2n+1, so every rank moment is bounded by a
    polynomial in the row count alone."""
    try:
        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, f"{table}.parquet")
        return int(pq.ParquetFile(path).metadata.num_rows)
    except Exception:
        return None


def raw_table_count(spark, sf_dir: str, table: str) -> int:
    """Exact COUNT(*) of a raw testdata table for dispatch decisions,
    from the parquet footer when readable (zero Spark jobs — parquet
    num_rows IS the row count), falling back to a Spark count job.
    Round 12: the adaptive-geometry dispatches ran an eager count JOB
    on every plan build (the advisor flagged it); the footer read
    returns the identical integer for free, so the dispatch — and the
    oracle's COUNT(*) twin — is unchanged."""
    n = table_num_rows(sf_dir, table)
    if n is not None:
        return n
    from aws_etl_global_footprint_network_spark.sources.readers import (
        read_testdata,
    )

    return read_testdata(spark, sf_dir, table).count()


def cents_sumsq_int64_safe(sf_dir: str, table: str, column: str) -> bool:
    """True iff SUM(cents^2) over every subset of ``column`` (cents =
    ROUND(value*100)) provably fits int64: n_rows * max(|cents|)^2
    < 2^62.  The per-row product cents^2 <= max^2 is covered by the
    same bound.  Used by the stats family whose per-group sufficient
    statistics are (n, Sx, Sx^2); the k-row closing arithmetic stays
    DECIMAL regardless (its n*Q-style products are the part the sf10
    sweep actually caught overflowing).
    """
    b = parquet_column_bounds(sf_dir, table, column)
    if b is None:
        return False
    n, lo, hi = b
    max_cents = max(abs(lo), abs(hi)) * 100.0 + 1.0
    return n * max_cents * max_cents < INT64_SAFE_BOUND


def value_table_rows_bound(sf_dir: str, table: str, cap: int):
    """Dispatch shortcut for value-grouped tables (round 13): a value
    table's cardinality is bounded by the raw relation's row count,
    so when the parquet-footer num_rows is already <= cap the
    windowed branch is PROVABLY safe with no measuring job (the
    ks/mann-whitney builds each paid a full approx_count_distinct
    scan, quantile-normalize/psi a persist+count action, purely to
    pick a branch). Returns the bound when it proves the cap, else
    None — the caller falls back to its measuring estimate, so the
    decision at every scale is unchanged; only the proof got cheaper.
    The logged dispatch n_rows then carries this bound, not a
    measured cardinality."""
    n = table_num_rows(sf_dir, table)
    return n if n is not None and n <= cap else None
