"""functions/width: footer-stats accumulator-width dispatch.

The round-12 width dispatch (VERDICT r11 item 4) keeps int64
accumulators below a provable bound and goes DECIMAL(38,0) above it.
These tests pin the bound arithmetic and the conservative fallbacks;
cross-engine value parity of the dispatching queries themselves is
covered by tests/test_oracle_parity.py (both widths are exact
integers, so parity is width-independent).
"""

import os

from aws_etl_global_footprint_network_spark.functions.width import (
    INT64_SAFE_BOUND,
    cents_sumsq_int64_safe,
    parquet_column_bounds,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_footer_bounds_match_duckdb():
    import duckdb

    b = parquet_column_bounds(SF, "events", "value")
    assert b is not None
    n, lo, hi = b
    ref_n, ref_lo, ref_hi = duckdb.sql(
        f"SELECT COUNT(*), MIN(value), MAX(value)"
        f" FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()
    # COUNT(*) counts all rows incl. NULL `value`; footer num_rows too.
    assert n == ref_n
    # Footer min/max bound the true min/max (NULLs excluded both ways).
    assert lo <= ref_lo and hi >= ref_hi


def test_missing_table_goes_wide():
    assert parquet_column_bounds(SF, "no_such_table", "value") is None
    assert cents_sumsq_int64_safe(SF, "no_such_table", "value") is False


def test_missing_column_goes_wide():
    assert parquet_column_bounds(SF, "events", "no_such_column") is None
    assert cents_sumsq_int64_safe(SF, "events", "no_such_column") is False


def test_small_scale_is_int64_safe():
    # sf0.001: 1000 events, |value| <= ~600 -> n * (cents)^2 ~ 4e12,
    # far under 2^62.
    assert cents_sumsq_int64_safe(SF, "events", "value") is True


def test_bound_arithmetic():
    b = parquet_column_bounds(SF, "events", "value")
    n, lo, hi = b
    max_cents = max(abs(lo), abs(hi)) * 100.0 + 1.0
    expected = n * max_cents * max_cents < INT64_SAFE_BOUND
    assert cents_sumsq_int64_safe(SF, "events", "value") is expected
