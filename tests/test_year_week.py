"""The %Y-%W week label (SURVEY §2.8 F1) — the one semantic Spark has
no builtin for. Property-checked against Python's own strftime across
decades of dates including every Jan-1 weekday and year boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.functions.datetime import year_week


def _expected(d: dt.date) -> str:
    return d.strftime("%Y-%W")


def test_year_week_matches_python_strftime(spark):
    # Every day across 12 years (covers each weekday as Jan 1, leap
    # years, week-53 years) + the 1900 epoch week + far future.
    days = [dt.date(2018, 1, 1) + dt.timedelta(days=i) for i in range(365 * 12)]
    days += [dt.date(1900, 1, 1) + dt.timedelta(days=i) for i in range(21)]
    days += [dt.date(2100, 12, 20) + dt.timedelta(days=i) for i in range(18)]
    df = spark.createDataFrame([(d,) for d in days], "d date")
    got = df.select("d", year_week("d").alias("yw")).collect()
    for row in got:
        assert row.yw == _expected(row.d), f"{row.d}: {row.yw} != {_expected(row.d)}"


def test_golden_week_zero(spark):
    # Golden from the reference notebook: 2025-01-01..03 -> '2025-00'
    # (reference: mkt_returns/sql_test_mkt_returns.ipynb:719-723), and the first
    # Monday 2025-01-06 -> '2025-01'.
    df = spark.createDataFrame(
        [(dt.date(2025, 1, 1),), (dt.date(2025, 1, 3),), (dt.date(2025, 1, 6),)],
        "d date",
    )
    vals = [r.yw for r in df.select(year_week("d").alias("yw")).collect()]
    assert vals == ["2025-00", "2025-00", "2025-01"]


def test_year_week_matches_duckdb_strftime(spark):
    import duckdb

    days = [dt.date(2024, 11, 20) + dt.timedelta(days=i) for i in range(100)]
    expected = [
        r[0]
        for r in duckdb.sql(
            "SELECT strftime(d, '%Y-%W') FROM (SELECT unnest($days) d)",
            params={"days": days},
        ).fetchall()
    ]
    df = spark.createDataFrame([(d,) for d in days], "d date")
    got = [r.yw for r in df.select(year_week("d").alias("yw")).orderBy("d").collect()]
    assert got == expected
