"""Calendar dimension builder.

The reference's ``calendar.csv`` is a missing large blob; its schema and
content rules are recovered in FIXTURES.md from the notebook's DESCRIBE
output (reference: mkt_returns/sql_test_mkt_returns.ipynb:256-261) and sample rows
(reference: mkt_returns/sql_test_mkt_returns.ipynb:106-118): a contiguous daily date
spine with Monday=1 weekday numbers, English day/month names, and
holiday / working-day flags (Mon-Fri working; the two flags are
independent).

Built with ``spark.range`` + ``date_add`` — fully distributed, no
driver-side list materialisation, so the same code generates a
125-year spine or a millennium one. As a dimension it is tiny
(46 k rows/125 y) and always broadcast in joins.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_calendar(
    spark: SparkSession,
    start: str | dt.date = "1900-01-01",
    end: str | dt.date = "2030-12-31",
    holidays: list[str] | None = None,
) -> DataFrame:
    """Date spine [start, end] with the reference calendar's columns."""
    if isinstance(start, str):
        start = dt.date.fromisoformat(start)
    if isinstance(end, str):
        end = dt.date.fromisoformat(end)
    n_days = (end - start).days + 1
    holiday_col = (
        F.col("DATE").cast("string").isin(holidays) if holidays else F.lit(False)
    )
    d = F.col("DATE")
    monday1 = ((F.dayofweek(d) + F.lit(5)) % F.lit(7) + F.lit(1)).cast("long")
    return (
        spark.range(n_days)
        .select(F.date_add(F.lit(start), F.col("id").cast("int")).alias("DATE"))
        .select(
            d,
            monday1.alias("DAY_OF_WEEK"),
            F.date_format(d, "EEEE").alias("TEXT_DAY_OF_WEEK"),
            F.date_format(d, "MMMM").alias("TEXT_MONTH_OF_YEAR"),
            holiday_col.alias("IS_HOLIDAY"),
            (monday1 <= F.lit(5)).alias("IS_WORKING_DAY"),
        )
    )


from aws_etl_global_footprint_network_spark.registry import register


@register(
    "calendar_spine",
    """
    WITH d AS (
      SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                                         DATE '2025-12-31',
                                         INTERVAL 1 DAY)) AS DATE) AS DATE)
    SELECT DATE,
           CAST(isodow(DATE) AS BIGINT) AS DAY_OF_WEEK,
           dayname(DATE) AS TEXT_DAY_OF_WEEK,
           monthname(DATE) AS TEXT_MONTH_OF_YEAR,
           FALSE AS IS_HOLIDAY,
           isodow(DATE) <= 5 AS IS_WORKING_DAY
    FROM d
    """,
    "distributed calendar-dimension generation (the reference's"
    " calendar.csv content rules): date spine + Monday=1 weekday,"
    " English day/month names, working-day flags",
    tags=("source", "calendar"),
)
def calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """build_calendar exposed to the driver gate on a 2-year range;
    sf_dir is unused (the spine is generated, not read — the one
    source operator whose input is pure computation). spark.range
    keeps generation distributed: the same plan makes a millennium
    spine without a driver-side list."""
    return build_calendar(spark, "2024-01-01", "2025-12-31")
