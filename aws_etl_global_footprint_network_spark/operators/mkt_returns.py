"""Market-returns analytics — the reference's flagship workload
(reference: mkt_returns/sql_test_mkt_returns.ipynb).

Two equivalent formulations of compounded weekly fund returns, exactly
as the notebook builds them:

- ``weekly_returns``: grouped log-compound aggregate + 3-key self-join
  (view ``vw_mkt_returns``, reference: mkt_returns/sql_test_mkt_returns.ipynb:671-705).
- ``daily_compound_evolution``: the same number as a cumulative window
  (view cell 14, reference: mkt_returns/sql_test_mkt_returns.ipynb:772-800); the last
  row per (fund, type, week) partition equals that week's weekly
  return — pinned by test.

Scale posture: the calendar dimension is broadcast (J1 — tiny, static);
the weekly aggregate and the re-join share the same grouping keys
(fund_code, return_type, year_week), so with AQE the join's shuffle
reuses the aggregation's partitioning; the window form avoids the
re-join shuffle entirely, which is the formulation to prefer at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.functions.datetime import year_week
from aws_etl_global_footprint_network_spark.functions.returns import (
    compound_return,
    cumulative_compound_return,
)


def daily_returns(market: DataFrame, calendar: DataFrame) -> DataFrame:
    """The shared CTE: working-day rows with a YEAR_WEEK label
    (reference: mkt_returns/sql_test_mkt_returns.ipynb:672-682).

    Inner equi-join fact x calendar on date (J1), filtered to working
    days, with the ``%Y-%W`` week label (F1). Calendar is explicitly
    broadcast.
    """
    cal = calendar.where(F.col("IS_WORKING_DAY")).select("DATE")
    return (
        market.join(
            F.broadcast(cal), market["MARKET_DATE"] == cal["DATE"], "inner"
        )
        .select(
            "FUND_CODE",
            "RETURN_TYPE",
            "MARKET_DATE",
            "DAILY_RETURN",
            year_week(F.col("MARKET_DATE")).alias("YEAR_WEEK"),
        )
    )


def weekly_returns(market: DataFrame, calendar: DataFrame) -> DataFrame:
    """``vw_mkt_returns``: daily rows annotated with their week's
    compounded return (reference: mkt_returns/sql_test_mkt_returns.ipynb:671-705).

    Golden (reference data): 344 rows; FUND_01/TYPE_A/2025-00 ->
    0.5582162431456255 (reference: mkt_returns/sql_test_mkt_returns.ipynb:719, 743).
    """
    daily = daily_returns(market, calendar)
    keys = ["FUND_CODE", "RETURN_TYPE", "YEAR_WEEK"]
    weekly = daily.groupBy(*keys).agg(
        compound_return("DAILY_RETURN").alias("WEEKLY_RETURN")
    )
    return daily.join(weekly, keys, "inner").select(
        "FUND_CODE",
        "RETURN_TYPE",
        "MARKET_DATE",
        "DAILY_RETURN",
        "YEAR_WEEK",
        "WEEKLY_RETURN",
    )


def daily_compound_evolution(market: DataFrame, calendar: DataFrame) -> DataFrame:
    """Window formulation (reference: mkt_returns/sql_test_mkt_returns.ipynb:772-800):
    running compound within each (fund, type, week), ordered by date.

    Golden: FUND_01/TYPE_A @2025-01-02 -> 0.49390199643674215
    (reference: mkt_returns/sql_test_mkt_returns.ipynb:816).
    """
    daily = daily_returns(market, calendar)
    w = Window.partitionBy("FUND_CODE", "RETURN_TYPE", "YEAR_WEEK").orderBy(
        "MARKET_DATE"
    )
    return daily.select(
        "FUND_CODE",
        "RETURN_TYPE",
        "MARKET_DATE",
        "DAILY_RETURN",
        "YEAR_WEEK",
        cumulative_compound_return("DAILY_RETURN", w).alias(
            "DAILY_COMPOUND_EVOLUTION"
        ),
    )
