"""Date/time expression builders.

The one genuinely non-built-in semantic in the whole reference surface:
``strftime('%Y-%W', d)`` (reference: mkt_returns/sql_test_mkt_returns.ipynb:677,
778). ``%W`` is the C-library Monday-based week number:

- weeks start on Monday;
- all days before the year's first Monday are week **00**;
- zero-padded to two digits.

Spark's ``weekofyear`` is ISO-8601 (week 1 contains Jan 4, no week 0)
and ``date_format(d, 'w')`` follows a locale convention — both diverge
(e.g. 2025-01-01..03 must be week ``00``, golden output
reference: mkt_returns/sql_test_mkt_returns.ipynb:719-723). So we derive it from
day-of-year and weekday, exactly as C strftime does:

    W = (yday0 + 7 - monday0_weekday) // 7      # yday0 is 0-based
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def monday0_weekday(d: Column | str) -> Column:
    """Weekday with Monday=0 .. Sunday=6 (C ``tm_wday`` shifted).

    Spark ``dayofweek`` is Sunday=1 .. Saturday=7.
    """
    return (F.dayofweek(_col(d)) + F.lit(5)) % F.lit(7)


def week_of_year_monday(d: Column | str) -> Column:
    """C strftime ``%W`` as an IntegerType column (0..53)."""
    d = _col(d)
    yday0 = F.dayofyear(d) - F.lit(1)
    return F.floor((yday0 + F.lit(7) - monday0_weekday(d)) / F.lit(7)).cast("int")


def year_week(d: Column | str) -> Column:
    """``strftime('%Y-%W', d)``: e.g. 2025-01-01 -> '2025-00'.

    Matches Python/DuckDB/C semantics including week 00 and
    zero-padding (golden: reference: mkt_returns/sql_test_mkt_returns.ipynb:719-723).
    """
    d = _col(d)
    return F.concat(
        F.year(d).cast("string"),
        F.lit("-"),
        F.lpad(week_of_year_monday(d).cast("string"), 2, "0"),
    )
