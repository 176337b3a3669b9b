"""Compounded-return expression builders.

The reference's core analytic: compound multiplicative period returns
via logs, ``EXP(SUM(LN(1 + r))) - 1`` — once as a grouped aggregate
(reference: mkt_returns/sql_test_mkt_returns.ipynb:683-692) and once as a cumulative
window ("DAILY_COMPOUND_EVOLUTION", reference: mkt_returns/sql_test_mkt_returns.ipynb:790-797).

NULL semantics (pinned by tests): SUM skips NULL inputs; an all-NULL
group yields NULL (standard SQL, identical in DuckDB and Spark).
Domain: ``r <= -1`` makes LN undefined; Spark ``log`` returns NULL
for non-positive input — NULL-on-domain-error is our documented
behaviour (DuckDB errors instead; the reference data never hits it,
r ∈ (0.0005, 0.4988), reference: mkt_returns/data.csv).
"""

from __future__ import annotations

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def compound_return(r: Column | str) -> Column:
    """Aggregate: ``EXP(SUM(LN(1 + r))) - 1`` (use inside ``.agg``)."""
    return F.exp(F.sum(F.log(F.lit(1) + _col(r)))) - F.lit(1)


def cumulative_compound_return(r: Column | str, w: WindowSpec) -> Column:
    """Windowed: running compound return over ``w``.

    With an ORDER BY and no explicit frame both DuckDB and Spark
    default to RANGE UNBOUNDED PRECEDING..CURRENT ROW
    (reference: mkt_returns/sql_test_mkt_returns.ipynb:790-797 relies on the same
    default).
    """
    return F.exp(F.sum(F.log(F.lit(1) + _col(r))).over(w)) - F.lit(1)
