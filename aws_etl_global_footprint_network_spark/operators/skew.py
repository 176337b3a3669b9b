"""Skew mitigation utilities (SURVEY §4: skewed keys at 100 TB).

AQE's skew-join splitting handles most cases automatically
(spark.sql.adaptive.skewJoin.enabled, on in our session factory);
``salted_join`` is the explicit fallback for joins AQE can't split
(e.g. a broadcast-ineligible dimension with one pathological key, or
aggregations feeding the join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the LEFT side is large and skewed on ``key``.

    Left rows get a deterministic salt in [0, n_salt); the right side
    is replicated n_salt times; the join runs on (key, salt), so one
    hot key spreads over n_salt shuffle partitions instead of one
    straggler task. Result is identical to ``left.join(right, key,
    how)`` for ``inner`` and ``left``/``left_outer`` ONLY (pinned by
    test) — right/full outer would emit each unmatched right row
    n_salt times (once per replica), so those are rejected. Cost is
    n_salt x the right side, so keep the right side the smaller input.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "right/full outer would duplicate unmatched right rows per salt"
        )
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))
    l = left.withColumn("_salt", salt)
    r = right.crossJoin(
        F.broadcast(
            l.sparkSession.range(n_salt).select(F.col("id").cast("long").alias("_salt"))
        )
    )
    out = l.join(r, [key, "_salt"], how)
    return out.drop("_salt")
