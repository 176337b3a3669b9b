"""Vector math over ``array<float>`` embedding columns ([EXT]).

All JVM-side built-ins (``zip_with`` + ``aggregate`` fold) — no UDFs,
so the expressions stay inside whole-stage codegen and the plan scales
by partitions, not by driver round-trips.

Determinism contract with the DuckDB oracle: both engines fold the
64-term products LEFT-TO-RIGHT in double precision, which we verified
produces bit-identical sums; cast to double BEFORE multiplying.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def as_double_array(c: Column | str) -> Column:
    return _col(c).cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product as a left fold (sequential, deterministic)."""
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# --- DuckDB oracle twins (list functions; 1-based indexing). ---------

def dot_sql(a: str, b: str) -> str:
    return f"list_sum(list_transform(range(1, len({a})+1), i -> {a}[i] * {b}[i]))"


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"
