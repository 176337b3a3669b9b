"""Portable deterministic hashing, shared by the dedup/similarity
operators ([EXT] per SURVEY §0 — the reference has no hashing surface).

Everything here must produce BIT-IDENTICAL values in Spark and in the
DuckDB oracle, so the only primitive used is ``md5`` (identical hex in
both engines) plus 64-bit integer arithmetic. Engine-native hashes
(Spark ``xxhash64``/``hash``, DuckDB ``hash``) are deliberately NOT
used — they differ across engines.

Each builder has a ``*_sql`` twin emitting the equivalent DuckDB SQL
fragment; keeping them adjacent is what makes the oracle pairs
maintainable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: the modulus for minhash permutations. Keeping
# operands under 2^31 means a*h+b stays under 2^63 (no int64 overflow
# in either engine).
P31 = 2_147_483_647

# Fixed minhash permutation parameters (a*h + b mod P31). 8 hashes,
# grouped into 4 bands of 2 for LSH banding.
MINHASH_A = [1370862911, 955331883, 700352082, 1439621269,
             402839911, 1781901165, 216810579, 1086179777]
MINHASH_B = [93142869, 1789327491, 1004528686, 1732091287,
             571730302, 442152185, 942512847, 1333227803]
MINHASH_K = len(MINHASH_A)
MINHASH_BANDS = 4
MINHASH_ROWS_PER_BAND = MINHASH_K // MINHASH_BANDS


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def md5_hash60(c: Column | str) -> Column:
    """60-bit non-negative integer hash: first 15 hex digits of md5."""
    return F.conv(F.substring(F.md5(_col(c)), 1, 15), 16, 10).cast("bigint")


def md5_hash60_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_hash60`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def hash31(c: Column | str) -> Column:
    """Hash reduced below 2^31 so affine permutations can't overflow."""
    return md5_hash60(c) % F.lit(P31)


def hash31_sql(expr: str) -> str:
    return f"({md5_hash60_sql(expr)} % {P31})"


def minhash_perm(h31: Column, i: int) -> Column:
    """The i-th affine permutation of a 31-bit hash."""
    return (F.lit(MINHASH_A[i]) * h31 + F.lit(MINHASH_B[i])) % F.lit(P31)


def minhash_perm_sql(h31_expr: str, i: int) -> str:
    return f"(({MINHASH_A[i]} * {h31_expr} + {MINHASH_B[i]}) % {P31})"
