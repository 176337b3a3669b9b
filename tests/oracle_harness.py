"""Local mirror of the driver's DuckDB-oracle correctness gate:
row-count + schema + order-insensitive value comparison between each
queries() entry and its oracle_sql() twin (SURVEY §5)."""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / +0.0 and format stably
        if v == 0:
            return "0.0"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v) if v is not None else "\x00NULL"


def normalize(rows: list[tuple], columns: list[str]) -> list[tuple]:
    """Sort columns by name, normalise cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""
    mismatches: list = field(default_factory=list)


def compare(name: str, spark_df, oracle_sql: str, con) -> CompareResult:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    rel = con.sql(oracle_sql)
    o_cols = rel.columns
    o_rows = rel.fetchall()
    if sorted(s_cols) != sorted(o_cols):
        return CompareResult(
            name, False, len(s_rows), len(o_rows),
            f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}",
        )
    if len(s_rows) != len(o_rows):
        return CompareResult(
            name, False, len(s_rows), len(o_rows), "row count mismatch"
        )
    s_norm = normalize([tuple(r) for r in s_rows], s_cols)
    o_norm = normalize(o_rows, o_cols)
    if s_norm != o_norm:
        diffs = [
            (a, b) for a, b in zip(s_norm, o_norm) if a != b
        ][:5]
        return CompareResult(
            name, False, len(s_rows), len(o_rows), "value mismatch", diffs
        )
    return CompareResult(name, True, len(s_rows), len(o_rows))
