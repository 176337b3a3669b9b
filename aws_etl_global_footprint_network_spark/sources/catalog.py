"""Catalog DDL surface (SURVEY §2.2 D1-D5): the engine's SQL entry
point for statements the session catalog cannot execute natively.

The one real gap is D3 ``ALTER TABLE ... RENAME COLUMN``
(reference: mkt_returns/sql_test_mkt_returns.ipynb:241): Spark's v1
parquet session-catalog tables reject it (it needs a DSv2 catalog —
Delta/Iceberg — whose jars are not on this cluster image). DuckDB
implements rename as a catalog-metadata edit; without a transactional
table format the Spark equivalent is a staged rewrite:

    write renamed copy -> staging table
    DROP original
    ALTER TABLE staging RENAME TO original   (table-level rename IS
                                              supported for v1 tables)

``execute_sql`` tries the native statement first, so on a cluster
with a DSv2 catalog configured the metadata-only path is taken and
the rewrite never happens. The read-time rename
(sources/readers.py) remains the zero-cost default for query-side
renames; this module is for when the TABLE itself must change.

Scale note: the rewrite is one full scan + write of the table —
O(table), not O(cluster metadata) like a real DSv2 rename. That cost
is explicit and documented here rather than hidden; at 100 TB you
would configure Delta/Iceberg and the native branch takes over.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_RENAME_COLUMN = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.]+)\s+RENAME\s+COLUMN\s+"
    r"(?P<old>\w+)\s+TO\s+(?P<new>\w+)\s*;?\s*$",
    re.IGNORECASE,
)


def execute_sql(spark: SparkSession, statement: str) -> DataFrame:
    """Engine SQL entry point: session-catalog SQL plus the D3 rename
    emulation for v1 tables. Everything except the rename gap is a
    passthrough to ``spark.sql``."""
    m = _RENAME_COLUMN.match(statement)
    if m:
        return rename_column(spark, m["table"], m["old"], m["new"])
    return spark.sql(statement)


def rename_column(
    spark: SparkSession, table: str, old: str, new: str
) -> DataFrame:
    """``ALTER TABLE table RENAME COLUMN old TO new`` that executes on
    any managed table: native (metadata-only) where the catalog
    supports it, staged rewrite otherwise."""
    cols = spark.table(table).columns
    if old not in cols:
        raise ValueError(f"column {old!r} not found in {table} (has {cols})")
    if new in cols:
        raise ValueError(f"column {new!r} already exists in {table}")
    try:
        return spark.sql(f"ALTER TABLE {table} RENAME COLUMN {old} TO {new}")
    except Exception:
        pass  # v1 table — staged rewrite below
    staging = f"{table}__rename_staging"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    spark.table(table).withColumnRenamed(old, new).write.saveAsTable(staging)
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
    return spark.table(table).limit(0)
