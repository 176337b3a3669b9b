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

from pyspark.errors import AnalysisException
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


_RESERVED_PROP_PREFIXES = ("option.", "spark.sql.", "transient_lastDdlTime")


def _table_provider(spark: SparkSession, table: str) -> str:
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if (r.col_name or "").strip() == "Provider":
            return (r.data_type or "parquet").strip()
    return "parquet"


def _partition_columns(spark: SparkSession, table: str) -> list[str]:
    return [c.name for c in spark.catalog.listColumns(table) if c.isPartition]


def _table_properties(spark: SparkSession, table: str) -> dict[str, str]:
    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    return {
        r.key: r.value
        for r in rows
        if not any(r.key.startswith(p) for p in _RESERVED_PROP_PREFIXES)
    }


def _is_unsupported_rename(e: AnalysisException) -> bool:
    """Only the 'v1 tables cannot RENAME COLUMN' rejection may trigger
    the rewrite fallback; any other analysis error propagates."""
    cond = ""
    for attr in ("getCondition", "getErrorClass"):
        getter = getattr(e, attr, None)
        if getter is not None:
            try:
                cond = getter() or ""
            except Exception:
                cond = ""
            if cond:
                break
    text = f"{cond} {e}".upper()
    return "UNSUPPORTED" in text or "ONLY SUPPORTED WITH V2" in text


def rename_column(
    spark: SparkSession, table: str, old: str, new: str
) -> DataFrame:
    """``ALTER TABLE table RENAME COLUMN old TO new`` that executes on
    any managed table: native (metadata-only) where the catalog
    supports it, staged rewrite otherwise.

    The rewrite preserves the table's provider (format), partition
    columns (renamed along with the data column when the partition key
    itself is renamed) and non-reserved TBLPROPERTIES.  It is staged:
    the renamed copy is fully written to ``<table>__rename_staging``
    BEFORE the original is dropped, so no failure mode loses data.
    The one non-atomic window (between DROP and the staging->original
    table rename) is recoverable — on failure the data lives complete
    in the staging table and this function raises with the exact
    recovery statement."""
    cols = spark.table(table).columns
    if old not in cols:
        raise ValueError(f"column {old!r} not found in {table} (has {cols})")
    if new in cols:
        raise ValueError(f"column {new!r} already exists in {table}")
    try:
        return spark.sql(f"ALTER TABLE {table} RENAME COLUMN {old} TO {new}")
    except AnalysisException as e:
        if not _is_unsupported_rename(e):
            raise
        # v1 table — staged rewrite below
    provider = _table_provider(spark, table)
    pcols = [new if c == old else c for c in _partition_columns(spark, table)]
    props = _table_properties(spark, table)
    staging = f"{table}__rename_staging"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    writer = spark.table(table).withColumnRenamed(old, new).write.format(provider)
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.saveAsTable(staging)
    if props:
        kv = ", ".join(
            "'{}'='{}'".format(k.replace("'", "\\'"), v.replace("'", "\\'"))
            for k, v in props.items()
        )
        spark.sql(f"ALTER TABLE {staging} SET TBLPROPERTIES ({kv})")
    spark.sql(f"DROP TABLE {table}")
    try:
        spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
    except Exception as e:
        raise RuntimeError(
            f"rename_column left {table!r} dropped with its full data in"
            f" {staging!r}; recover with: ALTER TABLE {staging} RENAME TO"
            f" {table}"
        ) from e
    if pcols:
        # table-level RENAME TO moves the data directory but the
        # per-partition catalog locations still point at the staging
        # path — re-discover them from the moved directory
        spark.sql(f"MSCK REPAIR TABLE {table}")
    return spark.table(table).limit(0)
