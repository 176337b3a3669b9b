"""Catalog/DDL surface (SURVEY §2.2 D1-D5) and file sinks (S5/S6):
the reference's DuckDB DDL idioms expressed through Spark SQL and the
DataFrameWriter, round-tripped."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.sources.readers import read_testdata


def test_create_insert_describe_alter_drop(spark, sf_dir):
    """D1 CREATE TABLE IF NOT EXISTS, D2 truncate-by-overwrite,
    D3 rename column, D5 DESCRIBE — the notebook's DDL lifecycle
    (reference: mkt_returns/sql_test_mkt_returns.ipynb:239-241, 272)."""
    spark.sql("DROP TABLE IF EXISTS ddl_demo")
    spark.sql(
        "CREATE TABLE IF NOT EXISTS ddl_demo "
        "(k INT, v STRING, RETUNR_TYPE STRING) USING parquet"
    )
    spark.sql("CREATE TABLE IF NOT EXISTS ddl_demo (other INT) USING parquet")
    cols = [r.col_name for r in spark.sql("DESCRIBE TABLE ddl_demo").collect()]
    assert cols[:3] == ["k", "v", "RETUNR_TYPE"]  # IF NOT EXISTS: kept original

    spark.sql("INSERT INTO ddl_demo VALUES (1, 'a', 'T'), (2, 'b', 'T')")
    assert spark.table("ddl_demo").count() == 2
    # D2: TRUNCATE + reload == INSERT OVERWRITE
    spark.sql("INSERT OVERWRITE ddl_demo VALUES (3, 'c', 'U')")
    assert [tuple(r) for r in spark.table("ddl_demo").collect()] == [(3, "c", "U")]

    # D3: the typo-repair rename (RETUNR_TYPE -> RETURN_TYPE).
    # Raw Spark SQL on a v1 parquet table rejects it (DSv2/Delta
    # catalogs support it natively) — pinned so we notice if a Spark
    # upgrade closes the gap:
    with pytest.raises(Exception, match="RENAME COLUMN"):
        spark.sql("ALTER TABLE ddl_demo RENAME COLUMN RETUNR_TYPE TO RETURN_TYPE")
    # The engine's SQL entry point executes it (native where the
    # catalog allows, staged-rewrite fallback here):
    from aws_etl_global_footprint_network_spark.sources.catalog import execute_sql

    execute_sql(spark, "ALTER TABLE ddl_demo RENAME COLUMN RETUNR_TYPE TO RETURN_TYPE")
    cols = spark.table("ddl_demo").columns
    assert "RETURN_TYPE" in cols and "RETUNR_TYPE" not in cols
    # data survives the rename
    assert [tuple(r) for r in spark.table("ddl_demo").collect()] == [(3, "c", "U")]
    # read-time rename stays the zero-cost query-side alternative
    renamed = spark.table("ddl_demo").withColumnRenamed(
        "RETURN_TYPE", "RT2"
    )
    assert "RT2" in renamed.columns
    spark.sql("DROP TABLE ddl_demo")


def test_rename_column_validation_and_passthrough(spark):
    from aws_etl_global_footprint_network_spark.sources.catalog import execute_sql

    spark.sql("DROP TABLE IF EXISTS ddl_val")
    spark.sql("CREATE TABLE ddl_val (a INT, b STRING) USING parquet")
    spark.sql("INSERT INTO ddl_val VALUES (1, 'x')")
    with pytest.raises(ValueError, match="not found"):
        execute_sql(spark, "ALTER TABLE ddl_val RENAME COLUMN nope TO c")
    with pytest.raises(ValueError, match="already exists"):
        execute_sql(spark, "ALTER TABLE ddl_val RENAME COLUMN a TO b")
    # non-rename statements pass through untouched
    assert execute_sql(spark, "SELECT 41 + 1 AS v").collect()[0].v == 42
    spark.sql("DROP TABLE ddl_val")


def test_rename_preserves_partitioning_format_and_props(spark):
    """The staged-rewrite fallback must replay the table's provider,
    partition columns (including when the partition key itself is the
    renamed column) and non-reserved TBLPROPERTIES, and must propagate
    non-'unsupported' analysis errors instead of rewriting."""
    from aws_etl_global_footprint_network_spark.sources.catalog import (
        execute_sql,
        rename_column,
    )

    spark.sql("DROP TABLE IF EXISTS ddl_part")
    spark.sql(
        "CREATE TABLE ddl_part (k INT, v STRING, yr INT) USING parquet "
        "PARTITIONED BY (yr) TBLPROPERTIES ('x.team'='etl')"
    )
    spark.sql("INSERT INTO ddl_part VALUES (1, 'a', 2024), (2, 'b', 2025)")

    # rename a data column: partitioning + props survive
    execute_sql(spark, "ALTER TABLE ddl_part RENAME COLUMN v TO val")
    parts = [c.name for c in spark.catalog.listColumns("ddl_part") if c.isPartition]
    assert parts == ["yr"]
    props = {
        r.key: r.value
        for r in spark.sql("SHOW TBLPROPERTIES ddl_part").collect()
    }
    assert props.get("x.team") == "etl"
    for r in spark.sql("DESCRIBE TABLE EXTENDED ddl_part").collect():
        if (r.col_name or "").strip() == "Provider":
            assert r.data_type.strip().lower() == "parquet"

    # rename the partition column itself: key follows the rename
    execute_sql(spark, "ALTER TABLE ddl_part RENAME COLUMN yr TO year")
    parts = [c.name for c in spark.catalog.listColumns("ddl_part") if c.isPartition]
    assert parts == ["year"]
    assert sorted(tuple(r) for r in spark.table("ddl_part").collect()) == [
        (1, "a", 2024),
        (2, "b", 2025),
    ]

    # a non-'unsupported' analysis error (missing table) propagates
    with pytest.raises(Exception, match="TABLE_OR_VIEW_NOT_FOUND|not found"):
        rename_column(spark, "ddl_no_such_table", "a", "b")
    spark.sql("DROP TABLE ddl_part")


def test_create_or_replace_view_chain(spark, sf_dir):
    """D4: views are macros — re-resolved per query, replaceable
    (reference: mkt_returns/sql_test_mkt_returns.ipynb:671, 772)."""
    read_testdata(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW v_big AS "
        "SELECT * FROM v_orders WHERE o_totalprice > 300000"
    )
    n1 = spark.table("v_big").count()
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW v_big AS "
        "SELECT * FROM v_orders WHERE o_totalprice > 400000"
    )
    n2 = spark.table("v_big").count()
    assert n2 < n1
    spark.catalog.dropTempView("v_big")


def test_ctas(spark, sf_dir):
    """S7: CREATE TABLE AS SELECT from a file-backed view."""
    read_testdata(spark, sf_dir, "region").createOrReplaceTempView("v_region")
    spark.sql("DROP TABLE IF EXISTS region_ctas")
    spark.sql("CREATE TABLE region_ctas USING parquet AS SELECT * FROM v_region")
    assert spark.table("region_ctas").count() == 5
    spark.sql("DROP TABLE region_ctas")


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc"])
def test_sink_roundtrip(spark, sf_dir, tmp_path, fmt):
    """S5 file sinks: every format round-trips the nation dim."""
    n = read_testdata(spark, sf_dir, "nation")
    path = str(tmp_path / f"nation_{fmt}")
    w = n.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", True)
    w.save(path)
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", True).option("inferSchema", True)
    back = r.load(path)
    assert back.count() == 25
    got = {r2.n_name for r2 in back.select("n_name").collect()}
    assert got == {f"NATION_{i}" for i in range(25)}


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """S6 at scale: partitioned overwrite + per-partition replace
    (dynamic overwrite = idempotent per-year reload)."""
    ev = read_testdata(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "events_part")
    ev.write.partitionBy("day").mode("overwrite").parquet(path)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        one_day = ev.filter(F.col("day") == "2024-01-05").withColumn(
            "value", F.col("value") * 0
        )
        one_day.write.partitionBy("day").mode("overwrite").parquet(path)
        back = spark.read.parquet(path)
        assert back.count() == ev.count()  # other partitions untouched
        assert back.filter("day = '2024-01-05'").agg(
            F.sum("value")
        ).collect()[0][0] == 0
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")


def test_schema_evolution_mergeschema_read(spark, tmp_path):
    """Schema evolution across parquet writes: a v2 append adds a
    column; a plain read keeps serving the footer schema Spark picked,
    while ``mergeSchema=True`` reads the UNION schema with old rows
    null-filled — the lakehouse upgrade path a user migrating a
    long-lived dataset depends on."""
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id INT, name STRING")
    v1.write.mode("overwrite").parquet(path)
    v2 = spark.createDataFrame(
        [(3, "c", 30.5)], "id INT, name STRING, score DOUBLE"
    )
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score is None
    assert rows[3].score == 30.5
    # the evolved read stays filter-able on the new column (pushdown
    # applies only to files that HAVE the column; old files null out)
    assert merged.filter(F.col("score") > 10).count() == 1
    # and on the old columns across both file generations
    assert merged.filter(F.col("id") <= 2).count() == 2


def test_schema_evolution_column_reorder_by_name(spark, tmp_path):
    """Writes with permuted column ORDER resolve by NAME under
    mergeSchema — a schema-drift hazard for naive positional readers."""
    path = str(tmp_path / "reordered")
    spark.createDataFrame([(1, "x")], "id INT, tag STRING").write.mode(
        "overwrite"
    ).parquet(path)
    spark.createDataFrame([("y", 2)], "tag STRING, id INT").write.mode(
        "append"
    ).parquet(path)
    got = {
        (r.id, r.tag)
        for r in spark.read.option("mergeSchema", "true").parquet(path).collect()
    }
    assert got == {(1, "x"), (2, "y")}


def test_json_malformed_record_modes(spark, tmp_path):
    """The three JSON parse modes on a file with one malformed line:
    PERMISSIVE null-fills and captures the raw line in the corrupt
    column, DROPMALFORMED silently drops it, FAILFAST raises — the
    ingestion-robustness contract for the raw zone (reference ingests
    REST JSON payloads; a malformed record must never corrupt a
    load)."""
    import pytest as _pytest

    p = tmp_path / "raw.jsonl"
    p.write_text(
        '{"id": 1, "v": 10.5}\n'
        "{this is not json}\n"
        '{"id": 2, "v": 20.25}\n'
    )
    schema = "id INT, v DOUBLE, _corrupt STRING"

    perm = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(str(p))
    )
    rows = perm.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r._corrupt is not None]
    assert len(bad) == 1 and bad[0].id is None
    assert "not json" in bad[0]._corrupt

    dropped = (
        spark.read.schema("id INT, v DOUBLE")
        .option("mode", "DROPMALFORMED")
        .json(str(p))
    )
    assert {r.id for r in dropped.collect()} == {1, 2}

    with _pytest.raises(Exception):
        spark.read.schema("id INT, v DOUBLE").option(
            "mode", "FAILFAST"
        ).json(str(p)).collect()


def test_decimal_aggregation_matches_integer_cents(spark, sf_dir):
    """The engine's money convention is integer cents; Spark's
    DECIMAL(18,2) path must agree EXACTLY with it on a full-table sum
    (decimal aggregation is exact by construction — this pins that the
    cents recipe and the decimal recipe are interchangeable, so either
    convention can be exposed to users)."""
    o = read_testdata(spark, sf_dir, "orders")
    dec_sum = o.select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("d")
    ).agg(F.sum("d").alias("s")).collect()[0].s
    cents_sum = (
        o.select(F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"))
        .agg(F.sum("c").alias("s"))
        .collect()[0]
        .s
    )
    # decimal sum * 100 is an exact integer equal to the cents sum
    assert int(dec_sum * 100) == cents_sum
