"""Spark 4 Python DataSource (the year-partitioned API source) and
bucketed-join shuffle elimination (SURVEY §4 physical layout)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.schemas import CARBON_RAW_SCHEMA
from aws_etl_global_footprint_network_spark.sources.footprint_datasource import (
    RAW_DDL,
    register_datasource,
)


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw_zone")
    for year in (2021, 2022, 2023):
        recs = [
            {
                "year": year, "countryCode": 21, "countryName": "Brazil",
                "shortName": "Bra", "isoa2": "BR", "record": "EFConsPerCap",
                "cropLand": 0.5, "grazingLand": 0.1, "forestLand": 0.2,
                "fishingGround": 0.05, "builtupLand": 0.08,
                "carbon": float(year % 7), "value": 2.0, "score": "3A",
            },
            {
                "year": year, "countryCode": 33, "countryName": "France",
                "shortName": "Fra", "isoa2": "FR", "record": "EFConsPerCap",
                "cropLand": 0.4, "grazingLand": 0.2, "forestLand": 0.3,
                "fishingGround": 0.02, "builtupLand": 0.07,
                "carbon": 1.5, "value": 2.5, "score": "2B",
            },
        ]
        (d / f"data_all_{year}.json").write_text(json.dumps(recs))
    (d / "unrelated.txt").write_text("ignored")
    return str(d)


def test_ddl_matches_struct_schema(spark):
    from pyspark.sql.types import StructType

    assert StructType.fromDDL(RAW_DDL) == CARBON_RAW_SCHEMA


def test_datasource_reads_year_partitions(spark, raw_dir):
    register_datasource(spark)
    df = spark.read.format("footprint_api").option("raw_dir", raw_dir).load()
    assert df.count() == 6
    # one input partition per year file
    assert df.rdd.getNumPartitions() == 3
    years = sorted(r.year for r in df.select("year").distinct().collect())
    assert years == [2021, 2022, 2023]
    row = df.filter((F.col("year") == 2022) & (F.col("countryName") == "Brazil")).collect()[0]
    assert row.carbon == 2022 % 7 and row.isoa2 == "BR"


def test_datasource_feeds_ingestion(spark, raw_dir):
    """The custom source composes with the normalisation layer."""
    from aws_etl_global_footprint_network_spark.operators.ingestion import (
        WAREHOUSE_COLUMNS,
    )
    from aws_etl_global_footprint_network_spark.schemas import CARBON_COLUMN_MAPPING

    register_datasource(spark)
    df = (
        spark.read.format("footprint_api")
        .option("raw_dir", raw_dir)
        .load()
        .withColumnsRenamed(CARBON_COLUMN_MAPPING)
        .select(*WAREHOUSE_COLUMNS)
    )
    assert df.columns == WAREHOUSE_COLUMNS and df.count() == 6


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    """Co-located bucketed tables join without an Exchange — the
    layout that turns the repeated orders⋈lineitem shuffle into a
    local merge at warehouse scale."""
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    o = read_testdata(spark, sf_dir, "orders")
    li = read_testdata(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b"))
    ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
    # force a non-broadcast join so bucketing is what saves the shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            ob.join(lb, ob.o_orderkey == lb.l_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan, plan[:1500]
    # both bucketed scans feed the join with no Exchange below it
    below_join = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange hashpartitioning(o_orderkey" not in below_join
    assert "Exchange hashpartitioning(l_orderkey" not in below_join
    assert "SelectedBucketsCount" in plan
    spark.sql("DROP TABLE orders_b")
    spark.sql("DROP TABLE lineitem_b")


def test_datasource_write_roundtrip(spark, raw_dir, tmp_path):
    """The DataSink path: read the raw zone through the source, write
    it back out through the same format, read again — identical."""
    register_datasource(spark)
    df = spark.read.format("footprint_api").option("raw_dir", raw_dir).load()
    out_dir = str(tmp_path / "raw_out")
    (df.write.format("footprint_api").option("raw_dir", out_dir)
       .mode("append").save())
    import os
    files = sorted(f for f in os.listdir(out_dir) if f.startswith("data_all_"))
    assert files == ["data_all_2021.json", "data_all_2022.json", "data_all_2023.json"]
    back = spark.read.format("footprint_api").option("raw_dir", out_dir).load()
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
