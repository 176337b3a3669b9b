"""Exactly-once incremental ingestion: two passes over a growing raw
zone must process each file exactly once."""

from __future__ import annotations

import json

from aws_etl_global_footprint_network_spark.streaming.incremental_ingest import (
    incremental_ingest,
    read_warehouse,
)


def _write_year(d, year, n=2):
    recs = [
        {
            "year": year, "countryCode": 100 + i, "countryName": f"C{i}",
            "shortName": f"C{i}", "isoa2": "XX", "record": "EFConsPerCap",
            "cropLand": 0.1, "grazingLand": 0.1, "forestLand": 0.1,
            "fishingGround": 0.1, "builtupLand": 0.1,
            "carbon": float(i), "value": 1.0, "score": "3A",
        }
        for i in range(n)
    ]
    (d / f"data_all_{year}.json").write_text(json.dumps(recs))


def test_incremental_exactly_once(spark, tmp_path):
    raw = tmp_path / "raw"
    out = str(tmp_path / "warehouse")
    ckpt = str(tmp_path / "ckpt")
    raw.mkdir()

    _write_year(raw, 2020)
    _write_year(raw, 2021)
    incremental_ingest(spark, str(raw), out, ckpt)
    wh = read_warehouse(spark, out)
    assert wh.count() == 4
    assert sorted(r.year for r in wh.select("year").distinct().collect()) == [2020, 2021]

    # second pass with one new file: ONLY the new file is processed
    _write_year(raw, 2022, n=3)
    incremental_ingest(spark, str(raw), out, ckpt)
    wh = read_warehouse(spark, out)
    assert wh.count() == 7  # 4 + 3, no duplicates from 2020/2021
    per_year = {r.year: r.n for r in wh.groupBy("year").count().withColumnRenamed("count", "n").collect()}
    assert per_year == {2020: 2, 2021: 2, 2022: 3}

    # third pass with nothing new: no-op
    incremental_ingest(spark, str(raw), out, ckpt)
    assert read_warehouse(spark, out).count() == 7


def test_upsert_partitions_idempotent_and_scoped(spark, sf_dir):
    """upsert_partitions must (a) replace only the partitions present
    in the update frame, (b) leave other partitions' FILES untouched
    (the 100 TB contract: one year's refresh cannot rewrite the
    table), and (c) be idempotent."""
    import os
    from pyspark.sql import functions as F

    from aws_etl_global_footprint_network_spark.operators.ingestion import (
        drop_table_and_location,
        upsert_partitions,
    )
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    o = read_testdata(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.year("o_orderdate").cast("int").alias("yr")
    )
    drop_table_and_location(spark, "upsert_scope_demo")
    o.write.partitionBy("yr").format("parquet").saveAsTable("upsert_scope_demo")
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED upsert_scope_demo")
        .filter("col_name = 'Location'")
        .collect()[0]
        .data_type.replace("file:", "")
    )
    years = sorted(r.yr for r in o.select("yr").distinct().collect())
    target, others = years[-1], years[:-1]

    def files(yr):
        d = os.path.join(loc, f"yr={yr}")
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if not f.startswith("_")
        )

    before_others = {y: files(y) for y in others}
    updates = o.filter(F.col("yr") == target).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1
    )
    upsert_partitions(updates, "upsert_scope_demo", "yr")
    after1 = spark.table("upsert_scope_demo")
    n_total = o.count()
    assert after1.count() == n_total  # row-for-row replacement
    # untouched years: identical files, identical mtimes
    assert {y: files(y) for y in others} == before_others
    # target year really changed
    tgt_sum1 = after1.filter(F.col("yr") == target).agg(
        F.sum("o_totalprice")
    ).collect()[0][0]
    orig_sum = o.filter(F.col("yr") == target).agg(
        F.sum("o_totalprice")
    ).collect()[0][0]
    assert tgt_sum1 > orig_sum
    # idempotent: second identical run changes no values anywhere
    snap1 = sorted(map(tuple, after1.collect()))
    upsert_partitions(updates, "upsert_scope_demo", "yr")
    snap2 = sorted(map(tuple, spark.table("upsert_scope_demo").collect()))
    assert snap1 == snap2
    assert {y: files(y) for y in others} == before_others
    spark.sql("DROP TABLE upsert_scope_demo")
