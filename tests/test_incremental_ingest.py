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
