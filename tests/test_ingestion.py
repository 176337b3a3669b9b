"""Ingestion pipeline (EP2) + extraction connector (EP1) tests.

Fixture JSON reproduces the raw-zone shape: one array-of-camelCase-
records file per year (FIXTURES.md §3)."""

from __future__ import annotations

import asyncio
import json
import os

import pytest
from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.operators.ingestion import (
    WAREHOUSE_COLUMNS,
    extract_and_transform,
    run_pipeline,
)
from aws_etl_global_footprint_network_spark.sources.rest_extractor import (
    ExtractionConfig,
    extract_all,
)


def _record(year: int, code: int, name: str, carbon: float) -> dict:
    return {
        "year": year,
        "countryCode": code,
        "countryName": name,
        "shortName": name[:3],
        "isoa2": name[:2].upper(),
        "record": "EFConsPerCap",
        "cropLand": 0.5,
        "grazingLand": 0.1,
        "forestLand": 0.2,
        "fishingGround": 0.05,
        "builtupLand": 0.08,
        "carbon": carbon,
        "value": carbon + 0.93,
        "score": "3A",
    }


@pytest.fixture()
def raw_zone(tmp_path):
    for year in (2022, 2023):
        recs = [
            _record(year, 21, "Brazil", 1.1 + year % 10),
            _record(year, 33, "France", 2.2),
        ]
        (tmp_path / f"data_all_{year}.json").write_text(json.dumps(recs, indent=2))
    return str(tmp_path)


def test_pipeline_end_to_end(spark, raw_zone, tmp_path):
    checks = run_pipeline(
        spark, os.path.join(raw_zone, "data_all_*.json"), table="cf_test"
    )
    assert checks is not None
    assert checks.row_count == 4
    t = spark.table("cf_test")
    assert [f.name for f in t.schema.fields[:2]] != []
    assert set(t.columns) == set(WAREHOUSE_COLUMNS)
    br = {r.year: r.avg_carbon for r in checks.brazil_avg}
    assert br[2023] == pytest.approx(4.1)
    # partition pruning: year filter must prune to one partition
    pruned = t.filter(F.col("year") == 2023)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "year=2023" in plan or pruned.count() == 2
    spark.sql("DROP TABLE cf_test")


def test_empty_raw_zone_clean_exit(spark, tmp_path):
    # The reference's latent bug (always-truthy generator) would crash
    # later; our intended behaviour: None, no exception.
    assert run_pipeline(spark, str(tmp_path / "*.json")) is None


def test_column_order_permutation_safe(spark, tmp_path):
    """Name-based load: a raw file with reordered keys loads
    identically (the reference's positional INSERT would scramble)."""
    rec = _record(2020, 21, "Brazil", 3.0)
    reordered = dict(reversed(list(rec.items())))
    (tmp_path / "data_all_2020.json").write_text(json.dumps([reordered]))
    df = extract_and_transform(spark, str(tmp_path / "*.json"))
    row = df.collect()[0]
    assert row.country_name == "Brazil" and row.carbon == 3.0
    assert df.columns == WAREHOUSE_COLUMNS


# ------------------------- extraction connector ---------------------


def _cfg(tmp_path, years=(2001, 2002, 2003)) -> ExtractionConfig:
    return ExtractionConfig(
        years=years,
        output_dir=str(tmp_path),
        initial_backoff_s=0.001,
        backoff_cap_s=0.002,
        politeness_s=(0.0, 0.0),
    )


async def _no_sleep(_):
    return None


def test_extractor_success_and_cache(tmp_path):
    calls = []

    async def fetch(url):
        calls.append(url)
        return 200, [{"year": 2001}]

    cfg = _cfg(tmp_path)
    res = asyncio.run(extract_all(cfg, fetch, sleep=_no_sleep))
    assert res.ok and sorted(res.succeeded) == [2001, 2002, 2003]
    assert json.load(open(tmp_path / "data_all_2001.json")) == [{"year": 2001}]
    # second run: everything cached, no fetches
    calls.clear()
    res2 = asyncio.run(extract_all(cfg, fetch, sleep=_no_sleep))
    assert sorted(res2.skipped) == [2001, 2002, 2003] and not calls


def test_extractor_permanent_vs_transient(tmp_path):
    attempts = {}

    async def fetch(url):
        year = int(url.rsplit("/", 1)[1])
        attempts[year] = attempts.get(year, 0) + 1
        if year == 2001:
            return 404, None  # permanent: must NOT retry
        if year == 2002:
            return (429, None) if attempts[year] < 3 else (200, [])
        return 500, None  # transient forever: retries exhausted

    res = asyncio.run(extract_all(_cfg(tmp_path), fetch, sleep=_no_sleep))
    assert res.succeeded == [2002]
    assert attempts[2001] == 1 and "PermanentError" in res.failed[2001]
    assert attempts[2002] == 3
    assert attempts[2003] == 5 and "TimeoutError" in res.failed[2003]
    assert not os.path.exists(tmp_path / "data_all_2003.json")


def test_extractor_bounded_concurrency(tmp_path):
    live, peak = 0, 0

    async def fetch(url):
        nonlocal live, peak
        live += 1
        peak = max(peak, live)
        await asyncio.sleep(0.005)
        live -= 1
        return 200, []

    cfg = _cfg(tmp_path, years=tuple(range(2000, 2020)))
    res = asyncio.run(extract_all(cfg, fetch))
    assert res.ok and peak <= cfg.max_concurrency
