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


# ------------- real transport against a local stub server -----------
# The injected-fetch tests above pin the RETRY POLICY; these pin the
# TRANSPORT: genuine sockets against a loopback HTTP server exercising
# 429-transient, 404-permanent, and socket-timeout classification
# through a real adapter (reference EP1, local_data_extraction.py:89-134).
# No network access: the server binds 127.0.0.1:0.


def _make_stub_handler():
    import time as _time
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        hits: dict = {}
        auth_seen: list = []
        slow_s = 1.0

        def do_GET(self):  # noqa: N802 - http.server API
            cls = type(self)
            cls.hits[self.path] = cls.hits.get(self.path, 0) + 1
            cls.auth_seen.append(self.headers.get("Authorization"))
            try:
                if self.path.endswith("/2000"):
                    if cls.hits[self.path] == 1:
                        self.send_response(429)
                        self.end_headers()
                    else:
                        body = json.dumps([{"year": 2000}]).encode()
                        self.send_response(200)
                        self.send_header("Content-Type", "application/json")
                        self.send_header("Content-Length", str(len(body)))
                        self.end_headers()
                        self.wfile.write(body)
                elif self.path.endswith("/2001"):
                    self.send_response(404)
                    self.end_headers()
                elif self.path.endswith("/2002"):
                    # sleep past the client timeout -> socket timeout
                    _time.sleep(cls.slow_s)
                    self.send_response(200)
                    self.send_header("Content-Length", "2")
                    self.end_headers()
                    self.wfile.write(b"[]")
                else:
                    self.send_response(500)
                    self.end_headers()
            except (BrokenPipeError, ConnectionResetError):
                pass  # client timed out and hung up mid-response

        def log_message(self, *args):  # quiet
            pass

    return Handler


@pytest.fixture()
def stub_server():
    import threading
    from http.server import ThreadingHTTPServer

    handler = _make_stub_handler()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", handler
    srv.shutdown()
    srv.server_close()


def _exercise_real_transport(fetch, tmp_path, base_url, handler):
    cfg = ExtractionConfig(
        base_url=base_url,
        years=(2000, 2001, 2002),
        output_dir=str(tmp_path),
        max_retries=2,
        initial_backoff_s=0.001,
        backoff_cap_s=0.002,
        politeness_s=(0.0, 0.0),
    )
    res = asyncio.run(extract_all(cfg, fetch, sleep=_no_sleep))
    # 429 then 200: transient classified, retried once, succeeded
    assert res.succeeded == [2000]
    assert handler.hits["/data/all/2000"] == 2
    # 404: permanent, exactly one request, no retry
    assert "PermanentError" in res.failed[2001]
    assert handler.hits["/data/all/2001"] == 1
    # slow server: socket timeout -> transient -> retries exhausted
    assert "TimeoutError" in res.failed[2002]
    assert handler.hits["/data/all/2002"] == cfg.max_retries
    # basic auth credentials really went over the wire
    assert handler.auth_seen and all(
        a and a.startswith("Basic ") for a in handler.auth_seen
    )
    # the 200 payload landed intact through the real transport
    assert json.load(open(tmp_path / "data_all_2000.json")) == [{"year": 2000}]


def test_urllib_transport_against_stub_server(tmp_path, stub_server):
    from aws_etl_global_footprint_network_spark.sources.rest_extractor import (
        urllib_fetch,
    )

    base_url, handler = stub_server
    fetch = urllib_fetch("user", "secret", timeout_s=0.3)
    _exercise_real_transport(fetch, tmp_path, base_url, handler)


def test_aiohttp_transport_against_stub_server(tmp_path, stub_server):
    pytest.importorskip("aiohttp")
    from aws_etl_global_footprint_network_spark.sources.rest_extractor import (
        aiohttp_fetch,
    )

    base_url, handler = stub_server
    fetch = aiohttp_fetch("user", "secret", timeout_s=0.3)
    _exercise_real_transport(fetch, tmp_path, base_url, handler)
