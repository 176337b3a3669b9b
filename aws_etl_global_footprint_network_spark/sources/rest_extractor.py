"""Async REST extraction connector — the Spark-era port of the
reference's extraction pipeline (reference: local_test/scripts/
local_data_extraction.py, EP1 in SURVEY §3).

Reproduced semantics (SURVEY §2.9 G1-G5):

- bounded-concurrency fan-out over year partitions (semaphore,
  reference: local_data_extraction.py:22,159,163-167)
- retry with exponential backoff + jitter, capped
  (reference: local_data_extraction.py:46-50)
- permanent (4xx) vs transient (429/5xx/network) error classification
  (reference: local_data_extraction.py:96-122)
- idempotent skip-if-cached (reference: local_data_extraction.py:78-80)
- run summary / failure accounting (reference: local_data_extraction.py:169-185)

Design: extraction stays a DRIVER-SIDE connector that lands raw-zone
JSON files; the engine proper starts at the files (same boundary the
reference draws). The transport is injectable (``fetch``) so tests
run without a network and a deployment can swap aiohttp/httpx;
``aiohttp`` itself is optional (import-gated).

At cluster scale the year loop could become a Spark 4 Python Data
Source with one partition per year; the rate limit stays a connector
concern either way — a 1000-executor cluster hammering a rate-limited
API is an outage, not a speedup.
"""

from __future__ import annotations

import asyncio
import json
import logging
import os
import random
from collections.abc import Awaitable, Callable
from dataclasses import dataclass, field

logger = logging.getLogger(__name__)

# (status_code, payload). status 0 = transport error (transient).
FetchFn = Callable[[str], Awaitable[tuple[int, object]]]


@dataclass
class ExtractionConfig:
    """Mirrors the reference APIConfig defaults
    (reference: local_test/scripts/local_data_extraction.py:22-27)."""

    base_url: str = "https://api.example.invalid"
    endpoint: str = "/data/all/{year}"
    years: tuple[int, ...] = tuple(range(2000, 2025))
    max_concurrency: int = 5
    max_retries: int = 5
    initial_backoff_s: float = 1.0
    backoff_cap_s: float = 60.0
    output_dir: str = "raw"
    skip_cached: bool = True
    # post-success politeness sleep range, seconds
    # (reference: local_test/scripts/local_data_extraction.py:116)
    politeness_s: tuple[float, float] = (0.3, 0.7)


@dataclass
class ExtractionResult:
    succeeded: list[int] = field(default_factory=list)
    skipped: list[int] = field(default_factory=list)
    failed: dict[int, str] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return not self.failed


class PermanentError(Exception):
    """4xx (except 429): retrying cannot help."""


def _backoff_delay(attempt: int, cfg: ExtractionConfig) -> float:
    """Exponential backoff with multiplicative jitter, capped
    (reference policy: delay x2 xU(1,2), cap 60 s,
    reference: local_data_extraction.py:46-50)."""
    base = cfg.initial_backoff_s * (2**attempt)
    return min(base * random.uniform(1.0, 2.0), cfg.backoff_cap_s)


def _classify(status: int) -> str:
    if status == 429 or status >= 500 or status == 0:
        return "transient"
    if 400 <= status < 500:
        return "permanent"
    return "ok"


async def _fetch_year(
    year: int,
    cfg: ExtractionConfig,
    fetch: FetchFn,
    sem: asyncio.Semaphore,
    sleep=asyncio.sleep,
) -> str:
    """Fetch one year with retry policy; returns 'ok'|'skipped' or
    raises. File write is atomic (tmp + rename) so a crashed run never
    leaves a truncated raw file to poison the next load."""
    path = os.path.join(cfg.output_dir, f"data_all_{year}.json")
    if cfg.skip_cached and os.path.exists(path):
        logger.info("year %s cached, skipping", year)
        return "skipped"
    url = cfg.base_url + cfg.endpoint.format(year=year)
    async with sem:
        for attempt in range(cfg.max_retries):
            status, payload = await fetch(url)
            kind = _classify(status)
            if kind == "ok":
                tmp = path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(payload, f, indent=2)
                os.replace(tmp, path)
                lo, hi = cfg.politeness_s
                if hi > 0:
                    await sleep(random.uniform(lo, hi))
                return "ok"
            if kind == "permanent":
                raise PermanentError(f"HTTP {status} for {url}")
            if attempt + 1 < cfg.max_retries:
                delay = _backoff_delay(attempt, cfg)
                logger.warning(
                    "year %s attempt %d got %s; retrying in %.1fs",
                    year, attempt + 1, status, delay,
                )
                await sleep(delay)
    raise TimeoutError(f"retries exhausted ({cfg.max_retries}) for {url}")


async def extract_all(
    cfg: ExtractionConfig, fetch: FetchFn, sleep=asyncio.sleep
) -> ExtractionResult:
    """Fan out over years with bounded concurrency; never lets one
    year's failure cancel the others (gather(return_exceptions),
    reference: local_data_extraction.py:167)."""
    os.makedirs(cfg.output_dir, exist_ok=True)
    sem = asyncio.Semaphore(cfg.max_concurrency)
    tasks = [_fetch_year(y, cfg, fetch, sem, sleep) for y in cfg.years]
    outcomes = await asyncio.gather(*tasks, return_exceptions=True)
    result = ExtractionResult()
    for year, outcome in zip(cfg.years, outcomes):
        if isinstance(outcome, BaseException):
            result.failed[year] = f"{type(outcome).__name__}: {outcome}"
        elif outcome == "skipped":
            result.skipped.append(year)
        else:
            result.succeeded.append(year)
    logger.info(
        "extraction done: %d ok, %d skipped, %d failed",
        len(result.succeeded), len(result.skipped), len(result.failed),
    )
    return result


def aiohttp_fetch(auth_user: str, auth_password: str, timeout_s: float = 30.0) -> FetchFn:
    """Production transport (optional dependency)."""
    import aiohttp  # deferred: not needed for tests/local runs

    async def fetch(url: str) -> tuple[int, object]:
        timeout = aiohttp.ClientTimeout(total=timeout_s)
        auth = aiohttp.BasicAuth(auth_user, auth_password)
        try:
            async with aiohttp.ClientSession(timeout=timeout, auth=auth) as s:
                async with s.get(url) as resp:
                    if resp.status == 200:
                        return 200, await resp.json()
                    return resp.status, None
        except (aiohttp.ClientError, asyncio.TimeoutError):
            return 0, None  # transport error -> transient

    return fetch


def urllib_fetch(auth_user: str, auth_password: str, timeout_s: float = 30.0) -> FetchFn:
    """Stdlib transport: real sockets, real HTTP status handling, real
    socket timeouts — no third-party dependency. The blocking urlopen
    runs in a worker thread (``asyncio.to_thread``) so the semaphore
    fan-out keeps its concurrency. Same status contract as
    ``aiohttp_fetch``: (200, parsed json) on success, (status, None) on
    an HTTP error, (0, None) on any transport-level failure (connect
    refused / reset / timeout) — which ``_classify`` treats as
    transient, mirroring the reference's exception branch
    (local_data_extraction.py:118-122)."""
    import base64
    import urllib.error
    import urllib.request

    token = base64.b64encode(
        f"{auth_user}:{auth_password}".encode()
    ).decode("ascii")

    def blocking(url: str) -> tuple[int, object]:
        req = urllib.request.Request(
            url, headers={"Authorization": f"Basic {token}"}
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                if resp.status == 200:
                    return 200, json.load(resp)
                return resp.status, None
        except urllib.error.HTTPError as exc:  # non-2xx with a status
            return exc.code, None
        except (urllib.error.URLError, OSError, TimeoutError, ValueError):
            return 0, None  # transport error -> transient

    async def fetch(url: str) -> tuple[int, object]:
        return await asyncio.to_thread(blocking, url)

    return fetch
