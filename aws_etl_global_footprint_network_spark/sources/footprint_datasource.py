"""Custom Python Data Source (Spark 4 DataSource API): the reference's
per-year REST extraction (reference: local_test/scripts/local_data_extraction.py:63-134,
S4 in SURVEY §2.1) as a first-class Spark source.

``spark.read.format("footprint_api").option("raw_dir", ...)`` exposes
the raw zone with ONE INPUT PARTITION PER YEAR — the extraction unit
becomes the parallelism unit, so a 125-year backfill fans out across
executors while each partition stays a bounded, retryable unit (the
same decomposition the reference's asyncio semaphore imposed on the
driver; rate limiting stays in the connector that FILLS the raw zone,
see sources.rest_extractor).

This is the pattern for wrapping any paginated/partitioned API as a
Spark relation; swapping ``_read_file`` for an HTTP fetch turns it
into a live source with per-partition task retries
(spark.task.maxFailures) replacing the asyncio retry loop.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

RAW_FILE_RE = re.compile(r"data_all_(\d{4})\.json$")

# DDL mirror of schemas.CARBON_RAW_SCHEMA (the DataSource API wants a
# DDL string; kept adjacent to the re-used StructType by test).
RAW_DDL = (
    "year int, countryCode int, countryName string, shortName string, "
    "isoa2 string, record string, cropLand double, grazingLand double, "
    "forestLand double, fishingGround double, builtupLand double, "
    "carbon double, value double, score string"
)
_FIELDS = [f.split()[0] for f in RAW_DDL.split(", ")]


class YearPartition(InputPartition):
    def __init__(self, year: int, path: str):
        self.year = year
        self.path = path


class FootprintApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.raw_dir = options.get("raw_dir", "raw")

    def partitions(self) -> Sequence[YearPartition]:
        parts = []
        for fn in sorted(os.listdir(self.raw_dir)):
            m = RAW_FILE_RE.search(fn)
            if m:
                parts.append(
                    YearPartition(int(m.group(1)), os.path.join(self.raw_dir, fn))
                )
        return parts

    def read(self, partition: YearPartition) -> Iterator[tuple]:
        with open(partition.path) as f:
            records = json.load(f)
        for rec in records:
            yield tuple(rec.get(name) for name in _FIELDS)


class FootprintApiWriter(DataSourceWriter):
    """Write path: lands rows back into raw-zone shape — one
    ``data_all_{year}.json`` per year encountered, camelCase records,
    byte-compatible with the extractor's sink
    (reference: local_test/scripts/local_data_extraction.py:52-60).

    Each task writes task-scoped temp files (commit messages carry the
    paths); commit merges per-year fragments — the standard two-phase
    pattern that keeps a failed task from half-writing a year file.
    """

    def __init__(self, options: dict, overwrite: bool):
        self.raw_dir = options.get("raw_dir", "raw")
        self.overwrite = overwrite

    def write(self, rows: Iterator) -> WriterCommitMessage:
        by_year: dict[int, list[dict]] = {}
        for row in rows:
            rec = {name: row[i] for i, name in enumerate(_FIELDS)}
            by_year.setdefault(rec["year"], []).append(rec)
        os.makedirs(self.raw_dir, exist_ok=True)
        paths = []
        task_id = uuid.uuid4().hex[:12]
        for year, recs in by_year.items():
            p = os.path.join(self.raw_dir, f".part_{year}_{task_id}.json")
            with open(p, "w") as f:
                json.dump(recs, f)
            paths.append((year, p))
        msg = WriterCommitMessage()
        msg.paths = paths  # type: ignore[attr-defined]
        return msg

    def commit(self, messages) -> None:
        by_year: dict[int, list[dict]] = {}
        for m in messages:
            for year, p in getattr(m, "paths", []):
                with open(p) as f:
                    by_year.setdefault(year, []).extend(json.load(f))
                os.remove(p)
        for year, recs in by_year.items():
            out = os.path.join(self.raw_dir, f"data_all_{year}.json")
            if not self.overwrite and os.path.exists(out):
                with open(out) as f:
                    recs = json.load(f) + recs
            tmp = out + ".tmp"
            with open(tmp, "w") as f:
                json.dump(recs, f, indent=2)
            os.replace(tmp, out)

    def abort(self, messages) -> None:
        for m in messages:
            for _, p in getattr(m, "paths", []):
                if os.path.exists(p):
                    os.remove(p)


class FootprintApiDataSource(DataSource):
    """format("footprint_api"): year-partitioned raw-zone relation."""

    @classmethod
    def name(cls) -> str:
        return "footprint_api"

    def schema(self) -> str:
        return RAW_DDL

    def reader(self, schema) -> FootprintApiReader:
        return FootprintApiReader(self.options)

    def writer(self, schema, overwrite: bool) -> FootprintApiWriter:
        return FootprintApiWriter(self.options, overwrite)


def register_datasource(spark) -> None:
    spark.dataSource.register(FootprintApiDataSource)
