"""Reader robustness across test-data timestamp generations.

The external test tables have shipped with three different parquet
timestamp physical types across rounds: TIMESTAMP(NANOS) (read as
bigint under spark.sql.legacy.parquet.nanosAsLong), TIMESTAMP(MICROS)
without a timezone (read as TIMESTAMP_NTZ in Spark 4), and
TIMESTAMP(MICROS) adjusted-to-UTC (read as TIMESTAMP). A regeneration
flip from the first to the second silently broke every watermark /
unix_micros consumer in one round — this test pins that
``read_testdata`` normalises ALL generations to the instant type with
identical wall-clock values, so the next flip is a no-op.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

TS = [
    datetime.datetime(2024, 1, 1, 12, 30, 45, 123456),
    datetime.datetime(2024, 2, 28, 23, 59, 59, 999999),
    datetime.datetime(2024, 6, 15, 0, 0, 0, 0),
]


def _write(tmpdir: str, kind: str) -> str:
    d = os.path.join(tmpdir, kind)
    os.makedirs(d, exist_ok=True)
    if kind == "nanos":
        t = pa.array(TS, type=pa.timestamp("ns"))
    elif kind == "ntz_micros":
        t = pa.array(TS, type=pa.timestamp("us"))
    else:  # utc_micros
        t = pa.array(
            [x.replace(tzinfo=datetime.timezone.utc) for x in TS],
            type=pa.timestamp("us", tz="UTC"),
        )
    table = pa.table({"event_id": pa.array([1, 2, 3], pa.int64()), "ts": t})
    pq.write_table(table, os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize("kind", ["nanos", "ntz_micros", "utc_micros"])
def test_all_generations_normalise_to_instant_type(spark, tmp_path, kind):
    d = _write(str(tmp_path), kind)
    df = read_testdata(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", df.dtypes
    got = sorted(r.ts for r in df.collect())
    assert got == sorted(TS), (kind, got)
    # the instant type is what watermarks / unix_micros require
    from pyspark.sql import functions as F

    micros = [r.u for r in df.select(F.unix_micros("ts").alias("u")).collect()]
    assert len(micros) == 3
