"""Canary for driver test-data invariants.

Round 3 lost five streaming rows, the as-of join and the entire bench
run to a silent test-data regeneration (timestamp physical type flip).
This module asserts every invariant the engine's static artifacts
(oracle SQL text, hyperplane literals, PQ slicing) bake in, so the
next regeneration that violates one fails HERE with a named invariant
instead of as forty cryptic query errors.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def test_all_tables_present(sf_dir):
    missing = [
        t
        for t in TABLES
        if not os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
    ]
    assert not missing, f"test tables missing from {sf_dir}: {missing}"


def test_embedding_dim_is_64(sf_dir):
    """similarity.HYPERPLANES (64 literals per plane), PQ subvector
    slicing and every oracle's list arithmetic assume DIM=64."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    dims = {len(v) for v in t.column("embedding").to_pylist()[:20]}
    assert dims == {64}, dims


def test_events_timestamp_readable_as_instant(spark, sf_dir):
    """Whatever physical type the generator used, the reader must
    yield TIMESTAMP (see test_timestamp_generations for the
    per-generation matrix)."""
    from aws_etl_global_footprint_network_spark.sources.readers import (
        read_testdata,
    )

    df = read_testdata(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", df.dtypes


@pytest.mark.parametrize(
    "table,cols",
    [
        ("events", {"event_id", "ts", "user_id", "event_type", "value", "props"}),
        ("documents", {"doc_id", "text", "lang", "source", "n_chars"}),
        ("embeddings", {"vec_id", "embedding", "label"}),
    ],
)
def test_expected_columns(sf_dir, table, cols):
    s = pq.read_schema(os.path.join(sf_dir, f"{table}.parquet"))
    assert cols <= set(s.names), (table, s.names)


def test_minimum_key_ranges(sf_dir):
    """Seed-dependent constants: PQ seeds the codebook from
    vec_id < 16, ANN queries use vec_id < 10."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = set(t.column("vec_id").to_pylist())
    assert set(range(16)) <= ids, "PQ seed ids 0..15 must exist"


def test_events_timestamps_unique_per_user(spark, sf_dir_mid):
    """events_ohlc_bars / streaming_ohlc_bars pick open/close with
    min_by/max_by(value, ts) and document that the tie-break never
    fires because per-user timestamps are unique. The as-of operators
    survived a tie by pre-deduping (round-5 advice fix), but the OHLC
    pair has no dedup — if a test-data regeneration ever introduces
    per-user duplicate timestamps, this canary names the invariant
    instead of a cryptic hash flap."""
    from pyspark.sql import functions as F

    from aws_etl_global_footprint_network_spark.sources.readers import (
        read_testdata,
    )

    ev = read_testdata(spark, sf_dir_mid, "events")
    dupes = (
        ev.groupBy("user_id", "ts")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0, (
        f"{dupes} duplicate (user_id, ts) pairs: add a deterministic"
        " tie-break to the OHLC operators (see the as-of dedup pattern)"
    )


def test_event_ids_globally_unique(spark, sf_dir_mid):
    """cdc_apply_compaction uses event_id as the CDC sequence and its
    max_by tie-break documents that seq is globally unique (lineitem's
    (orderkey, linenumber) is NOT unique in this corpus, which is why
    the CDC log lives on events). If a regeneration breaks this, the
    canary names the invariant instead of a cryptic hash flap."""
    from pyspark.sql import functions as F

    from aws_etl_global_footprint_network_spark.sources.readers import (
        read_testdata,
    )

    ev = read_testdata(spark, sf_dir_mid, "events")
    n, nd = ev.agg(
        F.count(F.lit(1)), F.countDistinct("event_id")
    ).collect()[0]
    assert n == nd, f"{n - nd} duplicate event_ids"
