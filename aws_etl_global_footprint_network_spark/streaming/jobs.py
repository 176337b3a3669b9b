"""Streaming jobs over the events table.

The reference has no streaming engine; its architecture sketch plans
event-triggered batch (reference: aws_etl.drawio:57-61, API Gateway -> Step
Functions -> Lambda). The Spark-native equivalent is a file-source
Structured Stream with ``Trigger.AvailableNow`` — incremental,
exactly-once, and identical code path whether the source is a parquet
drop zone or Kafka.

``streaming_daily_counts`` runs a real streaming query (watermark +
event-time aggregation) to completion and returns its result — the
DuckDB oracle is the equivalent batch aggregation, proving the
streaming and batch semantics agree (the Dataflow-model promise).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.functions.compat import round_compat
from aws_etl_global_footprint_network_spark.registry import register
from aws_etl_global_footprint_network_spark.sources.readers import (
    normalize_nanos,
    read_testdata,
    read_testdata_raw,
)


def _as_stream_dir(source_path: str) -> str:
    """The file stream source requires a directory; stage a single
    parquet file behind a symlink in a temp dir (local-test shim — a
    real drop zone is already a directory)."""
    import os
    import tempfile

    if os.path.isdir(source_path):
        return source_path
    d = tempfile.mkdtemp(prefix="stream_src_")
    os.symlink(source_path, os.path.join(d, os.path.basename(source_path)))
    return d


def run_available_now(
    spark: SparkSession,
    source_path: str,
    schema,
    transform,
    query_name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Run a file-source stream to completion (AvailableNow) into a
    memory sink; return the sink table. AvailableNow processes the
    backlog in rate-limited micro-batches then stops — the idiom for
    incremental ingestion jobs that run on a schedule."""
    source_path = _as_stream_dir(source_path)
    stream = (
        spark.readStream.schema(schema).format("parquet").load(source_path)
    )
    out = transform(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


@register(
    "streaming_daily_counts",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
    "Structured Streaming event-time daily aggregation (AvailableNow"
    " file stream + watermark); oracle is the equivalent batch query",
    tags=("streaming",),
)
def streaming_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked event-time aggregation. Complete output mode so the
    memory sink holds every window; at scale the sink is a Delta/
    parquet table and the mode is append with watermark-expired
    finalisation."""
    import os

    raw = read_testdata_raw(spark, sf_dir, "events")
    name = f"stream_daily_{uuid.uuid4().hex[:8]}"

    def transform(stream: DataFrame) -> DataFrame:
        return (
            normalize_nanos(stream)
            .withWatermark("ts", "1 day")
            .groupBy(
                F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                round_compat(F.sum("value"), 2).alias("total_value"),
            )
        )

    return run_available_now(
        spark,
        os.path.join(sf_dir, "events.parquet"),
        raw.schema,
        transform,
        name,
    )


@register(
    "streaming_sliding_counts",
    """
    WITH starts AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS window_start,
             event_type, value FROM events
      UNION ALL
      SELECT CAST(date_trunc('day', ts) - INTERVAL 1 DAY AS DATE)
               AS window_start,
             event_type, value FROM events)
    SELECT window_start, event_type, COUNT(*) AS n,
           ROUND(SUM(value) * 100, 0) / 100 AS total_value
    FROM starts GROUP BY 1, 2
    """,
    "Structured Streaming sliding window (2d window, 1d slide);"
    " oracle expands each event into its two windows",
    tags=("streaming", "window"),
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows: each event lands in window_size /
    slide = 2 overlapping windows (Spark materialises the expansion
    the same way the oracle's UNION ALL does). Epoch-aligned day
    boundaries in UTC on both sides."""
    import os

    raw = read_testdata_raw(spark, sf_dir, "events")
    name = f"stream_slide_{uuid.uuid4().hex[:8]}"

    def transform(stream: DataFrame) -> DataFrame:
        return (
            normalize_nanos(stream)
            .withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "2 days", "1 day").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                round_compat(F.sum("value"), 2).alias("total_value"),
            )
        )

    out = run_available_now(
        spark,
        os.path.join(sf_dir, "events.parquet"),
        raw.schema,
        transform,
        name,
    )
    return out.select(
        F.col("w.start").cast("date").alias("window_start"),
        "event_type",
        "n",
        "total_value",
    )


@register(
    "streaming_user_totals_stateful",
    None,  # arbitrary-stateful op: rows-only driver check by design
    "applyInPandasWithState running per-user totals over the stream",
    tags=("streaming", "stateful"),
)
def streaming_user_totals_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (SURVEY §2.11: applyInPandasWithState):
    per-user running totals kept in GroupState across micro-batches.
    The state survives between batches — this is the building block
    for streaming sessionization / CDC-style accumulation."""
    import os

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    raw = read_testdata_raw(spark, sf_dir, "events")
    name = f"stream_state_{uuid.uuid4().hex[:8]}"

    output_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    # Stage the source as 4 files and feed ONE file per micro-batch:
    # the per-user GroupState must survive and accumulate across the 4
    # batches for the final totals to be right (pinned by test against
    # the batch aggregate).
    import tempfile

    staged = tempfile.mkdtemp(prefix="stream_state_src_")
    raw.repartition(4).write.mode("overwrite").parquet(staged)
    stream = (
        spark.readStream.schema(raw.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(staged)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # Last emitted state per user (a user may appear in several
    # micro-batches; the final row carries the complete total).
    from pyspark.sql import Window

    sink = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "user_id",
            "n_events",
            round_compat("total_value", 2).alias("total_value"),
        )
    )
