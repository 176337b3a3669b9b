"""Incremental raw-zone ingestion (SURVEY §7.7): the event-driven
batch the reference *planned* (reference: aws_etl.drawio:57-61 — API Gateway ->
Step Functions -> Lambda) as a Structured Streaming file source.

Each run processes exactly the raw files that appeared since the last
run (the checkpoint's file log is the source of truth), normalises
them through the same rename layer as the batch pipeline, and appends
to the warehouse — restart-safe, no reprocessing, no manual bookkeeping.
This replaces the reference's skip-if-cached idempotency
(reference: local_test/scripts/local_data_extraction.py:78-80) with engine-level
exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_etl_global_footprint_network_spark.operators.ingestion import (
    WAREHOUSE_COLUMNS,
)
from aws_etl_global_footprint_network_spark.schemas import (
    CARBON_COLUMN_MAPPING,
    CARBON_RAW_SCHEMA,
)


def incremental_ingest(
    spark: SparkSession,
    raw_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> int:
    """Run one AvailableNow pass: new raw JSON files -> normalised
    parquet append. Returns the number of batches processed.

    At cluster scale the sink would be a Delta table (MERGE for
    dedup); parquet-append + checkpoint gives the same
    exactly-once-per-file guarantee for an append-only raw zone.
    """
    stream = (
        spark.readStream.schema(CARBON_RAW_SCHEMA)
        .option("multiLine", True)
        .json(raw_dir)
    )
    normalised = stream.withColumnsRenamed(CARBON_COLUMN_MAPPING).select(
        *WAREHOUSE_COLUMNS
    )
    q = (
        normalised.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q.lastProgress["batchId"] + 1 if q.lastProgress else 0


def read_warehouse(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.schema(
        "year int, country_code int, country_name string, short_name string,"
        " isoa2 string, record string, crop_land double, grazing_land double,"
        " forest_land double, fishing_ground double, builtup_land double,"
        " carbon double, value double, score string"
    ).parquet(output_dir)
