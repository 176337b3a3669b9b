"""Multimodal column plumbing ([EXT]): image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` UDFs.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic stub (``_fake_decode``) — the Spark-side
contract (schema, batch shape, partitioning) is real and tested, and a
production deployment swaps only the inner decode function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_etl_global_footprint_network_spark.registry import register
from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

FEATURE_DIM = 8

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_payload(documents: DataFrame) -> DataFrame:
    """Treat the document text's UTF-8 bytes as an opaque media payload
    — the schema/partitioning stand-in for real image bytes."""
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """STUB for the real decoder (PIL/librosa/ffmpeg not in this
    container). Deterministic: derives FEATURE_DIM floats from byte
    statistics. A real deployment replaces exactly this function."""
    n = len(payload)
    return [
        float((sum(payload[i::FEATURE_DIM]) % 1000) / 1000.0 + (n % (i + 2)))
        for i in range(FEATURE_DIM)
    ]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each task pulls Arrow record batches, runs the
    (stub) decoder per payload, emits a feature vector — the exact
    plumbing a real image/audio featurizer uses. No shuffle: this is
    a map-only stage, so it scales linearly with partitions."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "features": pdf["payload"].map(_fake_decode),
                }
            )

    return media.mapInPandas(op, schema=FEATURES_SCHEMA)


@register(
    "binary_payload_meta",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
    "binary column plumbing: payload byte length + content digest",
    tags=("multimodal",),
)
def binary_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_testdata(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
        F.md5("text").alias("payload_md5"),
    )


@register(
    "multimodal_features",
    None,  # Python-side stub decoder — driver does the rows-only check
    "mapInPandas feature extraction over binary payloads (stub decode);"
    " driver-facing shape is exploded (doc_id, n_bytes, feature_pos,"
    " feature_val) so every column is scalar — the array-returning"
    " library API is extract_features()",
    tags=("multimodal",),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_testdata(spark, sf_dir, "documents")
    feats = extract_features(attach_binary_payload(d))
    return feats.select(
        "doc_id",
        "n_bytes",
        F.posexplode("features").alias("feature_pos", "feature_val"),
    ).select(
        "doc_id",
        "n_bytes",
        F.col("feature_pos").cast("int").alias("feature_pos"),
        F.col("feature_val").cast("double").alias("feature_val"),
    )


@register(
    "grouped_pandas_rank",
    """
    SELECT CAST(user_id AS BIGINT) AS user_id, event_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS BIGINT) AS visit_rank,
           ROUND(value * 100, 0) / 100 AS value
    FROM events
    """,
    "grouped-map Pandas UDF (applyInPandas): per-user visit ranking;"
    " integer output keeps the oracle hash-exact despite the Python"
    " path",
    tags=("pandas_udf", "window"),
)
def grouped_pandas_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: each user's events arrive as one pandas
    DataFrame (Arrow transfer), ranked in Python, returned as Arrow.
    The grouped-map shape is what per-entity model scoring / feature
    engineering uses; outputs here are exact integers so even the
    DuckDB oracle hash-matches the Python path. Scale: one shuffle on
    user_id; group size must fit a worker's memory (bounded here;
    for unbounded groups use mapInPandas + window instead)."""
    from aws_etl_global_footprint_network_spark.sources.readers import (
        read_testdata as _rt,
    )

    ev = _rt(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        # Half-away-from-zero to match DuckDB's ROUND (pandas .round is
        # half-to-even; a tie like 2.125 would diverge 2.12 vs 2.13).
        scaled = pdf["value"] * 100
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "visit_rank": range(1, len(pdf) + 1),
                "value": np.copysign(np.floor(np.abs(scaled) + 0.5), scaled) / 100,
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        rank_group,
        schema="user_id bigint, event_id bigint, visit_rank bigint, value double",
    )
