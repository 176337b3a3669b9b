"""Arrow-vectorized similarity (the Pandas-UDF fast path).

``ann_cosine_topk`` (similarity.py) keeps every float op in
deterministic JVM folds so the DuckDB oracle hash-matches. This module
is the THROUGHPUT variant of the same operator: a scalar Pandas UDF
receives Arrow batches and runs the query x corpus dot products as one
numpy matmul per batch — the shape you actually deploy when the
corpus is 10^9 vectors and a last-ulp summation difference is
irrelevant. Registered rows-only (numpy's pairwise/SIMD summation
cannot promise bit-equality with a sequential SQL fold); equivalence
to the exact operator is pinned by test at 1e-9 tolerance instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_etl_global_footprint_network_spark.registry import register
from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

TOPK = 5
N_QUERIES = 10


def topk_vectorized(
    corpus: DataFrame, queries: list[tuple[int, list[float]]], k: int = TOPK
) -> DataFrame:
    """Top-k cosine neighbours for a broadcast query set.

    The query matrix ships to executors once (closure broadcast); each
    Arrow batch of corpus vectors becomes one (batch x dim) @ (dim x q)
    matmul. Map-only: per-partition local top-k would be the next
    refinement (here the window handles it, k*corpus is small)."""
    qids = [q[0] for q in queries]
    qmat = np.asarray([q[1] for q in queries], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)

    out_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField("cos", T.DoubleType()),
            ]
        )
    )

    @F.pandas_udf(out_type)
    def scores(emb: pd.Series) -> pd.Series:
        m = np.asarray(emb.tolist(), dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ qmat.T  # (batch, n_queries)
        return pd.Series(
            [
                [{"query_id": int(qid), "cos": float(c)} for qid, c in zip(qids, row)]
                for row in sims
            ]
        )

    from pyspark.sql import Window

    scored = (
        corpus.select("vec_id", scores("embedding").alias("ss"))
        .select("vec_id", F.explode("ss").alias("s"))
        .select(
            F.col("s.query_id").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("s.cos").alias("cos"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.col("cos").alias("score"))
    )


@register(
    "ann_cosine_topk_vectorized",
    None,  # numpy summation order != SQL fold -> rows-only by design;
    # equivalence to ann_cosine_topk pinned in tests at 1e-9
    "Arrow/numpy-vectorized cosine top-k (the production fast path)",
    tags=("similarity", "pandas_udf"),
)
def ann_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    queries = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    return topk_vectorized(emb.select("vec_id", "embedding"), queries)
