"""Arrow-vectorized similarity (the Pandas-UDF fast path).

``ann_cosine_topk`` (similarity.py) keeps every float op in
deterministic JVM folds so the DuckDB oracle hash-matches. This module
is the THROUGHPUT variant of the same operator: a scalar Pandas UDF
receives Arrow batches and runs the query x corpus dot products as one
numpy matmul per batch — the shape you actually deploy when the
corpus is 10^9 vectors and a last-ulp summation difference is
irrelevant. numpy's pairwise/SIMD summation cannot promise
bit-equality with a sequential SQL fold, but after ``round_compat``
to 6 decimals the scores hash-match the brute-force DuckDB twin
(differences are ~1e-15, five orders below the rounding grain), so
since round 5 this is a full oracle-paired row rather than
rows-only; bit-level equivalence to the exact operator is
additionally pinned by test at 1e-9 tolerance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_etl_global_footprint_network_spark.functions.compat import round_compat
from aws_etl_global_footprint_network_spark.registry import register
from aws_etl_global_footprint_network_spark.sources.readers import read_testdata, spread

TOPK = 5
N_QUERIES = 10


def topk_vectorized(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = TOPK,
    rank_grain: int | None = None,
) -> DataFrame:
    """Top-k cosine neighbours for a broadcast query set.

    The query matrix ships to executors once (closure broadcast); each
    Arrow batch of corpus vectors becomes one (batch x dim) @ (dim x q)
    matmul. Map-only: per-partition local top-k would be the next
    refinement (here the window handles it, k*corpus is small).

    ``rank_grain``: when set, ranking (and the tie-break) happens on
    the score ROUNDED to that many decimals + neighbor_id. numpy's
    pairwise/SIMD sums differ ~1e-15 from a sequential SQL fold, so an
    oracle-paired caller must decide rank order on the shared rounded
    grain — a raw-score near-tie at the k boundary would otherwise
    flip neighbor_id/rank in a way the output rounding cannot heal."""
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
    rank_col = (
        round_compat(F.col("cos"), rank_grain)
        if rank_grain is not None
        else F.col("cos")
    )
    w = Window.partitionBy("query_id").orderBy(rank_col.desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.col("cos").alias("score"))
    )


def _vectorized_oracle() -> str:
    from aws_etl_global_footprint_network_spark.functions.vectors import (
        dot_sql,
        norm_sql,
    )

    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                      {norm_sql('(embedding::DOUBLE[])')} AS nrm
               FROM embeddings),
    q AS (SELECT vec_id, e, nrm FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
             {dot_sql('q.e', 'v.e')} / (q.nrm * v.nrm) AS cos
      FROM q JOIN v ON q.vec_id <> v.vec_id),
    ranked AS (
      -- rank on the ROUNDED score + id tie-break: the Spark twin's
      -- numpy sums differ ~1e-15 from this sequential fold, so order
      -- must be decided on the grain both engines share
      SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY ROUND(cos, 6) DESC, neighbor_id) AS INT) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, rank, ROUND(cos, 6) AS score
    FROM ranked WHERE rank <= {TOPK}
    """


@register(
    "ann_cosine_topk_vectorized",
    _vectorized_oracle(),
    "Arrow/numpy-vectorized cosine top-k (the production fast path);"
    " scores round_compat-rounded to 6 decimals AND ranked on that"
    " rounded grain (+ neighbor_id tie-break) in both twins, so the"
    " numpy matmul hash-matches the sequential-fold DuckDB twin even"
    " at a near-tie on the k boundary",
    tags=("similarity", "pandas_udf"),
)
def ann_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    queries = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    top = topk_vectorized(
        emb.select("vec_id", "embedding"), queries, rank_grain=6
    )
    return top.withColumn("score", round_compat("score", 6))


# Matryoshka-style truncation evaluation: retrieval overlap when only
# the first d dimensions of each embedding are stored (MRL — Kusupati
# et al. 2022 — trains embeddings so prefixes work; this measures how
# much of the exact top-k survives truncation on THIS corpus).
MRL_DIMS = (16, 32, 64)
MRL_K = 5
MRL_QUERIES = 10


def _mrl_oracle() -> str:
    from aws_etl_global_footprint_network_spark.functions.vectors import (
        dot_sql,
        norm_sql,
    )

    def top_cte(d: int) -> str:
        return f"""
    v{d} AS (SELECT vec_id, list_slice(embedding::DOUBLE[], 1, {d}) AS e
             FROM embeddings),
    n{d} AS (SELECT vec_id, e, {norm_sql('e')} AS nrm FROM v{d}),
    s{d} AS (SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
                    {dot_sql('q.e', 'x.e')} / (q.nrm * x.nrm) AS cos
             FROM n{d} q JOIN n{d} x ON q.vec_id < {MRL_QUERIES}
                                     AND x.vec_id <> q.vec_id),
    t{d} AS (SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rn
        FROM s{d}) WHERE rn <= {MRL_K})"""

    ctes = ",".join(top_cte(d) for d in MRL_DIMS)
    unions = " UNION ALL ".join(
        f"""SELECT {d} AS dim, COUNT(*) AS overlap_pairs
            FROM t{d} a JOIN t{MRL_DIMS[-1]} b
              ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id"""
        for d in MRL_DIMS
    )
    return f"""
    WITH {ctes},
    ov AS ({unions})
    SELECT CAST(dim AS INT) AS dim,
           CAST(overlap_pairs AS BIGINT) AS overlap_pairs,
           ROUND(overlap_pairs * 1.0 / {MRL_QUERIES * MRL_K} * 1e6, 0) / 1e6
             AS overlap_at_k
    FROM ov
    """


@register(
    "matryoshka_topk_overlap",
    _mrl_oracle(),
    f"embedding-truncation retrieval quality: top-{MRL_K} overlap vs"
    f" full-dim search when only the first d of 64 dims are stored,"
    f" for d in {MRL_DIMS} — the storage/quality dial for"
    " Matryoshka-style embedding budgets",
    tags=("similarity", "mlprep"),
)
def matryoshka_topk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three brute-force top-k passes (one per prefix length), each
    the ann_cosine_topk shape: broadcast bounded query set, map-side
    fold, per-query window top-k — then overlap joins against the
    full-dim baseline. At 100 TB each pass would be the IVF/PQ path
    instead; the measurement shape (overlap vs the full-dim answer)
    is unchanged. On this isotropic corpus prefixes carry ~d/64 of
    the variance, so overlap decays with truncation — real MRL-trained
    embeddings concentrate information in the prefix, pushing the
    short-dim rows toward 1.0; the operator is the measurement, not
    the training."""
    from aws_etl_global_footprint_network_spark.functions.vectors import (
        as_double_array,
        dot,
        norm,
    )

    tops = {}
    for d in MRL_DIMS:
        emb = spread(read_testdata(spark, sf_dir, "embeddings")).select(
            "vec_id", F.slice(as_double_array("embedding"), 1, d).alias("e")
        ).select("vec_id", "e", norm("e").alias("nrm"))
        q = emb.filter(F.col("vec_id") < MRL_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qnrm"),
        )
        scored = emb.join(
            F.broadcast(q), F.col("query_id") != F.col("vec_id")
        ).select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot("qe", "e") / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), "neighbor_id"
        )
        tops[d] = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(f"rn <= {MRL_K}")
            .select("query_id", "neighbor_id")
        )
    full = tops[MRL_DIMS[-1]]
    parts = []
    for d in MRL_DIMS:
        parts.append(
            tops[d].join(full, ["query_id", "neighbor_id"]).agg(
                F.lit(d).cast("int").alias("dim"),
                F.count(F.lit(1)).cast("bigint").alias("overlap_pairs"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "dim",
        "overlap_pairs",
        round_compat(
            F.col("overlap_pairs") / float(MRL_QUERIES * MRL_K), 6
        ).alias("overlap_at_k"),
    )
