"""Same-session warm A/B: matryoshka_topk_overlap round-12 shape
(three broadcast-join passes + per-query windows + overlap joins)
vs the round-13 single Arrow-batched pass + constant-size close.

    python scripts/ab_matryoshka_r13.py [--dir /tmp/sf1] [--rounds 3]

Alternates OLD/NEW per round in one warm session; also verifies the
two results are row-identical every round.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.functions.compat import round_compat
from aws_etl_global_footprint_network_spark.operators.similarity_vectorized import (
    MRL_DIMS,
    MRL_K,
    MRL_QUERIES,
    matryoshka_topk_overlap,
)
from aws_etl_global_footprint_network_spark.session import get_spark
from aws_etl_global_footprint_network_spark.sources.readers import (
    read_testdata,
    spread,
)


def old_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-12 implementation, verbatim."""
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="ab-matryoshka-r13")
    # warm both paths once
    old_matryoshka(spark, args.dir).count()
    matryoshka_topk_overlap(spark, args.dir).count()
    for i in range(args.rounds):
        t0 = time.perf_counter()
        old_rows = sorted(map(tuple, old_matryoshka(spark, args.dir).collect()))
        t_old = time.perf_counter() - t0
        t0 = time.perf_counter()
        new_rows = sorted(
            map(tuple, matryoshka_topk_overlap(spark, args.dir).collect())
        )
        t_new = time.perf_counter() - t0
        same = old_rows == new_rows
        print(
            f"round {i}: old={t_old:.2f}s new={t_new:.2f}s identical={same}",
            flush=True,
        )
        assert same, f"MISMATCH: {old_rows} vs {new_rows}"


if __name__ == "__main__":
    main()
