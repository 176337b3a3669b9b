"""Scale probe for the round-11 adaptive-geometry family.

Measures, in ONE warm session per scale (sf1, sf10):

- ``ann_lsh_pairs_adaptive`` wall time + the dispatch decision
  (extra bits chosen from the corpus count);
- ``dedup_embedding_cosine`` (now consuming the adaptive index) and
  ``semantic_dedup_drop`` (corpus-adaptive sign-cell bits);
- ``ann_lsh_pairs`` (fixed geometry) as the sf1 control — at sf10 the
  fixed numbers are NOT re-run (412 / 226 / 45 s, BENCH_sf10.json);
- EXACT twin recall at every scale: planted twins are the known pairs
  (v, v + TWIN_OFFSET), so ground truth is one equi-join computing
  cosine over ~n/4 pairs — no quadratic sweep needed.

Output: one JSON object to stdout + bench_lsh_adaptive_r11.json.

Usage: python scripts/bench_lsh_adaptive.py [--dirs /tmp/sf1,/tmp/sf10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_etl_global_footprint_network_spark.session import get_spark  # noqa: E402
from aws_etl_global_footprint_network_spark.functions.ranking import DISPATCH_LOG  # noqa: E402
from aws_etl_global_footprint_network_spark.functions.vectors import dot  # noqa: E402
from aws_etl_global_footprint_network_spark.operators import similarity as sim  # noqa: E402
from aws_etl_global_footprint_network_spark.registry import load_all  # noqa: E402


def twin_ground_truth(spark, sf_dir: str) -> int:
    """Number of planted twin pairs at or above the verify threshold."""
    emb = sim.augmented_embeddings(spark, sf_dir)
    base = emb.filter(F.col("vec_id") < sim.TWIN_OFFSET).select(
        F.col("vec_id").alias("va"), F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    tw = emb.filter(F.col("vec_id") >= sim.TWIN_OFFSET).select(
        (F.col("vec_id") - sim.TWIN_OFFSET).alias("va"),
        F.col("e").alias("eb"), F.col("nrm").alias("nb"),
    )
    cos = dot("ea", "eb") / (F.col("na") * F.col("nb"))
    return (
        base.join(tw, "va")
        .filter(cos >= sim.LSH_PAIR_THRESHOLD)
        .count()
    )


def twin_pairs_found(df) -> int:
    return df.filter(
        F.col("vec_b") - F.col("vec_a") == sim.TWIN_OFFSET
    ).count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", default="/tmp/sf1,/tmp/sf10")
    ap.add_argument("--fixed-control-at", default="/tmp/sf1")
    args = ap.parse_args()
    spark = get_spark(app_name="bench_lsh_adaptive")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out: dict = {"scales": {}}

    for sf_dir in args.dirs.split(","):
        res: dict = {}
        DISPATCH_LOG.clear()

        t0 = time.time()
        adaptive = specs["ann_lsh_pairs_adaptive"].builder(spark, sf_dir)
        n_pairs = adaptive.count()
        res["adaptive_sec"] = round(time.time() - t0, 2)
        res["adaptive_pairs"] = n_pairs
        res["dispatch"] = [d for d in DISPATCH_LOG]

        gt = twin_ground_truth(spark, sf_dir)
        found = twin_pairs_found(
            specs["ann_lsh_pairs_adaptive"].builder(spark, sf_dir)
        )
        res["twin_gt"] = gt
        res["twin_found"] = found
        res["twin_recall"] = round(found / gt, 4) if gt else None

        for name in ("dedup_embedding_cosine", "semantic_dedup_drop"):
            DISPATCH_LOG.clear()
            t0 = time.time()
            specs[name].builder(spark, sf_dir).count()
            res[f"{name}_sec"] = round(time.time() - t0, 2)

        if sf_dir == args.fixed_control_at:
            t0 = time.time()
            fixed = specs["ann_lsh_pairs"].builder(spark, sf_dir)
            res["fixed_pairs"] = fixed.count()
            res["fixed_sec"] = round(time.time() - t0, 2)
            res["fixed_twin_found"] = twin_pairs_found(
                specs["ann_lsh_pairs"].builder(spark, sf_dir)
            )

        out["scales"][sf_dir] = res
        print(sf_dir, json.dumps(res), flush=True)

    out["notes"] = (
        "sf10 fixed-geometry baselines not re-run (BENCH_sf10.json:"
        " ann_lsh_pairs 412.1 s, dedup_embedding_cosine 226.2 s,"
        " semantic_dedup_drop 45.2 s)"
    )
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench_lsh_adaptive_r11.json"), "w"
    ) as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
