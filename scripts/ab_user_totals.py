"""A/B: streaming_user_totals_stateful per-key GroupState (round-9
shape) vs bucket-vectorised pickled-frame state (round-11), one warm
session, alternating. Usage:

    python scripts/ab_user_totals.py [--dir /tmp/sf1] [--rounds 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.registry import load_all
from aws_etl_global_footprint_network_spark.session import get_spark
from aws_etl_global_footprint_network_spark.sources.readers import (
    read_testdata_raw,
)


def per_key_variant(spark, sf_dir):
    """The round-9 shape: one GroupState per user_id."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # imported here: streaming.jobs must load AFTER the full registry
    from aws_etl_global_footprint_network_spark.streaming import jobs

    raw = read_testdata_raw(spark, sf_dir, "events")
    name = f"ab_state_{uuid.uuid4().hex[:8]}"

    def update(key, pdfs, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "cents": [cents]}
        )

    n_rows = raw.count()
    stream = jobs._staged_stream(spark, raw, cols=("user_id", "value"))
    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, cents bigint",
        stateStructType="n bigint, cents bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    with jobs._stream_partitions(
        spark, jobs._sized_state_partitions(spark, n_rows)
    ):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    from pyspark.sql import Window

    sink = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "user_id",
            "n_events",
            (F.col("cents") / 100.0).alias("total_value"),
        )
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()
    specs = load_all()
    spark = get_spark(app_name="ab-user-totals")
    bucket = specs["streaming_user_totals_stateful"].builder
    per_key_variant(spark, "/root/testdata/sf0.001").count()
    bucket(spark, "/root/testdata/sf0.001").count()
    a = sorted(map(tuple, per_key_variant(spark, "/root/testdata/sf0.01").collect()))
    b = sorted(map(tuple, bucket(spark, "/root/testdata/sf0.01").collect()))
    assert a == b, "variants differ"
    print("# variants agree at sf0.01", flush=True)
    for r in range(args.rounds):
        for label, fn in (("per-key", per_key_variant), ("bucket", bucket)):
            t0 = time.perf_counter()
            n = fn(spark, args.dir).count()
            print(
                f"round {r} {label}: {time.perf_counter() - t0:.3f}s ({n} rows)",
                flush=True,
            )
