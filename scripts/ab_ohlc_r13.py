"""streaming_ohlc_bars floor A/B (round 13, verdict item 7): the
committed decomposition behind the ``machinery`` flag.

    python scripts/ab_ohlc_r13.py [--dir /tmp/sf1] [--rounds 3]

MEASURED RESULTS (2026-08-18, warm alternating):
  * update vs complete output mode, sf0.1: update 2.58-2.62 s,
    complete 2.08 s — update is NOT faster for the single-batch
    AvailableNow backlog (and would duplicate sink rows the moment
    the backlog splits into >1 micro-batch, changing the result);
    complete mode stands.
  * batch twin vs stream, sf1 (this script):
      round 0: batch=2.01s stream=6.77s
      round 1: batch=1.42s stream=6.42s
      round 2: batch=1.49s stream=6.33s
    — the ~4.9 s delta is the state store + complete-mode memory
    sink over the ~766k (user, bar) keys, i.e. exactly the
    micro-batch machinery the ``machinery`` flag names; the
    aggregation itself (min_by/max_by partials) costs the same on
    both paths.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.registry import load_all
from aws_etl_global_footprint_network_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    specs = load_all()
    spark = get_spark(app_name="ab-ohlc-r13")
    bt = specs["events_ohlc_bars"].builder
    st = specs["streaming_ohlc_bars"].builder
    bt(spark, args.dir).count()
    st(spark, args.dir).count()
    for i in range(args.rounds):
        t0 = time.perf_counter()
        bt(spark, args.dir).write.format("noop").mode("overwrite").save()
        b = time.perf_counter() - t0
        t0 = time.perf_counter()
        st(spark, args.dir).count()
        s = time.perf_counter() - t0
        print(f"round {i}: batch={b:.2f}s stream={s:.2f}s", flush=True)


if __name__ == "__main__":
    main()
