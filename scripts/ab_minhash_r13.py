"""Same-session warm A/B: minhash family round-12 shape (corpus-wide
shingle explode + distinct + K-min groupBy) vs the round-13 Arrow
signature kernel + candidate-only shingling.

    python scripts/ab_minhash_r13.py [--dir /root/testdata/sf0.1] [--rounds 3]

Loads the round-12 module verbatim from git (commit 991ddc7, the last
commit carrying the old builders) into a throwaway registry, then
alternates OLD/NEW per round in one warm session and verifies
row-identical results.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark import registry
from aws_etl_global_footprint_network_spark.session import get_spark

OLD_COMMIT = "991ddc7"
FAMILY = ["dedup_minhash_lsh", "dedup_containment_pairs"]


def load_old_specs():
    src = subprocess.run(
        [
            "git",
            "show",
            f"{OLD_COMMIT}:aws_etl_global_footprint_network_spark/operators/dedup.py",
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    path = "/tmp/_old_dedup.py"
    with open(path, "w") as fh:
        fh.write(src)
    saved = dict(registry.REGISTRY)
    registry.REGISTRY.clear()
    spec = importlib.util.spec_from_file_location("_old_dedup", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old_specs = dict(registry.REGISTRY)
    registry.REGISTRY.clear()
    registry.REGISTRY.update(saved)
    return old_specs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from aws_etl_global_footprint_network_spark.registry import load_all

    # load the live registry FIRST: module import side effects must
    # land in the real REGISTRY, not the throwaway one
    new_specs = load_all()
    old_specs = load_old_specs()
    spark = get_spark(app_name="ab-minhash-r13")

    for name in FAMILY:
        old_specs[name].builder(spark, args.dir).count()
        new_specs[name].builder(spark, args.dir).count()
    for i in range(args.rounds):
        for name in FAMILY:
            t0 = time.perf_counter()
            old_rows = sorted(
                map(tuple, old_specs[name].builder(spark, args.dir).collect())
            )
            t_old = time.perf_counter() - t0
            t0 = time.perf_counter()
            new_rows = sorted(
                map(tuple, new_specs[name].builder(spark, args.dir).collect())
            )
            t_new = time.perf_counter() - t0
            same = old_rows == new_rows
            print(
                f"round {i} {name}: old={t_old:.2f}s new={t_new:.2f}s"
                f" identical={same}",
                flush=True,
            )
            assert same, f"MISMATCH in {name}"


if __name__ == "__main__":
    main()
