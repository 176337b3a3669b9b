"""A/B/C: LSH plane-projection strategies (HOF / unrolled SQL / numpy).

    python scripts/ab_lsh_unroll.py [--dir /tmp/sf1] [--reps 2]

Round-12 evidence for operators/similarity._band_bucket_frame — the
Arrow-batched numpy projection both band tables now use.  Three
strategies compute the same (vec_id, band, bucket) table:

  hof       CASE WHEN aggregate(zip_with(e, array(w...), *), 0.0D,
            +) > 0 ... — HigherOrderFunction lambdas are evaluated
            interpretively per element (no codegen for lambda bodies)
  unrolled  CASE WHEN e[0]*w0 + e[1]*w1 + ... > 0 — flat codegen
            arithmetic that EXCEEDS janino's 64 KB per-method limit at
            88+ planes x 64 dims, silently degrading the entire fused
            whole-stage to interpreted mode (the ERROR CodeGenerator
            line in the logs is the tell)
  numpy     mapInPandas: acc = acc + E[:, i] * W[i] for i in 0..63 —
            the exact same left-to-right float64 fold per (row,
            plane), SIMD-vectorized across the Arrow batch

Exactness gate: all three must produce the SAME (vec_id, band,
bucket) set (asserted via symmetric difference) before any timing is
reported — the fold-order argument is in _band_bucket_frame's
docstring, and the cross-engine hash sweeps hold at sf0.01/sf1/sf10.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.session import get_spark
from aws_etl_global_footprint_network_spark.operators import similarity as S


def _hof_plane_dot(p: int) -> str:
    lits = ", ".join(f"{x!r}D" for x in S.HYPERPLANES_POOL[p])
    return (
        f"aggregate(zip_with(e, array({lits}), (x, y) -> x * y),"
        " 0.0D, (acc, v) -> acc + v)"
    )


def _sql_band_table(emb, plane_dot):
    bits = emb.selectExpr(
        "vec_id",
        *[
            f"CASE WHEN {plane_dot(p)} > 0 THEN 1 ELSE 0 END AS bit{p}"
            for p in range(S.N_PLANES)
        ],
    )

    def bucket(b: int) -> str:
        return " + ".join(
            f"shiftleft(CAST(bit{b * S.BITS_PER_BAND + j} AS BIGINT), {j})"
            for j in range(S.BITS_PER_BAND)
        )

    structs = ", ".join(
        f"named_struct('band', {b}, 'bucket', {bucket(b)})"
        for b in range(S.LSH_BANDS)
    )
    return bits.selectExpr(
        "vec_id", f"explode(array({structs})) AS bb"
    ).select("vec_id", "bb.band", "bb.bucket")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="ab-lsh-projection")
    emb = S.augmented_embeddings(spark, args.dir).persist()
    emb.count()

    builders = {
        "hof": lambda: _sql_band_table(emb, _hof_plane_dot),
        "unrolled": lambda: _sql_band_table(emb, S._plane_dot_spark),
        "numpy": lambda: S._band_bucket_frame(emb, 0),
    }

    # Exactness gate: identical band tables, or timing is meaningless.
    ref = builders["numpy"]()
    for name in ("hof", "unrolled"):
        other = builders[name]()
        d = ref.exceptAll(other).count() + other.exceptAll(ref).count()
        assert d == 0, (name, d)

    walls: dict[str, list[float]] = {n: [] for n in builders}
    for _ in range(args.reps):
        for name, fn in builders.items():
            t0 = time.perf_counter()
            fn().count()
            walls[name].append(round(time.perf_counter() - t0, 2))

    print(json.dumps({
        "dir": args.dir,
        "n_aug": emb.count(),
        "planes": S.N_PLANES,
        "walls": walls,
        "min": {k: min(v) for k, v in walls.items()},
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
