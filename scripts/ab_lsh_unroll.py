"""A/B: unrolled vs higher-order-function LSH plane projection.

    python scripts/ab_lsh_unroll.py [--dir /tmp/sf1] [--reps 3]

Round-12 evidence for the projection rewrite in
operators/similarity.py (sign_band_table / _adaptive_home_table):
``aggregate(zip_with(e, array(...), (x,y) -> x*y), 0.0D, ...)``
evaluates its lambdas interpretively per element (HigherOrderFunction
bodies are outside whole-stage codegen), so the 120-plane x 64-dim
projection dominated ann_lsh_pairs_adaptive's sf1 wall.  The unrolled
``e[0]*w0 + e[1]*w1 + ...`` form is a flat codegen'd expression with
the SAME left-to-right float64 fold — bit-identical sign bits, which
this script asserts by comparing the total bit population count over
the corpus before timing anything.

Protocol: alternating warm A/B (hof, unrolled, hof, unrolled, ...)
inside one session, reporting per-rep walls and minima — the
same-session interleave makes the comparison VM-drift-proof.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="ab-lsh-unroll")
    emb = S.augmented_embeddings(spark, args.dir).persist()
    n_aug = emb.count()

    extra = S._extra_bits(
        n_aug * S.TWIN_EVERY // (S.TWIN_EVERY + 1), S.ADAPTIVE_NREF
    )
    needed = list(range(S.N_PLANES)) + [
        S.N_PLANES + b * S.ADAPTIVE_MAX_EXTRA + je
        for b in range(S.LSH_BANDS)
        for je in range(extra)
    ]

    def popcount(plane_dot) -> int:
        bits = emb.selectExpr(
            "vec_id",
            *[
                f"CASE WHEN {plane_dot(p)} > 0 THEN 1 ELSE 0 END AS bit{p}"
                for p in needed
            ],
        )
        expr = "sum(" + "+".join(f"bit{p}" for p in needed) + ") AS s"
        return bits.selectExpr(expr).collect()[0][0]

    # Exactness gate first: identical sign-bit population over the
    # whole corpus, or the timing comparison is meaningless.
    pc_hof = popcount(_hof_plane_dot)
    pc_unr = popcount(S._plane_dot_spark)
    assert pc_hof == pc_unr, (pc_hof, pc_unr)

    walls: dict[str, list[float]] = {"hof": [], "unrolled": []}
    for _ in range(args.reps):
        for name, pd in (("hof", _hof_plane_dot),
                         ("unrolled", S._plane_dot_spark)):
            t0 = time.time()
            popcount(pd)
            walls[name].append(round(time.time() - t0, 2))

    out = {
        "dir": args.dir,
        "n_aug": n_aug,
        "extra_bits": extra,
        "planes": len(needed),
        "bit_popcount": pc_hof,
        "walls": walls,
        "min": {k: min(v) for k, v in walls.items()},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
