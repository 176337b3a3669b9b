"""Build a larger benchmark corpus from the sf0.1 testdata.

    python scripts/make_scale.py [--factor 10] [--out /tmp/sf1]

Relational tables are replicated ``factor`` times with every
primary/foreign key offset per replica, so each replica is a
self-consistent shard: join cardinalities and per-key group sizes are
preserved exactly while total volume scales linearly — the right shape
for a throughput measurement (a naive row copy would instead square
the dedup pair counts and explode every self-join).

``documents`` and ``embeddings`` cannot be replicated (identical
copies would be cross-replica near-duplicates and quadratically blow
up the dedup/LSH result sets), so they are generated fresh at
``factor`` times the row count in the same style as the originals:
word-salad docs over the corpus's own vocabulary with ~5% planted
shingle-overlap twins, and isotropic Gaussian embeddings. Everything
is seeded — two runs produce identical bytes.

Output is for benchmarking only (bench.py's SPARK_GRAFT_SF_DIR);
correctness gates keep running against the driver-provided testdata.
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# Per-replica key offsets, comfortably above each table's max key and
# below similarity.TWIN_OFFSET (10M) so planted-twin ids never collide.
OFFSETS = {
    "o_orderkey": 1_000_000,
    "l_orderkey": 1_000_000,
    "c_custkey": 100_000,
    "o_custkey": 100_000,
    "p_partkey": 100_000,
    "l_partkey": 100_000,
    "s_suppkey": 10_000,
    "l_suppkey": 10_000,
    "event_id": 1_000_000,
    "user_id": 10_000,
}

REPLICATED = ["lineitem", "orders", "customer", "supplier", "part", "events"]
COPIED = ["nation", "region"]

# Clustered-embedding geometry (--clustered): 10 clusters to match the
# label domain the IVF operators use as inverted lists. sigma=0.1 in
# 64-dim puts E||noise||^2 = 64*0.01 = 0.64 around unit-norm centers
# -> within-cluster cosine ~ 0.76, cross-cluster ~ 0 (orthogonal
# random centers): true top-k neighbours are same-cluster with
# overwhelming probability.
K_CLUSTERS = 10
CLUSTER_SIGMA = 0.1


def replicate(name: str, factor: int, out_dir: str) -> int:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    chunks = []
    for i in range(factor):
        cols = []
        for field in t.schema.names:
            col = t.column(field)
            if field in OFFSETS and i > 0:
                col = pc.add(col, i * OFFSETS[field])
            cols.append(col)
        chunks.append(pa.table(cols, names=t.schema.names))
    out = pa.concat_tables(chunks)
    pq.write_table(out, f"{out_dir}/{name}.parquet")
    return out.num_rows


def synth_documents(factor: int, out_dir: str) -> int:
    src = pq.read_table(f"{SRC}/documents.parquet")
    vocab = sorted(
        {w for text in src.column("text").to_pylist() for w in text.split()}
    )
    langs = sorted(set(src.column("lang").to_pylist()))
    sources = sorted(set(src.column("source").to_pylist()))
    n = src.num_rows * factor
    rng = random.Random(20260813)
    doc_ids, texts = [], []
    doc_id = 0
    while doc_id < n:
        length = rng.randint(15, 80)
        base = [rng.choice(vocab) for _ in range(length)]
        doc_ids.append(doc_id)
        texts.append(" ".join(base))
        doc_id += 1
        if doc_id < n and rng.random() < 0.05:  # planted near-dup twin
            twin = list(base)
            for _ in range(max(1, length // 25)):
                twin[rng.randrange(length)] = rng.choice(vocab)
            doc_ids.append(doc_id)
            texts.append(" ".join(twin))
            doc_id += 1
    out = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([rng.choice(langs) for _ in doc_ids]),
            "source": pa.array([rng.choice(sources) for _ in doc_ids]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(out, f"{out_dir}/documents.parquet")
    return out.num_rows


def synth_embeddings(factor: int, out_dir: str, clustered: bool = False) -> int:
    """Isotropic Gaussian by default (matches the driver corpus — the
    documented WORST case for any ANN index: distance concentration
    means no partition of space separates neighbours).

    ``clustered=True`` instead plants ``K_CLUSTERS`` Gaussian clusters
    (the SIFT-like synthetic standard every public ANN benchmark uses):
    unit-norm centers drawn once, points = center + sigma*noise with
    sigma chosen so a point's true nearest neighbours are overwhelmingly
    same-cluster — the regime where IVF/PQ recall dials mean something.
    ``label`` is the TRUE cluster id, so the label-based IVF lists
    (ivf_label_centroids) align with the geometry."""
    src = pq.read_table(f"{SRC}/embeddings.parquet")
    dim = len(src.column("embedding")[0])
    n = src.num_rows * factor
    gen = np.random.default_rng(20260813)
    if clustered:
        centers = gen.standard_normal((K_CLUSTERS, dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        labels = (np.arange(n) % K_CLUSTERS).astype(np.int32)
        vecs = (
            centers[labels] + CLUSTER_SIGMA * gen.standard_normal((n, dim))
        ).astype(np.float32)
    else:
        labels = (np.arange(n) % 10).astype(np.int32)
        vecs = gen.standard_normal((n, dim)).astype(np.float32)
    out = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(out, f"{out_dir}/embeddings.parquet")
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument(
        "--clustered",
        action="store_true",
        help="plant K Gaussian clusters in the embeddings (ANN recall"
        " measurement corpus) instead of isotropic noise",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in COPIED:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{args.out}/{name}.parquet")
        print(f"{name}: {t.num_rows} (copied)")
    for name in REPLICATED:
        print(f"{name}: {replicate(name, args.factor, args.out)}")
    print(f"documents: {synth_documents(args.factor, args.out)} (synth)")
    kind = "clustered" if args.clustered else "isotropic"
    print(
        f"embeddings: {synth_embeddings(args.factor, args.out, args.clustered)}"
        f" ({kind} synth)"
    )


if __name__ == "__main__":
    main()
