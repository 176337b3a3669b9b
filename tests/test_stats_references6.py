"""Sixth reference batch: the ANN-evaluation chain — exact cosine
top-k, the kNN majority-vote classifier, and nDCG@k — recomputed with
brute-force numpy over the raw embedding table.
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.registry import load_all

SPECS = load_all()
TOPK = 5


def _brute_topk(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT vec_id, embedding::DOUBLE[], label
        FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id
        """
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    m = np.array([r[1] for r in rows], float)
    labels = {r[0]: r[2] for r in rows}
    norms = np.linalg.norm(m, axis=1)
    topk = {}
    for qi, qid in enumerate(ids):
        if qid >= 10:
            continue
        cos = (m @ m[qi]) / (norms * norms[qi])
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != qid),
            key=lambda i: (-cos[i], ids[i]),
        )[:TOPK]
        topk[qid] = [(int(ids[i]), float(cos[i])) for i in order]
    return topk, labels


def test_ann_cosine_topk_reference(spark, sf_dir):
    topk, _labels = _brute_topk(sf_dir)
    rows = SPECS["ann_cosine_topk"].builder(spark, sf_dir).collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["score"])
        )
    assert set(got) == set(topk)
    for qid, want in topk.items():
        mine = sorted(got[qid])
        assert len(mine) == TOPK
        for (rank, nid, score), (wnid, wcos) in zip(mine, want):
            assert nid == wnid, (qid, rank)
            assert abs(score - wcos) < 2e-6


def test_knn_accuracy_reference(spark, sf_dir):
    topk, labels = _brute_topk(sf_dir)
    rows = {
        r["query_id"]: r
        for r in SPECS["knn_label_accuracy"].builder(spark, sf_dir).collect()
    }
    for qid, nbrs in topk.items():
        votes = Counter(labels[nid] for nid, _c in nbrs)
        # majority with (count desc, label asc) tie-break
        pred, n = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        r = rows[qid]
        assert r["pred_label"] == pred
        assert r["n_votes"] == n
        assert r["true_label"] == labels[qid]
        assert r["correct"] == (pred == labels[qid])


def test_ndcg_reference(spark, sf_dir):
    topk, labels = _brute_topk(sf_dir)
    rows = {
        r["query_id"]: r
        for r in SPECS["ndcg_label_relevance"].builder(spark, sf_dir).collect()
    }
    for qid, nbrs in topk.items():
        rels = [1 if labels[nid] == labels[qid] else 0 for nid, _c in nbrs]
        dcg = sum(
            rel / math.log2(pos + 1)
            for pos, rel in enumerate(rels, start=1)
        )
        n_rel = sum(rels)
        if qid not in rows:
            assert n_rel == 0
            continue
        r = rows[qid]
        assert r["n_rel"] == n_rel
        assert abs(r["dcg_r6"] - dcg) < 1e-4
        if n_rel > 0:
            idcg = sum(
                1 / math.log2(pos + 1) for pos in range(1, n_rel + 1)
            )
            assert abs(r["ndcg_r6"] - dcg / idcg) < 1e-4
