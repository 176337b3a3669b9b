"""Dedup operator QUALITY on planted near-duplicates: MinHash-LSH
must recover high-Jaccard pairs (recall), and everything it reports
must really be above threshold (precision = 1.0 by construction —
candidates are exact-verified). Also pins salted-join equivalence."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
)

VOCAB = [f"w{i:03d}" for i in range(400)]


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    """A documents table with 25 planted near-dup pairs (one ~95%
    shingle-overlap twin per base doc) plus 50 unrelated docs."""
    rng = random.Random(1234)
    rows = []
    doc_id = 0

    def add(text):
        nonlocal doc_id
        rows.append((doc_id, text, "en", "synth", len(text)))
        doc_id += 1

    for _ in range(25):
        base = [rng.choice(VOCAB) for _ in range(80)]
        twin = list(base)
        for _ in range(3):  # mutate 3 of 80 tokens -> jaccard ~0.9
            twin[rng.randrange(80)] = rng.choice(VOCAB)
        add(" ".join(base))
        add(" ".join(twin))
    for _ in range(50):
        add(" ".join(rng.choice(VOCAB) for _ in range(80)))

    d = tmp_path_factory.mktemp("planted")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_minhash_lsh_recall_on_planted_pairs(spark, planted_dir):
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_minhash_lsh(spark, planted_dir).collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(25)}
    found = planted & set(got)
    recall = len(found) / len(planted)
    # jaccard ~0.9 twins: P(candidate) = 1-(1-s^2)^4 ≈ 0.999 per pair
    assert recall >= 0.9, (recall, sorted(planted - set(got)))
    for pair in found:
        assert got[pair] >= 0.2


def test_lsh_matches_exact_ground_truth(spark, planted_dir):
    """Every LSH-reported pair must appear in the exact n-gram scan
    with the same jaccard (precision 1.0; both operators share the
    shingle definition)."""
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_ngram_jaccard(spark, planted_dir).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_minhash_lsh(spark, planted_dir).collect()
    }
    for pair, j in lsh.items():
        if max(pair) < 150:  # ngram ground truth is key-bounded
            assert pair in exact and exact[pair] == j


def test_simhash_hamming_close_for_twins(spark, planted_dir):
    sigs = {r.doc_id: r.simhash for r in dedup_simhash(spark, planted_dir).collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    twin_d = [ham(sigs[2 * i], sigs[2 * i + 1]) for i in range(25)]
    rng = random.Random(5)
    unrel_d = [
        ham(sigs[rng.randrange(0, 50)], sigs[rng.randrange(50, 100)])
        for _ in range(50)
    ]
    # twins must be far closer in hamming space than unrelated docs
    assert max(twin_d) < min(unrel_d), (max(twin_d), min(unrel_d))


def test_salted_join_equals_plain_join(spark, sf_dir):
    from aws_etl_global_footprint_network_spark.operators.skew import salted_join
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    li = read_testdata(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = (
        read_testdata(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    plain = (
        li.join(o, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    salted = (
        salted_join(li, o, "l_orderkey", n_salt=4)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    a = {r.o_orderpriority: (r.n, r.q) for r in plain.collect()}
    b = {r.o_orderpriority: (r.n, r.q) for r in salted.collect()}
    assert a == b


def test_vectorized_topk_matches_exact(spark, sf_dir_mid):
    """The numpy fast path must agree with the deterministic JVM-fold
    operator (same neighbors/ranks; scores to 1e-9)."""
    from aws_etl_global_footprint_network_spark.registry import load_all

    specs = load_all()
    exact = {
        (r.query_id, r.rank): (r.neighbor_id, r.score)
        for r in specs["ann_cosine_topk"].builder(spark, sf_dir_mid).collect()
    }
    fast = {
        (r.query_id, r.rank): (r.neighbor_id, r.score)
        for r in specs["ann_cosine_topk_vectorized"].builder(spark, sf_dir_mid).collect()
    }
    assert set(exact) == set(fast)
    for k in exact:
        assert exact[k][0] == fast[k][0], (k, exact[k], fast[k])
        # exact operator rounds to 6 decimals; fast path is unrounded
        assert abs(exact[k][1] - fast[k][1]) < 6e-7


def test_semdedup_adaptive_cells_parity_and_twin_safety(spark, sf_dir):
    # force extra=2 cell bits on the 500-vector corpus (nref=125):
    # (a) the masked-bits oracle and literal-bits Spark plan agree at a
    #     NON-default geometry; (b) added sign bits never split a
    #     planted twin pair (the noise factor is strictly positive), so
    #     the dropped set is invariant under cell growth.
    from aws_etl_global_footprint_network_spark.operators.curation import (
        _sem_oracle,
        _semantic_dedup_drop,
    )
    from tests.oracle_harness import compare, duck_connection

    df = _semantic_dedup_drop(spark, sf_dir, nref=125)
    con = duck_connection(sf_dir)
    try:
        res = compare("semdedup_forced", df, _sem_oracle(125), con)
        assert res.ok, res.detail
    finally:
        con.close()
    from aws_etl_global_footprint_network_spark.registry import load_all

    default = {
        r.vec_id
        for r in load_all()["semantic_dedup_drop"].builder(spark, sf_dir).collect()
    }
    forced = {r.vec_id for r in df.collect()}
    assert forced == default


def test_minhash_kernel_signatures_match_jvm_reference(spark, sf_dir):
    """Round-13 pin: the Arrow-kernel signature pass
    (`_minhash_sig_np`) must be BIT-IDENTICAL to the JVM reference
    chain (shingle explode -> hash31 -> K-min groupBy), including the
    distinct-shingle set size — the invariant the banded candidate
    generation and the Jaccard verify denominators rest on."""
    from pyspark.sql import functions as F

    from aws_etl_global_footprint_network_spark.operators import dedup

    tok = dedup._shingle_sets(spark, sf_dir).persist()
    jvm = {
        r["doc_id"]: tuple(r)[1:]
        for r in tok.select("doc_id", dedup.hash31("token").alias("h"))
        .groupBy("doc_id")
        .agg(
            *[
                F.min(dedup.minhash_perm(F.col("h"), i)).alias(f"m{i}")
                for i in range(dedup.MINHASH_K)
            ],
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    tok.unpersist()
    kern = {
        r["doc_id"]: tuple(r)[1:]
        for r in dedup._minhash_sig_np(spark, sf_dir).collect()
    }
    assert jvm == kern


def test_simhash_kernel_matches_jvm_reference(spark, sf_dir):
    """Round-13 pin: the Arrow-kernel simhash (tokenize + md5 + bit
    votes per document inside the kernel) must be BIT-IDENTICAL to
    the JVM reference chain (token explode -> md5_hash60 -> 60 SUM
    votes -> bit assembly)."""
    from pyspark.sql import functions as F

    from aws_etl_global_footprint_network_spark.operators import dedup

    SIMHASH_BITS = 60
    tok = dedup._token_sets(spark, sf_dir)
    h = tok.select("doc_id", dedup.md5_hash60("token").alias("h"))
    vote = [
        F.sum(
            F.when(
                F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    votes = h.groupBy("doc_id").agg(*vote)
    bits = [
        F.when(
            F.col(f"v{j}") > 0, F.shiftleft(F.lit(1).cast("bigint"), j)
        ).otherwise(F.lit(0).cast("bigint"))
        for j in range(SIMHASH_BITS)
    ]
    simhash = bits[0]
    for b in bits[1:]:
        simhash = simhash + b
    jvm = {
        r["doc_id"]: r["s"]
        for r in votes.select("doc_id", simhash.alias("s")).collect()
    }
    kern = {
        r["doc_id"]: r["simhash"]
        for r in dedup.dedup_simhash(spark, sf_dir).collect()
    }
    assert jvm == kern
