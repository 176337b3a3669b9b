"""A/B: token_pmi_bigrams two-join form (current) vs one-join
two-row-per-bigram form (round-10 verdict item 3), same warm session,
alternating runs. Usage:

    python scripts/ab_pmi.py [--dir /tmp/sf1] [--rounds 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.functions.cache import CacheScope
from aws_etl_global_footprint_network_spark.functions.compat import round_compat
from aws_etl_global_footprint_network_spark.functions.text import tokens
from aws_etl_global_footprint_network_spark.operators.text_analysis import (
    PMI_MIN_PAIR,
)
from aws_etl_global_footprint_network_spark.registry import load_all
from aws_etl_global_footprint_network_spark.session import get_spark
from aws_etl_global_footprint_network_spark.sources.readers import read_testdata, spread


def one_join_variant(spark, sf_dir):
    """Two rows per bigram (side a / side b), ONE join with the unigram
    table on a single token key, then re-group by bigram to pivot the
    two marginals back onto one row."""
    d = spread(read_testdata(spark, sf_dir, "documents"))
    base = d.select("doc_id", tokens("text").alias("t"))
    uni = base.select(F.explode("t").alias("tok"))
    scope = CacheScope("ab_pmi_onejoin")
    ucnt = scope.persist(uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    bg = base.filter(F.size("t") >= 2).select(
        "t",
        F.explode(F.sequence(F.lit(1), F.size("t") - F.lit(1))).alias("i"),
    ).select(
        F.concat_ws(
            " ",
            F.element_at("t", F.col("i")),
            F.element_at("t", F.col("i") + F.lit(1)),
        ).alias("bigram")
    )
    bcnt = scope.persist(
        bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c_pair"))
    )
    tu1 = ucnt.agg(F.sum("c").cast("bigint").alias("t_uni"))
    tb1 = bcnt.agg(F.sum("c_pair").cast("bigint").alias("t_bi"))
    b = bcnt.filter(F.col("c_pair") >= PMI_MIN_PAIR)
    # two rows per bigram: (bigram, c_pair, side, tok)
    two = b.select(
        "bigram",
        "c_pair",
        F.explode(
            F.create_map(
                F.lit("a"),
                F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)),
                F.lit("b"),
                F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)),
            )
        ).alias("side", "tok"),
    )
    joined = two.join(ucnt, "tok")
    piv = joined.groupBy("bigram", "c_pair").agg(
        F.max(F.when(F.col("side") == "a", F.col("c"))).alias("c_a"),
        F.max(F.when(F.col("side") == "b", F.col("c"))).alias("c_b"),
    )
    pmi = (
        F.log(F.col("c_pair") * 1.0 / F.col("t_bi"))
        - F.log(F.col("c_a") * 1.0 / F.col("t_uni"))
        - F.log(F.col("c_b") * 1.0 / F.col("t_uni"))
    )
    return (
        piv.crossJoin(F.broadcast(tu1))
        .crossJoin(F.broadcast(tb1))
        .select(
            "bigram",
            F.col("c_pair").cast("bigint").alias("c_pair"),
            F.col("c_a").cast("bigint").alias("c_a"),
            F.col("c_b").cast("bigint").alias("c_b"),
            round_compat(pmi, 6).alias("pmi"),
        )
    )


def combined_variant(spark, sf_dir):
    """ONE tokenize+explode pass emits both unigram and bigram grams
    (kind-tagged), ONE shuffle counts them, then the one-join marginal
    attach. Corpus work halves vs the two independent explodes."""
    d = spread(read_testdata(spark, sf_dir, "documents"))
    base = d.select(tokens("text").alias("t"))
    scope = CacheScope("ab_pmi_combined")
    grams = base.select(
        F.explode(
            F.concat(
                F.transform("t", lambda x: F.concat(F.lit("u"), x)),
                F.zip_with(
                    F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
                    F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
                    lambda a, b: F.concat_ws(" ", F.concat(F.lit("b"), a), b),
                ),
            )
        ).alias("g")
    )
    cnt = scope.persist(grams.groupBy("g").agg(F.count(F.lit(1)).alias("c")))
    ucnt = cnt.select(F.expr("substring(g, 2)").alias("tok"), "c").where(
        F.col("g").startswith("u") & ~F.col("g").contains(" ")
    )
    # wrong split: a unigram containing a space impossible (whitespace
    # tokenizer), bigrams always contain the separator
    bcnt = cnt.where(F.col("g").contains(" ")).select(
        F.expr("substring(g, 2)").alias("bigram"),
        F.col("c").alias("c_pair"),
    )
    ucnt = scope.persist(ucnt)
    bcnt = scope.persist(bcnt)
    tu1 = ucnt.agg(F.sum("c").cast("bigint").alias("t_uni"))
    tb1 = bcnt.agg(F.sum("c_pair").cast("bigint").alias("t_bi"))
    b = bcnt.filter(F.col("c_pair") >= PMI_MIN_PAIR)
    two = b.select(
        "bigram",
        "c_pair",
        F.explode(
            F.create_map(
                F.lit("a"),
                F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)),
                F.lit("b"),
                F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)),
            )
        ).alias("side", "tok"),
    )
    joined = two.join(ucnt, "tok")
    piv = joined.groupBy("bigram", "c_pair").agg(
        F.max(F.when(F.col("side") == "a", F.col("c"))).alias("c_a"),
        F.max(F.when(F.col("side") == "b", F.col("c"))).alias("c_b"),
    )
    pmi = (
        F.log(F.col("c_pair") * 1.0 / F.col("t_bi"))
        - F.log(F.col("c_a") * 1.0 / F.col("t_uni"))
        - F.log(F.col("c_b") * 1.0 / F.col("t_uni"))
    )
    return (
        piv.crossJoin(F.broadcast(tu1))
        .crossJoin(F.broadcast(tb1))
        .select(
            "bigram",
            F.col("c_pair").cast("bigint").alias("c_pair"),
            F.col("c_a").cast("bigint").alias("c_a"),
            F.col("c_b").cast("bigint").alias("c_b"),
            round_compat(pmi, 6).alias("pmi"),
        )
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()
    specs = load_all()
    spark = get_spark(app_name="ab-pmi")
    cur = specs["token_pmi_bigrams"].builder
    # warm both shapes
    cur(spark, "/root/testdata/sf0.001").count()
    one_join_variant(spark, "/root/testdata/sf0.001").count()
    combined_variant(spark, "/root/testdata/sf0.001").count()
    # equality check at sf0.01
    a = cur(spark, "/root/testdata/sf0.01").orderBy("bigram").collect()
    b = one_join_variant(spark, "/root/testdata/sf0.01").orderBy("bigram").collect()
    c = combined_variant(spark, "/root/testdata/sf0.01").orderBy("bigram").collect()
    assert a == b, "one-join differs"
    assert a == c, "combined differs"
    print("# variants agree at sf0.01", flush=True)
    for r in range(args.rounds):
        for label, fn in (("two-join", cur), ("one-join", one_join_variant), ("combined", combined_variant)):
            # identical ucnt/bcnt logical plans would otherwise ride
            # the OTHER variant's still-cached persists
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = fn(spark, args.dir).count()
            print(
                f"round {r} {label}: {time.perf_counter() - t0:.3f}s ({n} rows)",
                flush=True,
            )
