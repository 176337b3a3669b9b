"""A/B for the round-12 continuation reworks, one warm session,
alternating old/new per round, CacheScope released between runs:

  * tfidf_top_terms          — df re-explode + COUNT(DISTINCT) vs
                               df derived from the persisted tf grain
  * heavy_hitters_twopass    — tokenize 3x vs cached doc-level arrays
  * matryoshka_topk_overlap  — 3 interpreted-HOF brute-force passes vs
                               one Arrow/numpy pass scoring all prefixes
  * spearman_rank_corr       — five DECIMAL row sums vs joint-only row
                               sum + value-table marginal moments

    python scripts/ab_r12c.py [--dir /tmp/sf1] [--rounds 3]
      [--only NAME]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_etl_global_footprint_network_spark.functions.cache import CacheScope, release_all
from aws_etl_global_footprint_network_spark.functions.compat import round_compat
from aws_etl_global_footprint_network_spark.functions.text import tokens
from aws_etl_global_footprint_network_spark.registry import load_all
from aws_etl_global_footprint_network_spark.session import get_spark
from aws_etl_global_footprint_network_spark.sources.readers import read_testdata, spread


def old_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_etl_global_footprint_network_spark.operators.ml_prep import TFIDF_TOP

    d = spread(read_testdata(spark, sf_dir, "documents"))
    tok = d.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    idf = F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "token", "tf",
            round_compat(F.col("tf") * idf, 6).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TFIDF_TOP)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "token",
            F.col("tf").cast("bigint").alias("tf"),
            "score",
            "rank",
        )
    )


def old_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_etl_global_footprint_network_spark.operators.sketches import (
        SUPPORT_PCT,
        misra_gries_candidates,
    )

    d = spread(read_testdata(spark, sf_dir, "documents"))
    stream = d.select(F.explode(tokens("text")).alias("token"))
    total = stream.agg(F.count(F.lit(1)).alias("n"))
    candidates = misra_gries_candidates(stream, "token")
    counted = (
        stream.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
    )
    return counted.filter(
        100 * F.col("n_occurrences") >= SUPPORT_PCT * F.col("n")
    ).select(
        "token",
        "n_occurrences",
        round_compat(F.col("n_occurrences") / F.col("n"), 6).alias("support"),
    )


def old_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_etl_global_footprint_network_spark.operators.similarity_vectorized import (
        MRL_DIMS,
        MRL_K,
        MRL_QUERIES,
    )
    from aws_etl_global_footprint_network_spark.functions.vectors import (
        as_double_array,
        dot,
        norm,
    )

    tops = {}
    for d in MRL_DIMS:
        emb = spread(read_testdata(spark, sf_dir, "embeddings")).select(
            "vec_id", F.slice(as_double_array("embedding"), 1, d).alias("e")
        ).select("vec_id", "e", norm("e").alias("nrm"))
        q = emb.filter(F.col("vec_id") < MRL_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qnrm"),
        )
        scored = emb.join(
            F.broadcast(q), F.col("query_id") != F.col("vec_id")
        ).select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot("qe", "e") / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), "neighbor_id"
        )
        tops[d] = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(f"rn <= {MRL_K}")
            .select("query_id", "neighbor_id")
        )
    full = tops[MRL_DIMS[-1]]
    parts = []
    for d in MRL_DIMS:
        parts.append(
            tops[d].join(full, ["query_id", "neighbor_id"]).agg(
                F.lit(d).cast("int").alias("dim"),
                F.count(F.lit(1)).cast("bigint").alias("overlap_pairs"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "dim",
        "overlap_pairs",
        round_compat(
            F.col("overlap_pairs") / float(MRL_QUERIES * MRL_K), 6
        ).alias("overlap_at_k"),
    )


def old_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_etl_global_footprint_network_spark.functions.ranking import (
        ADAPTIVE_WINDOW_CAP,
        adaptive_cumsum,
    )

    scope = CacheScope("ab_old_spearman")
    li = read_testdata(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    v = scope.persist(
        li.select(
            "flag",
            F.explode(
                F.create_map(
                    F.lit("x"), F.col("x"), F.lit("y"), F.col("y")
                )
            ).alias("var", "val"),
        )
        .groupBy("flag", "var", "val")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    n_vals = {r["var"]: r["n"] for r in
              v.groupBy("var").agg(F.count(F.lit(1)).alias("n")).collect()}

    def rank_table(var: str, col: str, out: str) -> DataFrame:
        t = v.filter(F.col("var") == var).select(
            "flag", F.col("val").alias(col), "t"
        )
        c = adaptive_cumsum(
            t, "flag", [F.col(col)], {"cb": "t"}, scope, n_rows=n_vals[var]
        )
        return c.select(
            "flag", col, (2 * F.col("cb") + F.col("t") + 1).alias(out)
        )

    vx = rank_table("x", "x", "r2x")
    vy = rank_table("y", "y", "r2y")
    if n_vals["x"] <= ADAPTIVE_WINDOW_CAP:
        vx = F.broadcast(vx)
    if n_vals["y"] <= ADAPTIVE_WINDOW_CAP:
        vy = F.broadcast(vy)
    ranked = li.join(vx, ["flag", "x"]).join(vy, ["flag", "y"])
    dec = "decimal(38,0)"
    r2xd, r2yd = F.col("r2x").cast(dec), F.col("r2y").cast(dec)
    s = ranked.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(r2xd).alias("s1"),
        F.sum(r2yd).alias("s2"),
        F.sum(r2xd * r2xd).alias("s11"),
        F.sum(r2yd * r2yd).alias("s22"),
        F.sum(r2xd * r2yd).alias("s12"),
    )
    nd = F.col("n").cast("double")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    d1 = nd * F.col("s11").cast("double") - s1d * s1d
    d2 = nd * F.col("s22").cast("double") - s2d * s2d
    num = nd * F.col("s12").cast("double") - s1d * s2d
    return s.select(
        F.col("flag").alias("l_returnflag"),
        F.col("n").cast("bigint").alias("n"),
        F.when(
            (d1 > 0) & (d2 > 0),
            round_compat(num / F.sqrt(d1 * d2), 6),
        ).alias("spearman_r6"),
    )


def old_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_etl_global_footprint_network_spark.operators.behavioral import (
        KM_CENSOR_MONTHS,
    )

    month_idx = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    u = (
        read_testdata(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min(month_idx).alias("first_m"),
            F.max(month_idx).alias("last_m"),
        )
    )
    h = u.agg(F.max("last_m").alias("horizon"))
    lt = u.crossJoin(F.broadcast(h)).select(
        (F.col("last_m") - F.col("first_m")).alias("t"),
        F.when(
            F.col("horizon") - F.col("last_m") <= KM_CENSOR_MONTHS, F.lit(0)
        )
        .otherwise(F.lit(1))
        .alias("died"),
    )
    tot = lt.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    byt = lt.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("leaving"),
        F.sum("died").cast("bigint").alias("d"),
    )
    wo = Window.orderBy("t")
    r = byt.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("n_users")
        - F.coalesce(
            F.sum("leaving").over(
                wo.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    absorbed = F.max(
        F.when(F.col("d") >= F.col("n_risk"), F.lit(1)).otherwise(F.lit(0))
    ).over(wo.rowsBetween(Window.unboundedPreceding, 0))
    s = r.withColumn(
        "surv",
        F.when(absorbed == 1, F.lit(0.0)).otherwise(
            F.exp(
                F.sum(F.log(1.0 - F.col("d") * 1.0 / F.col("n_risk"))).over(
                    wo.rowsBetween(Window.unboundedPreceding, 0)
                )
            )
        ),
    )
    return s.select(
        F.col("t").cast("bigint").alias("tenure_months"),
        F.col("d").cast("bigint").alias("churned"),
        F.col("n_risk").cast("bigint").alias("n_at_risk"),
        round_compat(F.col("surv"), 6).alias("survival_r6"),
    )


def old_orders_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_testdata(spark, sf_dir, "orders")
    monthly = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m_idx"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "cents"
        )
    )
    cur, prev = monthly.alias("cur"), monthly.alias("prev")
    return cur.join(
        prev, F.col("prev.m_idx") == F.col("cur.m_idx") - 12
    ).select(
        F.col("cur.month").alias("month"),
        (F.col("cur.cents") / 100.0).alias("revenue"),
        (F.col("prev.cents") / 100.0).alias("revenue_prior_year"),
        round_compat(
            F.col("cur.cents") * 1.0 / F.col("prev.cents") - 1.0, 6
        ).alias("yoy_growth_r6"),
    )


def old_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_etl_global_footprint_network_spark.operators.analytics_r8 import (
        seasonal_daily_components,
    )
    from aws_etl_global_footprint_network_spark.operators.analytics_r8f import SA_Z

    resid = seasonal_daily_components(spark, sf_dir).select(
        "day", "cents", F.col("resid").alias("r")
    )
    mu = resid.agg(F.avg("r").alias("mu"))
    mom = (
        resid.crossJoin(F.broadcast(mu))
        .agg(
            F.max("mu").alias("mu"),
            F.sqrt(
                F.sum((F.col("r") - F.col("mu")) * (F.col("r") - F.col("mu")))
                / (F.count(F.lit(1)) - 1)
            ).alias("sd"),
        )
    )
    z = (F.col("r") - F.col("mu")) / F.col("sd")
    return (
        resid.crossJoin(F.broadcast(mom))
        .filter(F.abs(z) > SA_Z)
        .select(
            "day",
            round_compat(F.col("cents") / 100.0, 4).alias("total_value_r4"),
            round_compat(z, 6).alias("resid_z_r6"),
        )
        .orderBy("day")
    )


def old_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_etl_global_footprint_network_spark.operators.corpus_prep import (
        EMAIL_RE,
        IPV4_RE,
    )

    d = spread(read_testdata(spark, sf_dir, "documents"))
    planted = d.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit("."),
                    (F.col("doc_id") % 250).cast("string"),
                ),
            ).otherwise(""),
        ).alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )
    scanned = planted.select(
        "doc_id",
        "source",
        "text",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(IPV4_RE), 0)).alias("n_ips"),
        clean.alias("clean"),
    )
    return scanned.filter((F.col("n_emails") > 0) | (F.col("n_ips") > 0)).select(
        "doc_id",
        "source",
        F.col("n_emails").cast("int").alias("n_emails"),
        F.col("n_ips").cast("int").alias("n_ips"),
        F.length("text").cast("int").alias("raw_len"),
        F.length("clean").cast("int").alias("clean_len"),
        F.md5("clean").alias("clean_md5"),
    )


OLD = {
    "tfidf_top_terms": old_tfidf,
    "heavy_hitters_twopass": old_heavy_hitters,
    "matryoshka_topk_overlap": old_matryoshka,
    "spearman_rank_corr": old_spearman,
    "kaplan_meier_churn": old_kaplan_meier,
    "orders_yoy_growth": old_orders_yoy,
    "seasonal_anomaly_days": old_seasonal_anomaly,
    "pii_redaction": old_pii_redaction,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    specs = load_all()
    spark = get_spark(app_name="ab-r12c")
    names = [args.only] if args.only else list(OLD)
    # codegen warmup at sf0.001
    warm = os.path.join(os.path.dirname(os.path.normpath(args.dir)), "sf0.001")
    warm = warm if os.path.isdir(warm) else "/root/testdata/sf0.001"
    for name in names:
        OLD[name](spark, warm).count()
        specs[name].builder(spark, warm).count()
    release_all()

    for name in names:
        results = {"old": [], "new": []}
        hashes = {}
        for r in range(args.rounds):
            for label, fn in (
                ("old", OLD[name]), ("new", specs[name].builder)
            ) if r % 2 == 0 else (
                ("new", specs[name].builder), ("old", OLD[name])
            ):
                t0 = time.perf_counter()
                df = fn(spark, args.dir)
                rows = df.collect()
                dt = time.perf_counter() - t0
                results[label].append(round(dt, 2))
                hashes[label] = sorted(
                    tuple(str(c) for c in row) for row in rows
                )
                release_all()
        same = hashes["old"] == hashes["new"]
        print(
            f"{name}: old {results['old']} new {results['new']}"
            f" rows_match={same} n={len(hashes['new'])}"
        )


if __name__ == "__main__":
    main()
