"""Text-retrieval operators over ``documents`` ([EXT] — LLM-pipeline
surface beyond the reference, per the build brief): an inverted-index
build primitive and BM25 ranked retrieval.

Scale posture: the inverted index is the canonical map-side tokenize +
one groupBy-on-token shuffle — posting-list stats never pass through a
single task, and the top-k cut is a distributed TakeOrdered, not a
global window. BM25 is fully map-side per document (the per-term tf is
an array fold over the token array, no explode/shuffle), with the
corpus statistics (N, avgdl, per-term df) entering as a broadcast
1-row aggregate — the same scalar-subquery plan as
``acctbal_vs_global_avg``. At 100 TB the only shuffle is the final
bounded top-k.

Oracle float contract: ``dl`` sums are integers (exact in doubles in
any order), so ``avgdl`` is bit-identical across engines; the per-term
BM25 contributions are written in the same textual arithmetic order in
both engines and summed left-associatively, so the only cross-engine
divergence is libm ``ln`` ulps — healed by ranking on the ROUNDED
score with doc_id tie-break (the ``tfidf_top_terms`` precedent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.functions.compat import round_compat
from aws_etl_global_footprint_network_spark.functions.text import tokens, tokens_sql
from aws_etl_global_footprint_network_spark.registry import register
from aws_etl_global_footprint_network_spark.sources.readers import read_testdata, spread

# BM25 constants (Robertson/Spärck Jones defaults) and a fixed query —
# terms chosen to exist in the synthetic corpus with distinct df.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20
QUERY_TERMS = ("spark", "join", "window")

POSTINGS_TOP = 15


def _bm25_contrib_sql(term: str) -> str:
    """One term's BM25 contribution — textual twin of :func:`_bm25_contrib`."""
    return (
        f"ln((n - df_{term} + 0.5) / (df_{term} + 0.5) + 1.0)"
        f" * (tf_{term} * {BM25_K1 + 1.0})"
        f" / (tf_{term} + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl / avgdl))"
    )


def _bm25_contrib(term: str) -> Column:
    """Spark twin of :func:`_bm25_contrib_sql` — identical arithmetic
    shape so the IEEE fold order matches the oracle's."""
    n, df, tf, dl, avgdl = (
        F.col("n"),
        F.col(f"df_{term}"),
        F.col(f"tf_{term}"),
        F.col("dl"),
        F.col("avgdl"),
    )
    idf = F.log((n - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0))
    return (
        idf
        * (tf * F.lit(BM25_K1 + 1.0))
        / (tf + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dl / avgdl))
    )


_TF_SQL = ",\n             ".join(
    f"len(list_filter(toks, x -> x = '{t}')) AS tf_{t}" for t in QUERY_TERMS
)
_DF_SQL = ",\n             ".join(
    f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in QUERY_TERMS
)
_SCORE_SQL = " + ".join(f"({_bm25_contrib_sql(t)})" for t in QUERY_TERMS)


@register(
    "bm25_topk",
    f"""
    WITH t AS (
      SELECT doc_id, {tokens_sql('text')} AS toks FROM documents),
    d AS (
      SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
             {_TF_SQL}
      FROM t),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl,
             {_DF_SQL}
      FROM d),
    scored AS (
      SELECT doc_id, dl,
             ROUND(({_SCORE_SQL}) * 1e6, 0) / 1e6 AS score
      FROM d CROSS JOIN stats)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(dl AS BIGINT) AS doc_len, score
    FROM scored WHERE score > 0
    ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}
    """,
    f"BM25 (k1={BM25_K1}, b={BM25_B}) top-{BM25_TOPK} documents for the"
    f" fixed query {QUERY_TERMS}; per-term tf is a map-side array fold"
    " (no explode), corpus stats are a broadcast 1-row aggregate, and"
    " the cut is ORDER BY rounded score + doc_id LIMIT k",
    tags=("text", "retrieval"),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked retrieval without an index: per-document tf for a short
    query is cheaper as an array fold than an explode+shuffle, so the
    whole scoring pass is map-side codegen. The final top-k compiles
    to TakeOrderedAndProject (each task keeps k rows, driver merges
    k·tasks) — never a global sort. Ranking runs on the ROUNDED score
    so both engines order identically despite last-ulp ln()
    differences (same contract as ``tfidf_top_terms``)."""
    d = spread(read_testdata(spark, sf_dir, "documents")).select(
        "doc_id", tokens("text").alias("toks")
    )
    per_doc = d.select(
        "doc_id",
        F.size("toks").cast("double").alias("dl"),
        *[
            F.size(F.filter("toks", lambda x: x == F.lit(t))).alias(f"tf_{t}")
            for t in QUERY_TERMS
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in QUERY_TERMS
        ],
    )
    score = _bm25_contrib(QUERY_TERMS[0])
    for t in QUERY_TERMS[1:]:
        score = score + _bm25_contrib(t)
    scored = per_doc.crossJoin(F.broadcast(stats)).select(
        "doc_id", "dl", round_compat(score, 6).alias("score")
    )
    return (
        scored.filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOPK)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("dl").cast("bigint").alias("doc_len"),
            "score",
        )
    )


@register(
    "inverted_postings_stats",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({tokens_sql('text')}) AS token FROM documents)
    SELECT token,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
           CAST(COUNT(*) AS BIGINT) AS cf,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM tok GROUP BY token
    ORDER BY df DESC, token LIMIT {POSTINGS_TOP}
    """,
    f"inverted-index build primitive: posting-list stats (df, cf,"
    f" doc-id range) per token, top-{POSTINGS_TOP} by document"
    " frequency — one tokenize + one groupBy-on-token shuffle",
    tags=("text", "retrieval"),
)
def inverted_postings_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index-build shape: map-side tokenize/explode, one shuffle
    keyed on token (partial aggregation combines map-side), bounded
    TakeOrdered cut. All output columns are integers — exact parity
    with no rounding contract needed. At 100 TB the token key is
    zipf-skewed; countDistinct's partial aggregation keeps hot tokens
    from concentrating raw postings in one task."""
    d = spread(read_testdata(spark, sf_dir, "documents"))
    tok = d.select("doc_id", F.explode(tokens("text")).alias("token"))
    return (
        tok.groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("cf"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy(F.col("df").desc(), "token")
        .limit(POSTINGS_TOP)
        .select(
            "token",
            F.col("df").cast("bigint").alias("df"),
            F.col("cf").cast("bigint").alias("cf"),
            F.col("first_doc").cast("bigint").alias("first_doc"),
            F.col("last_doc").cast("bigint").alias("last_doc"),
        )
    )
