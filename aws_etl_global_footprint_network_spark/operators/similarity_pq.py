"""Product quantization ([EXT]): the memory-compression half of
large-scale ANN (Jégou, Douze & Schmid 2011, "Product Quantization
for Nearest Neighbor Search" — the technique behind FAISS's IVFADC).

A 64-dim float vector (256 bytes) is split into M=16 subvectors, each
quantized to one of K=16 per-subspace codebook entries: the whole
vector compresses to 16 × 4 bits = 8 bytes (32×), and approximate
distances are computed against the CODES via per-query lookup tables
without ever touching the original vectors. At 100 TB of embeddings
this is the difference between an index that fits in cluster memory
and one that does not.

Four operators, each oracle-paired:

- ``pq_train_codebooks``: per-subspace k-means (deterministic seed
  init from the first K vectors + one Lloyd refinement round, the
  ``ivf_kmeans_train`` contract: per-round rounding pins both engines
  to identical codebooks).
- ``pq_codes``: every vector's packed 64-bit PQ code (two 32-bit
  words) + its quantization error — the compressed corpus
  representation.
- ``pq_adc_topk``: asymmetric-distance search — the query stays
  exact, the corpus is codes; distance ≈ sum over subspaces of a
  (query, subspace, code) lookup table, so scoring N vectors costs
  N·M table lookups instead of N·DIM multiplications.
- ``pq_adc_rerank_topk``: ADC shortlist + exact re-rank of the top
  RERANK_R — the FAISS refine pipeline; measured recall@5 0.84 at
  sf0.1 on the isotropic (worst-case) corpus.

Scale posture: codebooks are M·K = 128 rows (broadcast); training is
one equi-join + argmin aggregate (MIN(STRUCT(d, code)), map-side
partial) + grouped mean per round (the Lloyd shape); encoding is
map-only against the broadcast codebook; ADC
search joins the code table to a broadcast LUT on (subspace, code) —
all equi-joins, no pairwise vector math on the corpus side. Compose
with the IVF coarse quantizer (``ivf_topk_probe``) to prune which
codes are scanned per query — classic IVFADC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.functions.cache import CacheScope
from aws_etl_global_footprint_network_spark.functions.compat import round_compat
from aws_etl_global_footprint_network_spark.functions.vectors import as_double_array
from aws_etl_global_footprint_network_spark.registry import register
from aws_etl_global_footprint_network_spark.sources.readers import (
    read_testdata,
    spread,
)

DIM = 64
# Geometry: 16 subspaces x 4 dims, 16 codes each -> 16 x 4 bits = one
# packed 64-bit code per vector (32x compression). For isotropic data
# the expected distortion is D * K^(-2/subdim): at fixed code budget,
# 16x(4-dim, 4-bit) halves the distortion of 8x(8-dim, 4-bit)
# (64*16^-0.5 = 16 vs 64*16^-0.25 = 32), and measured recall@5 vs the
# exact top-k doubled when this was retuned (bench/test pin it).
M = 16  # subspaces
SUBDIM = DIM // M
K = 16  # codes per subspace -> 4 bits
CODE_BITS = 4
PQ_ROUND = 6  # centroid rounding, pins both engines (CENTROID_ROUND contract)
N_QUERIES = 10
TOPK = 5
# ADC-shortlist size for the exact re-rank stage (FAISS "refine"):
# measured at sf0.1, the ADC top-50 contains 0.84 of the exact top-5
# on the isotropic corpus (0.86 at R=100 — the knee is ~50).
RERANK_R = 50


# ---------------------------------------------------------------- SQL
def _sq_sql(a: str, b: str) -> str:
    """Sequential-fold squared distance between two DuckDB lists."""
    return (
        f"list_sum(list_transform(range(1, {SUBDIM} + 1),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


def _pq_prefix_sql() -> str:
    """Shared CTE chain: subvectors -> seed codebook -> one Lloyd
    round -> refined codebook ``cb1`` -> final assignment ``codesr``
    (vec_id, m, code, d).

    The multiply-referenced stages are MATERIALIZED (round-12 oracle
    audit, the _minhash_oracle lesson): DuckDB inlines plain CTEs per
    reference, so subv/cb0/cb1 (4-8 refs in the ADC consumers) re-ran
    the whole training chain each time — the PQ-family oracles were
    40-70 s at sf1 and would have stalled the sf10 sweep."""
    return f"""
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    sub AS (SELECT vec_id, unnest(range(0, {M})) AS m, e FROM v),
    subv AS MATERIALIZED (SELECT vec_id, m,
                    list_slice(e, m * {SUBDIM} + 1, (m + 1) * {SUBDIM}) AS sv
             FROM sub),
    cb0 AS MATERIALIZED (SELECT m, vec_id AS code, sv AS c FROM subv WHERE vec_id < {K}),
    d0 AS (SELECT s.vec_id, s.m, cb0.code, {_sq_sql('s.sv', 'cb0.c')} AS d
           FROM subv s JOIN cb0 USING (m)),
    asg0 AS (SELECT vec_id, m, code FROM (
        SELECT vec_id, m, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY d, code) AS rn
        FROM d0) WHERE rn = 1),
    upd AS (SELECT a.m, a.code, generate_subscripts(s.sv, 1) AS spos,
                   unnest(s.sv) AS val
            FROM asg0 a JOIN subv s ON s.vec_id = a.vec_id AND s.m = a.m),
    cb1e AS (SELECT m, code, spos,
                    ROUND(AVG(val) * 1e{PQ_ROUND}, 0) / 1e{PQ_ROUND} AS cv
             FROM upd GROUP BY m, code, spos),
    cb1 AS MATERIALIZED (SELECT m, code, list(cv ORDER BY spos) AS c
            FROM cb1e GROUP BY m, code),
    d1 AS (SELECT s.vec_id, s.m, cb1.code, {_sq_sql('s.sv', 'cb1.c')} AS d
           FROM subv s JOIN cb1 USING (m)),
    codesr AS MATERIALIZED (SELECT vec_id, m, code, d FROM (
        SELECT vec_id, m, code, d,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY d, code) AS rn
        FROM d1) WHERE rn = 1)"""


# -------------------------------------------------------------- Spark
def _subvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, m, sv): each vector split into M SUBDIM-dim pieces —
    map-only (explode of a constant-length sequence, then slice)."""
    emb = spread(read_testdata(spark, sf_dir, "embeddings")).select(
        "vec_id", as_double_array("embedding").alias("e")
    )
    return emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(M - 1))).alias("m"),
        "e",
    ).select(
        "vec_id",
        "m",
        F.slice(F.col("e"), F.col("m") * SUBDIM + 1, SUBDIM).alias("sv"),
    )


def _sq(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sq_sub(a: str, b: str):
    """Squared distance between two SUBDIM-element arrays, unrolled to
    a flat SUBDIM-term expression (round 12): ``aggregate(zip_with)``
    lambdas are interpreted per element (the round-11 LSH projection
    lesson), while the unrolled sum whole-stage-codegens. Bit-exact
    vs the fold: the fold's seed step computes 0.0 + t1 == t1 (t1 is
    a square, so never -0.0) and both accumulate strictly left to
    right. Only used at SUBDIM (= 4) terms — far under the janino
    64 KB method limit that bit the 88-plane unroll."""
    terms = [
        (F.element_at(a, i) - F.element_at(b, i))
        * (F.element_at(a, i) - F.element_at(b, i))
        for i in range(1, SUBDIM + 1)
    ]
    expr = terms[0]
    for t in terms[1:]:
        expr = expr + t
    return expr


def _assign(subv: DataFrame, cb: DataFrame) -> DataFrame:
    """Nearest-codebook-entry per (vec_id, m): equi-join on subspace
    against the broadcast codebook, then argmin via
    ``MIN(STRUCT(d, code))`` — a partially-aggregating groupBy
    (round 12) instead of the former row_number window, which sorted
    all N·M·K distance rows through an exchange. Struct comparison is
    lexicographic on (d, code), exactly the window's ORDER BY d, code
    rank-1 row, so the result is identical; the aggregate combines
    map-side and never materialises a global sort (guide §2.3)."""
    d = subv.join(F.broadcast(cb), "m").select(
        "vec_id", "m", "code", _sq_sub("sv", "c").alias("d")
    )
    return (
        d.groupBy("vec_id", "m")
        .agg(F.min(F.struct("d", "code")).alias("b"))
        .select(
            "vec_id", "m", F.col("b.code").alias("code"), F.col("b.d").alias("d")
        )
    )


def _trained_codebook(
    subv: DataFrame, scope: CacheScope | None = None
) -> tuple[DataFrame, DataFrame]:
    """(cb1, asg0): one Lloyd refinement of the seed codebook. The
    seed is the first K vectors' subvectors — deterministic, no RNG —
    and the refined centroids are grouped means rounded at PQ_ROUND so
    both engines sit on bit-identical codebooks.

    ``scope`` (round 12): every ADC consumer references cb1 at least
    twice (corpus assignment + query LUT), and the unpersisted M·K-row
    frame re-executed the whole training chain per reference — the
    dominant cost of the ADC queries at sf0.1 (pq_adc_rerank_topk
    ~4.1 s, of which <0.7 s was the actual search). Persisting the
    256-row codebook in the caller's CacheScope runs training once."""
    cb0 = subv.filter(F.col("vec_id") < K).select(
        "m", F.col("vec_id").alias("code"), F.col("sv").alias("c")
    )
    asg0 = _assign(subv, cb0).select("vec_id", "m", "code")
    upd = asg0.join(subv, ["vec_id", "m"]).select(
        "m", "code", F.posexplode("sv").alias("spos0", "val")
    ).select("m", "code", (F.col("spos0") + 1).alias("spos"), "val")
    cb1e = upd.groupBy("m", "code", "spos").agg(
        round_compat(F.avg("val"), PQ_ROUND).alias("cv")
    )
    cb1 = cb1e.groupBy("m", "code").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("spos", "cv"))),
            lambda s: s.cv,
        ).alias("c")
    )
    if scope is not None:
        cb1 = scope.persist(cb1)
    return cb1, asg0


@register(
    "pq_train_codebooks",
    f"""
    WITH {_pq_prefix_sql()},
    sizes AS (SELECT m, code, COUNT(*) AS n_members FROM asg0
              GROUP BY m, code)
    SELECT CAST(e.m AS INT) AS subspace, CAST(e.code AS INT) AS code,
           CAST(e.spos AS INT) AS pos, e.cv AS centroid_val,
           CAST(s.n_members AS BIGINT) AS n_members
    FROM cb1e e JOIN sizes s ON s.m = e.m AND s.code = e.code
    """,
    f"product-quantization codebook training: {M} subspaces x {K}"
    " codes, deterministic seed + one Lloyd round (per-round rounding"
    " pins both engines) — the compression dictionary of an IVFADC"
    " index",
    tags=("similarity", "pq"),
)
def pq_train_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training is the ivf_kmeans_train shape per subspace: broadcast
    codebook -> map-side argmin -> grouped-mean update, all M
    subspaces riding one plan (subspace is just a grouping column).
    Seeding from the first K vectors is the deterministic stand-in
    for k-means++ — at scale you'd seed from a hash-sampled shard."""
    subv = _subvectors(spark, sf_dir)
    scope = CacheScope("pq_train_codebooks")
    subv = scope.persist(subv)
    cb0 = subv.filter(F.col("vec_id") < K).select(
        "m", F.col("vec_id").alias("code"), F.col("sv").alias("c")
    )
    # asg0 feeds both the centroid update and the membership sizes:
    # persist the N·M assignment once instead of re-running the seed
    # argmin per consumer (round 12, same reasoning as cb1)
    asg0 = scope.persist(_assign(subv, cb0).select("vec_id", "m", "code"))
    upd = asg0.join(subv, ["vec_id", "m"]).select(
        "m", "code", F.posexplode("sv").alias("spos0", "val")
    ).select("m", "code", (F.col("spos0") + 1).alias("spos"), "val")
    cb1e = upd.groupBy("m", "code", "spos").agg(
        round_compat(F.avg("val"), PQ_ROUND).alias("cv")
    )
    sizes = asg0.groupBy("m", "code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    return cb1e.join(sizes, ["m", "code"]).select(
        F.col("m").cast("int").alias("subspace"),
        F.col("code").cast("int").alias("code"),
        F.col("spos").cast("int").alias("pos"),
        F.col("cv").alias("centroid_val"),
        "n_members",
    )


@register(
    "pq_codes",
    f"""
    WITH {_pq_prefix_sql()}
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(SUM(CASE WHEN m < {M // 2}
                         THEN code::BIGINT << ({CODE_BITS} * m)
                         ELSE 0 END) AS BIGINT) AS packed_lo,
           CAST(SUM(CASE WHEN m >= {M // 2}
                         THEN code::BIGINT << ({CODE_BITS} * (m - {M // 2}))
                         ELSE 0 END) AS BIGINT) AS packed_hi,
           ROUND(SUM(d) / {DIM} * 1e6, 0) / 1e6 AS mse
    FROM codesr GROUP BY vec_id
    """,
    f"PQ encoding: every vector compressed to a {M}x{CODE_BITS}-bit"
    f" code ({DIM * 8 // 8} bytes -> {M * CODE_BITS // 8} bytes),"
    " packed as two 32-bit words, plus its per-dimension quantization"
    " error",
    tags=("similarity", "pq"),
)
def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding is map-only against the broadcast trained codebook:
    each (vector, subspace) picks its argmin entry, and the M 4-bit
    codes pack into two 32-bit words (the full 64-bit code would
    occupy the sign bit, which DuckDB's checked shift rejects) — the
    columns a 100 TB corpus actually stores. The mean squared error
    column is the quantization-quality audit (pinned decreasing vs
    the seed codebook in tests)."""
    subv = _subvectors(spark, sf_dir)
    scope = CacheScope("pq_codes")
    subv = scope.persist(subv)
    cb1, _ = _trained_codebook(subv, scope)
    codes = _assign(subv, cb1)
    half = M // 2
    lo = F.expr(
        f"CASE WHEN m < {half} THEN"
        f" shiftleft(CAST(code AS BIGINT), {CODE_BITS} * m) ELSE 0 END"
    )
    hi = F.expr(
        f"CASE WHEN m >= {half} THEN"
        f" shiftleft(CAST(code AS BIGINT), {CODE_BITS} * (m - {half}))"
        f" ELSE 0 END"
    )
    return codes.groupBy("vec_id").agg(
        F.sum(lo).cast("bigint").alias("packed_lo"),
        F.sum(hi).cast("bigint").alias("packed_hi"),
        round_compat(F.sum("d") / DIM, 6).alias("mse"),
    ).select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        "packed_lo",
        "packed_hi",
        "mse",
    )


@register(
    "pq_adc_topk",
    f"""
    WITH {_pq_prefix_sql()},
    lut AS (SELECT q.vec_id AS query_id, q.m, cb1.code,
                   {_sq_sql('q.sv', 'cb1.c')} AS pd
            FROM subv q JOIN cb1 USING (m) WHERE q.vec_id < {N_QUERIES}),
    adc AS (SELECT l.query_id, cr.vec_id AS neighbor_id,
                   ROUND(SUM(l.pd) * 1e6, 0) / 1e6 AS adc_dist
            FROM codesr cr JOIN lut l ON l.m = cr.m AND l.code = cr.code
            WHERE cr.vec_id <> l.query_id
            GROUP BY l.query_id, cr.vec_id),
    ranked AS (SELECT query_id, neighbor_id, adc_dist,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY adc_dist, neighbor_id) AS rank
               FROM adc)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(rank AS INT) AS rank, adc_dist
    FROM ranked WHERE rank <= {TOPK}
    """,
    f"PQ asymmetric-distance top-{TOPK}: exact queries scored against"
    " the compressed corpus via per-query (subspace, code) lookup"
    " tables — N·M table lookups instead of N·DIM multiplies."
    " DIAGNOSTIC/component form: at 64 bits/vector pure ADC measures"
    " 0.30-0.34 recall@5 on both test corpora — deploy"
    " pq_adc_rerank_topk (the headline PQ operator), which refines the"
    " ADC shortlist exactly",
    tags=("similarity", "pq"),
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ADC search path: the lookup table (N_QUERIES x M x K rows)
    is tiny and broadcast; the corpus side touches only its code
    table — one equi-join on (subspace, code) and a (query, vector)
    sum, so the per-query scan cost is M lookups per corpus vector
    and the original embeddings are never read at query time.
    Approximate by construction (quantization error); the oracle
    declares identical semantics so the hash gate verifies exactly,
    and recall vs the exact top-k is measured in tests."""
    subv = _subvectors(spark, sf_dir)
    scope = CacheScope("pq_adc_topk")
    subv = scope.persist(subv)
    cb1, _ = _trained_codebook(subv, scope)
    codes = _assign(subv, cb1).select("vec_id", "m", "code")
    lut = (
        subv.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "m", "sv")
        .join(cb1, "m")
        .select("query_id", "m", "code", _sq_sub("sv", "c").alias("pd"))
    )
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(round_compat(F.sum("pd"), 6).alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        _partition_bounded_topr(adc, "adc_dist", TOPK)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOPK)
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
            "rank",
            "adc_dist",
        )
    )


def _partition_bounded_topr(adc: DataFrame, dist_col: str, r: int) -> DataFrame:
    """Pre-reduce the per-query candidate set to top-``r`` PER INPUT
    PARTITION before any per-query window: the global top-r is always
    a subset of the union of per-partition top-rs (each candidate
    competes within its own partition first), so the final
    ``Window.partitionBy(query_id)`` ranks at most partitions x r rows
    per query instead of the whole corpus — with few queries the
    unbounded form funnels all N corpus rows through one task per
    query. Exact: ties are decided on the rounded distance +
    neighbor_id in both stages, the same grain the oracle uses."""
    w_pre = Window.partitionBy("query_id", "_pid").orderBy(
        dist_col, "neighbor_id"
    )
    return (
        adc.withColumn("_pid", F.spark_partition_id())
        .withColumn("_prn", F.row_number().over(w_pre))
        .filter(F.col("_prn") <= r)
        .drop("_pid", "_prn")
    )


@register(
    "pq_adc_rerank_topk",
    f"""
    WITH {_pq_prefix_sql()},
    lut AS (SELECT q.vec_id AS query_id, q.m, cb1.code,
                   {_sq_sql('q.sv', 'cb1.c')} AS pd
            FROM subv q JOIN cb1 USING (m) WHERE q.vec_id < {N_QUERIES}),
    adc AS (SELECT l.query_id, cr.vec_id AS neighbor_id,
                   ROUND(SUM(l.pd) * 1e6, 0) / 1e6 AS adc_dist
            FROM codesr cr JOIN lut l ON l.m = cr.m AND l.code = cr.code
            WHERE cr.vec_id <> l.query_id
            GROUP BY l.query_id, cr.vec_id),
    short AS (SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY adc_dist, neighbor_id) AS rn
        FROM adc) WHERE rn <= {RERANK_R}),
    rr AS (SELECT s.query_id, s.neighbor_id,
                  list_sum(list_transform(range(1, {DIM} + 1),
                      i -> (q.e[i] - x.e[i]) * (q.e[i] - x.e[i]))) AS d
           FROM short s JOIN v q ON q.vec_id = s.query_id
                        JOIN v x ON x.vec_id = s.neighbor_id),
    ranked AS (SELECT query_id, neighbor_id, d,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY d, neighbor_id) AS rank
               FROM rr)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(rank AS INT) AS rank,
           ROUND(d * 1e6, 0) / 1e6 AS l2_dist
    FROM ranked WHERE rank <= {TOPK}
    """,
    f"PQ search with exact re-rank: ADC shortlist of {RERANK_R}, then"
    f" true L2 on the shortlist only — measured recall@{TOPK} 0.84 vs"
    " exact search at sf0.1 while reading original vectors for just"
    f" {RERANK_R} of N candidates per query (the FAISS refine"
    " pipeline)",
    tags=("similarity", "pq"),
)
def pq_adc_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production PQ pipeline: compressed-domain ADC ranks the
    whole corpus (M lookups per vector), and only the top RERANK_R
    survivors have their original vectors fetched for an exact L2
    re-rank. At 100 TB the full-precision corpus stays on disk; the
    random reads per query are bounded by RERANK_R. The shortlist
    boundary ranks on ROUNDED adc (1e-6) so both engines cut the
    same set; the exact re-rank distance is a sequential fold,
    bit-identical cross-engine."""
    subv = _subvectors(spark, sf_dir)
    scope = CacheScope("pq_adc_rerank_topk")
    subv = scope.persist(subv)
    cb1, _ = _trained_codebook(subv, scope)
    codes = _assign(subv, cb1).select("vec_id", "m", "code")
    lut = (
        subv.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "m", "sv")
        .join(cb1, "m")
        .select("query_id", "m", "code", _sq_sub("sv", "c").alias("pd"))
    )
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(round_compat(F.sum("pd"), 6).alias("adc_dist"))
    )
    w_short = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    short = (
        _partition_bounded_topr(adc, "adc_dist", RERANK_R)
        .withColumn("rn", F.row_number().over(w_short))
        .filter(F.col("rn") <= RERANK_R)
        .select("query_id", "neighbor_id")
    )
    emb = spread(read_testdata(spark, sf_dir, "embeddings")).select(
        "vec_id", as_double_array("embedding").alias("e")
    )
    q = emb.select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
    x = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("xe"))
    rr = short.join(q, "query_id").join(x, "neighbor_id").select(
        "query_id", "neighbor_id", _sq("qe", "xe").alias("d")
    )
    w_rank = Window.partitionBy("query_id").orderBy("d", "neighbor_id")
    return (
        rr.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rank") <= TOPK)
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
            "rank",
            round_compat("d", 6).alias("l2_dist"),
        )
    )


# --------------------------------------------------------------------
# Composed IVFADC: coarse-quantizer pruning + ADC scoring + re-rank
# --------------------------------------------------------------------

# nprobe for the composed search: 4 of the 10 label-lists (the IVF
# dial measured 0.68 recall@5 alone at nprobe=4; the ADC shortlist +
# exact re-rank recovers most of what survives the probe).
IVFADC_NPROBE = 4


def _ivf_cent_sql() -> str:
    """Label-centroid CTEs (the IVF coarse quantizer — same
    construction as operators.similarity's IVF oracle)."""
    return """
    exc AS (SELECT t.label, generate_subscripts(t.e, 1) AS pos,
                   unnest(t.e) AS val
            FROM (SELECT label, embedding::DOUBLE[] AS e FROM embeddings) t),
    cent AS (SELECT label, pos,
                    ROUND(AVG(val) * 1e6, 0) / 1e6 AS cv
             FROM exc GROUP BY label, pos),
    carr AS MATERIALIZED (SELECT label, list(cv ORDER BY pos) AS c FROM cent
             GROUP BY label),
    cdist AS (SELECT v.vec_id, carr.label,
                     list_sum(list_transform(range(1, len(v.e) + 1),
                         i -> (v.e[i] - carr.c[i]) * (v.e[i] - carr.c[i])))
                       AS d
              FROM v CROSS JOIN carr),
    assigned AS MATERIALIZED (SELECT vec_id, label FROM (
        SELECT vec_id, label,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, label) AS rn
        FROM cdist) WHERE rn = 1)"""


@register(
    "ivfadc_rerank_topk",
    f"""
    WITH {_pq_prefix_sql()},
    {_ivf_cent_sql()},
    probes AS (SELECT vec_id AS query_id, label FROM (
        SELECT vec_id, label,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, label) AS rn
        FROM cdist WHERE vec_id < {N_QUERIES}) WHERE rn <= {IVFADC_NPROBE}),
    lut AS (SELECT q.vec_id AS query_id, q.m, cb1.code,
                   {_sq_sql('q.sv', 'cb1.c')} AS pd
            FROM subv q JOIN cb1 USING (m) WHERE q.vec_id < {N_QUERIES}),
    cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
             FROM probes p JOIN assigned a ON a.label = p.label
             WHERE a.vec_id <> p.query_id),
    adc AS (SELECT c.query_id, c.neighbor_id,
                   ROUND(SUM(l.pd) * 1e6, 0) / 1e6 AS adc_dist
            FROM cand c
            JOIN codesr cr ON cr.vec_id = c.neighbor_id
            JOIN lut l ON l.query_id = c.query_id
                      AND l.m = cr.m AND l.code = cr.code
            GROUP BY c.query_id, c.neighbor_id),
    short AS (SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY adc_dist, neighbor_id) AS rn
        FROM adc) WHERE rn <= {RERANK_R}),
    rr AS (SELECT s.query_id, s.neighbor_id,
                  list_sum(list_transform(range(1, {DIM} + 1),
                      i -> (q.e[i] - x.e[i]) * (q.e[i] - x.e[i]))) AS d
           FROM short s JOIN v q ON q.vec_id = s.query_id
                        JOIN v x ON x.vec_id = s.neighbor_id),
    ranked AS (SELECT query_id, neighbor_id, d,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY d, neighbor_id) AS rank
               FROM rr)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(rank AS INT) AS rank,
           ROUND(d * 1e6, 0) / 1e6 AS l2_dist
    FROM ranked WHERE rank <= {TOPK}
    """,
    f"composed IVFADC search: IVF coarse quantizer prunes to"
    f" {IVFADC_NPROBE} of the inverted lists, ADC scores only those"
    " lists' codes, exact re-rank on the shortlist — the production"
    " billion-vector search pipeline (FAISS IVFADC+refine) as one"
    " Catalyst plan",
    tags=("similarity", "pq", "ivf"),
)
def ivfadc_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full composed ANN stack, each stage bounding the next:
    per query, the coarse quantizer selects IVFADC_NPROBE inverted
    lists (corpus/n_lists × nprobe vectors survive), ADC scores only
    those survivors' 8-byte codes against the broadcast LUT, and the
    exact re-rank touches RERANK_R original vectors. At 100 TB this
    is the only registered search whose per-query cost is sublinear
    in BOTH scanned vectors (IVF pruning) and bytes per vector (PQ
    codes) — scanned work ≈ (N/n_lists)·nprobe·M lookups + R exact
    distances. Every stage is an equi-join on (label) or
    (subspace, code) against broadcast tables."""
    from aws_etl_global_footprint_network_spark.operators.similarity import (
        ivf_label_centroids,
    )

    subv = _subvectors(spark, sf_dir)
    scope = CacheScope("ivfadc_rerank_topk")
    subv = scope.persist(subv)
    cb1, _ = _trained_codebook(subv, scope)
    codes = scope.persist(_assign(subv, cb1).select("vec_id", "m", "code"))

    emb = spread(read_testdata(spark, sf_dir, "embeddings")).select(
        "vec_id", as_double_array("embedding").alias("e")
    )
    cent = ivf_label_centroids(spark, sf_dir).select(
        "label", "pos", F.col("centroid_val").alias("cv")
    )
    carr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))),
            lambda s: s.cv,
        ).alias("c")
    )
    # centroid distances feed both the corpus assignment and the query
    # probes: persist the N x n_labels frame once (round 12)
    cdist = scope.persist(
        emb.crossJoin(F.broadcast(carr)).select(
            "vec_id",
            "label",
            F.aggregate(
                F.zip_with("e", "c", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("d"),
        )
    )
    # argmin label via MIN(STRUCT(d, label)) — identical to the former
    # row_number-over-(d, label) rank-1 row, partial-aggregating
    assigned = (
        cdist.groupBy("vec_id")
        .agg(F.min(F.struct("d", "label")).alias("b"))
        .select("vec_id", F.col("b.label").alias("label"))
    )
    w_c = Window.partitionBy("vec_id").orderBy("d", "label")
    probes = (
        cdist.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("rn", F.row_number().over(w_c))
        .filter(F.col("rn") <= IVFADC_NPROBE)
        .select(F.col("vec_id").alias("query_id"), "label")
    )
    cand = (
        assigned.join(F.broadcast(probes), "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    lut = (
        subv.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "m", "sv")
        .join(cb1, "m")
        .select("query_id", "m", "code", _sq_sub("sv", "c").alias("pd"))
    )
    adc = (
        cand.join(codes, F.col("neighbor_id") == F.col("vec_id"))
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(round_compat(F.sum("pd"), 6).alias("adc_dist"))
    )
    w_s = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    short = (
        adc.withColumn("rn", F.row_number().over(w_s))
        .filter(F.col("rn") <= RERANK_R)
        .select("query_id", "neighbor_id")
    )
    q = emb.select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
    x = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("xe"))
    rr = short.join(q, "query_id").join(x, "neighbor_id").select(
        "query_id", "neighbor_id", _sq("qe", "xe").alias("d")
    )
    w_r = Window.partitionBy("query_id").orderBy("d", "neighbor_id")
    return (
        rr.withColumn("rank", F.row_number().over(w_r).cast("int"))
        .filter(F.col("rank") <= TOPK)
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
            "rank",
            round_compat("d", 6).alias("l2_dist"),
        )
    )
