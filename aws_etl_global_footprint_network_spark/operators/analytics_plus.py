"""Warehouse analytics patterns round-out ([EXT] — operator-surface
breadth beyond the reference's own queries, per the build brief):
exact-cents proration (largest-remainder allocation), gap-and-islands
streak detection, a Benford first-digit data-quality check, and a
Markov event-transition matrix.

Scale posture: every operator here partitions its windows by a natural
high-cardinality key (order, customer, user) or aggregates to a
constant-size result (9 digit rows, |event_types|² transitions) — no
unpartitioned windows, no driver-side loops, one shuffle each.

Oracle float contract: proration is pure integer arithmetic (exact in
any engine); benford/markov divide integer counts once and round the
quotient on both sides; gap-islands is all-integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.functions.compat import round_compat
from aws_etl_global_footprint_network_spark.registry import register
from aws_etl_global_footprint_network_spark.sources.readers import read_testdata


@register(
    "proration_largest_remainder",
    """
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS qty_u
      FROM lineitem),
    o AS (
      SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
      FROM orders),
    j AS (
      SELECT l.l_orderkey, l.l_linenumber, l.qty_u, o.total_cents,
             SUM(l.qty_u) OVER (PARTITION BY l.l_orderkey) AS order_qty_u
      FROM li l JOIN o ON l.l_orderkey = o.o_orderkey),
    base AS (
      SELECT *,
             total_cents * qty_u // order_qty_u AS floor_share,
             total_cents * qty_u % order_qty_u AS remainder
      FROM j),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY remainder DESC, l_linenumber, qty_u)
               AS rk,
             total_cents - SUM(floor_share) OVER (PARTITION BY l_orderkey)
               AS leftover
      FROM base)
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS INT) AS l_linenumber,
           CAST(floor_share + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_cents
    FROM ranked
    """,
    "allocate each order's total price across its lineitems pro-rata"
    " by quantity in EXACT integer cents via largest-remainder"
    " rounding — per-order allocations sum to the order total to the"
    " cent, bit-identical across engines (pure integer arithmetic);"
    " the remainder rank tie-breaks on (linenumber, qty) because the"
    " synthetic lineitem reuses linenumbers within an order, and rows"
    " identical on the full grain are interchangeable in the output",
    tags=("analytics", "finance"),
)
def proration_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic financial-allocation pattern: floor the
    proportional share in integer cents, then hand the leftover cents
    to the largest fractional remainders (linenumber tie-break).
    Integer division/modulo only — no float enters the allocation, so
    the result is engine- and plan-independent. All three windows
    partition by order key, the natural high-cardinality key, so at
    100 TB this is one shuffle on l_orderkey and bounded per-group
    state (an order has few lineitems)."""
    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("qty_u"),
    )
    o = read_testdata(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("total_cents"),
    )
    per_order = Window.partitionBy("l_orderkey")
    j = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "order_qty_u", F.sum("qty_u").over(per_order)
    )
    base = j.withColumn(
        "floor_share",
        F.expr("(total_cents * qty_u) div order_qty_u"),
    ).withColumn(
        "remainder", (F.col("total_cents") * F.col("qty_u")) % F.col("order_qty_u")
    )
    rk_w = Window.partitionBy("l_orderkey").orderBy(
        F.col("remainder").desc(), "l_linenumber", "qty_u"
    )
    ranked = base.withColumn("rk", F.row_number().over(rk_w)).withColumn(
        "leftover", F.col("total_cents") - F.sum("floor_share").over(per_order)
    )
    return ranked.select(
        F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        (
            F.col("floor_share")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_cents"),
    )


@register(
    "gap_islands_order_months",
    """
    WITH m AS (
      SELECT DISTINCT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
               AS month_idx
      FROM orders),
    g AS (
      SELECT o_custkey, month_idx,
             month_idx - ROW_NUMBER() OVER (PARTITION BY o_custkey
                                            ORDER BY month_idx) AS grp
      FROM m),
    islands AS (
      SELECT o_custkey, grp,
             MIN(month_idx) AS start_idx, MAX(month_idx) AS end_idx,
             COUNT(*) AS streak_months
      FROM g GROUP BY o_custkey, grp)
    SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(start_idx AS BIGINT) AS start_idx,
           CAST(end_idx AS BIGINT) AS end_idx,
           CAST(streak_months AS BIGINT) AS streak_months
    FROM islands
    """,
    "gap-and-islands: maximal runs of consecutive calendar months with"
    " at least one order, per customer — the month_idx - ROW_NUMBER()"
    " constant-difference trick; all-integer, windows partitioned by"
    " customer",
    tags=("analytics", "window"),
)
def gap_islands_order_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-month streaks per customer: distinct order months
    collapse to islands because month_idx minus its per-customer rank
    is constant exactly while months are consecutive. One shuffle on
    o_custkey (window + groupBy share the partitioning, Catalyst
    reuses the exchange); per-group state is the customer's distinct
    months — bounded."""
    o = read_testdata(spark, sf_dir, "orders")
    m = o.select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        )
        .cast("bigint")
        .alias("month_idx"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("month_idx")
    g = m.withColumn("grp", F.col("month_idx") - F.row_number().over(w))
    return (
        g.groupBy("o_custkey", "grp")
        .agg(
            F.min("month_idx").alias("start_idx"),
            F.max("month_idx").alias("end_idx"),
            F.count(F.lit(1)).alias("streak_months"),
        )
        .select(
            F.col("o_custkey").cast("bigint").alias("o_custkey"),
            F.col("start_idx").cast("bigint").alias("start_idx"),
            F.col("end_idx").cast("bigint").alias("end_idx"),
            F.col("streak_months").cast("bigint").alias("streak_months"),
        )
    )


# Benford expected first-digit probabilities ln(1+1/d)/ln(10), written
# as literals so both engines use the identical constant.
_BENFORD = {d: f"ln(1.0 + 1.0/{d}) / ln(10.0)" for d in range(1, 10)}


@register(
    "benford_first_digit",
    f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM digits),
    obs AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM digits GROUP BY digit),
    expect AS (
      SELECT * FROM (VALUES
        {', '.join(f'({d}, {sql})' for d, sql in _BENFORD.items())})
        AS v(digit, p))
    SELECT e.digit,
           COALESCE(o.cnt, 0) AS cnt,
           ROUND(COALESCE(o.cnt, 0) / n.total * 1e6, 0) / 1e6 AS observed_p,
           ROUND(e.p * 1e6, 0) / 1e6 AS benford_p,
           ROUND((COALESCE(o.cnt, 0) - n.total * e.p)
                 * (COALESCE(o.cnt, 0) - n.total * e.p)
                 / (n.total * e.p) * 1e6, 0) / 1e6 AS chi2_term
    FROM expect e LEFT JOIN obs o ON e.digit = o.digit CROSS JOIN n
    """,
    "Benford's-law data-quality check on order totals: observed vs"
    " expected first-digit distribution with per-digit chi-square"
    " terms; the first digit is taken from the cents-integer's string"
    " form (no float log10 edge cases), result is 9 rows",
    tags=("analytics", "dq"),
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fabricated-data screen: genuine financial amounts follow
    Benford's law; a flat digit histogram is a red flag. Map-side
    digit extraction + a 9-key groupBy — constant-size result at any
    scale. The digit comes from the exact cents integer rendered as a
    string, so engines cannot disagree at power-of-ten boundaries the
    way floor(log10(x)) can."""
    o = read_testdata(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    n = digits.agg(F.count(F.lit(1)).cast("double").alias("total"))
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("cnt"))
    expect = spark.createDataFrame(
        [(d,) for d in range(1, 10)], "digit int"
    ).withColumn(
        "p",
        F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0)),
    )
    joined = (
        expect.join(obs, "digit", "left")
        .crossJoin(F.broadcast(n))
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    )
    dev = F.col("cnt") - F.col("total") * F.col("p")
    return joined.select(
        "digit",
        F.col("cnt").cast("bigint").alias("cnt"),
        round_compat(F.col("cnt") / F.col("total"), 6).alias("observed_p"),
        round_compat(F.col("p"), 6).alias("benford_p"),
        round_compat(dev * dev / (F.col("total") * F.col("p")), 6).alias("chi2_term"),
    )


@register(
    "markov_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    t AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type),
    tot AS (
      SELECT from_type, SUM(cnt) AS row_total FROM t GROUP BY from_type)
    SELECT t.from_type, t.to_type, t.cnt,
           ROUND(t.cnt / CAST(tot.row_total AS DOUBLE) * 1e6, 0) / 1e6 AS prob
    FROM t JOIN tot USING (from_type)
    """,
    "first-order Markov transition matrix over per-user event"
    " sequences: P(next event type | event type); LEAD ordered by"
    " (ts, event_id) so the sequence is total and engine-independent",
    tags=("analytics", "behavioral"),
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-model primitive: one window shuffle on user_id to
    form (event, next-event) pairs, then a groupBy on the transition
    pair — whose cardinality is |event_types|², a constant. The
    event_id tie-break makes simultaneous-timestamp ordering total
    (the registry's determinism contract)."""
    e = read_testdata(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    t = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = t.groupBy("from_type").agg(F.sum("cnt").alias("row_total"))
    return t.join(tot, "from_type").select(
        "from_type",
        "to_type",
        F.col("cnt").cast("bigint").alias("cnt"),
        round_compat(F.col("cnt") / F.col("row_total").cast("double"), 6).alias(
            "prob"
        ),
    )
