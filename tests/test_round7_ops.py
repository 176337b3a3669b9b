"""Round-7 operator unit tests: semantics the oracle-parity sweep
can't pin on its own (merge mechanics on crafted inputs, pigeonhole
recall, orientation invariants)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.operators import mining
from aws_etl_global_footprint_network_spark.registry import load_all

SPECS = load_all()


def _merge_once(spark, seq: str, left: str, right: str) -> str:
    """Drive the space-doubling replace trick exactly as the operator
    composes it (pattern/replacement built from columns)."""
    df = spark.createDataFrame(
        [(seq, left, right)], ["seq", "l", "r"]
    ).select(
        F.trim(
            F.replace(
                F.replace(
                    F.concat(
                        F.lit(" "),
                        F.replace(F.col("seq"), F.lit(" "), F.lit("  ")),
                        F.lit(" "),
                    ),
                    F.concat(
                        F.lit(" "), F.col("l"), F.lit("  "), F.col("r"), F.lit(" ")
                    ),
                    F.concat(
                        F.lit(" "), F.concat(F.col("l"), F.col("r")), F.lit(" ")
                    ),
                ),
                F.lit("  "),
                F.lit(" "),
            )
        ).alias("out")
    )
    return df.collect()[0]["out"]


def test_bpe_merge_is_left_to_right_non_overlapping(spark):
    # overlapping runs merge greedily left-to-right, standard BPE
    assert _merge_once(spark, "a a a", "a", "a") == "aa a"
    assert _merge_once(spark, "a a a a", "a", "a") == "aa aa"
    # adjacent occurrences both merge (the doubling preserves the
    # second occurrence's leading separator)
    assert _merge_once(spark, "x a b a b y", "a", "b") == "x ab ab y"
    # no false match across symbol boundaries: 'aa b' contains the
    # characters 'a b' but not the symbol pair (a, b)
    assert _merge_once(spark, "aa b c", "a", "b") == "aa b c"
    # untouched sequences survive the double/collapse round-trip
    assert _merge_once(spark, "q r s", "a", "b") == "q r s"


def test_bpe_merge_step_counts_are_consistent(spark, sf_dir):
    rows = {
        r["iteration"]: r
        for r in SPECS["bpe_merge_step"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2, 3}
    # each merge's pair count can only shrink or hold as merges
    # consume symbols (the argmax of iteration i+1 <= argmax of i)
    assert rows[1]["pair_count"] >= rows[2]["pair_count"] >= rows[3]["pair_count"]
    for r in rows.values():
        assert r["merged_sym"] == r["left_sym"] + r["right_sym"]
        assert r["pair_count"] > 0


def test_simhash_banding_recall_is_total_at_radius(spark, sf_dir):
    """Pigeonhole gate: EVERY distinct-fingerprint pair within
    HAMMING_MAX must be produced by the banded join — compare against
    a brute-force all-pairs pass over the (small) distinct-fingerprint
    set."""
    from aws_etl_global_footprint_network_spark.operators.dedup import dedup_simhash

    got = {
        (r["doc_a"], r["doc_b"])
        for r in SPECS["simhash_neardup_pairs"].builder(spark, sf_dir).collect()
    }
    fps = (
        dedup_simhash(spark, sf_dir)
        .groupBy("simhash")
        .agg(F.min("doc_id").alias("rep"))
        .collect()
    )
    want = set()
    for x, y in itertools.combinations(fps, 2):
        if bin(x["simhash"] ^ y["simhash"]).count("1") <= mining.HAMMING_MAX:
            a, b = sorted((x["rep"], y["rep"]))
            want.add((a, b))
    assert got == want


def test_triangle_orientation_matches_bruteforce(spark, sf_dir):
    """The degree-oriented wedge enumeration must count exactly the
    triangles a brute-force edge-set check finds."""
    li = (
        SPECS["triangle_count_copurchase"].builder(spark, sf_dir).collect()
    )
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    rows = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order: dict[int, set[int]] = {}
    for r in rows:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    support: dict[tuple[int, int], int] = {}
    for parts in by_order.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            support[(a, b)] = support.get((a, b), 0) + 1
    edges = {e for e, c in support.items() if c >= mining.TRI_MIN_SUPPORT}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri_count: dict[int, int] = {}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # each triangle counted once via its smallest edge
                for n in (a, b, c):
                    tri_count[n] = tri_count.get(n, 0) + 1
    want = sorted(
        ((-cnt, node) for node, cnt in tri_count.items())
    )[: mining.TRI_TOP]
    got = [(-r["n_triangles"], r["l_partkey"]) for r in li]
    assert got == want
    for r in li:
        assert r["degree"] == len(adj[r["l_partkey"]])


def test_gini_bounds_and_totals(spark, sf_dir):
    rows = SPECS["gini_revenue_concentration"].builder(spark, sf_dir).collect()
    assert len(rows) == 5  # TPC-H market segments
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0
        assert r["n_customers"] > 0 and r["total_rev_cents"] > 0


def test_csls_penalizes_hubs(spark, sf_dir):
    """CSLS ranking must differ from raw-cosine ranking only through
    the neighborhood terms: for a fixed query, csls order equals
    cos order shifted by r_src(y) — verify csls = 2*cos - rq - ry
    algebra holds by reconstructing rq from the reported rows."""
    rows = SPECS["bitext_margin_csls"].builder(spark, sf_dir).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == mining.BT_TOP
        assert sorted(r["rank"] for r in rs) == list(range(1, mining.BT_TOP + 1))
        # 2*cos - csls = r_tgt(q) + r_src(y): the query term is shared,
        # so the spread of (2cos - csls) across rows equals the spread
        # of r_src — which must stay within [-2, 2] cosine bounds.
        deltas = [2 * r["cos"] - r["csls"] for r in rs]
        assert max(deltas) - min(deltas) <= 4.0
        for r in rs:
            assert -1.000001 <= r["cos"] <= 1.000001


def test_phash_bits_consistent(spark, sf_dir):
    rows = SPECS["image_phash_ahash"].builder(spark, sf_dir).collect()
    assert rows
    from aws_etl_global_footprint_network_spark.operators import multimodal_codecs as mc

    n_px = mc.AH_W * mc.AH_H
    for r in rows:
        assert r["doc_id"] % 4 == 0
        assert 0 <= r["phash"] < (1 << n_px)
        assert bin(r["phash"]).count("1") == r["n_set_bits"]
        # strictly-above-mean bits can never cover the whole grid
        assert 0 <= r["n_set_bits"] < n_px


def test_kcore_matches_reference_peel(spark, sf_dir_mid):
    got = {
        r["l_partkey"]: r["core_degree"]
        for r in SPECS["kcore_copurchase"].builder(spark, sf_dir_mid).collect()
    }
    assert got, "k-core must be non-empty at sf0.01 (k tuned for it)"
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    rows = read_testdata(spark, sf_dir_mid, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order: dict[int, set[int]] = {}
    for r in rows:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            edges.add((a, b))
    for _ in range(mining.KCORE_ROUNDS):
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= mining.KCORE_K}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
    want: dict[int, int] = {}
    for a, b in edges:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1
    assert got == want


def test_window_agg_join_matches_bruteforce(spark, sf_dir):
    """The bucketized equi-join must aggregate exactly the rows a
    per-purchase brute-force scan finds."""
    from aws_etl_global_footprint_network_spark.operators import temporal
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {
        r["event_id"]: (r["n_prior"], r["prior_cents"])
        for r in SPECS["window_agg_join"].builder(spark, sf_dir).collect()
    }
    rows = read_testdata(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("t"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    ).collect()
    views = [
        (r["user_id"], r["t"], r["cents"])
        for r in rows
        if r["event_type"] in ("view", "click")
    ]
    w = temporal.WJ_WINDOW_US
    want = {}
    for r in rows:
        if r["event_type"] != "purchase":
            continue
        hits = [
            c for (u, tv, c) in views
            if u == r["user_id"] and r["t"] - w <= tv < r["t"]
        ]
        want[r["event_id"]] = (len(hits), sum(hits))
    assert got == want and len(want) > 0


def test_lone_fault_aggregate_rewrite_equals_exists_form(spark, sf_dir):
    """The Spark plan uses the aggregate rewrite; prove it equals the
    literal correlated EXISTS / NOT EXISTS form executed by Spark's
    own subquery support (a THIRD engine-path besides the DuckDB
    oracle)."""
    from aws_etl_global_footprint_network_spark.operators import relational2
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    read_testdata(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "li_q21_test"
    )
    literal = spark.sql(f"""
        SELECT CAST(l1.l_suppkey AS BIGINT) AS l_suppkey,
               CAST(COUNT(*) AS BIGINT) AS numwait
        FROM li_q21_test l1
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (
            SELECT 1 FROM li_q21_test l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM li_q21_test l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R')
        GROUP BY l1.l_suppkey
        ORDER BY numwait DESC, l_suppkey LIMIT {relational2.Q21_TOP}
    """).collect()
    rewritten = SPECS["lone_fault_suppliers"].builder(spark, sf_dir).collect()
    assert [tuple(r) for r in literal] == [tuple(r) for r in rewritten]
    assert rewritten


def test_window_agg_join_boundary_semantics(spark, tmp_path):
    """Pin the band edges: [t - W, t) — a view exactly W before the
    purchase is IN, a view at the purchase instant is OUT."""
    import datetime as dt

    from aws_etl_global_footprint_network_spark.operators import temporal

    w_us = temporal.WJ_WINDOW_US
    t0 = dt.datetime(2025, 3, 1, 12, 0, 0)

    def at(us):
        return t0 + dt.timedelta(microseconds=us)

    p_us = 10 * w_us
    rows = [
        (1, at(p_us), 7, "purchase", 1.0, "{}"),
        (2, at(p_us - w_us), 7, "view", 1.0, "{}"),      # exactly W before: IN
        (3, at(p_us - w_us - 1), 7, "view", 1.0, "{}"),  # 1us too early: OUT
        (4, at(p_us - 1), 7, "view", 1.0, "{}"),         # just before: IN
        (5, at(p_us), 7, "view", 1.0, "{}"),             # same instant: OUT
        (6, at(p_us + 1), 7, "view", 1.0, "{}"),         # after: OUT
        (7, at(p_us - 1), 8, "view", 1.0, "{}"),         # other user: OUT
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = SPECS["window_agg_join"].builder(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["event_id"] == 1 and out[0]["n_prior"] == 2


def test_retraction_drops_fully_deleted_groups(spark, tmp_path):
    """A user whose every event is retracted must vanish from the
    maintained view (count reaches zero), not linger as a zero row."""
    import datetime as dt

    from aws_etl_global_footprint_network_spark.operators import relational2

    m = relational2.IVM_DELTA_MOD
    t0 = dt.datetime(2025, 3, 1)
    rows = [
        # user 1: one surviving, one deleted
        (1, t0, 1, "click", 2.0, "{}"),
        (m, t0, 1, "click", 3.0, "{}"),
        # user 2: ONLY deleted events (ids divisible by the mod)
        (2 * m, t0, 2, "click", 5.0, "{}"),
        (3 * m, t0, 2, "click", 7.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r["user_id"]: r
        for r in SPECS["incremental_agg_retraction"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == {1}
    assert out[1]["n_events"] == 1 and out[1]["total_value"] == 2.0


def test_ewma_matches_recursive_definition(spark, sf_dir):
    """The rescaled-cumsum formulation must equal the textbook
    weighted mean sum r^(t-i) x_i / sum r^(t-i) computed directly in
    python over the trailing window, bit-for-bit at the rounded
    grain."""
    rows = SPECS["ewma_spend_smoothing"].builder(spark, sf_dir).collect()
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    ev = (
        read_testdata(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", F.date_trunc("day", "ts").cast("date").alias("d"), "value")
        .collect()
    )
    daily: dict[tuple[int, object], int] = {}
    for r in ev:
        key = (r["user_id"], r["d"])
        daily[key] = daily.get(key, 0) + int(round(r["value"] * 100))
    series: dict[int, list[tuple[object, int]]] = {}
    for (u, d), x in daily.items():
        series.setdefault(u, []).append((d, x))
    want: dict[tuple[int, object], tuple[float, int]] = {}
    for u, pts in series.items():
        pts.sort()
        prev = None
        for t in range(len(pts)):
            lo = max(0, t - (mining.EWMA_WINDOW - 1))
            num = sum(x * 0.5 ** (t - i) for i, (_, x) in enumerate(pts[lo : t + 1], lo))
            den = sum(0.5 ** (t - i) for i in range(lo, t + 1))
            s = num / den
            spike = int(
                prev is not None and pts[t][1] > mining.EWMA_SPIKE_MULT * prev
            )
            want[(u, pts[t][0])] = (round(s * 1e6) / 1e6, spike)
            prev = s
    assert len(rows) == len(want)
    for r in rows:
        ws, wf = want[(r["user_id"], r["d"])]
        assert abs(r["ewma_r6"] - ws) < 1e-9, (r, ws)
        assert r["spike"] == wf


def test_ewma_first_row_is_identity_and_unflagged(spark, sf_dir):
    """A user's first day: window holds one row, so ewma == x_cents
    exactly and the spike lag is NULL -> 0."""
    rows = SPECS["ewma_spend_smoothing"].builder(spark, sf_dir).collect()
    first: dict[int, object] = {}
    for r in rows:
        if r["user_id"] not in first or r["d"] < first[r["user_id"]]["d"]:
            first[r["user_id"]] = r
    assert first
    for r in first.values():
        assert r["ewma_r6"] == float(r["x_cents"])
        assert r["spike"] == 0


def test_jaccard_link_prediction_matches_bruteforce(spark, sf_dir):
    """Top-K non-edges by Jaccard must equal a python recompute over
    the same affinity graph (set algebra, no inclusion-exclusion)."""
    got = SPECS["jaccard_link_prediction"].builder(spark, sf_dir).collect()
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    rows = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order: dict[int, set[int]] = {}
    for r in rows:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    support: dict[tuple[int, int], int] = {}
    for parts in by_order.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            support[(a, b)] = support.get((a, b), 0) + 1
    edges = {e for e, c in support.items() if c >= mining.TRI_MIN_SUPPORT}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scored = []
    nodes = sorted(adj)
    seen = set()
    for nbrs in [adj[n] for n in nodes]:
        for u, w in itertools.combinations(sorted(nbrs), 2):
            if (u, w) in edges or (u, w) in seen:
                continue
            seen.add((u, w))
            common = len(adj[u] & adj[w])
            jac = common / len(adj[u] | adj[w])
            scored.append((-round(jac * 1e6) / 1e6, u, w, common))
    scored.sort()
    want = scored[: mining.LINK_TOP]
    assert len(got) == len(want)
    for r, (nj, u, w, common) in zip(got, want):
        assert (r["part_a"], r["part_b"]) == (u, w)
        assert r["common_neighbors"] == common
        assert r["deg_a"] == len(adj[u]) and r["deg_b"] == len(adj[w])
        assert abs(r["jaccard_r6"] - (-nj)) < 1e-9


def test_skipgram_window_matches_bruteforce(spark, sf_dir):
    """The shifted-copy equi-join must produce exactly the pairs a
    direct window scan finds: for every position i, tokens at
    i+1..i+W, canonicalised to the unordered key."""
    import math
    import re

    from aws_etl_global_footprint_network_spark.operators import text_analysis as ta
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {
        (r["tok_lo"], r["tok_hi"]): r
        for r in SPECS["skipgram_ppmi_cooccurrence"].builder(spark, sf_dir).collect()
    }
    docs = read_testdata(spark, sf_dir, "documents").select("text").collect()
    pair_c: dict[tuple[str, str], int] = {}
    uni_c: dict[str, int] = {}
    for row in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", row["text"].lower()) if t]
        for t in toks:
            uni_c[t] = uni_c.get(t, 0) + 1
        for i, a in enumerate(toks):
            for b in toks[i + 1 : i + 1 + ta.SKIP_WINDOW]:
                key = (min(a, b), max(a, b))
                pair_c[key] = pair_c.get(key, 0) + 1
    n_tok = sum(uni_c.values())
    t_pair = sum(pair_c.values())
    want = {k: c for k, c in pair_c.items() if c >= ta.SKIP_MIN_PAIR}
    assert set(got) == set(want)
    for (lo, hi), c in want.items():
        r = got[(lo, hi)]
        assert r["c_pair"] == c
        assert r["c_lo"] == uni_c[lo] and r["c_hi"] == uni_c[hi]
        ppmi = max(
            0.0,
            math.log(c / t_pair)
            - math.log(uni_c[lo] / n_tok)
            - math.log(uni_c[hi] / n_tok),
        )
        assert abs(r["ppmi"] - ppmi) < 1e-5


def test_ols_trend_matches_numpy(spark, sf_dir):
    """Slope/intercept/r2 from the sufficient statistics must match
    numpy's least-squares fit per user."""
    import numpy as np

    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {r["user_id"]: r for r in SPECS["spend_trend_ols"].builder(spark, sf_dir).collect()}
    ev = (
        read_testdata(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", F.date_trunc("day", "ts").cast("date").alias("day"), "value")
        .collect()
    )
    daily: dict[tuple[int, object], int] = {}
    for r in ev:
        k = (r["user_id"], r["day"])
        daily[k] = daily.get(k, 0) + int(round(r["value"] * 100))
    series: dict[int, list[tuple[object, int]]] = {}
    for (u, day), y in daily.items():
        series.setdefault(u, []).append((day, y))
    import datetime

    epoch = datetime.date(1970, 1, 1)
    n_checked = 0
    for u, pts in series.items():
        if len(pts) < 2:
            assert u not in got
            continue
        x = np.array([(day - epoch).days for day, _ in pts], dtype=float)
        y = np.array([v for _, v in pts], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        r = got[u]
        assert r["n_days"] == len(pts)
        assert abs(r["slope_r6"] - slope) < 1e-4, (u, r["slope_r6"], slope)
        assert abs(r["intercept_r6"] - intercept) < 1e-2
        if np.std(y) > 0:
            corr = np.corrcoef(x, y)[0, 1]
            assert abs(r["r2_r6"] - corr**2) < 1e-4
        else:
            assert r["r2_r6"] is None
        n_checked += 1
    assert n_checked > 0 and len(got) == n_checked


def test_sliding_active_users_matches_bruteforce(spark, sf_dir):
    """Explode-to-cover-days must equal a direct trailing-window set
    scan per day."""
    import datetime

    from aws_etl_global_footprint_network_spark.operators import behavioral
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {r["day"]: r for r in SPECS["sliding_active_users"].builder(spark, sf_dir).collect()}
    ev = (
        read_testdata(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").cast("date").alias("day"))
        .distinct()
        .collect()
    )
    by_day: dict[object, set[int]] = {}
    for r in ev:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    assert set(got) == set(by_day)
    for day, users in by_day.items():
        win: set[int] = set()
        for k in range(behavioral.WAU_DAYS):
            win |= by_day.get(day - datetime.timedelta(days=k), set())
        r = got[day]
        assert r["dau"] == len(users)
        assert r["wau"] == len(win)
        assert abs(r["stickiness"] - len(users) / len(win)) < 1e-6


def test_bootstrap_ci_brackets_point_and_is_ordered(spark, sf_dir_mid):
    """Structural contract: lo <= hi, both are actual replicate
    means, the interval brackets the point estimate at reasonable n,
    and every segment reports all B replicates."""
    from aws_etl_global_footprint_network_spark.operators import diagnostics as dg

    rows = SPECS["bootstrap_mean_ci"].builder(spark, sf_dir_mid).collect()
    assert len(rows) == 5  # TPC-H market segments
    for r in rows:
        assert r["n_reps"] == dg.BOOT_B
        assert r["ci_lo_r6"] <= r["ci_hi_r6"]
        # ~1500 customers/segment at sf0.01: the 90% interval must
        # bracket the full-sample mean
        assert r["ci_lo_r6"] <= r["point_mean_r6"] <= r["ci_hi_r6"]


def test_bootstrap_replicate_mean_matches_python(spark, sf_dir):
    """One replicate recomputed end-to-end in python (weights from
    the same md5 surrogate) must land inside the returned interval's
    value set construction — checked by recomputing ALL replicate
    means and comparing the order statistics."""
    import hashlib

    from aws_etl_global_footprint_network_spark.operators import diagnostics as dg
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {r["segment"]: r for r in SPECS["bootstrap_mean_ci"].builder(spark, sf_dir).collect()}
    cust = read_testdata(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    ).collect()
    by_seg: dict[str, list[tuple[int, int]]] = {}
    for r in cust:
        by_seg.setdefault(r["c_mktsegment"], []).append(
            (r["c_custkey"], int(round(r["c_acctbal"] * 100)))
        )
    for seg, rows_ in by_seg.items():
        means = []
        for b in range(dg.BOOT_B):
            sw = swx = 0
            for ck, cents in rows_:
                h = int(hashlib.md5(f"boot|{ck}|{b}".encode()).hexdigest()[:15], 16) % 4
                w = 0 if h == 0 else (2 if h == 3 else 1)
                sw += w
                swx += w * cents
            if sw > 0:
                means.append(swx / sw)
        means.sort()
        r = got[seg]
        assert r["n_reps"] == len(means)
        assert abs(r["ci_lo_r6"] - means[dg.BOOT_K_LO - 1]) < 1e-5
        assert abs(r["ci_hi_r6"] - means[dg.BOOT_K_HI - 1]) < 1e-5


def test_acf_matches_numpy_and_is_gap_aware(spark, sf_dir):
    """ACF per (type, lag) must match numpy's Pearson r over
    calendar-day lagged pairs; pairs must never bridge missing days."""
    import datetime

    import numpy as np

    from aws_etl_global_footprint_network_spark.operators import analytics_plus as ap
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {
        (r["event_type"], r["lag_days"]): r
        for r in SPECS["acf_daily_counts"].builder(spark, sf_dir).collect()
    }
    ev = (
        read_testdata(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    series: dict[str, dict[object, int]] = {}
    for r in ev:
        series.setdefault(r["event_type"], {})[r["day"]] = r["n"]
    n_checked = 0
    for etype, by_day in series.items():
        for k in range(1, ap.ACF_MAX_LAG + 1):
            xs, ys = [], []
            for day, x in by_day.items():
                y = by_day.get(day + datetime.timedelta(days=k))
                if y is not None:
                    xs.append(x)
                    ys.append(y)
            key = (etype, k)
            if len(xs) < 3:
                assert key not in got
                continue
            r = got[key]
            assert r["n_pairs"] == len(xs)
            if np.std(xs) > 0 and np.std(ys) > 0:
                want = np.corrcoef(xs, ys)[0, 1]
                assert abs(r["acf_r6"] - want) < 1e-5, (key, r["acf_r6"], want)
            else:
                assert r["acf_r6"] is None
            n_checked += 1
    assert n_checked > 0 and len(got) == n_checked


def test_item_item_cosine_matches_bruteforce(spark, sf_dir):
    """Per-item top-5 cosine shortlist vs a python recompute."""
    import math

    got: dict[int, list] = {}
    for r in SPECS["item_item_cosine_topk"].builder(spark, sf_dir).collect():
        got.setdefault(r["item"], []).append(r)
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    rows = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order: dict[int, set[int]] = {}
    freq: dict[int, int] = {}
    for r in rows:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    for parts in by_order.values():
        for p in parts:
            freq[p] = freq.get(p, 0) + 1
    co: dict[tuple[int, int], int] = {}
    for parts in by_order.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            co[(a, b)] = co.get((a, b), 0) + 1
    nbrs: dict[int, list[tuple[float, int, int]]] = {}
    for (a, b), c in co.items():
        if c < mining.II_MIN_CO:
            continue
        s = round(c / math.sqrt(freq[a] * freq[b]) * 1e6) / 1e6
        nbrs.setdefault(a, []).append((-s, b, c))
        nbrs.setdefault(b, []).append((-s, a, c))
    assert set(got) == set(nbrs)
    for item, lst in nbrs.items():
        lst.sort()
        want = lst[: mining.II_TOP_PER_ITEM]
        have = sorted(got[item], key=lambda r: r["rn"])
        assert len(have) == len(want)
        for r, (ns, other, c) in zip(have, want):
            assert r["other"] == other and r["co_orders"] == c
            assert abs(r["cosine_r6"] + ns) < 1e-9


def test_welch_matches_scipy_formula(spark, sf_dir):
    """t and df must match a direct python Welch computation (scipy
    formula, no scipy dependency) on the same weekday/weekend split."""
    import math

    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {r["event_type"]: r for r in SPECS["welch_mean_test"].builder(spark, sf_dir).collect()}
    ev = (
        read_testdata(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.dayofweek(F.col("ts").cast("date")).isin(1, 7).alias("we"),
            "value",
        )
        .collect()
    )
    groups: dict[str, tuple[list, list]] = {}
    for r in ev:
        wd, wk = groups.setdefault(r["event_type"], ([], []))
        (wk if r["we"] else wd).append(int(round(r["value"] * 100)))
    for etype, (wd, wk) in groups.items():
        if len(wd) < 2 or len(wk) < 2:
            assert etype not in got
            continue
        m1, m2 = sum(wd) / len(wd), sum(wk) / len(wk)
        v1 = sum((x - m1) ** 2 for x in wd) / (len(wd) - 1)
        v2 = sum((x - m2) ** 2 for x in wk) / (len(wk) - 1)
        a1, a2 = v1 / len(wd), v2 / len(wk)
        t = (m1 - m2) / math.sqrt(a1 + a2)
        df = (a1 + a2) ** 2 / (a1 * a1 / (len(wd) - 1) + a2 * a2 / (len(wk) - 1))
        r = got[etype]
        assert r["n_weekday"] == len(wd) and r["n_weekend"] == len(wk)
        assert abs(r["mean_diff_cents_r6"] - (m1 - m2)) < 1e-3
        assert abs(r["t_stat_r6"] - t) < 1e-5
        assert abs(r["welch_df_r6"] - df) < 1e-2


def test_kaplan_meier_matches_reference_estimator(spark, sf_dir):
    """S(t) must equal the textbook product-limit computed directly
    in python, including the censoring rule."""
    from aws_etl_global_footprint_network_spark.operators import behavioral as bh
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {r["tenure_months"]: r for r in SPECS["kaplan_meier_churn"].builder(spark, sf_dir).collect()}
    cust = (
        read_testdata(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min(F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("f"),
            F.max(F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("l"),
        )
        .collect()
    )
    horizon = max(r["l"] for r in cust)
    lt = [
        (r["l"] - r["f"], 0 if horizon - r["l"] <= bh.KM_CENSOR_MONTHS else 1)
        for r in cust
    ]
    total = len(lt)
    byt: dict[int, tuple[int, int]] = {}
    for t, died in lt:
        lv, d = byt.get(t, (0, 0))
        byt[t] = (lv + 1, d + died)
    assert set(got) == set(byt)
    exited = 0
    surv = 1.0
    for t in sorted(byt):
        lv, d = byt[t]
        n_risk = total - exited
        surv *= 1.0 - d / n_risk
        r = got[t]
        assert r["churned"] == d and r["n_at_risk"] == n_risk
        assert abs(r["survival_r6"] - surv) < 1e-5
        exited += lv
    # BOTH KM populations must be non-degenerate on this corpus:
    # real deaths (the curve falls) and real censoring (some rows
    # exit without dying)
    assert any(d > 0 for _, d in byt.values())
    assert any(lv > d for lv, d in byt.values())


def test_chisq_cells_match_scipy_style_recompute(spark, sf_dir):
    """Expected counts and chi-square terms vs a python contingency
    recompute; cells must cover the full observed cross product."""
    import datetime

    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {
        (r["event_type"], r["dow"]): r
        for r in SPECS["chisq_type_weekday"].builder(spark, sf_dir).collect()
    }
    ev = read_testdata(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d")
    ).collect()
    obs: dict[tuple[str, int], int] = {}
    for r in ev:
        dow = r["d"].isoweekday()
        obs[(r["event_type"], dow)] = obs.get((r["event_type"], dow), 0) + 1
    assert set(got) == set(obs)
    n = sum(obs.values())
    rt: dict[str, int] = {}
    ct: dict[int, int] = {}
    for (t, d), c in obs.items():
        rt[t] = rt.get(t, 0) + c
        ct[d] = ct.get(d, 0) + c
    for (t, d), c in obs.items():
        exp = rt[t] * ct[d] / n
        r = got[(t, d)]
        assert r["obs"] == c
        assert abs(r["expected_r6"] - exp) < 1e-5
        assert abs(r["chisq_term_r6"] - (c - exp) ** 2 / exp) < 1e-5


def test_mann_whitney_matches_scipy_formula(spark, sf_dir):
    """U and z vs a direct python rank-sum computation with average
    ranks for ties (the scipy mannwhitneyu formulation)."""
    import math

    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {r["event_type"]: r for r in SPECS["mann_whitney_u"].builder(spark, sf_dir).collect()}
    ev = (
        read_testdata(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.dayofweek(F.col("ts").cast("date")).isin(1, 7).alias("we"),
            "value",
        )
        .collect()
    )
    groups: dict[str, list[tuple[int, int]]] = {}
    for r in ev:
        groups.setdefault(r["event_type"], []).append(
            (int(round(r["value"] * 100)), 1 if r["we"] else 0)
        )
    for etype, rows_ in groups.items():
        n1 = sum(1 for _, w in rows_ if w == 0)
        n2 = len(rows_) - n1
        if n1 < 2 or n2 < 2:
            assert etype not in got
            continue
        ordered = sorted(rows_)
        # average ranks with ties
        ranks: list[float] = [0.0] * len(ordered)
        i = 0
        while i < len(ordered):
            j = i
            while j < len(ordered) and ordered[j][0] == ordered[i][0]:
                j += 1
            avg = (i + 1 + j) / 2
            for k in range(i, j):
                ranks[k] = avg
            i = j
        r1 = sum(rk for (x, w), rk in zip(ordered, ranks) if w == 0)
        u1 = r1 - n1 * (n1 + 1) / 2
        n = n1 + n2
        ties = 0
        i = 0
        while i < len(ordered):
            j = i
            while j < len(ordered) and ordered[j][0] == ordered[i][0]:
                j += 1
            t = j - i
            ties += t**3 - t
            i = j
        mu = n1 * n2 / 2
        var = n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1)))
        r = got[etype]
        assert r["n_weekday"] == n1 and r["n_weekend"] == n2
        assert abs(r["u_stat_r6"] - u1) < 1e-3
        assert abs(r["z_stat_r6"] - (u1 - mu) / math.sqrt(var)) < 1e-5


def test_decile_lift_matches_bruteforce(spark, sf_dir):
    """Deciles, rates, cumulative capture and lift vs a direct python
    recompute of the NTILE + gains-chart arithmetic."""
    from aws_etl_global_footprint_network_spark.operators import ml_prep as mp
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {r["decile"]: r for r in SPECS["decile_lift_table"].builder(spark, sf_dir).collect()}
    cust = read_testdata(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    ).collect()
    buyers = {
        r["o_custkey"]
        for r in read_testdata(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .collect()
    }
    rows_ = sorted(
        (-int(round(r["c_acctbal"] * 100)), r["c_custkey"]) for r in cust
    )
    n = len(rows_)
    k = mp.LIFT_BUCKETS
    # SQL NTILE: first (n % k) buckets get ceil(n/k), rest floor(n/k)
    sizes = [(n // k) + (1 if i < n % k else 0) for i in range(k)]
    deciles: dict[int, list[int]] = {}
    idx = 0
    for b, sz in enumerate(sizes, start=1):
        deciles[b] = [ck for _, ck in rows_[idx : idx + sz]]
        idx += sz
    r_all = sum(1 for _, ck in rows_ if ck in buyers)
    cum = 0
    for b in range(1, k + 1):
        members = deciles[b]
        resp = sum(1 for ck in members if ck in buyers)
        cum += resp
        r = got[b]
        assert r["n_customers"] == len(members)
        assert r["responders"] == resp
        assert abs(r["resp_rate_r6"] - resp / len(members)) < 1e-6
        assert abs(r["cum_capture_r6"] - cum / r_all) < 1e-6
        assert abs(r["lift_r6"] - (resp / len(members)) / (r_all / n)) < 1e-5
    # the outcome must vary on this corpus (not everyone responds)
    assert 0 < r_all < n


def test_next_order_transitions_match_bruteforce(spark, sf_dir):
    """Directional consecutive-order pairs vs a python recompute of
    the per-customer order sequence."""
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got: dict[int, list] = {}
    for r in SPECS["next_order_transitions"].builder(spark, sf_dir).collect():
        got.setdefault(r["part_prev"], []).append(r)
    orders = read_testdata(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    ).collect()
    items = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order: dict[int, set[int]] = {}
    for r in items:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    seq: dict[int, list[tuple[object, int]]] = {}
    for r in orders:
        seq.setdefault(r["o_custkey"], []).append((r["o_orderdate"], r["o_orderkey"]))
    counts: dict[tuple[int, int], int] = {}
    for pts in seq.values():
        pts.sort()
        for (_, ok), (_, nok) in zip(pts, pts[1:]):
            for pa in by_order.get(ok, ()):
                for pb in by_order.get(nok, ()):
                    counts[(pa, pb)] = counts.get((pa, pb), 0) + 1
    want: dict[int, list[tuple[int, int, int]]] = {}
    for (pa, pb), c in counts.items():
        if c >= mining.SEQ_MIN_COUNT:
            want.setdefault(pa, []).append((-c, pb, c))
    assert set(got) == set(want)
    for pa, lst in want.items():
        lst.sort()
        expect = lst[: mining.SEQ_TOP_PER_ITEM]
        have = sorted(got[pa], key=lambda r: r["rn"])
        assert len(have) == len(expect)
        for r, (nc, pb, c) in zip(have, expect):
            assert (r["part_next"], r["n_transitions"]) == (pb, c)


def test_delta_join_terms_partition_the_full_join(spark, sf_dir):
    """The four delta-join terms must be disjoint and cover the full
    join exactly — the product-rule invariant, checked at row grain
    (the registered query only checks the aggregate)."""
    from aws_etl_global_footprint_network_spark.operators import relational2 as r2
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    o = read_testdata(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    c = read_testdata(spark, sf_dir, "customer").select("c_custkey")
    full = o.join(c, o["o_custkey"] == c["c_custkey"]).count()
    terms = []
    for omod_eq in (False, True):
        for cmod_eq in (False, True):
            oo = o.filter(
                (F.col("o_orderkey") % r2.IVM_JOIN_ORDER_MOD == 0)
                if omod_eq
                else (F.col("o_orderkey") % r2.IVM_JOIN_ORDER_MOD != 0)
            )
            cc = c.filter(
                (F.col("c_custkey") % r2.IVM_JOIN_CUST_MOD == 0)
                if cmod_eq
                else (F.col("c_custkey") % r2.IVM_JOIN_CUST_MOD != 0)
            )
            terms.append(oo.join(cc, oo["o_custkey"] == cc["c_custkey"]).count())
    assert sum(terms) == full
    # every term non-empty on this corpus: the split really exercises
    # all four legs of the product rule
    assert all(t > 0 for t in terms)


def test_interval_coverage_matches_bruteforce(spark, sf_dir):
    """Island count / covered time vs a direct python interval-union
    sweep per user."""
    from aws_etl_global_footprint_network_spark.operators import temporal as tp
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {r["user_id"]: r for r in SPECS["interval_coverage_merge"].builder(spark, sf_dir).collect()}
    ev = (
        read_testdata(spark, sf_dir, "events")
        .select("user_id", F.unix_micros("ts").alias("s"))
        .collect()
    )
    by_user: dict[int, list[int]] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r["s"])
    assert set(got) == set(by_user)
    for u, starts in by_user.items():
        starts.sort()
        islands = []
        cur_s, cur_e = None, None
        for s in starts:
            e = s + tp.COVER_SPAN_US
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    islands.append(cur_e - cur_s)
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        islands.append(cur_e - cur_s)
        r = got[u]
        assert r["n_islands"] == len(islands)
        assert r["covered_us"] == sum(islands)
        assert r["longest_us"] == max(islands)
        # merging must actually occur somewhere (else the span is
        # misconfigured for this corpus)
    assert any(r["n_islands"] < len(by_user[u]) for u, r in got.items())


def test_round7_statistical_invariants(spark, sf_dir):
    """Cheap structural invariants across the closing-stretch
    operators — properties that must hold for ANY input, so they
    catch formula regressions the data-specific brute-force tests
    might mask."""
    from aws_etl_global_footprint_network_spark.operators import temporal as tp

    # KM: survival is non-increasing in tenure and within (0, 1]
    km = sorted(
        SPECS["kaplan_meier_churn"].builder(spark, sf_dir).collect(),
        key=lambda r: r["tenure_months"],
    )
    prev = 1.0 + 1e-9
    for r in km:
        assert 0.0 < r["survival_r6"] <= prev + 1e-9
        prev = r["survival_r6"]
    # at-risk counts strictly decrease as tenures exit
    risks = [r["n_at_risk"] for r in km]
    assert all(a >= b for a, b in zip(risks, risks[1:]))

    # EWMA: the smoothed level always lies within the window's value
    # range — check via min/max cents per user (weighted mean bound)
    ew = SPECS["ewma_spend_smoothing"].builder(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in sorted(ew, key=lambda r: (r["user_id"], r["d"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for rows_ in by_user.values():
        for i, r in enumerate(rows_):
            lo = i - 15 if i >= 15 else 0
            window = [q["x_cents"] for q in rows_[lo : i + 1]]
            assert min(window) - 1e-6 <= r["ewma_r6"] <= max(window) + 1e-6

    # interval coverage: bounded by n_events * span and >= one span
    cov = {r["user_id"]: r for r in SPECS["interval_coverage_merge"].builder(spark, sf_dir).collect()}
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    n_ev = {
        r["user_id"]: r["n"]
        for r in read_testdata(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for u, r in cov.items():
        assert tp.COVER_SPAN_US <= r["covered_us"] <= n_ev[u] * tp.COVER_SPAN_US
        assert r["longest_us"] <= r["covered_us"]

    # decile lift: capture is non-decreasing and ends at exactly 1
    lift = sorted(
        SPECS["decile_lift_table"].builder(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    caps = [r["cum_capture_r6"] for r in lift]
    assert all(a <= b + 1e-9 for a, b in zip(caps, caps[1:]))
    assert abs(caps[-1] - 1.0) < 1e-6

    # chi-square: expected counts reproduce the observed marginals
    cells = SPECS["chisq_type_weekday"].builder(spark, sf_dir).collect()
    by_type: dict[str, float] = {}
    obs_type: dict[str, int] = {}
    for r in cells:
        by_type[r["event_type"]] = by_type.get(r["event_type"], 0.0) + r["expected_r6"]
        obs_type[r["event_type"]] = obs_type.get(r["event_type"], 0) + r["obs"]
    for t in by_type:
        assert abs(by_type[t] - obs_type[t]) < 1e-3


def test_ks_matches_scipy_formula(spark, sf_dir):
    """D vs a direct python two-sample KS over the same split."""
    import math

    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {r["event_type"]: r for r in SPECS["ks_two_sample"].builder(spark, sf_dir).collect()}
    ev = (
        read_testdata(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.dayofweek(F.col("ts").cast("date")).isin(1, 7).alias("we"),
            "value",
        )
        .collect()
    )
    groups: dict[str, tuple[list, list]] = {}
    for r in ev:
        wd, wk = groups.setdefault(r["event_type"], ([], []))
        (wk if r["we"] else wd).append(int(round(r["value"] * 100)))
    for etype, (wd, wk) in groups.items():
        if len(wd) < 2 or len(wk) < 2:
            assert etype not in got
            continue
        wd.sort()
        wk.sort()
        xs = sorted(set(wd) | set(wk))
        import bisect

        d = 0.0
        for x in xs:
            f1 = bisect.bisect_right(wd, x) / len(wd)
            f2 = bisect.bisect_right(wk, x) / len(wk)
            d = max(d, abs(f1 - f2))
        r = got[etype]
        assert r["n_weekday"] == len(wd) and r["n_weekend"] == len(wk)
        assert abs(r["ks_d_r6"] - d) < 1e-6
        scaled = d * math.sqrt(len(wd) * len(wk) / (len(wd) + len(wk)))
        assert abs(r["ks_scaled_r6"] - scaled) < 1e-5


def test_asof_nearest_matches_bruteforce(spark, sf_dir):
    """Nearest-purchase match vs a python scan over each user's
    purchase times (backward preferred on equal distance)."""
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {r["event_id"]: r for r in SPECS["asof_nearest_purchase"].builder(spark, sf_dir).collect()}
    ev = (
        read_testdata(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    purch: dict[int, list[int]] = {}
    clicks = []
    for r in ev:
        if r["event_type"] == "purchase":
            purch.setdefault(r["user_id"], []).append(r["us"])
        elif r["event_type"] == "click":
            clicks.append(r)
    assert len(got) == len(clicks)
    for r in clicks:
        ps = purch.get(r["user_id"], [])
        g = got[r["event_id"]]
        if not ps:
            assert g["nearest_pus"] is None and g["gap_us"] is None
            continue
        back = max((p for p in ps if p <= r["us"]), default=None)
        fwd = min((p for p in ps if p >= r["us"]), default=None)
        if back is None:
            want, gap = fwd, fwd - r["us"]
        elif fwd is None:
            want, gap = back, r["us"] - back
        elif r["us"] - back <= fwd - r["us"]:
            want, gap = back, r["us"] - back
        else:
            want, gap = fwd, fwd - r["us"]
        assert g["nearest_pus"] == want and g["gap_us"] == gap
    # both directions must actually win somewhere on this corpus
    wins_back = wins_fwd = 0
    for r in clicks:
        ps = purch.get(r["user_id"], [])
        g = got[r["event_id"]]
        if g["nearest_pus"] is None:
            continue
        if g["nearest_pus"] <= r["us"]:
            wins_back += 1
        else:
            wins_fwd += 1
    assert wins_back > 0 and wins_fwd > 0


def test_yoy_growth_aligns_by_calendar_month(spark, sf_dir):
    """YoY pairs must compare month m against exactly m-12, and the
    ratio must match a python recompute from exact cents."""
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {r["month"]: r for r in SPECS["orders_yoy_growth"].builder(spark, sf_dir).collect()}
    orders = read_testdata(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    cents: dict[tuple[int, int], int] = {}
    for r in orders:
        d = r["o_orderdate"]
        k = (d.year, d.month)
        cents[k] = cents.get(k, 0) + int(round(r["o_totalprice"] * 100))
    import datetime

    expect = {}
    for (y, m), c in cents.items():
        prior = cents.get((y - 1, m))
        if prior is not None:
            expect[datetime.date(y, m, 1)] = (c, prior, c / prior - 1.0)
    assert set(got) == set(expect)
    for month, (c, p, g) in expect.items():
        r = got[month]
        assert abs(r["revenue"] - c / 100.0) < 1e-6
        assert abs(r["revenue_prior_year"] - p / 100.0) < 1e-6
        assert abs(r["yoy_growth_r6"] - g) < 1e-6


def test_l_diversity_matches_bruteforce(spark, sf_dir_mid):
    """Group diversity counts vs a python recompute with integer
    floor-div bucketing; the audit must be non-degenerate (some
    group actually low-diversity OR min_l meaningful)."""
    from aws_etl_global_footprint_network_spark.operators import diagnostics as dg
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    row = SPECS["l_diversity_audit"].builder(spark, sf_dir_mid).collect()[0]
    cust = read_testdata(spark, sf_dir_mid, "customer").select(
        "c_nationkey", "c_acctbal", "c_mktsegment"
    ).collect()
    groups: dict[tuple[int, int], tuple[int, set]] = {}
    for r in cust:
        b = (int(round(r["c_acctbal"] * 100)) + dg.BAL_OFFSET_CENTS) // dg.BAL_BUCKET_CENTS
        k = (r["c_nationkey"], b)
        cnt, segs = groups.get(k, (0, set()))
        segs = segs | {r["c_mktsegment"]}
        groups[k] = (cnt + 1, segs)
    n_groups = len(groups)
    low = [(cnt, segs) for cnt, segs in groups.values() if len(segs) < dg.L_DIVERSITY]
    assert row["n_groups"] == n_groups
    assert row["n_low_diversity_groups"] == len(low)
    assert row["n_rows_at_risk"] == sum(c for c, _ in low)
    assert row["min_l"] == min(len(s) for _, s in groups.values())
    total = sum(c for c, _ in groups.values())
    assert abs(row["disclosure_rate"] - sum(c for c, _ in low) / total) < 1e-6


def test_feature_hashing_matches_bruteforce(spark, sf_dir):
    """Signed-bucket weights vs a python md5 recompute; sparsity
    contract (no zero weights, <= FH_DIM dims per doc)."""
    import hashlib
    import re

    from aws_etl_global_footprint_network_spark.operators import ml_prep as mp
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    got: dict[tuple[int, int], int] = {}
    per_doc: dict[int, int] = {}
    for r in SPECS["feature_hashing_vectorize"].builder(spark, sf_dir).collect():
        got[(r["doc_id"], r["dim"])] = r["weight"]
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
        assert r["weight"] != 0
    assert max(per_doc.values()) <= mp.FH_DIM
    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "text").collect()
    want: dict[tuple[int, int], int] = {}
    for row in docs:
        for t in re.split(r"[^a-z0-9]+", row["text"].lower()):
            if not t:
                continue
            dim = h60(f"fh|{t}") % mp.FH_DIM
            sgn = 1 if h60(f"fhsign|{t}") % 2 == 0 else -1
            k = (row["doc_id"], dim)
            want[k] = want.get(k, 0) + sgn
    want = {k: v for k, v in want.items() if v != 0}
    assert got == want


def test_psi_bins_and_terms_match_bruteforce(spark, sf_dir_mid):
    """Bin edges (baseline NTILE maxima), bin assignment and PSI
    terms vs a python recompute."""
    import math

    from aws_etl_global_footprint_network_spark.operators import diagnostics as dg
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {r["bin"]: r for r in SPECS["psi_score_drift"].builder(spark, sf_dir_mid).collect()}
    cust = read_testdata(spark, sf_dir_mid, "customer").select(
        "c_custkey", "c_acctbal"
    ).collect()
    rows_ = [(r["c_custkey"], int(round(r["c_acctbal"] * 100))) for r in cust]
    base = sorted(
        ((s, k) for k, s in rows_ if k % 2 == 0)
    )
    n = len(base)
    k = dg.PSI_BINS
    sizes = [(n // k) + (1 if i < n % k else 0) for i in range(k)]
    edges = []
    idx = 0
    for sz in sizes[:-1]:
        idx += sz
        edges.append(base[idx - 1][0])
    def bin_of(s: int) -> int:
        return 1 + sum(1 for e in edges if s > e)
    n_base = [0] * (k + 1)
    n_cur = [0] * (k + 1)
    for ck, s in rows_:
        b = bin_of(s)
        if ck % 2 == 0:
            n_base[b] += 1
        else:
            n_cur[b] += 1
    tb, tc = sum(n_base), sum(n_cur)
    for b in range(1, k + 1):
        if n_base[b] == 0 and n_cur[b] == 0:
            assert b not in got
            continue
        r = got[b]
        assert r["n_base"] == n_base[b] and r["n_cur"] == n_cur[b]
        if n_base[b] > 0 and n_cur[b] > 0:
            p, q = n_base[b] / tb, n_cur[b] / tc
            assert abs(r["psi_term_r6"] - (p - q) * math.log(p / q)) < 1e-5
        else:
            assert r["psi_term_r6"] is None
    # baseline deciles: every baseline bin holds ~n/k rows
    assert all(abs(n_base[b] - n / k) <= 1 for b in range(1, k + 1))


def test_map_suite_roundtrip_is_lossless(spark, sf_dir):
    """The map construction/filter/explode chain must reproduce the
    plain filtered groupBy exactly, including NOT emitting
    sub-threshold entries."""
    from aws_etl_global_footprint_network_spark.operators import advanced as av
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {
        (r["user_id"], r["event_type"]): r["n"]
        for r in SPECS["map_functions_suite"].builder(spark, sf_dir).collect()
    }
    ev = read_testdata(spark, sf_dir, "events").select("user_id", "event_type").collect()
    want: dict[tuple[int, str], int] = {}
    for r in ev:
        k = (r["user_id"], r["event_type"])
        want[k] = want.get(k, 0) + 1
    kept = {k: v for k, v in want.items() if v >= av.MAP_MIN_COUNT}
    assert got == kept
    # the filter must actually drop something on this corpus
    assert len(kept) < len(want)


def test_partial_corr_matches_numpy(spark, sf_dir):
    """Partial r vs numpy's pairwise-corr composition."""
    import numpy as np

    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {r["l_returnflag"]: r for r in SPECS["partial_corr_price_qty"].builder(spark, sf_dir).collect()}
    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity", "l_discount"
    ).collect()
    groups: dict[str, list] = {}
    for r in li:
        groups.setdefault(r["l_returnflag"], []).append(
            (r["l_extendedprice"], r["l_quantity"], r["l_discount"])
        )
    for flag, rows_ in groups.items():
        a = np.array(rows_, dtype=float)
        r_xy = np.corrcoef(a[:, 0], a[:, 1])[0, 1]
        r_xz = np.corrcoef(a[:, 0], a[:, 2])[0, 1]
        r_yz = np.corrcoef(a[:, 1], a[:, 2])[0, 1]
        want = (r_xy - r_xz * r_yz) / np.sqrt((1 - r_xz**2) * (1 - r_yz**2))
        r = got[flag]
        assert r["n"] == len(rows_)
        assert abs(r["r_xy_r6"] - r_xy) < 1e-5
        assert abs(r["partial_r_r6"] - want) < 1e-5


def test_spearman_matches_scipy_formula(spark, sf_dir):
    """Rank-free Spearman vs a direct python average-rank Pearson."""
    import math

    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    got = {r["l_returnflag"]: r for r in SPECS["spearman_rank_corr"].builder(spark, sf_dir).collect()}
    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    groups: dict[str, list[tuple[int, int]]] = {}
    for r in li:
        groups.setdefault(r["l_returnflag"], []).append(
            (int(round(r["l_extendedprice"] * 100)), int(r["l_quantity"]))
        )

    def avg_ranks(vals: list[int]) -> dict[int, float]:
        out: dict[int, float] = {}
        ordered = sorted(vals)
        i = 0
        while i < len(ordered):
            j = i
            while j < len(ordered) and ordered[j] == ordered[i]:
                j += 1
            out[ordered[i]] = (i + 1 + j) / 2
            i = j
        return out

    for flag, rows_ in groups.items():
        rx = avg_ranks([x for x, _ in rows_])
        ry = avg_ranks([y for _, y in rows_])
        pairs = [(rx[x], ry[y]) for x, y in rows_]
        n = len(pairs)
        s1 = sum(a for a, _ in pairs)
        s2 = sum(b for _, b in pairs)
        s11 = sum(a * a for a, _ in pairs)
        s22 = sum(b * b for _, b in pairs)
        s12 = sum(a * b for a, b in pairs)
        num = n * s12 - s1 * s2
        d1, d2 = n * s11 - s1 * s1, n * s22 - s2 * s2
        r = got[flag]
        assert r["n"] == n
        if d1 > 0 and d2 > 0:
            want = num / math.sqrt(d1 * d2)
            assert abs(r["spearman_r6"] - want) < 1e-5
        else:
            assert r["spearman_r6"] is None


def test_gini_distributed_rank_branch_matches_window_branch(spark, sf_dir):
    """Round-13 pin: the over-cap branch (distributed_row_number +
    driver-computed per-segment offsets) must produce row-identical
    gini output to the under-cap per-segment window branch."""
    from aws_etl_global_footprint_network_spark.functions import ranking

    base = sorted(
        map(
            tuple,
            SPECS["gini_revenue_concentration"].builder(spark, sf_dir).collect(),
        )
    )
    saved = ranking.ROWSCALE_WINDOW_CAP
    ranking.ROWSCALE_WINDOW_CAP = 1  # force the distributed branch
    try:
        forced = sorted(
            map(
                tuple,
                SPECS["gini_revenue_concentration"]
                .builder(spark, sf_dir)
                .collect(),
            )
        )
    finally:
        ranking.ROWSCALE_WINDOW_CAP = saved
    assert base == forced
