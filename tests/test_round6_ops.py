"""Invariant tests for the round-6 curation operators (oracle parity
is covered by tests/test_oracle_parity.py's all-query sweep; these pin
the semantic properties a hash can't name)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.operators.curation import (
    CDC_DELETE_MOD,
    COMPACT_TARGET_BYTES,
    HN_PER_ANCHOR,
    N_SHARDS,
    NEG_HI,
    NEG_LO,
    WS_K,
)
from aws_etl_global_footprint_network_spark.registry import load_all
from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

SPECS = load_all()


def test_cdc_compaction_tombstones_and_state(spark, sf_dir):
    out = SPECS["cdc_apply_compaction"].builder(spark, sf_dir)
    rows = out.collect()
    ev = read_testdata(spark, sf_dir, "events")
    # a key whose LAST op is a delete must be absent
    last_ops = {
        (r.user_id, r.event_type): (r.seq, r.seq % CDC_DELETE_MOD == 0)
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.max("event_id").alias("seq"))
        .collect()
    }
    keys_out = {(r.user_id, r.event_type) for r in rows}
    for key, (_seq, deleted) in last_ops.items():
        assert (key not in keys_out) == deleted, (key, deleted)
    # final_value is the payload of the max-seq op for a spot key
    some = rows[0]
    expect = (
        ev.filter(
            (F.col("user_id") == some.user_id)
            & (F.col("event_type") == some.event_type)
        )
        .orderBy(F.col("event_id").desc())
        .select("value")
        .first()
        .value
    )
    assert some.final_value == expect


def test_file_compaction_plan_next_fit_properties(spark, sf_dir):
    rows = SPECS["file_compaction_plan"].builder(spark, sf_dir).collect()
    by_year: dict[int, list] = {}
    for r in rows:
        by_year.setdefault(r.year, []).append(r)
    for year, bins in by_year.items():
        bins.sort(key=lambda r: r.bin)
        # bins are dense 0..n-1 and cover contiguous month ranges
        assert [b.bin for b in bins] == list(range(len(bins))), year
        for prev, cur in zip(bins, bins[1:]):
            assert prev.last_month < cur.first_month, (year, prev, cur)
        # next-fit: every bin except possibly the last one closed
        # because the running total reached the target
        for b in bins[:-1]:
            assert b.total_bytes >= COMPACT_TARGET_BYTES - 128 * 1024, b


def test_weighted_sample_prefers_heavy_rows(spark, sf_dir):
    out = SPECS["weighted_sample_topk"].builder(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == WS_K
    assert sorted(r.rank for r in rows) == list(range(1, WS_K + 1))
    sample_avg = sum(r.o_totalprice for r in rows) / WS_K
    corpus_avg = (
        read_testdata(spark, sf_dir, "orders")
        .agg(F.avg("o_totalprice"))
        .collect()[0][0]
    )
    # weight-proportional selection: the sample skews heavy
    assert sample_avg > corpus_avg * 1.1, (sample_avg, corpus_avg)


def test_token_entropy_bounds_and_gate(spark, sf_dir):
    rows = SPECS["token_entropy_gate"].builder(spark, sf_dir).collect()
    import math

    for r in rows:
        # 0 <= H <= ln(distinct) (uniform maximises entropy)
        assert -1e-9 <= r.entropy_nats <= math.log(r.n_distinct) + 1e-6, r
        assert r.low_entropy == (r.entropy_nats < 3.0), r


def test_bigram_lm_scores_are_log_probs(spark, sf_dir):
    rows = SPECS["bigram_lm_score"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.avg_logp < 0, r  # probabilities < 1
        assert r.n_bigrams >= 1


def test_hard_negatives_in_band_and_exclude_twins(spark, sf_dir):
    from aws_etl_global_footprint_network_spark.operators.similarity import (
        TWIN_OFFSET,
    )

    rows = SPECS["hard_negative_mining"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert NEG_LO <= r.cos < NEG_HI, r
        assert 1 <= r.rank <= HN_PER_ANCHOR, r
        # planted twins (cos ~0.99) must never be mined as negatives
        assert r.negative_id - r.anchor_id != TWIN_OFFSET, r


def test_ngram_novelty_bounds(spark, sf_dir):
    rows = SPECS["ngram_novelty_score"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_novel <= r.n_grams, r
        assert 0.0 <= r.novelty <= 1.0, r
    # the corpus contains templated word-salad docs: novelty must
    # actually separate (not be constant 1.0 or 0.0)
    vals = {r.novelty for r in rows}
    assert len(vals) > 1


def test_streaming_cdc_equals_batch(spark, sf_dir):
    stream = {
        (r.user_id, r.event_type): (r.n_ops, r.last_seq, r.final_value)
        for r in SPECS["streaming_cdc_compaction"].builder(spark, sf_dir).collect()
    }
    batch = {
        (r.user_id, r.event_type): (r.n_ops, r.last_seq, r.final_value)
        for r in SPECS["cdc_apply_compaction"].builder(spark, sf_dir).collect()
    }
    assert stream == batch


def test_cms_never_underestimates(spark, sf_dir):
    """The count-min guarantee: estimate >= exact, always."""
    rows = SPECS["cms_frequency_estimates"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cms_estimate >= r.exact_n, r
        assert r.overcount == r.cms_estimate - r.exact_n, r


def test_rendezvous_consistent_hashing_property(spark, sf_dir):
    """HRW's reason to exist: adding a shard moves ~1/(n+1) of keys
    (mod-N routing would move ~n/(n+1)), and the load stays near
    uniform. Both are measured, not assumed."""
    from aws_etl_global_footprint_network_spark.operators.curation import (
        HRW_SHARDS,
    )

    rows = SPECS["rendezvous_shard_affinity"].builder(spark, sf_dir).collect()
    assert len(rows) == HRW_SHARDS
    n = sum(r.n_docs for r in rows)
    moved = sum(r.n_moved_if_add_one for r in rows)
    expected = n / (HRW_SHARDS + 1)
    assert 0.5 * expected <= moved <= 2.0 * expected, (moved, expected)
    assert max(r.n_docs for r in rows) <= 2.0 * n / HRW_SHARDS, rows


def test_winsorized_mean_between_bounds(spark, sf_dir):
    rows = SPECS["winsorized_acctbal_stats"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p05 <= r.p95, r
        assert r.p05 <= r.winsorized_mean <= r.p95, r


def test_incremental_agg_equals_direct(spark, sf_dir):
    """The IVM contract, asserted directly (the oracle asserts it via
    hash): base+delta merge == full recompute."""
    merged = {
        r.user_id: (r.n_events, r.total_value)
        for r in SPECS["incremental_agg_maintenance"]
        .builder(spark, sf_dir)
        .collect()
    }
    ev = read_testdata(spark, sf_dir, "events")
    direct = {
        r.user_id: (r.n, round(r.cents / 100.0, 2))
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert {k: (n, round(t, 2)) for k, (n, t) in merged.items()} == direct


def test_source_jsd_nonnegative_and_bounded(spark, sf_dir):
    import math

    rows = SPECS["source_jsd_divergence"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # JSD (nats) lives in [0, ln 2]
        assert -1e-9 <= r.jsd <= math.log(2) + 1e-9, r


def test_semantic_dedup_drops_planted_twins(spark, sf_dir):
    """SemDeDup must catch EVERY planted twin pair: a twin differs
    only by a positive per-coordinate scale, so it shares the sign
    cell by construction — the cluster key was chosen precisely so
    duplicates never split (nearest-centroid cells split 22% of the
    twins on this isotropic corpus; the measured number is in the
    operator's module comment)."""
    from aws_etl_global_footprint_network_spark.operators.similarity import (
        TWIN_EVERY,
        TWIN_OFFSET,
        augmented_embeddings,
    )

    dropped = {
        r.vec_id
        for r in SPECS["semantic_dedup_drop"].builder(spark, sf_dir).collect()
    }
    n_vecs = (
        augmented_embeddings(spark, sf_dir).count() * TWIN_EVERY
        // (TWIN_EVERY + 1)
    )
    n_twins = (n_vecs + TWIN_EVERY - 1) // TWIN_EVERY
    # each twin pair must lose exactly one member; recall = 1.0
    caught = sum(
        1
        for v in range(0, n_vecs, TWIN_EVERY)
        if (v in dropped) != (v + TWIN_OFFSET in dropped)
    )
    assert caught == n_twins, (caught, n_twins)
    # never drop BOTH members of a pair
    for v in range(0, n_vecs, TWIN_EVERY):
        assert not (v in dropped and v + TWIN_OFFSET in dropped), v


def test_shard_assignment_balances_tokens(spark, sf_dir):
    rows = SPECS["shard_assignment_balanced"].builder(spark, sf_dir).collect()
    assert len(rows) == N_SHARDS
    docs = [r.n_docs for r in rows]
    toks = [r.total_tokens for r in rows]
    assert max(docs) - min(docs) <= 1  # round-robin doc counts
    # longest-first round-robin: token mass within a few % across shards
    assert max(toks) <= min(toks) * 1.05, rows
