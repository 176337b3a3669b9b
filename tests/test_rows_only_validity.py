"""Local semantic pins for queries whose registered form was once
rows-only (all are oracle-paired now — approx_distinct since round 3,
multimodal_features since round 5, streaming_user_totals_stateful
since round 6 via integer-cents state): sketch error bounds, decoded
feature shape/determinism, and stateful-stream output shape stay
pinned here beyond what a value hash can express."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.registry import load_all
from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

SPECS = load_all()


def test_approx_distinct_within_error(spark, sf_dir_mid):
    # Hash-checkable shape since round 3: exact distinct count (the
    # verification twin) + a boolean pinning the HLL inside 5%.
    got = {
        r.l_returnflag: (r.exact_parts, r.approx_within_5pct)
        for r in SPECS["approx_distinct_parts"].builder(spark, sf_dir_mid).collect()
    }
    li = read_testdata(spark, sf_dir_mid, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for flag, n_exact in exact.items():
        n_got, within = got[flag]
        assert n_got == n_exact, (flag, n_got, n_exact)
        assert within is True, flag


def test_multimodal_features_shape_and_determinism(spark, sf_dir):
    # Full featurized shape (library API; the registered query is the
    # header-only oracle-paired projection since round 5):
    # format/width/height come from the real header parse.
    from aws_etl_global_footprint_network_spark.operators.multimodal import (
        multimodal_features_full,
    )

    df1 = multimodal_features_full(spark, sf_dir)
    rows1 = {
        (r.doc_id, r.feature_pos): (r.n_bytes, r.format, r.width, r.height, r.feature_val)
        for r in df1.collect()
    }
    docs = read_testdata(spark, sf_dir, "documents")
    from aws_etl_global_footprint_network_spark.operators.multimodal import FEATURE_DIM

    assert len(rows1) == docs.count() * FEATURE_DIM
    for (doc_id, pos), (n_bytes, fmt, _w, _h, val) in rows1.items():
        assert 0 <= pos < FEATURE_DIM and n_bytes > 0 and val is not None
        assert fmt in ("png", "unknown")
    # deterministic across runs (header parse + byte stats are pure)
    rows2 = {
        (r.doc_id, r.feature_pos): (r.n_bytes, r.format, r.width, r.height, r.feature_val)
        for r in multimodal_features_full(spark, sf_dir).collect()
    }
    assert rows1 == rows2
    # the array-returning library API keeps one row per doc
    from aws_etl_global_footprint_network_spark.operators.multimodal import (
        attach_binary_payload,
        extract_features,
    )

    lib = extract_features(attach_binary_payload(docs))
    first = lib.limit(1).collect()[0]
    assert len(first.features) == FEATURE_DIM


def test_stateful_streaming_rows_shape(spark, sf_dir):
    out = SPECS["streaming_user_totals_stateful"].builder(spark, sf_dir)
    assert set(out.columns) == {"user_id", "n_events", "total_value"}
    users = read_testdata(spark, sf_dir, "events").select("user_id").distinct().count()
    assert out.count() == users
