"""Persist lifecycle: repeated invocation of the cache-scoped queries
must keep executor storage flat (one live generation per query), per
the long-lived-session contract of functions.cache.CacheScope."""

from __future__ import annotations

from aws_etl_global_footprint_network_spark.functions.cache import release_all
from aws_etl_global_footprint_network_spark.registry import load_all

SPECS = load_all()
SCOPED = ["dedup_minhash_lsh", "dedup_ngram_jaccard", "ann_lsh_pairs"]


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_repeated_invocation_keeps_storage_flat(spark, sf_dir):
    release_all()
    assert _n_persistent(spark) == 0
    for name in SCOPED:
        SPECS[name].builder(spark, sf_dir).count()
    after_one = _n_persistent(spark)
    assert after_one > 0  # the scopes really do persist something
    for _ in range(3):
        for name in SCOPED:
            SPECS[name].builder(spark, sf_dir).count()
    # re-entering each scope unpersists the previous generation
    assert _n_persistent(spark) == after_one
    release_all()
    assert _n_persistent(spark) == 0
