"""The BPE pre-tokenizer pattern must split identically in Spark
(Java regex) and DuckDB (RE2) — pinned here on fixtures that exercise
every alternative: contractions, space-prefixed letter/digit runs,
punctuation runs, and whitespace runs."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from aws_etl_global_footprint_network_spark.operators.text_analysis import (
    BPE_PATTERN,
)

FIXTURES = [
    "the fast key order, don't stop 123 times!",
    "a  b\tc 42.5x",
    "it's we're I'll you've he'd I'm",
    "hello",
    "",
    "...!!  ??",
]

EXPECTED_FIRST = [
    "the", " fast", " key", " order", ",", " don", "'t",
    " stop", " 123", " times", "!",
]


def test_bpe_pattern_splits_identically_across_engines(spark):
    pat_sql = BPE_PATTERN.replace("'", "''")
    duck = [
        r[0]
        for r in duckdb.sql(
            f"SELECT regexp_extract_all(t, '{pat_sql}') FROM "
            "(SELECT unnest(?) AS t)",
            params=[FIXTURES],
        ).fetchall()
    ]
    df = spark.createDataFrame([(t,) for t in FIXTURES], "t string")
    got = [
        row.x
        for row in df.select(
            F.regexp_extract_all("t", F.lit(BPE_PATTERN), 0).alias("x")
        ).collect()
    ]
    assert got == duck
    assert got[0] == EXPECTED_FIRST
    # every non-empty fixture is reconstructed exactly by its tokens
    for text, toks in zip(FIXTURES, got):
        assert "".join(toks) == text
