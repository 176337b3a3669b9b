"""Differential test: every registered query vs its DuckDB oracle at
sf0.001 (fast) — the local replica of the driver's correctness gate.
A separate slow marker runs sf0.01 (what the driver actually uses)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.registry import load_all
from tests.oracle_harness import compare, duck_connection

SPECS = load_all()
ORACLE_SPECS = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_SPECS = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_oracle_parity(spark, sf_dir, con, name):
    spec = SPECS[name]
    df = spec.builder(spark, sf_dir)
    res = compare(name, df, spec.oracle, con)
    assert res.ok, f"{name}: {res.detail} {res.mismatches}"


@pytest.mark.parametrize("name", ROWS_ONLY_SPECS)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = SPECS[name].builder(spark, sf_dir)
    assert df.count() >= 0 and len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_every_oracle_key_has_query():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
