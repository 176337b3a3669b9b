"""Z-order layout: the skipping-bounds table must actually skip —
a single-column predicate on EITHER dimension prunes most files,
which is the property a linear sort cannot give for the second key."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_global_footprint_network_spark.operators.layout import (
    ZFILES,
    ZMAX,
    zorder_layout,
)


def test_zorder_files_skip_in_both_dimensions(spark, sf_dir):
    files = zorder_layout(spark, sf_dir).collect()
    assert len(files) == ZFILES
    # point-ish predicate: a 1/16-wide value band in each dimension
    band = ZMAX // 16
    for lo_attr, hi_attr in (("pk_min", "pk_max"), ("sk_min", "sk_max")):
        hit = [
            f
            for f in files
            if getattr(f, lo_attr) <= band and getattr(f, hi_attr) >= 0
        ]
        # a linear sort on pk leaves every file spanning all of sk;
        # z-order must prune the majority of files for both columns
        assert len(hit) <= len(files) // 2, (lo_attr, len(hit), len(files))


def test_zorder_covers_all_rows(spark, sf_dir):
    from aws_etl_global_footprint_network_spark.sources.readers import read_testdata

    files = zorder_layout(spark, sf_dir).collect()
    total = sum(f.n_rows for f in files)
    assert total == read_testdata(spark, sf_dir, "lineitem").count()
