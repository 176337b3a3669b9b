"""Property-based check (hypothesis): asof_join agrees with a direct
per-row reference implementation on arbitrary key/timestamp data."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_etl_global_footprint_network_spark.operators.temporal import asof_join

keys = st.integers(min_value=0, max_value=3)
ts = st.integers(min_value=0, max_value=50)

left_rows = st.lists(st.tuples(keys, ts), min_size=1, max_size=25)
right_rows = st.lists(
    st.tuples(keys, ts, st.integers(0, 1000)), min_size=0, max_size=25,
    unique_by=lambda r: (r[0], r[1]),  # (key, ts) unique -> deterministic
)


def _reference(left, right):
    out = {}
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for (rk, rt, v) in right if rk == k and rt <= t]
        out[i] = max(cands)[1] if cands else None
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=left_rows, right=right_rows)
def test_asof_join_matches_reference(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "row_id long, k long, t long"
    )
    rdf = spark.createDataFrame(right or [(99, -1, 0)], "k long, rt long, v long")
    if not right:
        rdf = rdf.filter("k < 0")  # empty right side
    got = {
        r.row_id: r.v
        for r in asof_join(ldf, rdf, ["k"], "t", "rt", ["v"]).collect()
    }
    assert got == _reference(left, right)
