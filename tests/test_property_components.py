"""Property-based check (hypothesis): the distributed min-label
propagation in ml_prep.connected_components agrees with a direct
union-find on arbitrary small graphs — including chains longer than
one propagation round, cycles, and disconnected singleton pairs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_etl_global_footprint_network_spark.operators.ml_prep import (
    connected_components,
)

node = st.integers(min_value=0, max_value=30)
edges_strategy = st.lists(
    st.tuples(node, node).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical label = min node in component
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for root, members in comp.items() for n in members}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edges_strategy)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.cluster_id for r in connected_components(df).collect()}
    assert got == _union_find(edges)


def test_long_chain_converges(spark):
    """Regression: a chain whose diameter exceeds the old fixed round
    budget must still fully converge (pointer jumping makes this
    O(log n) rounds), never silently return partial labels."""
    n = 64
    edges = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.cluster_id for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_nonconvergence_raises(spark):
    """max_iter is a safety bound: exceeding it raises instead of
    returning wrong clusters."""
    import pytest

    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "u long, v long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)
