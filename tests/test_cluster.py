"""Connected-components dedup clustering: unit semantics on hand-built
graphs, plus a hypothesis differential against a sequential union-find
(the differential gate covers the LSH-fed query end-to-end)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.dedup.cluster import (
    connected_components,
    dedup_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# Every shape test runs on BOTH execution strategies: the driver
# union-find (default cap) and the distributed propagation loop
# (driver_edge_cap=0) — the adaptive gate must be invisible in results.
_CAPS = pytest.mark.parametrize("cap", [65536, 0], ids=["driver", "loop"])


@_CAPS
def test_two_components_and_chain(spark, cap):
    # {1,2,3} dense triangle, {10,11,12,13} a chain — min-label must cross
    # the whole chain (exercises multi-round propagation).
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13)])
    got = {
        (r.node, r.label)
        for r in connected_components(e, driver_edge_cap=cap).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10), (13, 10)}


@_CAPS
def test_edge_orientation_irrelevant(spark, cap):
    # Same component regardless of (src, dst) order.
    got = {
        (r.node, r.label)
        for r in connected_components(
            _edges(spark, [(5, 2), (2, 9)]), driver_edge_cap=cap
        ).collect()
    }
    assert got == {(2, 2), (5, 2), (9, 2)}


@_CAPS
def test_explicit_node_superset_keeps_isolated(spark, cap):
    nodes = spark.createDataFrame([(1,), (2,), (99,)], "node long")
    e = _edges(spark, [(1, 2)])
    got = {
        (r.node, r.label)
        for r in connected_components(
            e, nodes=nodes, driver_edge_cap=cap
        ).collect()
    }
    assert got == {(1, 1), (2, 1), (99, 99)}


def test_dedup_clusters_full_corpus_labeling(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame([(2, 4), (4, 6)], "id_a long, id_b long")
    rows = {r.doc_id: r for r in dedup_clusters(docs, pairs).collect()}
    assert len(rows) == 6
    assert [rows[i].cluster_id for i in (2, 4, 6)] == [2, 2, 2]
    assert [rows[i].cluster_id for i in (1, 3, 5)] == [1, 3, 5]
    assert rows[2].is_canonical and not rows[4].is_canonical
    assert rows[2].cluster_size == 3 and rows[1].cluster_size == 1
    # canonical count == number of clusters
    assert sum(1 for r in rows.values() if r.is_canonical) == 4


def test_nonconvergence_raises(spark):
    # max_iter=1 (= 2 propagation hops) cannot close a 4-node chain.
    # driver_edge_cap=0 forces the loop (the tiny chain would otherwise
    # take the union-find path and never iterate)
    e = _edges(spark, [(10, 11), (11, 12), (12, 13)])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(e, max_iter=1, driver_edge_cap=0)


@_CAPS
@settings(max_examples=8, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=12,
    )
)
def test_random_graphs_match_union_find(spark, cap, pairs):
    """BOTH execution strategies must reach the same unique fixpoint
    (min node id per component) as a sequential union-find on ANY edge
    list — including self-loops, duplicate/reversed edges, and the chain
    shapes that need the most rounds. Guards the fused round structure
    and its hop-2-only convergence test against off-by-one-hop early
    exits, and the driver union-find against min-root drift."""
    parent = list(range(10))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in pairs for n in e}
    want = {n: find(n) for n in nodes}

    e = _edges(spark, [(a, b) for a, b in pairs])
    got = {
        r.node: r.label
        for r in connected_components(e, driver_edge_cap=cap).collect()
    }
    assert got == want


def test_driver_path_runs_bounded_eager_jobs(spark):
    """The adaptive closure's whole point is SCHEDULER-JOB economy: the
    loop path ran ~30 eager checkpoint/AQE jobs even on a 3-edge graph.
    Pin the driver path to a small constant of eager jobs (adjacency
    checkpoint + the bounded collect, each possibly split by AQE) so a
    refactor that silently re-introduces per-round materialization fails
    here instead of waiting for a bench regression."""
    e = _edges(spark, [(1, 2), (2, 3), (10, 11)])
    sc = spark.sparkContext
    sc.setJobGroup("cc-probe", "cc-probe")
    try:
        connected_components(e)  # labels DF built, NOT consumed
        jobs = len(sc.statusTracker().getJobIdsForGroup("cc-probe"))
    finally:
        sc.setJobGroup(None, None)
    assert jobs <= 6, (
        f"driver-path closure ran {jobs} eager jobs — the bounded-collect "
        "contract (adjacency checkpoint + limit(cap+1) collect) is broken"
    )


def test_cap_boundary_falls_through_to_loop(spark):
    """A graph whose undirected edge count exceeds the cap must take the
    distributed loop and still produce the exact fixpoint — pins the
    limit(cap+1) probe's fall-through arithmetic (an off-by-one that
    collected a TRUNCATED edge list would silently under-merge)."""
    e = _edges(spark, [(i, i + 1) for i in range(5)])  # 5-edge chain
    got = {
        r.node: r.label
        for r in connected_components(e, driver_edge_cap=4).collect()
    }
    assert got == {i: 0 for i in range(6)}
    # and exactly at the cap the driver path must still merge everything
    got = {
        r.node: r.label
        for r in connected_components(e, driver_edge_cap=5).collect()
    }
    assert got == {i: 0 for i in range(6)}
