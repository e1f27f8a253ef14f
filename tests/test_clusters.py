"""Connected-components near-dup clustering (operators/clusters.py)."""

import pytest
from pyspark.sql import functions as F

from p2pddsketch_spark.operators.clusters import connected_components, neardup_clusters


def test_cc_chain_and_islands(spark):
    """A long chain (needs multiple propagation rounds), a triangle, and
    an isolated pair — every vertex labeled with its component minimum."""
    edges = [(2, 3), (3, 4), (4, 5), (5, 6), (6, 7),      # chain 2..7
             (10, 11), (11, 12), (10, 12),                 # triangle
             (20, 21)]                                     # pair
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {(r["id"], r["comp"]) for r in connected_components(df).collect()}
    want = {(i, 2) for i in range(2, 8)} | {(i, 10) for i in (10, 11, 12)} | \
           {(20, 20), (21, 20)}
    assert got == want


def test_cc_direction_invariant(spark):
    """Edge direction must not matter (the pair lists emit id_a < id_b,
    but the operator contract is undirected)."""
    a = spark.createDataFrame([(1, 9), (9, 4)], "id_a long, id_b long")
    b = spark.createDataFrame([(9, 1), (4, 9)], "id_a long, id_b long")
    ca = sorted(map(tuple, connected_components(a).collect()))
    cb = sorted(map(tuple, connected_components(b).collect()))
    assert ca == cb == [(1, 1), (4, 1), (9, 1)]


def test_cc_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(12)],
                               "id_a long, id_b long")
    with pytest.raises(RuntimeError):
        # driver_max_edges=1 forces the distributed branch
        connected_components(df, max_iter=1, driver_max_edges=1)


def test_neardup_clusters_canonical_flag(spark):
    df = spark.createDataFrame([(5, 2), (2, 9)], "id_a long, id_b long")
    got = neardup_clusters(df).toPandas()
    assert list(got["doc_id"]) == [2, 5, 9]
    assert list(got["cluster_id"]) == [2, 2, 2]
    assert list(got["is_canonical"]) == [True, False, False]


def test_cc_distributed_branch_equals_driver_branch(spark):
    """Force the distributed min-label path (driver_max_edges=0-ish) and
    check it equals the union-find fast path on the same graph."""
    edges = [(2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (20, 21)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = sorted(map(tuple, connected_components(df).collect()))
    dist = sorted(map(tuple, connected_components(
        df, driver_max_edges=1).collect()))
    assert fast == dist
