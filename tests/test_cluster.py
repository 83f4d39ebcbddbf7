"""Connected-components unit tests: chains, multiple clusters,
singletons, convergence on deeper-than-one-round graphs."""

from __future__ import annotations

from pyspark.sql import Row

from sync_spark.operators.cluster import connected_components, dedup_clusters


def test_chain_collapses_transitively(spark):
    # chain 1-2-3-4-5: diameter 4, needs multiple propagation rounds
    nodes = spark.createDataFrame([Row(id=i) for i in range(1, 6)])
    edges = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=3, id_b=4), Row(id_a=4, id_b=5)]
    )
    out = {r.id: r.cluster_id for r in connected_components(nodes, edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_multiple_clusters_and_singletons(spark):
    nodes = spark.createDataFrame([Row(doc_id=i) for i in range(7)])
    pairs = spark.createDataFrame(
        [Row(id_a=0, id_b=1), Row(id_a=1, id_b=2), Row(id_a=4, id_b=5)]
    )
    out = {r.doc_id: (r.cluster_id, r.is_survivor) for r in dedup_clusters(nodes, pairs).collect()}
    assert out[0] == (0, True) and out[1] == (0, False) and out[2] == (0, False)
    assert out[3] == (3, True)  # singleton survives
    assert out[4] == (4, True) and out[5] == (4, False)
    assert out[6] == (6, True)
    # exactly one survivor per cluster
    survivors = [k for k, (c, s) in out.items() if s]
    assert sorted(survivors) == [0, 3, 4, 6]


def test_driver_and_distributed_paths_agree(spark):
    """Same labels from the small-graph union-find and the
    label-propagation loop (driver_threshold=0 forces the loop)."""
    from pyspark.sql import Row

    nodes = spark.createDataFrame([Row(id=i) for i in range(12)])
    edges = spark.createDataFrame(
        [Row(id_a=1, id_b=4), Row(id_a=4, id_b=7), Row(id_a=2, id_b=9),
         Row(id_a=10, id_b=11), Row(id_a=7, id_b=8)]
    )
    fast = {r.id: r.cluster_id for r in connected_components(nodes, edges).collect()}
    slow = {
        r.id: r.cluster_id
        for r in connected_components(nodes, edges, driver_threshold=0).collect()
    }
    assert fast == slow
    assert fast[8] == 1 and fast[9] == 2 and fast[11] == 10 and fast[0] == 0


def test_regime_boundary_exact_threshold(spark):
    """The folded limit-collect regime probe (r12 continuation) must
    route a graph with EXACTLY driver_threshold edges to the driver
    union-find (limit(t+1) returns t rows ≤ t) and one more edge to
    the distributed loop — with identical labels either way."""
    from pyspark.sql import Row

    nodes = spark.createDataFrame([Row(id=i) for i in range(8)])
    edges = spark.createDataFrame(
        [Row(id_a=0, id_b=1), Row(id_a=2, id_b=3), Row(id_a=3, id_b=4)]
    )
    at_threshold = {
        r.id: r.cluster_id
        for r in connected_components(nodes, edges, driver_threshold=3).collect()
    }
    below_threshold = {
        r.id: r.cluster_id
        for r in connected_components(nodes, edges, driver_threshold=2).collect()
    }
    expected = {0: 0, 1: 0, 2: 2, 3: 2, 4: 2, 5: 5, 6: 6, 7: 7}
    assert at_threshold == expected
    assert below_threshold == expected


def test_pointer_jump_converges_logarithmically(spark):
    """A 100-node chain (diameter 99) must converge in O(log d)
    rounds via the pointer jump — max_iter=12 would hard-fail the
    pre-r10 pure-propagation loop (one hop per round)."""
    from pyspark.sql import Row

    n = 100
    nodes = spark.createDataFrame([Row(id=i) for i in range(n)])
    edges = spark.createDataFrame(
        [Row(id_a=i, id_b=i + 1) for i in range(n - 1)]
    )
    out = {
        r.id: r.cluster_id
        for r in connected_components(
            nodes, edges, driver_threshold=0, max_iter=12
        ).collect()
    }
    assert out == {i: 0 for i in range(n)}
