"""Graph operators: connected components and PageRank invariants."""

from pyspark.sql import functions as F

from samba_spark.operators.graph import connected_components, pagerank


def test_connected_components_two_chains(spark):
    # two path components {1-2-3-4} and {10-11}, plus the 4-chain needing
    # several propagation rounds (diameter 3)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["src", "dst"]
    )
    got = {
        r.vertex: r.component for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_star_and_singleton_edge(spark):
    edges = spark.createDataFrame(
        [(5, 1), (5, 2), (5, 3), (7, 8)], ["src", "dst"]
    )
    got = {
        r.vertex: r.component for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 7: 7, 8: 7}


def test_pagerank_mass_conserved_and_symmetric_ring_uniform(spark):
    # directed ring a→b→c→a: by symmetry every vertex has equal rank 1/3
    ring = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
    ranks = {r.vertex: r.rank for r in pagerank(ring, iterations=8).collect()}
    assert all(abs(v - 1 / 3) < 1e-6 for v in ranks.values()), ranks
    assert abs(sum(ranks.values()) - 1.0) < 1e-5


def test_pagerank_dangling_mass_redistributed(spark):
    # 1→2, 2 dangling: without dangling redistribution Σrank < 1
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    ranks = {r.vertex: r.rank for r in pagerank(edges, iterations=20).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-4, ranks
    assert ranks[2] > ranks[1]  # sink accumulates more rank


def test_triangle_count_clique_plus_tail(spark):
    # K4 on {1..4}: each vertex in C(3,2)=3 triangles; pendant edge 4-9
    # and isolated edge 20-21 contribute none. Edges given in mixed
    # direction + one duplicate to exercise canonicalization.
    from samba_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (4, 2), (3, 4), (4, 9), (20, 21)],
        ["src", "dst"],
    )
    got = {r.vertex: r.n_triangles for r in triangle_count(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_count_self_loops_ignored(spark):
    from samba_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3), (3, 1)], ["src", "dst"]
    )
    got = {r.vertex: r.n_triangles for r in triangle_count(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}
