"""Graph operators on constructed graphs with known answers."""

from __future__ import annotations

import math

from mapreducecore_spark.operators.graph import pagerank, triangle_count


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "u BIGINT, v BIGINT")


def test_triangle_count_known_graphs(spark):
    # K4: C(4,3) = 4 triangles.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert triangle_count(_pairs(spark, k4)).collect()[0][0] == 4
    # A path has none.
    path = [(0, 1), (1, 2), (2, 3), (3, 4)]
    assert triangle_count(_pairs(spark, path)).collect()[0][0] == 0
    # Two triangles sharing an edge (bowtie minus center): 0-1-2, 1-2-3.
    two = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    assert triangle_count(_pairs(spark, two)).collect()[0][0] == 2
    # Star graph (hub + 4 leaves): wedge-heavy but triangle-free —
    # the degree orientation keeps the hub's out-degree at 0/low.
    star = [(0, i) for i in range(1, 5)]
    assert triangle_count(_pairs(spark, star)).collect()[0][0] == 0


def test_pagerank_uniform_on_regular_graph(spark):
    # On a cycle (2-regular) PageRank is exactly uniform at every
    # iteration: pr = 0.15 + 0.85 * (pr/2 + pr/2) keeps pr = 1.
    cycle = [(i, (i + 1) % 6) for i in range(6)]
    out = pagerank(_pairs(spark, cycle), n_iter=3).collect()
    assert len(out) == 6
    for r in out:
        assert math.isclose(r["pr"], 1.0, abs_tol=1e-9)


def test_pagerank_mass_and_ordering(spark):
    # Star: hub gets the most rank; total mass is conserved up to the
    # damping leak (sum pr = n for an undirected graph with no
    # dangling nodes, in the limit; after 1 iter it's exact here:
    # hub: 0.15 + 0.85 * 4 * (1/1); leaf: 0.15 + 0.85 * (1/4).
    star = [(0, i) for i in range(1, 5)]
    out = {r["node"]: r["pr"] for r in pagerank(_pairs(spark, star), n_iter=1).collect()}
    assert math.isclose(out[0], 0.15 + 0.85 * 4.0, abs_tol=1e-6)
    for leaf in range(1, 5):
        assert math.isclose(out[leaf], 0.15 + 0.85 / 4.0, abs_tol=1e-6)
