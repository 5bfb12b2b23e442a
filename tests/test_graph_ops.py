"""Graph operators on constructed graphs with known answers."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

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


def test_components_resume_from_durable_checkpoint(spark, tmp_path):
    """Fault-injection: run label propagation with a reliable
    checkpoint dir but an iteration cap that stops it mid-convergence
    ("crash"); persist the partial label table (the durable artifact a
    production job writes next to the checkpoint); then RESUME from the
    read-back table in a fresh invocation and assert the final labels
    are identical to an uninterrupted run — the 100 TB recovery story,
    not just a docstring."""
    from mapreducecore_spark.operators.components import connected_components

    # Long path graph (diameter 12 -> needs many rounds) + a separate
    # clique, so an iteration cap genuinely interrupts convergence.
    path_edges = [(i, i + 1) for i in range(12)]
    clique = [(100 + a, 100 + b) for a in range(4) for b in range(a + 1, 4)]
    pairs = spark.createDataFrame(path_edges + clique, "doc_a LONG, doc_b LONG")

    truth = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert {truth[i] for i in range(13)} == {0}
    assert {truth[100 + i] for i in range(4)} == {100}

    ckpt = str(tmp_path / "ckpt")
    partial = connected_components(
        pairs, max_iter=2, reliable_checkpoint_dir=ckpt, checkpoint_every=1
    )
    # The reliable checkpoint actually wrote durable RDD state.
    labels_path = str(tmp_path / "labels.parquet")
    partial.select("node", F.col("component").alias("label")).write.parquet(labels_path)
    ckpt_files = [
        os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs
    ]
    assert ckpt_files, "reliable checkpoint dir is empty"

    # Interrupted state must NOT already equal the fixed point (else the
    # "resume" below proves nothing).
    partial_labels = {r["node"]: r["label"] for r in spark.read.parquet(labels_path).collect()}
    assert partial_labels != truth

    resumed = connected_components(
        pairs, resume_from=spark.read.parquet(labels_path)
    )
    got = {r["node"]: r["component"] for r in resumed.collect()}
    assert got == truth
