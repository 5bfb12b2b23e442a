"""Reusable graph operators over an undirected pair list
DataFrame[u, v] — triangle counting and PageRank steps. Query-registry
wrappers live in queries/graph.py; these take any edge list (tests run
them on constructed graphs).

Scale stance: degree-oriented triangle counting bounds the wedge join
by out-degrees (hubs become high-in/low-out under the orientation);
PageRank is the standard join+agg iteration with lineage truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreducecore_spark.queries._util import materialize


def triangle_count(pairs: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """DataFrame with one row: n_triangles. `pairs` holds each
    undirected edge once (any endpoint order, no self-loops)."""
    pairs = materialize(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    )
    ends = pairs.select(F.col("u").alias("node")).union(
        pairs.select(F.col("v").alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count("*").alias("deg"))
    with_deg = (
        pairs.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    )
    # Orient low -> high by (degree, id): each triangle then has exactly
    # one apex with two out-edges, so triangles = closed wedges.
    oriented = materialize(
        with_deg.select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        ).select("e.s", "e.t")
    )
    w1 = oriented.select(F.col("s"), F.col("t").alias("t1"))
    w2 = oriented.select(F.col("s"), F.col("t").alias("t2"))
    wedges = w1.join(w2, "s").filter(F.col("t1") < F.col("t2"))
    closing = oriented.select(
        F.least("s", "t").alias("t1"), F.greatest("s", "t").alias("t2")
    )
    return (
        wedges.select(
            F.least("t1", "t2").alias("t1"), F.greatest("t1", "t2").alias("t2")
        )
        .join(closing, ["t1", "t2"])
        .agg(F.count("*").alias("n_triangles"))
    )


def pagerank(
    pairs: DataFrame,
    src: str = "u",
    dst: str = "v",
    n_iter: int = 1,
    damping: float = 0.85,
    round_to: int | None = 6,
) -> DataFrame:
    """PageRank on the undirected graph (each edge walked both ways),
    uniform start pr=1. Returns DataFrame[node, pr]. Every node in the
    edge list has degree >= 1, so there is no dangling mass."""
    p = materialize(pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    edges = materialize(
        p.union(p.select(F.col("v").alias("u"), F.col("u").alias("v")))
    )
    deg = materialize(edges.groupBy("u").agg(F.count("*").alias("d")))
    ranks = deg.select(F.col("u").alias("node"), F.lit(1.0).alias("pr"))
    for _ in range(n_iter):
        contribs = (
            edges.join(deg, "u")
            .join(ranks, edges["u"] == ranks["node"])
            .select(F.col("v"), (F.col("pr") / F.col("d")).alias("w"))
        )
        ranks = materialize(
            contribs.groupBy(F.col("v").alias("node")).agg(
                (F.lit(1.0 - damping) + damping * F.sum("w")).alias("pr")
            )
        )
    if round_to is not None:
        ranks = ranks.select("node", F.round("pr", round_to).alias("pr"))
    return ranks
