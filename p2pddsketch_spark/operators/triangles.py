"""Distributed triangle counting (per-node participation).

The standard two-shuffle-join formulation: canonicalize edges to
a < b, build wedges (a,b)⋈(b,c) — ordering makes a < b < c, so every
triangle is enumerated exactly once — and close them against the edge
list on (a,c). Each stage is a hash equi-join Catalyst plans with
map-side combine on the final count; at scale the wedge join is the
hot stage and is bounded by Σ deg², the same envelope every
distributed triangle algorithm (e.g. Cohen's MapReduce formulation)
pays. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["canonical_edges", "triangle_participation"]


def canonical_edges(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Undirected edge list → deduplicated canonical (a < b) pairs;
    self-loops dropped."""
    a, b = F.col(src), F.col(dst)
    return (edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
            .where(F.col("a") < F.col("b")).distinct())


def triangle_participation(edges: DataFrame, src: str = "src",
                           dst: str = "dst") -> DataFrame:
    """(node, n_triangles) — triangles each node belongs to."""
    e = canonical_edges(edges, src, dst)
    e1 = e.select(F.col("a"), F.col("b"))
    e2 = e.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    wedges = e1.join(e2, e1["b"] == e2["b2"]).select("a", "b", "c")
    closer = e.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = wedges.join(closer, (wedges["a"] == closer["a3"]) &
                      (wedges["c"] == closer["c3"])).select("a", "b", "c")
    return (tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
            .groupBy("node").agg(F.count("*").alias("n_triangles")))
