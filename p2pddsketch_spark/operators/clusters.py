"""Near-duplicate clustering: connected components over a pair list.

Dedup pair generators (`minhash_lsh_pairs`, `simhash_neardup_pairs`,
`cosine_neardup_pairs`) emit EDGES; a curation pipeline needs CLUSTERS
(keep one canonical doc per component, drop the rest). This module
closes that gap with a DataFrame-native connected-components:
iterative min-label propagation — each round every vertex takes the
minimum component label among itself and its neighbors, converging in
O(diameter) rounds (≤ O(log n) on the short, dense components near-dup
graphs form: near-dup clusters are cliques-ish, so 2-3 rounds).

At 100 TB scale each round is two shuffles (edge join + min-agg), the
label table is (id, comp) only, and AQE handles the skew of a giant
component. The driver-side convergence check reads a single count per
round — no vertex data crosses the driver. (The classic improvement,
alternating large-star/small-star contraction [Kiveris et al. 2014],
halves round count on high-diameter graphs; near-dup graphs don't have
them, so the simple propagation is the right default.)

The reference has no graph ops at all; gap-fill mandated by the brief's
dedup pipeline. Exact DuckDB twin: transitive closure via recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

__all__ = ["connected_components", "neardup_clusters"]


def _union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find with path compression; root = min id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def connected_components(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
                         max_iter: int = 25,
                         driver_max_edges: int = 1 << 18) -> DataFrame:
    """(id, component) for every vertex in `edges`; component = the
    minimum vertex id reachable through the pair graph. Deterministic.
    Output columns (id, comp) carry the EDGE column's type — integer or
    string vertex ids both work, on either branch.

    Auto-switch (same philosophy as `harness.final_sketches`): a
    `limit(max+1)` probe collects the edge list when it fits
    `driver_max_edges` — near-dup pair lists usually do even at corpus
    scale, being the OUTPUT of dedup, not the input — and union-find
    labels it in one pass (each distributed round costs ~3 Spark jobs,
    so small graphs are strictly faster on the driver). The 2^18 default
    caps the probe at ~tens of MB of driver heap for Row objects (count
    gate, matching `final_sketches`' caution). Larger graphs run the
    distributed min-label propagation. Raises RuntimeError if `max_iter`
    rounds don't converge (a near-dup graph needing 25 rounds means the
    threshold is far too low)."""
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    id_type = edges.schema[src].dataType
    probe = e.limit(driver_max_edges + 1).collect()
    if len(probe) <= driver_max_edges:
        comp = _union_find([(r["u"], r["v"]) for r in probe])
        schema = StructType([StructField("id", id_type),
                             StructField("comp", id_type)])
        return spark.createDataFrame(sorted(comp.items()), schema).orderBy("id")
    # undirected: keep both directions once
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    sym = sym.localCheckpoint(eager=True)  # cut lineage before iterating
    labels = (sym.select(F.col("u").alias("id")).distinct()
              .withColumn("comp", F.col("id")))
    for _ in range(max_iter):
        nbr = (sym.join(labels, sym["v"] == labels["id"])
               .select(F.col("u").alias("id"), F.col("comp")))
        new_labels = (labels.select("id", "comp").union(nbr)
                      .groupBy("id").agg(F.min("comp").alias("comp"))
                      .localCheckpoint(eager=True))  # truncate the loop's plan
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
                   .where(F.col("n.comp") != F.col("o.comp")).count())
        labels = new_labels
        if changed == 0:
            return labels.orderBy("id")
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def neardup_clusters(pairs: DataFrame, id_a: str = "id_a",
                     id_b: str = "id_b") -> DataFrame:
    """(doc_id, cluster_id, is_canonical) for every doc in a near-dup
    pair: cluster_id is the smallest doc id of the component (the doc a
    dedup pass keeps), is_canonical marks it."""
    comp = connected_components(pairs, id_a, id_b)
    return (comp.select(F.col("id").alias("doc_id"),
                        F.col("comp").alias("cluster_id"),
                        (F.col("id") == F.col("comp")).alias("is_canonical"))
            .orderBy("doc_id"))
