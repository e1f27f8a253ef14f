"""Fixed-iteration PageRank as a deterministic DataFrame loop.

An iterative message-passing algorithm on the same skeleton as the
reference's gossip rounds (`/root/reference/main.cpp:503-560` loops a
fixed number of communication rounds over the peer graph): each
iteration is one hash-shuffle of (node, contribution) messages, reduced
by key. No vertex-centric framework is needed — the loop IS the plan:

  contrib  = edges ⋈ ranks (shuffle on src)  →  quantize(rank/outdeg)
  incoming = contrib.groupBy(dst).sum         (shuffle on dst)
  rank'    = quantize((1-d)/N + d·(incoming + dangling/N))

Scale notes (100 TB / 1000 executors):
- `edges` is the big table; it is deduplicated once and persisted, and
  every iteration shuffles only (node:int64, contribution:int64) —
  16-byte messages, never the edge payload.
- Each iteration ends in `localCheckpoint(eager=True)`: the rank table
  (one row per node) is pinned and the lineage cut, so iteration k+1's
  plan does not re-derive iterations 1..k (the classic iterative-Spark
  failure mode).
- The dangling-mass term is a one-row aggregate cross-joined back in
  (broadcast), not a driver collect.

Determinism / oracle parity: ranks are scaled int64 "nano-units",
quantized as floor(x·1e9 + 0.5). Engines may disagree on decimal
ROUND-of-double (DuckDB rounds through a float multiply, Spark through
BigDecimal), but mul/add/div/floor are each single correctly-rounded
IEEE ops, so this quantizer — and therefore every iteration — is
bit-identical between Spark and the unrolled DuckDB CTE twin
(`plans/oracles.py:duckdb_pagerank_sql`); BIGINT sums are exact and
associative, immune to shuffle-order differences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1e9


def _quantize(x: Column) -> Column:
    """floor(x·1e9 + 0.5) as int64 — the cross-engine-stable rounding."""
    return F.floor(x * F.lit(SCALE) + F.lit(0.5)).cast("long")


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iterations: int = 5, damping: float = 0.85) -> DataFrame:
    """PageRank after exactly `iterations` synchronous rounds.

    `edges` is a directed edge list (duplicates ignored). Returns
    (node, rank_nano int64) with rank = rank_nano·1e-9. Deterministic
    for a given graph.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.persist()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().persist())
    n = float(nodes.count())
    outdeg = e.groupBy("src").agg(F.count("*").cast("double").alias("odeg")).persist()

    ranks = nodes.select(
        "node", _quantize(F.lit(1.0) / F.lit(n)).alias("rank_nano"))
    d = float(damping)

    for _ in range(iterations):
        rank_d = F.col("rank_nano").cast("double") / F.lit(SCALE)
        contrib = (e.join(ranks, e["src"] == ranks["node"])
                   .join(outdeg, "src")
                   .select(F.col("dst").alias("node"),
                           _quantize(rank_d / F.col("odeg")).alias("c")))
        incoming = contrib.groupBy("node").agg(F.sum("c").alias("inc"))
        dangling = (ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
                    .agg(F.coalesce(F.sum("rank_nano"), F.lit(0).cast("long"))
                         .alias("dang")))
        inc_d = F.coalesce(F.col("inc"), F.lit(0).cast("long")).cast("double") / F.lit(SCALE)
        dang_d = F.col("dang").cast("double") / F.lit(SCALE)
        ranks = (nodes
                 .join(incoming, "node", "left")
                 .crossJoin(F.broadcast(dangling))
                 .select("node",
                         _quantize((F.lit(1.0) - F.lit(d)) / F.lit(n) +
                                   F.lit(d) * (inc_d + dang_d / F.lit(n)))
                         .alias("rank_nano"))
                 .localCheckpoint(eager=True))
    # ranks is pinned by the eager checkpoint — the loop inputs can go
    for df in (e, nodes, outdeg):
        df.unpersist()
    return ranks
