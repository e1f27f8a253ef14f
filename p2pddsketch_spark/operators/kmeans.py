"""Distributed spherical k-means over embedding columns + SemDeDup-style
semantic near-duplicate detection.

`similarity.ann_topk_ivf` trains its coarse quantizer on a bounded
driver sample (`_kmeans_fit`) — fine for nlist ≤ a few hundred, but a
100 TB corpus wants centroids fit on the FULL distribution. This module
runs Lloyd's iterations where each pass is the library's standard
merge-tree shape:

  stage 1: one mapInPandas pass — per Arrow batch, one numpy matmul
           assigns rows to their nearest centroid and emits ONE partial
           row per live cluster: (cluster_id, count, sum array<double>).
           Only k×(d+2)-sized partials leave the scan, never vectors.
  stage 2: groupBy(cluster_id).applyInPandas folds the partials
           per cluster (≤ n_partitions rows each, summed in a stable
           sorted order) — the same partial→merge-tree discipline as
           operators/harness.py stages 2-3.
  driver:  collects exactly k rows (k×d doubles) and renormalizes.

Convergence/empty-cluster policy matches `_kmeans_fit`: cosine
assignment (rows and centroids L2-normalized), empty clusters re-seed
deterministically from the init sample.

Determinism contract: for a FIXED input partitioning the result is
bit-reproducible (partials are folded in sorted (partition_id) order).
Across different partitionings centroids agree to float64 summation
tolerance — pinned by test, and the reason the semantic-dedup operator
reranks candidates EXACTLY (its output never depends on centroid bits:
clustering only gates candidate generation, like LSH banding in
operators/dedup.py).

Semantic dedup (Abbas et al. 2023, "SemDeDup"): cluster the embedding
space, then compare pairs ONLY within a cluster — with k ≈ √N the
expected within-cluster candidate volume is O(N), not O(N²). Output is
exact-cosine filtered, so NO false positives; recall misses only pairs
whose members straddle a cluster boundary (boundary pairs near the
threshold are probabilistic by design, the same contract as
`cosine_neardup_pairs(use_lsh=True)`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType, LongType,
                               StructField, StructType)

from p2pddsketch_spark.operators.similarity import (cosine_sim_with_norms,
                                                    ivf_assign, norm_col)

__all__ = ["kmeans_fit_distributed", "kmeans_assign", "semantic_dedup_pairs"]

_PARTIAL_SCHEMA = StructType([
    StructField("cluster_id", IntegerType(), False),
    StructField("pid", IntegerType(), False),
    StructField("bseq", IntegerType(), False),
    StructField("cnt", LongType(), False),
    StructField("vsum", ArrayType(DoubleType(), False), False),
])

_MERGED_SCHEMA = StructType([
    StructField("cluster_id", IntegerType(), False),
    StructField("cnt", LongType(), False),
    StructField("vsum", ArrayType(DoubleType(), False), False),
])


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _init_sample(df: DataFrame, vec_col: str, sample_size: int) -> np.ndarray:
    """Deterministic bounded init sample — the same driver-side bound the
    IVF trainer uses (similarity.py::ann_topk_ivf); everything AFTER
    init is distributed."""
    rows = df.select(vec_col).limit(sample_size).collect()
    if not rows:
        raise ValueError("kmeans_fit_distributed: empty input")
    return np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])


def _fold_partials(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-cluster fold: sort by (pid, bseq) so the float64 summation
    order is a function of the data layout alone, never of shuffle
    arrival."""
    pdf = pdf.sort_values(["pid", "bseq"], kind="stable")
    vs = np.stack(pdf["vsum"].to_numpy())
    return pd.DataFrame({
        "cluster_id": [int(pdf["cluster_id"].iloc[0])],
        "cnt": [int(pdf["cnt"].sum())],
        "vsum": [np.add.reduce(vs, axis=0)],
    })


def kmeans_fit_distributed(df: DataFrame, vec_col: str = "embedding",
                           k: int = 16, iters: int = 10, seed: int = 17,
                           sample_size: int = 10_000,
                           init_centroids: np.ndarray | None = None,
                           tol: float = 0.0) -> np.ndarray:
    """Fit k spherical (cosine) centroids with fully-distributed Lloyd
    iterations; returns a (k, d) L2-normalized float64 array.

    Scale shape: per iteration the corpus is scanned once; the shuffle
    carries ≤ n_partitions×k partial rows of d doubles (for k=256,
    d=1024, 10k partitions that is ~20 GB spread over the cluster —
    fine for an exchange, catastrophic for a driver collect, which is
    why stage 2 merges distributed and the driver sees exactly k rows).

    `tol` > 0 stops early once the max centroid L2 shift falls to ≤ tol
    — each avoided iteration is a full corpus scan, and Lloyd typically
    converges well before a fixed iteration budget. tol=0 (default)
    always runs exactly `iters` passes (bit-for-bit the pre-tol
    behavior)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    rng = np.random.default_rng(seed)
    if init_centroids is not None:
        # warm start (resume / layout-independent init): iterations are
        # then a pure function of (data multiset, partition layout)
        cent = _normalize(np.asarray(init_centroids, dtype=np.float64).copy())
        if cent.shape[0] != k:
            raise ValueError("init_centroids rows != k")
        sample = cent  # empty-cluster re-seed pool
    else:
        sample = _normalize(_init_sample(df, vec_col, sample_size))
        if len(sample) < k:
            raise ValueError(f"init sample has {len(sample)} rows < k={k}")
        cent = sample[rng.choice(len(sample), size=k, replace=False)].copy()

    base = df.select(vec_col)
    for _ in range(iters):
        c = cent  # rebind: ship THIS iteration's centroids in the closure

        def partials(batches, _c=c):
            from pyspark import TaskContext
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx else 0
            for bseq, pdf in enumerate(batches):
                if len(pdf) == 0:
                    continue
                M = _normalize(np.stack(pdf[vec_col].to_numpy())
                               .astype(np.float64))
                assign = (M @ _c.T).argmax(axis=1)
                # sorted-segment reduceat (house pattern): one stable
                # sort + one contiguous segment-sum pass; rows never
                # leave the task, only (cluster, count, sum) partials
                order = np.argsort(assign, kind="stable")
                a_s, M_s = assign[order], M[order]
                starts = np.empty(a_s.size, dtype=bool)
                starts[0] = True
                starts[1:] = a_s[1:] != a_s[:-1]
                seg = np.flatnonzero(starts)
                live = a_s[seg]
                cnt = np.diff(np.append(seg, a_s.size))
                vsum = np.add.reduceat(M_s, seg, axis=0)
                yield pd.DataFrame({
                    "cluster_id": live.astype(np.int32),
                    "pid": np.full(live.size, pid, dtype=np.int32),
                    "bseq": np.full(live.size, bseq, dtype=np.int32),
                    "cnt": cnt.astype(np.int64),
                    "vsum": list(vsum),
                })

        merged = (base.mapInPandas(partials, schema=_PARTIAL_SCHEMA)
                  .groupBy("cluster_id")
                  .applyInPandas(_fold_partials, schema=_MERGED_SCHEMA)
                  .collect())
        new = cent.copy()
        seen = set()
        for row in merged:
            cid = int(row["cluster_id"])
            seen.add(cid)
            v = np.asarray(row["vsum"], dtype=np.float64)
            new[cid] = v / max(float(np.linalg.norm(v)), 1e-12)
        for cid in range(k):
            if cid not in seen:
                # deterministic re-seed from the init sample (the
                # distributed analog of _kmeans_fit's farthest-point
                # re-seed — one extra corpus pass per empty cluster is
                # not worth it; empties are rare after init-by-sample)
                new[cid] = sample[int(rng.integers(0, len(sample)))]
        shift = float(np.linalg.norm(new - cent, axis=1).max())
        cent = new
        if tol > 0.0 and shift <= tol:
            break
    return cent


def kmeans_assign(df: DataFrame, centroids: np.ndarray,
                  id_col: str = "vec_id", vec_col: str = "embedding"
                  ) -> DataFrame:
    """(id, cluster_id) by nearest-centroid cosine — one matmul per Arrow
    batch. Thin alias over similarity.ivf_assign: a k-means cell and an
    IVF list are the same object."""
    return ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col) \
        .withColumnRenamed("list_id", "cluster_id")


def semantic_dedup_pairs(df: DataFrame, threshold: float = 0.95,
                         k: int = 16, iters: int = 5, seed: int = 17,
                         sample_size: int = 10_000,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         centroids: np.ndarray | None = None) -> DataFrame:
    """Semantic near-duplicate pairs (cosine ≥ threshold), SemDeDup shape:
    distributed k-means gates candidates to within-cluster pairs, exact
    rerank decides. Returns (id_a, id_b, cluster_id, cosine) with
    id_a < id_b, NO false positives.

    100 TB contract: candidate volume is Σ_c |c|² — pick k ≈ √N (and
    re-shard giant clusters upstream if the embedding space is
    degenerate; the cluster histogram is one cheap groupBy to check).
    Only (id, cluster_id) rows shuffle for candidate generation;
    vectors join back per candidate id, exactly like the banded-LSH
    dedup path (operators/dedup.py)."""
    cent = centroids if centroids is not None else kmeans_fit_distributed(
        df, vec_col=vec_col, k=k, iters=iters, seed=seed,
        sample_size=sample_size)
    # the self-join consumes the assignment twice: materialize it once
    # (ContextCleaner-owned lifetime — the dedup.py candidate pattern)
    # instead of running the mapInPandas pass + corpus scan per side
    assigned = (kmeans_assign(df, cent, id_col=id_col, vec_col=vec_col)
                .localCheckpoint(eager=True))
    # carry each vector's norm alongside it: the rerank evaluates
    # candidate-pair cosines, and precomputing ‖v‖ per VECTOR instead of
    # per PAIR removes two of the three d-element folds per candidate
    # (round-6; float-identical — see similarity.norm_col)
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                     norm_col(F.col(vec_col)).alias("nv"))
    a_, b_ = assigned.alias("a"), assigned.alias("b")
    cand = (a_.join(b_, (F.col("a.cluster_id") == F.col("b.cluster_id")) &
                        (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.cluster_id").alias("cluster_id")))
    cand = (cand
            .join(base.toDF("id_a", "va", "na"), "id_a")
            .join(base.toDF("id_b", "vb", "nb"), "id_b"))
    sim = F.round(cosine_sim_with_norms(F.col("va"), F.col("vb"),
                                        F.col("na"), F.col("nb")), 6)
    return (cand.select("id_a", "id_b", "cluster_id", sim.alias("cosine"))
            .where(F.col("cosine") >= threshold)
            .orderBy("id_a", "id_b"))
