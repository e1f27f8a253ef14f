"""Distributed spherical k-means + SemDeDup semantic near-dup pairs.

Contracts pinned: the distributed Lloyd pass computes the SAME
iteration map as a single-node float64 reference (tolerance-equal;
summation order differs), results are bit-reproducible for a fixed
layout, layout changes perturb centroids only at float64 summation
tolerance (warm-started so init is layout-free), the dedup output has
NO false positives vs exact numpy cosine, and planted near-duplicates
are recovered.
"""

from __future__ import annotations

import numpy as np
import pytest

from p2pddsketch_spark.operators.kmeans import (
    kmeans_assign, kmeans_fit_distributed, semantic_dedup_pairs)


def _norm(m):
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _make_clustered(n=240, d=8, k=4, seed=3, noise=0.05):
    """Well-separated spherical clusters — no empty-cluster path, so the
    rng draw sequence of the reference replica matches the operator's."""
    rng = np.random.default_rng(seed)
    centers = _norm(rng.normal(size=(k, d)))
    X = np.repeat(centers, n // k, axis=0) + noise * rng.normal(size=(n, d))
    return X.astype(np.float64)


def _lloyd_reference(X, cent, iters):
    """Single-node float64 replica of the distributed iteration map."""
    Xn = _norm(X)
    cent = cent.copy()
    for _ in range(iters):
        assign = (Xn @ cent.T).argmax(axis=1)
        for c in range(cent.shape[0]):
            m = Xn[assign == c]
            if len(m):
                v = m.sum(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def _to_df(spark, X, parts=4):
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>").repartition(parts)


def test_distributed_fit_matches_reference(spark):
    X = _make_clustered()
    df = _to_df(spark, X)
    # warm start from fixed centroids so the reference consumes the
    # identical init (float32 storage rounds the vectors — round the
    # reference input the same way)
    X32 = X.astype(np.float32).astype(np.float64)
    init = _norm(X32[[0, 60, 120, 180]])
    got = kmeans_fit_distributed(df, k=4, iters=3, init_centroids=init)
    want = _lloyd_reference(X32, init, iters=3)
    assert np.allclose(got, want, atol=1e-9)
    # assignment side: every row lands on its generator cluster block
    a = kmeans_assign(df, got).toPandas().sort_values("id")
    blocks = a["cluster_id"].to_numpy().reshape(4, 60)
    assert all(len(np.unique(b)) == 1 for b in blocks)
    assert len(np.unique(blocks[:, 0])) == 4


def test_fixed_layout_bit_reproducible(spark):
    X = _make_clustered(seed=5)
    df = _to_df(spark, X, parts=5)
    a = kmeans_fit_distributed(df, k=4, iters=4, seed=11)
    b = kmeans_fit_distributed(df, k=4, iters=4, seed=11)
    assert np.array_equal(a, b)


def test_layout_perturbs_only_at_float_tolerance(spark):
    X = _make_clustered(seed=7)
    init = _norm(X.astype(np.float32).astype(np.float64)[[5, 65, 125, 185]])
    a = kmeans_fit_distributed(_to_df(spark, X, parts=1), k=4, iters=3,
                               init_centroids=init)
    b = kmeans_fit_distributed(_to_df(spark, X, parts=7), k=4, iters=3,
                               init_centroids=init)
    assert np.allclose(a, b, atol=1e-9)


def test_tol_early_stop_converged_equivalence(spark):
    """tol early-stop: once Lloyd has converged (assignments fixed),
    extra iterations are no-ops — a tol run must equal the full-budget
    run exactly; and tol=0 reproduces the untolerated path bit-for-bit."""
    X = _make_clustered(seed=9, noise=0.02)
    df = _to_df(spark, X, parts=3)
    init = _norm(X.astype(np.float32).astype(np.float64)[[10, 70, 130, 190]])
    full = kmeans_fit_distributed(df, k=4, iters=8, init_centroids=init)
    tolled = kmeans_fit_distributed(df, k=4, iters=8, init_centroids=init,
                                    tol=1e-12)
    assert np.allclose(tolled, full, atol=1e-12)
    again = kmeans_fit_distributed(df, k=4, iters=3, init_centroids=init,
                                   tol=0.0)
    ref = kmeans_fit_distributed(df, k=4, iters=3, init_centroids=init)
    assert np.array_equal(again, ref)


def test_guards(spark):
    X = _make_clustered()
    df = _to_df(spark, X)
    with pytest.raises(ValueError, match="rows != k"):
        kmeans_fit_distributed(df, k=3, init_centroids=np.eye(4, 8))
    with pytest.raises(ValueError, match="k must be"):
        kmeans_fit_distributed(df, k=0)
    with pytest.raises(ValueError, match="< k"):
        kmeans_fit_distributed(df, k=50, sample_size=10)


def test_ivf_distributed_fit_full_probe_exact(spark):
    """ann_topk_ivf(fit='distributed') with nprobe == nlist must equal
    brute force — probing every list makes centroid quality irrelevant,
    so this pins the distributed trainer's plumbing (assignment join,
    probe lists, rerank) independently of clustering quality."""
    from pyspark.sql import functions as F
    from p2pddsketch_spark.operators.similarity import ann_topk_ivf, cosine_topk
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = (emb.where(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec")))
    brute = cosine_topk(emb, queries, k=5).toPandas()
    approx = ann_topk_ivf(emb, queries, k=5, nlist=8, nprobe=8,
                          fit="distributed").toPandas()
    merged = approx.merge(brute, on=["query_id", "rank"], suffixes=("_a", "_b"))
    assert len(merged) == len(brute)
    assert (merged["neighbor_id_a"] == merged["neighbor_id_b"]).all()
    assert (merged["cosine_a"] == merged["cosine_b"]).all()
    with pytest.raises(ValueError, match="fit must be"):
        ann_topk_ivf(emb, queries, fit="nope")


def test_semantic_dedup_no_fp_and_planted_recall(spark):
    rng = np.random.default_rng(13)
    d = 16
    base = _norm(rng.normal(size=(100, d)))
    planted = []
    rows = [*base]
    for i in range(10):  # 10 near-identical twins of rows 0..9
        twin = _norm((base[i] + 1e-3 * rng.normal(size=d))[None])[0]
        rows.append(twin)
        planted.append((i, 100 + i))
    X = np.stack(rows)
    df = _to_df(spark, X, parts=3)

    out = semantic_dedup_pairs(df, threshold=0.95, k=8, iters=4,
                               seed=19).toPandas()
    got = {(int(r.id_a), int(r.id_b)) for r in out.itertuples()}

    # exact all-pairs oracle on what Spark STORED (float32 vectors)
    X32 = _norm(X.astype(np.float32).astype(np.float64))
    sims = np.round(X32 @ X32.T, 6)
    exact = {(i, j) for i in range(len(X)) for j in range(i + 1, len(X))
             if sims[i, j] >= 0.95}
    assert got <= exact                      # NO false positives
    assert set(planted) <= got               # twins share a cluster
    for r in out.itertuples():               # reported cosine is exact
        assert abs(r.cosine - sims[r.id_a, r.id_b]) < 1e-6
