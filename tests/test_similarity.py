"""Similarity-search operator tests: exactness of the brute-force
baseline, recall of the approximate scale paths."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from p2pddsketch_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return (emb.where(F.col("vec_id") < 10)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vec")))


@pytest.fixture(scope="module")
def brute(emb, queries):
    return similarity.cosine_topk(emb, queries, k=5).toPandas()


def test_brute_force_matches_numpy(emb, brute):
    pdf = emb.toPandas().sort_values("vec_id")
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(M, axis=1)
    for qid in range(10):
        sims = (M @ M[qid]) / (norms * norms[qid])
        sims[qid] = -np.inf
        top = np.argsort(-np.round(sims, 6), kind="stable")[:5]
        got = brute[brute["query_id"] == qid].sort_values("rank")
        assert list(got["neighbor_id"]) == [int(pdf["vec_id"].iloc[i]) for i in top]


def _recall(approx, brute):
    hits = tot = 0
    for qid in brute["query_id"].unique():
        b = set(brute[brute["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        hits += len(a & b)
        tot += len(b)
    return hits / tot


def test_ivf_recall(emb, queries, brute):
    """The synthetic embeddings are near-isotropic (max cosine ≈ 0.37),
    so IVF recall is bounded near nprobe/nlist plus clustering gain — we
    assert it beats the random-probe floor with margin; exactness is
    covered by the full-probe test below."""
    approx = similarity.ann_topk_ivf(emb, queries, k=5, nlist=16, nprobe=4).toPandas()
    assert _recall(approx, brute) >= 0.4  # random floor would be 0.25


def test_ivf_full_probe_is_exact(emb, queries, brute):
    """nprobe == nlist probes every list → identical to brute force."""
    approx = similarity.ann_topk_ivf(emb, queries, k=5, nlist=8, nprobe=8).toPandas()
    assert _recall(approx, brute) == 1.0
    merged = approx.merge(brute, on=["query_id", "rank"], suffixes=("_a", "_b"))
    assert (merged["cosine_a"] == merged["cosine_b"]).all()


def test_lsh_recall(emb, queries, brute):
    """Near-isotropic data: neighbors at cosine ≈ 0.37 (θ ≈ 68°) share a
    4-plane bucket w.p. (1 − θ/π)⁴ ≈ 0.15 — hyperplane LSH needs actual
    angular structure to shine. Assert above the random-collision floor
    (bucket share ≈ 1/16 ≈ 0.0625 gives essentially random top-k)."""
    approx = similarity.ann_topk_lsh(emb, queries, k=5, planes=4).toPandas()
    assert _recall(approx, brute) >= 0.05
    # fewer planes → bigger buckets → recall must not decrease
    approx1 = similarity.ann_topk_lsh(emb, queries, k=5, planes=1).toPandas()
    assert _recall(approx1, brute) >= _recall(approx, brute)


def test_multiprobe_improves_recall(emb, queries, brute):
    """Multi-probe LSH dominates single-bucket LSH: probing all 1-bit
    Hamming neighbors strictly widens the candidate set."""
    base = similarity.ann_topk_lsh(emb, queries, k=5, planes=8).toPandas()
    mp = similarity.ann_topk_lsh(emb, queries, k=5, planes=8, multiprobe=2).toPandas()
    r_base, r_mp = _recall(base, brute), _recall(mp, brute)
    assert r_mp >= r_base
    # near-isotropic data: neighbors differ in ~3 of 8 bits in expectation,
    # so distance-2 probing recovers P(≤2 flips) ≈ 0.36 of true neighbors
    assert r_mp >= 0.2


def test_neardup_exact_vs_lsh(emb, spark):
    exact = similarity.cosine_neardup_pairs(emb, threshold=0.5).toPandas()
    lsh = similarity.cosine_neardup_pairs(emb, threshold=0.5, use_lsh=True,
                                          planes=4).toPandas()
    # LSH output is a subset (no false positives after exact verify)
    e = set(map(tuple, exact[["id_a", "id_b"]].to_numpy()))
    l = set(map(tuple, lsh[["id_a", "id_b"]].to_numpy()))
    # LSH candidates are exactly verified → never a false positive; recall
    # on this near-isotropic 1-pair sample is probabilistic, so only the
    # subset property is deterministic enough to assert
    assert l <= e


def test_int8_quantizer_error_bound(spark):
    """Per-element |x − c/scale| ≤ 0.5/scale, so the per-vector l2 error
    is bounded by √d · max|x| / 254 — checked on the real fixture."""
    import math
    from p2pddsketch_spark.operators.similarity import quantize_embeddings_int8
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = quantize_embeddings_int8(emb).collect()
    raw = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    assert len(rows) == len(raw)
    for r in rows:
        maxabs = max(abs(float(x)) for x in raw[r["vec_id"]])
        bound = math.sqrt(r["n_dims"]) * maxabs / 254.0
        assert r["l2_err"] <= bound * (1 + 1e-9), r
        assert abs(r["scale"] * maxabs - 127.0) < 1e-3
