"""Persisted PQ index: build/load roundtrip, frozen-codebook append,
serving-path equality, commit-marker refusals, CLI contract.

Pins:
  * codebooks survive the parquet roundtrip BIT-identically (float64);
  * querying the stored index == in-memory `ann_topk_pq` with the same
    codebooks, value for value (the serving path adds no approximation);
  * frozen-codebook append: build(half) + append(half) produces the
    same codes table content and the same query answers as build(all) —
    arrival order never changes results;
  * a torn index (no manifest) and a dim-mismatched append are refused
    with typed ValueErrors; the CLI converts them to the JSON error
    contract.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from p2pddsketch_spark.operators.pq import ann_topk_pq, train_pq
from p2pddsketch_spark.operators.pq_index import (append_pq_index,
                                                  load_pq_index,
                                                  query_pq_index,
                                                  save_pq_index)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(spark, emb):
    return (emb.where(F.col("vec_id") < 6)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vec")))


def _codes_pdf(spark, index_dir):
    pdf = (spark.read.parquet(index_dir.rstrip("/") + "/codes").toPandas()
           .sort_values("id").reset_index(drop=True))
    return pdf


def test_roundtrip_bit_identical_and_serving_equality(
        spark, emb, queries, tmp_path):
    idx = str(tmp_path / "idx")
    cb = train_pq(emb, m=8, k=64, sample_size=1000, seed=7)
    man = save_pq_index(spark, emb, idx, codebooks=cb)
    assert man["format"] == "pq-index-v1" and man["version"] == 1
    assert man["n_rows"] == emb.count()
    cb2, man2, codes = load_pq_index(spark, idx)
    assert man2 == man
    # parquet double roundtrip is exact: the loaded codebooks are the
    # trained ones bit for bit
    assert np.array_equal(cb, cb2)
    # the serving path answers exactly what the in-memory operator does
    mem = ann_topk_pq(emb, queries, k=5, codebooks=cb, rerank=30).toPandas()
    srv = query_pq_index(spark, idx, queries, k=5, rerank=30,
                         corpus=emb).toPandas()
    merged = mem.merge(srv, on=["query_id", "rank"], suffixes=("_m", "_s"))
    assert len(merged) == len(mem) > 0
    assert (merged["neighbor_id_m"] == merged["neighbor_id_s"]).all()
    assert (merged["cosine_m"] == merged["cosine_s"]).all()
    # ADC-only serving works without the corpus
    adc = query_pq_index(spark, idx, queries, k=3).toPandas()
    assert (adc.groupby("query_id")["rank"].max() == 3).all()


def test_append_frozen_codebooks_is_arrival_order_invariant(
        spark, emb, queries, tmp_path):
    full_idx = str(tmp_path / "full")
    half_idx = str(tmp_path / "half")
    cb = train_pq(emb, m=8, k=64, sample_size=1000, seed=7)
    save_pq_index(spark, emb, full_idx, codebooks=cb)
    save_pq_index(spark, emb.where(F.col("vec_id") % 2 == 0), half_idx,
                  codebooks=cb)
    man = append_pq_index(spark, emb.where(F.col("vec_id") % 2 == 1),
                          half_idx)
    assert man["version"] == 2
    assert man["n_rows"] == emb.count()
    assert [h["op"] for h in man["history"]] == ["build", "append"]
    a = _codes_pdf(spark, full_idx)
    b = _codes_pdf(spark, half_idx)
    assert (a["id"] == b["id"]).all()
    assert all(np.array_equal(x, y) for x, y in zip(a["codes"], b["codes"]))
    qa = query_pq_index(spark, full_idx, queries, k=5, rerank=30,
                        corpus=emb).toPandas()
    qb = query_pq_index(spark, half_idx, queries, k=5, rerank=30,
                        corpus=emb).toPandas()
    assert (qa["neighbor_id"] == qb["neighbor_id"]).all()
    assert (qa["cosine"] == qb["cosine"]).all()
    # appending nothing is a no-op, not a version bump
    man3 = append_pq_index(spark, emb.where(F.lit(False)), half_idx)
    assert man3["version"] == 2


def test_refusals(spark, emb, tmp_path):
    idx = str(tmp_path / "idx")
    save_pq_index(spark, emb, idx, m=8, nk=16, iters=2, sample_size=200)
    # double-build refused without overwrite; allowed with it
    with pytest.raises(ValueError, match="already exists"):
        save_pq_index(spark, emb, idx)
    save_pq_index(spark, emb, idx, m=8, nk=16, iters=2, sample_size=200,
                  overwrite=True)
    # dim-mismatched append refused before any write
    short = emb.select("vec_id", F.slice("embedding", 1, 32).alias("embedding"))
    with pytest.raises(ValueError, match="append dim"):
        append_pq_index(spark, short, idx)
    # torn index (manifest removed) is not a committed index
    os.remove(os.path.join(idx, "manifest.json"))
    with pytest.raises(ValueError, match="manifest.json missing"):
        load_pq_index(spark, idx)
    with pytest.raises(ValueError, match="manifest.json missing"):
        append_pq_index(spark, emb, idx)
    # rerank without the vector table is a typed error
    idx2 = str(tmp_path / "idx2")
    save_pq_index(spark, emb, idx2, m=8, nk=16, iters=2, sample_size=200)
    q = (emb.where(F.col("vec_id") < 2)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    with pytest.raises(ValueError, match="needs `corpus`"):
        query_pq_index(spark, idx2, q, k=3, rerank=10)


def test_ivf_partitioned_index(spark, emb, queries, tmp_path):
    """nlist > 0: codes land partitionBy(list_id); full probe equals the
    flat index exactly; a real probe prunes the scan at the partition
    level (PartitionFilters in the plan, only probed dirs read) and
    every ADC hit comes from a probed cell."""
    from pyspark.sql import functions as F
    flat_idx, ivf_idx = str(tmp_path / "flat"), str(tmp_path / "ivf")
    cb = train_pq(emb, m=8, k=64, sample_size=1000, seed=7)
    save_pq_index(spark, emb, flat_idx, codebooks=cb)
    man = save_pq_index(spark, emb, ivf_idx, codebooks=cb, nlist=8)
    assert man["nlist"] == 8
    # on-disk layout is hive-partitioned by cell
    assert any(d.startswith("list_id=")
               for d in os.listdir(os.path.join(ivf_idx, "codes")))

    # full probe == flat, value for value (ADC-only and reranked)
    for kw in ({"k": 5}, {"k": 5, "rerank": 30, "corpus": emb}):
        a = query_pq_index(spark, flat_idx, queries, **kw).toPandas()
        b = query_pq_index(spark, ivf_idx, queries, nprobe=0, **kw).toPandas()
        assert (a["neighbor_id"] == b["neighbor_id"]).all()
        assert (a["cosine"] == b["cosine"]).all()

    # probed query: pruning receipt + hits only from probed cells
    receipt: dict = {}
    got = query_pq_index(spark, ivf_idx, queries, k=3, nprobe=2,
                         receipt=receipt).toPandas()
    assert receipt["nlist"] == 8
    assert 0 < receipt["lists_probed"] < 8
    assert (got.groupby("query_id")["rank"].max() == 3).all()
    codes = spark.read.parquet(os.path.join(ivf_idx, "codes"))
    hit_lists = {int(r["list_id"]) for r in codes.join(
        spark.createDataFrame(
            [(int(i),) for i in got["neighbor_id"].unique()], "id long"),
        "id").select("list_id").distinct().collect()}
    assert hit_lists <= set(receipt["probed_cells"])
    probed_plan = codes.where(F.col("list_id").isin(receipt["probed_cells"]))
    from tests.test_scale_evidence import explain_str
    assert "PartitionFilters" in explain_str(probed_plan)

    # frozen-coarse append keeps cell assignment arrival-order invariant
    # (same codebooks AND same coarse quantizer as the full build)
    from p2pddsketch_spark.operators.pq_index import _load_coarse
    coarse = _load_coarse(spark, ivf_idx, 8)
    ivf2 = str(tmp_path / "ivf2")
    save_pq_index(spark, emb.where(F.col("vec_id") % 2 == 0), ivf2,
                  codebooks=cb, nlist=8, coarse_centroids=coarse)
    append_pq_index(spark, emb.where(F.col("vec_id") % 2 == 1), ivf2)
    a = (spark.read.parquet(os.path.join(ivf_idx, "codes"))
         .select("id", "list_id").toPandas()
         .sort_values("id").reset_index(drop=True))
    b = (spark.read.parquet(os.path.join(ivf2, "codes"))
         .select("id", "list_id").toPandas()
         .sort_values("id").reset_index(drop=True))
    assert (a["id"] == b["id"]).all()
    assert (a["list_id"] == b["list_id"]).all()


def test_residual_encoded_index(spark, emb, queries, tmp_path):
    """encode='residual' (FAISS IVF-PQ): manifest records it, the
    full-rerank two-stage stays exact, frozen coarse+codebooks keep
    appends byte-identical — and on a constructed LOSSLESS corpus
    (distinct residual subvectors ≤ nk, all in the train sample) the
    ADC-only full-probe answer equals exact cosine_topk, pinning the
    q·c_cell + q·r̂ scoring decomposition itself."""
    from p2pddsketch_spark.operators.similarity import cosine_topk

    # --- real-data lifecycle: exactness of the full-rerank path -------
    idx = str(tmp_path / "res")
    man = save_pq_index(spark, emb, idx, m=8, nk=64, sample_size=1000,
                        seed=7, nlist=8, encode="residual")
    assert man["encode"] == "residual" and man["nlist"] == 8
    n = emb.count()
    got = query_pq_index(spark, idx, queries, k=5, rerank=n,
                         corpus=emb).toPandas()
    brute = cosine_topk(emb, queries, k=5).toPandas()
    assert (got["neighbor_id"].to_numpy()
            == brute["neighbor_id"].to_numpy()).all()
    assert (got["cosine"].to_numpy() == brute["cosine"].to_numpy()).all()

    # --- lossless construction: ADC-only == exact, full probe ---------
    rng = np.random.default_rng(5)
    d, m, nlist = 8, 4, 2
    coarse = np.zeros((nlist, d))
    coarse[0, 0] = 1.0
    coarse[1, 1] = 1.0
    deltas = rng.normal(scale=0.1, size=(4, d))
    base = []
    for c in range(nlist):
        for t in range(4):
            v = coarse[c] + deltas[t]
            base.append(v / np.linalg.norm(v))
    rows = [(i, [float(x) for x in base[i % len(base)]])
            for i in range(24)]
    tiny = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    tq = (tiny.where(F.col("vec_id") < 4)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("query_vec")))
    idx2 = str(tmp_path / "lossless")
    save_pq_index(spark, tiny, idx2, m=m, nk=16, sample_size=24, seed=3,
                  nlist=nlist, coarse_centroids=coarse, encode="residual")
    adc = query_pq_index(spark, idx2, tq, k=3).toPandas()
    exact = cosine_topk(tiny, tq, k=3).toPandas()
    assert (adc["neighbor_id"].to_numpy()
            == exact["neighbor_id"].to_numpy()).all()
    assert np.allclose(adc["cosine"].to_numpy(),
                       exact["cosine"].to_numpy(), atol=1e-5)

    # --- frozen coarse+codebooks: append arrival-order invariance -----
    from p2pddsketch_spark.operators.pq_index import _load_coarse
    cb, _, _ = load_pq_index(spark, idx)
    co = _load_coarse(spark, idx, 8)
    idx3 = str(tmp_path / "res2")
    save_pq_index(spark, emb.where(F.col("vec_id") % 2 == 0), idx3,
                  codebooks=cb, nlist=8, coarse_centroids=co,
                  encode="residual")
    append_pq_index(spark, emb.where(F.col("vec_id") % 2 == 1), idx3)
    a = _codes_pdf(spark, idx)
    b = _codes_pdf(spark, idx3)
    assert (a["id"] == b["id"]).all()
    assert (a["list_id"] == b["list_id"]).all()
    assert all((x == y).all() for x, y in zip(a["codes"], b["codes"]))


def test_cli_lifecycle(spark, tmp_path, capsys):
    import sys
    sys.path.insert(0, "/root/repo/jobs")
    import ann_index
    idx = str(tmp_path / "idx")
    src = f"{SF_DIR}/embeddings.parquet"
    qpath = str(tmp_path / "q.parquet")
    (spark.read.parquet(src).where(F.col("vec_id") < 4)
     .select(F.col("vec_id").alias("query_id"),
             F.col("embedding").alias("query_vec"))
     .write.parquet(qpath))

    rc = ann_index.main(["build", "--input", src, "--index-dir", idx,
                         "--m", "8", "--codebook-k", "32", "--iters", "3",
                         "--sample-size", "500"])
    man = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and man["m"] == 8 and man["n_rows"] > 0

    rc = ann_index.main(["info", "--index-dir", idx])
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and info["version"] == 1

    out_p = str(tmp_path / "hits.parquet")
    rc = ann_index.main(["query", "--index-dir", idx, "--queries", qpath,
                         "--k", "3", "--rerank", "20", "--corpus", src,
                         "--output", out_p])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and summary["n_hits"] == 12
    hits = spark.read.parquet(out_p)
    assert set(hits.columns) == {"query_id", "rank", "neighbor_id", "cosine"}

    # inline mode without --output
    rc = ann_index.main(["query", "--index-dir", idx, "--queries", qpath,
                         "--k", "2"])
    inline = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and inline["n_hits_shown"] == 8

    # error contract: missing index → JSON error line, exit 1
    rc = ann_index.main(["info", "--index-dir", str(tmp_path / "nope")])
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and "error" in err
