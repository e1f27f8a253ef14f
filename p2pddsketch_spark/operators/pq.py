"""Product quantization (PQ) for embedding storage + ANN search
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011) — the storage format a 100 TB embedding corpus
actually serves ANN from.

The vector is split into `m` contiguous subspaces; each subvector is
replaced by the index of its nearest codeword in a 256-entry per-
subspace codebook → the stored vector is m BYTES (d=1024 float32 →
m=64 bytes is a 64× compression, far past int8's 4×). Search uses
asymmetric distance computation (ADC): the query stays exact, one
m×256 lookup table of query·codeword partial inner products is built
per query on the driver, and a corpus row's score is m table gathers —
no float vector is ever touched at scan time.

Spark shape (the same discipline as the rest of the ANN family):

* `train_pq` — per-subspace Euclidean k-means on a bounded driver
  sample (the FAISS protocol; codebooks are m×256×(d/m) ≈ a few MB and
  broadcast by closure). Deterministic: seeded init, fixed iteration
  count, ties broken by lowest index.
* `encode_pq` — one mapInPandas pass; per batch, per subspace, one
  ‖x−c‖² argmin via the matmul identity (‖c‖² − 2x·c), emitting
  (id, codes array<int>) — only code arrays shuffle ever after.
* `ann_topk_pq` — broadcast LUTs, distributed gather-sum scoring, and
  optional EXACT rerank of the top `rerank` ADC candidates per query
  (fetch the float vectors of candidates only — the two-stage pattern
  every production PQ system runs). With `rerank` ≥ corpus size the
  result is exactly `cosine_topk` (pinned by test in the lossless
  regime).
* `ann_topk_pq_encoded` — the SERVING entry point: same search, but
  over an already-encoded (id, codes) table (e.g. a persisted index
  built once by `operators/pq_index.py`) so queries never re-encode
  the corpus. `ann_topk_pq` is train + encode + this.

Scale contract: the corpus is scanned in code space (m bytes/row);
the scan is vectorized across the whole query batch (one LUT gather
per subspace, not a Python loop per query); candidate vector fetches
are |queries|×rerank rows, not |corpus|.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType, LongType,
                               StructField, StructType)
from pyspark.sql.window import Window

from p2pddsketch_spark.operators.similarity import cosine_sim_col

__all__ = ["train_pq", "train_pq_mat", "encode_pq", "ann_topk_pq",
           "ann_topk_pq_encoded"]


def _split(mtx: np.ndarray, m: int) -> list[np.ndarray]:
    """m contiguous (n, d/m) subspace views of an (n, d) matrix."""
    d = mtx.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    w = d // m
    return [mtx[:, j * w:(j + 1) * w] for j in range(m)]


def _euclid_kmeans_from_init(x: np.ndarray, uniq: np.ndarray,
                             init_idx, k: int, iters: int) -> np.ndarray:
    """Lloyd iterations from a pre-drawn init (see `_euclid_kmeans` for
    the contract). The centroid update is the house sorted-segment
    reduceat (one stable sort + one contiguous pass) instead of a
    256-way boolean-mask loop — round-6: the mask loop was ~20k masked
    mean() calls per training and dominated the driver-side build. The
    stable sort keeps members in original row order, so per-cluster
    summation order (and, below numpy's 128-element pairwise block,
    the exact float result) matches the masked form."""
    if len(uniq) <= k:
        cent = np.zeros((k, x.shape[1]))
        cent[:len(uniq)] = uniq           # lossless: every point is a codeword
        cent[len(uniq):] = uniq[0] if len(uniq) else 0.0
        return cent
    cent = uniq[init_idx].copy()
    for _ in range(iters):
        d2 = (cent * cent).sum(axis=1)[None, :] - 2.0 * (x @ cent.T)
        assign = d2.argmin(axis=1)
        order = np.argsort(assign, kind="stable")
        a_s, x_s = assign[order], x[order]
        starts = np.empty(a_s.size, dtype=bool)
        starts[0] = True
        starts[1:] = a_s[1:] != a_s[:-1]
        seg = np.flatnonzero(starts)
        live = a_s[seg]
        cnt = np.diff(np.append(seg, a_s.size))
        cent[live] = np.add.reduceat(x_s, seg, axis=0) / cnt[:, None]
    return cent


def _euclid_kmeans(x: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """Plain Euclidean Lloyd on a driver sample — deterministic: seeded
    distinct-row init (duplicates collapsed first so tiny alphabets get
    every distinct point as a codeword — the lossless regime), argmin
    ties to the lowest index, empty codewords keep their previous
    position."""
    uniq = np.unique(x, axis=0)
    init = rng.choice(len(uniq), size=k, replace=False) \
        if len(uniq) > k else None
    return _euclid_kmeans_from_init(x, uniq, init, k, iters)


def train_pq_mat(x: np.ndarray, m: int = 8, k: int = 256, iters: int = 10,
                 seed: int = 29) -> np.ndarray:
    """Fit (m, k, d/m) PQ codebooks on an in-memory sample matrix — the
    numpy half of `train_pq`, exposed so callers that quantize a
    TRANSFORM of the vectors (e.g. the IVF-PQ residual x − c_cell in
    `operators/pq_index.py`) can train on exactly what gets encoded.

    The init draws replay the sequential rng stream subspace-by-subspace
    (identical codebook inits to the serial form), then the independent
    Lloyd loops run on a thread pool — numpy's matmul releases the GIL,
    so the m subspaces train concurrently (round-6; ~4× on the driver
    build phase)."""
    from concurrent.futures import ThreadPoolExecutor
    rng = np.random.default_rng(seed)
    tasks = []
    for sub in _split(x, m):
        uniq = np.unique(sub, axis=0)
        init = rng.choice(len(uniq), size=k, replace=False) \
            if len(uniq) > k else None
        tasks.append((sub, uniq, init))
    if len(tasks) == 1:
        sub, uniq, init = tasks[0]
        return np.stack([_euclid_kmeans_from_init(sub, uniq, init, k, iters)])
    with ThreadPoolExecutor(max_workers=min(len(tasks), 8)) as ex:
        cents = list(ex.map(
            lambda t: _euclid_kmeans_from_init(t[0], t[1], t[2], k, iters),
            tasks))
    return np.stack(cents)


def train_pq(df: DataFrame, vec_col: str = "embedding", m: int = 8,
             k: int = 256, iters: int = 10, sample_size: int = 10_000,
             seed: int = 29, normalize: bool = True) -> np.ndarray:
    """Fit the (m, k, d/m) PQ codebooks on a bounded driver sample.
    `normalize` L2-normalizes sample rows first so ADC inner products
    approximate cosine (matching the rest of the ANN family)."""
    rows = df.select(vec_col).limit(sample_size).collect()
    if not rows:
        raise ValueError("train_pq: empty input")
    x = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    if normalize:
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    return train_pq_mat(x, m=m, k=k, iters=iters, seed=seed)


def encode_pq(df: DataFrame, codebooks: np.ndarray,
              id_col: str = "vec_id", vec_col: str = "embedding",
              normalize: bool = True) -> DataFrame:
    """(id, codes array<int>) — nearest codeword per subspace, one
    ‖c‖²−2x·c argmin matmul per (batch, subspace). Deterministic
    (argmin lowest-index tiebreak)."""
    id_type = df.schema[id_col].dataType
    schema = StructType([StructField("id", id_type, True),
                         StructField("codes", ArrayType(IntegerType(), False),
                                     False)])
    cb = codebooks
    m = cb.shape[0]

    def enc(batches):
        cnorm = [(c * c).sum(axis=1) for c in cb]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if normalize:
                M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True),
                                   1e-12)
            codes = np.empty((len(M), m), dtype=np.int32)
            for j, sub in enumerate(_split(M, m)):
                codes[:, j] = (cnorm[j][None, :] - 2.0 * (sub @ cb[j].T)
                               ).argmin(axis=1)
            yield pd.DataFrame({"id": pdf[id_col], "codes": list(codes)})

    return df.select(id_col, vec_col).mapInPandas(enc, schema=schema)


def ann_topk_pq(corpus: DataFrame, queries: DataFrame, k: int = 5,
                m: int = 8, nk: int = 256, iters: int = 10,
                sample_size: int = 10_000, seed: int = 29,
                rerank: int = 0, codebooks: np.ndarray | None = None,
                id_col: str = "vec_id", vec_col: str = "embedding",
                qid_col: str = "query_id", qvec_col: str = "query_vec"
                ) -> DataFrame:
    """PQ-ADC approximate top-k, same output schema as `cosine_topk`
    (query_id, rank, neighbor_id, cosine).

    `rerank` = 0 ranks purely by ADC score (corpus scanned in code
    space only; `cosine` is then the ADC approximation). `rerank` > 0
    takes the top `rerank` ADC candidates per query and re-scores them
    with EXACT cosine on the fetched vectors — the production
    two-stage; with rerank ≥ |corpus| and lossless codebooks the output
    equals `cosine_topk` exactly."""
    cb = codebooks if codebooks is not None else train_pq(
        corpus, vec_col=vec_col, m=m, k=nk, iters=iters,
        sample_size=sample_size, seed=seed)
    enc = encode_pq(corpus, cb, id_col=id_col, vec_col=vec_col)
    return ann_topk_pq_encoded(enc, cb, queries, k=k, rerank=rerank,
                               corpus=corpus, id_col=id_col, vec_col=vec_col,
                               qid_col=qid_col, qvec_col=qvec_col)


def ann_topk_pq_encoded(enc: DataFrame, codebooks: np.ndarray,
                        queries: DataFrame, k: int = 5, rerank: int = 0,
                        corpus: DataFrame | None = None,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        qid_col: str = "query_id", qvec_col: str = "query_vec",
                        cell_centroids: np.ndarray | None = None,
                        cell_col: str = "list_id",
                        _qrows: list | None = None) -> DataFrame:
    """ADC top-k over an ALREADY-ENCODED (id, codes) table — the serving
    path: a persisted index (`operators/pq_index.py`) is encoded once
    and every query batch pays only the m-byte code-space scan.

    `corpus` (the original id→vector table) is required only when
    `rerank` > 0 — the exact second stage fetches the |queries|×rerank
    candidate vectors from it. Output schema and semantics are exactly
    `ann_topk_pq`'s (query_id, rank, neighbor_id, cosine).

    `cell_centroids` (nlist, d) switches scoring to the RESIDUAL
    decomposition q·x ≈ q·c_cell + q·r̂: `enc` must then carry the
    coarse-cell id in `cell_col` and its codes must quantize the
    residual x − c_cell. Inner-product ADC keeps ONE LUT per query —
    the per-(query, cell) term is the scalar matrix qv @ centroids.T,
    added to the gather-sum per row (unlike L2-ADC, which would need a
    full LUT per probed cell)."""
    cb = codebooks
    m = int(cb.shape[0])
    if rerank > 0 and corpus is None:
        raise ValueError("rerank > 0 needs `corpus` (the id→vector table) "
                         "for the exact second stage")
    # `_qrows` lets a caller that already collected the (qid, qvec) rows
    # (query_pq_index's probe selection) skip a second driver round trip
    qrows = queries.collect() if _qrows is None else _qrows
    if not qrows:
        raise ValueError("ann_topk_pq: empty query set")
    qv = np.stack([np.asarray(r[qvec_col], dtype=np.float64) for r in qrows])
    qv = qv / np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-12)
    if qv.shape[1] != m * cb.shape[2]:
        raise ValueError(f"query dim {qv.shape[1]} != index dim "
                         f"{m * cb.shape[2]}")
    qids = np.array([int(r[qid_col]) for r in qrows], dtype=np.int64)
    # one m×nk inner-product LUT per query: luts[q, j, c] = q_sub_j · cb[j][c]
    luts = np.ascontiguousarray(
        np.stack([sub @ cb[j].T for j, sub in enumerate(_split(qv, m))],
                 axis=1))  # (n_q, m, nk)
    cell_offs = None
    if cell_centroids is not None:
        cc = np.asarray(cell_centroids, dtype=np.float64)
        if cc.shape[1] != qv.shape[1]:
            raise ValueError(f"cell_centroids dim {cc.shape[1]} != query "
                             f"dim {qv.shape[1]}")
        cell_offs = qv @ cc.T                      # (n_q, nlist)

    id_type = enc.schema["id"].dataType
    schema = StructType([StructField("query_id", LongType(), False),
                         StructField("neighbor_id", id_type, True),
                         StructField("adc", DoubleType(), False)])
    topn = max(k, rerank)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64).T
            ids = pdf["id"].to_numpy()
            lids = (pdf[cell_col].to_numpy().astype(np.int64)
                    if cell_offs is not None else None)
            n = codes.shape[1]
            # +1: the self row (query_id == neighbor_id) is filtered
            # AFTER the scan — a partition holding it must still ship
            # topn OTHER candidates or a 1-partition corpus comes up
            # one short
            take = min(topn + 1, n)
            # vectorized across queries: per chunk, ONE fancy-gather per
            # subspace — (chunk, m, n) floats — instead of a Python loop
            # per query; chunk sized so the gather stays ~64 MB
            chunk = max(1, 8_000_000 // max(m * n, 1))
            sub = np.arange(m)[:, None]
            # the pre-top must pick the SAME rows the global
            # (adc desc, neighbor_id asc) window would: break score
            # ties by id, or the kept set depends on row order within
            # the partition (= file layout — a rebuilt/appended index
            # would answer differently on ties)
            id_key = np.argsort(np.argsort(ids, kind="stable"),
                                kind="stable")  # rank of each id, any dtype
            for q0 in range(0, len(qids), chunk):
                lut = luts[q0:q0 + chunk]              # (c, m, nk)
                s = lut[:, sub, codes].sum(axis=1)     # (c, n)
                if cell_offs is not None:
                    s = s + cell_offs[q0:q0 + chunk][:, lids]
                s = np.round(s, 9)                     # rank on emitted value
                # per-partition pre-top: ship only topn rows per query
                part = np.argpartition(-s, take - 1, axis=1)[:, :take]
                rowsel = np.arange(part.shape[0])[:, None]
                bmin = s[rowsel, part].min(axis=1)
                tied = (s >= bmin[:, None]).sum(axis=1) > take
                for r in np.nonzero(tied)[0]:
                    cand = np.nonzero(s[r] >= bmin[r])[0]
                    order = np.lexsort((id_key[cand], -s[r, cand]))
                    part[r] = cand[order[:take]]
                yield pd.DataFrame({
                    "query_id": np.repeat(qids[q0:q0 + chunk], take),
                    "neighbor_id": ids[part.ravel()],
                    "adc": s[rowsel, part].ravel(),
                })

    scored = enc.mapInPandas(score, schema=schema)
    scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"),
                                              F.asc("neighbor_id"))
    top = (scored.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= topn))
    if rerank <= 0:
        return (top.where(F.col("rank") <= k)
                .select(F.col("query_id").alias(qid_col), "rank",
                        "neighbor_id", F.col("adc").alias("cosine"))
                .orderBy(qid_col, "rank"))

    # exact second stage: fetch ONLY the candidates' vectors
    spark = enc.sparkSession
    qdf = spark.createDataFrame(
        [(int(r[qid_col]), [float(v) for v in r[qvec_col]]) for r in qrows],
        f"query_id long, {qvec_col} array<float>")
    cand = (top.select("query_id", "neighbor_id")
            .join(corpus.select(F.col(id_col).alias("neighbor_id"), vec_col),
                  "neighbor_id")
            .join(F.broadcast(qdf), "query_id"))
    sim = F.round(cosine_sim_col(F.col(vec_col), F.col(qvec_col)), 6)
    rescored = cand.select("query_id", "neighbor_id", sim.alias("cosine"))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                                F.asc("neighbor_id"))
    return (rescored.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k)
            .select(F.col("query_id").alias(qid_col), "rank", "neighbor_id",
                    "cosine")
            .orderBy(qid_col, "rank"))
