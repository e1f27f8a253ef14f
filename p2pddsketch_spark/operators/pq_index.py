"""Persisted PQ ANN index — build once, serve forever, append cheaply.

`operators/pq.py` gives the algebra (train / encode / ADC search); this
module gives it the lifecycle a 100 TB embedding corpus needs:

  build   train codebooks, encode the corpus, and persist BOTH as plain
          parquet plus a json manifest (written LAST — the commit
          marker, same discipline as `operators/rollup.py`): a reader
          that sees the manifest sees complete codebooks and codes.
  query   load codebooks (a few MB, driver-side) + the codes table and
          run `ann_topk_pq_encoded` — the corpus is scanned in m-byte
          code space; the float vectors are touched only for the
          optional exact rerank of the per-query shortlist.
  append  encode NEW rows with the FROZEN stored codebooks and append
          their codes — the serving property that matters at scale: an
          hourly embedding drop must not retrain (and thereby re-encode
          the whole corpus). Frozen-codebook appends are byte-identical
          to having had the rows at build time (pinned by test), so
          query results never depend on arrival order.

With `nlist` > 0 the index is IVF-PARTITIONED (the FAISS IVF-PQ shape,
Spark-first): a coarse quantizer assigns every row to one of `nlist`
cells IN THE SAME encode pass, and the codes land as parquet
`partitionBy("list_id")` — so a query that probes `nprobe` cells is a
PARTITION-PRUNED scan (Spark reads only the probed directories;
`PartitionFilters` in the plan, pinned by test). Probing is
batch-union: one query batch scans the union of its members' top-
`nprobe` cells — the union is what bounds the I/O, and ADC compute on
the extra rows is the cheap part by construction. Full probe
(nprobe = 0 or ≥ nlist) equals the flat index exactly (pinned).

All paths go through the Hadoop FileSystem helpers in
`operators/maintenance.py`, so an index can live on any URI the Spark
runtime has a connector for; plain local paths take the fast path.

With `encode="residual"` (needs nlist > 0) the codes quantize the
RESIDUAL x − c_cell instead of x — the full FAISS IVF-PQ shape: the m
bytes spend their alphabet on within-cell variation only. Queries
score with the inner-product decomposition q·x ≈ q·c_cell + q·r̂,
which keeps ONE LUT per query (the per-cell term is a scalar matrix)
— see `ann_topk_pq_encoded(cell_centroids=...)`.

Layout under `index_dir/`:
  codes/       parquet (id, codes array<int>)   — m bytes/row of signal
               (partitioned by list_id when nlist > 0)
  codebooks/   parquet (subspace, code, centroid array<double>)
  coarse/      parquet (list_id, centroid array<double>)  — nlist > 0
  manifest.json  format/m/nk/dim/width/normalize/cols/nlist/encode/
                 n_rows/version

Reference scope analog: the persist path of `DDS_PrintCSV`
(/root/reference/ddsketch.cc:913-954) — durable sketch state; here the
"sketch" is the PQ code table that stands in for the vectors.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, StructField,
                               StructType)

from p2pddsketch_spark.operators.maintenance import (_hadoop_fs, _read_text,
                                                     _write_text)
from p2pddsketch_spark.operators.pq import (_split, ann_topk_pq_encoded,
                                            encode_pq, train_pq,
                                            train_pq_mat)

__all__ = ["save_pq_index", "load_pq_index", "append_pq_index",
           "query_pq_index", "PQ_INDEX_FORMAT"]

PQ_INDEX_FORMAT = "pq-index-v1"


def _exists(spark: SparkSession, path: str) -> bool:
    if "://" not in path:
        return os.path.exists(path)
    fs, hp = _hadoop_fs(spark, path)
    return bool(fs.exists(hp))


def _mkdirs(spark: SparkSession, path: str) -> None:
    if "://" not in path:
        os.makedirs(path, exist_ok=True)
        return
    fs, hp = _hadoop_fs(spark, path)
    fs.mkdirs(hp)


def _paths(index_dir: str) -> tuple[str, str, str]:
    base = index_dir.rstrip("/")
    return base + "/codes", base + "/codebooks", base + "/manifest.json"


def _encode_with_lists(df: DataFrame, cb: np.ndarray, coarse: np.ndarray,
                       id_col: str, vec_col: str, normalize: bool,
                       residual: bool = False) -> DataFrame:
    """(id, codes, list_id) in ONE mapInPandas pass — the PQ argmin per
    subspace plus the coarse-cell argmax per row share the batch, so an
    IVF-partitioned build never joins codes to assignments. With
    `residual` the PQ target is x − c_cell (FAISS IVF-PQ): the codes
    quantize what the coarse quantizer did NOT explain, so the same m
    bytes carry only within-cell variation."""
    id_type = df.schema[id_col].dataType
    schema = StructType([StructField("id", id_type, True),
                         StructField("codes", ArrayType(IntegerType(), False),
                                     False),
                         StructField("list_id", IntegerType(), False)])
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
            lid = (M @ coarse.T).argmax(axis=1)
            tgt = M - coarse[lid] if residual else M
            codes = np.empty((len(M), m), dtype=np.int32)
            for j, sub in enumerate(_split(tgt, m)):
                codes[:, j] = (cnorm[j][None, :] - 2.0 * (sub @ cb[j].T)
                               ).argmin(axis=1)
            yield pd.DataFrame({"id": pdf[id_col], "codes": list(codes),
                                "list_id": lid.astype(np.int32)})

    return df.select(id_col, vec_col).mapInPandas(enc, schema=schema)


def _load_coarse(spark: SparkSession, index_dir: str, nlist: int
                 ) -> np.ndarray:
    pdf = (spark.read.parquet(index_dir.rstrip("/") + "/coarse").toPandas()
           .sort_values("list_id", kind="stable"))
    if len(pdf) != nlist:
        raise ValueError(f"coarse table has {len(pdf)} rows, manifest "
                         f"says nlist={nlist}")
    return np.stack(pdf["centroid"].to_numpy())


def _input_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None:
        raise ValueError("empty input: cannot determine embedding dim")
    return int(row["d"])


def save_pq_index(spark: SparkSession, df: DataFrame, index_dir: str,
                  m: int = 8, nk: int = 256, iters: int = 10,
                  sample_size: int = 10_000, seed: int = 29,
                  normalize: bool = True, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  codebooks: np.ndarray | None = None,
                  nlist: int = 0, coarse_fit: str = "driver",
                  coarse_iters: int = 10,
                  coarse_centroids: np.ndarray | None = None,
                  encode: str = "raw",
                  overwrite: bool = False) -> dict:
    """Train (or take) codebooks, encode `df`, persist codes + codebooks
    + manifest under `index_dir`. Returns the manifest dict. Refuses an
    already-committed index unless `overwrite` (a torn previous attempt
    — data but no manifest — is always safe to overwrite).

    `nlist` > 0 builds the IVF-partitioned variant: a coarse quantizer
    (spherical k-means; `coarse_fit="driver"` trains on a bounded
    driver sample, `"distributed"` runs full-corpus Lloyd passes via
    operators.kmeans) assigns every row a cell in the same encode pass,
    and codes are written `partitionBy("list_id")` so probed queries
    are partition-pruned scans.

    `encode="residual"` (needs nlist > 0) is the full FAISS IVF-PQ
    shape: the PQ codes quantize x − c_cell instead of x, so the m
    bytes spend their alphabet on within-cell variation only —
    codebooks are trained on the SAMPLE'S residuals (when not supplied;
    supplied codebooks are taken as residual-space). Queries score via
    the inner-product decomposition q·x ≈ q·c_cell + q·r̂ (one LUT per
    query + an (n_q × nlist) scalar matrix — see ann_topk_pq_encoded)."""
    codes_p, books_p, man_p = _paths(index_dir)
    if _exists(spark, man_p) and not overwrite:
        raise ValueError(f"index already exists at {index_dir!r} "
                         "(pass overwrite=True to rebuild)")
    if encode not in ("raw", "residual"):
        raise ValueError(f"encode must be 'raw' or 'residual', "
                         f"got {encode!r}")
    if encode == "residual" and nlist <= 0:
        raise ValueError("encode='residual' needs nlist > 0 (the residual "
                         "is relative to the coarse cell)")
    dim = _input_dim(df, vec_col)

    coarse = None
    sample = None
    if nlist > 0:
        if coarse_centroids is not None:
            coarse = np.asarray(coarse_centroids, dtype=np.float64)
            if coarse.shape != (nlist, dim):
                raise ValueError(f"coarse_centroids shape {coarse.shape} "
                                 f"!= ({nlist}, {dim})")
        elif coarse_fit == "distributed":
            from p2pddsketch_spark.operators.kmeans import \
                kmeans_fit_distributed
            coarse = kmeans_fit_distributed(
                df, vec_col=vec_col, k=nlist, iters=coarse_iters,
                seed=seed, sample_size=sample_size)
        elif coarse_fit == "driver":
            from p2pddsketch_spark.operators.similarity import _kmeans_fit
            rows = df.select(vec_col).limit(sample_size).collect()
            sample = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                               for r in rows])
            coarse = _kmeans_fit(sample, nlist=nlist, iters=coarse_iters,
                                 seed=seed)
        else:
            raise ValueError(f"coarse_fit must be 'driver' or "
                             f"'distributed', got {coarse_fit!r}")

    if codebooks is not None:
        cb = codebooks
    elif encode == "residual":
        # train on exactly what gets encoded: the sample's residuals
        # (normalized first, matching the encode pass)
        if sample is None:
            rows = df.select(vec_col).limit(sample_size).collect()
            if not rows:
                raise ValueError("save_pq_index: empty input")
            sample = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                               for r in rows])
        x = sample
        if normalize:
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                               1e-12)
        cb = train_pq_mat(x - coarse[(x @ coarse.T).argmax(axis=1)],
                          m=m, k=nk, iters=iters, seed=seed)
    elif sample is not None:
        # the driver coarse fit already collected the identical sample
        # (same plan, same rows) — train on it instead of collecting a
        # second time (round-6; one fewer driver round-trip per build)
        x = sample
        if normalize:
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                               1e-12)
        cb = train_pq_mat(x, m=m, k=nk, iters=iters, seed=seed)
    else:
        cb = train_pq(df, vec_col=vec_col, m=m, k=nk, iters=iters,
                      sample_size=sample_size, seed=seed,
                      normalize=normalize)
    cb = np.asarray(cb, dtype=np.float64)
    m, nk_eff, width = cb.shape
    if m * width != dim:
        raise ValueError(f"codebook shape {cb.shape} does not cover "
                         f"input dim {dim}")

    if nlist > 0:
        # cluster rows by their target partition before the dynamic-
        # partition write: without this every task writes a file into
        # every list_id dir (tasks × nlist tiny files — measured 7.6 s
        # of the 11.5 s sf0.1 receipt build); with it each list's rows
        # land in one task → one file per list per shuffle partition,
        # the layout a 100 TB code corpus wants anyway
        _encode_with_lists(df, cb, coarse, id_col, vec_col, normalize,
                           residual=(encode == "residual")) \
            .repartition("list_id") \
            .write.mode("overwrite").partitionBy("list_id").parquet(codes_p)
        # repartition(1), NOT coalesce(1): coalescing a parallelized
        # local collection folds its ~defaultParallelism python slices
        # into ONE task that pays a per-slice Python-channel round trip
        # serially (measured 6-10 s for a 16-row write; with the shuffle
        # the slices evaluate in parallel and one reducer writes the
        # single file — round-6)
        spark.createDataFrame(
            [(i, [float(v) for v in coarse[i]]) for i in range(nlist)],
            "list_id int, centroid array<double>") \
            .repartition(1).write.mode("overwrite") \
            .parquet(index_dir.rstrip("/") + "/coarse")
    else:
        encode_pq(df, cb, id_col=id_col, vec_col=vec_col,
                  normalize=normalize).write.mode("overwrite") \
            .parquet(codes_p)
    n_rows = spark.read.parquet(codes_p).count()

    book_rows = [(j, c, [float(v) for v in cb[j, c]])
                 for j in range(m) for c in range(nk_eff)]
    spark.createDataFrame(
        book_rows, "subspace int, code int, centroid array<double>") \
        .repartition(1).write.mode("overwrite").parquet(books_p)

    manifest = {
        "format": PQ_INDEX_FORMAT, "version": 1,
        "m": int(m), "nk": int(nk_eff), "dim": int(dim), "width": int(width),
        "normalize": bool(normalize),
        "id_col": id_col, "vec_col": vec_col,
        "nlist": int(nlist), "encode": encode,
        "n_rows": int(n_rows),
        "history": [{"version": 1, "op": "build", "rows": int(n_rows)}],
    }
    _mkdirs(spark, index_dir.rstrip("/"))
    _write_text(spark, man_p, json.dumps(manifest, indent=1))
    return manifest


def load_pq_index(spark: SparkSession, index_dir: str
                  ) -> tuple[np.ndarray, dict, DataFrame]:
    """(codebooks, manifest, codes DataFrame). Refuses a torn or foreign
    directory: the manifest is the commit marker — no manifest, no
    index."""
    codes_p, books_p, man_p = _paths(index_dir)
    if not _exists(spark, man_p):
        raise ValueError(f"no committed PQ index at {index_dir!r} "
                         "(manifest.json missing — torn build or wrong path)")
    manifest = json.loads(_read_text(spark, man_p))
    if manifest.get("format") != PQ_INDEX_FORMAT:
        raise ValueError(f"unsupported index format "
                         f"{manifest.get('format')!r} at {index_dir!r}")
    pdf = (spark.read.parquet(books_p).toPandas()
           .sort_values(["subspace", "code"], kind="stable"))
    m, nk, width = manifest["m"], manifest["nk"], manifest["width"]
    if len(pdf) != m * nk:
        raise ValueError(f"codebook table has {len(pdf)} rows, manifest "
                         f"says {m}x{nk}")
    cb = np.stack(pdf["centroid"].to_numpy()).reshape(m, nk, width)
    return cb, manifest, spark.read.parquet(codes_p)


def append_pq_index(spark: SparkSession, df: DataFrame, index_dir: str,
                    id_col: str | None = None, vec_col: str | None = None
                    ) -> dict:
    """Encode `df` with the index's FROZEN codebooks and append the
    codes — no retrain, no re-encode of existing rows. Column names
    default to the ones recorded at build time. Id uniqueness is the
    caller's contract (same as any parquet append)."""
    codes_p, _, man_p = _paths(index_dir)
    cb, manifest, _ = load_pq_index(spark, index_dir)
    id_col = id_col or manifest["id_col"]
    vec_col = vec_col or manifest["vec_col"]
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        return manifest           # empty drop: a no-op, not a version bump
    if first["d"] is None:
        raise ValueError("null embedding in append input")
    if int(first["d"]) != manifest["dim"]:
        raise ValueError(f"append dim {int(first['d'])} != index dim "
                         f"{manifest['dim']}")
    n_new = df.count()
    nlist = int(manifest.get("nlist", 0))
    if nlist > 0:
        coarse = _load_coarse(spark, index_dir, nlist)
        _encode_with_lists(df, cb, coarse, id_col, vec_col,
                           manifest["normalize"],
                           residual=(manifest.get("encode") == "residual")) \
            .repartition("list_id") \
            .write.mode("append").partitionBy("list_id").parquet(codes_p)
    else:
        encode_pq(df, cb, id_col=id_col, vec_col=vec_col,
                  normalize=manifest["normalize"]) \
            .write.mode("append").parquet(codes_p)
    manifest["version"] = int(manifest["version"]) + 1
    manifest["n_rows"] = int(manifest["n_rows"]) + int(n_new)
    manifest["history"].append({"version": manifest["version"],
                                "op": "append", "rows": int(n_new)})
    _write_text(spark, man_p, json.dumps(manifest, indent=1))
    return manifest


def query_pq_index(spark: SparkSession, index_dir: str, queries: DataFrame,
                   k: int = 5, rerank: int = 0,
                   corpus: DataFrame | None = None, nprobe: int = 0,
                   qid_col: str = "query_id", qvec_col: str = "query_vec",
                   receipt: dict | None = None) -> DataFrame:
    """ADC top-k against the persisted index — the m-byte code-space
    scan; pass `corpus` (the original id→vector table) with `rerank` >
    0 for the exact two-stage. Output schema = `cosine_topk`'s.

    On an IVF-partitioned index (manifest nlist > 0), `nprobe` > 0
    restricts the scan to the UNION of each query's `nprobe` nearest
    cells — a partition-pruned read of only those directories. nprobe =
    0 (or ≥ nlist, or a flat index) scans everything and equals the
    flat answer exactly. Pass a dict as `receipt` to get
    {nlist, lists_probed} back (the pruning evidence). A residual-
    encoded index (manifest encode == "residual") scores with the
    q·c_cell + q·r̂ decomposition transparently."""
    cb, manifest, codes = load_pq_index(spark, index_dir)
    nlist = int(manifest.get("nlist", 0))
    residual = manifest.get("encode") == "residual"
    coarse = _load_coarse(spark, index_dir, nlist) if nlist > 0 else None
    qrows = None
    if nlist > 0 and 0 < nprobe < nlist:
        # ONE driver collect serves both probe selection here and the
        # LUT build inside ann_topk_pq_encoded (via _qrows)
        qrows = queries.select(qid_col, qvec_col).collect()
        if not qrows:
            raise ValueError("ann_topk_pq: empty query set")
        qv = np.stack([np.asarray(r[qvec_col], dtype=np.float64)
                       for r in qrows])
        qv = qv / np.maximum(np.linalg.norm(qv, axis=1, keepdims=True),
                             1e-12)
        near = np.argsort(-(qv @ coarse.T), kind="stable")[:, :nprobe]
        probes = sorted(int(c) for c in np.unique(near))
        codes = codes.where(F.col("list_id").isin(probes))
        if receipt is not None:
            receipt.update(nlist=nlist, lists_probed=len(probes),
                           probed_cells=probes)
    elif receipt is not None:
        receipt.update(nlist=nlist, lists_probed=nlist)
    return ann_topk_pq_encoded(
        codes, cb, queries, k=k, rerank=rerank, corpus=corpus,
        id_col=manifest["id_col"], vec_col=manifest["vec_col"],
        qid_col=qid_col, qvec_col=qvec_col,
        cell_centroids=coarse if residual else None, _qrows=qrows)
