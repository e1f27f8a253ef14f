"""Benchmark driver — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Two workloads:
1. headline query set over the testdata tables (timings per query);
2. the BASELINE.json primary figure of merit — tokens/sec sketch-build
   throughput: a single mapInArrow pass over a deterministic sequences
   table (doc_id, tokens array<int32>, n_tok, source) building
   DDSketch(n_tok) + HLL/CMS/Bloom(tokens) simultaneously, merged via
   the salted shuffle tree. Reported as `tokens_per_sec`
   (token-ids ingested / wall-clock). Env knobs:
   SPARK_GRAFT_BENCH_ROWS (default 200_000 sequences ≈ 100M tokens),
   SPARK_GRAFT_CPUS (parallelism — used by BENCH/scaling runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "dds_quantiles_lineitem",
    "dds_price_by_flag",
    "dds_events_catalyst",
    "dds_doclen_by_lang",
    "dds_events_hourly",
    "sketch_counts_events",
    "tpch_q1",
    "join_revenue_by_nation",
    "top_tokens_exact",
    "minhash_lsh_pairs_prod",
    "ann_cosine_topk",
]

# text-pipeline regression sentinels (round-5): timed like HEADLINE but
# reported under "pipeline_queries" and NOT folded into the headline
# total, so round-over-round headline comparability is preserved
PIPELINE = [
    "bpe_train_merges",
    "tokenize_vocab",
    "strip_spans",       # exact substring dedup (added round 5)
    "source_kl",         # per-source KL divergence (round 5, final sitting)
    "importance_select",  # DSIR raw+hashed scoring (round 5, final sitting)
]

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def ensure_sequences(spark, n_rows: int) -> tuple[str, int]:
    """Generate (once) and cache the bench sequences table; returns
    (path, total_tokens)."""
    path = os.path.join(CACHE_DIR, f"sequences_{n_rows}.parquet")
    meta = os.path.join(CACHE_DIR, f"sequences_{n_rows}.tokens")
    if not (os.path.exists(path) and os.path.exists(meta)):
        from p2pddsketch_spark.sources.sequences import generate_sequences
        df = generate_sequences(spark, n_rows, seed=42)
        df.write.mode("overwrite").parquet(path)
        from pyspark.sql import functions as F
        total = spark.read.parquet(path).agg(F.sum("n_tok")).collect()[0][0]
        with open(meta, "w") as f:
            f.write(str(int(total)))
    with open(meta) as f:
        total = int(f.read().strip())
    return path, total


def sketch_build_throughput(spark, path: str, total_tokens: int) -> dict:
    """The north-star workload: ALL SIX sketch types in one pass, grouped
    by the deliberately-skewed `source` column (web 80%), stage-2 fan-in
    bounded by partition salting."""
    from p2pddsketch_spark.operators.harness import (
        SketchSpec, array_extractor, build_sketches_from_files, scalar_extractor)
    from p2pddsketch_spark.sketches.bloom import BloomFilter
    from p2pddsketch_spark.sketches.cms import CountMinSketch
    from p2pddsketch_spark.sketches.ddsketch import DDSketch
    from p2pddsketch_spark.sketches.hll import HyperLogLog
    from p2pddsketch_spark.sketches.kll import KLLSketch
    from p2pddsketch_spark.sketches.tdigest import TDigest

    grouped = os.environ.get("SPARK_GRAFT_BENCH_GROUPED", "1") == "1"
    # 2 files/task = 16 workers on 32 cores: measured faster than 32
    # lean workers on this box's saturated memory bus (BENCH/BASELINE.md
    # membw receipts; round-2 verdict item #8)
    fpt = int(os.environ.get("SPARK_GRAFT_BENCH_FPT", "2"))
    specs = [
        SketchSpec("dds_ntok", lambda: DDSketch(alpha=0.001, bin_limit=1 << 22),
                   scalar_extractor("n_tok")),
        SketchSpec("kll_ntok", lambda: KLLSketch(k=256), scalar_extractor("n_tok")),
        SketchSpec("tdigest_ntok", lambda: TDigest(delta=200), scalar_extractor("n_tok")),
        SketchSpec("hll_tokens", lambda: HyperLogLog(p=14), array_extractor("tokens")),
        SketchSpec("cms_tokens", lambda: CountMinSketch(depth=4, width=1 << 16),
                   array_extractor("tokens")),
        SketchSpec("bloom_tokens", lambda: BloomFilter(m_bits=1 << 21, k=5),
                   array_extractor("tokens")),
    ]
    group_cols = ("source",) if grouped else ()
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    secs, n_final = None, 0
    for _ in range(reps):
        t0 = time.monotonic()
        out = build_sketches_from_files(spark, path, specs, group_cols=group_cols,
                                        salt_buckets=32, files_per_task=fpt)
        n_final = out.count()
        dt = time.monotonic() - t0
        secs = dt if secs is None else min(secs, dt)
    return {
        "sketch_build_secs": round(secs, 3),
        "tokens_per_sec": round(total_tokens / secs, 1),
        "total_tokens": total_tokens,
        "n_final_sketches": n_final,
        "grouped_by": ",".join(group_cols) or "none",
        "n_sketch_types": len(specs),
        "files_per_task": fpt,
    }


def bloom_join_receipt(spark, sf_dir: str, reps: int) -> dict:
    """Measured receipt for the Bloom runtime join filter: the same
    shuffle-hash join (lineitem ⋈ 10%-selective orders) with and without
    the pre-shuffle Bloom prune, plus the fact-row count entering the
    exchange each way. The SHUFFLE-VOLUME cut is the scale receipt (at
    100 TB the fact shuffle dominates); wall-clock at this SF also prices
    the Python probe stage, whose fixed cost exceeds the tiny shuffle
    saved on 600k rows — both numbers are reported so the crossover is
    explicit."""
    from pyspark.sql import functions as F
    from p2pddsketch_spark.operators.runtime_filter import bloom_semi_filter
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .where(F.col("o_totalprice") > 450000.0)
              .select("o_orderkey", "o_orderpriority"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(20,6)")

    def agg(j):
        return (j.groupBy("o_orderpriority")
                .agg(F.count("*").alias("n"), F.sum(rev).alias("r")).count())

    def best(f):
        b = None
        for _ in range(reps):
            t0 = time.monotonic()
            f()
            dt = time.monotonic() - t0
            b = dt if b is None else min(b, dt)
        return b

    def plain():
        return agg(li.hint("shuffle_hash")
                   .join(orders, li["l_orderkey"] == F.col("o_orderkey")))

    def bloomed():
        pr = bloom_semi_filter(li, "l_orderkey",
                               orders.select("o_orderkey"), "o_orderkey")
        return agg(pr.hint("shuffle_hash")
                   .join(orders, pr["l_orderkey"] == F.col("o_orderkey")))

    tp, tb = best(plain), best(bloomed)
    n_fact = li.count()
    n_after = bloom_semi_filter(li, "l_orderkey",
                                orders.select("o_orderkey"), "o_orderkey").count()
    return {
        "plain_secs": round(tp, 3), "bloom_secs": round(tb, 3),
        "fact_rows_shuffled_plain": int(n_fact),
        "fact_rows_shuffled_bloom": int(n_after),
        "pruned_rows": int(n_fact - n_after),
        "pruned_pct": round(100.0 * (1 - n_after / n_fact), 2),
    }


def warehouse_receipt(spark, sf_dir: str, reps: int) -> dict:
    """Round-over-round visibility for the warehouse path (same
    principle as the pipeline sentinels): one full cycle over the
    events table — `rollup_update` building five families in one pass
    (dds quantiles, wdds windowed quantiles, shll windowed distinct,
    eh windowed rate, wss windowed top-k) grouped by event_type into a
    fresh state dir, then the four trailing-window monitors answered
    from the committed blobs. Reported: update wall time and the total
    window-query wall time (best of `reps`); the query figure is the
    zero-input-re-scan promise made measurable."""
    import shutil as sh
    import tempfile

    from p2pddsketch_spark.operators import rollup as R
    from p2pddsketch_spark.operators.harness import (SketchSpec,
                                                     pair_extractor,
                                                     scalar_extractor,
                                                     vpair_extractor)
    from p2pddsketch_spark.sketches.ddsketch import DDSketch
    from p2pddsketch_spark.sketches.eh import ExpHistogram
    from p2pddsketch_spark.sketches.sliding_hll import SlidingHyperLogLog
    from p2pddsketch_spark.sketches.wdds import WindowedDDSketch
    from p2pddsketch_spark.sketches.wss import WindowedSpaceSaving

    day_us = 86_400_000_000

    def specs():
        return [
            SketchSpec("dds", lambda: DDSketch(alpha=0.01,
                                               bin_limit=1 << 22),
                       scalar_extractor("value")),
            SketchSpec("wdds",
                       lambda: WindowedDDSketch(alpha=0.01,
                                                bucket_width=day_us,
                                                max_buckets=1024),
                       vpair_extractor("value", "ts")),
            SketchSpec("shll", lambda: SlidingHyperLogLog(p=14),
                       pair_extractor("user_id", "ts")),
            SketchSpec("eh", lambda: ExpHistogram(k=32),
                       scalar_extractor("ts")),
            SketchSpec("wss", lambda: WindowedSpaceSaving(
                k=64, bucket_width=day_us, max_buckets=1024),
                       pair_extractor("user_id", "ts")),
        ]

    t_upd = t_q = None
    for _ in range(reps):
        tmp = tempfile.mkdtemp(prefix="bench_warehouse_")
        state = os.path.join(tmp, "state")
        try:
            t0 = time.monotonic()
            R.rollup_update(spark, f"{sf_dir}/events.parquet", state,
                            specs(), group_cols=("event_type",),
                            salt_buckets=8)
            dt = time.monotonic() - t0
            t_upd = dt if t_upd is None else min(t_upd, dt)

            t0 = time.monotonic()
            wins = [7 * day_us]
            R.rollup_window_quantiles(spark, state, [0.5, 0.99], wins,
                                      sketch_name="wdds").count()
            R.rollup_window_cardinality(spark, state, wins).count()
            R.rollup_window_rows(spark, state, wins).count()
            R.rollup_window_topk(spark, state, wins, m=10).count()
            dt = time.monotonic() - t0
            t_q = dt if t_q is None else min(t_q, dt)
        finally:
            sh.rmtree(tmp, ignore_errors=True)
    return {"update_secs": round(t_upd, 3),
            "window_queries_secs": round(t_q, 3)}


def stream_dedup_receipt(spark, sf_dir: str, reps: int) -> dict:
    """Dedup-ingest sentinel: the documents table, re-dropped as files
    with every doc DUPLICATED across two drops, streamed through
    `rollup_stream_dedup` (2 micro-batches). Reported: ingest wall
    (best of `reps`), rows in/kept, and the measured dedup ratio — the
    never-rescan-history contract made a number."""
    import shutil as sh
    import tempfile

    from pyspark.sql import functions as F
    from p2pddsketch_spark.operators import rollup as R
    reps = max(1, int(reps))
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.xxhash64("doc_id").alias("key"), "doc_id", "source"))
    best = stats = None
    for _ in range(reps):
        tmp = tempfile.mkdtemp(prefix="bench_sdedup_")
        try:
            drop = os.path.join(tmp, "drop")
            # wave 1 = full corpus, wave 2 = the same corpus again:
            # a 50% duplicate firehose
            docs.repartition(4).write.parquet(drop)
            docs.repartition(4).write.mode("append").parquet(drop)
            t0 = time.monotonic()
            st = R.rollup_stream_dedup(
                spark, drop, os.path.join(tmp, "state"),
                os.path.join(tmp, "corpus"), key_col="key",
                checkpoint_dir=os.path.join(tmp, "ck"),
                salt_buckets=8, max_files_per_trigger=4)
            dt = time.monotonic() - t0
            if best is None or dt < best:
                best, stats = dt, st
        finally:
            sh.rmtree(tmp, ignore_errors=True)
    return {"secs": round(best, 3), "rows_in": stats["rows_in"],
            "rows_kept": stats["rows_kept"],
            "dup_pct": round(100.0 * (1 - stats["rows_kept"] /
                                      max(stats["rows_in"], 1)), 2),
            "batches": stats["batches"],
            "rows_per_sec": round(stats["rows_in"] / best, 1)}


def mix_receipt(spark, sf_dir: str, reps: int) -> dict:
    """Data-mixture construction sentinel: mix_sources over the
    documents table with per-source budgets at ~half each source's
    token mass. Reported: wall (best of `reps`), selected docs/tokens
    vs corpus — plus the plan contract that matters at 100 TB: the
    fact table is never shuffled (one bucket aggregate + broadcast
    threshold filter; the window touches only the boundary buckets)."""
    from pyspark.sql import functions as F
    from p2pddsketch_spark.operators.pipeline import mix_sources
    reps = max(1, int(reps))   # REPS=0 must not leave best=None
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "source",
                    F.size(F.split("text", " ")).cast("long").alias("n_tok")))
    totals = {r["source"]: int(r["t"]) for r in
              docs.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()}
    budgets = {s: max(1, t // 2) for s, t in totals.items()}
    best, sel = None, None
    for _ in range(reps):
        t0 = time.monotonic()
        out = mix_sources(docs, budgets)
        sel = out.agg(F.count("*").alias("n"),
                      F.sum("n_tok").alias("t")).collect()[0]
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    n_docs = docs.count()
    return {"secs": round(best, 3), "n_sources": len(totals),
            "docs_selected": int(sel["n"]), "docs_corpus": int(n_docs),
            "tokens_selected": int(sel["t"]),
            "tokens_corpus": int(sum(totals.values())),
            "budget_pct": 50}


def semdedup_receipt(spark, sf_dir: str, reps: int) -> dict:
    """Round-over-round visibility for the embedding-pipeline operators
    (same principle as the pipeline sentinels): a full SemDeDup cycle
    over the embeddings table — distributed k-means fit (k ≈ √N, 4
    Lloyd passes, only (cluster,count,sum) partials shuffle) + exact-
    cosine rerank of the within-cluster candidates. Reported: wall time
    (best of `reps`), the candidate-pair volume vs all-pairs — the
    measured pruning ratio that is the operator's 100 TB contract."""
    from pyspark.sql import functions as F
    from p2pddsketch_spark.operators.kmeans import (
        kmeans_assign, kmeans_fit_distributed, semantic_dedup_pairs)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    k = max(2, int(n ** 0.5))
    best, n_pairs, cent = None, 0, None
    for _ in range(reps):
        t0 = time.monotonic()
        cent = kmeans_fit_distributed(emb, k=k, iters=4, seed=23)
        n_pairs = semantic_dedup_pairs(emb, threshold=0.9, k=k,
                                       centroids=cent).count()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    sizes = kmeans_assign(emb, cent).groupBy("cluster_id").count()
    cand = int(sizes.agg(F.sum(F.col("count") * (F.col("count") - 1) / 2)
                         ).collect()[0][0])
    allpairs = n * (n - 1) // 2
    return {"secs": round(best, 3), "n_vectors": int(n), "k": int(k),
            "dup_pairs": int(n_pairs), "candidate_pairs": cand,
            "allpairs": allpairs,
            "candidate_pct": round(100.0 * cand / allpairs, 2)}


def pq_index_receipt(spark, sf_dir: str, reps: int) -> dict:
    """The ANN SERVING path end-to-end: build a persisted IVF-PQ index
    over the embeddings table (train codebooks + coarse quantizer,
    encode, commit partitioned by cell), then answer a 16-query top-5
    batch from the STORED codes with exact rerank — once scanning every
    cell (full probe) and once probing each query's 4 nearest of 16
    cells (a partition-pruned read) — vs brute-force cosine over the
    float vectors. A second index with encode='residual' (FAISS IVF-PQ:
    codes quantize x − c_cell) answers the same probed batch, so the
    raw-vs-residual recall delta at identical m/nlist/nprobe is
    measured, not assumed. Reported: build and query walls (best of
    `reps`), recall@5 of each path vs brute force, cells actually read,
    and the storage compression (d float32 bytes → m code bytes) — the
    numbers that decide whether a 100 TB corpus is scannable at all."""
    import shutil
    import tempfile
    from pyspark.sql import functions as F
    from p2pddsketch_spark.operators.pq_index import (query_pq_index,
                                                      save_pq_index)
    from p2pddsketch_spark.operators.similarity import cosine_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    dim = len(emb.select("embedding").first()["embedding"])
    m, nlist, nprobe = 8, 16, 4
    queries = (emb.where(F.col("vec_id") < 16)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec")))

    def recall(got, brute):
        hits = tot = 0
        for qid in brute["query_id"].unique():
            b = set(brute[brute["query_id"] == qid]["neighbor_id"])
            a = set(got[got["query_id"] == qid]["neighbor_id"])
            hits += len(a & b)
            tot += len(b)
        return round(hits / max(tot, 1), 3)

    tmp = tempfile.mkdtemp(prefix="pq_bench_")
    try:
        build = q_full = q_probe = brute_t = None
        build_res = q_probe_res = None
        rec_full = rec_probe = rec_probe_res = 0.0
        receipt: dict = {}
        for _ in range(reps):
            idx = os.path.join(tmp, "idx")
            shutil.rmtree(idx, ignore_errors=True)
            t0 = time.monotonic()
            save_pq_index(spark, emb, idx, m=m, nlist=nlist, seed=31)
            dt = time.monotonic() - t0
            build = dt if build is None else min(build, dt)
            t0 = time.monotonic()
            full = query_pq_index(spark, idx, queries, k=5, rerank=50,
                                  corpus=emb).toPandas()
            dt = time.monotonic() - t0
            q_full = dt if q_full is None else min(q_full, dt)
            receipt = {}
            t0 = time.monotonic()
            probed = query_pq_index(spark, idx, queries, k=5, rerank=50,
                                    corpus=emb, nprobe=nprobe,
                                    receipt=receipt).toPandas()
            dt = time.monotonic() - t0
            q_probe = dt if q_probe is None else min(q_probe, dt)
            # residual twin: same m/nlist/nprobe, codes quantize x − c_cell
            ridx = os.path.join(tmp, "ridx")
            shutil.rmtree(ridx, ignore_errors=True)
            t0 = time.monotonic()
            save_pq_index(spark, emb, ridx, m=m, nlist=nlist, seed=31,
                          encode="residual")
            dt = time.monotonic() - t0
            build_res = dt if build_res is None else min(build_res, dt)
            t0 = time.monotonic()
            probed_res = query_pq_index(spark, ridx, queries, k=5, rerank=50,
                                        corpus=emb, nprobe=nprobe).toPandas()
            dt = time.monotonic() - t0
            q_probe_res = dt if q_probe_res is None else min(q_probe_res, dt)
            t0 = time.monotonic()
            brute = cosine_topk(emb, queries, k=5).toPandas()
            dt = time.monotonic() - t0
            brute_t = dt if brute_t is None else min(brute_t, dt)
            rec_full, rec_probe = recall(full, brute), recall(probed, brute)
            rec_probe_res = recall(probed_res, brute)
        receipt.pop("probed_cells", None)
        return {"build_secs": round(build, 3),
                "build_residual_secs": round(build_res, 3),
                "query_full_secs": round(q_full, 3),
                "query_probe_secs": round(q_probe, 3),
                "query_probe_residual_secs": round(q_probe_res, 3),
                "brute_secs": round(brute_t, 3), "n_vectors": int(n),
                "dim": int(dim), "m": m, "nlist": nlist, "nprobe": nprobe,
                **receipt,
                "recall_full_at_5": rec_full,
                "recall_probe_at_5": rec_probe,
                "recall_probe_residual_at_5": rec_probe_res,
                "compression_x": round(dim * 4 / m, 1)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def approx_percentile_receipt(spark, seq_path: str, reps: int) -> dict:
    """The engine's own approximate-quantile aggregate vs this library's
    pure-Catalyst DDSketch plan, on the SAME grouped question (n_tok
    quantiles by source). Reported: wall time of each, and each one's
    max relative error against the EXACT sort-based percentile — the
    receipt that the library's α-contract quantiles are competitive with
    (and error-bounded unlike) the built-in GK-based estimator, while
    producing mergeable, persistable state the built-in cannot.
    Note: `percentile` INTERPOLATES between order statistics, while both
    estimators return actual/bucketed values — on integer-valued n_tok
    both reported errors therefore include an interpolation component on
    top of each estimator's own error, identically for the two."""
    import numpy as np
    from pyspark.sql import functions as F
    from p2pddsketch_spark.functions.ddsql import ddsketch_quantile_plan
    qs = [0.5, 0.95, 0.99, 0.999]
    qlit = ", ".join(str(q) for q in qs)
    seq = spark.read.parquet(seq_path)

    t_native = None
    for _ in range(reps):
        t0 = time.monotonic()
        native = (seq.groupBy("source")
                  .agg(F.expr(f"approx_percentile(n_tok, array({qlit}), 10000)")
                       .alias("est")).collect())
        dt = time.monotonic() - t0
        t_native = dt if t_native is None else min(t_native, dt)

    t_dds = None
    for _ in range(reps):
        t0 = time.monotonic()
        dds = ddsketch_quantile_plan(seq, "n_tok", qs, alpha=0.001,
                                     group_cols=("source",)).collect()
        dt = time.monotonic() - t0
        t_dds = dt if t_dds is None else min(t_dds, dt)

    exact = (seq.groupBy("source")
             .agg(F.expr(f"percentile(n_tok, array({qlit}))").alias("ex"))
             .collect())
    ex = {r["source"]: r["ex"] for r in exact}
    err_native = max(abs(e - x) / x for r in native
                     for e, x in zip(r["est"], ex[r["source"]]) if x)
    dds_map = {}
    for r in dds:
        dds_map.setdefault(r["source"], {})[round(r["q"], 3)] = r["estimate"]
    err_dds = max(abs(dds_map[s][round(q, 3)] - x) / x
                  for s, xs in ex.items() for q, x in zip(qs, xs) if x)
    return {"native_secs": round(t_native, 3),
            "dds_catalyst_secs": round(t_dds, 3),
            "max_rel_err_native": round(float(err_native), 6),
            "max_rel_err_dds": round(float(err_dds), 6),
            "dds_alpha": 0.001, "native_accuracy_param": 10000}


def tail_accuracy_receipt(spark, seq_path: str) -> dict:
    """Measured (not claimed) accuracy of every quantile family the
    library ships, on the same one-pass build over the bench corpus's
    n_tok: DDSketch(α=0.001), KLL(k=256), REQ(k=32, the tail
    specialist), t-digest(δ=200), moment sketch — at p50/p99/p999.
    Two error metrics per estimate, because the contracts differ:
    `rank` = distance of the estimate's fractional-rank INTERVAL from q
    (duplicates give an estimate a rank range; inside it the error is
    0) — the comparison-family contract; `rel` = |est − exact|/exact —
    DDSketch's α contract. The p999 column is why REQ exists."""
    import numpy as np
    from p2pddsketch_spark.operators.harness import (SketchSpec,
                                                     build_sketches,
                                                     collect_sketches,
                                                     scalar_extractor)
    from p2pddsketch_spark.sketches.ddsketch import DDSketch
    from p2pddsketch_spark.sketches.kll import KLLSketch
    from p2pddsketch_spark.sketches.moments import MomentSketch
    from p2pddsketch_spark.sketches.req import ReqSketch
    from p2pddsketch_spark.sketches.tdigest import TDigest
    seq = spark.read.parquet(seq_path)
    specs = [
        SketchSpec("dds", lambda: DDSketch(alpha=0.001, bin_limit=1 << 22),
                   scalar_extractor("n_tok")),
        SketchSpec("kll", lambda: KLLSketch(k=256),
                   scalar_extractor("n_tok")),
        SketchSpec("req", lambda: ReqSketch(k=32),
                   scalar_extractor("n_tok")),
        SketchSpec("tdigest", lambda: TDigest(delta=200.0),
                   scalar_extractor("n_tok")),
        SketchSpec("moments", lambda: MomentSketch(k=6, zscale=24.0),
                   scalar_extractor("n_tok")),
    ]
    t0 = time.monotonic()
    sk = collect_sketches(build_sketches(seq, specs, salt_buckets=16))
    build_secs = round(time.monotonic() - t0, 3)
    vals = np.sort(seq.select("n_tok").toPandas()["n_tok"]
                   .to_numpy(dtype=np.float64))
    n = vals.size
    out = {"build_secs": build_secs, "n": int(n)}
    for q, label in ((0.5, "p50"), (0.99, "p99"), (0.999, "p999")):
        exact = float(vals[int(q * (n - 1))])
        col = {}
        for fam in ("dds", "kll", "req", "tdigest", "moments"):
            est = float(sk[fam].quantile(q))
            lo = np.searchsorted(vals, est, side="left") / n
            hi = np.searchsorted(vals, est, side="right") / n
            rank_err = max(0.0, lo - q, q - hi)
            col[fam] = {"rank": round(float(rank_err), 6),
                        "rel": round(abs(est - exact) / exact, 6)
                        if exact else None}
        out[label] = col
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    bench_rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "800000"))
    skip_queries = os.environ.get("SPARK_GRAFT_SKIP_QUERIES", "") == "1"
    from pyspark.sql import SparkSession
    # shuffle partitions sized to the parallelism: the sketch merge stages
    # move only ~hundreds of tiny blob rows, so extra partitions are pure
    # task-scheduling overhead (visible at local[1] in the scaling runs)
    spark = (SparkSession.builder
             .master(f"local[{cpus}]")
             .appName("p2pddsketch-bench")
             .config("spark.sql.shuffle.partitions", str(int(cpus)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # warm all the Python worker eval types the engine uses (mapInArrow,
    # applyInArrow for the merge stages, mapInPandas) before timing
    par = int(spark.sparkContext.defaultParallelism)
    spark.range(par).repartition(par).mapInArrow(lambda it: it, schema="id long").count()
    spark.range(par).groupBy("id").applyInArrow(lambda t: t, schema="id long").count()
    spark.range(par).repartition(par).mapInPandas(lambda it: it, schema="id long").count()

    # Per-query time = min over REPS runs: this single-tenant box has
    # high run-to-run variance (shared memory bus + page-cache state —
    # BENCH/BASELINE.md), and min-of-2 reports steady-state capability
    # instead of scheduler luck. REPS=1 reproduces the round-1 protocol.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    pipeline_timings: dict[str, float] = {}
    if not skip_queries:
        import __spark_entry__ as E
        from p2pddsketch_spark.plans import queries as Q
        qs = E.queries()
        # round-5 registry merges folded these gate rows into combined
        # entries (dds_catalyst, dds_rank); the bench keeps timing the
        # ORIGINAL per-plan workloads under their historical names so
        # BENCH_r{N}.json stays comparable round-over-round.
        qs.setdefault("dds_events_catalyst", Q.q_dds_events_sql)
        qs.setdefault("dds_doclen_by_lang", Q.q_dds_doclen_by_lang)
        qs.setdefault("top_tokens_exact", Q.q_top_tokens)

        def run_set(names, into):
            for name in names:
                fn = qs[name]
                best, n = None, 0
                for _ in range(reps):
                    t0 = time.monotonic()
                    df = fn(spark, sf_dir)
                    n = df.count()
                    dt = time.monotonic() - t0
                    best = dt if best is None else min(best, dt)
                into[name] = round(best, 3)
                print(f"# {name}: {into[name]}s ({n} rows)", file=sys.stderr)

        run_set(HEADLINE, timings)
        run_set(PIPELINE, pipeline_timings)

    seq_path, total_tokens = ensure_sequences(spark, bench_rows)
    tp = sketch_build_throughput(spark, seq_path, total_tokens)
    print(f"# sketch build: {tp}", file=sys.stderr)

    # fast-path figure: the same quantile question answered by the pure
    # Catalyst plan (whole-stage codegen, zero Python)
    from p2pddsketch_spark.functions.ddsql import ddsketch_quantile_plan
    seq = spark.read.parquet(seq_path)
    cq = None
    for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))):
        t0 = time.monotonic()
        ddsketch_quantile_plan(seq, "n_tok", [0.5, 0.95, 0.99, 0.999],
                               alpha=0.001, group_cols=("source",)).count()
        dt = time.monotonic() - t0
        cq = dt if cq is None else min(cq, dt)
    tp["catalyst_quantile_secs"] = round(cq, 3)
    tp["catalyst_rows_per_sec"] = round(bench_rows / tp["catalyst_quantile_secs"], 1)
    print(f"# catalyst quantile: {tp['catalyst_quantile_secs']}s", file=sys.stderr)

    if not skip_queries:
        br = bloom_join_receipt(spark, sf_dir, reps)
        tp["bloom_join"] = br
        print(f"# bloom join receipt: {br}", file=sys.stderr)
        ap = approx_percentile_receipt(spark, seq_path, reps)
        tp["approx_percentile"] = ap
        print(f"# approx_percentile receipt: {ap}", file=sys.stderr)
        ta = tail_accuracy_receipt(spark, seq_path)
        tp["tail_accuracy"] = ta
        print(f"# tail accuracy receipt: {ta}", file=sys.stderr)
        wr = warehouse_receipt(spark, sf_dir, reps)
        tp["warehouse"] = wr
        print(f"# warehouse receipt: {wr}", file=sys.stderr)
        sd = semdedup_receipt(spark, sf_dir, reps)
        tp["semdedup"] = sd
        print(f"# semdedup receipt: {sd}", file=sys.stderr)
        mx = mix_receipt(spark, sf_dir, reps)
        tp["mix"] = mx
        print(f"# mix receipt: {mx}", file=sys.stderr)
        pr = pq_index_receipt(spark, sf_dir, reps)
        tp["pq_index"] = pr
        print(f"# pq index receipt: {pr}", file=sys.stderr)
        sdr = stream_dedup_receipt(spark, sf_dir, reps)
        tp["stream_dedup"] = sdr
        print(f"# stream dedup receipt: {sdr}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "pipeline_queries": pipeline_timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(cpus),
        "bench_sequences": bench_rows,
        "reps": reps,
    }
    out.update(tp)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
