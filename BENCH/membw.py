"""Hardware-ceiling receipts for the [8] -> [32] scaling cliff.

Two Spark-free microbenchmarks, each run at k = 1/2/4/8/16/32 worker
PROCESSES (multiprocessing, no GIL sharing, no JVM, no shuffle):

1. `triad`  — streaming memory bandwidth: each worker repeatedly computes
   a = b + s*c over its own 3x64 MiB float64 arrays (STREAM-triad shape).
   Aggregate GB/s vs k is a direct measurement of the box's shared
   memory-bus ceiling — no parquet, no Python-object overhead, nothing
   our code controls.
2. `decode` — stage-1 input path only: each worker loops pyarrow
   `iter_batches` over its own copy-free slice of the bench sequences
   parquet files and flattens the tokens ListArray to numpy (zero
   sketch updates). Aggregate tokens/s vs k bounds what ANY stage-1
   implementation could achieve on this box.

If both curves flatten in the same 8-16 worker region as the full
sketch build, the build's [8]->[32] efficiency drop is the hardware's,
not the harness's. Results are appended to BENCH/BASELINE.md by hand
(see the "hardware ceiling receipts" section there).

Usage:  python BENCH/membw.py [--rows 800000]
Prints one JSON line per (bench, k).
"""

from __future__ import annotations

import argparse
import glob
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = [1, 2, 4, 8, 16, 32]


# ------------------------------------------------------------------ triad

def _triad_worker(barrier, secs: float, out_q) -> None:
    n = (64 << 20) // 8  # 64 MiB per array, 3 arrays
    b = np.random.default_rng(0).random(n)
    c = np.random.default_rng(1).random(n)
    a = np.empty_like(b)
    barrier.wait()  # arrays allocated and faulted in BEFORE the clock
    it = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < secs:
        np.multiply(c, 3.0, out=a)
        np.add(a, b, out=a)
        it += 1
    elapsed = time.monotonic() - t0
    # bytes touched per iteration: multiply reads c + writes a (2n·8),
    # add reads a,b + writes a (3n·8)
    out_q.put((it * 5 * n * 8, elapsed))


def triad(k: int, secs: float = 3.0) -> dict:
    q = mp.Queue()
    barrier = mp.Barrier(k)
    procs = [mp.Process(target=_triad_worker, args=(barrier, secs, q))
             for _ in range(k)]
    for p in procs:
        p.start()
    got = [q.get() for _ in procs]
    for p in procs:
        p.join()
    gbps = sum(b / s for b, s in got) / 1e9
    return {"bench": "triad", "k": k, "aggregate_gbps": round(gbps, 2)}


# ----------------------------------------------------------------- decode

def _decode_worker(files: list[str], reps: int, out_q) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)
    toks = 0
    t0 = time.monotonic()
    for _ in range(reps):
        for f in files:
            for batch in pq.ParquetFile(f).iter_batches(
                    columns=["tokens"], batch_size=2048):
                col = batch.column("tokens")
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                flat = col.flatten()
                try:
                    arr = flat.to_numpy(zero_copy_only=True)
                except (pa.ArrowInvalid, ValueError):
                    arr = flat.to_numpy(zero_copy_only=False)
                toks += arr.size
    out_q.put((toks, time.monotonic() - t0))


def decode(k: int, files: list[str], reps: int) -> dict:
    q = mp.Queue()
    shards = [files[i::k] for i in range(k)]
    procs = [mp.Process(target=_decode_worker, args=(shards[i], reps, q))
             for i in range(k)]
    for p in procs:
        p.start()
    got = [q.get() for _ in procs]
    for p in procs:
        p.join()
    toks = sum(t for t, _ in got)
    secs = max(s for _, s in got)
    return {"bench": "decode_only", "k": k,
            "tokens_per_sec": round(toks / secs, 1),
            "total_tokens": toks, "secs": round(secs, 2)}


# ----------------------------------------------------------------- stage1

def _stage1_worker(files: list[str], out_q) -> None:
    """Decode + the REAL per-batch sketch-update work of the bench's
    six-sketch build (unique+counts shared across token sketches), with
    no Spark: isolates harness compute from JVM/orchestration cost."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    sys.path.insert(0, REPO)
    from p2pddsketch_spark.operators.harness import _unique_counts
    from p2pddsketch_spark.sketches.bloom import BloomFilter
    from p2pddsketch_spark.sketches.cms import CountMinSketch
    from p2pddsketch_spark.sketches.ddsketch import DDSketch
    from p2pddsketch_spark.sketches.hll import HyperLogLog
    from p2pddsketch_spark.sketches.kll import KLLSketch
    from p2pddsketch_spark.sketches.tdigest import TDigest
    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)
    tok_sketches = [HyperLogLog(p=14), CountMinSketch(depth=4, width=1 << 16),
                    BloomFilter(m_bits=1 << 21, k=5)]
    ntok_raw = [KLLSketch(k=256)]
    ntok_w = [DDSketch(alpha=0.001, bin_limit=1 << 22), TDigest(delta=200)]
    toks = 0
    t0 = time.monotonic()
    for f in files:
        for batch in pq.ParquetFile(f).iter_batches(
                columns=["tokens", "n_tok"], batch_size=2048):
            col = batch.column("tokens")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten()
            try:
                arr = flat.to_numpy(zero_copy_only=True)
            except (pa.ArrowInvalid, ValueError):
                arr = flat.to_numpy(zero_copy_only=False)
            toks += arr.size
            uv, uc = _unique_counts(arr)
            for s in tok_sketches:
                s.update_batch(uv, uc.astype(np.int64))
            nt = batch.column("n_tok").to_numpy(zero_copy_only=False).astype(np.float64)
            uv2, uc2 = np.unique(nt, return_counts=True)
            for s in ntok_w:
                s.update_batch(uv2, uc2.astype(np.int64))
            for s in ntok_raw:
                s.update_batch(nt)
    out_q.put((toks, time.monotonic() - t0))


def stage1(k: int, files: list[str]) -> dict:
    q = mp.Queue()
    shards = [files[i::k] for i in range(k)]
    procs = [mp.Process(target=_stage1_worker, args=(shards[i], q))
             for i in range(k)]
    for p in procs:
        p.start()
    got = [q.get() for _ in procs]
    for p in procs:
        p.join()
    toks = sum(t for t, _ in got)
    secs = max(s for _, s in got)
    return {"bench": "stage1_no_spark", "k": k,
            "tokens_per_sec": round(toks / secs, 1),
            "total_tokens": toks, "secs": round(secs, 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=800_000)
    ap.add_argument("--secs", type=float, default=3.0)
    args = ap.parse_args()

    seq = os.path.join(REPO, ".bench_cache", f"sequences_{args.rows}.parquet")
    files = sorted(glob.glob(os.path.join(seq, "*.parquet")))
    if not files:
        print(f"# no bench sequences at {seq}; run bench.py first", file=sys.stderr)
        sys.exit(1)

    for k in LEVELS:
        print(json.dumps(triad(k, args.secs)), flush=True)
    for k in LEVELS:
        print(json.dumps(decode(k, files, reps=1)), flush=True)
    for k in LEVELS:
        print(json.dumps(stage1(k, files)), flush=True)


if __name__ == "__main__":
    main()
