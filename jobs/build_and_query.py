"""End-to-end sketch pipeline job — the Spark twin of the reference
simulator's `main` (`/root/reference/main.cpp:214-396`):

  read table → per-partition sketch build (mapInArrow) → salted shuffle
  merge tree → quantile / cardinality / frequency queries → accuracy
  report + run manifest.

Run via spark-submit (north_rule):

  zip -r /tmp/sketchlib.zip p2pddsketch_spark
  spark-submit --py-files /tmp/sketchlib.zip jobs/build_and_query.py \\
      --input /root/testdata/sf0.01/lineitem.parquet \\
      --value-col l_quantity --tokens-col '' \\
      --alpha 0.001 --quantiles 0.5 0.95 0.99 0.999 \\
      --checkpoint-dir /tmp/sketch_ckpt --verify

Knobs mirror the reference CLI (`main.cpp:797-938`: alpha, bin_limit,
quantile list, seed) plus the Spark-native ones the gossip simulator
never needed: --salt-buckets, --shuffle-partitions, --checkpoint-dir.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="table file/dir to sketch")
    p.add_argument("--input-format", default="parquet",
                   choices=["parquet", "orc", "jsonl", "csv"],
                   help="non-parquet inputs read through "
                        "sources/ingest.py (canonical sequences schema) "
                        "and use the DataFrame build path; the "
                        "file-parallel fast path and --checkpoint-dir "
                        "require parquet")
    p.add_argument("--value-col", default="n_tok")
    p.add_argument("--tokens-col", default="tokens",
                   help="array<int> column for HLL/CMS/Bloom ('' to skip)")
    p.add_argument("--group-col", nargs="*", default=[],
               help="optional grouping column(s) — multi-column groups factorize per column in stage 1")
    p.add_argument("--alpha", type=float, default=0.001)
    p.add_argument("--bin-limit", type=int, default=1 << 22)
    p.add_argument("--strategy", default="first",
                   choices=["first", "last", "uniform"])
    p.add_argument("--quantiles", type=float, nargs="+",
                   default=[0.01, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.99])
    p.add_argument("--moments", action="store_true",
                   help="also build a Moment sketch over --value-col "
                        "(second, O(k)-state quantile estimator in the "
                        "same pass)")
    p.add_argument("--moments-k", type=int, default=10)
    p.add_argument("--moments-zscale", type=float, default=24.0,
                   help="domain bound: values must satisfy |v| < "
                        "sinh(zscale) (24 covers |v| < 1.3e10)")
    p.add_argument("--req", action="store_true",
                   help="also build a REQ sketch over --value-col "
                        "(tail-rank-accurate estimator — the p999 "
                        "monitor per SKETCHES.md) in the same pass and "
                        "cross-check p99/p999 against DDSketch in the "
                        "manifest")
    p.add_argument("--req-k", type=int, default=32)
    p.add_argument("--salt-buckets", type=int, default=32)
    p.add_argument("--shuffle-partitions", type=int, default=64)
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--verify", action="store_true",
                   help="compare against exact quantiles (extra pass)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    owns_session = SparkSession.getActiveSession() is None
    spark = (SparkSession.builder.appName("p2pddsketch-build-and-query")
             .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())

    from p2pddsketch_spark.operators.harness import (
        SketchSpec, array_extractor, build_sketches, collect_sketches,
        scalar_extractor)
    from p2pddsketch_spark.operators.checkpoint import build_sketches_checkpointed
    from p2pddsketch_spark.sketches.bloom import BloomFilter
    from p2pddsketch_spark.sketches.cms import CountMinSketch
    from p2pddsketch_spark.sketches.ddsketch import DDSketch
    from p2pddsketch_spark.sketches.hll import HyperLogLog
    from p2pddsketch_spark.sketches.moments import MomentSketch
    from p2pddsketch_spark.sketches.req import ReqSketch

    from p2pddsketch_spark.errors import ConflictingOptions, UsageError
    if not args.value_col and not args.tokens_col:
        raise UsageError("nothing to sketch: provide --value-col and/or "
                         "--tokens-col (reference USAGE_ERROR, -13)")
    if args.verify and not args.value_col:
        raise ConflictingOptions("--verify checks the quantile contract and "
                                 "needs --value-col (reference "
                                 "CONFLICTING_OPTIONS, -14)")
    if args.checkpoint_dir and args.input_format != "parquet":
        raise ConflictingOptions(
            "--checkpoint-dir resumes over a parquet file list; "
            f"--input-format {args.input_format} has no stable file-chunk "
            "identity (reference CONFLICTING_OPTIONS, -14)")

    def read_input():
        if args.input_format == "parquet":
            return spark.read.parquet(args.input)
        from p2pddsketch_spark.sources.ingest import read_sequences
        return read_sequences(spark, args.input, args.input_format)
    specs = []
    if args.value_col:
        specs += [SketchSpec(
            "dds", lambda: DDSketch(alpha=args.alpha, bin_limit=args.bin_limit,
                                    strategy=args.strategy),
            scalar_extractor(args.value_col))]
        if args.moments:
            specs += [SketchSpec(
                "moments", lambda: MomentSketch(k=args.moments_k,
                                                zscale=args.moments_zscale),
                scalar_extractor(args.value_col))]
        if args.req:
            specs += [SketchSpec(
                "req", lambda: ReqSketch(k=args.req_k),
                scalar_extractor(args.value_col))]
    if args.tokens_col:
        specs += [
            SketchSpec("hll", lambda: HyperLogLog(p=14), array_extractor(args.tokens_col)),
            SketchSpec("cms", lambda: CountMinSketch(depth=5, width=1 << 16),
                       array_extractor(args.tokens_col)),
            SketchSpec("bloom", lambda: BloomFilter(m_bits=1 << 21, k=5),
                       array_extractor(args.tokens_col)),
        ]
    group_cols = tuple(args.group_col)

    t0 = time.monotonic()
    if args.checkpoint_dir:
        out = build_sketches_checkpointed(spark, args.input, specs,
                                          args.checkpoint_dir, group_cols,
                                          args.salt_buckets)
    else:
        out = build_sketches(read_input(), specs, group_cols,
                             args.salt_buckets)
    sketches = collect_sketches(out, group_cols)
    build_secs = time.monotonic() - t0

    manifest = {
        "input": args.input, "alpha": args.alpha, "bin_limit": args.bin_limit,
        "strategy": args.strategy, "salt_buckets": args.salt_buckets,
        "build_secs": round(build_secs, 3), "results": {},
    }
    for key, sk in sketches.items():
        name = key if isinstance(key, str) else "/".join(map(str, key))
        if isinstance(sk, DDSketch):
            manifest["results"][name] = {
                "n": sk.n, "bins": sk.size, "collapses": sk.num_collapses,
                "quantiles": {str(q): sk.quantile(q) for q in args.quantiles},
            }
        elif isinstance(sk, HyperLogLog):
            manifest["results"][name] = {"cardinality": sk.cardinality()}
        elif isinstance(sk, MomentSketch):
            # unlike DDSketch (NaN), moment/REQ quantile() raises on an
            # empty sketch (all-NULL/NaN value column) — the manifest
            # must still print
            manifest["results"][name] = {
                "n": sk.n, "k": sk.k,
                "quantiles": {str(q): sk.quantile(q) if sk.n else
                              float("nan") for q in args.quantiles},
            }
        elif isinstance(sk, ReqSketch):
            manifest["results"][name] = {
                "n": sk.n, "k": sk.k, "retained": sk.retained,
                "quantiles": {str(q): sk.quantile(q) if sk.n else
                              float("nan") for q in args.quantiles},
            }
        else:
            manifest["results"][name] = {"type": type(sk).__name__}

    if args.req and args.value_col and not group_cols:
        # dual-estimator tail cross-check: the two quantile families
        # bound DIFFERENT errors (DDSketch: relative VALUE within alpha;
        # REQ: tail-relative RANK), so the check runs in rank space —
        # REQ's rank of DDSketch's estimate must sit near q. A gross
        # disagreement means one sketch (or the plumbing) is broken; the
        # 0.02 absolute-rank tolerance is deliberately loose because
        # DDSketch's alpha value-error can shift rank arbitrarily in a
        # dense region.
        dds_sk, req_sk = sketches["dds"], sketches["req"]
        if req_sk.n == 0:
            manifest["tail_crosscheck"] = []
            manifest["tail_crosscheck_pass"] = None   # nothing to check
        else:
            cc = []
            for q in (0.99, 0.999):
                e_d, e_r = dds_sk.quantile(q), req_sk.quantile(q)
                r_of_d = req_sk.rank(e_d) / req_sk.n
                cc.append({"q": q, "dds_estimate": e_d, "req_estimate": e_r,
                           "req_rank_of_dds_estimate": r_of_d,
                           "rank_gap": abs(r_of_d - q),
                           "consistent": abs(r_of_d - q) <= 0.02})
            manifest["tail_crosscheck"] = cc
            manifest["tail_crosscheck_pass"] = all(c["consistent"]
                                                   for c in cc)

    if args.verify:
        # the reference's testQuantile contract (`main.cpp:1041-1082`):
        # exact value at sorted index floor(1 + q·(n−1)) − 1. Implemented
        # as a rank filter over a global sort — an explicit, verification-
        # only extra pass (the production path never sorts).
        from pyspark.sql.window import Window
        df = read_input()
        n = df.count()
        idxs = {q: int(__import__("math").floor(1 + q * (n - 1))) for q in args.quantiles}
        ranked = (df.select(F.col(args.value_col).cast("double").alias("v"))
                  .withColumn("rn", F.row_number().over(Window.orderBy("v")))
                  .where(F.col("rn").isin(list(idxs.values()))))
        by_rank = {r["rn"]: r["v"] for r in ranked.collect()}
        key = "dds" if not group_cols else None
        if key:
            sk = sketches[key]
            report = []
            for q in args.quantiles:
                est = sk.quantile(q)
                ex = float(by_rank[idxs[q]])
                rel = abs((est - ex) / ex) if ex else abs(est)
                # worst case is exactly α (attained when a value sits on a
                # bucket boundary, e.g. v = γ^0); allow float slack
                row = {"q": q, "estimate": est, "exact": ex,
                       "rel_err": rel,
                       "within_alpha": rel <= sk.alpha * (1 + 1e-9)}
                if args.req:
                    rq = sketches["req"]
                    row["req_estimate"] = rq.quantile(q)
                    row["req_rank_err"] = abs(rq.rank(ex) / rq.n - q)
                report.append(row)
            manifest["verify"] = report
            manifest["verify_pass"] = all(r["within_alpha"] for r in report)

    print(json.dumps(manifest, indent=2))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
