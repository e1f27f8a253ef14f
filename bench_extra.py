"""Round-6 optimization measurement harness (guide §1): times individual
bench queries in isolation with the SAME session config and protocol as
the frozen bench.py (min over SPARK_GRAFT_BENCH_REPS runs, default 2),
without the receipts, so a single query's before/after can be measured
in seconds instead of a full ~6-minute bench run.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [query ...]

Prints one compact JSON line {"queries": {...}, "sf": ..., "reps": N}.
bench.py itself is FROZEN for driver measurement; numbers from this file
are cited in OPTIMIZATION_r06.md as isolation evidence only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT = [
    "dds_quantiles_lineitem", "dds_price_by_flag", "dds_events_catalyst",
    "dds_doclen_by_lang", "dds_events_hourly", "sketch_counts_events",
    "tpch_q1", "join_revenue_by_nation", "top_tokens_exact",
    "minhash_lsh_pairs_prod", "ann_cosine_topk",
    "bpe_train_merges", "tokenize_vocab", "strip_spans", "source_kl",
    "importance_select",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    names = sys.argv[1:] or DEFAULT

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder
             .master(f"local[{cpus}]")
             .appName("p2pddsketch-bench-extra")
             .config("spark.sql.shuffle.partitions", str(int(cpus)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # identical Python-worker warmup to bench.py
    par = int(spark.sparkContext.defaultParallelism)
    spark.range(par).repartition(par).mapInArrow(lambda it: it, schema="id long").count()
    spark.range(par).groupBy("id").applyInArrow(lambda t: t, schema="id long").count()
    spark.range(par).repartition(par).mapInPandas(lambda it: it, schema="id long").count()

    import __spark_entry__ as E
    from p2pddsketch_spark.plans import queries as Q
    qs = E.queries()
    qs.setdefault("dds_events_catalyst", Q.q_dds_events_sql)
    qs.setdefault("dds_doclen_by_lang", Q.q_dds_doclen_by_lang)
    qs.setdefault("top_tokens_exact", Q.q_top_tokens)

    timings = {}
    for name in names:
        fn = qs[name]
        best, n = None, 0
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(json.dumps({"queries": timings, "total": round(sum(timings.values()), 3),
                      "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                      "cpus": int(cpus), "reps": reps}))
    spark.stop()


if __name__ == "__main__":
    main()
