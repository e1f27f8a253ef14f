"""Dump `.explain("formatted")` for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage:
    python tools/dump_plans.py <suffix> [query ...]

Writes plans/r06/<query>_<suffix>.txt for each query (default: the bench
HEADLINE + PIPELINE set). Queries whose builder executes eagerly (harness
rows assembled driver-side) still produce a plan of the returned frame;
the heavy lifting for those is in the jobs the builder runs, noted in
OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

DEFAULT = [
    "dds_quantiles_lineitem", "dds_price_by_flag", "dds_events_catalyst",
    "dds_doclen_by_lang", "dds_events_hourly", "sketch_counts_events",
    "tpch_q1", "join_revenue_by_nation", "top_tokens_exact",
    "minhash_lsh_pairs_prod", "ann_cosine_topk",
    "bpe_train_merges", "tokenize_vocab", "strip_spans", "source_kl",
    "importance_select",
]


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder
             .master(f"local[{cpus}]")
             .appName("p2pddsketch-dump-plans")
             .config("spark.sql.shuffle.partitions", str(int(cpus)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from p2pddsketch_spark.plans import queries as Q
    qs = E.queries()
    qs.setdefault("dds_events_catalyst", Q.q_dds_events_sql)
    qs.setdefault("dds_doclen_by_lang", Q.q_dds_doclen_by_lang)
    qs.setdefault("top_tokens_exact", Q.q_top_tokens)

    for name in names:
        spark.sparkContext.setJobDescription(f"dump_plans: {name}")
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
