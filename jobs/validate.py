"""Data-quality gate job: evaluate declarative rules against a parquet
table in ONE scan and exit non-zero if any rule fails — the CI-style
check a 100 TB ingest runs before publishing a partition.

  spark-submit --py-files sketchlib.zip jobs/validate.py \\
      --input /root/testdata/sf0.01/lineitem.parquet \\
      --rules rules.json [--report out.json]

rules.json: [{"name": "qty_range", "kind": "in_range",
              "col": "l_quantity", "lo": 1, "hi": 50}, ...]
(kinds: not_null, unique, in_range, accepted_values,
non_negative_count — see operators/quality.py).

`--sequences-audit` (with optional `--format orc|jsonl|csv`) instead
runs the canonical sequences-table ingest audit
(sources/ingest.py::validate_sequences): NULL doc_ids, n_tok/array
mismatches, negative token ids — exit 1 if any count is non-zero.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--rules", default=None, help="JSON rule list file")
    p.add_argument("--sequences-audit", action="store_true",
                   help="run the sequences-table ingest audit instead "
                        "of a rules file")
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "orc", "jsonl", "csv"],
                   help="input format for --sequences-audit")
    p.add_argument("--report", default=None, help="write JSON report here")
    args = p.parse_args(argv)
    if bool(args.rules) == args.sequences_audit:
        p.error("exactly one of --rules / --sequences-audit is required")
    if args.rules and args.format != "parquet":
        p.error("--format applies to --sequences-audit only; the rules "
                "path reads parquet")

    from pyspark.sql import SparkSession
    from p2pddsketch_spark.operators.quality import Rule, validate

    if args.sequences_audit:
        from p2pddsketch_spark.sources.ingest import (read_sequences,
                                                      validate_sequences)
        owns = SparkSession.getActiveSession() is None
        spark = (SparkSession.builder.appName("p2pddsketch-validate")
                 .config("spark.sql.adaptive.enabled", "true").getOrCreate())
        audit = validate_sequences(
            read_sequences(spark, args.input, args.format))
        # oov_rows is informational (tokenize's sanctioned -1 sentinel)
        out = {"input": args.input, "audit": audit,
               "failed": sum(v for k, v in audit.items()
                             if k not in ("rows", "oov_rows"))}
        print(json.dumps(out, indent=2))
        if args.report:
            with open(args.report, "w") as fh:
                json.dump(out, fh, indent=2)
        if owns:
            spark.stop()
        return 1 if out["failed"] else 0

    with open(args.rules) as fh:
        specs = json.load(fh)
    rules = [Rule(name=s["name"], kind=s["kind"], col=s.get("col"),
                  lo=s.get("lo"), hi=s.get("hi"),
                  values=tuple(s.get("values", ())),
                  min_rows=int(s.get("min_rows", 1))) for s in specs]

    owns = SparkSession.getActiveSession() is None
    spark = (SparkSession.builder.appName("p2pddsketch-validate")
             .config("spark.sql.adaptive.enabled", "true").getOrCreate())
    report = [r.asDict() for r in
              validate(spark.read.parquet(args.input), rules).collect()]
    out = {"input": args.input, "rules": len(report),
           "failed": sum(1 for r in report if not r["passed"]),
           "report": report}
    print(json.dumps(out, indent=2))
    if args.report:
        with open(args.report, "w") as fh:
            json.dump(out, fh, indent=2)
    if owns:
        spark.stop()
    return 1 if out["failed"] else 0


if __name__ == "__main__":
    sys.exit(main())
