"""documents → sequences: materialize the engine's own input table.

Chains the pipeline operators into the (doc_id, tokens array<int>,
n_tok, source[, split]) shape that BASELINE.json's input_hint specifies
and the sketch harness ingests:

  read documents (--format parquet|orc|jsonl|csv)
  → --tokenizer vocab: frequency-ranked vocab (top --vocab-size) +
    order-preserving tokenize (OOV = -1), vocab side table
  → --tokenizer bpe: train --bpe-merges merges, encode to subword ids
    (no OOV), merge-table side table
  → optional deterministic train/val/test split column
  → write parquet + tokenizer side table + manifest.

  spark-submit --py-files sketchlib.zip jobs/prepare_sequences.py \\
      --input /root/testdata/sf0.01/documents.parquet \\
      --output /tmp/sequences --vocab-size 512 --assign-splits
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "orc", "jsonl", "csv"],
                   help="input documents format (sources/ingest.py: "
                        "explicit schema, FAILFAST)")
    p.add_argument("--output", required=True)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--vocab-size", type=int, default=512)
    p.add_argument("--tokenizer", default="vocab", choices=["vocab", "bpe"],
                   help="'vocab': frequency-ranked word vocabulary with "
                        "OOV=-1; 'bpe': train --bpe-merges merges and "
                        "encode to subword ids (no OOV — every symbol "
                        "is in the trained inventory)")
    p.add_argument("--bpe-merges", type=int, default=5)
    p.add_argument("--assign-splits", action="store_true")
    p.add_argument("--shuffle-partitions", type=int, default=64)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    owns_session = SparkSession.getActiveSession() is None
    spark = (SparkSession.builder.appName("p2pddsketch-prepare-sequences")
             .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())

    from p2pddsketch_spark.operators.pipeline import (build_vocab, split_assign,
                                                      tokenize)

    t0 = time.monotonic()
    if args.format == "parquet":
        df = spark.read.parquet(args.input)   # whatever columns it has
    else:
        from p2pddsketch_spark.sources.ingest import read_documents
        df = read_documents(spark, args.input, args.format)
    keep = [c for c in (args.id_col, "source") if c in df.columns]
    def _drop_sidecar(path: str) -> None:
        # the tokenizer DEFINITION travels beside the corpus — a stale
        # sidecar from a previous run in the OTHER mode would silently
        # decode this corpus with the wrong tokenizer
        from p2pddsketch_spark.operators.maintenance import _hadoop_fs
        fs, p = _hadoop_fs(spark, path)
        fs.delete(p, True)

    n_merges_trained = None
    if args.tokenizer == "bpe":
        from p2pddsketch_spark.operators.bpe import bpe_tokenize
        seqs, merges = bpe_tokenize(
            df.select(*keep, args.text_col), k=args.bpe_merges,
            text_col=args.text_col, id_col=args.id_col, with_merges=True)
        merges.write.mode("overwrite").parquet(f"{args.output}.merges")
        n_merges_trained = spark.read.parquet(f"{args.output}.merges").count()
        _drop_sidecar(f"{args.output}.vocab")
    else:
        vocab = build_vocab(df, args.vocab_size, args.text_col)
        vocab.write.mode("overwrite").parquet(f"{args.output}.vocab")
        seqs = tokenize(df.select(*keep, args.text_col),
                        spark.read.parquet(f"{args.output}.vocab"),
                        text_col=args.text_col, id_col=args.id_col)
        _drop_sidecar(f"{args.output}.merges")
    if args.assign_splits:
        seqs = split_assign(seqs, id_col=args.id_col).drop("split_bucket")
    seqs.write.mode("overwrite").parquet(args.output)

    out = spark.read.parquet(args.output)
    stats = out.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum(F.size(F.filter("tokens", lambda t: t == F.lit(-1)))).alias("oov_tokens"),
    ).collect()[0]
    manifest = {
        "input": args.input, "output": args.output,
        "tokenizer": args.tokenizer,
        "vocab_size": (args.vocab_size if args.tokenizer == "vocab"
                       else None),
        # the ACTUAL trained merge count (early exhaustion trains fewer
        # than requested) — the merge TABLE defines the tokenizer, the
        # manifest must not claim otherwise
        "bpe_merges": n_merges_trained,
        "bpe_merges_requested": (args.bpe_merges if args.tokenizer == "bpe"
                                 else None),
        "n_docs": stats["n_docs"],
        "total_tokens": int(stats["total_tokens"] or 0),
        "oov_tokens": int(stats["oov_tokens"] or 0),
        "secs": round(time.monotonic() - t0, 2),
    }
    print(json.dumps(manifest, indent=2))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
