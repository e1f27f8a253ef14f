"""PQ ANN index lifecycle job — build / append / query / info.

Run via spark-submit (north_rule):

  spark-submit --py-files sketchlib.zip jobs/ann_index.py build \\
      --input /root/testdata/sf0.1/embeddings.parquet \\
      --index-dir /tmp/pq_index --m 8 --codebook-k 256
  spark-submit --py-files sketchlib.zip jobs/ann_index.py append \\
      --input hourly_drop.parquet --index-dir /tmp/pq_index
  spark-submit --py-files sketchlib.zip jobs/ann_index.py query \\
      --index-dir /tmp/pq_index --queries q.parquet --k 5 --rerank 50 \\
      --corpus /root/testdata/sf0.1/embeddings.parquet --output hits.parquet
  spark-submit --py-files sketchlib.zip jobs/ann_index.py info \\
      --index-dir /tmp/pq_index

Contract: one JSON line on stdout per invocation (the manifest for
build/append/info; a result summary for query); failures print
{"error": ...} and exit 1 — the same error contract as
jobs/optimize_table.py. The index directory can be any URI the Spark
runtime has a Hadoop connector for.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="train codebooks + encode + persist")
    b.add_argument("--input", required=True)
    b.add_argument("--index-dir", required=True)
    b.add_argument("--m", type=int, default=8,
                   help="subspaces = stored bytes per vector")
    b.add_argument("--codebook-k", type=int, default=256)
    b.add_argument("--iters", type=int, default=10)
    b.add_argument("--sample-size", type=int, default=10_000)
    b.add_argument("--seed", type=int, default=29)
    b.add_argument("--id-col", default="vec_id")
    b.add_argument("--vec-col", default="embedding")
    b.add_argument("--no-normalize", action="store_true",
                   help="skip L2 normalization (raw inner-product space "
                        "instead of cosine)")
    b.add_argument("--nlist", type=int, default=0,
                   help="> 0: IVF-partition the codes by coarse cell so "
                        "probed queries are partition-pruned scans")
    b.add_argument("--coarse-fit", default="driver",
                   choices=["driver", "distributed"],
                   help="coarse-quantizer training: bounded driver sample "
                        "or full-corpus distributed Lloyd passes")
    b.add_argument("--coarse-iters", type=int, default=10)
    b.add_argument("--encode", default="raw", choices=["raw", "residual"],
                   help="residual (needs --nlist): PQ-quantize x - c_cell "
                        "(FAISS IVF-PQ) instead of x")
    b.add_argument("--overwrite", action="store_true")

    a = sub.add_parser("append", help="encode new rows with the frozen "
                                      "codebooks and append their codes")
    a.add_argument("--input", required=True)
    a.add_argument("--index-dir", required=True)

    q = sub.add_parser("query", help="ADC top-k against the stored codes")
    q.add_argument("--index-dir", required=True)
    q.add_argument("--queries", required=True,
                   help="parquet of (query_id long, query_vec array<float>)")
    q.add_argument("--qid-col", default="query_id")
    q.add_argument("--qvec-col", default="query_vec")
    q.add_argument("--k", type=int, default=5)
    q.add_argument("--rerank", type=int, default=0,
                   help="exact-rerank shortlist size (0 = ADC only); "
                        "requires --corpus")
    q.add_argument("--nprobe", type=int, default=0,
                   help="IVF cells to probe per query (0 = scan all; "
                        "only meaningful on a --nlist index)")
    q.add_argument("--corpus", default=None,
                   help="original id→vector parquet, needed when "
                        "--rerank > 0")
    q.add_argument("--output", default=None,
                   help="write hits to this parquet; without it the "
                        "summary JSON carries up to --limit rows inline")
    q.add_argument("--limit", type=int, default=20)

    i = sub.add_parser("info", help="print the committed manifest")
    i.add_argument("--index-dir", required=True)
    return p


def main(argv=None):
    args = _build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    owns = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("pq-ann-index").getOrCreate()
    try:
        from p2pddsketch_spark.operators.maintenance import _read_text
        from p2pddsketch_spark.operators.pq_index import (append_pq_index,
                                                          query_pq_index,
                                                          save_pq_index,
                                                          _paths)
        t0 = time.monotonic()
        if args.cmd == "build":
            df = spark.read.parquet(args.input)
            manifest = save_pq_index(
                spark, df, args.index_dir, m=args.m, nk=args.codebook_k,
                iters=args.iters, sample_size=args.sample_size,
                seed=args.seed, normalize=not args.no_normalize,
                id_col=args.id_col, vec_col=args.vec_col,
                nlist=args.nlist, coarse_fit=args.coarse_fit,
                coarse_iters=args.coarse_iters, encode=args.encode,
                overwrite=args.overwrite)
            manifest["secs"] = round(time.monotonic() - t0, 3)
            print(json.dumps(manifest))
        elif args.cmd == "append":
            df = spark.read.parquet(args.input)
            manifest = append_pq_index(spark, df, args.index_dir)
            manifest["secs"] = round(time.monotonic() - t0, 3)
            print(json.dumps(manifest))
        elif args.cmd == "query":
            queries = spark.read.parquet(args.queries)
            corpus = spark.read.parquet(args.corpus) if args.corpus else None
            receipt: dict = {}
            hits = query_pq_index(
                spark, args.index_dir, queries, k=args.k,
                rerank=args.rerank, corpus=corpus, nprobe=args.nprobe,
                qid_col=args.qid_col, qvec_col=args.qvec_col,
                receipt=receipt)
            out = {"k": args.k, "rerank": args.rerank, **receipt}
            if args.output:
                hits.write.mode("overwrite").parquet(args.output)
                n = spark.read.parquet(args.output).count()
                out.update(n_hits=int(n), output=args.output)
            else:
                rows = hits.limit(args.limit).collect()
                out["hits"] = [r.asDict() for r in rows]
                out["n_hits_shown"] = len(rows)
            out["secs"] = round(time.monotonic() - t0, 3)
            print(json.dumps(out))
        else:  # info
            _, _, man_p = _paths(args.index_dir)
            try:
                print(json.dumps(json.loads(_read_text(spark, man_p))))
            except FileNotFoundError:
                raise ValueError(
                    f"no committed PQ index at {args.index_dir!r}") from None
        return 0
    except (ValueError, NotImplementedError) as e:
        # documented failure contract: typed errors become one JSON line
        print(json.dumps({"error": str(e)}))
        return 1
    finally:
        if owns:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
