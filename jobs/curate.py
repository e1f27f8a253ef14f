"""Training-data curation pipeline — chains the library's operators the
way a 100 TB pre-training corpus job would:

  read → exact dedup (md5 fingerprint) → near-dup removal (MinHash+LSH,
  keep the smallest doc_id of each near-dup cluster) → optional
  SemDeDup semantic near-dup removal (--embeddings-input: k-means-gated
  exact-cosine pairs, same cluster/canonical rule) → optional exact
  substring dedup (--strip-spans N: duplicated word spans ≥ N cut,
  canonical copy kept — Lee et al. 2022) → quality filter →
  optional language filter → optional eval-set decontamination (8-gram
  overlap vs --benchmark-input) → optional PII scrub (--redact-pii) →
  optional DSIR-style importance selection (--importance-target SRC:
  keep docs whose unigram log-likelihood ratio toward that source
  clears --importance-min-bits) → optional token-budget mixture
  (--mix-budgets source=tokens,…: deterministic per-source greedy
  prefix in splitmix order) →
  optional deterministic train/val/test split column (--assign-splits)
  → write curated table + one-pass sketch summary (DDSketch over doc
  length) + manifest.

  spark-submit --py-files sketchlib.zip jobs/curate.py \\
      --input /root/testdata/sf0.01/documents.parquet \\
      --output /tmp/curated --min-quality 0.5 --jaccard 0.8
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
    p.add_argument("--dedup-state", default=None,
                   help="bloom warehouse state dir (operators/rollup.py): "
                   "drop docs whose RAW content hash any previous curate "
                   "run already published — incremental cross-run dedup "
                   "with no history re-scan. The output gains a "
                   "content_hash column (xxhash64 of the ingested text, "
                   "computed BEFORE span-strip/PII mutation so future raw "
                   "duplicates match).")
    p.add_argument("--update-dedup-state", action="store_true",
                   help="after publishing, fold the output's content "
                   "hashes into --dedup-state (file-lineage committed; a "
                   "re-run over the same output is a no-op)")
    p.add_argument("--dedup-m-bits", type=int, default=1 << 22,
                   help="bloom width for a state created by this run "
                   "(size m ≈ n·k/ln2 for expected corpus cardinality)")
    p.add_argument("--min-quality", type=float, default=0.0)
    p.add_argument("--jaccard", type=float, default=0.8)
    p.add_argument("--langs", nargs="*", default=[])
    p.add_argument("--benchmark-input", default=None,
                   help="parquet of held-out eval docs; training docs "
                        "sharing any 8-gram with it are dropped")
    p.add_argument("--embeddings-input", default=None,
                   help="parquet of (vec_id, embedding array<float>) rows "
                        "keyed by the document ids; enables the SemDeDup "
                        "stage (k-means-gated exact-cosine near-dups)")
    p.add_argument("--semantic-threshold", type=float, default=0.95,
                   help="cosine threshold for the SemDeDup stage")
    p.add_argument("--semantic-k", type=int, default=0,
                   help="k-means cluster count for SemDeDup candidate "
                        "gating; 0 = auto (~sqrt of corpus size)")
    p.add_argument("--strip-spans", type=int, default=0,
                   help="> 0: exact substring dedup (Lee et al. 2022) — "
                        "cut duplicated word spans of at least this many "
                        "words, keeping one canonical copy corpus-wide")
    p.add_argument("--importance-target", default=None,
                   help="DSIR-style selection: keep docs whose unigram "
                        "log-likelihood ratio toward this source (vs the "
                        "rest of the corpus) is at least "
                        "--importance-min-bits")
    p.add_argument("--importance-min-bits", type=float, default=0.0,
                   help="threshold in bits for --importance-target "
                        "(default 0: doc looks more like the target than "
                        "the rest)")
    p.add_argument("--importance-buckets", type=int, default=0,
                   help="hashed-feature space size for the importance "
                        "model (0 = raw vocabulary; >0 bounds the "
                        "likelihood table at this many buckets so it "
                        "broadcasts — the form that scales)")
    p.add_argument("--mix-budgets", default=None,
                   help="comma list 'source=tokens' (e.g. "
                        "web=1000000,code=250000): after all filters, keep "
                        "a deterministic token-budget mixture per source "
                        "(greedy splitmix-ordered prefix, "
                        "operators/pipeline.py::mix_sources); sources not "
                        "listed are dropped")
    p.add_argument("--assign-splits", action="store_true",
                   help="add a deterministic 90/5/5 train/val/test column")
    p.add_argument("--redact-pii", action="store_true",
                   help="scrub emails/phones/IPs into typed placeholders "
                        "and keep per-doc hit counts")
    p.add_argument("--shuffle-partitions", type=int, default=64)
    args = p.parse_args(argv)

    # parse/validate the mixture budgets BEFORE any Spark work: a typo
    # here must fail in milliseconds, not after hours of dedup stages
    mix_budgets = None
    if args.mix_budgets:
        mix_budgets = {}
        for part in args.mix_budgets.split(","):
            s, eq, v = part.partition("=")
            try:
                tokens = int(v)
            except ValueError:
                tokens = None
            if not eq or not s.strip() or tokens is None:
                raise ValueError(f"bad --mix-budgets entry {part!r} "
                                 "(want source=tokens, tokens an integer)")
            mix_budgets[s.strip()] = tokens

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    owns_session = SparkSession.getActiveSession() is None
    spark = (SparkSession.builder.appName("p2pddsketch-curate")
             .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())

    from p2pddsketch_spark.operators import dedup, text
    from p2pddsketch_spark.operators.harness import (SketchSpec, build_sketches,
                                                     collect_sketches,
                                                     scalar_extractor)
    from p2pddsketch_spark.sketches.ddsketch import DDSketch

    t0 = time.monotonic()
    if args.format == "parquet":
        df = spark.read.parquet(args.input)
    else:
        from p2pddsketch_spark.sources.ingest import read_documents
        df = read_documents(spark, args.input, args.format)
    n0 = df.count()

    # 0b. cross-run dedup: drop docs whose raw content an earlier curate
    #     run already PUBLISHED (probed against the bloom warehouse
    #     state — broadcast kilobytes, no history re-scan, no false
    #     negatives). The hash is taken at ingest, before any
    #     text-mutating stage, and rides into the output so
    #     --update-dedup-state folds exactly these raw-content keys.
    #     Scope: EXACT content across runs. Docs dropped in-pipeline
    #     (quality / near-dup losers) are not recorded and will be
    #     re-processed if re-dropped; carrying near-dup state across
    #     runs would need the minhash signatures, not a bloom.
    n0b = n0
    if args.dedup_state:
        from p2pddsketch_spark.operators import rollup as R
        df = df.withColumn("content_hash", F.xxhash64(args.text_col))
        if R.rollup_versions(spark, args.dedup_state):
            df = R.rollup_dedup_filter(spark, df, args.dedup_state,
                                       "content_hash")
            n0b = df.count()

    # 1. exact dedup — deterministic winner per identical content
    df = dedup.exact_dedup(df, args.text_col, args.id_col)
    n1 = df.count()

    # 2. near-dup removal: LSH candidate pairs, exact-Jaccard verified,
    #    clustered by connected components (transitive near-dups — the
    #    SlimPajama-style rule); keep each cluster's canonical (min-id)
    #    doc, drop the rest
    from p2pddsketch_spark.operators.clusters import neardup_clusters
    pairs = dedup.minhash_lsh_pairs(df, threshold=args.jaccard,
                                    text_col=args.text_col, id_col=args.id_col)
    losers = (neardup_clusters(pairs).where(~F.col("is_canonical"))
              .select(F.col("doc_id").alias(args.id_col)))
    df = df.join(losers, args.id_col, "left_anti")
    n2 = df.count()

    # 2b. semantic near-dup removal (SemDeDup): embedding-space k-means
    #     gates candidates, exact cosine decides, same cluster/canonical
    #     rule as the lexical stage — catches paraphrases and
    #     translations MinHash can't see
    if args.embeddings_input:
        from p2pddsketch_spark.operators.kmeans import semantic_dedup_pairs
        emb = (spark.read.parquet(args.embeddings_input)
               .select(F.col("vec_id").alias(args.id_col), "embedding")
               .join(df.select(args.id_col), args.id_col, "inner"))
        n_emb = emb.count()
        if n_emb >= 2:  # k-means needs at least 2 survivors with vectors
            sem_k = min(args.semantic_k or max(2, int(n_emb ** 0.5)),
                        n_emb)  # SemDeDup's k ≈ √N default, capped by N
            # the k-means++ init draws from a driver-side sample; size it
            # to k (√N outgrows the 10k default beyond N = 1e8 docs)
            sem_pairs = semantic_dedup_pairs(
                emb, threshold=args.semantic_threshold, k=sem_k,
                sample_size=max(10_000, 4 * sem_k),
                id_col=args.id_col, vec_col="embedding")
            sem_losers = (neardup_clusters(sem_pairs)
                          .where(~F.col("is_canonical"))
                          .select(F.col("doc_id").alias(args.id_col)))
            df = df.join(sem_losers, args.id_col, "left_anti")
        # the stage ran: re-count the survivors
        n2b = df.count()
    else:
        # stage skipped — nothing changed since n2; don't pay a second
        # full-corpus count action just to record the same number
        n2b = n2

    # 2c. exact substring dedup (Lee et al. 2022): cut duplicated word
    #     spans, keep the canonical (first) copy corpus-wide — the
    #     boilerplate/template remover near-dup stages can't express
    #     (they drop whole docs; this cuts the repeated REGION)
    n_span_docs = 0
    if args.strip_spans > 0:
        stripped = dedup.strip_duplicate_spans(
            df.withColumn("_w", text.words_col(args.text_col)),
            tokens_col="_w", id_col=args.id_col,
            min_len=args.strip_spans).persist()
        n_span_docs = stripped.where(F.col("n_deleted") > 0).count()
        df = (df.drop(args.text_col)
              .join(stripped.select(
                  args.id_col,
                  F.array_join("_w", " ").alias(args.text_col)),
                  args.id_col, "inner"))

    # 3. quality filter
    q = text.quality_score(df, args.text_col, args.id_col)
    df = df.join(q.where(F.col("quality") >= args.min_quality)
                 .select(args.id_col), args.id_col, "inner")
    n3 = df.count()

    # 4. language filter (heuristic language-ID)
    if args.langs:
        lang = df.select(args.id_col, text.language_id_col(args.text_col).alias("_lang"))
        df = df.join(lang.where(F.col("_lang").isin(args.langs))
                     .select(args.id_col), args.id_col, "inner")
    n4 = df.count()

    # 5. eval-set decontamination (8-gram overlap, standard 13-gram-style
    #    check scaled to the corpus' doc lengths)
    if args.benchmark_input:
        from p2pddsketch_spark.operators.pipeline import ngram_contamination
        bench = spark.read.parquet(args.benchmark_input)
        contaminated = (ngram_contamination(df, bench, n=8,
                                            text_col=args.text_col,
                                            id_col=args.id_col,
                                            exclude_bench_ids=False)
                        .where(F.col("contaminated"))
                        .select(args.id_col))
        df = df.join(contaminated, args.id_col, "left_anti")
    n5 = df.count()

    # 6. PII scrub: replace emails/phones/IPs with typed placeholders and
    #    carry the per-doc hit counts into the output for auditing
    n_redacted = 0
    if args.redact_pii:
        # persist: the audit count and the join both consume the scrub —
        # without it the full-corpus regex pass would run twice
        red = text.redact_pii(df, text_col=args.text_col,
                              id_col=args.id_col).persist()
        n_redacted = (red.where((F.col("n_email") + F.col("n_phone") +
                                 F.col("n_ip")) > 0).count())
        df = (df.drop(args.text_col)
              .join(red.withColumnRenamed("redacted", args.text_col),
                    args.id_col, "inner"))

    # 6a2. DSIR-style importance selection: keep docs whose unigram
    #      log-likelihood ratio toward the target source clears the
    #      threshold (the likelihood table is built on the CURRENT
    #      surviving corpus, so upstream dedup/quality filters shape it)
    if args.importance_target is not None:
        from p2pddsketch_spark.operators.pipeline import importance_scores
        if "source" not in df.columns:
            raise ValueError("--importance-target needs a 'source' column "
                             "in the input documents")
        imp = importance_scores(df, args.importance_target,
                                text_col=args.text_col, id_col=args.id_col,
                                hash_buckets=args.importance_buckets or None)
        df = df.join(
            imp.where(F.col("score_bits") >= args.importance_min_bits)
               .select(F.col("doc_id").alias(args.id_col)),
            args.id_col, "inner")
        n5b = df.count()
    else:
        n5b = n5

    # 6b. token-budget mixture: turn per-domain weights into a concrete
    #     training subset (deterministic splitmix-ordered greedy prefix
    #     per source — rerun/layout-invariant, monotone in the budget)
    if mix_budgets is not None:
        from p2pddsketch_spark.operators.pipeline import mix_sources
        if "source" not in df.columns:
            raise ValueError("--mix-budgets needs a 'source' column in "
                             "the input documents")
        budgets = mix_budgets
        df = (mix_sources(
            df.withColumn("_n_tok", F.size(
                F.split(F.col(args.text_col), " ")).cast("long")),
            budgets, id_col=args.id_col, group_col="source",
            len_col="_n_tok").drop("_n_tok"))
        n6 = df.count()
    else:
        n6 = n5b

    # 7. deterministic split column (stable under reruns/corpus growth)
    if args.assign_splits:
        from p2pddsketch_spark.operators.pipeline import split_assign
        df = split_assign(df, id_col=args.id_col).drop("split_bucket")

    df.write.mode("overwrite").parquet(args.output)

    # 7b. fold the published raw-content hashes into the dedup state —
    #     committed with the OUTPUT's file lineage, so re-running the
    #     fold over the same published corpus is a no-op
    dedup_state_version = None
    if args.dedup_state and args.update_dedup_state:
        from p2pddsketch_spark.operators import rollup as R
        from p2pddsketch_spark.operators.harness import scalar_int_extractor
        from p2pddsketch_spark.sketches.bloom import BloomFilter
        st = R.rollup_update(
            spark, args.output, args.dedup_state,
            [SketchSpec("bloom",
                        lambda: BloomFilter(m_bits=args.dedup_m_bits, k=5),
                        scalar_int_extractor("content_hash"))],
            group_cols=(), salt_buckets=8)
        dedup_state_version = st["version"]

    # 5. one-pass sketch summary of the curated corpus
    summary_specs = [SketchSpec(
        "dds_len", lambda: DDSketch(alpha=0.01, bin_limit=1 << 20),
        scalar_extractor("n_chars"))] if "n_chars" in df.columns else []
    quantiles = {}
    if summary_specs:
        sk = collect_sketches(build_sketches(df, summary_specs, salt_buckets=8))
        quantiles = {f"len_p{int(q*100)}": sk["dds_len"].quantile(q)
                     for q in (0.5, 0.95, 0.99)}

    manifest = {
        "input": args.input, "output": args.output,
        "rows_in": n0, "after_state_dedup": n0b,
        "dedup_state_version": dedup_state_version,
        "after_exact_dedup": n1, "after_near_dedup": n2,
        "after_semantic_dedup": n2b,
        "after_quality": n3, "after_lang": n4, "after_decontaminate": n5,
        "after_importance": n5b, "after_mix": n6,
        "docs_span_stripped": n_span_docs,
        "docs_with_pii_redacted": n_redacted,
        "secs": round(time.monotonic() - t0, 2), **quantiles,
    }
    print(json.dumps(manifest, indent=2))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
