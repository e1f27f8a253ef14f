"""Training-data pipeline operators: vocabulary tokenization, sequence
packing, and decontamination — the steps between a raw document corpus
and the (doc_id, tokens array<int32>, n_tok, source) sequences table the
sketch engine ingests (BASELINE.json input_hint shape).

The reference has none of these (it consumes pre-generated numeric
streams, `/root/reference/main.cpp:399-441`); gap-fill mandated by the
brief's LLM-data-pipeline requirement. Every operator is built from JVM
functions + broadcast joins (no Python on the per-token path except the
inherently sequential pack fold), and each registered query has an
exact DuckDB twin.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from p2pddsketch_spark.operators.text import words_col

__all__ = ["build_vocab", "tokenize", "pack_sequences",
           "ngram_contamination", "split_assign", "vocab_coverage",
           "chunk_text"]


def chunk_text(df: DataFrame, size: int = 20, overlap: int = 5,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Split each document into overlapping word windows (RAG-style
    chunking / sliding training contexts): chunk k covers words
    [1 + k·stride, …+size) with stride = size − overlap; a doc of
    n ≤ size words is one chunk; the last chunk may be shorter. The
    chunk count is CLOSED-FORM (ceil((n−size)/stride) + 1), so the whole
    operator is one `transform` + `posexplode` — all JVM, no shuffle at
    all until something downstream asks for one. Returns
    (id, chunk_id, n_chunks, chunk)."""
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    words = words_col(text_col)
    n = F.size(words)
    k = F.when(n <= size, F.lit(1)).otherwise(
        F.ceil((n - F.lit(size)).cast("double") / F.lit(float(stride))) + 1
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * stride + 1, size)))
    return (df.select(F.col(id_col), k.alias("n_chunks"),
                      F.posexplode(chunks).alias("chunk_id", "chunk"))
            .select(id_col, "chunk_id", "n_chunks", "chunk"))


def split_assign(df: DataFrame, id_col: str = "doc_id", seed: int = 101,
                 fractions: tuple[tuple[str, float], ...] = (
                     ("train", 0.90), ("val", 0.05), ("test", 0.05))) -> DataFrame:
    """Deterministic train/val/test assignment: bucket =
    splitmix64(id, seed) mod 10000 against cumulative fraction
    thresholds. A pure function of the id — stable across reruns,
    re-partitions, and corpus growth (a doc never migrates between
    splits when new docs arrive), which is what makes held-out sets
    trustworthy at 100 TB. Vectorized mapInPandas (splitmix64 is numpy);
    the tag is mod-2^64 arithmetic, so the assignment has an exact
    HUGEINT SQL twin. Returns df's columns + (split_bucket, split)."""
    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType
    from p2pddsketch_spark.functions.hashing import splitmix64
    if abs(sum(f for _, f in fractions) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    bounds = []
    acc = 0.0
    for name, f in fractions:
        acc += f
        bounds.append((name, int(round(acc * 10000))))
    # NOT df.schema.add(...): StructType.add mutates in place, which
    # would corrupt the input DataFrame's cached schema
    schema = StructType(list(df.schema.fields) +
                        [StructField("split_bucket", LongType()),
                         StructField("split", StringType())])

    def assign(batches):
        for pdf in batches:
            b = (splitmix64(pdf[id_col].to_numpy(dtype=np.int64), seed=seed)
                 % np.uint64(10000)).astype(np.int64)
            split = np.empty(len(pdf), dtype=object)
            lo = 0
            for name, hi in bounds:
                split[(b >= lo) & (b < hi)] = name
                lo = hi
            out = pdf.copy()
            out["split_bucket"] = b
            out["split"] = split
            yield out

    return df.mapInPandas(assign, schema=schema)


def vocab_coverage(df: DataFrame, sizes: tuple[int, ...] = (64, 128, 256, 512),
                   text_col: str = "text") -> DataFrame:
    """Corpus coverage curve of a frequency-ranked vocabulary: for each
    candidate vocab size, the fraction of all token OCCURRENCES covered
    by the top-k terms — the number that decides the OOV rate before
    committing to a vocab. One term-count shuffle + a distributed top-k
    (max(sizes) rows); the cumulative window runs over those survivors
    only. Returns (vocab_size, coverage, n_terms_total)."""
    kmax = max(sizes)
    counts = (df.select(F.explode(words_col(text_col)).alias("term"))
              .groupBy("term").agg(F.count("*").alias("cnt")))
    totals = counts.agg(F.sum("cnt").alias("total"),
                        F.count("*").alias("n_terms_total"))
    top = counts.orderBy(F.desc("cnt"), F.asc("term")).limit(kmax)
    w = Window.orderBy(F.desc("cnt"), F.asc("term")) \
        .rowsBetween(Window.unboundedPreceding, 0)
    ranked = (top.withColumn("cum", F.sum("cnt").over(w))
              .withColumn("rank", F.row_number().over(
                  Window.orderBy(F.desc("cnt"), F.asc("term")))))
    sizes_df = df.sparkSession.createDataFrame(
        [(int(s),) for s in sizes], "vocab_size int")
    # clamp each requested size to the distinct-term count: a size
    # beyond the vocabulary covers everything (coverage = 1.0) rather
    # than silently dropping out of the curve on a small corpus
    at = (sizes_df.crossJoin(F.broadcast(totals))
          .withColumn("eff_rank", F.least(
              F.col("vocab_size"), F.col("n_terms_total").cast("int"))))
    # LEFT join so an empty corpus (n_terms_total = 0 → eff_rank = 0
    # matches no rank) still emits every requested size with coverage
    # 0.0 instead of silently dropping the whole curve
    return (at.join(F.broadcast(ranked),
                    at["eff_rank"] == ranked["rank"], "left")
            .select("vocab_size",
                    F.coalesce(
                        F.round(F.col("cum").cast("double") /
                                F.col("total").cast("double"), 6),
                        F.lit(0.0)).alias("coverage"),
                    F.col("n_terms_total").cast("long").alias("n_terms_total"))
            .orderBy("vocab_size"))


def build_vocab(df: DataFrame, vocab_size: int = 512,
                text_col: str = "text") -> DataFrame:
    """(term, token_id) for the `vocab_size` most frequent whitespace
    terms; id = dense rank by (count DESC, term ASC) starting at 0 —
    fully deterministic, ties broken lexicographically. One explode +
    one count shuffle; the result is dimension-table sized by
    construction (≤ vocab_size rows) and is broadcast by `tokenize`."""
    counts = (df.select(F.explode(words_col(text_col)).alias("term"))
              .groupBy("term").agg(F.count("*").alias("cnt")))
    # distributed top-k FIRST (TakeOrderedAndProject — per-partition
    # top-512 then a driver merge; no single-reducer sort of the full
    # term table), THEN the rank window over the 512 survivors only
    top = counts.orderBy(F.desc("cnt"), F.asc("term")).limit(vocab_size)
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    return (top.withColumn("token_id", F.row_number().over(w) - F.lit(1))
            .select("term", "token_id"))


def tokenize(df: DataFrame, vocab: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", oov_id: int = -1) -> DataFrame:
    """Map each document to its token-id array (order-preserving;
    out-of-vocabulary terms → `oov_id`): the documents → sequences step,
    producing exactly the (doc_id, tokens, n_tok, source-passthrough)
    shape the sketch harness ingests.

    Scale shape: posexplode the words, ONE broadcast hash join against
    the vocab (no shuffle of the corpus), re-assemble with
    array_sort(collect_list(struct(pos, id))) under the doc_id shuffle —
    the only wide exchange, keyed by the natural output key. All JVM;
    zero Python."""
    keep = [c for c in df.columns if c != text_col]
    ex = df.select(*keep, F.posexplode(words_col(text_col)).alias("pos", "term"))
    joined = (ex.join(F.broadcast(vocab), "term", "left")
              .withColumn("tid", F.coalesce(F.col("token_id"), F.lit(oov_id))
                          .cast("int")))
    assembled = (joined.groupBy(*keep)
                 .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                     lambda s: s["tid"]).alias("tokens")))
    # left-join back onto the full doc set: a doc with zero words emits
    # no posexplode rows and would otherwise vanish from the sequences
    # table — it must appear with tokens = [] / n_tok = 0 (keep columns
    # are assumed non-null keys, as doc_id is)
    return (df.select(*keep)
            .join(assembled, keep, "left")
            .withColumn("tokens", F.coalesce(
                F.col("tokens"), F.array().cast("array<int>")))
            .withColumn("n_tok", F.size("tokens").cast("int")))


def pack_sequences(df: DataFrame, max_tokens: int, len_col: str = "n_tok",
                   id_col: str = "doc_id",
                   group_col: str = "source") -> DataFrame:
    """Next-fit sequence packing: within each `group_col` stream, docs in
    ascending `id_col` order are appended to the current pack until it
    would exceed `max_tokens`, then a new pack starts (an over-long doc
    gets a pack of its own). Returns (id, group, pack_id, pack_offset) —
    the layout step that turns variable-length docs into fixed context
    windows for training.

    The fold is inherently sequential PER STREAM (each doc's pack
    depends on every predecessor), so the operator runs one
    applyInPandas per group — at corpus scale you shard the stream key
    (date, source, shard) to bound each group; across groups it is
    embarrassingly parallel, and nothing else touches Python. The
    DuckDB twin replays the same fold as a recursive CTE."""
    import pandas as pd

    out_schema = (f"{id_col} long, {group_col} string, pack_id long, "
                  f"pack_offset long")
    cap = int(max_tokens)

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col)
        lens = pdf[len_col].to_numpy()
        pack_id, offs = [], []
        cur, fill = 0, 0
        for ln in lens:
            ln = int(ln)
            if fill > 0 and fill + ln > cap:
                cur, fill = cur + 1, 0
            pack_id.append(cur)
            offs.append(fill)
            fill += ln
        return pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                             group_col: pdf[group_col].to_numpy(),
                             "pack_id": pack_id, "pack_offset": offs})

    return (df.select(id_col, group_col, len_col)
            .groupBy(group_col).applyInPandas(pack, schema=out_schema))


def ngram_contamination(df: DataFrame, bench: DataFrame, n: int = 8,
                        text_col: str = "text", id_col: str = "doc_id",
                        exclude_bench_ids: bool = True) -> DataFrame:
    """Train/eval decontamination: for every candidate-training doc, the
    number of distinct word `n`-grams it shares with ANY doc of the
    `bench` (held-out eval) set — the standard 13-gram-style overlap
    check run before training. Returns (doc_id, shared_grams,
    contaminated) for docs NOT in bench.

    Scale shape: bench n-grams are exploded + distinct (eval sets are
    tiny next to the corpus) and hash-joined against the exploded train
    grams — the join key is the gram, so only colliding grams meet; a
    train doc sharing nothing never leaves its map task (left join +
    count). No Python anywhere."""
    from p2pddsketch_spark.operators.dedup import word_shingles_col
    if exclude_bench_ids:
        # bench ⊂ corpus (same id space): bench docs are not candidates
        bench_ids = bench.select(F.col(id_col).alias("bid"))
        train = df.join(bench_ids, df[id_col] == bench_ids["bid"], "left_anti")
    else:
        # external eval set: its id space is unrelated to the corpus',
        # so an id collision must NOT exempt a training doc
        train = df
    bgrams = (bench.select(F.explode(word_shingles_col(text_col, n)).alias("g"))
              .distinct())
    tgrams = train.select(F.col(id_col), F.explode(
        word_shingles_col(text_col, n)).alias("g"))
    hits = (tgrams.join(bgrams, "g", "left_semi")
            .groupBy(id_col).agg(F.countDistinct("g").alias("shared_grams")))
    return (train.select(id_col).join(hits, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("shared_grams", F.lit(0)).alias("shared_grams"))
            .withColumn("contaminated", F.col("shared_grams") > 0)
            .orderBy(id_col))
