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
           "chunk_text", "mix_sources", "duckdb_mix_sources_sql",
           "importance_scores", "duckdb_importance_sql"]


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


def importance_scores(df: DataFrame, target_source: str,
                      text_col: str = "text", source_col: str = "source",
                      id_col: str = "doc_id",
                      hash_buckets: int | None = None) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score every document by the log-likelihood ratio of
    its unigram occurrences under the TARGET source's distribution vs
    the rest-of-corpus distribution, add-one smoothed — docs that look
    like the target domain score high and can be kept by thresholding
    or rank-sampling. Output: (doc_id, n_terms, score_bits).

    `hash_buckets=B` switches to the paper's HASHED feature space:
    tokens map to pmod(xxhash64(t), B) and smoothing runs over the B
    buckets. This is the 100 TB form — the likelihood table is bounded
    at B rows regardless of corpus vocabulary, so it BROADCASTS and the
    per-doc scoring join never shuffles the fact side. Pick B well
    below the smaller class's token count (the paper's regime: B=10^4
    against 10^9+-token corpora) — when B rivals n_target, the B-term
    Laplace mass drowns the class-prior correction (n_r+V)/(n_t+V) and
    the scores degenerate to length bias. Default (None) scores over
    the raw union vocabulary (V = distinct tokens, token-keyed join,
    stopword skew → AQE).

    Exactness: with Laplace smoothing every per-occurrence term
    ln(((c_t+1)·(n_r+V)) / ((c_r+1)·(n_t+V))) / ln 2 is finite; it is
    rounded to 6 decimals, multiplied by the doc's integer occurrence
    count (exact decimal scaling), and summed as DECIMAL — associative
    and shuffle-order-free, so `duckdb_importance_sql` replays it
    verbatim (hashed form included, via the XXH64-in-SQL chain).

    100 TB: one feature-keyed aggregation builds the likelihood table
    (map-side combine), one (doc, feature) count, one feature-keyed
    join, and the scalars (n_t, n_r, V) ride a broadcast. No Python."""
    from p2pddsketch_spark.operators.text import words_col
    feat = F.col("_t")
    if hash_buckets is not None:
        if hash_buckets < 2:
            raise ValueError("hash_buckets must be >= 2")
        feat = F.pmod(F.xxhash64(F.col("_t")), F.lit(hash_buckets))
    tok = (df.select(F.col(id_col).alias("doc_id"),
                     F.col(source_col).alias("source"),
                     F.explode(words_col(text_col)).alias("_t"))
           .select("doc_id", "source", feat.alias("t")))
    is_t = (F.col("source") == F.lit(target_source)).cast("long")
    vocab = tok.groupBy("t").agg(
        F.sum(is_t).alias("c_t"),
        F.sum(F.lit(1) - is_t).alias("c_r"))
    scal = vocab.agg(F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r"),
                     F.count("*").alias("v"))
    if hash_buckets is not None:
        # smoothing runs over the FULL feature space, occupied or not
        scal = scal.select("n_t", "n_r",
                           F.lit(hash_buckets).cast("long").alias("v"))
    dtc = tok.groupBy("doc_id", "t").agg(F.count("*").alias("cnt"))
    term = F.round(
        F.log(((F.col("c_t").cast("double") + F.lit(1.0))
               * (F.col("n_r").cast("double") + F.col("v").cast("double")))
              / ((F.col("c_r").cast("double") + F.lit(1.0))
                 * (F.col("n_t").cast("double") + F.col("v").cast("double"))))
        / F.log(F.lit(2.0)), 6).cast("decimal(20,6)")
    like = F.broadcast(vocab) if hash_buckets is not None else vocab
    return (dtc.join(like, "t")
            .crossJoin(F.broadcast(scal))
            .select("doc_id", "cnt",
                    (term * F.col("cnt").cast("decimal(10,0)")).alias("w"))
            .groupBy("doc_id")
            .agg(F.sum("cnt").cast("long").alias("n_terms"),
                 F.round(F.sum("w").cast("double"), 6).alias("score_bits"))
            .orderBy("doc_id"))


def duckdb_importance_sql(target_source: str, table: str = "documents",
                          id_col: str = "doc_id",
                          source_col: str = "source",
                          words_expr: str = "string_split(text, ' ')",
                          hash_buckets: int | None = None) -> str:
    """Exact twin of `importance_scores`: identical smoothing, the same
    per-occurrence ROUND(·, 6) term scaled by the integer count and
    DECIMAL-summed. With `hash_buckets`, distinct tokens are hashed
    once through the XXH64-in-SQL chain and folded to Spark's
    pmod(xxhash64, B) bucket (signed reinterpretation of the unsigned
    HUGEINT, then positive mod)."""
    raw = f"""tok0 AS (SELECT {id_col} AS doc_id, {source_col} AS source,
                    unnest({words_expr}) AS t FROM {table})"""
    if hash_buckets is None:
        tok_cte = f"{raw}, tok AS (SELECT * FROM tok0)"
        v_sql = "count(*)"
    else:
        from p2pddsketch_spark.functions.xxh_sql import xxhash64_sql_ctes
        b = hash_buckets
        tok_cte = (
            f"{raw},\n"
            f"toks AS (SELECT DISTINCT t FROM tok0),"
            + xxhash64_sql_ctes("toks", "t", "hx")
            + f""",
feat AS (SELECT t,
                CAST((((CASE WHEN h >= 9223372036854775808::HUGEINT
                        THEN h - 18446744073709551616::HUGEINT ELSE h END)
                       % {b}::HUGEINT) + {b}::HUGEINT) % {b}::HUGEINT
                     AS BIGINT) AS f
         FROM hx),
tok AS (SELECT t0.doc_id, t0.source, fe.f AS t
        FROM tok0 t0 JOIN feat fe USING (t))"""
        )
        v_sql = str(hash_buckets)
    return f"""
WITH {tok_cte},
vocab AS (SELECT t,
                 sum(CASE WHEN source = '{target_source}' THEN 1 ELSE 0 END) AS c_t,
                 sum(CASE WHEN source = '{target_source}' THEN 0 ELSE 1 END) AS c_r
          FROM tok GROUP BY t),
scal AS (SELECT sum(c_t) AS n_t, sum(c_r) AS n_r, {v_sql} AS v FROM vocab),
dtc AS (SELECT doc_id, t, count(*) AS cnt FROM tok GROUP BY doc_id, t),
terms AS (
  SELECT d.doc_id, d.cnt,
         CAST(ROUND(ln(((CAST(vb.c_t AS DOUBLE) + 1.0)
                        * (CAST(s.n_r AS DOUBLE) + CAST(s.v AS DOUBLE)))
                       / ((CAST(vb.c_r AS DOUBLE) + 1.0)
                          * (CAST(s.n_t AS DOUBLE) + CAST(s.v AS DOUBLE))))
                    / ln(CAST(2.0 AS DOUBLE)), 6) AS DECIMAL(20,6))
         * CAST(d.cnt AS DECIMAL(10,0)) AS w
  FROM dtc d JOIN vocab vb USING (t) CROSS JOIN scal s)
SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_terms,
       ROUND(CAST(sum(w) AS DOUBLE), 6) AS score_bits
FROM terms GROUP BY doc_id
ORDER BY doc_id
"""


def mix_sources(df: DataFrame, budgets: dict[str, int],
                id_col: str = "doc_id", group_col: str = "source",
                len_col: str = "n_tok", seed: int = 77,
                bucket_bits: int = 12) -> DataFrame:
    """Token-budget mixture construction: deterministically select
    documents per source until each source's token budget is covered —
    the "data mixing" step that turns per-domain weights (web 60 %,
    code 20 %, …) into a concrete training subset.

    Selection rule (exact, layout/rerun-invariant): per source, order
    docs by (splitmix64(id, seed), id) — a stable pseudo-random shuffle
    that is a pure function of the id — and keep each doc whose
    preceding selected-token total is still < budget. The doc that
    crosses the budget is INCLUDED, so covered tokens ≥ budget whenever
    the source has enough. Sources missing from `budgets` (or with
    budget ≤ 0) are dropped; a budget ≥ the source total keeps every
    doc. The rule is a strict prefix of the tag order, so a larger
    budget always selects a superset (monotonicity — pinned by test).

    Scale shape (100 TB): the naive form is one window over every row
    per source — a full shuffle with single-reducer skew on giant
    sources. Instead the tag's TOP `bucket_bits` bits split each source
    into 2^bucket_bits uniform buckets; one map-side-combinable
    aggregate gives per-(source, bucket) token sums, the driver cumsums
    ≤ |sources|·2^bucket_bits tiny rows to find each source's boundary
    bucket, and the fact table is then FILTERED by broadcast-joined
    bucket thresholds — no fact shuffle at all. Only the ~1/2^bucket_bits
    sliver of rows inside each boundary bucket pays a window, and that
    window's partition is one bucket of one source. The exact same
    greedy prefix comes out (pinned against the one-window replay and
    the plain-pandas oracle in tests/test_pipeline.py).

    The tag is mod-2^64 arithmetic, so the whole selection has an exact
    HUGEINT SQL twin — `duckdb_mix_sources_sql`."""
    from pyspark.sql.types import LongType, StructField, StructType
    from p2pddsketch_spark.functions.hashing import splitmix64
    if bucket_bits < 1 or bucket_bits > 32:
        raise ValueError(f"bucket_bits must be in [1, 32], got {bucket_bits}")
    # budget keys must compare equal to the group column's values
    # (string sources → string keys); non-positive budgets drop
    live = {s: int(b) for s, b in budgets.items() if int(b) > 0}
    spark = df.sparkSession
    out_cols = df.columns
    if not live:
        return df.where(F.lit(False)).select(*out_cols)
    shift = np.uint64(64 - bucket_bits)

    def tag(batches):
        for pdf in batches:
            t = splitmix64(pdf[id_col].to_numpy(dtype=np.int64), seed=seed)
            out = pdf.copy()
            # xor the sign bit: unsigned tag order == signed int64 order
            out["_mix_tag"] = (t ^ np.uint64(1 << 63)).view(np.int64)
            out["_mix_bucket"] = (t >> shift).astype(np.int64)
            yield out

    def tagged_of(frame: DataFrame) -> DataFrame:
        sch = StructType(list(frame.schema.fields) +
                         [StructField("_mix_tag", LongType()),
                          StructField("_mix_bucket", LongType())])
        return frame.mapInPandas(tag, schema=sch)

    filtered = df.where(F.col(group_col).isin(list(live)))
    # one bounded aggregate: ≤ |sources| × 2^bucket_bits rows collect.
    # The tag is a pure function of the id, so the histogram pass runs
    # on a PRUNED projection — mapInPandas blocks column pruning, and
    # Arrow-shipping full documents just to sum token counts would
    # double the dominant I/O at scale
    hist = (tagged_of(filtered.select(
                group_col, id_col, F.col(len_col).cast("long").alias("_len")))
            .groupBy(group_col, "_mix_bucket")
            .agg(F.sum("_len").alias("_tok"))
            .collect())
    per_src: dict = {}
    for r in hist:
        per_src.setdefault(r[group_col], []).append(
            (int(r["_mix_bucket"]), int(r["_tok"])))
    bounds = []   # (source, keep_below, boundary_bucket, remaining)
    for src, pairs in per_src.items():
        budget = live[src]
        pre = 0
        keep_below, boundary, remaining = 1 << bucket_bits, -1, 0
        for b, tok in sorted(pairs):
            if pre >= budget:
                keep_below = b
                break
            if pre + tok > budget:
                # pre < budget <= pre + tok: the greedy prefix ends here
                keep_below, boundary, remaining = b, b, budget - pre
                break
            pre += tok
        # no break: the whole source fits the budget — the default
        # keep_below (2^bucket_bits) keeps every bucket
        bounds.append((src, keep_below, boundary, remaining))
    gtype = df.schema[group_col].dataType.simpleString()
    bdf = F.broadcast(spark.createDataFrame(
        bounds, f"{group_col} {gtype}, _keep_below long, "
                "_boundary long, _remaining long"))
    tagged = tagged_of(filtered)
    joined = tagged.join(bdf, group_col)
    full = joined.where(F.col("_mix_bucket") < F.col("_keep_below"))
    w = (Window.partitionBy(group_col)
         .orderBy("_mix_tag", id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    edge = (joined.where(F.col("_mix_bucket") == F.col("_boundary"))
            .withColumn("_before", F.coalesce(
                F.sum(F.col(len_col).cast("long")).over(w), F.lit(0)))
            .where(F.col("_before") < F.col("_remaining")))
    return full.select(*out_cols).unionByName(edge.select(*out_cols))


_SM_MUL = 0x9E3779B97F4A7C15


def duckdb_mix_sources_sql(budgets: dict[str, int], table: str = "documents",
                           id_col: str = "doc_id",
                           group_col: str = "source",
                           len_expr: str = "len(string_split(text, ' '))",
                           seed: int = 77) -> str:
    """Exact HUGEINT twin of `mix_sources` (splitmix64 chain as in the
    stratified_sample oracle; the greedy prefix is one window). Emits
    the per-source selection fingerprint: (source, n_docs, n_tokens,
    id_checksum = Σ selected ids) — the gate-row shape."""
    seed_add = ((seed * _SM_MUL + _SM_MUL) & 0xFFFFFFFFFFFFFFFF)

    def mulc(expr: str, c: int) -> str:
        # (z * c) mod 2^64 without INT128 overflow: 32-bit constant split
        # (z < 2^64 so z·lo < 2^96 fits HUGEINT) — same construction as
        # plans/oracles.py::_mulc_u64
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (f"((({expr}) * {lo}::HUGEINT + "
                f"(((({expr}) * {hi}::HUGEINT) % 4294967296::HUGEINT) * "
                f"4294967296::HUGEINT)) % 18446744073709551616::HUGEINT)")

    vals = ", ".join(f"('{s}', {int(b)}::BIGINT)"
                     for s, b in sorted(budgets.items()) if int(b) > 0)
    if not vals:
        vals = "('', 0::BIGINT)"
    return f"""
WITH bud({group_col}, budget) AS (VALUES {vals}),
s0 AS (
  SELECT {group_col}, {id_col}, {len_expr}::BIGINT AS _len,
         ({id_col}::HUGEINT + {seed_add}::HUGEINT)
           % 18446744073709551616::HUGEINT AS z
  FROM {table}
), s1 AS (
  SELECT {group_col}, {id_col}, _len,
         {mulc("xor(z, z // 1073741824::HUGEINT)", 0xBF58476D1CE4E5B9)} AS z
  FROM s0
), s2 AS (
  SELECT {group_col}, {id_col}, _len,
         {mulc("xor(z, z // 134217728::HUGEINT)", 0x94D049BB133111EB)} AS z
  FROM s1
), tg AS (
  SELECT {group_col}, {id_col}, _len,
         xor(z, z // 2147483648::HUGEINT) AS t
  FROM s2
), win AS (
  SELECT {group_col}, {id_col}, _len, budget,
         COALESCE(SUM(_len) OVER (PARTITION BY {group_col}
                                  ORDER BY t, {id_col}
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), 0) AS bef
  FROM tg JOIN bud USING ({group_col})
)
SELECT {group_col},
       COUNT(*)::BIGINT AS n_docs,
       SUM(_len)::BIGINT AS n_tokens,
       SUM({id_col})::BIGINT AS id_checksum
FROM win WHERE bef < budget
GROUP BY {group_col}
ORDER BY {group_col}
"""
