"""Deduplication operators for training-data pipelines.

* exact duplicate grouping (hash-groupBy; md5 fingerprints)
* n-gram Jaccard near-dup pairs — exact, via a shingle-inverted-index
  self-join (no cross join: at 100 TB the join key is the shingle, and
  only docs sharing a shingle ever meet)
* MinHash + LSH banding — the scale path: O(n) signatures, candidate
  pairs only within equal (band, band-hash) buckets, then exact-Jaccard
  verification of the (tiny) candidate set
* SimHash — 64-bit near-dup fingerprints joined on rotated prefix
  blocks, Hamming-verified

All Python stages are Arrow-vectorized (numpy over flattened shingle
arrays with `np.minimum.reduceat` segment mins); everything else is
built-in functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, IntegerType, LongType,
                               StringType, StructField, StructType)

from p2pddsketch_spark.operators.text import fingerprint_md5_col, words_col

__all__ = ["exact_dedup_stats", "exact_dedup", "word_shingles_col",
           "token_shingles_col", "ngram_jaccard_pairs",
           "minhash_signatures", "minhash_band_hashes",
           "minhash_lsh_pairs", "minhash_lsh_pairs_tokens",
           "simhash64", "simhash_blocks",
           "simhash_neardup_pairs", "simhash128_block_layout",
           "simhash128_keys", "simhash_neardup_pairs_wide",
           "duplicate_spans", "strip_duplicate_spans"]


def _nonempty_offsets(lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """reduceat segment starts for the rows with lens > 0. The
    concatenated per-shingle data contains only those rows' elements, so
    `op.reduceat(flat, offs)` indexed by this mask is total — including
    when TRAILING rows have zero shingles, where naive all-row cumsum
    offsets hit index == len(flat), which reduceat rejects (a doc shorter
    than n words at the end of an Arrow batch crashed the old path)."""
    nz = lens > 0
    cl = np.cumsum(lens[nz])
    offs = np.zeros(len(cl), dtype=np.int64)
    offs[1:] = cl[:-1]
    return nz, offs


# ------------------------------------------------------------- exact dedup

def exact_dedup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(n_docs, n_unique, n_dup_docs) by content fingerprint."""
    fp = df.select(fingerprint_md5_col(text_col).alias("fp"))
    return fp.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fp").alias("n_unique"),
        (F.count("*") - F.countDistinct("fp")).alias("n_dup_docs"),
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per identical content (deterministic winner).
    Hash-shuffle on the fingerprint — embarrassingly parallel."""
    fp = df.withColumn("_fp", fingerprint_md5_col(text_col))
    w = F.min(id_col).alias("_keep")
    keep = fp.groupBy("_fp").agg(w)
    return (fp.join(keep, (fp["_fp"] == keep["_fp"]) & (fp[id_col] == keep["_keep"]))
            .select(df["*"]))


# ------------------------------------------------------ n-gram Jaccard

def word_shingles_col(text_col: str = "text", n: int = 3):
    """Distinct word n-gram shingles, built with JVM array functions.
    Docs with fewer than n words have NO n-gram shingle — they get an
    empty array (never a truncated gram), so short/empty docs cannot
    pair with each other through a degenerate shared shingle."""
    words = words_col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - F.lit(n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    return F.when(F.size(words) >= n, F.array_distinct(grams)) \
            .otherwise(F.array().cast("array<string>"))


def ngram_jaccard_pairs(df: DataFrame, threshold: float = 0.5, n: int = 3,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_shingle_df: int | None = 100_000) -> DataFrame:
    """n-gram Jaccard near-dup pairs via inverted index: explode shingles
    → self-join on shingle for CANDIDATE pairs → exact array-intersect
    Jaccard verification of candidates (full shingle sets, recomputed
    only for docs a candidate pair touches). Returns (id_a, id_b,
    jaccard) with id_a < id_b, jaccard rounded to 6.

    `max_shingle_df` caps the inverted index: a shingle occurring in more
    than that many documents is dropped from CANDIDATE GENERATION (never
    from verification), because a shingle shared by m docs emits m² join
    rows — one stopword-ish shingle at corpus scale would make the
    self-join quadratic. Verification stays exact, so the only effect on
    output is a documented recall bound: a pair is missed only when
    EVERY shingle it shares is hotter than the cap — at any meaningful
    threshold such pairs share thousands of shingles and the chance all
    are corpus-scale-hot is negligible. Set None to disable (exact
    recall; only safe when the corpus is small or pre-deduped)."""
    sh_full = df.select(F.col(id_col).alias("id"),
                        word_shingles_col(text_col, n).alias("sh"))
    if max_shingle_df is None:
        # uncapped: ONE aggregation computes exact intersections directly
        # (count shared shingles per pair from the inverted-index join) —
        # fewer stages than candidate+verify; only safe when no shingle
        # is corpus-scale hot
        sz = sh_full.withColumn("sz", F.size("sh").cast("long"))
        ex = sz.select("id", "sz", F.explode("sh").alias("g"))
        a, b = ex.alias("a"), ex.alias("b")
        inter_df = (a.join(b, (F.col("a.g") == F.col("b.g")) &
                              (F.col("a.id") < F.col("b.id")))
                    .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                             F.col("a.sz").alias("sz_a"), F.col("b.sz").alias("sz_b"))
                    .agg(F.count("*").alias("inter")))
        jac = F.col("inter").cast("double") / \
            (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
        return (inter_df.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
                .where(F.col("jaccard") >= threshold)
                .orderBy("id_a", "id_b"))
    ex = sh_full.select("id", F.explode("sh").alias("g"))
    hot = (ex.groupBy("g").agg(F.count("*").alias("df_"))
           .where(F.col("df_") > max_shingle_df).select("g"))
    ex = ex.join(hot, "g", "left_anti")
    a, b = ex.alias("a"), ex.alias("b")
    cand = (a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())
    cand_ids = (cand.select(F.col("id_a").alias("id"))
                .union(cand.select(F.col("id_b").alias("id")))
                .distinct())
    sh = sh_full.join(cand_ids, "id", "left_semi")
    ja = cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a") \
             .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return (ja.select("id_a", "id_b", F.round(inter / union, 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold)
            .orderBy("id_a", "id_b"))


# ---------------------------------------------------------- MinHash + LSH

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def _hash_shingles_uint64(flat: pd.Series) -> np.ndarray:
    """Vectorized string → uint64 via pandas hashing (stable across runs)."""
    from pandas.util import hash_array
    return hash_array(flat.to_numpy(dtype=object), hash_key="p2pddsketch0000!")


def token_shingles_col(tokens_col: str = "tokens", n: int = 3):
    """Distinct token-id n-gram shingles over a pre-tokenized
    array<int> column, as '_'-joined strings (e.g. '5_17_3') built with
    JVM array functions — the token-array twin of `word_shingles_col`,
    so MinHash/Jaccard dedup runs directly on the input_hint's
    (doc_id, tokens) sequences shape without raw text. Same short-doc
    rule: fewer than n tokens → empty array, never a truncated gram."""
    toks = F.col(tokens_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)))
    grams = F.transform(
        idx, lambda i: F.array_join(
            F.transform(F.slice(toks, i, n), lambda t: t.cast("string")), "_"))
    return F.when(F.size(toks) >= n, F.array_distinct(grams)) \
            .otherwise(F.array().cast("array<string>"))


def minhash_band_hashes(df: DataFrame, num_perm: int = 128, bands: int = 32,
                        n: int = 3, text_col: str = "text",
                        id_col: str = "doc_id", seed: int = 7,
                        shingles=None) -> DataFrame:
    """(id, bh array<binary>[bands]) — one Arrow-vectorized pass: flatten
    all shingle lists in the batch, hash once, per permutation
    h' = (a·h + b) mod 2^61−1, segment-min with `np.minimum.reduceat`,
    then digest each band's `rows` minima into ONE compact binary band
    hash INSIDE the signature stage. The downstream band explode shuffles
    8·rows bytes per (id, band) row instead of the full signature — at
    128 perms × 32 bands this is a 64× shuffle-volume cut vs carrying a
    hex-encoded signature to every band row. No per-row Python."""
    if num_perm % bands != 0:
        raise ValueError(f"bands ({bands}) must divide num_perm ({num_perm})")
    if not 1 <= bands <= num_perm:
        raise ValueError(f"bands must be in [1, num_perm={num_perm}]")
    rows = num_perm // bands
    a_p, b_p = _perm_params(num_perm, seed)
    id_type = df.schema[id_col].dataType
    schema = StructType([StructField("id", id_type, True),
                         StructField("bh", ArrayType(BinaryType(), False), False)])
    # hash each shingle to int64 INSIDE the JVM (xxhash64, codegen) so the
    # Arrow transfer to the Python stage carries 8 bytes per shingle, not
    # the shingle strings (~4× less IPC; measured 2× on the sign stage).
    # `shingles` overrides the word-n-gram generator with any
    # array<string> shingle expression (e.g. `token_shingles_col`).
    sh_expr = word_shingles_col(text_col, n) if shingles is None else shingles
    sh = df.select(F.col(id_col).alias("id"),
                   F.transform(sh_expr, lambda s: F.xxhash64(s)).alias("sh"))

    def sign(batches):
        # Arrow-native (round-6): lens/flat come from the ListArray's own
        # offsets/values buffers — no pandas object lists, no per-row
        # np.concatenate — and the per-(row, band) digests are emitted as
        # ONE list<binary> built over the raw signature bytes instead of
        # n·bands Python bytes objects (measured 8× on the sign stage,
        # byte-identical output)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            col = batch.column("sh")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            n_rows = len(col)
            lens = col.value_lengths().to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            flat = col.flatten()
            try:
                h = flat.to_numpy(zero_copy_only=True).astype(np.uint64)
            except (pa.ArrowInvalid, ValueError):
                h = flat.to_numpy(zero_copy_only=False).astype(np.uint64)
            # empty docs (shorter than n words) get the identity signature
            # _MERSENNE; reduceat runs only over the non-empty rows
            sig = np.full((n_rows, num_perm), _MERSENNE, dtype=np.uint64)
            if h.size:
                nz, offs = _nonempty_offsets(lens)
                with np.errstate(over="ignore"):
                    hm = h % _MERSENNE
                    # permutations in blocks of 16: the full (num_perm,
                    # n_shingles) product is ~0.5 GB per 10k-doc batch and
                    # its first-touch page faults × 32 concurrent workers
                    # re-trigger the mmap-churn cliff (measured 12.6 s →
                    # 4.7 s cold on the sign stage); blocks keep the temp
                    # ~64 MB with identical arithmetic
                    for p0 in range(0, num_perm, 16):
                        p1 = min(p0 + 16, num_perm)
                        hp = (a_p[p0:p1, None] * hm[None, :]
                              + b_p[p0:p1, None]) % _MERSENNE
                        sig[nz, p0:p1] = np.minimum.reduceat(
                            hp, offs, axis=1).T
            # row-major little-endian u64 bytes: row i's band b occupies
            # [i·num_perm·8 + b·rows·8, …+rows·8) — so the binary child
            # array is the raw buffer with a stride-rows·8 offsets ramp,
            # and the outer list offsets step by `bands`
            raw = np.ascontiguousarray(sig.astype("<u8")).tobytes()
            bw = rows * 8
            boffs = np.arange(n_rows * bands + 1, dtype=np.int32) * bw
            bin_arr = pa.Array.from_buffers(
                pa.binary(), n_rows * bands,
                [None, pa.py_buffer(boffs.tobytes()), pa.py_buffer(raw)])
            loffs = pa.array(np.arange(n_rows + 1, dtype=np.int32) * bands,
                             type=pa.int32())
            bh = pa.ListArray.from_arrays(loffs, bin_arr)
            yield pa.RecordBatch.from_arrays([batch.column("id"), bh],
                                             names=["id", "bh"])

    return sh.mapInArrow(sign, schema=schema)


def minhash_signatures(df: DataFrame, num_perm: int = 128, n: int = 3,
                       text_col: str = "text", id_col: str = "doc_id",
                       seed: int = 7) -> DataFrame:
    """(id, sig array<binary>[num_perm]) — each element the 8-byte
    little-endian minimum of one permutation (a 1-row band of
    `minhash_band_hashes`)."""
    return minhash_band_hashes(df, num_perm=num_perm, bands=num_perm, n=n,
                               text_col=text_col, id_col=id_col, seed=seed) \
        .withColumnRenamed("bh", "sig")


def minhash_lsh_pairs(df: DataFrame, threshold: float = 0.5, num_perm: int = 128,
                      bands: int = 32, n: int = 3, text_col: str = "text",
                      id_col: str = "doc_id", seed: int = 7,
                      shingles=None) -> DataFrame:
    """Near-dup pairs: MinHash band digests → LSH candidate pairs
    (equi-join on (band, band_hash) — only bucket collisions meet) →
    EXACT n-gram-Jaccard verification of the candidates only (shingles
    are recomputed solely for docs that appear in a candidate pair —
    a left-semi join keeps the verify stage proportional to the
    candidate set, not the corpus).

    With 32 bands × 4 rows, a pair at J=0.5 is caught w.p. ~1−(1−0.5⁴)³²
    ≈ 0.87 and at J=0.8 w.p. ≈ 1−5·10⁻⁸; verified output contains no
    false positives. Output schema matches `ngram_jaccard_pairs`.
    """
    # small-file inputs arrive as one partition — spread the vectorized
    # signature stage across the cluster (cheap narrow shuffle of text).
    # File count stands in for partition count (df.rdd would trigger RDD
    # conversion planning just to read a number); non-file-backed inputs
    # report [] and take the conservative repartition.
    par = df.sparkSession.sparkContext.defaultParallelism
    if len(df.inputFiles()) < par:
        df = df.repartition(par)
    # materialize the signature table and the candidate set EAGERLY: both
    # are re-read by several plan branches (self-join sides, verify
    # semi-join, final pair join). A lazy .persist() here let the band
    # self-join's two sides race to fill the cache and run the Python
    # signature stage TWICE on first execution (round-6: measured ~2× the
    # whole stage cold); eager localCheckpoint runs it exactly once, and
    # its blocks are ContextCleaner-owned. At cluster scale these are the
    # tables a production run writes to storage between stages; the
    # digests are ~num_perm·8 B/doc and candidates are pair ids only.
    digests = (minhash_band_hashes(df, num_perm, bands, n, text_col, id_col,
                                   seed, shingles=shingles)
               .localCheckpoint(eager=True))
    banded = digests.select("id", F.posexplode("bh").alias("band", "bh"))
    # shuffled-hash beats sort-merge here: both sides are the same
    # (band, digest)-keyed table, per-partition build sides are small by
    # banding sparsity, and skipping the two sorts measured ~2× on the
    # candidate stage (round-6, guide §3.1)
    a, b = banded.alias("a").hint("shuffle_hash"), banded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band")) &
                      (F.col("a.bh") == F.col("b.bh")) &
                      (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
            # localCheckpoint, not persist: it materializes eagerly (the
            # signature stage runs exactly once), truncates lineage, and —
            # unlike an unmatched .persist() — its blocks are released by
            # the ContextCleaner as soon as callers drop the returned
            # DataFrame, so repeated calls in one session don't accumulate
            # cached tables in executor storage.
            .localCheckpoint(eager=True))
    del digests  # candidates are materialized; the ContextCleaner frees
    #              the checkpointed signature blocks once unreferenced
    cand_ids = (cand.select(F.col("id_a").alias("id"))
                .union(cand.select(F.col("id_b").alias("id")))
                .distinct())
    sh_expr = word_shingles_col(text_col, n) if shingles is None else shingles
    # materialize the candidate docs' shingle sets ONCE: the verify plan
    # consumes them in three branches (sizes + both sides of the
    # intersection join), and without a checkpoint the shingle
    # construction (split + transform + array_distinct over every
    # candidate doc) runs once per branch (round-6; measured 2× on
    # the verify stage at sf1.0)
    sh = (df.join(cand_ids, df[id_col] == cand_ids["id"], "left_semi")
          .select(F.col(id_col).alias("id"), sh_expr.alias("sh"))
          .localCheckpoint(eager=True))
    # COUNT the shared shingles per candidate pair from the exploded sets
    # instead of shipping both full shingle-string arrays to every pair
    # row and array_intersect-ing them: only (id, shingle) pairs and the
    # tiny per-doc sizes move, and the LEFT join + coalesce(0) keeps the
    # exact old semantics — a pair with no shared shingle scores
    # inter = 0, and an empty-vs-empty pair divides 0/0 → NULL → dropped,
    # identically (round-6; measured ~1.7× on the verify stage, results
    # byte-identical)
    ex = sh.select("id", F.explode("sh").alias("g"))
    sz = sh.select("id", F.size("sh").alias("sz"))
    step1 = cand.join(ex.toDF("id_a", "ga"), "id_a")
    inter_df = (step1.join(ex.toDF("id_b2", "gb"),
                           (F.col("id_b") == F.col("id_b2")) &
                           (F.col("ga") == F.col("gb")))
                .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    ja = (cand.join(sz.toDF("id_a", "sz_a"), "id_a")
          .join(sz.toDF("id_b", "sz_b"), "id_b")
          .join(inter_df, ["id_a", "id_b"], "left")
          .withColumn("inter", F.coalesce(F.col("inter"), F.lit(0))))
    jac = F.col("inter").cast("double") / \
        (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
    return (ja.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold)
            .orderBy("id_a", "id_b"))


def minhash_lsh_pairs_tokens(df: DataFrame, threshold: float = 0.5,
                             num_perm: int = 128, bands: int = 32, n: int = 3,
                             tokens_col: str = "tokens",
                             id_col: str = "doc_id", seed: int = 7) -> DataFrame:
    """MinHash-LSH near-dup pairs over PRE-TOKENIZED documents — the
    (doc_id, tokens array<int>) input_hint shape — via token-id n-gram
    shingles ('5_17_3' strings built JVM-side). Identical banding,
    candidate generation, and exact-Jaccard verification to
    `minhash_lsh_pairs`; only the shingle generator differs, so a
    training-data pipeline can dedup a tokenized corpus without keeping
    (or re-reading) the raw text. Output schema: (id_a, id_b, jaccard)."""
    return minhash_lsh_pairs(df, threshold=threshold, num_perm=num_perm,
                             bands=bands, n=n, id_col=id_col, seed=seed,
                             shingles=token_shingles_col(tokens_col, n))


# ----------------------------------------------------------------- SimHash

def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              n: int = 3, seed: int = 11) -> DataFrame:
    """64-bit SimHash over word n-gram shingles, vectorized: hash all
    shingles in the batch, unpack to a bit matrix, segment-sum votes."""
    id_type = df.schema[id_col].dataType
    schema = StructType([StructField("id", id_type, True),
                         StructField("simhash", LongType(), False)])
    sh = df.select(F.col(id_col).alias("id"),
                   word_shingles_col(text_col, n).alias("sh"))

    def sim(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lists = pdf["sh"]
            lens = lists.map(len).to_numpy()
            total = int(lens.sum())
            if total == 0:
                yield pd.DataFrame({"id": pdf["id"], "simhash": np.zeros(len(pdf), np.int64)})
                continue
            flat = pd.Series(np.concatenate([np.asarray(x, dtype=object) for x in lists]))
            h = _hash_shingles_uint64(flat)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            votes = bits * 2 - 1  # ±1 per bit
            nz, offs = _nonempty_offsets(lens)
            seg = np.full((len(pdf), 64), -1, dtype=np.int64)  # empty → all-zero fp
            seg[nz] = np.add.reduceat(votes, offs, axis=0)
            fp = (seg > 0).astype(np.uint64)
            out = np.zeros(len(pdf), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for bit in range(64):
                    out |= fp[:, bit] << np.uint64(bit)
            yield pd.DataFrame({"id": pdf["id"], "simhash": out.astype(np.int64)})

    return sh.mapInPandas(sim, schema=schema)


def simhash_blocks(max_hamming: int) -> list[tuple[int, int]]:
    """(start_bit, width) of the B = max_hamming + 1 blocks a 64-bit
    SimHash is split into for candidate generation. Pigeonhole: two codes
    within Hamming ≤ max_hamming differ in at most max_hamming blocks, so
    they must AGREE on at least one of the B blocks — joining on every
    block is therefore a COMPLETE candidate generator for the requested
    radius (recall 1.0 before the exact popcount verify)."""
    b = max_hamming + 1
    if not 1 <= b <= 64:
        raise ValueError("max_hamming must be in [0, 63]")
    base, rem = divmod(64, b)
    widths = [base + 1 if i < rem else base for i in range(b)]
    starts = [sum(widths[:i]) for i in range(b)]
    return list(zip(starts, widths))


def simhash_neardup_pairs(df: DataFrame, max_hamming: int = 3,
                          text_col: str = "text", id_col: str = "doc_id",
                          n: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: join on each of max_hamming+1 bit blocks
    (a pair within the radius must agree on ≥ 1 block — pigeonhole, see
    `simhash_blocks`), then exact popcount verification. Block count is
    DERIVED from max_hamming so the candidate step is complete for any
    requested radius. Returns (id_a, id_b, hamming)."""
    s = simhash64(df, text_col, id_col, n)
    layout = simhash_blocks(max_hamming)
    block_arr = F.array(*[
        F.struct(F.lit(st).alias("st"), F.lit(wd).alias("wd"))
        for st, wd in layout])
    # mask = (1 << wd) − 1; at wd = 64 Java << wraps mod 64, so take −1
    # (all ones) explicitly. Two's-complement wrap at wd = 63 is correct.
    blocked = (s.select("id", "simhash",
                        F.posexplode(block_arr).alias("blk", "sw"))
               .withColumn("bh", F.expr(
                   "shiftrightunsigned(simhash, sw.st) & "
                   "(CASE WHEN sw.wd < 64 THEN shiftleft(1L, sw.wd) - 1L ELSE -1L END)"))
               .select("id", "simhash", "blk", "bh"))
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (a.join(b, (F.col("a.blk") == F.col("b.blk")) &
                      (F.col("a.bh") == F.col("b.bh")) &
                      (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
            .distinct())
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.select("id_a", "id_b", ham.cast("int").alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
            .orderBy("id_a", "id_b"))


# ------------------------------------------- 128-bit SimHash (wide radius)

def simhash128_block_layout(max_hamming: int) -> tuple[list[tuple[int, int]],
                                                       list[tuple[int, int]]]:
    """Block layout + combo list for the 128-bit Hamming-ball multi-index
    (the block-permutation idea of Manku/Jain/Sarma, WWW'07 §3, recast as
    equi-joins). The fingerprint splits into B = max_hamming + 2 blocks;
    two codes within Hamming ≤ max_hamming differ in at most max_hamming
    blocks, so they AGREE on ≥ 2 of the B blocks — hence they share at
    least one of the C(B, 2) block PAIRS, and joining on every pair-combo
    key is a COMPLETE candidate generator (recall 1.0 before the exact
    popcount verify).

    Why pairs, not single blocks: at max_hamming = 8 a 64-bit fingerprint
    in B = 9 single blocks gives ~7-bit join keys (~128 distinct values →
    candidate volume ~n²/2⁷ — quadratic at corpus scale). 128 bits in
    B = 10 blocks joined on pairs gives ~25-bit keys (~2·10⁷ values):
    ~2⁶ fewer candidates per combo than even single 14-bit blocks, at the
    cost of C(10,2) = 45 combos — each a sparse equi-join.

    Returns (blocks, combos): blocks = [(start_bit, width)] over the
    128-bit code, combos = [(i, j)] block-index pairs."""
    b = max_hamming + 2
    if not 2 <= b <= 128:
        raise ValueError("max_hamming must be in [0, 126]")
    base, rem = divmod(128, b)
    widths = [base + 1 if i < rem else base for i in range(b)]
    starts = [sum(widths[:i]) for i in range(b)]
    blocks = list(zip(starts, widths))
    combos = [(i, j) for i in range(b) for j in range(i + 1, b)]
    return blocks, combos


def simhash128_keys(df: DataFrame, max_hamming: int = 8,
                    text_col: str = "text", id_col: str = "doc_id",
                    n: int = 3) -> DataFrame:
    """(id, hi, lo, keys array<long>[C(B,2)]) — 128-bit SimHash over word
    n-gram shingles plus the pre-computed multi-index combo keys.

    One Arrow-vectorized pass: the JVM hashes every shingle TWICE
    (xxhash64 with two seeds → 128 independent bits, 16 B/shingle over
    Arrow instead of the strings), the Python stage unpacks the bit
    matrix, segment-sums the ±1 votes with `np.add.reduceat`, packs
    (hi, lo), and emits each combo's key = combo_index·2^52 | block_i
    bits | block_j bits (block widths ≤ 13 ⇒ pair payload ≤ 26 bits —
    no overflow, and distinct combos never collide). Keys are computed
    HERE because blocks straddle the hi/lo boundary — numpy bit-slicing
    of the already-unpacked matrix beats two-word SQL bit surgery."""
    blocks, combos = simhash128_block_layout(max_hamming)
    max_w = max(w for _, w in blocks)
    ci_bits = max(1, (len(combos) - 1).bit_length())
    # key layout: combo_index << 52 | block_i << max_w | block_j — valid
    # iff the pair payload fits under bit 52 and the combo index under
    # bit 63. Tiny radii (B = r+2 ≤ 4 → blocks ≥ 32 bits) and absurdly
    # wide ones (B > 64 → > 2^11 combos) both break it; a narrow radius
    # is exactly where the 64-bit single-block index is already sparse.
    if 2 * max_w > 52 or ci_bits > 11:
        from p2pddsketch_spark.errors import ParamError
        raise ParamError(
            f"max_hamming={max_hamming} gives {len(blocks)} blocks of up to "
            f"{max_w} bits ({len(combos)} combos) — pair keys overflow "
            "int64; use simhash_neardup_pairs (64-bit single blocks) for "
            "radii <= 2")
    id_type = df.schema[id_col].dataType
    schema = StructType([StructField("id", id_type, True),
                         StructField("hi", LongType(), False),
                         StructField("lo", LongType(), False),
                         StructField("keys", ArrayType(LongType(), False), False)])
    sh = (df.select(F.col(id_col).alias("id"),
                    word_shingles_col(text_col, n).alias("g"))
          .select("id",
                  F.transform("g", lambda s: F.xxhash64(s)).alias("h1"),
                  F.transform("g", lambda s: F.xxhash64(s, F.lit(0x5EED))).alias("h2")))

    def sim(batches):
        shifts = np.arange(64, dtype=np.uint64)[None, :]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lens = pdf["h1"].map(len).to_numpy()
            n_rows, total = len(pdf), int(lens.sum())
            if total:
                h1 = np.concatenate([np.asarray(x, np.int64) for x in pdf["h1"]]).astype(np.uint64)
                h2 = np.concatenate([np.asarray(x, np.int64) for x in pdf["h2"]]).astype(np.uint64)
                bits = np.empty((total, 128), dtype=np.int64)
                bits[:, :64] = ((h1[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
                bits[:, 64:] = ((h2[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
                votes = bits * 2 - 1
                nz, offs = _nonempty_offsets(lens)
                seg = np.full((n_rows, 128), -1, dtype=np.int64)  # empty → all-zero fp
                seg[nz] = np.add.reduceat(votes, offs, axis=0)
                fp = (seg > 0)                       # (n_rows, 128) bool
            else:
                fp = np.zeros((n_rows, 128), dtype=bool)
            pw = np.uint64(1) << np.arange(64, dtype=np.uint64)
            hi = (fp[:, :64].astype(np.uint64) * pw).sum(axis=1, dtype=np.uint64)
            lo = (fp[:, 64:].astype(np.uint64) * pw).sum(axis=1, dtype=np.uint64)
            bvals = np.empty((n_rows, len(blocks)), dtype=np.int64)
            for bi, (st, wd) in enumerate(blocks):
                w_pow = np.uint64(1) << np.arange(wd, dtype=np.uint64)
                bvals[:, bi] = (fp[:, st:st + wd].astype(np.uint64) * w_pow) \
                    .sum(axis=1, dtype=np.uint64).astype(np.int64)
            keys = np.empty((n_rows, len(combos)), dtype=np.int64)
            for ci, (i, j) in enumerate(combos):
                keys[:, ci] = ((np.int64(ci) << np.int64(52))
                               | (bvals[:, i] << np.int64(max_w))
                               | bvals[:, j])
            yield pd.DataFrame({"id": pdf["id"],
                                "hi": hi.astype(np.int64),
                                "lo": lo.astype(np.int64),
                                "keys": list(keys)})

    return sh.mapInPandas(sim, schema=schema)


def simhash_neardup_pairs_wide(df: DataFrame, max_hamming: int = 8,
                               text_col: str = "text", id_col: str = "doc_id",
                               n: int = 3) -> DataFrame:
    """Near-dup pairs by 128-bit SimHash for WIDE radii (max_hamming ≥ 4,
    where 64-bit single-block keys degenerate — see
    `simhash128_block_layout`): explode the C(B,2) combo keys, equi-join
    on the key (combo id is encoded in it, so one join serves all
    combos), verify with an exact two-word popcount. Complete for the
    radius by the pigeonhole argument. Returns (id_a, id_b, hamming)."""
    s = simhash128_keys(df, max_hamming, text_col, id_col, n) \
        .localCheckpoint(eager=True)  # Python stage runs once, not per branch
    keyed = s.select("id", "hi", "lo", F.explode("keys").alias("k"))
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (a.join(b, (F.col("a.k") == F.col("b.k")) &
                      (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.hi").alias("hi_a"), F.col("a.lo").alias("lo_a"),
                    F.col("b.hi").alias("hi_b"), F.col("b.lo").alias("lo_b"))
            .distinct())
    ham = (F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b"))) +
           F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))))
    return (cand.select("id_a", "id_b", ham.cast("int").alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
            .orderBy("id_a", "id_b"))


# ------------------------------------- exact substring (span) dedup

def _window_hits(df: DataFrame, tokens_col: str, id_col: str, min_len: int,
                 cross_doc_only: bool) -> DataFrame:
    """(id, pos, n_occ[, n_docs, canon]) for every length-`min_len`
    token window — ONE shuffle (a window function over the 8-byte
    xxhash64 key; no groupBy + join-back round trip). Docs shorter than
    `min_len` produce no windows."""
    from pyspark.sql.window import Window
    L = min_len
    n = F.size(F.col(tokens_col))
    keys = F.transform(
        F.sequence(F.lit(0), n - L),
        lambda i: F.xxhash64(F.slice(F.col(tokens_col), i + 1, L)))
    wins = (df.where(n >= L)
            .select(F.col(id_col).alias("id"),
                    F.posexplode(keys).alias("pos", "key")))
    wk = Window.partitionBy("key")
    wins = wins.withColumn("n_occ", F.count("*").over(wk))
    if cross_doc_only:
        wins = wins.withColumn(
            "n_docs", F.size(F.collect_set("id").over(wk)))
    return wins.withColumn(
        "canon", F.min(F.struct("id", "pos")).over(wk))


def _islands(hits: DataFrame, min_len: int) -> DataFrame:
    """Merge overlapping/adjacent duplicated window starts per doc into
    maximal spans (gaps-and-islands): consecutive positions share
    pos − row_number(). Returns (id, span_start, span_len, n_windows)."""
    from pyspark.sql.window import Window
    w = Window.partitionBy("id").orderBy("pos")
    return (hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
            .groupBy("id", "grp")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") - F.min("pos") + min_len).alias("span_len"),
                 F.count("*").alias("n_windows"))
            .drop("grp"))


def duplicate_spans(df: DataFrame, tokens_col: str = "tokens",
                    id_col: str = "doc_id", min_len: int = 16,
                    cross_doc_only: bool = False) -> DataFrame:
    """Exact substring dedup, detection half (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    MAXIMAL span of ≥ `min_len` consecutive tokens whose every
    `min_len`-window also occurs at some other (doc, position) —
    `cross_doc_only` restricts "other" to a DIFFERENT doc. Returns
    (doc_id, span_start, span_len, n_windows) ordered by doc, start.

    Spark shape (the suffix array of the paper is a single-machine
    structure; the distributed equivalent is window-hash grouping):
    window keys are 8-byte xxhash64 of the token slice, built per doc
    with transform+slice (no string materialization, no Python); ONE
    shuffle on the key marks duplicated windows via a count-over-window,
    one more on the doc id merges them into maximal spans — corpus
    token volume never amplifies beyond the ×1 window explosion."""
    hits = _window_hits(df, tokens_col, id_col, min_len, cross_doc_only)
    dup = F.col("n_docs") >= 2 if cross_doc_only else F.col("n_occ") >= 2
    spans = _islands(hits.where(dup).select("id", "pos"), min_len)
    return (spans.select(F.col("id").alias(id_col), "span_start",
                         "span_len", "n_windows")
            .orderBy(id_col, "span_start"))


def strip_duplicate_spans(df: DataFrame, tokens_col: str = "tokens",
                          id_col: str = "doc_id", min_len: int = 16
                          ) -> DataFrame:
    """Exact substring dedup, removal half: cut every token position
    covered by a duplicated `min_len`-window that is NOT its key's
    canonical occurrence (canonical = lexicographically-first
    (doc_id, pos), so exactly one copy of every duplicated substring
    survives, deterministically). Returns (doc_id, tokens, n_tok,
    n_deleted) for EVERY input doc — docs with nothing to cut (or
    shorter than `min_len`) pass through unchanged.

    A position covered by a non-canonical duplicated window is cut
    UNLESS it is also covered by some key's canonical window: without
    that protection a self-overlapping repeat (period < `min_len`, e.g.
    back-to-back boilerplate) would clip the canonical occurrence too
    and NO intact copy of the duplicated substring would survive.

    Same two-shuffle shape as `duplicate_spans`; the cut itself is a
    higher-order filter over the collected per-doc deletion/protection
    ranges (ranges per doc are few — they were merged maximal — so the
    broadcast-sized struct arrays ride the row)."""
    from pyspark.sql.window import Window
    hits = _window_hits(df, tokens_col, id_col, min_len,
                        cross_doc_only=False)
    # ONE pass computes both range kinds: duplicated window starts are
    # tagged canonical/not, islands run per (id, tag) — consecutive
    # starts of one tag merge, tags never merge across — and a single
    # groupBy(id) splits the ranges into the two per-doc lists
    # (collect_list drops the NULLs the other tag's `when` leaves)
    dup = (hits.where(F.col("n_occ") >= 2)
           .select("id", "pos",
                   (F.struct("id", "pos") == F.col("canon")).alias("_c")))
    w = Window.partitionBy("id", "_c").orderBy("pos")
    ranges = (dup.withColumn("grp", F.col("pos") - F.row_number().over(w))
              .groupBy("id", "_c", "grp")
              .agg(F.min("pos").alias("s"),
                   (F.max("pos") + min_len).alias("e")))
    rng = ranges.groupBy("id").agg(
        F.collect_list(F.when(~F.col("_c"), F.struct("s", "e"))).alias("_del"),
        F.collect_list(F.when(F.col("_c"), F.struct("s", "e"))).alias("_keep"))
    inrng = lambda col, i: F.exists(
        F.col(col), lambda r: (i >= r["s"]) & (i < r["e"]))
    cut = lambda i: inrng("_del", i) & ~inrng("_keep", i)
    kept = F.filter(F.col(tokens_col), lambda t, i: ~cut(i))
    base = df.select(F.col(id_col), F.col(tokens_col),
                     F.size(tokens_col).alias("_n0"))
    return (base.join(rng, base[id_col] == rng["id"], "left")
            .select(F.col(id_col), "_n0",
                    F.when(F.col("_del").isNull(), F.col(tokens_col))
                    .otherwise(kept).alias(tokens_col))
            .withColumn("n_tok", F.size(tokens_col))
            .select(id_col, tokens_col, "n_tok",
                    (F.col("_n0") - F.col("n_tok")).alias("n_deleted"))
            .orderBy(id_col))
