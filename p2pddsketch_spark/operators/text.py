"""Text-analysis operators for training-data pipelines — all hot paths
are built-in `pyspark.sql.functions` (whole-stage codegen); Python
appears only in the vectorized rolling-hash fingerprint.

Not in the reference (it has no string processing at all — SURVEY.md §2
"what the reference does NOT implement"); mandated as first-class
components of the graft brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["words_col", "doc_stats", "top_tokens", "distinct_tokens_by",
           "language_id_col", "fingerprint_md5_col", "rolling_fingerprint",
           "quality_score", "bm25_topk", "repetition_stats",
           "bigram_surprisal", "redact_pii", "PII_PATTERNS",
           "source_kl_divergence"]

STOPWORDS = ("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

# Deterministic language markers (language_id heuristic). The fixture
# corpus is synthetic; the heuristic is the *operator* under test, and
# its SQL twin makes it oracle-checkable.
_DE = ("der", "die", "das", "und", "nicht")
_FR = ("le", "la", "les", "et", "est")


def words_col(text: Column | str) -> Column:
    """Whitespace tokenization (single-space corpus → exact SQL parity)."""
    return F.split(text, " ")


def doc_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics: token count (whitespace), character
    count, average word length, stopword ratio, distinct-token ratio."""
    words = words_col(text_col)
    n_words = F.size(words).cast("long")
    n_chars = F.length(text_col).cast("long")
    distinct_words = F.size(F.array_distinct(words)).cast("long")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w))).cast("long")
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_chars.alias("n_chars_computed"),
        F.round((n_chars - n_words + 1).cast("double") / n_words.cast("double"), 6).alias("avg_word_len"),
        F.round(n_stop.cast("double") / n_words.cast("double"), 6).alias("stopword_ratio"),
        F.round(distinct_words.cast("double") / n_words.cast("double"), 6).alias("distinct_ratio"),
    )


def repetition_stats(df: DataFrame, n: int = 3, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Repetition quality signal: per doc, the share of word n-gram
    OCCURRENCES taken by the single most-repeated n-gram (template spam
    and boilerplate score near 1; natural text near 1/n_grams). Unlike
    the dedup shingles these grams are NOT deduped — counts are the
    signal. Docs with < n words score 0. All JVM: explode →
    per-(doc, gram) count → per-doc max/total — two partial-aggregated
    exchanges on the doc key."""
    words = words_col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - F.lit(n - 1), F.lit(1)))
    grams = F.when(F.size(words) >= n,
                   F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))) \
             .otherwise(F.array().cast("array<string>"))
    ex = df.select(F.col(id_col), F.explode(grams).alias("g"))
    per_gram = ex.groupBy(id_col, "g").agg(F.count("*").alias("c"))
    per_doc = (per_gram.groupBy(id_col)
               .agg(F.max("c").alias("max_gram_count"),
                    F.sum("c").alias("n_grams")))
    return (df.select(id_col).join(per_doc, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
                    F.coalesce("max_gram_count", F.lit(0)).cast("long").alias("max_gram_count"),
                    F.coalesce(F.round(F.col("max_gram_count").cast("double") /
                                       F.col("n_grams").cast("double"), 6),
                               F.lit(0.0)).alias("rep_score"))
            .orderBy(id_col))


# PII patterns restricted to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}",
    "ip": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def redact_pii(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """PII scrubbing for training corpora: replace emails / phone
    numbers / IPv4 literals with typed placeholder tokens and count the
    hits per document (counts taken on the ORIGINAL text, before any
    replacement). Pure `regexp_replace`/`regexp_count` built-ins —
    whole-stage codegen, a narrow map at any scale."""
    txt = F.col(text_col)
    counts = [F.regexp_count(txt, F.lit(p)).alias(f"n_{name}")
              for name, p in PII_PATTERNS.items()]
    red = txt
    for name, p in PII_PATTERNS.items():
        red = F.regexp_replace(red, p, f"[{name.upper()}]")
    return df.select(F.col(id_col), red.alias("redacted"), *counts)


def bigram_surprisal(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", rare_threshold: int = 3) -> DataFrame:
    """Corpus-LM quality scoring: train bigram frequencies over the whole
    corpus in one aggregation, then score every document by (a) its
    rare-bigram ratio (share of bigrams seen < `rare_threshold` times
    corpus-wide — gibberish/OCR noise scores high) and (b) its total
    self-information  Σ −ln(cf/total)/ln 2  in bits (unigram-free
    pointwise surprisal). The classic n-gram-LM filter of large-scale
    training-data curation, expressed as two hash aggregations and one
    equi-join — no Python anywhere.

    Float-parity discipline: each bigram's surprisal is rounded to 6
    decimals and summed as DECIMAL(20,6) (exact, associative — immune
    to shuffle order), and the log is written as ln(x)/ln(2) on both
    engines so libm evaluates the identical expression. Docs with < 2
    words have no bigrams and drop out (both engines).

    100 TB: the corpus-frequency table aggregates with map-side combine
    on the bigram key; the score join shuffles (bigram, doc_id) pairs
    only. Hot bigrams (stopword pairs) are the skew risk — AQE skew-join
    handles the join; the aggregation is a plain combine-reduce.
    """
    words = words_col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - F.lit(1), F.lit(1)))
    grams = F.when(F.size(words) >= 2,
                   F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, 2)))) \
             .otherwise(F.array().cast("array<string>"))
    ex = df.select(F.col(id_col), F.explode(grams).alias("bg"))
    corpus = ex.groupBy("bg").agg(F.count("*").alias("cf"))
    total = corpus.agg(F.sum("cf").cast("double").alias("tot"))
    scored = (ex.join(corpus, "bg")
              .crossJoin(F.broadcast(total))
              .select(F.col(id_col), F.col("cf"),
                      F.round(-F.log(F.col("cf").cast("double") / F.col("tot")) /
                              F.log(F.lit(2.0)), 6)
                      .cast("decimal(20,6)").alias("surp")))
    return (scored.groupBy(id_col)
            .agg(F.count("*").alias("n_bigrams"),
                 F.count(F.when(F.col("cf") < rare_threshold, 1)).alias("n_rare"),
                 F.sum("surp").alias("_surp_sum"))
            .select(F.col(id_col),
                    F.col("n_bigrams"),
                    F.col("n_rare"),
                    F.round(F.col("n_rare").cast("double") /
                            F.col("n_bigrams").cast("double"), 6).alias("rare_ratio"),
                    F.col("_surp_sum").cast("double").alias("surprisal"))
            .orderBy(id_col))


def source_kl_divergence(df: DataFrame, text_col: str = "text",
                         source_col: str = "source") -> DataFrame:
    """Per-source token-distribution divergence from the whole corpus:
    KL(P_source ‖ P_corpus) in bits over whitespace unigrams — the
    distributional complement of the theta set-overlap view, and a
    standard mixture-curation signal (which source least resembles the
    blend it feeds). Every source token occurs in the corpus
    distribution by construction, so no smoothing is needed and the
    value is exact. Output: (source, n_tok, n_types, kl_bits).

    Float-parity discipline (`bigram_surprisal`'s): each token's
    contribution (c_s/n_s)·ln((c_s·n)/(n_s·c))/ln 2 is rounded to 6
    decimals and summed as DECIMAL(20,6) — exact and associative, so the
    result is shuffle-order-free and the DuckDB twin replays the same
    libm expression verbatim.

    100 TB: two hash aggregations with map-side combine (per-(source,
    token), then per-token) and one join keyed on token — hot stopword
    keys are the skew risk, which AQE skew-join splits; the per-source
    totals and the 1-row corpus total ride broadcasts. The fact table
    shuffles once, as (source, token) partial counts. No Python."""
    w = df.select(F.col(source_col).alias("source"),
                  F.explode(words_col(text_col)).alias("t"))
    per = w.groupBy("source", "t").agg(F.count("*").alias("c_s"))
    ns = per.groupBy("source").agg(F.sum("c_s").alias("n_s"),
                                   F.count("*").alias("n_types"))
    corpus = per.groupBy("t").agg(F.sum("c_s").alias("c"))
    tot = corpus.agg(F.sum("c").alias("n"))
    term = F.round(
        (F.col("c_s").cast("double") / F.col("n_s").cast("double"))
        * F.log((F.col("c_s").cast("double") * F.col("n").cast("double"))
                / (F.col("n_s").cast("double") * F.col("c").cast("double")))
        / F.log(F.lit(2.0)), 6).cast("decimal(20,6)")
    kl = (per.join(corpus, "t")
          .join(F.broadcast(ns.select("source", "n_s")), "source")
          .crossJoin(F.broadcast(tot))
          .select("source", term.alias("term"))
          .groupBy("source").agg(F.sum("term").alias("kl")))
    return (ns.join(kl, "source")
            .select("source",
                    F.col("n_s").cast("long").alias("n_tok"),
                    F.col("n_types").cast("long").alias("n_types"),
                    F.round(F.col("kl").cast("double"), 6).alias("kl_bits"))
            .orderBy("source"))


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality score in [0,1]: favors mid-length docs with
    healthy stopword presence and lexical diversity."""
    s = doc_stats(df, text_col, id_col)
    length_term = F.least(F.col("n_words").cast("double") / F.lit(64.0), F.lit(1.0))
    stop_term = F.least(F.col("stopword_ratio") * F.lit(5.0), F.lit(1.0))
    div_term = F.col("distinct_ratio")
    return s.select(
        id_col, "n_words",
        F.round((length_term + stop_term + div_term) / F.lit(3.0), 6).alias("quality"),
    )


def top_tokens(df: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Exact heavy hitters over whitespace tokens (the CMS oracle).

    groupBy(token) has map-side partial aggregation: at 100 TB only
    (token, partial-count) pairs shuffle, bounded by vocab size."""
    return (df.select(F.explode(words_col(text_col)).alias("token"))
            .groupBy("token").agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), "token")
            .limit(k))


def distinct_tokens_by(df: DataFrame, group_col: str, text_col: str = "text") -> DataFrame:
    """Exact per-group distinct-token counts (the HLL oracle)."""
    return (df.select(group_col, F.explode(words_col(text_col)).alias("token"))
            .groupBy(group_col)
            .agg(F.countDistinct("token").alias("n_distinct"))
            .orderBy(group_col))


def language_id_col(text_col: Column | str = "text") -> Column:
    """n-gram/marker-word language-ID heuristic (deterministic, SQL-twin)."""
    words = words_col(text_col)
    de_arr = F.array(*[F.lit(w) for w in _DE])
    fr_arr = F.array(*[F.lit(w) for w in _FR])
    n_de = F.size(F.filter(words, lambda w: F.array_contains(de_arr, w)))
    n_fr = F.size(F.filter(words, lambda w: F.array_contains(fr_arr, w)))
    return (F.when((n_de > n_fr) & (n_de > 0), F.lit("de"))
            .when(n_fr > 0, F.lit("fr"))
            .otherwise(F.lit("en")))


def fingerprint_md5_col(text_col: Column | str = "text") -> Column:
    """Content fingerprint for exact dedup (md5 — SQL-portable)."""
    return F.md5(text_col)


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BM25 ranked retrieval (Robertson/Spärck Jones), all built-in
    functions: term frequencies from one explode+filter of the corpus,
    document frequencies as a broadcast per-term aggregate, the classic
    idf = ln(1 + (N − df + 0.5)/(df + 0.5)) and tf saturation with
    length normalization. At scale the only corpus-wide shuffle is the
    (doc, term) tf aggregation — df/N/avgdl are term-count-sized and
    broadcast. Returns (doc_id, score, rank) of the top k, ties broken
    by doc id. SQL-expressible end to end (DuckDB twin in
    plans/oracles.py).
    """
    words = words_col(text_col)
    terms = F.array(*[F.lit(t) for t in query_terms])
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.size(words).cast("double").alias("dl"),
                     F.filter(words, lambda w: F.array_contains(terms, w)).alias("hits"))
    stats = base.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = (base.where(F.size("hits") > 0)
          .select("doc_id", "dl", F.explode("hits").alias("term"))
          .groupBy("doc_id", "dl", "term").agg(F.count("*").cast("double").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df_"))
    scored = (tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df_") + F.lit(0.5)) /
                (F.col("df_") + F.lit(0.5)))
    tf_term = (F.col("tf") * (k1 + 1.0)) / \
              (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    per_doc = (scored.withColumn("part", idf * tf_term)
               .groupBy("doc_id").agg(F.round(F.sum("part"), 6).alias("score")))
    from pyspark.sql.window import Window
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (per_doc.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("doc_id", "score", "rank")
            .orderBy("rank"))


_POLY_BASE = np.uint64(1000003)
_ROLL_SEED = np.uint64(0xCBF29CE484222325)


def rolling_fingerprint(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """64-bit polynomial rolling hash over UTF-8 bytes, vectorized per
    Arrow batch (numpy Horner scheme over a padded byte matrix — no
    per-row Python loops over characters).
    """
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([
        StructField(id_col, df.schema[id_col].dataType, True),
        StructField("fingerprint", LongType(), True),
    ])

    def fp(batches):
        for pdf in batches:
            texts = pdf[text_col].fillna("").to_numpy(dtype=object)
            if len(texts) == 0:
                continue
            enc = [t.encode("utf-8") for t in texts]
            maxlen = max((len(b) for b in enc), default=0)
            mat = np.zeros((len(enc), maxlen), dtype=np.uint64)
            lens = np.array([len(b) for b in enc])
            buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
            offs = np.zeros(len(enc) + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            for i in range(len(enc)):  # row fill; Horner itself is columnar
                mat[i, :lens[i]] = buf[offs[i]:offs[i + 1]]
            acc = np.full(len(enc), _ROLL_SEED, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(maxlen):
                    live = j < lens
                    acc = np.where(live, acc * _POLY_BASE + mat[:, j], acc)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "fingerprint": acc.astype(np.int64)})

    return df.select(id_col, text_col).mapInPandas(fp, schema=schema)
