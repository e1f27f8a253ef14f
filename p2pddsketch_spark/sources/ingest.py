"""Ingest external corpus drops into the canonical sequences schema.

The engine's input contract is one table shape (BASELINE input_hint):
`(doc_id string, tokens array<int>, n_tok int, source string)`. Upstream
corpus drops arrive as parquet, JSONL, or CSV; this module normalizes
all three into that shape with an EXPLICIT schema — schema inference is
never used (at 10^12 rows an inference pass is a full extra scan, and a
single malformed row can silently widen a column type). Reference
analog: `loadDataset` (/root/reference/main.cpp:660-795) reads the
simulator's fixed-layout input; here the fixed layout is the schema.

Format notes:
* JSONL carries `tokens` natively as a JSON array.
* CSV has no array type — `tokens` is a space-joined string column that
  is split and cast JVM-side (`transform(split(...), int)`), keeping the
  parse inside whole-stage codegen. An empty string means zero tokens.
* `mode="FAILFAST"` on both text formats: a malformed row fails the job
  loudly instead of becoming a silent NULL row (PERMISSIVE's default),
  matching the library's determinism discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["SEQUENCES_SCHEMA", "DOCUMENTS_SCHEMA", "read_sequences",
           "read_documents", "validate_sequences"]

SEQUENCES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
    T.StructField("n_tok", T.IntegerType(), True),
    T.StructField("source", T.StringType(), True),
])

# CSV carries tokens as a space-joined string (no array type in CSV)
_CSV_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.StringType(), True),
    T.StructField("n_tok", T.IntegerType(), True),
    T.StructField("source", T.StringType(), True),
])


def read_sequences(spark: SparkSession, path: str,
                   fmt: str = "parquet") -> DataFrame:
    """Read a sequences table from `path` in `fmt` ('parquet', 'orc',
    'jsonl', 'csv') into the canonical shape (doc_id conformed to
    string). n_tok is recomputed from the parsed array when absent
    (NULL), and a present-but-inconsistent n_tok is NOT silently
    fixed — validate_sequences() is the loud check."""
    if fmt in ("parquet", "orc"):
        # self-describing formats carry their schema in the footer (no
        # inference scan); CONFORM to the canonical types by cast so a
        # pipeline-produced table with doc_id:int64 (the testdata
        # documents key passes through prepare_sequences) reads cleanly
        # — a missing column still fails loudly at analysis
        raw = (spark.read.parquet(path) if fmt == "parquet"
               else spark.read.orc(path))
        df = raw.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col("tokens").cast("array<int>").alias("tokens"),
            F.col("n_tok").cast("int").alias("n_tok"),
            F.col("source").cast("string").alias("source"))
    elif fmt == "jsonl":
        df = (spark.read.schema(SEQUENCES_SCHEMA)
              .option("mode", "FAILFAST").json(path))
    elif fmt == "csv":
        raw = (spark.read.schema(_CSV_SCHEMA)
               .option("header", "true").option("mode", "FAILFAST")
               .option("escape", '"')      # RFC-4180 doubled quotes,
               .csv(path))                 # same as read_documents
        # CSV cannot distinguish an empty cell from NULL (the reader maps
        # "" to NULL); by convention an empty/NULL tokens cell means ZERO
        # tokens — use JSONL when NULL-vs-empty matters
        toks = F.when(
            F.col("tokens").isNull() | (F.length("tokens") == 0),
            F.array().cast("array<int>")
        ).otherwise(F.transform(F.split("tokens", " "),
                                lambda s: s.cast("int")))
        df = raw.select("doc_id", toks.alias("tokens"), "n_tok", "source")
    else:
        from p2pddsketch_spark.errors import ParamError
        raise ParamError(f"unknown sequences format {fmt!r} "
                         "(parquet | orc | jsonl | csv)")
    # size(NULL) is -1 under legacy sizeOfNull configs — gate on
    # isNotNull so NULL tokens keeps n_tok NULL on every engine config
    return df.withColumn(
        "n_tok", F.coalesce(
            F.col("n_tok"),
            F.when(F.col("tokens").isNotNull(),
                   F.size("tokens").cast("int"))))


def validate_sequences(df: DataFrame) -> dict:
    """One-pass ingest audit: row count, NULL doc_ids, rows whose n_tok
    disagrees with size(tokens), rows with INVALID token ids (< -1 —
    the -1 OOV sentinel `tokenize` emits is sanctioned and reported
    separately as informational `oov_rows`). Returns plain counts — the
    caller decides whether to fail; a 100 TB ingest wants the numbers,
    not an exception per row."""
    bad_len = (F.col("n_tok") != F.size("tokens")).cast("long")
    invalid = F.exists("tokens", lambda t: t < -1).cast("long")
    oov = F.exists("tokens", lambda t: t == -1).cast("long")
    row = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("doc_id").isNull().cast("long")).alias("null_doc_id"),
        F.sum(F.coalesce(bad_len, F.lit(1))).alias("n_tok_mismatch"),
        F.sum(F.coalesce(invalid, F.lit(0))).alias("invalid_token_rows"),
        F.sum(F.coalesce(oov, F.lit(0))).alias("oov_rows"),
    ).first()
    return {k: int(row[k] or 0) for k in
            ("rows", "null_doc_id", "n_tok_mismatch", "invalid_token_rows",
             "oov_rows")}


DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
])


def read_documents(spark: SparkSession, path: str,
                   fmt: str = "parquet") -> DataFrame:
    """Read a raw-text documents table from `path` in `fmt` ('parquet',
    'orc', 'jsonl', 'csv') with the canonical (doc_id, text, source) schema —
    the upstream shape of `jobs/prepare_sequences.py` and the curate
    pipeline. Same discipline as `read_sequences`: explicit schema,
    FAILFAST. CSV text must be single-line and properly quoted (the
    reader is configured splittable — no multiLine — because a 100 TB
    drop needs per-split parallelism; use JSONL for text with
    newlines)."""
    if fmt == "parquet":
        return spark.read.schema(DOCUMENTS_SCHEMA).parquet(path)
    if fmt == "orc":
        return spark.read.schema(DOCUMENTS_SCHEMA).orc(path)
    if fmt == "jsonl":
        return (spark.read.schema(DOCUMENTS_SCHEMA)
                .option("mode", "FAILFAST").json(path))
    if fmt == "csv":
        return (spark.read.schema(DOCUMENTS_SCHEMA)
                .option("header", "true").option("mode", "FAILFAST")
                .option("escape", '"').csv(path))
    from p2pddsketch_spark.errors import ParamError
    raise ParamError(f"unknown documents format {fmt!r} "
                     "(parquet | orc | jsonl | csv)")
