"""Structured Streaming sketch builds.

Two modes, mirroring the batch engine:

* `windowed_bucket_counts` — the Catalyst path: watermarked tumbling
  windows over an event-time column, grouped DDSketch bucket counts as a
  standard streaming aggregation (`groupBy(window, bucket).count()` is
  incrementally maintained by Spark's state store; quantile extraction
  happens at read time with `quantiles_from_bucket_counts`). No custom
  state, exactly-once under checkpointing — this is the form that runs
  on a 1000-executor streaming cluster unchanged.

* `ForeachBatchSketchWriter` — the sketch-object path: every micro-batch
  runs the same mapInArrow partial build as the batch engine and APPENDS
  partial-sketch rows to a parquet state directory keyed by epoch
  (exactly-once via epoch-id dedup on replay). The current global sketch
  is the merge of all rows — O(epochs × salt) tiny blobs.

The reference has no streaming at all (single-process simulator,
`/root/reference/main.cpp`); this is Spark-native gap-fill mandated by
the brief.
"""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from p2pddsketch_spark.functions.ddsql import ddsketch_key_col, gamma_of_alpha
from p2pddsketch_spark.operators.harness import (SketchSpec, build_partials,
                                                 merge_blobs, sketch_from_bytes)

__all__ = ["windowed_bucket_counts", "session_bucket_counts",
           "quantiles_from_bucket_counts", "ForeachBatchSketchWriter",
           "stateful_sketch_stream", "scoped_state_partitions"]


@contextmanager
def scoped_state_partitions(spark: SparkSession, n: int):
    """Scope `spark.sql.shuffle.partitions` around a stateful stream.

    For stateful Structured Streaming the shuffle-partition count is a
    CAPACITY decision, not a parallelism default: the first checkpoint
    commit pins it for the query's lifetime, and every micro-batch pays
    one state-store commit per partition per store instance (a
    stream-stream join keeps four stores per partition). Size it to the
    stream — a 1000-executor ingest wants thousands of state partitions;
    a small-SF gate or test wants a handful, or 32 idle stores burn more
    wall time in commit/maintenance than the data does. The session
    default is restored on exit, so surrounding batch plans are
    untouched. (Resuming a checkpointed query re-reads the pinned count;
    this scope only matters for the FIRST start.)"""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def windowed_bucket_counts(stream_df: DataFrame, value_col: str, ts_col: str,
                           alpha: float, window: str = "1 hour",
                           watermark: str = "2 hours",
                           offset: int = 1 << 30) -> DataFrame:
    """Streaming DDSketch state as a windowed aggregation: one row per
    (window, bucket key) with its count. Append/update-mode compatible;
    late data handled by the watermark."""
    v = F.col(value_col).cast("double")
    # parquet timestamps arrive as TIMESTAMP_NTZ; watermarks need TIMESTAMP
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    keyed = (stream_df
             .withWatermark(ts_col, watermark)
             .where(v.isNotNull() & ~F.isnan(v))
             .select(F.col(ts_col), ddsketch_key_col(v, alpha, offset).alias("bucket")))
    return (keyed.groupBy(F.window(ts_col, window).alias("win"), "bucket")
            .agg(F.count("*").alias("cnt")))


def session_bucket_counts(stream_df: DataFrame, value_col: str, ts_col: str,
                          key_col: str, alpha: float, gap: str = "30 minutes",
                          watermark: str = "2 hours",
                          offset: int = 1 << 30) -> DataFrame:
    """Streaming DDSketch state per SESSION: `F.session_window` merges
    events of one key separated by < `gap` into a dynamic window (Spark's
    state store handles window merging), and the sketch state is again
    plain (session, key, bucket) counts — the streaming twin of the batch
    gaps-and-islands `user_sessions` query, with quantiles per session
    extracted by `quantiles_from_bucket_counts(group_cols=("win", key))`
    at read time. Works identically on a batch DataFrame (used by the
    equivalence test)."""
    v = F.col(value_col).cast("double")
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if stream_df.isStreaming:
        stream_df = stream_df.withWatermark(ts_col, watermark)
    keyed = (stream_df
             .where(v.isNotNull() & ~F.isnan(v))
             .select(F.col(ts_col), F.col(key_col),
                     ddsketch_key_col(v, alpha, offset).alias("bucket")))
    return (keyed.groupBy(F.session_window(F.col(ts_col), gap).alias("win"),
                          key_col, "bucket")
            .agg(F.count("*").alias("cnt")))


def quantiles_from_bucket_counts(bucket_df: DataFrame, quantiles: list[float],
                                 alpha: float, group_cols: tuple[str, ...] = ("win",),
                                 offset: int = 1 << 30) -> DataFrame:
    """Batch-side quantile extraction from persisted (group, bucket, cnt)
    state — identical algebra to `ddsketch_quantile_plan`'s tail."""
    from pyspark.sql.window import Window
    from p2pddsketch_spark.functions.ddsql import ddsketch_estimate_col
    spark = bucket_df.sparkSession
    g = list(group_cols)
    w_cum = Window.partitionBy(*g).orderBy("bucket")
    w_all = Window.partitionBy(*g)
    cum = (bucket_df
           .withColumn("_cum", F.sum("cnt").over(w_cum))
           .withColumn("_n", F.sum("cnt").over(w_all)))
    qdf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    picked = (cum.join(F.broadcast(qdf),
                       F.col("_cum") > F.col("q") * (F.col("_n") - F.lit(1)).cast("double"))
              .groupBy(*g, "q")
              .agg(F.min("bucket").alias("_key"), F.first("_n").alias("n")))
    return (picked
            .withColumn("estimate", F.round(ddsketch_estimate_col(F.col("_key"), alpha, offset), 6))
            .select(*g, "q", "estimate", F.col("n").cast("long").alias("n"))
            .orderBy(*g, "q"))


def stateful_sketch_stream(stream_df: DataFrame, key_col: str, value_col: str,
                           alpha: float = 0.01, bin_limit: int = 1 << 20,
                           quantiles: tuple[float, ...] = (0.5, 0.95, 0.99)):
    """Custom stateful streaming operator via `applyInPandasWithState`:
    one DDSketch per key lives in the state store (canonical bytes), is
    updated vectorized per micro-batch, and emits current quantile
    estimates each trigger. This is the Spark-native form of the
    reference's per-peer incremental sketch (`distributedAdd`,
    `/root/reference/main.cpp:432-472`) — the state store replaces the
    peer array, triggers replace gossip rounds.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout
    from p2pddsketch_spark.sketches.ddsketch import DDSketch

    out_schema = (f"{key_col} string, n long, " +
                  ", ".join(f"p{str(q)[2:]} double" for q in quantiles))
    state_schema = "sketch binary"

    def update(key, pdfs, state):
        if state.exists:
            sk = DDSketch.from_bytes(bytes(state.get[0]))
        else:
            sk = DDSketch(alpha=alpha, bin_limit=bin_limit)
        for pdf in pdfs:
            sk.update_batch(pdf[value_col].to_numpy(dtype=np.float64))
        state.update((sk.to_bytes(),))
        row = {key_col: key[0], "n": sk.n}
        for q in quantiles:
            row[f"p{str(q)[2:]}"] = float(sk.quantile(q)) if sk.n else None
        yield pd.DataFrame([row])

    return (stream_df.groupBy(key_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


class ForeachBatchSketchWriter:
    """foreachBatch sink: per micro-batch partial-sketch build appended to
    a parquet state dir; idempotent on epoch replay (exactly-once)."""

    def __init__(self, specs: list[SketchSpec], state_dir: str,
                 group_cols: tuple[str, ...] = (), salt_buckets: int = 8) -> None:
        self.specs = specs
        self.state_dir = state_dir
        self.group_cols = group_cols
        self.salt_buckets = salt_buckets

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        partials = build_partials(batch_df, self.specs, self.group_cols,
                                  self.salt_buckets)
        (partials.withColumn("epoch", F.lit(int(epoch_id)))
         .write.mode("overwrite")
         .parquet(f"{self.state_dir}/epoch={epoch_id}"))

    # ------------------------------------------------------------- queries

    def current_sketches(self, spark: SparkSession) -> dict:
        """Merge all persisted partials into the current global sketches."""
        from p2pddsketch_spark.operators.harness import EMPTY_MARKER
        df = spark.read.option("basePath", self.state_dir).parquet(self.state_dir)
        rows = df.select(*self.group_cols, "sketch_name", "sketch").collect()
        grouped: dict = {}
        for r in rows:
            if r["sketch_name"] == EMPTY_MARKER:  # zero-row micro-batch partition
                continue
            key = tuple(r[c] for c in self.group_cols) + (r["sketch_name"],)
            grouped.setdefault(key, []).append(bytes(r["sketch"]))
        out = {}
        for key, blobs in grouped.items():
            merged = merge_blobs(blobs)
            out[key if len(key) > 1 else key[0]] = sketch_from_bytes(merged)
        return out


def stream_interval_join(left: DataFrame, right: DataFrame, key: str,
                         left_ts: str, right_ts: str,
                         max_lag: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Stream-stream inner equi-join with an event-time range condition:
    match right rows within (left_ts − max_lag, left_ts]. Watermarks on
    BOTH sides bound the state store — without the range condition and
    both watermarks, Structured Streaming would have to retain every
    past row forever. Columns from both sides pass through (right's key
    column dropped)."""
    l = (left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
         .withWatermark(left_ts, watermark))
    r = (right.withColumnRenamed(key, "_rkey")
         .withColumn(right_ts, F.col(right_ts).cast("timestamp"))
         .withWatermark(right_ts, watermark))
    cond = ((F.col(key) == F.col("_rkey")) &
            (F.col(right_ts) <= F.col(left_ts)) &
            (F.col(right_ts) > F.col(left_ts) - F.expr(f"INTERVAL {max_lag}")))
    return l.join(r, cond, "inner").drop("_rkey")
