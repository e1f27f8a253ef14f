"""DDSketch quantiles as a pure Catalyst plan — no Python on the hot path.

The sketch's bucket algebra (`/root/reference/ddsketch.cc:84-127`,
`:520-557`) is just: key = ceil(ln v / ln γ) (± sign/offset handling),
counts per key, cumulative scan in key order, pick the first bucket whose
cumulative count exceeds q·(n−1), estimate x̂ = 2γ^k/(γ+1). Every step is
expressible with built-in `pyspark.sql.functions`, so for *batch* quantile
queries the whole sketch runs inside whole-stage codegen:

  scan (column-pruned, filter-pushed) → partial groupBy(key) count
  (map-side combine: at most `bins` rows leave each executor) → tiny
  window cumsum → broadcast-joined quantile probes.

At 100 TB this shuffles only ~thousands of (key, count) rows per group —
the same "only sketches cross the wire" property as the mapInArrow
harness, with zero serialization overhead. The harness remains the path
for incremental/streaming/checkpointed builds where a persistent sketch
*object* is needed.

`duckdb_quantile_sql` emits the equivalent ANSI SQL so the two stay in
lockstep for oracle verification (estimates rounded to 6 decimals on
both sides to absorb 1-ulp libm differences between engines).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["gamma_of_alpha", "ddsketch_key_col", "ddsketch_estimate_col",
           "ddsketch_quantile_plan", "duckdb_quantile_sql"]


def gamma_of_alpha(alpha: float) -> tuple[float, float]:
    gamma = (1.0 + alpha) / (1.0 - alpha)
    return gamma, math.log(gamma)


def ddsketch_key_col(value: Column, alpha: float, offset: int = 1 << 30) -> Column:
    """Signed bucket key (reference `DDS_GetKey`, `ddsketch.cc:84-104`)."""
    _, lng = gamma_of_alpha(alpha)
    pos = F.ceil(F.log(value) / F.lit(lng)).cast("long") + F.lit(offset)
    neg = -(F.ceil(F.log(-value) / F.lit(lng)).cast("long") + F.lit(offset))
    return F.when(value > 0, pos).when(value < 0, neg).otherwise(F.lit(0).cast("long"))


def ddsketch_estimate_col(key: Column, alpha: float, offset: int = 1 << 30) -> Column:
    """Rank estimator x̂ (reference `DDS_GetRank`, `ddsketch.cc:106-127`)."""
    gamma, _ = gamma_of_alpha(alpha)
    pos = F.lit(2.0) * F.pow(F.lit(gamma), (key - F.lit(offset)).cast("double")) / F.lit(gamma + 1.0)
    neg = F.lit(-2.0) * F.pow(F.lit(gamma), (-key - F.lit(offset)).cast("double")) / F.lit(gamma + 1.0)
    return F.when(key > 0, pos).when(key < 0, neg).otherwise(F.lit(0.0))


def ddsketch_quantile_plan(df: DataFrame, value_col: str, quantiles: list[float],
                           alpha: float, group_cols: tuple[str, ...] = (),
                           offset: int = 1 << 30) -> DataFrame:
    """Distributed DDSketch quantiles entirely in Catalyst.

    Output: group_cols..., q (double), bucket_key (long, offset-stripped
    unsigned index for positive buckets — matches the SQL oracle),
    estimate (double, rounded 6), n (long).
    """
    spark = df.sparkSession
    g = list(group_cols)
    v = F.col(value_col).cast("double")
    keyed = (df
             .where(v.isNotNull() & ~F.isnan(v))
             .select(*g, ddsketch_key_col(v, alpha, offset).alias("_key")))
    counts = keyed.groupBy(*g, "_key").agg(F.count("*").alias("_cnt"))
    w_cum = Window.partitionBy(*[F.col(c) for c in g]).orderBy("_key")
    w_all = Window.partitionBy(*[F.col(c) for c in g])
    cum = (counts
           .withColumn("_cum", F.sum("_cnt").over(w_cum))
           .withColumn("_n", F.sum("_cnt").over(w_all)))
    qdf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    picked = (cum.join(F.broadcast(qdf),
                       F.col("_cum") > F.col("q") * (F.col("_n") - F.lit(1)).cast("double"))
              .groupBy(*g, "q")
              .agg(F.min("_key").alias("_key"), F.first("_n").alias("n")))
    unsigned = (F.when(F.col("_key") > 0, F.col("_key") - F.lit(offset))
                .when(F.col("_key") < 0, F.col("_key") + F.lit(offset))
                .otherwise(F.lit(0)))
    return (picked
            .withColumn("estimate", F.round(ddsketch_estimate_col(F.col("_key"), alpha, offset), 6))
            .withColumn("bucket_key", unsigned.cast("long"))
            .select(*g, "q", "bucket_key", "estimate", F.col("n").cast("long").alias("n"))
            .orderBy(*g, "q"))


def ddsketch_rank_plan(df: DataFrame, value_col: str, alpha: float,
                       id_cols: tuple[str, ...] = ("event_id",),
                       group_cols: tuple[str, ...] = (),
                       offset: int = 1 << 30) -> DataFrame:
    """Percentile-rank ENRICHMENT: annotate every row with its estimated
    percentile (fraction of rows in buckets with key ≤ its key) from the
    DDSketch over `value_col` — per `group_cols` cohort when given,
    global otherwise. The inverse query of `ddsketch_quantile_plan`, as
    one Catalyst plan.

    Scale shape: the fact table is scanned once to key rows; the bucket
    table (groups × ≤ a few thousand buckets) aggregates with map-side
    combine, takes one window for the cumsum (partitioned by group —
    single-partition only in the global case, tiny by construction
    either way), and broadcast-joins back onto the fact rows — no
    shuffle of the fact table at all beyond the bucket aggregation."""
    g = list(group_cols)
    v = F.col(value_col).cast("double")
    keyed = (df.where(v.isNotNull() & ~F.isnan(v))
             .select(*id_cols, *g, ddsketch_key_col(v, alpha, offset).alias("_key")))
    buckets = keyed.groupBy(*g, "_key").agg(F.count("*").alias("_cnt"))
    w_cum = Window.partitionBy(*[F.col(c) for c in g]).orderBy("_key")
    w_all = Window.partitionBy(*[F.col(c) for c in g])
    cum = (buckets.withColumn("_cum", F.sum("_cnt").over(w_cum))
           .withColumn("_n", F.sum("_cnt").over(w_all)))
    return (keyed.join(F.broadcast(cum), g + ["_key"])
            .select(*id_cols, *g,
                    F.round(F.col("_cum").cast("double") / F.col("_n").cast("double"), 6)
                    .alias("pct_rank"))
            .orderBy(*id_cols))


def duckdb_rank_sql(table: str, value_col: str, alpha: float,
                    id_cols: tuple[str, ...] = ("event_id",),
                    group_cols: tuple[str, ...] = (),
                    where: str = "") -> str:
    """ANSI-SQL twin of `ddsketch_rank_plan` (positive values, like
    `duckdb_quantile_sql`). `where` filters the OUTPUT rows only — the
    rank is always computed over the whole table."""
    _, lng = gamma_of_alpha(alpha)
    ids = ", ".join(id_cols)
    g = ", ".join(group_cols)
    gc = g + ", " if g else ""
    part = f"PARTITION BY {g} " if g else ""
    wc = f"WHERE {where}" if where else ""
    return f"""
WITH keyed AS (
  SELECT {ids}, {gc}
         CAST(ceil(ln(CAST({value_col} AS DOUBLE)) / {lng!r}) AS BIGINT) AS bucket
  FROM {table} WHERE {value_col} IS NOT NULL
), buckets AS (
  SELECT {gc}bucket, COUNT(*) AS cnt FROM keyed GROUP BY {gc}bucket
), cum AS (
  SELECT {gc}bucket, SUM(cnt) OVER ({part}ORDER BY bucket) AS cum_cnt,
         SUM(cnt) OVER ({part.rstrip() if g else ''}) AS n
  FROM buckets
)
SELECT {ids}, {gc}ROUND(CAST(cum_cnt AS DOUBLE) / n, 6) AS pct_rank
FROM keyed JOIN cum USING ({gc.rstrip(', ') + ', ' if g else ''}bucket)
{wc}
ORDER BY {ids}
"""


def ddsketch_rollup_quantile_plan(df: DataFrame, value_col: str, ts_col: str,
                                  quantiles: list[float], alpha: float,
                                  offset: int = 1 << 30) -> DataFrame:
    """Hypertable-style continuous-aggregate ROLLUP: materialize the
    FINE grain once (hourly (bucket, count) state — what the streaming
    windowed aggregation maintains), then derive the COARSE grain (daily
    quantiles) purely by re-aggregating that state. sum-by-(day, bucket)
    of hourly counts is EXACTLY the daily bucket histogram, so the
    coarse answer is identical to scanning raw data — at 100 TB the raw
    table is touched once per fine window ever, and every rollup after
    that reads counts bounded by (windows × buckets). Output schema ==
    `ddsketch_quantile_plan` with a `day_bucket` group column."""
    spark = df.sparkSession
    v = F.col(value_col).cast("double")
    hour_bucket = F.date_format(F.date_trunc("hour", F.col(ts_col)),
                                "yyyy-MM-dd HH:00:00")
    # fine grain (the persisted hypertable state)
    hourly = (df.where(v.isNotNull() & ~F.isnan(v))
              .select(hour_bucket.alias("hour_bucket"),
                      ddsketch_key_col(v, alpha, offset).alias("_key"))
              .groupBy("hour_bucket", "_key").agg(F.count("*").alias("_cnt")))
    # coarse grain derives from fine state only — no raw-data access
    daily = (hourly.withColumn("day_bucket", F.substring("hour_bucket", 1, 10))
             .groupBy("day_bucket", "_key").agg(F.sum("_cnt").alias("_cnt")))
    w_cum = Window.partitionBy("day_bucket").orderBy("_key")
    w_all = Window.partitionBy("day_bucket")
    cum = (daily.withColumn("_cum", F.sum("_cnt").over(w_cum))
           .withColumn("_n", F.sum("_cnt").over(w_all)))
    qdf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    picked = (cum.join(F.broadcast(qdf),
                       F.col("_cum") > F.col("q") * (F.col("_n") - F.lit(1)).cast("double"))
              .groupBy("day_bucket", "q")
              .agg(F.min("_key").alias("_key"), F.first("_n").alias("n")))
    unsigned = (F.when(F.col("_key") > 0, F.col("_key") - F.lit(offset))
                .when(F.col("_key") < 0, F.col("_key") + F.lit(offset))
                .otherwise(F.lit(0)))
    return (picked
            .withColumn("estimate", F.round(ddsketch_estimate_col(F.col("_key"), alpha, offset), 6))
            .withColumn("bucket_key", unsigned.cast("long"))
            .select("day_bucket", "q", "bucket_key", "estimate",
                    F.col("n").cast("long").alias("n"))
            .orderBy("day_bucket", "q"))


def ddsketch_decayed_quantile_plan(df: DataFrame, value_col: str, ts_col: str,
                                   quantiles: list[float], alpha: float,
                                   half_life_hours: float = 24.0,
                                   t0: str = "2024-01-01 00:00:00",
                                   offset: int = 1 << 30) -> DataFrame:
    """Exponentially TIME-DECAYED quantiles as one Catalyst plan: each
    row carries absolute weight 2^((t − t0)/half_life) — newer rows
    weigh more; relative weights between two rows depend only on their
    timestamp gap, so the choice of epoch t0 cancels. Absolute weights
    make the aggregation a plain weighted sum (fully order-invariant, no
    decay-at-merge bookkeeping), and the quantile scan runs on weighted
    cumulative bucket mass: the decayed p95 answers "p95 of the recent
    regime" while old data fades smoothly instead of falling off a
    window cliff.

    Numerics: exponents are bounded by the data's time span / half-life
    (the fixture spans 30 days → 2^0..2^30 at 24 h), well inside float64;
    pick half_life so span/half_life stays small when w_total parity
    matters. Assumes a fixed-offset session timezone (the UTC default) —
    the NTZ→timestamp casts shift both operands equally then.
    Output: (q, bucket_key, estimate, w_total rounded) per quantile."""
    spark = df.sparkSession
    v = F.col(value_col).cast("double")
    # tz-free: NTZ timestamp difference in seconds against a literal epoch.
    # cast-to-double keeps MICROSECONDS (unix_timestamp truncates to whole
    # seconds and would diverge from DuckDB's fractional epoch())
    dt_hours = (F.col(ts_col).cast("timestamp").cast("double") -
                F.lit(t0).cast("timestamp").cast("double")) / F.lit(3600.0)
    weight = F.pow(F.lit(2.0), dt_hours / F.lit(half_life_hours))
    keyed = (df.where(v.isNotNull() & ~F.isnan(v))
             .select(ddsketch_key_col(v, alpha, offset).alias("_key"),
                     weight.alias("_w")))
    counts = keyed.groupBy("_key").agg(F.sum("_w").alias("_cnt"))
    # unpartitioned window = one reducer — deliberate: it runs over the
    # POST-AGGREGATION bucket table (≤ a few thousand rows at any data
    # size; bounded by bin count, not input rows), after the grouped
    # partial-aggregated exchange has done the heavy lifting
    w_cum = Window.orderBy("_key")
    cum = (counts.withColumn("_cum", F.sum("_cnt").over(w_cum))
           .withColumn("_n", F.sum("_cnt").over(Window.partitionBy())))
    qdf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    picked = (cum.join(F.broadcast(qdf), F.col("_cum") > F.col("q") * F.col("_n"))
              .groupBy("q")
              .agg(F.min("_key").alias("_key"), F.first("_n").alias("_n")))
    unsigned = (F.when(F.col("_key") > 0, F.col("_key") - F.lit(offset))
                .when(F.col("_key") < 0, F.col("_key") + F.lit(offset))
                .otherwise(F.lit(0)))
    return (picked
            .withColumn("estimate", F.round(ddsketch_estimate_col(F.col("_key"), alpha, offset), 6))
            .withColumn("bucket_key", unsigned.cast("long"))
            .select("q", "bucket_key", "estimate",
                    F.round(F.col("_n"), 3).alias("w_total"))
            .orderBy("q"))


def duckdb_decayed_quantile_sql(table: str, value_col: str, ts_col: str,
                                quantiles: list[float], alpha: float,
                                half_life_hours: float = 24.0,
                                t0: str = "2024-01-01 00:00:00") -> str:
    """ANSI-SQL twin of `ddsketch_decayed_quantile_plan` (positive
    values)."""
    gamma, lng = gamma_of_alpha(alpha)
    qvals = ", ".join(f"({float(q)!r})" for q in quantiles)
    return f"""
WITH keyed AS (
  SELECT CAST(ceil(ln(CAST({value_col} AS DOUBLE)) / {lng!r}) AS BIGINT) AS bucket,
         power(2.0, (epoch({ts_col}) - epoch(TIMESTAMP '{t0}')) / 3600.0
                     / {float(half_life_hours)!r}) AS w
  FROM {table} WHERE {value_col} IS NOT NULL
), buckets AS (
  SELECT bucket, SUM(w) AS cnt FROM keyed GROUP BY bucket
), cum AS (
  SELECT bucket, SUM(cnt) OVER (ORDER BY bucket) AS cum_cnt,
         SUM(cnt) OVER () AS n
  FROM buckets
), qs(q) AS (VALUES {qvals})
SELECT q,
       MIN(bucket) AS bucket_key,
       ROUND(2 * power({gamma!r}, CAST(MIN(bucket) AS DOUBLE)) / ({gamma!r} + 1), 6) AS estimate,
       ROUND(MIN(n), 3) AS w_total
FROM cum CROSS JOIN qs
WHERE cum_cnt > q * n
GROUP BY q
ORDER BY q
"""


def ddsketch_sliding_quantile_plan(df: DataFrame, value_col: str, ts_col: str,
                                   quantiles: list[float], alpha: float,
                                   window_hours: int = 6,
                                   offset: int = 1 << 30) -> DataFrame:
    """Sliding-window quantiles from mergeable bucket counts — rolling
    p95-style monitoring the scale-correct way: hourly (bucket, count)
    state is tiny and additive, so an N-hour sliding window is just a
    re-aggregation of N hourly count sets, never a re-scan of raw data.

    Plan: hour epoch → (hour, key) counts → each hour contributes to the
    `window_hours` windows ending at hour..hour+w−1 (explode of a small
    sequence — a broadcast-free range join) → per-window cumsum + probe.
    Output: window_end (hour epoch, long), q, estimate, n — only windows
    with full w-hour coverage of the data's hour span.
    """
    spark = df.sparkSession
    v = F.col(value_col).cast("double")
    # tz-free hour index: boundary count from a naive anchor — identical on
    # both engines regardless of spark.sql.session.timeZone
    hour = F.expr(
        f"timestampdiff(HOUR, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    ).cast("long")
    keyed = (df.where(v.isNotNull() & ~F.isnan(v))
             .select(hour.alias("_hour"),
                     ddsketch_key_col(v, alpha, offset).alias("_key")))
    counts = keyed.groupBy("_hour", "_key").agg(F.count("*").alias("_cnt"))
    contrib = (counts
               .withColumn("_end", F.explode(F.sequence(
                   F.col("_hour"), F.col("_hour") + F.lit(window_hours - 1))))
               .groupBy("_end", "_key").agg(F.sum("_cnt").alias("_cnt")))
    bounds = keyed.agg(F.min("_hour").alias("_lo"), F.max("_hour").alias("_hi"))
    full = contrib.join(F.broadcast(bounds),
                        (F.col("_end") >= F.col("_lo") + F.lit(window_hours - 1)) &
                        (F.col("_end") <= F.col("_hi")))
    from pyspark.sql.window import Window
    w_cum = Window.partitionBy("_end").orderBy("_key")
    w_all = Window.partitionBy("_end")
    cum = (full.withColumn("_cum", F.sum("_cnt").over(w_cum))
           .withColumn("_n", F.sum("_cnt").over(w_all)))
    qdf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    picked = (cum.join(F.broadcast(qdf),
                       F.col("_cum") > F.col("q") * (F.col("_n") - F.lit(1)).cast("double"))
              .groupBy("_end", "q")
              .agg(F.min("_key").alias("_key"), F.first("_n").alias("n")))
    return (picked
            .withColumn("estimate", F.round(ddsketch_estimate_col(F.col("_key"), alpha, offset), 6))
            .select(F.col("_end").alias("window_end"), "q", "estimate",
                    F.col("n").cast("long").alias("n"))
            .orderBy("window_end", "q"))


def duckdb_sliding_quantile_sql(table: str, value_col: str, ts_col: str,
                                quantiles: list[float], alpha: float,
                                window_hours: int = 6) -> str:
    """DuckDB twin of `ddsketch_sliding_quantile_plan` (positive values)."""
    gamma, lng = gamma_of_alpha(alpha)
    qvals = ", ".join(f"({float(q)!r})" for q in quantiles)
    return f"""
WITH keyed AS (
  SELECT CAST(datediff('hour', TIMESTAMP '1970-01-01 00:00:00', {ts_col}) AS BIGINT) AS hour,
         CAST(ceil(ln(CAST({value_col} AS DOUBLE)) / {lng!r}) AS BIGINT) AS key
  FROM {table} WHERE {value_col} IS NOT NULL
), counts AS (
  SELECT hour, key, COUNT(*) AS cnt FROM keyed GROUP BY hour, key
), contrib AS (
  SELECT hour + off AS window_end, key, SUM(cnt) AS cnt
  FROM counts, (SELECT unnest(range({window_hours})) AS off)
  GROUP BY window_end, key
), bounds AS (
  SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM keyed
), cum AS (
  SELECT window_end, key, cnt,
         SUM(cnt) OVER (PARTITION BY window_end ORDER BY key) AS cum_cnt,
         SUM(cnt) OVER (PARTITION BY window_end) AS n
  FROM contrib, bounds
  WHERE window_end >= lo + {window_hours - 1} AND window_end <= hi
), qs(q) AS (VALUES {qvals})
SELECT window_end, q,
       ROUND(2 * power({gamma!r}, CAST(MIN(key) AS DOUBLE)) / ({gamma!r} + 1), 6) AS estimate,
       CAST(MIN(n) AS BIGINT) AS n
FROM cum CROSS JOIN qs
WHERE cum_cnt > q * (n - 1)
GROUP BY window_end, q
ORDER BY window_end, q
"""


def duckdb_quantile_sql_signed(table: str, value_col: str, quantiles: list[float],
                               alpha: float, offset: int = 1 << 30) -> str:
    """Signed-codec twin of `ddsketch_quantile_plan` for mixed-sign data:
    the full key encoding of `DDS_GetKey` (`ddsketch.cc:84-104`) and the
    signed estimator of `DDS_GetRank` (`:106-127`) in ANSI SQL."""
    gamma, lng = gamma_of_alpha(alpha)
    qvals = ", ".join(f"({float(q)!r})" for q in quantiles)
    return f"""
WITH buckets AS (
  SELECT CASE WHEN v > 0 THEN CAST(ceil(ln(v) / {lng!r}) AS BIGINT) + {offset}
              WHEN v < 0 THEN -(CAST(ceil(ln(-v) / {lng!r}) AS BIGINT) + {offset})
              ELSE 0 END AS bucket,
         COUNT(*) AS cnt
  FROM (SELECT CAST({value_col} AS DOUBLE) AS v FROM {table}
        WHERE {value_col} IS NOT NULL)
  GROUP BY bucket
), cum AS (
  SELECT bucket, cnt,
         SUM(cnt) OVER (ORDER BY bucket) AS cum_cnt,
         SUM(cnt) OVER () AS n
  FROM buckets
), qs(q) AS (VALUES {qvals}), picked AS (
  SELECT q, MIN(bucket) AS k, CAST(MIN(n) AS BIGINT) AS n
  FROM cum CROSS JOIN qs
  WHERE cum_cnt > q * (n - 1)
  GROUP BY q
)
SELECT q,
       CASE WHEN k > 0 THEN k - {offset}
            WHEN k < 0 THEN k + {offset} ELSE 0 END AS bucket_key,
       CASE WHEN k > 0 THEN ROUND(2 * power({gamma!r}, CAST(k - {offset} AS DOUBLE)) / ({gamma!r} + 1), 6)
            WHEN k < 0 THEN ROUND(-2 * power({gamma!r}, CAST(-k - {offset} AS DOUBLE)) / ({gamma!r} + 1), 6)
            ELSE 0.0 END AS estimate,
       n
FROM picked
ORDER BY q
"""


def duckdb_quantile_sql(table: str, value_col: str, quantiles: list[float],
                        alpha: float, group_cols: tuple[str, ...] = (),
                        where: str = "") -> str:
    """ANSI-SQL twin of `ddsketch_quantile_plan` for DuckDB oracles.

    Positive-value columns only (all oracle fixtures are positive), so
    the signed-key branches reduce to the plain log-bucket index.
    """
    gamma, lng = gamma_of_alpha(alpha)
    g = ", ".join(group_cols)
    gc = g + ", " if g else ""
    qvals = ", ".join(f"({float(q)!r})" for q in quantiles)
    wc = f"WHERE {where}" if where else f"WHERE {value_col} IS NOT NULL"
    return f"""
WITH buckets AS (
  SELECT {gc}CAST(ceil(ln(CAST({value_col} AS DOUBLE)) / {lng!r}) AS BIGINT) AS bucket,
         COUNT(*) AS cnt
  FROM {table} {wc}
  GROUP BY {gc}bucket
), cum AS (
  SELECT {gc}bucket, cnt,
         SUM(cnt) OVER ({('PARTITION BY ' + g) if g else ''} ORDER BY bucket) AS cum_cnt,
         SUM(cnt) OVER ({('PARTITION BY ' + g) if g else ''}) AS n
  FROM buckets
), qs(q) AS (VALUES {qvals})
SELECT {gc}q,
       MIN(bucket) AS bucket_key,
       ROUND(2 * power({gamma!r}, CAST(MIN(bucket) AS DOUBLE)) / ({gamma!r} + 1), 6) AS estimate,
       CAST(MIN(n) AS BIGINT) AS n
FROM cum CROSS JOIN qs
WHERE cum_cnt > q * (n - 1)
GROUP BY {gc}q
ORDER BY {gc}q
"""
