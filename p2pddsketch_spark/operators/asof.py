"""AS-OF join — for every left row, the most recent right row with
right.ts <= left.ts within the same key (the time-series join Spark's
DataFrame API lacks; explicitly called out by the graft brief as a
custom-operator example).

Implementation is the UNION + WINDOW idiom, not a range join: tag right
rows, union both sides into one (key, ts)-sorted stream, and take
`last(right_payload, ignorenulls=True)` over the per-key window up to
the current row — the most recent right row "flows forward" onto every
later left row.

Why this shape at 100 TB: ONE hash shuffle of (left ∪ right) on the key
plus a per-key sort — the same cost as any windowed query — versus a
range-condition join, which Catalyst would plan as a broadcast
nested-loop or a cartesian-per-key. Skewed keys are AQE's problem, as
with any window. Ties (right.ts == left.ts) include the right row, and
among equal right timestamps the LAST in (ts, tiebreak) order wins —
matching DuckDB's native ASOF JOIN, which is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "interval_join"]


def interval_join(left: DataFrame, right: DataFrame, key: str,
                  left_ts: str, start_col: str, end_col: str,
                  bucket_seconds: int = 3600) -> DataFrame:
    """Range (interval) join: all (left, right) pairs of the same `key`
    with left_ts ∈ [start, end] — WITHOUT the range-condition join
    Catalyst plans as a per-key nested loop. Each right interval
    explodes into the `bucket_seconds` time buckets it overlaps, each
    left row maps to its single bucket, and a hash EQUI-join on
    (key, bucket) produces candidates that one exact filter prunes.
    Shuffle volume: |left| + |right|·(interval/bucket + 1) rows — size
    `bucket_seconds` near the typical interval length. Duplicate
    candidates are impossible (a left row lives in exactly one bucket).
    Returns left columns + right columns (names must not collide)."""
    b = F.lit(int(bucket_seconds)).cast("long")
    l_ts = F.col(left_ts).cast("timestamp").cast("double").cast("long")
    s_ts = F.col(start_col).cast("timestamp").cast("double").cast("long")
    e_ts = F.col(end_col).cast("timestamp").cast("double").cast("long")
    l = left.withColumn("_b", F.floor(l_ts / b).cast("long")) \
            .withColumn("_jk", F.col(key))
    r = (right.withColumn("_bs", F.floor(s_ts / b).cast("long"))
         .withColumn("_be", F.floor(e_ts / b).cast("long"))
         .withColumn("_b", F.explode(F.sequence(F.col("_bs"), F.col("_be"))))
         .withColumn("_jk", F.col(key))
         .drop("_bs", "_be", key))
    joined = l.join(r, ["_jk", "_b"])
    keep = (F.col(left_ts).cast("timestamp") >= F.col(start_col).cast("timestamp")) & \
           (F.col(left_ts).cast("timestamp") <= F.col(end_col).cast("timestamp"))
    return joined.where(keep).drop("_jk", "_b")


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              payload: tuple[str, ...]) -> DataFrame:
    """Left as-of join: every `left` row gains `payload` columns from the
    latest `right` row of the same `key` with right_ts <= left_ts (nulls
    when no such row). `left` keeps all its columns; `payload` names must
    not collide with them.

    The matched right row is carried ATOMICALLY: all payload columns are
    packed into ONE struct and a single `last(struct, ignorenulls=True)`
    forward-fills it, so a NULL inside a matched row's payload stays NULL
    (per-column fills would splice that column from an older right row —
    not what DuckDB ASOF returns). Right rows with NULL timestamps are
    dropped up front (`l.ts >= NULL` is never true in SQL), and equal
    right timestamps break ties deterministically by the payload struct's
    field-wise order (largest struct wins), independent of partition
    layout."""
    lcols = left.columns
    r = (right.where(F.col(right_ts).isNotNull())
         .select(F.col(key).alias("_k"),
                 F.col(right_ts).cast("timestamp").alias("_ts"),
                 F.struct(*[F.col(c) for c in payload]).alias("_pl"))
         .withColumn("_side", F.lit(0)))
    pl_type = r.schema["_pl"].dataType
    l = (left.withColumn("_ts", F.col(left_ts).cast("timestamp"))
         .withColumn("_side", F.lit(1))
         .withColumn("_k", F.col(key))
         .withColumn("_pl", F.lit(None).cast(pl_type)))
    for c in lcols:
        r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    cols = ["_k", "_ts", "_side", "_pl"] + list(lcols)
    both = l.select(*cols).unionByName(r.select(*cols))
    # right rows sort BEFORE left rows at equal ts (_side 0 < 1), so an
    # equal-timestamp right row is visible to the left row — DuckDB ASOF
    # (left.ts >= right.ts) semantics. "_pl" is the deterministic
    # tiebreak among equal right timestamps (left rows have NULL _pl,
    # which Spark sorts first within their (_ts, _side) group — harmless,
    # as every right row of the frame already precedes them).
    w = (Window.partitionBy("_k").orderBy("_ts", "_side", "_pl")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = both.select(
        *lcols, "_side",
        F.last("_pl", ignorenulls=True).over(w).alias("_f"))
    return (filled.where(F.col("_side") == 1)
            .select(*lcols, *[F.col(f"_f.{c}").alias(c) for c in payload]))
