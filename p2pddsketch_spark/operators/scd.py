"""Slowly-changing-dimension (SCD type 2) versioning as window algebra.

A warehouse-completeness operator: apply a change log to a versioned
dimension table — close the open row of every touched key and append
one row per change, carrying (valid_from, valid_to] intervals. No
MERGE INTO / table format needed: the entire update is a union plus one
`lead()` window over the touched keys, so it scales as a single shuffle
on the key and rewrites nothing outside the touched partition.

Append-only assumption (documented, asserted nowhere hot): change
timestamps are ≥ the open row's valid_from for their key — the normal
case for event-time change logs. Late rows would need interval
splitting, which SCD-2 systems typically reject or quarantine too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_merge"]


def scd2_merge(current: DataFrame, updates: DataFrame, key: str,
               ts_col: str, payload_cols: list[str],
               tiebreak: str | None = None) -> DataFrame:
    """Merge a change log into an SCD-2 dimension.

    `current` columns: key, *payload_cols, valid_from, valid_to
    (NULL = open row). `updates` columns: key, *payload_cols, ts_col.
    Returns the new dimension with the same schema as `current`.
    `tiebreak` orders equal-timestamp changes deterministically.
    """
    closed = current.where(F.col("valid_to").isNotNull())
    open_rows = (current.where(F.col("valid_to").isNull())
                 .select(key, *payload_cols, "valid_from"))
    changes = updates.select(
        key, *payload_cols, F.col(ts_col).alias("valid_from"))
    tb = [tiebreak] if tiebreak else []
    if tb:
        open_rows = open_rows.withColumn(tb[0], F.lit(None).cast("long"))
        changes = updates.select(
            key, *payload_cols, F.col(ts_col).alias("valid_from"),
            F.col(tiebreak).cast("long").alias(tb[0]))
    w = Window.partitionBy(key).orderBy("valid_from", *tb)
    versioned = (open_rows.unionByName(changes)
                 .withColumn("valid_to", F.lead("valid_from").over(w))
                 .drop(*tb))
    return closed.select(*versioned.columns).unionByName(versioned)
