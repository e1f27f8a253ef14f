"""Data-layout operators: Z-order (Morton) clustering for multi-column
scan pruning.

At 100 TB the cheapest query is the one that never reads the data:
parquet row-group min/max statistics prune scans, but only if rows are
clustered so per-group ranges are tight. Sorting by one column gives
perfect pruning on that column and none on any other; interleaving the
bits of two columns (Morton / Z-order) clusters BOTH, so a box
predicate `x BETWEEN … AND y BETWEEN …` skips most row groups on
either axis. `tests/test_layout.py` carries the measured receipt:
row-groups intersecting a box under z-layout vs a single-column sort.

The z-value is a pure Catalyst bit-expression (whole-stage codegen, no
UDF), so `repartitionByRange(z).sortWithinPartitions(z)` is an
ordinary range-shuffled write — the same cost as any global sort, paid
once at layout time.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_col", "zorder_layout", "duckdb_zorder_expr"]


def zorder_col(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low `bits` bits of two non-negative int64
    columns: z = Σ_i ((x>>i)&1)<<2i  |  ((y>>i)&1)<<(2i+1).

    2·bits ≤ 63 keeps the result in a positive BIGINT. Values must fit
    in `bits` bits for a faithful ordering (higher bits are ignored —
    callers bucket/clamp first when the domain is wider)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    xc, yc = F.col(x) if isinstance(x, str) else x, \
        F.col(y) if isinstance(y, str) else y
    xc, yc = xc.cast("long"), yc.cast("long")  # int32 would overflow <<31
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), terms).cast("long")


def duckdb_zorder_expr(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton expression in ANSI SQL (DuckDB twin)."""
    terms = []
    for i in range(bits):
        terms.append(f"((CAST({x} AS BIGINT) >> {i}) & 1) << {2 * i}")
        terms.append(f"((CAST({y} AS BIGINT) >> {i}) & 1) << {2 * i + 1}")
    return "(" + " | ".join(f"({t})" for t in terms) + ")"


def zorder_layout(df: DataFrame, x: str, y: str, bits: int = 16,
                  partitions: int | None = None) -> DataFrame:
    """Return `df` re-clustered in z-order on (x, y) — range-partitioned
    and sorted within partitions by the Morton value, z column dropped.
    Writing the result to parquet yields row groups whose x AND y
    min/max ranges are BOTH tight (the pruning receipt).

    Each column is min-max scaled to the full `bits` width first —
    interleaving raw values with mismatched magnitudes degenerates to a
    single-column sort (the wider column owns every high z-bit). The
    min/max pass is one cheap aggregate; at 100 TB use known domain
    bounds or an approximate quantile sketch instead."""
    mm = df.agg(F.min(x).alias("x0"), F.max(x).alias("x1"),
                F.min(y).alias("y0"), F.max(y).alias("y1")).first()
    top = (1 << bits) - 1

    def scaled(c: str, lo, hi) -> Column:
        span = max(1, int(hi) - int(lo))
        # ALL arithmetic in double: int64 subtraction alone can wrap for
        # mixed-sign domains spanning >= 2^63, and (col - lo) * top wraps
        # for spans wider than ~2^47 at bits=16 (non-ANSI overflow) —
        # either silently scrambles the z-values; double rounding merely
        # coarsens the clustering, which layout can tolerate
        return ((F.col(c).cast("double") - F.lit(float(int(lo))))
                * F.lit(float(top)) / F.lit(float(span))).cast("long")

    z = df.withColumn("_z", zorder_col(scaled(x, mm["x0"], mm["x1"]),
                                       scaled(y, mm["y0"], mm["y1"]), bits))
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    return (z.repartitionByRange(parts, "_z")
            .sortWithinPartitions("_z")
            .drop("_z"))
