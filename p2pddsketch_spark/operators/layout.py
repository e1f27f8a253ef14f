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

__all__ = ["zorder_col", "zorder_col_nd", "zorder_layout",
           "zorder_layout_nd", "duckdb_zorder_expr",
           "duckdb_zorder_expr_nd"]


def _check_nd(d: int, bits: int) -> None:
    if d < 2:
        raise ValueError("z-order needs at least 2 columns")
    if not 1 <= bits or d * bits > 63:
        raise ValueError(
            f"{d} columns x {bits} bits = {d * bits} z-bits; must be <= 63 "
            "for a positive BIGINT")


def zorder_col_nd(cols: list, bits: int = 16) -> Column:
    """Morton-interleave the low `bits` bits of d non-negative int64
    columns: bit i of column j lands at z-bit d·i + j. d·bits ≤ 63
    keeps the result a positive BIGINT. Values must fit in `bits` bits
    for a faithful ordering (higher bits are ignored — callers
    bucket/clamp first when the domain is wider)."""
    _check_nd(len(cols), bits)
    cs = [(F.col(c) if isinstance(c, str) else c).cast("long")
          for c in cols]  # int32 would overflow at high shifts
    d = len(cs)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cs):
            terms.append(F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), d * i + j))
    return reduce(lambda a, b: a.bitwiseOR(b), terms).cast("long")


def zorder_col(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Two-column Morton interleave (see `zorder_col_nd`): bit layout
    z-bit 2i = x's bit i, z-bit 2i+1 = y's bit i."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    return zorder_col_nd([x, y], bits)


def duckdb_zorder_expr_nd(cols: list[str], bits: int = 16) -> str:
    """The identical d-column Morton expression in ANSI SQL (twin)."""
    _check_nd(len(cols), bits)
    d = len(cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(f"((CAST({c} AS BIGINT) >> {i}) & 1) << {d * i + j}")
    return "(" + " | ".join(f"({t})" for t in terms) + ")"


def duckdb_zorder_expr(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton expression in ANSI SQL (DuckDB twin)."""
    return duckdb_zorder_expr_nd([x, y], bits)


def zorder_layout_nd(df: DataFrame, cols: list[str], bits: int = 16,
                     partitions: int | None = None) -> DataFrame:
    """Return `df` re-clustered in d-column z-order — range-partitioned
    and sorted within partitions by the Morton value, z column dropped.
    Writing the result to parquet yields row groups whose min/max ranges
    are tight on EVERY interleaved column (the pruning receipt).

    Each column is min-max scaled to the full `bits` width first —
    interleaving raw values with mismatched magnitudes degenerates to a
    single-column sort (the wider column owns every high z-bit). The
    min/max pass is one cheap aggregate; at 100 TB use known domain
    bounds or an approximate quantile sketch instead. More columns at
    fixed total z-bits means coarser per-column resolution — pruning
    selectivity per axis degrades as d grows (3-4 columns is the
    practical ceiling, as in Delta/Iceberg OPTIMIZE)."""
    _check_nd(len(cols), bits)
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}__lo"), F.max(c).alias(f"{c}__hi")]
    mm = df.agg(*aggs).first()
    top = (1 << bits) - 1

    def scaled(c: str) -> Column:
        lo, hi = int(mm[f"{c}__lo"]), int(mm[f"{c}__hi"])
        span = max(1, hi - lo)
        # ALL arithmetic in double: int64 subtraction alone can wrap for
        # mixed-sign domains spanning >= 2^63, and (col - lo) * top wraps
        # for spans wider than ~2^47 at bits=16 (non-ANSI overflow) —
        # either silently scrambles the z-values; double rounding merely
        # coarsens the clustering, which layout can tolerate
        return ((F.col(c).cast("double") - F.lit(float(lo)))
                * F.lit(float(top)) / F.lit(float(span))).cast("long")

    z = df.withColumn("_z", zorder_col_nd([scaled(c) for c in cols], bits))
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    return (z.repartitionByRange(parts, "_z")
            .sortWithinPartitions("_z")
            .drop("_z"))


def zorder_layout(df: DataFrame, x: str, y: str, bits: int = 16,
                  partitions: int | None = None) -> DataFrame:
    """Two-column `zorder_layout_nd` (the common case; see there)."""
    return zorder_layout_nd(df, [x, y], bits, partitions)
