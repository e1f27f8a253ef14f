"""Declarative data-quality validation (Deequ-style) compiled to ONE
aggregation pass.

A 100 TB table gets validated before anything expensive touches it;
the only affordable shape is a single scan with map-side combine. Rules
are declared as (name, kind, params) and compiled into one `agg(...)`
whose outputs are folded into a per-rule pass/fail report — no second
scan, no per-rule jobs.

Supported rule kinds:
- not_null(col)                  — zero NULLs
- unique(col)                    — COUNT(col) == COUNT(DISTINCT col)
- in_range(col, lo, hi)          — min/max inside [lo, hi]
- accepted_values(col, values)   — no value outside the list
- non_negative_count()           — table has ≥ min_rows rows
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["Rule", "validate"]


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str
    col: str | None = None
    lo: float | None = None
    hi: float | None = None
    values: tuple = field(default=())
    min_rows: int = 1


def _metrics(rule: Rule) -> list:
    c = rule.col
    if rule.kind == "not_null":
        return [F.count(F.when(F.col(c).isNull(), 1)).alias(f"_{rule.name}_bad")]
    if rule.kind == "unique":
        return [(F.count(c) - F.countDistinct(c)).alias(f"_{rule.name}_bad")]
    if rule.kind == "in_range":
        return [F.count(F.when((F.col(c) < rule.lo) | (F.col(c) > rule.hi), 1))
                .alias(f"_{rule.name}_bad")]
    if rule.kind == "accepted_values":
        if not rule.values:
            raise ValueError(
                f"rule {rule.name!r}: accepted_values needs a non-empty "
                "value list (an empty list would flag every row)")
        return [F.count(F.when(~F.col(c).isin(*rule.values) |
                               F.col(c).isNull(), 1))
                .alias(f"_{rule.name}_bad")]
    if rule.kind == "non_negative_count":
        return [(F.lit(rule.min_rows) - F.count("*"))
                .alias(f"_{rule.name}_bad")]
    raise ValueError(f"unknown rule kind {rule.kind!r}")


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One-pass rule evaluation → (rule string, kind string,
    violations long, passed boolean), ordered by rule name. `violations`
    is the offending-row count (or deficit for row-count rules), so the
    report doubles as the fix-priority list."""
    aggs = []
    for r in rules:
        aggs += _metrics(r)
    row = df.agg(*aggs)
    # one scan: the per-rule report rows come from EXPLODING a struct
    # array over the single aggregated row (a union of per-rule selects
    # would re-run the aggregation once per rule)
    structs = [F.struct(F.lit(r.name).alias("rule"),
                        F.lit(r.kind).alias("kind"),
                        F.greatest(F.col(f"_{r.name}_bad").cast("long"),
                                   F.lit(0).cast("long")).alias("violations"),
                        (F.col(f"_{r.name}_bad") <= 0).alias("passed"))
               for r in rules]
    return (row.select(F.explode(F.array(*structs)).alias("r"))
            .select("r.*").orderBy("rule"))
