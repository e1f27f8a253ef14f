"""Skew-mitigated shuffle join (key salting).

When a shuffle join's build side cannot broadcast and the probe side's
key distribution is skewed, the task holding the hot key becomes the
straggler that sets the stage's wall clock. Salting splits each hot
key's rows across `salts` reducers: the probe side gets a salt drawn
from an unrelated column's hash, the build side is replicated once per
salt value, and the join key becomes (key, salt) — same rows out,
`salts`-way parallelism on the hot key in.

AQE's skew-join handles the common cases adaptively at runtime; this
operator is the explicit, planner-independent form (useful when the
skew is known ahead of time, when AQE is disabled, or when the skewed
stage is a Python-barrier boundary AQE cannot re-split). The build-side
replication is `salts`× its row count — use for dimension-sized builds
only, and keep `salts` near the expected straggler factor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(probe: DataFrame, build: DataFrame, key: str,
                build_key: str | None = None, salts: int = 8,
                salt_source: Column | None = None,
                how: str = "inner") -> DataFrame:
    """Equi-join `probe` ⋈ `build` on key with `salts`-way hot-key
    splitting. Result rows are exactly those of the plain join (salt
    assignment only routes rows to reducers). `salt_source` picks the
    probe-side salt (default: a hash over all probe columns); any
    expression works — correctness does not depend on it."""
    bk = build_key or key
    if salts < 1:
        raise ValueError("salts must be >= 1")
    if how not in ("inner", "left", "leftouter", "left_outer", "semi",
                   "left_semi", "leftsemi", "anti", "left_anti", "leftanti"):
        # the build side is replicated per salt, so right/full outer
        # joins would emit `salts` null-extended copies of every
        # unmatched build row — not the plain join's result
        raise ValueError(f"salted_join supports inner/left/semi/anti "
                         f"joins only (got {how!r})")
    src = salt_source if salt_source is not None \
        else F.xxhash64(*[F.col(c) for c in probe.columns])
    p = probe.withColumn("_salt", F.pmod(src, F.lit(salts)).cast("int"))
    b = (build.withColumn("_salt", F.explode(
            F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<int>"))))
    cond = (p[key] == b[bk]) & (p["_salt"] == b["_salt"])
    out = (p.join(b.hint("shuffle_hash"), cond, how)
           .drop(p["_salt"]).drop(b["_salt"]))
    if bk == key:
        out = out.drop(b[bk])
    return out
