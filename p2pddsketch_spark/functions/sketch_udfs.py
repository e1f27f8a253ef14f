"""Query persisted sketch tables from DataFrames / SQL.

`build_sketches` / the checkpoint writer persist sketch rows as parquet;
these Arrow-batched pandas UDFs let downstream jobs query those rows
without rebuilding anything — e.g.

    spark.read.parquet(sketch_table).select(
        "source", dds_quantile_udf()("sketch", F.lit(0.99)).alias("p99"))

or, after `register_sketch_udfs(spark)`, from plain SQL:

    SELECT source, dds_quantile(sketch, 0.99) AS p99 FROM sketches

This is the distributed *grouped-sketch query* form promised in
SURVEY.md §3.3 (the reference can only query its single in-memory
sketch, `DDS_GetQuantile` `ddsketch.cc:520-557`). UDF construction is
lazy (factory functions) because `pandas_udf` needs an active session.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd

__all__ = ["dds_quantile_udf", "sketch_count_udf", "sketch_cardinality_udf",
           "dds_build_udaf", "sketch_merge_udaf", "theta_build_udaf",
           "theta_cardinality_udf", "hll_build_udaf", "cms_build_udaf",
           "cms_count_udf", "ams_f2_udf", "ams_inner_udf",
           "kll_build_udaf", "tdigest_build_udaf", "bloom_build_udaf",
           "bloom_contains_udf", "register_sketch_udfs"]


@lru_cache(maxsize=None)
def dds_build_udaf(alpha: float = 0.01, bin_limit: int = 1 << 22):
    """GROUPED_AGG pandas UDAF: aggregate raw values into DDSketch bytes
    directly inside `groupBy().agg(...)` / SQL `GROUP BY` — the literal
    'mergeable UDAF' form of the north rule. Deterministic regardless of
    row order (bucket counts are additive integers).

    Scale note: Spark cannot partially-aggregate a pandas GROUPED_AGG
    UDF, so raw rows shuffle to their group's reducer — the convenience /
    SQL-parity form. The two-level mapInArrow harness
    (`operators/harness.py`) is the 10^12-row path; `sketch_merge_udaf`
    is the UDAF that re-aggregates ITS persisted partials without
    re-reading data."""
    from pyspark.sql.functions import pandas_udf
    from p2pddsketch_spark.sketches.ddsketch import DDSketch

    @pandas_udf("binary")
    def dds_build(v: pd.Series) -> bytes:
        sk = DDSketch(alpha=alpha, bin_limit=bin_limit)
        sk.update_batch(v.to_numpy(dtype=np.float64))
        return sk.to_bytes()

    return dds_build


@lru_cache(maxsize=None)
def sketch_merge_udaf():
    """GROUPED_AGG pandas UDAF merging persisted sketch blobs (any sketch
    type; α-alignment rules apply inside `merge_blobs`): re-aggregate a
    partial-sketch parquet table to any coarser grouping in one SQL
    statement — `SELECT source, sketch_merge(sketch) FROM partials GROUP
    BY source`. Input rows are tiny blobs, so the no-partial-agg caveat
    of grouped-agg UDFs is immaterial here."""
    from pyspark.sql.functions import pandas_udf
    from p2pddsketch_spark.operators.harness import merge_blobs

    @pandas_udf("binary")
    def sketch_merge(blobs: pd.Series) -> bytes:
        live = [bytes(b) for b in blobs if b is not None]
        # an all-NULL group (outer join / empty partition) aggregates to
        # NULL, matching built-in aggregates — not a worker IndexError
        return merge_blobs(live) if live else None

    return sketch_merge


@lru_cache(maxsize=None)
def dds_quantile_udf():
    from pyspark.sql.functions import pandas_udf
    from p2pddsketch_spark.operators.harness import sketch_from_bytes

    @pandas_udf("double")
    def dds_quantile(blobs: pd.Series, qs: pd.Series) -> pd.Series:
        out = np.empty(len(blobs), dtype=np.float64)
        for i, (b, q) in enumerate(zip(blobs, qs)):
            out[i] = np.nan if b is None else \
                sketch_from_bytes(bytes(b)).quantile(float(q))
        return pd.Series(out)

    return dds_quantile


@lru_cache(maxsize=None)
def sketch_count_udf():
    from pyspark.sql.functions import pandas_udf
    from p2pddsketch_spark.operators.harness import sketch_from_bytes

    @pandas_udf("long")
    def sketch_count(blobs: pd.Series) -> pd.Series:
        return pd.Series([0 if b is None else sketch_from_bytes(bytes(b)).n
                          for b in blobs], dtype="int64")

    return sketch_count


@lru_cache(maxsize=None)
def sketch_cardinality_udf():
    from pyspark.sql.functions import pandas_udf
    from p2pddsketch_spark.operators.harness import sketch_from_bytes

    @pandas_udf("double")
    def hll_cardinality(blobs: pd.Series) -> pd.Series:
        return pd.Series([np.nan if b is None else
                          sketch_from_bytes(bytes(b)).cardinality()
                          for b in blobs])

    return hll_cardinality


@lru_cache(maxsize=None)
def ams_f2_udf():
    """Scalar pandas UDF: F2 (self-join / skew mass) estimate from a
    persisted AMS blob — `SELECT g, ams_f2(sketch_merge(blob)) ...`."""
    from pyspark.sql.functions import pandas_udf
    from p2pddsketch_spark.sketches.ams import AmsSketch

    @pandas_udf("double")
    def ams_f2(blobs: pd.Series) -> pd.Series:
        return pd.Series([np.nan if b is None else
                          AmsSketch.from_bytes(bytes(b)).estimate_f2()
                          for b in blobs])

    return ams_f2


@lru_cache(maxsize=None)
def ams_inner_udf():
    """Scalar pandas UDF over TWO AMS blob columns: estimated equi-join
    cardinality of the two sketched key columns (AGMS inner product) —
    the SQL form of the planner's broadcast-vs-shuffle probe."""
    from pyspark.sql.functions import pandas_udf
    from p2pddsketch_spark.sketches.ams import AmsSketch

    @pandas_udf("double")
    def ams_inner(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            if x is None or y is None:
                out.append(np.nan)
            else:
                out.append(AmsSketch.from_bytes(bytes(x)).inner_product(
                    AmsSketch.from_bytes(bytes(y))))
        return pd.Series(out)

    return ams_inner


def register_sketch_udfs(spark) -> None:
    spark.udf.register("dds_quantile", dds_quantile_udf())
    # same UDF under the honest name: quantile() dispatches on the blob
    # magic (operators/harness.py:_MAGIC_TABLE), so it serves KLL / REQ /
    # t-digest / moment blobs too, not just DDSketch
    spark.udf.register("sketch_quantile", dds_quantile_udf())
    spark.udf.register("sketch_count", sketch_count_udf())
    spark.udf.register("hll_cardinality", sketch_cardinality_udf())
    spark.udf.register("dds_build", dds_build_udaf())
    spark.udf.register("sketch_merge", sketch_merge_udaf())
    spark.udf.register("theta_build", theta_build_udaf())
    spark.udf.register("theta_cardinality", theta_cardinality_udf())
    spark.udf.register("hll_build", hll_build_udaf())
    spark.udf.register("cms_build", cms_build_udaf())
    spark.udf.register("cms_count", cms_count_udf())
    spark.udf.register("ams_f2", ams_f2_udf())
    spark.udf.register("ams_inner", ams_inner_udf())
    spark.udf.register("kll_build", kll_build_udaf())
    spark.udf.register("tdigest_build", tdigest_build_udaf())
    spark.udf.register("bloom_build", bloom_build_udaf())
    spark.udf.register("bloom_contains", bloom_contains_udf())


@lru_cache(maxsize=None)
def cms_build_udaf(depth: int = 5, width: int = 16384, seed: int = 0):
    """GROUPED_AGG pandas UDAF: aggregate int64 keys into count-min
    bytes inside `groupBy().agg(...)` / SQL `GROUP BY` — the frequency
    UDAF sibling of `hll_build`/`theta_build`/`dds_build`. Counters are
    additive integers, so the blob is deterministic regardless of row
    order and `sketch_merge` re-aggregation byte-matches a one-shot
    build (pytest-pinned). Same scale note as `dds_build`: the
    GROUPED_AGG form is the SQL-convenience path; the mapInArrow
    harness is the 10^12-row path."""
    from pyspark.sql.functions import pandas_udf
    from p2pddsketch_spark.sketches.cms import CountMinSketch

    @pandas_udf("binary")
    def cms_build(v: pd.Series) -> bytes:
        sk = CountMinSketch(depth=depth, width=width, seed=seed)
        sk.update_batch(v.to_numpy(dtype=np.int64))
        return sk.to_bytes()

    return cms_build


@lru_cache(maxsize=None)
def cms_count_udf():
    """SCALAR pandas UDF: count-min point-frequency estimate —
    `SELECT cms_count(sketch, item) FROM ...` (upper bound with the
    standard (eps, delta) guarantee; exact while counters are sparse)."""
    from pyspark.sql.functions import pandas_udf
    from p2pddsketch_spark.sketches.cms import CountMinSketch

    @pandas_udf("long")
    def cms_count(blobs: pd.Series, items: pd.Series) -> pd.Series:
        out = np.zeros(len(blobs), dtype=np.int64)
        cache = {}
        for i, (b, it) in enumerate(zip(blobs, items)):
            # NULL item arrives as NaN through Arrow's nullable int64
            if b is None or pd.isna(it):
                continue
            key = bytes(b)
            sk = cache.get(key)
            if sk is None:
                sk = cache[key] = CountMinSketch.from_bytes(key)
            out[i] = int(sk.estimate(np.asarray([int(it)], dtype=np.int64))[0])
        return pd.Series(out, dtype="int64")

    return cms_count


@lru_cache(maxsize=None)
def hll_build_udaf(p: int = 14, seed: int = 0):
    """GROUPED_AGG pandas UDAF: aggregate int64 keys into HyperLogLog
    bytes inside `groupBy().agg(...)` / SQL `GROUP BY` — the
    distinct-counting UDAF sibling of `dds_build`/`theta_build`
    (estimate via the existing `hll_cardinality` scalar UDF; blobs
    re-aggregate with the generic `sketch_merge`). Registers are a pure
    max over item hashes, so the result is deterministic regardless of
    row order and the same UDAF re-run on any partitioning of the data
    byte-matches (pytest-pinned).

    Scale note: same as `dds_build` — GROUPED_AGG cannot partially
    aggregate, so raw rows shuffle to their group's reducer; the
    mapInArrow harness is the 10^12-row path, and `sketch_merge`
    re-aggregates its persisted partials from SQL."""
    from pyspark.sql.functions import pandas_udf
    from p2pddsketch_spark.sketches.hll import HyperLogLog

    @pandas_udf("binary")
    def hll_build(v: pd.Series) -> bytes:
        sk = HyperLogLog(p=p, seed=seed)
        sk.update_batch(v.to_numpy(dtype=np.int64))
        return sk.to_bytes()

    return hll_build


@lru_cache(maxsize=None)
def theta_build_udaf(k: int = 4096, seed: int = 0):
    """GROUPED_AGG pandas UDAF: aggregate int64 keys into Theta/KMV
    sketch bytes inside `groupBy().agg(...)` / SQL `GROUP BY` — the
    distinct-counting + set-operation UDAF. Under k distinct hashes the
    sketch keeps every hash, so `theta_cardinality` is EXACT (the
    hard-oracle regime); past k it degrades gracefully to the KMV
    estimator (pytest-bounded). Deterministic regardless of row order
    (the kept set is a pure function of the value set)."""
    from pyspark.sql.functions import pandas_udf
    from p2pddsketch_spark.sketches.theta import ThetaSketch

    @pandas_udf("binary")
    def theta_build(v: pd.Series) -> bytes:
        sk = ThetaSketch(k=k, seed=seed)
        sk.update_batch(v.to_numpy(dtype=np.int64))
        return sk.to_bytes()

    return theta_build


@lru_cache(maxsize=None)
def kll_build_udaf(k: int = 256):
    """GROUPED_AGG pandas UDAF: aggregate float64 values into KLL
    sketch bytes inside `groupBy().agg(...)` / SQL `GROUP BY` — the
    comparison-based quantile UDAF of the north rule's five named
    families (query via the generic `sketch_quantile`; re-aggregate
    persisted blobs with `sketch_merge`). The compaction schedule is
    derandomized (per-level flip bits, sketches/kll.py:55), so the
    result is reproducible for a given row order; below the level-0
    capacity no compaction fires and the canonical sorted wire form
    makes the blob row-order-INVARIANT (pytest-pinned). Past capacity
    the blob depends on arrival order the way every KLL does, while n
    and total item weight stay exactly conserved (pytest-pinned).

    Scale note: same as `dds_build` — GROUPED_AGG cannot partially
    aggregate, so raw rows shuffle to their group's reducer; the
    mapInArrow harness is the 10^12-row path."""
    from pyspark.sql.functions import pandas_udf
    from p2pddsketch_spark.sketches.kll import KLLSketch

    @pandas_udf("binary")
    def kll_build(v: pd.Series) -> bytes:
        sk = KLLSketch(k=k)
        sk.update_batch(v.to_numpy(dtype=np.float64))
        return sk.to_bytes()

    return kll_build


@lru_cache(maxsize=None)
def tdigest_build_udaf(delta: float = 200.0):
    """GROUPED_AGG pandas UDAF: aggregate float64 values into t-digest
    bytes inside `groupBy().agg(...)` / SQL `GROUP BY` (query via
    `sketch_quantile`; re-aggregate with `sketch_merge`). Centroid
    placement depends on arrival order — the standard t-digest
    trade-off — but n, min and max are exactly conserved and quantile
    estimates hold their rank-error bound under any order
    (pytest-pinned)."""
    from pyspark.sql.functions import pandas_udf
    from p2pddsketch_spark.sketches.tdigest import TDigest

    @pandas_udf("binary")
    def tdigest_build(v: pd.Series) -> bytes:
        sk = TDigest(delta=delta)
        sk.update_batch(v.to_numpy(dtype=np.float64))
        return sk.to_bytes()

    return tdigest_build


@lru_cache(maxsize=None)
def bloom_build_udaf(m_bits: int = 1 << 20, k: int = 5, seed: int = 0):
    """GROUPED_AGG pandas UDAF: aggregate int64 keys into Bloom-filter
    bytes inside `groupBy().agg(...)` / SQL `GROUP BY` — the membership
    UDAF of the north rule's five named families (probe via
    `bloom_contains`; re-aggregate with `sketch_merge`). The bitset is
    a pure OR over item hashes, so the blob is deterministic regardless
    of row order or partitioning and `sketch_merge` re-aggregation
    byte-matches a one-shot build (pytest-pinned). n_added is additive
    across merges (it counts insertions, not distinct items)."""
    from pyspark.sql.functions import pandas_udf
    from p2pddsketch_spark.sketches.bloom import BloomFilter

    @pandas_udf("binary")
    def bloom_build(v: pd.Series) -> bytes:
        sk = BloomFilter(m_bits=m_bits, k=k, seed=seed)
        sk.update_batch(v.to_numpy(dtype=np.int64))
        return sk.to_bytes()

    return bloom_build


@lru_cache(maxsize=None)
def bloom_contains_udf():
    """SCALAR pandas UDF: Bloom membership probe —
    `SELECT bloom_contains(sketch, item) FROM ...`. No false negatives
    ever; false-positive rate bounded by the filter's (m, k, n) as
    usual. NULL blob or NULL item → NULL (nullable boolean), matching
    `theta_cardinality`'s outer-join behavior."""
    from pyspark.sql.functions import pandas_udf
    from p2pddsketch_spark.sketches.bloom import BloomFilter

    @pandas_udf("boolean")
    def bloom_contains(blobs: pd.Series, items: pd.Series) -> pd.Series:
        out: list[bool | None] = []
        cache: dict[bytes, BloomFilter] = {}
        for b, it in zip(blobs, items):
            # a NULL item in a nullable int64 column reaches pandas as
            # NaN, not None — pd.isna covers both
            if b is None or pd.isna(it):
                out.append(None)
                continue
            key = bytes(b)
            sk = cache.get(key)
            if sk is None:
                sk = cache[key] = BloomFilter.from_bytes(key)
            out.append(bool(sk.contains(
                np.asarray([int(it)], dtype=np.int64))[0]))
        return pd.Series(out, dtype="object")

    return bloom_contains


@lru_cache(maxsize=None)
def theta_cardinality_udf():
    """SCALAR pandas UDF: distinct-count estimate of theta blobs."""
    from pyspark.sql.functions import pandas_udf
    from p2pddsketch_spark.sketches.theta import ThetaSketch

    @pandas_udf("double")
    def theta_cardinality(blobs: pd.Series) -> pd.Series:
        # total over nullable binary: NULL blob (outer join / empty
        # group) → NULL estimate, not a TypeError inside the worker
        return blobs.map(
            lambda b: None if b is None else
            float(np.round(ThetaSketch.from_bytes(bytes(b))
                           .cardinality(), 1)))

    return theta_cardinality
