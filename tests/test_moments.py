"""Moment sketch: merge associativity (byte identity), codec round-trip,
solver accuracy bounds, parameter/overflow guards, harness integration."""

import numpy as np
import pytest

from p2pddsketch_spark.errors import (MergeAlphaMismatch, ParamError,
                                      QuantileRangeError)
from p2pddsketch_spark.sketches.moments import QUANT, MomentSketch


def _build(data, k=10, zscale=8.0, shards=1, order=None):
    parts = np.array_split(data, shards)
    sks = [MomentSketch(k=k, zscale=zscale).update_batch(p) for p in parts]
    idx = order or range(len(sks))
    acc = MomentSketch(k=k, zscale=zscale)
    for i in idx:
        acc.merge(sks[i])
    return acc


def test_merge_order_invariance_byte_identity():
    rng = np.random.default_rng(3)
    data = rng.lognormal(1, 0.8, 40_000)
    a = _build(data, shards=8, order=list(range(8)))
    b = _build(data, shards=8, order=[5, 2, 7, 0, 6, 1, 4, 3])
    assert a.to_bytes() == b.to_bytes()
    # and equals the single-shot build: integer sums are associative
    c = _build(data, shards=1)
    assert a.to_bytes() == c.to_bytes()


def test_codec_roundtrip_and_guards():
    rng = np.random.default_rng(4)
    sk = MomentSketch(k=6).update_batch(rng.uniform(0, 100, 5_000))
    rt = MomentSketch.from_bytes(sk.to_bytes())
    assert rt.to_bytes() == sk.to_bytes()
    assert rt.n == sk.n and rt.sums == sk.sums
    with pytest.raises(ParamError):
        MomentSketch(k=1)
    with pytest.raises(ParamError):
        MomentSketch(k=6, zscale=0.0)
    with pytest.raises(MergeAlphaMismatch):
        MomentSketch(k=6).merge(MomentSketch(k=8))
    with pytest.raises(MergeAlphaMismatch):
        MomentSketch(k=6, zscale=8.0).merge(MomentSketch(k=6, zscale=4.0))
    with pytest.raises(QuantileRangeError):
        sk.quantile(1.5)
    with pytest.raises(ParamError):
        MomentSketch(k=6).quantile(0.5)        # empty
    with pytest.raises(ParamError):
        # |value| beyond sinh(zscale) must refuse, not silently overflow
        MomentSketch(k=6, zscale=2.0).update_batch(np.array([1e9]))


@pytest.mark.parametrize("dist", ["lognormal", "uniform", "normal", "exp"])
def test_quantile_rank_error_bound(dist):
    """Max-entropy estimates: rank error <= 0.03 at k=10 across smooth
    distributions (paper reports ~1e-3 average; bound is deliberately
    loose against solver sensitivity)."""
    rng = np.random.default_rng(11)
    data = {"lognormal": rng.lognormal(2, 1, 100_000),
            "uniform": rng.uniform(5, 50, 100_000),
            "normal": rng.normal(100, 15, 100_000),
            "exp": rng.exponential(10, 100_000)}[dist]
    sk = _build(data, shards=4, order=[2, 0, 3, 1])
    for q in (0.01, 0.1, 0.5, 0.9, 0.99, 0.999):
        est = sk.quantile(q)
        rank = float((data < est).mean())
        assert abs(rank - q) <= 0.03, (q, est, rank)


def test_degenerate_all_equal():
    sk = MomentSketch(k=6).update_batch(np.full(100, 7.0))
    assert sk.quantile(0.5) == pytest.approx(7.0, abs=1e-6)


def test_harness_build_matches_local(spark):
    """Distributed harness build == local single-shot build, byte for
    byte (the merge-convergence property of the north rule, on the
    newest sketch type)."""
    from p2pddsketch_spark.operators.harness import (SketchSpec,
                                                     build_sketches,
                                                     collect_sketches,
                                                     scalar_extractor)
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = build_sketches(
        li, [SketchSpec("mom", lambda: MomentSketch(k=6, zscale=8.0),
                        scalar_extractor("l_quantity"))],
        group_cols=("l_returnflag",), salt_buckets=8)
    got = {k[0]: s for k, s in
           collect_sketches(out, group_cols=("l_returnflag",)).items()}
    pdf = li.select("l_returnflag", "l_quantity").toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        ref = MomentSketch(k=6, zscale=8.0).update_batch(
            grp["l_quantity"].to_numpy())
        assert got[flag].to_bytes() == ref.to_bytes(), flag
        # and the estimate is sane: alpha-free sketch, so just bracket
        est = got[flag].quantile(0.5)
        exact = float(np.quantile(grp["l_quantity"].to_numpy(), 0.5))
        rank = float((grp["l_quantity"].to_numpy() < est).mean())
        assert abs(rank - 0.5) <= 0.05, (flag, est, exact)


def test_moment_blobs_through_sql_udafs(spark):
    """The generic blob UDAFs dispatch on the MOM1 magic: sketch_merge
    re-aggregates persisted moment partials and dds_quantile (the
    generic quantile-of-blob UDF) answers from the merged state — the
    whole SQL surface works for the new sketch with zero new UDFs."""
    import pandas as pd
    from pyspark.sql import functions as F
    from p2pddsketch_spark.functions.sketch_udfs import (dds_quantile_udf,
                                                         sketch_merge_udaf)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pdf = ev.select("event_type", "user_id", "value").toPandas()
    rows = []
    for (et, b), grp in pdf.groupby(["event_type",
                                     pdf["user_id"] % 4]):
        sk = MomentSketch(k=8).update_batch(grp["value"].to_numpy())
        rows.append((et, sk.to_bytes()))
    partials = spark.createDataFrame(rows, "event_type string, sketch binary")
    merged = (partials.groupBy("event_type")
              .agg(sketch_merge_udaf()(F.col("sketch")).alias("sketch")))
    got = {r["event_type"]: r["p50"] for r in merged.select(
        "event_type",
        dds_quantile_udf()(F.col("sketch"), F.lit(0.5)).alias("p50")).collect()}
    for et, grp in pdf.groupby("event_type"):
        vals = grp["value"].to_numpy()
        rank = float((vals < got[et]).mean())
        assert abs(rank - 0.5) <= 0.05, (et, got[et], rank)


# ------------------------------------------------------------- properties

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(min_value=-1e5, max_value=1e5,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=400),
       st.integers(2, 5))
def test_property_split_merge_equals_single_shot(values, nsplit):
    """For ANY data and ANY split, merging shard sketches equals the
    single-shot build byte-for-byte, and n is conserved."""
    data = np.asarray(values, dtype=np.float64)
    whole = MomentSketch(k=6, zscale=16.0).update_batch(data)
    parts = np.array_split(data, nsplit)
    acc = MomentSketch(k=6, zscale=16.0)
    for p in parts:
        acc.merge(MomentSketch(k=6, zscale=16.0).update_batch(p))
    assert acc.to_bytes() == whole.to_bytes()
    assert acc.n == len(data)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.floats(min_value=0.001, max_value=1e4,
                          allow_nan=False, allow_infinity=False),
                min_size=50, max_size=400, unique=True))
def test_property_quantiles_bracketed_and_monotone(values):
    """Estimates stay inside [min, max] and are non-decreasing in q —
    for arbitrary (possibly adversarial) inputs, via whatever solver
    path (full k, fallback k, or range fallback) engages."""
    data = np.asarray(values, dtype=np.float64)
    sk = MomentSketch(k=8, zscale=16.0).update_batch(data)
    lo, hi = float(data.min()), float(data.max())
    prev = None
    for q in (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0):
        est = sk.quantile(q)
        assert lo - 1e-6 <= est <= hi + 1e-6, (q, est, lo, hi)
        if prev is not None:
            assert est >= prev - 1e-9 * max(1, abs(prev)), (q, est, prev)
        prev = est


def test_from_bytes_rejects_truncated_blob():
    sk = MomentSketch(k=6).update_batch(np.arange(1.0, 100.0))
    blob = sk.to_bytes()
    with pytest.raises(ValueError, match="truncated"):
        MomentSketch.from_bytes(blob[:40])
    with pytest.raises(ValueError, match="truncated"):
        MomentSketch.from_bytes(blob + b"\x00")


def test_weighted_update_heavy_counts_exact():
    """Pre-aggregated frequency tables with huge counts must not wrap
    int64: the heavy path (sum(counts) >= 2^22) accumulates in exact
    Python ints and equals the scaled light path."""
    vals = np.array([2.0, 5.0, 9.0])
    heavy = np.array([10**9, 2 * 10**9, 3 * 10**9], dtype=np.int64)
    sk = MomentSketch(k=6).update_batch(vals, heavy)
    light = MomentSketch(k=6).update_batch(vals, heavy // 10**9)
    assert sk.n == int(heavy.sum())
    assert sk.sums == [s * 10**9 for s in light.sums]


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
    st.integers(1, 1 << 35)), min_size=1, max_size=60))
def test_property_lane_split_equals_python_int_reference(pairs):
    """The vectorized hi/lo-lane weighted path (engaged whenever batch
    weight >= 2^22) is byte-identical to unbounded Python-int
    accumulation of the same quantized terms — the exactness contract
    that lets pre-aggregated frequency tables skip the Python loop."""
    vals = np.asarray([p[0] for p in pairs], dtype=np.float64)
    counts = np.asarray([p[1] for p in pairs], dtype=np.int64)
    # force the lane path regardless of drawn weights
    counts[0] += (1 << 22)
    sk = MomentSketch(k=6, zscale=16.0).update_batch(vals, counts)
    ref = MomentSketch(k=6, zscale=16.0)
    z = np.log(vals + np.sqrt(vals * vals + 1.0)) / 16.0
    for j in range(1, 7):
        q = np.floor(np.power(z, float(j)) * (2.0 ** 40) + 0.5)
        ref.sums[j - 1] = sum(int(a) * int(c) for a, c in zip(q, counts))
    ref.n = int(counts.sum())
    ref.zmin, ref.zmax = sk.zmin, sk.zmax
    assert sk.to_bytes() == ref.to_bytes()


def test_raw_update_large_batch_no_wrap():
    """A single raw update_batch call past the 2^22-row guard (the
    ADVICE unweighted-path gap) equals the same data split into small
    batches — no silent int64 wrap of the per-batch power sums."""
    rng = np.random.default_rng(7)
    data = np.exp(rng.uniform(0.0, 11.0, size=(1 << 22) + 4096))
    whole = MomentSketch(k=4, zscale=16.0).update_batch(data)
    acc = MomentSketch(k=4, zscale=16.0)
    for part in np.array_split(data, 64):
        acc.update_batch(part)
    assert whole.to_bytes() == acc.to_bytes()


def test_quantile_solve_cache_consistent():
    """Repeated quantile() calls reuse one max-entropy solve; results
    are identical to a fresh sketch's, and the cache invalidates on
    update and merge."""
    rng = np.random.default_rng(11)
    data = rng.lognormal(3.0, 1.0, 20000)
    sk = MomentSketch(k=8).update_batch(data)
    qs = (0.01, 0.5, 0.95, 0.99, 0.999)
    first = [sk.quantile(q) for q in qs]
    fresh = MomentSketch.from_bytes(sk.to_bytes())
    assert first == [fresh.quantile(q) for q in qs]
    sk.update_batch(np.array([1.4e3]))
    assert sk._solved is None
    after = [sk.quantile(q) for q in qs]
    fresh2 = MomentSketch.from_bytes(sk.to_bytes())
    assert after == [fresh2.quantile(q) for q in qs]
