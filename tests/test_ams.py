"""AMS tug-of-war sketch (sketches/ams.py): linear-sketch algebra
(merge associativity/byte identity, turnstile), codec roundtrip, the
lane-prefix property of the sign family, and honest empirical accuracy
of the median-of-means F2 / inner-product estimators at fixed seeds."""

from __future__ import annotations

import numpy as np
import pytest

from p2pddsketch_spark.sketches.ams import AmsSketch


def _keyed(rng, n, n_keys, zipf=None):
    keys = (rng.zipf(zipf, n) % n_keys) if zipf else rng.integers(0, n_keys, n)
    return np.unique(keys, return_counts=True)


def test_merge_order_invariance_byte_identity():
    rng = np.random.default_rng(0)
    vals, cnts = _keyed(rng, 100_000, 2_000, zipf=1.3)
    whole = AmsSketch().update_batch(vals, cnts)
    parts = [(vals[i::3], cnts[i::3]) for i in range(3)]
    orders = [(0, 1, 2), (2, 0, 1), (1, 2, 0)]
    blobs = set()
    for order in orders:
        acc = AmsSketch()
        for i in order:
            acc.merge(AmsSketch().update_batch(*parts[i]))
        blobs.add(acc.to_bytes())
    assert blobs == {whole.to_bytes()}


def test_turnstile_deletion_returns_to_zero():
    rng = np.random.default_rng(1)
    vals, cnts = _keyed(rng, 50_000, 500)
    s = AmsSketch().update_batch(vals, cnts).update_batch(vals, -cnts)
    assert not s.z.any() and s.n == 0


def test_codec_roundtrip_and_magic():
    rng = np.random.default_rng(2)
    s = AmsSketch(n_counters=128, groups=4, seed=11)
    s.update_batch(*_keyed(rng, 10_000, 300))
    back = AmsSketch.from_bytes(s.to_bytes())
    assert back.to_bytes() == s.to_bytes()
    assert (back.n_counters, back.groups, back.seed, back.n) == (128, 4, 11, s.n)
    with pytest.raises(ValueError):
        AmsSketch.from_bytes(b"XXXX" + s.to_bytes()[4:])


def test_lane_prefix_property():
    """Counters 0..63 of an r=128 sketch equal the r=64 sketch's — lane
    ℓ's hashes don't depend on how many lanes exist, so narrowing r is a
    pure truncation (lets stored states be compared across widths)."""
    rng = np.random.default_rng(3)
    vals, cnts = _keyed(rng, 20_000, 400)
    s64 = AmsSketch(64).update_batch(vals, cnts)
    s128 = AmsSketch(128).update_batch(vals, cnts)
    assert (s128.z[:64] == s64.z).all()


def test_shape_and_seed_mismatch_raise():
    a, b = AmsSketch(64, seed=1), AmsSketch(64, seed=2)
    with pytest.raises(ValueError):
        a.merge(b)
    with pytest.raises(ValueError):
        a.inner_product(b)
    with pytest.raises(ValueError):
        AmsSketch(63, groups=8)
    with pytest.raises(ValueError):
        AmsSketch(0)


def test_f2_estimate_accuracy_across_distributions():
    """F2 on skewed columns: signal dominates, estimates land well
    inside the √(2/k) envelope. Fixed seeds — these are pinned
    observations, not probabilistic claims."""
    rng = np.random.default_rng(4)
    cases = [
        _keyed(rng, 200_000, 500, zipf=1.3),     # heavy skew
        _keyed(rng, 200_000, 50, zipf=None),     # few hot uniform keys
        (np.arange(1000), np.full(1000, 37)),    # flat
    ]
    for vals, cnts in cases:
        exact = sum(int(c) * int(c) for c in cnts)
        est = AmsSketch(256).update_batch(vals, cnts).estimate_f2()
        assert abs(est - exact) / exact < 0.25, (exact, est)


def test_inner_product_estimates_join_size():
    """Join-size estimation: self-inner-product equals the F2 estimate
    exactly; cross estimates are order-of-magnitude signals whose error
    stays within ~3 std of the documented √(2·F2a·F2b/k) bound."""
    rng = np.random.default_rng(5)
    ua, ca = _keyed(rng, 20_000, 150)
    ub, cb = _keyed(rng, 15_000, 1_500)
    fb = dict(zip(ub.tolist(), cb.tolist()))
    exact = sum(int(c) * fb.get(int(v), 0) for v, c in zip(ua, ca))
    sa = AmsSketch(256).update_batch(ua, ca)
    sb = AmsSketch(256).update_batch(ub, cb)
    assert sa.inner_product(sa) == sa.estimate_f2()
    f2a = sum(int(c) ** 2 for c in ca)
    f2b = sum(int(c) ** 2 for c in cb)
    std = (2.0 * f2a * f2b / (256 // 8)) ** 0.5
    assert abs(sa.inner_product(sb) - exact) < 3 * std


def test_disjoint_keys_inner_product_is_noise():
    """Disjoint key ranges: true join size 0 — the estimate must be
    small relative to the noise scale (it cannot be exactly zero)."""
    rng = np.random.default_rng(6)
    ua, ca = _keyed(rng, 30_000, 300)
    ub, cb = _keyed(rng, 30_000, 300)
    sa = AmsSketch(256).update_batch(ua, ca)
    sb = AmsSketch(256).update_batch(ub + 1_000_000, cb)
    f2a = sum(int(c) ** 2 for c in ca)
    f2b = sum(int(c) ** 2 for c in cb)
    std = (2.0 * f2a * f2b / (256 // 8)) ** 0.5
    assert abs(sa.inner_product(sb)) < 3 * std


def test_large_scale_estimate_uses_exact_int_sums():
    """n beyond int64-square territory: counters near 2^32 would
    overflow z² in int64; the estimator's Python-int group sums keep it
    exact (mirrors the moment sketch's overflow-lane discipline)."""
    s = AmsSketch(64)
    s.z = np.full(64, 3_000_000_000, dtype=np.int64)  # z² = 9e18 > 2^63
    est = s.estimate_f2()
    assert est == float(3_000_000_000 ** 2)


def test_sql_twin_parity_negative_and_positive_keys():
    """The HUGEINT SQL twin reproduces every counter for SIGNED keys —
    DuckDB's % keeps the dividend's sign, so the twin wraps keys into
    [0, 2^64) before the splitmix64 chain (review-found divergence at
    key = -2^63 without the wrap). Pure DuckDB vs numpy, no Spark."""
    import duckdb

    from p2pddsketch_spark.plans.oracles import _ams_joinsize_sql

    keys = np.array([-(1 << 63), -12345, -1, 0, 1, 7, (1 << 62)], dtype=np.int64)
    cnts = np.array([3, 5, 2, 7, 1, 4, 6], dtype=np.int64)
    con = duckdb.connect()
    con.execute("CREATE TABLE events AS SELECT unnest(?::BIGINT[]) AS user_id",
                [np.repeat(keys, cnts).tolist()])
    con.execute("CREATE TABLE orders AS SELECT unnest(?::BIGINT[]) AS o_custkey",
                [np.repeat(keys, cnts).tolist()])
    got = dict(con.execute(_ams_joinsize_sql()).fetchall())
    s = AmsSketch(256).update_batch(keys, cnts)
    for j in range(256):
        assert got[f"za_{j:03d}"] == float(s.z[j]), j
    assert got["est_f2_events_users"] == s.estimate_f2()
    assert got["exact_f2_events_users"] == float(sum(int(c) ** 2 for c in cnts))
