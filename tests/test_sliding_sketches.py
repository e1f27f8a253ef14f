"""Sliding-window sketch family: ExpHistogram (DGIM, SODA'02),
SlidingHyperLogLog (Chabchoub & Hébrail, ICDMW'10), EcmSketch
(Papapetrou et al., VLDB'12).

The load-bearing invariants:
* EH: |estimate - truth| <= the per-query err_bound, UNCONDITIONALLY
  (any arrival order, any merge sequence); classic 1/(2(k-1)) relative
  bound on in-order unit streams; merge commutes byte-identically.
* SHLL: the window-derived register array is BYTE-IDENTICAL to a plain
  HyperLogLog built from only the window's items, for every cutoff —
  the window query inherits HLL++'s error exactly. Merge is fully
  order-invariant (canonical skylines), same contract as HLL/DDSketch.
* ECM: est + err_bound is a hard upper bound on the true windowed key
  count; downward excursions are bounded by the CMS collision mass.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from p2pddsketch_spark.sketches.ecm import EcmSketch
from p2pddsketch_spark.sketches.eh import ExpHistogram
from p2pddsketch_spark.sketches.hll import HyperLogLog
from p2pddsketch_spark.sketches.sliding_hll import SlidingHyperLogLog
from p2pddsketch_spark.sketches.wss import WindowedSpaceSaving


# ------------------------------------------------------------ ExpHistogram

class TestExpHistogram:
    def test_total_is_exact(self):
        rng = np.random.default_rng(0)
        ts = rng.integers(0, 1000, size=5000)
        eh = ExpHistogram(k=8)
        for chunk in np.array_split(ts, 7):
            eh.update_batch(chunk)
        assert eh.total == ts.size

    @settings(max_examples=25, deadline=None)
    @given(st.integers(0, 2**32), st.integers(2, 64))
    def test_hard_error_bound_any_order(self, seed, k):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 3000))
        ts = rng.integers(0, 500, size=n)
        eh = ExpHistogram(k=k)
        for chunk in np.array_split(ts, max(1, n // 97)):
            eh.update_batch(chunk)
        for cutoff in rng.integers(-1, 501, size=8):
            est, err = eh.count(int(cutoff))
            true = int((ts > cutoff).sum())
            assert abs(est - true) <= err + 1e-9

    def test_inorder_classic_bound(self):
        eh = ExpHistogram(k=32)
        eh.update_batch(np.arange(500_000))
        for w in (10, 999, 12345, 400_000):
            est, err = eh.count_last(w)
            assert abs(est - w) / w <= eh.rel_error_bound + 1e-12

    def test_bucket_count_bound(self):
        eh = ExpHistogram(k=16)
        eh.update_batch(np.arange(1_000_000))
        levels = int(np.log2(1_000_000)) + 2
        assert eh.n_buckets <= 16 * levels

    def test_merge_commutative_byte_identical(self):
        rng = np.random.default_rng(3)
        ts = rng.integers(0, 10_000, size=40_000)
        a = ExpHistogram(k=16).update_batch(ts[:25_000])
        b = ExpHistogram(k=16).update_batch(ts[25_000:])
        ab = ExpHistogram.from_bytes(a.to_bytes()).merge(b)
        ba = ExpHistogram.from_bytes(b.to_bytes()).merge(a)
        assert ab.to_bytes() == ba.to_bytes()
        assert ab.total == ts.size

    def test_merge_association_stays_in_bounds(self):
        rng = np.random.default_rng(4)
        ts = rng.integers(0, 5000, size=30_000)
        parts = [ExpHistogram(k=16).update_batch(c)
                 for c in np.array_split(ts, 5)]
        left = ExpHistogram.from_bytes(parts[0].to_bytes())
        for p in parts[1:]:
            left.merge(p)
        right = ExpHistogram.from_bytes(parts[-1].to_bytes())
        for p in parts[-2::-1]:
            right.merge(p)
        for cutoff in (0, 1000, 2500, 4999):
            true = int((ts > cutoff).sum())
            for m in (left, right):
                est, err = m.count(cutoff)
                assert abs(est - true) <= err + 1e-9

    def test_weighted_and_pair_forms(self):
        eh1 = ExpHistogram(k=8).update_batch(
            np.array([5, 5, 9]), counts=np.array([3, 1, 2]))
        eh2 = ExpHistogram(k=8).update_batch(
            np.array([[5, 4], [9, 2]]))  # (ts, count) pair rows
        assert eh1.to_bytes() == eh2.to_bytes()
        assert eh1.total == 6

    def test_serde_roundtrip(self):
        eh = ExpHistogram(k=8).update_batch(np.arange(1000))
        assert ExpHistogram.from_bytes(eh.to_bytes()).to_bytes() == eh.to_bytes()

    def test_validation(self):
        with pytest.raises(ValueError):
            ExpHistogram(k=1)
        with pytest.raises(ValueError):
            ExpHistogram(k=8).update_batch(np.array([1]), counts=np.array([-2]))


# ------------------------------------------------------ SlidingHyperLogLog

class TestSlidingHLL:
    @settings(max_examples=15, deadline=None)
    @given(st.integers(0, 2**32))
    def test_window_registers_byte_equal_fresh_hll(self, seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 5000))
        vals = rng.integers(0, 2000, size=n)
        ts = rng.integers(0, 1000, size=n)
        s = SlidingHyperLogLog(p=10, seed=1)
        for lo in range(0, n, 701):
            s.update(vals[lo:lo + 701], ts[lo:lo + 701])
        for cutoff in [None, 0, 250, 500, 999, 1001]:
            h = HyperLogLog(p=10, seed=1)
            mask = np.ones(n, bool) if cutoff is None else ts >= cutoff
            h.update_batch(vals[mask])
            assert s.to_hll(cutoff).to_bytes() == h.to_bytes()

    def test_merge_order_invariant_byte_identical(self):
        rng = np.random.default_rng(8)
        vals = rng.integers(0, 30_000, size=60_000)
        ts = rng.integers(0, 10_000, size=60_000)
        single = SlidingHyperLogLog(p=11, seed=2).update(vals, ts)
        parts = [SlidingHyperLogLog(p=11, seed=2).update(v, t).to_bytes()
                 for v, t in zip(np.array_split(vals, 6),
                                 np.array_split(ts, 6))]
        rng2 = np.random.default_rng(9)
        for _ in range(3):
            order = rng2.permutation(len(parts))
            acc = SlidingHyperLogLog.from_bytes(parts[order[0]])
            for i in order[1:]:
                acc.merge(SlidingHyperLogLog.from_bytes(parts[i]))
            assert acc.to_bytes() == single.to_bytes()

    def test_skyline_bounded(self):
        rng = np.random.default_rng(10)
        s = SlidingHyperLogLog(p=8, seed=0)
        s.update(rng.integers(0, 10**9, size=500_000),
                 rng.integers(0, 10**6, size=500_000))
        counts = np.bincount(s.idx, minlength=s.m)
        assert counts.max() <= 64 - 8 + 1

    def test_distinct_in_last_window_semantics(self):
        s = SlidingHyperLogLog(p=12, seed=0)
        s.update(np.array([1, 2, 3]), np.array([10, 20, 30]))
        # window of 11 ending at t_max=30 covers ts in [20, 30]
        est = s.distinct_in_last(11)
        exact = HyperLogLog(p=12).update_batch(np.array([2, 3])).cardinality()
        assert est == pytest.approx(exact)

    def test_serde_and_validation(self):
        s = SlidingHyperLogLog(p=9, seed=5)
        s.update(np.arange(100), np.arange(100))
        assert SlidingHyperLogLog.from_bytes(s.to_bytes()).to_bytes() == s.to_bytes()
        with pytest.raises(ValueError):
            s.merge(SlidingHyperLogLog(p=10, seed=5))
        with pytest.raises(ValueError):
            s.update_batch(np.zeros((3, 3)))
        with pytest.raises(ValueError):
            SlidingHyperLogLog(p=3)


# -------------------------------------------------------------- EcmSketch

class TestEcmSketch:
    def _stream(self, seed=5, n=120_000):
        rng = np.random.default_rng(seed)
        keys = (rng.zipf(1.3, size=n) % 3000).astype(np.int64)
        ts = rng.integers(0, 50_000, size=n)
        return keys, ts

    def test_hard_upper_bound_and_collision_bound(self):
        keys, ts = self._stream()
        e = EcmSketch(depth=4, width=1024, k=32, seed=7)
        for lo in range(0, keys.size, 30_011):
            e.update(keys[lo:lo + 30_011], ts[lo:lo + 30_011])
        qk = np.arange(40, dtype=np.int64)
        for cutoff in (None, 25_000, 45_000):
            est, err = e.estimate(qk, cutoff)
            mask = np.ones(keys.size, bool) if cutoff is None else ts > cutoff
            true = np.array([(keys[mask] == k).sum() for k in qk], float)
            assert (est + err + 1e-6 >= true).all()
            eps_mass = np.e / 1024 * mask.sum()
            assert (est - err - true <= eps_mass).all()

    def test_merge_commutative_byte_identical(self):
        keys, ts = self._stream(seed=6, n=60_000)
        a = EcmSketch(3, 512, 16, 1).update(keys[:30_000], ts[:30_000])
        b = EcmSketch(3, 512, 16, 1).update(keys[30_000:], ts[30_000:])
        ab = EcmSketch.from_bytes(a.to_bytes()).merge(b)
        ba = EcmSketch.from_bytes(b.to_bytes()).merge(a)
        assert ab.to_bytes() == ba.to_bytes()
        est, err = ab.estimate_last(np.arange(10, dtype=np.int64), 20_000)
        true = np.array([((keys == k) & (ts > ts.max() - 20_000)).sum()
                         for k in range(10)], float)
        assert (est + err + 1e-6 >= true).all()

    def test_weighted_updates_match_repeats(self):
        k = np.array([7, 7, 8], dtype=np.int64)
        t = np.array([100, 200, 100], dtype=np.int64)
        c = np.array([3, 2, 5], dtype=np.int64)
        a = EcmSketch(2, 64, 8, 0).update(k, t, counts=c)
        b = EcmSketch(2, 64, 8, 0).update(np.repeat(k, c), np.repeat(t, c))
        assert a.to_bytes() == b.to_bytes()

    def test_serde_roundtrip_large_sizes(self):
        e = EcmSketch(2, 32, 4, 0)
        e.update(np.zeros(1, np.int64), np.zeros(1, np.int64),
                 counts=np.array([1 << 40]))
        r = EcmSketch.from_bytes(e.to_bytes())
        assert r.to_bytes() == e.to_bytes()
        assert r.size.sum() == 2 * (1 << 40)  # one bucket per depth row

    def test_validation(self):
        with pytest.raises(ValueError):
            EcmSketch(0, 8)
        with pytest.raises(ValueError):
            EcmSketch(2, 8, k=1)
        with pytest.raises(ValueError):
            EcmSketch(2, 8).merge(EcmSketch(2, 16))


# ----------------------------------------------------- harness integration

@pytest.mark.usefixtures("spark")
class TestSlidingHarness:
    def test_build_sketches_byte_identical_to_local(self, spark):
        """Distributed build (partitioned, salted merge tree) of the two
        order-invariant sliding sketches == local single-pass build,
        byte for byte."""
        from p2pddsketch_spark.operators.harness import (SketchSpec,
                                                         build_sketches,
                                                         pair_extractor,
                                                         sketch_from_bytes)
        df = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
              .select("user_id", "ts").repartition(7))
        specs = [SketchSpec("shll",
                            lambda: SlidingHyperLogLog(p=12, seed=4),
                            pair_extractor("user_id", "ts"))]
        rows = build_sketches(df, specs).collect()
        assert len(rows) == 1
        dist = sketch_from_bytes(bytes(rows[0]["sketch"]))
        pdf = df.toPandas()
        vals = pdf["user_id"].to_numpy(np.int64)
        ts = pdf["ts"].astype("datetime64[us]").to_numpy().astype(np.int64)
        local = SlidingHyperLogLog(p=12, seed=4).update(vals, ts)
        assert dist.to_bytes() == local.to_bytes()
        # windowed estimate vs exact distinct, at HLL++ accuracy
        cutoff = int(np.quantile(ts, 0.5))
        exact = len(np.unique(vals[ts >= cutoff]))
        assert dist.cardinality(cutoff) == pytest.approx(exact, rel=0.05)

    def test_ecm_harness_bounds(self, spark):
        from p2pddsketch_spark.operators.harness import (SketchSpec,
                                                         build_sketches,
                                                         pair_extractor,
                                                         sketch_from_bytes)
        df = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
              .select("user_id", "ts").repartition(5))
        specs = [SketchSpec("ecm",
                            lambda: EcmSketch(depth=4, width=1024, k=16,
                                              seed=11),
                            pair_extractor("user_id", "ts"))]
        rows = build_sketches(df, specs).collect()
        e = sketch_from_bytes(bytes(rows[0]["sketch"]))
        pdf = df.toPandas()
        vals = pdf["user_id"].to_numpy(np.int64)
        ts = pdf["ts"].astype("datetime64[us]").to_numpy().astype(np.int64)
        cutoff = int(np.quantile(ts, 0.75))
        qk = np.unique(vals)[:25]
        est, err = e.estimate(qk, cutoff)
        true = np.array([((vals == k) & (ts > cutoff)).sum() for k in qk],
                        float)
        assert (est + err + 1e-6 >= true).all()
        eps_mass = np.e / 1024 * (ts > cutoff).sum()
        assert (est - err - true <= eps_mass).all()


# ------------------------------------------------------- WindowedDDSketch

from p2pddsketch_spark.sketches.wdds import PAIR_DTYPE, WindowedDDSketch


def _vt(v, t):
    out = np.empty(len(v), dtype=PAIR_DTYPE)
    out["v"], out["t"] = v, t
    return out


def _exact_q(data: np.ndarray, q: float) -> float:
    """Reference testQuantile rank convention (main.cpp:1062-1067):
    0-indexed floor(q*(n-1)) of the sorted data."""
    srt = np.sort(data)
    return float(srt[int(np.floor(1 + q * (srt.size - 1))) - 1])


class TestWindowedDDSketch:
    def _stream(self, seed=3, n=120_000, hours=80):
        rng = np.random.default_rng(seed)
        v = rng.lognormal(3.0, 1.0, n)
        t = rng.integers(0, hours * 3600, n)
        return v, t

    def test_window_quantiles_within_alpha(self):
        v, t = self._stream()
        s = WindowedDDSketch(alpha=0.01, bucket_width=3600, max_buckets=256)
        for i in range(0, v.size, 8192):
            s.update_batch(_vt(v[i:i + 8192], t[i:i + 8192]))
        for w_hours in (1, 12, 48):
            ests, n_cov, lo, hi = s.window_quantiles(
                [0.5, 0.95, 0.99], window=w_hours * 3600)
            mask = (t >= lo) & (t < hi)
            assert n_cov == int(mask.sum())  # coverage accounting is exact
            for q, est in zip([0.5, 0.95, 0.99], ests):
                ex = _exact_q(v[mask], q)
                assert abs(est - ex) / ex <= 0.0101

    def test_aligned_window_covers_exactly(self):
        v, t = self._stream(seed=9, n=40_000)
        s = WindowedDDSketch(alpha=0.02, bucket_width=3600,
                             max_buckets=256).update_batch(_vt(v, t))
        # anchor at a bucket-aligned `now`: coverage == the request
        now = (int(t.max()) // 3600) * 3600 - 1
        w = 10 * 3600
        _, n_cov, lo, hi = s.window_quantiles([0.5], window=w, now=now)
        assert (lo, hi) == (now + 1 - w, now + 1)
        assert n_cov == int(((t > now - w) & (t <= now)).sum())

    def test_merge_order_invariant_byte_identical(self):
        v, t = self._stream(seed=5, n=30_000)
        p = _vt(v, t)
        chunks = [p[i::4] for i in range(4)]

        def build(order, batchsize):
            sk = WindowedDDSketch(alpha=0.01, bucket_width=3600,
                                  max_buckets=16)
            for i in order:
                c = chunks[i]
                for j in range(0, c.size, batchsize):
                    sk.update_batch(c[j:j + batchsize])
            return sk

        a = build([0, 1, 2, 3], 8192)
        b = build([3, 1, 0, 2], 977)
        assert a.to_bytes() == b.to_bytes()
        parts = [WindowedDDSketch(alpha=0.01, bucket_width=3600,
                                  max_buckets=16).update_batch(c)
                 for c in chunks]
        m = parts[2].merge(parts[0]).merge(parts[3]).merge(parts[1])
        assert m.to_bytes() == a.to_bytes()

    def test_fold_bounds_memory_and_keeps_full_history(self):
        v, t = self._stream(seed=7)
        s = WindowedDDSketch(alpha=0.01, bucket_width=3600, max_buckets=8)
        for i in range(0, v.size, 8192):
            s.update_batch(_vt(v[i:i + 8192], t[i:i + 8192]))
        assert s.n_live_buckets <= 8
        assert s.n == v.size
        ests, n_cov, lo, _ = s.window_quantiles([0.5, 0.99])
        assert n_cov == v.size
        for q, est in zip([0.5, 0.99], ests):
            ex = _exact_q(v, q)
            assert abs(est - ex) / ex <= 0.0101
        # a window past the retention horizon covers only the live range
        _, n_cov, lo, hi = s.window_quantiles([0.5], window=79 * 3600)
        assert lo >= (int(t.max()) // 3600 - 7) * 3600
        assert n_cov < v.size

    def test_weighted_matches_repeats(self):
        v = np.array([1.0, 5.0, 25.0, 5.0])
        t = np.array([10, 20, 30, 4000])
        w = np.array([3, 2, 1, 4])
        a = WindowedDDSketch(bucket_width=100, max_buckets=50)
        a.update_batch(_vt(v, t), weights=w)
        b = WindowedDDSketch(bucket_width=100, max_buckets=50)
        b.update_batch(_vt(np.repeat(v, w), np.repeat(t, w)))
        assert a.to_bytes() == b.to_bytes()
        assert a.n == int(w.sum())

    def test_serde_roundtrip_and_validation(self):
        v, t = self._stream(seed=1, n=5_000)
        s = WindowedDDSketch(alpha=0.03, bucket_width=7200,
                             max_buckets=4).update_batch(_vt(v, t))
        r = WindowedDDSketch.from_bytes(s.to_bytes())
        assert r.to_bytes() == s.to_bytes()
        assert r.n == s.n
        with pytest.raises(ValueError):
            s.merge(WindowedDDSketch(alpha=0.03, bucket_width=3600,
                                     max_buckets=4))
        from p2pddsketch_spark.errors import ParamError
        with pytest.raises(ParamError):
            WindowedDDSketch(bucket_width=0)
        with pytest.raises(ValueError):
            s.update_batch(np.zeros((3, 2)))
        empty = WindowedDDSketch()
        ests, n_cov, _, _ = empty.window_quantiles([0.5], window=10)
        assert np.isnan(ests).all() and n_cov == 0


# ------------------------------------------------------ WindowedSpaceSaving

def _it(items, ts):
    return np.column_stack((np.asarray(items, dtype=np.int64),
                            np.asarray(ts, dtype=np.int64)))


class TestWindowedSpaceSaving:
    def _stream(self, seed=3, n=60_000, hours=80, universe=40):
        rng = np.random.default_rng(seed)
        items = rng.zipf(1.5, n) % universe  # skewed, bounded universe
        t = rng.integers(0, hours * 3600, n)
        return items.astype(np.int64), t

    def _exact_top(self, items, t, lo, hi, m):
        mask = (t >= lo) & (t < hi)
        uk, uc = np.unique(items[mask], return_counts=True)
        order = np.lexsort((uk, -uc))[:m]
        return [(int(uk[i]), int(uc[i])) for i in order], int(mask.sum())

    def test_exact_regime_matches_truth(self):
        """k >= universe: no bucket ever truncates, so every windowed
        ranking is the exact count table (err == 0) and state is a
        canonical function of the data (byte identity across batch
        segmentation AND merge order)."""
        items, t = self._stream(universe=40)
        s = WindowedSpaceSaving(k=64, bucket_width=3600, max_buckets=256)
        for i in range(0, items.size, 8192):
            s.update_batch(_it(items[i:i + 8192], t[i:i + 8192]))
        for w_hours in (1, 12, 48):
            top, n_cov, lo, hi = s.window_top(10, window=w_hours * 3600)
            want, n_want = self._exact_top(items, t, lo, hi, 10)
            assert n_cov == n_want
            assert [(i, c) for i, c, _ in top] == want
            assert all(err == 0 for _, _, err in top)
        # byte identity: different segmentation and merge order
        p = _it(items, t)
        chunks = [p[i::4] for i in range(4)]
        parts = [WindowedSpaceSaving(k=64, bucket_width=3600,
                                     max_buckets=256).update_batch(c)
                 for c in chunks]
        m = parts[2].merge(parts[0]).merge(parts[3]).merge(parts[1])
        assert m.to_bytes() == s.to_bytes()

    def test_error_bounds_small_k(self):
        """Truncating regime: for every window, tracked items satisfy
        true <= est <= true + err, and every item with windowed count
        > n_covered/k is listed."""
        items, t = self._stream(seed=11, universe=5000, n=80_000)
        k = 16
        s = WindowedSpaceSaving(k=k, bucket_width=3600, max_buckets=256)
        for i in range(0, items.size, 4096):
            s.update_batch(_it(items[i:i + 4096], t[i:i + 4096]))
        for w_hours in (2, 24, 60):
            top, n_cov, lo, hi = s.window_top(None, window=w_hours * 3600)
            mask = (t >= lo) & (t < hi)
            uk, uc = np.unique(items[mask], return_counts=True)
            truth = dict(zip(uk.tolist(), uc.tolist()))
            assert n_cov == int(mask.sum())
            listed = set()
            for item, est, err in top:
                tr = truth.get(item, 0)
                assert tr <= est <= tr + err, (item, tr, est, err)
                listed.add(item)
            thresh = n_cov / k
            for item, tr in truth.items():
                if tr > thresh:
                    assert item in listed, (item, tr, thresh)

    def test_fold_bounds_memory_and_keeps_full_history(self):
        items, t = self._stream(seed=7, universe=30)
        s = WindowedSpaceSaving(k=64, bucket_width=3600, max_buckets=8)
        for i in range(0, items.size, 8192):
            s.update_batch(_it(items[i:i + 8192], t[i:i + 8192]))
        assert s.n_live_buckets <= 8
        assert s.n == items.size
        # full history (exact regime): counts are exact even across the
        # tail fold
        top, n_cov, _, _ = s.window_top(5)
        want, _ = self._exact_top(items, t, int(t.min()), int(t.max()) + 1, 5)
        assert n_cov == items.size
        assert [(i, c) for i, c, _ in top] == want
        # a window past the retention horizon covers only the live range
        _, n_cov, lo, _ = s.window_top(5, window=79 * 3600)
        assert lo >= (int(t.max()) // 3600 - 7) * 3600
        assert n_cov < items.size

    def test_weighted_matches_repeats(self):
        it = np.array([1, 5, 25, 5])
        t = np.array([10, 20, 30, 4000])
        w = np.array([3, 2, 1, 4])
        a = WindowedSpaceSaving(k=8, bucket_width=100, max_buckets=50)
        a.update_batch(_it(it, t), weights=w)
        b = WindowedSpaceSaving(k=8, bucket_width=100, max_buckets=50)
        b.update_batch(_it(np.repeat(it, w), np.repeat(t, w)))
        assert a.to_bytes() == b.to_bytes()
        assert a.n == int(w.sum())

    def test_serde_roundtrip_and_validation(self):
        items, t = self._stream(seed=1, n=5_000, universe=200)
        s = WindowedSpaceSaving(k=16, bucket_width=7200,
                                max_buckets=4).update_batch(_it(items, t))
        r = WindowedSpaceSaving.from_bytes(s.to_bytes())
        assert r.to_bytes() == s.to_bytes()
        assert r.n == s.n
        assert r.top(3) == s.top(3)
        with pytest.raises(ValueError):
            s.merge(WindowedSpaceSaving(k=16, bucket_width=3600,
                                        max_buckets=4))
        from p2pddsketch_spark.errors import ParamError
        with pytest.raises(ParamError):
            WindowedSpaceSaving(bucket_width=0)
        with pytest.raises(ValueError):
            s.update_batch(np.zeros(3))
        empty = WindowedSpaceSaving()
        top, n_cov, _, _ = empty.window_top(5, window=10)
        assert top == [] and n_cov == 0
