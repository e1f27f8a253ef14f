"""Property-based tests (hypothesis) for the sketch algebra —
SURVEY.md §5.2 item 3's "many random permutations/tree shapes" as
generated properties rather than fixed seeds."""

import numpy as np
from hypothesis import given, settings, strategies as st

from p2pddsketch_spark.sketches.ddsketch import DDSketch
from p2pddsketch_spark.sketches.hll import HyperLogLog
from p2pddsketch_spark.sketches.kll import KLLSketch

finite_nonzero = st.floats(min_value=1e-12, max_value=1e12,
                           allow_nan=False, allow_infinity=False)


@settings(max_examples=50, deadline=None)
@given(st.lists(finite_nonzero, min_size=1, max_size=200),
       st.sampled_from([0.01, 0.001]),
       st.booleans())
def test_key_codec_roundtrip_property(vals, alpha, negate):
    s = DDSketch(alpha=alpha, bin_limit=1 << 24)
    v = np.array(vals)
    if negate:
        v = -v
    keys = s.keys_for_values(v)
    est = s.estimate_of_keys(keys)
    rel = np.abs((est - v) / v)
    assert rel.max() <= alpha * (1 + 1e-9)
    # monotone: key order respects value order
    order = np.argsort(v, kind="stable")
    assert (np.diff(keys[order]) >= 0).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(finite_nonzero, min_size=2, max_size=300),
       st.integers(min_value=2, max_value=6),
       st.randoms(use_true_random=False))
def test_merge_permutation_invariance_property(vals, k, rnd):
    v = np.array(vals)
    idx = list(range(len(v)))
    rnd.shuffle(idx)
    parts = np.array_split(np.array(idx), k)
    sketches = [DDSketch(alpha=0.005, bin_limit=1 << 24).update_batch(v[p])
                for p in parts if p.size]
    whole = DDSketch(alpha=0.005, bin_limit=1 << 24).update_batch(v)
    order = list(range(len(sketches)))
    rnd.shuffle(order)
    acc = sketches[order[0]].copy()
    for i in order[1:]:
        acc.merge(sketches[i].copy())
    assert acc.to_bytes() == whole.to_bytes()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=500))
def test_hll_merge_idempotent_commutative(ids):
    v = np.array(ids, dtype=np.int64)
    a = HyperLogLog(p=10).update_batch(v)
    b = HyperLogLog(p=10).update_batch(v)
    # idempotent: merging with itself changes nothing
    merged = HyperLogLog.from_bytes(a.to_bytes()).merge(b)
    assert merged.to_bytes() == a.to_bytes()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=10, max_size=2000))
def test_kll_weight_always_preserved(vals):
    k = KLLSketch(k=16)  # tiny capacity → lots of compaction
    k.update_batch(np.array(vals))
    total = sum(arr.size * (1 << lvl) for lvl, arr in enumerate(k.levels))
    assert total == len(vals) == k.n


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=400),
       st.integers(min_value=0, max_value=10))
def test_cms_never_undercounts_property(ids, seed):
    from p2pddsketch_spark.sketches.cms import CountMinSketch
    v = np.array(ids, dtype=np.int64)
    c = CountMinSketch(depth=3, width=256, seed=seed).update_batch(v)
    uniq, counts = np.unique(v, return_counts=True)
    assert (c.estimate(uniq) >= counts).all()
    assert c.total == v.size


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=300),
       st.integers(min_value=0, max_value=10))
def test_bloom_no_false_negatives_property(ids, seed):
    from p2pddsketch_spark.sketches.bloom import BloomFilter
    v = np.array(ids, dtype=np.int64)
    b = BloomFilter(m_bits=1 << 12, k=3, seed=seed).update_batch(v)
    assert b.contains(v).all()


@settings(max_examples=30, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=500))
def test_theta_exact_below_capacity_property(ids):
    from p2pddsketch_spark.sketches.theta import ThetaSketch
    v = np.array(sorted(ids), dtype=np.int64)
    t = ThetaSketch(k=1024).update_batch(v)
    assert t.cardinality() == float(len(ids))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=50), min_size=10, max_size=800))
def test_spacesaving_guarantee_property(ids):
    from p2pddsketch_spark.sketches.spacesaving import SpaceSaving
    v = np.array(ids, dtype=np.int64)
    s = SpaceSaving(k=8)
    for chunk in np.array_split(v, 4):
        if chunk.size:
            s.update_batch(chunk)
    uniq, counts = np.unique(v, return_counts=True)
    exact = dict(zip(uniq.tolist(), counts.tolist()))
    # floor is the worst-case miss; batch variant keeps it within ~2N/k
    assert s.floor <= 2 * max(s.n, 1) // s.k + 1
    # completeness: every item above the floor is tracked
    for item, f in exact.items():
        if f > s.floor:
            assert item in s.keys
    # soundness: per-item bounds hold by construction
    for item, est, err in s.top():
        f = exact.get(item, 0)
        assert f <= est <= f + err + (0 if err else s.floor)


@settings(max_examples=25, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=400),
       st.integers(min_value=2, max_value=5))
def test_bottomk_merge_equals_whole_property(ids, k_parts):
    from p2pddsketch_spark.sketches.bottomk import BottomKSample
    v = np.array(sorted(ids), dtype=np.int64)
    whole = BottomKSample(k=32, seed=3).update_batch(v)
    acc = BottomKSample(k=32, seed=3)
    for part in np.array_split(v, k_parts):
        acc.merge(BottomKSample(k=32, seed=3).update_batch(part))
    assert acc.to_bytes() == whole.to_bytes()
