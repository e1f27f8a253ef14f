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
