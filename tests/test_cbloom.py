"""CountingBloomFilter: turnstile membership — deletable Bloom.

Reference analog: the insert/delete stream of DDS_DeleteCollapse*
(/root/reference/ddsketch.cc:303-420) applied to set membership.
Contracts pinned here: no false negatives for net-live items,
delete exactly undoes insert (byte identity), merge == one-shot
(byte identity, any order), weight-linearity (uniques×counts ==
raw repeats), bounded FP rate, int32 wire overflow refusal.
"""

from __future__ import annotations

import numpy as np
import pytest

from hypothesis import given, settings, strategies as st

from p2pddsketch_spark.sketches.cbloom import CountingBloomFilter


def test_no_false_negatives_and_bounded_fpp():
    rng = np.random.default_rng(7)
    live = rng.choice(10_000_000, size=5000, replace=False).astype(np.int64)
    s = CountingBloomFilter.for_capacity(5000, fpp=0.01, seed=3)
    s.update_batch(live)
    assert s.contains(live).all()  # no false negatives, ever
    fresh = np.arange(20_000_000, 20_050_000, dtype=np.int64)
    fp = s.contains(fresh).mean()
    assert fp < 0.03  # sized for 1%; 3x slack for hash variance


def test_delete_exactly_undoes_insert():
    rng = np.random.default_rng(11)
    keep = rng.choice(1 << 40, size=3000, replace=False).astype(np.int64)
    churn = (rng.choice(1 << 40, size=2000, replace=False).astype(np.int64)
             + (1 << 41))
    s = CountingBloomFilter(m=1 << 15, k=5, seed=1)
    s.update_batch(keep)
    baseline = s.to_bytes()
    s.update_batch(churn)
    s.delete_batch(churn)
    # counters (not just membership answers) return to the pre-churn
    # state — the turnstile guarantee a bit-Bloom cannot offer
    assert s.to_bytes() == baseline
    assert s.contains(keep).all()


def test_weighted_updates_are_linear():
    vals = np.array([5, 9, 5, 5, 9, 123], dtype=np.int64)
    a = CountingBloomFilter(m=4096, k=4, seed=2).update_batch(vals)
    uniq, cnt = np.unique(vals, return_counts=True)
    b = CountingBloomFilter(m=4096, k=4, seed=2).update_batch(
        uniq, cnt.astype(np.int64))
    assert a.to_bytes() == b.to_bytes()


def test_merge_is_one_shot_any_order():
    rng = np.random.default_rng(5)
    parts = [rng.integers(0, 1 << 30, size=700).astype(np.int64)
             for _ in range(4)]
    one = CountingBloomFilter(m=1 << 14, k=5, seed=9)
    for p in parts:
        one.update_batch(p)
    for perm in ([0, 1, 2, 3], [3, 1, 0, 2]):
        acc = CountingBloomFilter(m=1 << 14, k=5, seed=9)
        for i in perm:
            acc.merge(CountingBloomFilter(m=1 << 14, k=5, seed=9)
                      .update_batch(parts[i]))
        assert acc.to_bytes() == one.to_bytes()


def test_roundtrip_and_net_weight():
    s = CountingBloomFilter(m=1000, k=3, seed=4)
    s.update_batch(np.arange(100, dtype=np.int64),
                   np.full(100, 7, dtype=np.int64))
    s.delete_batch(np.arange(50, dtype=np.int64),
                   np.full(50, 2, dtype=np.int64))
    r = CountingBloomFilter.from_bytes(s.to_bytes())
    assert r.to_bytes() == s.to_bytes()
    assert r.net_weight == 100 * 7 - 50 * 2
    assert np.array_equal(r.counts, s.counts)


def test_shape_mismatch_and_overflow_refused():
    a = CountingBloomFilter(m=512, k=3, seed=0)
    b = CountingBloomFilter(m=512, k=3, seed=1)
    with pytest.raises(ValueError, match="mismatch"):
        a.merge(b)
    s = CountingBloomFilter(m=64, k=1, seed=0)
    with pytest.raises(OverflowError, match="undersized"):
        s.update_batch(np.array([1], dtype=np.int64),
                       np.array([1 << 31], dtype=np.int64))


def test_fully_deleted_item_reads_absent():
    s = CountingBloomFilter(m=1 << 14, k=5, seed=6)
    s.update_batch(np.arange(1000, dtype=np.int64))
    s.delete_batch(np.array([500], dtype=np.int64))
    # 500's slots each lose one count; they can stay >0 only via
    # collisions on ALL 5 slots — essentially never at this load
    assert not s.contains(np.array([500], dtype=np.int64))[0]
    mask = np.ones(1000, dtype=bool)
    mask[500] = False
    assert s.contains(np.arange(1000, dtype=np.int64))[mask].all()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 40),           # key
                          st.integers(1, 9),            # insert weight
                          st.integers(0, 9)),           # delete weight ≤ w
                min_size=1, max_size=60),
       st.integers(0, 3))                               # split point seed
def test_property_interleaved_turnstile(ops, split_seed):
    """Random insert/delete interleavings with deletes ⊆ inserts: every
    key with positive net weight answers True (no false negatives —
    the unconditional guarantee), and a random 2-way split merged back
    is byte-identical to the one-shot build."""
    one = CountingBloomFilter(m=2048, k=4, seed=1)
    parts = [CountingBloomFilter(m=2048, k=4, seed=1) for _ in range(2)]
    net: dict[int, int] = {}
    for i, (key, w, d) in enumerate(ops):
        d = min(d, w)  # delete at most what this op inserted
        kv = np.array([key], dtype=np.int64)
        for s in (one, parts[(i + split_seed) % 2]):
            s.update_batch(kv, np.array([w], dtype=np.int64))
            if d:
                s.delete_batch(kv, np.array([d], dtype=np.int64))
        net[key] = net.get(key, 0) + (w - d)
    merged = parts[0].merge(parts[1])
    assert merged.to_bytes() == one.to_bytes()
    live = np.array([k for k, v in net.items() if v > 0], dtype=np.int64)
    if live.size:
        assert one.contains(live).all()


def test_distributed_build_matches_single_node(spark, sequences_path):
    """Harness build over the tokens arrays == one single-node pass, byte
    identical — counter addition is exact and order-invariant, so the
    salted merge tree cannot perturb the state."""
    from p2pddsketch_spark.operators.harness import (
        SketchSpec, array_extractor, build_sketches, collect_sketches)
    df = spark.read.parquet(sequences_path)
    spec = [SketchSpec("cbf_tokens",
                       lambda: CountingBloomFilter(m=1 << 16, k=5, seed=7),
                       array_extractor("tokens"))]
    got = collect_sketches(build_sketches(df, spec, salt_buckets=8))
    dist = got["cbf_tokens"]

    ref = CountingBloomFilter(m=1 << 16, k=5, seed=7)
    toks = np.concatenate(
        [np.asarray(r["tokens"], dtype=np.int64)
         for r in df.select("tokens").collect()])
    ref.update_batch(toks)
    assert dist.to_bytes() == ref.to_bytes()
    present = np.unique(toks)
    assert dist.contains(present).all()


def test_harness_registry_dispatch():
    from p2pddsketch_spark.operators.harness import sketch_from_bytes
    s = CountingBloomFilter(m=256, k=2, seed=0)
    s.update_batch(np.array([1, 2, 3], dtype=np.int64))
    r = sketch_from_bytes(s.to_bytes())
    assert isinstance(r, CountingBloomFilter)
    assert r.contains(np.array([1, 2, 3], dtype=np.int64)).all()
