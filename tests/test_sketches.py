"""Unit tests for HLL / count-min / Bloom / KLL / t-digest (no Spark).

The reference has only DDSketch; these sketches are the north_rule's
gap-fill set. Each test checks update+merge+query against an exact
oracle within the sketch's published bound, plus serialization and
merge associativity.
"""

import numpy as np
import pytest

from p2pddsketch_spark.sketches.hll import HyperLogLog
from p2pddsketch_spark.sketches.cms import CountMinSketch
from p2pddsketch_spark.sketches.bloom import BloomFilter
from p2pddsketch_spark.sketches.kll import KLLSketch
from p2pddsketch_spark.sketches.tdigest import TDigest


def zipf_tokens(n, vocab=50257, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.zipf(1.2, n)
    return np.clip(t, 1, vocab - 1).astype(np.int64)


# ------------------------------------------------------------------- HLL

def test_hll_accuracy():
    tokens = zipf_tokens(200_000, seed=1)
    h = HyperLogLog(p=14)
    h.update_batch(tokens)
    exact = len(np.unique(tokens))
    est = h.cardinality()
    # tightened from 5% after the HLL++ bias correction (round-3):
    # 3σ at p=14 is ~2.5%
    assert abs(est - exact) / exact < 0.025


def test_hll_plus_plus_midrange_sweep():
    """The former bias trough (n between 2.5m and 5m, where raw
    overestimates and linear counting has given up): with the empirical
    bias table the single-trial relative error stays within ~4σ across
    the whole sweep at p=14 — the round-2 'HLL lacks mid-range bias
    correction' item, now bound-tested."""
    p = 14
    m = 1 << p
    for i, n in enumerate([m // 4, m // 2, m, 2 * m, 3 * m, 4 * m, 5 * m,
                           6 * m, 8 * m]):
        h = HyperLogLog(p=p)
        h.update_batch(np.arange(n, dtype=np.int64) + np.int64(i + 7) * (np.int64(1) << np.int64(45)))
        est = h.cardinality()
        assert abs(est - n) / n < 0.033, (n, est)


def test_hll_merge_equals_union():
    a_tok, b_tok = zipf_tokens(50_000, seed=2), zipf_tokens(50_000, seed=3)
    a = HyperLogLog(p=12).update_batch(a_tok)
    b = HyperLogLog(p=12).update_batch(b_tok)
    union = HyperLogLog(p=12).update_batch(np.concatenate([a_tok, b_tok]))
    merged = HyperLogLog.from_bytes(a.to_bytes()).merge(b)
    assert np.array_equal(merged.registers, union.registers)  # exact state equality
    # merge is commutative
    merged2 = HyperLogLog.from_bytes(b.to_bytes()).merge(a)
    assert merged.to_bytes() == merged2.to_bytes()


def test_hll_roundtrip():
    h = HyperLogLog(p=10, seed=5).update_batch(np.arange(1000))
    assert HyperLogLog.from_bytes(h.to_bytes()).to_bytes() == h.to_bytes()


# ------------------------------------------------------------------- CMS

def test_cms_overcounts_only_and_bounded():
    tokens = zipf_tokens(100_000, seed=4)
    c = CountMinSketch(depth=5, width=8192)
    c.update_batch(tokens)
    uniq, counts = np.unique(tokens, return_counts=True)
    est = c.estimate(uniq)
    assert (est >= counts).all()  # never undercounts
    eps = np.e / c.width
    # Markov bound per row; with depth=5 essentially all estimates within eps*N
    assert (est - counts <= eps * c.total).mean() > 0.999
    # heavy hitters are near-exact
    top = np.argsort(counts)[-20:]
    assert (np.abs(est[top] - counts[top]) / counts[top] < 0.05).all()


def test_cms_merge_additive():
    a_tok, b_tok = zipf_tokens(30_000, seed=5), zipf_tokens(30_000, seed=6)
    a = CountMinSketch(depth=4, width=4096).update_batch(a_tok)
    b = CountMinSketch(depth=4, width=4096).update_batch(b_tok)
    whole = CountMinSketch(depth=4, width=4096).update_batch(np.concatenate([a_tok, b_tok]))
    merged = CountMinSketch.from_bytes(a.to_bytes()).merge(b)
    assert np.array_equal(merged.table, whole.table)
    assert merged.total == whole.total


def test_cms_weighted_update():
    c = CountMinSketch(depth=4, width=1024)
    c.update_batch(np.array([7, 9]), weights=np.array([10, 3]))
    assert c.estimate(np.array([7]))[0] >= 10
    assert c.total == 13


# ----------------------------------------------------------------- Bloom

def test_bloom_no_false_negatives():
    tokens = np.unique(zipf_tokens(50_000, seed=7))
    b = BloomFilter.for_capacity(len(tokens), fpp=0.01)
    b.update_batch(tokens)
    assert b.contains(tokens).all()


def test_bloom_fpp_bounded():
    present = np.arange(0, 20_000, dtype=np.int64)
    absent = np.arange(1_000_000, 1_040_000, dtype=np.int64)
    b = BloomFilter.for_capacity(len(present), fpp=0.01)
    b.update_batch(present)
    fpp = b.contains(absent).mean()
    assert fpp < 0.03


def test_bloom_merge_is_union():
    a = BloomFilter(m_bits=1 << 16, k=4).update_batch(np.arange(100))
    b = BloomFilter(m_bits=1 << 16, k=4).update_batch(np.arange(100, 200))
    merged = BloomFilter.from_bytes(a.to_bytes()).merge(b)
    assert merged.contains(np.arange(200)).all()
    whole = BloomFilter(m_bits=1 << 16, k=4).update_batch(np.arange(200))
    assert np.array_equal(merged.bits, whole.bits)


# ------------------------------------------------------------------- KLL

def test_kll_rank_accuracy():
    rng = np.random.default_rng(8)
    data = rng.normal(0, 1, 100_000)
    k = KLLSketch(k=256)
    k.update_batch(data)
    srt = np.sort(data)
    for q in [0.01, 0.1, 0.5, 0.9, 0.99]:
        est = k.quantile(q)
        # rank error: position of est in sorted data vs q*n
        rank = np.searchsorted(srt, est) / data.size
        assert abs(rank - q) < 0.02, f"q={q} rank={rank}"


def test_kll_merge_accuracy_and_n():
    rng = np.random.default_rng(9)
    a_d, b_d = rng.normal(0, 1, 40_000), rng.normal(5, 2, 40_000)
    a = KLLSketch(k=256).update_batch(a_d)
    b = KLLSketch(k=256).update_batch(b_d)
    merged = KLLSketch.from_bytes(a.to_bytes()).merge(b)
    assert merged.n == 80_000
    data = np.sort(np.concatenate([a_d, b_d]))
    for q in [0.1, 0.5, 0.9]:
        rank = np.searchsorted(data, merged.quantile(q)) / data.size
        assert abs(rank - q) < 0.03


def test_kll_weight_preservation():
    k = KLLSketch(k=64)
    k.update_batch(np.arange(10_000, dtype=np.float64))
    total_weight = sum(arr.size * (1 << lvl) for lvl, arr in enumerate(k.levels))
    assert total_weight == 10_000 == k.n


def test_kll_roundtrip():
    k = KLLSketch(k=128).update_batch(np.random.default_rng(0).normal(0, 1, 5000))
    assert KLLSketch.from_bytes(k.to_bytes()).n == k.n


# -------------------------------------------------------------- t-digest

def test_tdigest_quantile_accuracy():
    rng = np.random.default_rng(10)
    data = rng.normal(10, 3, 100_000)
    t = TDigest(delta=200)
    t.update_batch(data)
    srt = np.sort(data)
    for q in [0.001, 0.01, 0.5, 0.99, 0.999]:
        est = t.quantile(q)
        rank = np.searchsorted(srt, est) / data.size
        assert abs(rank - q) < 0.005, f"q={q} rank={rank}"


def test_tdigest_merge():
    rng = np.random.default_rng(11)
    a_d, b_d = rng.exponential(1, 50_000), rng.exponential(1, 50_000)
    a = TDigest(delta=200).update_batch(a_d)
    b = TDigest(delta=200).update_batch(b_d)
    merged = TDigest.from_bytes(a.to_bytes()).merge(b)
    assert merged.n == 100_000
    data = np.sort(np.concatenate([a_d, b_d]))
    for q in [0.1, 0.5, 0.9, 0.99]:
        rank = np.searchsorted(data, merged.quantile(q)) / data.size
        assert abs(rank - q) < 0.01


def test_tdigest_bounded_size():
    t = TDigest(delta=100)
    t.update_batch(np.random.default_rng(1).normal(0, 1, 200_000))
    assert t.means.size < 300  # ~delta centroids


def test_tdigest_min_max_clamp():
    t = TDigest(delta=100).update_batch(np.array([1.0, 2.0, 3.0]))
    assert t.quantile(0.0) >= 1.0
    assert t.quantile(1.0) <= 3.0


# ---------------------------------------------------------------- KLL±

def test_turnstile_kll_quantiles():
    from p2pddsketch_spark.sketches.kll_turnstile import TurnstileKLL
    rng = np.random.default_rng(12)
    keep = rng.normal(0, 1, 60_000)
    churn = rng.normal(3, 1, 20_000)
    t = TurnstileKLL(k=256)
    t.update_batch(np.concatenate([keep, churn]))
    t.delete_batch(churn)
    assert t.n == keep.size
    srt = np.sort(keep)
    for q in [0.1, 0.5, 0.9, 0.99]:
        est = t.quantile(q)
        rank = np.searchsorted(srt, est) / keep.size
        assert abs(rank - q) < 0.04, f"q={q} rank={rank}"


def test_turnstile_kll_merge_and_roundtrip():
    from p2pddsketch_spark.sketches.kll_turnstile import TurnstileKLL
    rng = np.random.default_rng(13)
    a_keep, b_keep = rng.normal(0, 1, 20_000), rng.normal(5, 1, 20_000)
    a = TurnstileKLL(k=256).update_batch(a_keep)
    a.delete_batch(a_keep[:5_000])
    b = TurnstileKLL(k=256).update_batch(b_keep)
    merged = TurnstileKLL.from_bytes(a.to_bytes()).merge(b)
    assert merged.n == 35_000
    live = np.sort(np.concatenate([a_keep[5_000:], b_keep]))
    for q in [0.25, 0.5, 0.75]:
        rank = np.searchsorted(live, merged.quantile(q)) / live.size
        assert abs(rank - q) < 0.05


# ---------------------------------------------------------- SpaceSaving

def test_spacesaving_heavy_hitters():
    from p2pddsketch_spark.sketches.spacesaving import SpaceSaving
    tokens = zipf_tokens(200_000, seed=20)
    s = SpaceSaving(k=64)
    # feed in chunks to exercise truncation
    for chunk in np.array_split(tokens, 20):
        s.update_batch(chunk)
    uniq, counts = np.unique(tokens, return_counts=True)
    exact = dict(zip(uniq.tolist(), counts.tolist()))
    # the eviction floor stays near the classic N/k guarantee
    assert s.floor <= 2 * s.n // s.k
    # every item with f > floor must be present
    for item, f in exact.items():
        if f > s.floor:
            assert item in s.keys, item
    # estimates never undercount, and overcount at most the tracked error
    for item, est, err in s.top():
        f = exact.get(item, 0)
        assert f <= est <= f + max(err, 1)


def test_spacesaving_merge():
    from p2pddsketch_spark.sketches.spacesaving import SpaceSaving
    a_t, b_t = zipf_tokens(50_000, seed=21), zipf_tokens(50_000, seed=22)
    a = SpaceSaving(k=64).update_batch(a_t)
    b = SpaceSaving(k=64).update_batch(b_t)
    merged = SpaceSaving.from_bytes(a.to_bytes()).merge(b)
    assert merged.n == 100_000
    both = np.concatenate([a_t, b_t])
    uniq, counts = np.unique(both, return_counts=True)
    top_true = set(uniq[np.argsort(-counts)[:10]].tolist())
    top_est = {t for t, _, _ in merged.top(20)}
    assert len(top_true & top_est) >= 9  # top-10 essentially recovered


def test_spacesaving_counts_exact_past_2_53():
    """Count accumulation is exact int64, not float-weighted bincount:
    weights past 2^53 (where float64 loses unit precision) must sum
    exactly — same no-float-weights discipline as eh.py/ecm.py."""
    from p2pddsketch_spark.sketches.spacesaving import SpaceSaving
    big = (1 << 53) + 1
    s = SpaceSaving(k=4)
    s.update_batch(np.array([7]), weights=np.array([big]))
    s.update_batch(np.array([7, 9]), weights=np.array([3, 5]))
    top = dict((t, c) for t, c, _ in s.top())
    assert top[7] == big + 3          # float64 would round the +3 away
    assert top[9] == 5
    m = SpaceSaving(k=4).update_batch(np.array([7]),
                                      weights=np.array([big]))
    m.merge(s)
    assert dict((t, c) for t, c, _ in m.top())[7] == 2 * big + 3


# ---------------------------------------------------------------- Theta

def test_theta_cardinality_and_setops():
    from p2pddsketch_spark.sketches.theta import ThetaSketch
    a_ids = np.arange(0, 60_000, dtype=np.int64)
    b_ids = np.arange(40_000, 120_000, dtype=np.int64)  # overlap 20k
    a = ThetaSketch(k=4096).update_batch(a_ids)
    b = ThetaSketch(k=4096).update_batch(b_ids)
    assert abs(a.cardinality() - 60_000) / 60_000 < 0.05
    assert abs(a.union_cardinality(b) - 120_000) / 120_000 < 0.05
    assert abs(a.intersection_cardinality(b) - 20_000) / 20_000 < 0.12
    assert abs(a.difference_cardinality(b) - 40_000) / 40_000 < 0.12


def test_theta_exact_below_capacity_and_merge():
    from p2pddsketch_spark.sketches.theta import ThetaSketch
    a = ThetaSketch(k=4096).update_batch(np.arange(1000))
    assert a.cardinality() == 1000.0  # exact
    b = ThetaSketch(k=4096).update_batch(np.arange(500, 1500))
    m = ThetaSketch.from_bytes(a.to_bytes()).merge(b)
    assert m.cardinality() == 1500.0
    assert a.intersection_cardinality(b) == 500.0


# --------------------------------------------------------------- bottom-k

def test_bottomk_deterministic_mergeable_uniform():
    from p2pddsketch_spark.sketches.bottomk import BottomKSample
    from p2pddsketch_spark.functions.hashing import splitmix64
    ids = np.arange(100_000, dtype=np.int64)
    whole = BottomKSample(k=500, seed=9).update_batch(ids)
    # exact oracle: k smallest tags over all ids
    tags = splitmix64(ids, seed=9)
    expect = ids[np.argsort(tags)[:500]]
    assert np.array_equal(np.sort(whole.sample()), np.sort(expect))
    # merge of arbitrary splits is byte-identical to the whole
    rng = np.random.default_rng(0)
    parts = np.array_split(rng.permutation(ids), 7)
    acc = BottomKSample(k=500, seed=9)
    for p in parts:
        acc.merge(BottomKSample(k=500, seed=9).update_batch(p))
    assert acc.to_bytes() == whole.to_bytes()
    # KMV cardinality from the sample
    assert abs(whole.cardinality() - 100_000) / 100_000 < 0.1
    # duplicates don't double-enter
    dup = BottomKSample(k=500, seed=9).update_batch(np.concatenate([ids, ids]))
    assert dup.to_bytes() == whole.to_bytes()


def test_error_code_table_parity():
    """Every reference error code -1..-16 (error.h:10-26) is either a
    typed exception with the matching REF_CODE or explicitly documented
    as structurally impossible in the Spark design."""
    import pytest
    from p2pddsketch_spark import errors as E
    from p2pddsketch_spark.sketches.ddsketch import DDSketch
    covered = set(E.REF_CODES) | set(E.NOT_APPLICABLE)
    assert covered >= set(range(-16, 1))
    for code, cls in E.REF_CODES.items():
        assert cls.REF_CODE == code
    with pytest.raises(E.ParamError):
        DDSketch(alpha=2.0)
    with pytest.raises(E.ParamError):
        DDSketch(bin_limit=1)
    with pytest.raises(E.UnknownCollapseType):
        DDSketch(strategy="nope")
    # the broad class still catches (backward compatibility)
    with pytest.raises(E.SketchError):
        DDSketch(alpha=-1.0)


def test_fd_spectral_bound_and_psd():
    """Frequent Directions deterministic guarantee on random and low-rank
    data: 0 <= A'A - B'B (PSD) and ||A'A - B'B||_2 <= 2||A||_F^2 / ell."""
    import numpy as np
    from p2pddsketch_spark.sketches.fd import FrequentDirections
    rng = np.random.default_rng(8)
    for mk in [lambda: rng.standard_normal((3000, 32)),
               lambda: rng.standard_normal((3000, 4)) @ rng.standard_normal((4, 32))
               + 0.01 * rng.standard_normal((3000, 32))]:
        a = mk()
        fd = FrequentDirections(ell=8, d=32)
        for lo in range(0, len(a), 500):
            fd.update_batch(a[lo:lo + 500])
        diff = a.T @ a - fd.gram()
        eig = np.linalg.eigvalsh(diff)
        fro2 = float((a * a).sum())
        assert eig.min() >= -1e-6 * fro2            # PSD up to num. noise
        assert eig.max() <= 2.0 * fro2 / 8 + 1e-9   # spectral bound
        assert abs(fd.error_bound() - 2.0 * fro2 / 8) < 1e-6 * fro2


def test_fd_merge_preserves_bound_and_lossless_mode():
    import numpy as np
    from p2pddsketch_spark.sketches.fd import FrequentDirections
    rng = np.random.default_rng(9)
    a = rng.standard_normal((2000, 16))
    halves = [FrequentDirections(ell=6, d=16).update_batch(h)
              for h in (a[:1000], a[1000:])]
    merged = halves[0].merge(halves[1])
    diff = a.T @ a - merged.gram()
    eig = np.linalg.eigvalsh(diff)
    fro2 = float((a * a).sum())
    assert eig.min() >= -1e-6 * fro2
    assert eig.max() <= 2.0 * fro2 / 6 + 1e-9
    assert merged.n == 2000
    # lossless mode: ell >= rank -> exact gram even through merges
    lossless = [FrequentDirections(ell=16, d=16).update_batch(h)
                for h in (a[:1000], a[1000:])]
    exact = lossless[0].merge(lossless[1]).gram()
    assert np.allclose(exact, a.T @ a, rtol=1e-9, atol=1e-7)


def test_fd_top_direction_recovery_and_roundtrip():
    import numpy as np
    from p2pddsketch_spark.sketches.fd import FrequentDirections
    rng = np.random.default_rng(10)
    u = rng.standard_normal(24); u /= np.linalg.norm(u)
    a = np.outer(rng.standard_normal(4000) * 10, u) \
        + 0.05 * rng.standard_normal((4000, 24))
    fd = FrequentDirections(ell=6, d=24).update_batch(a)
    top = fd.top_directions(1)[0]
    assert abs(float(top @ u)) > 0.99
    # serialization roundtrip preserves gram and metadata
    from p2pddsketch_spark.sketches.fd import FrequentDirections as FD
    back = FD.from_bytes(fd.to_bytes())
    assert np.allclose(back.gram(), fd.gram())
    assert back.n == fd.n and abs(back.sum_sq - fd.sum_sq) < 1e-9
    # flat (harness extractor) input equals matrix input
    flat = FD(ell=6, d=24).update_batch(a.ravel())
    assert np.allclose(flat.gram(), fd.gram(), rtol=1e-8, atol=1e-8)


def test_file_error_on_empty_path(tmp_path):
    import pytest
    from p2pddsketch_spark.errors import FileError
    from p2pddsketch_spark.operators.harness import parquet_file_list
    with pytest.raises(FileError):
        parquet_file_list(str(tmp_path / "nowhere"))


def test_weighted_topk_aes_properties():
    """A-ES weighted sampling: merge == one-shot, roundtrip, and the
    weighting actually biases inclusion toward heavy items."""
    import numpy as np
    from p2pddsketch_spark.sketches.weightedk import WeightedTopK, aes_tags
    rng = np.random.default_rng(11)
    n = 20_000
    ids = np.arange(n, dtype=np.int64)
    # half the items weigh 100x more
    w = np.where(ids % 2 == 0, 1000, 10).astype(np.int64)
    pairs = np.column_stack([ids, w])
    one = WeightedTopK(k=500, seed=5).update_batch(pairs)
    a = WeightedTopK(k=500, seed=5).update_batch(pairs[: n // 2])
    b = WeightedTopK(k=500, seed=5).update_batch(pairs[n // 2:])
    merged = a.merge(b)
    assert np.array_equal(np.sort(one.sample()), np.sort(merged.sample()))
    # heavy items dominate the sample (expected share >> 50%)
    heavy_share = (one.sample() % 2 == 0).mean()
    assert heavy_share > 0.9, heavy_share
    # exact selection: top-500 by directly computed tags
    tags = aes_tags(ids, w, seed=5)
    expect = set(ids[np.argsort(tags)[::-1][:500]].tolist())
    assert set(one.sample().tolist()) == expect
    # serialization roundtrip
    back = WeightedTopK.from_bytes(one.to_bytes())
    assert np.array_equal(back.sample(), one.sample())
    assert np.array_equal(back.tags, one.tags)


# ------------------------------------------------------ sparse HLL codec

def test_hll_sparse_codec_roundtrip_and_size():
    """Small groups serialize as (u32 idx, u8 rho) pairs — 523 B instead
    of 16 KiB at p=14 for a 100-id group (the per-(group,salt,partition)
    partial a grouped rollup shuffles); the format choice is a pure
    function of state, so byte-identity properties are unaffected."""
    from p2pddsketch_spark.sketches.hll import HyperLogLog
    small = HyperLogLog(p=14).update_batch(np.arange(100))
    blob = small.to_bytes()
    assert blob[:4] == b"HLL2" and len(blob) < 1024
    back = HyperLogLog.from_bytes(blob)
    assert (back.registers == small.registers).all()
    assert back.to_bytes() == blob
    assert back.cardinality() == small.cardinality()
    dense = HyperLogLog(p=14).update_batch(np.arange(200_000))
    dblob = dense.to_bytes()
    assert dblob[:4] == b"HLL1"
    assert HyperLogLog.from_bytes(dblob).to_bytes() == dblob


def test_hll_mixed_format_merge_byte_identity():
    """Merging a sparse partial into a dense one (either order) equals
    the direct superset build byte-for-byte — the wire format never
    leaks into merge semantics (also covers the harness blob path via
    sketch_from_bytes dispatch on both magics)."""
    from p2pddsketch_spark.operators.harness import sketch_from_bytes
    from p2pddsketch_spark.sketches.hll import HyperLogLog
    sparse = HyperLogLog(p=12).update_batch(np.arange(50))
    dense = HyperLogLog(p=12).update_batch(np.arange(100_000))
    m1 = sketch_from_bytes(sparse.to_bytes()).merge(
        sketch_from_bytes(dense.to_bytes()))
    m2 = sketch_from_bytes(dense.to_bytes()).merge(
        sketch_from_bytes(sparse.to_bytes()))
    direct = HyperLogLog(p=12).update_batch(np.arange(100_000))
    assert m1.to_bytes() == m2.to_bytes() == direct.to_bytes()
