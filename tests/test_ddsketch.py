"""Unit tests for the DDSketch core (no Spark).

Mirrors the reference's correctness methodology: `testQuantile`
(`/root/reference/main.cpp:1041-1082`) computes exact quantiles with
quickselect at index floor(1 + q·(n−1)) and asserts relative error ≤ α;
datasets are the reference generator's three modes
(`main.cpp:1002-1039`): normal(1,3), exponential(λ), uniform(a,b).
"""

import numpy as np
import pytest

from p2pddsketch_spark.sketches.ddsketch import DDSketch, REFERENCE_ALPHA

QS = [0.01, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.99]  # main.cpp:778


def exact_quantile(data: np.ndarray, q: float) -> float:
    """Reference oracle: element at index floor(1 + q*(n-1)) of the sorted
    data, 1-indexed → 0-indexed floor(q*(n-1)) after the off-by-one in
    main.cpp:1062-1067 (`idx = floor(1 + q*(n-1))`, then nth_element(idx-1))."""
    n = data.size
    idx = int(np.floor(1 + q * (n - 1))) - 1
    return float(np.partition(data.copy(), idx)[idx])


def rel_err(est: float, exact: float) -> float:
    if exact == 0:
        return abs(est)
    return abs((est - exact) / exact)


# ---------------------------------------------------------------- key codec

def test_key_codec_signs_and_zero():
    s = DDSketch(alpha=0.01, bin_limit=1 << 20)
    vals = np.array([3.7, 0.0, -3.7, 1.0, -1.0, 1e-12, -1e-12, 1e12])
    keys = s.keys_for_values(vals)
    assert keys[1] == 0
    assert keys[0] > 0 and keys[2] < 0
    assert keys[0] == -keys[2]  # mirrored
    # ascending key order == ascending value order
    order = np.argsort(keys)
    assert list(vals[order]) == sorted(vals)


def test_key_estimator_roundtrip_within_alpha():
    for alpha in (0.01, 0.001, REFERENCE_ALPHA):
        s = DDSketch(alpha=alpha, bin_limit=1 << 24)
        rng = np.random.default_rng(7)
        vals = np.concatenate([
            rng.lognormal(0, 3, 2000),
            -rng.lognormal(0, 3, 2000),
        ])
        keys = s.keys_for_values(vals)
        ests = s.estimate_of_keys(keys)
        re = np.abs((ests - vals) / vals)
        assert re.max() <= alpha * (1 + 1e-9), f"alpha={alpha}: {re.max()}"


def test_nan_policy():
    s = DDSketch(alpha=0.01)
    s.update_batch(np.array([1.0, np.nan, 2.0, np.nan]))
    assert s.n == 2
    assert s.nan_count == 2


def test_sum_bins_invariant():
    s = DDSketch(alpha=0.01, bin_limit=1 << 20)
    rng = np.random.default_rng(3)
    s.update_batch(rng.normal(1, 3, 10_000))
    assert s.sum_bins() == s.n == 10_000


def test_add_delete_inverse():
    s = DDSketch(alpha=0.01, bin_limit=1 << 20)
    s.update_batch(np.array([5.0, 5.0, 7.0]))
    s.delete(5.0)
    s.delete(7.0)
    assert s.n == 1
    assert s.sum_bins() == 1
    assert rel_err(s.quantile(0.5), 5.0) <= 0.01


# ------------------------------------------------- reference accuracy repro

@pytest.mark.parametrize("dist", ["normal", "exponential", "uniform"])
@pytest.mark.parametrize("ni", [508, 100_000])
def test_reference_accuracy_reproduction(dist, ni):
    """The `testQuantile` contract at the reference default α=0.000161167
    (`main.cpp:49-51`), bin_limit sized so no collapse fires."""
    rng = np.random.default_rng(42)
    if dist == "normal":
        data = rng.normal(1, 3, ni)  # main.cpp:39-40 defaults
    elif dist == "exponential":
        data = rng.exponential(1 / 0.002, ni)
    else:
        data = rng.uniform(100, 1000, ni)
    s = DDSketch(alpha=REFERENCE_ALPHA, bin_limit=1 << 26, strategy="uniform")
    s.update_batch(data)
    assert s.num_collapses == 0
    for q in QS:
        exact = exact_quantile(data, q)
        est = s.quantile(q)
        assert rel_err(est, exact) <= REFERENCE_ALPHA * (1 + 1e-6), (
            f"{dist} ni={ni} q={q}: est={est} exact={exact}")


def test_bounded_memory_uniform_collapse_guarantee():
    """Under bin_limit pressure the uniform strategy degrades α
    predictably (α′=2α/(1+α²) per collapse) and still meets the degraded
    bound (reference `DDS_AddCollapse` + `DDS_Collapse`)."""
    rng = np.random.default_rng(11)
    data = rng.lognormal(0, 4, 50_000)
    s = DDSketch(alpha=0.001, bin_limit=256, strategy="uniform")
    s.update_batch(data)
    assert s.size <= 256
    assert s.num_collapses >= 1
    for q in QS:
        assert rel_err(s.quantile(q), exact_quantile(data, q)) <= s.alpha * (1 + 1e-9)


def test_bounded_memory_first_bucket():
    """Collapsing-lowest keeps upper quantiles exact-within-α (paper's
    guarantee; reference `DDS_AddCollapseFirstBucket`)."""
    rng = np.random.default_rng(12)
    data = rng.lognormal(0, 4, 50_000)
    s = DDSketch(alpha=0.01, bin_limit=500, strategy="first")
    s.update_batch(data)
    assert s.size <= 500
    # guarantee holds only for quantiles ABOVE the collapsed head mass
    q_min = float(s.counts[0]) / s.n + 0.02
    for q in [0.9, 0.95, 0.99, 0.999]:
        assert q > q_min
        assert rel_err(s.quantile(q), exact_quantile(data, q)) <= 0.01 * (1 + 1e-9)
    # quantiles inside the collapsed head still return the head bucket's
    # estimate (no crash, bounded below by the true minimum's bucket)
    assert s.quantile(0.0) <= exact_quantile(data, q_min)


def test_bounded_memory_last_bucket():
    rng = np.random.default_rng(13)
    data = rng.lognormal(0, 4, 50_000)
    s = DDSketch(alpha=0.01, bin_limit=500, strategy="last")
    s.update_batch(data)
    assert s.size <= 500
    # guarantee holds only for quantiles BELOW the collapsed tail mass
    q_max = 1.0 - float(s.counts[-1]) / s.n - 0.02
    for q in [0.001, 0.01, 0.1, 0.2]:
        assert q < q_max
        assert rel_err(s.quantile(q), exact_quantile(data, q)) <= 0.01 * (1 + 1e-9)


# --------------------------------------------------------------- merge laws

def _random_split(data, k, rng):
    idx = rng.permutation(data.size)
    return [data[part] for part in np.array_split(idx, k)]


def test_merge_matches_single_sketch():
    rng = np.random.default_rng(21)
    data = rng.normal(1, 3, 20_000)
    whole = DDSketch(alpha=0.001, bin_limit=1 << 22).update_batch(data)
    parts = _random_split(data, 7, rng)
    sketches = [DDSketch(alpha=0.001, bin_limit=1 << 22).update_batch(p) for p in parts]
    merged = DDSketch.merge_many(sketches)
    assert merged.to_bytes() == whole.to_bytes()


def test_merge_order_invariance_bytes():
    """north_rule: merging per-partition sketches in any order yields
    byte-identical final sketches. Includes the reference's adversarial
    sorted-contiguous-range partitioning (`main.cpp:285`, `:691-748`)."""
    rng = np.random.default_rng(22)
    data = rng.lognormal(0, 2, 30_000)
    layouts = []
    for k in (1, 2, 7, 32):
        layouts.append(_random_split(data, k, rng))
    srt = np.sort(data)
    bounds = np.cumsum(rng.uniform(0.9, 1.1, 8))
    bounds = (bounds / bounds[-1] * data.size).astype(int)[:-1]
    layouts.append(np.split(srt, bounds))  # adversarial sorted ranges
    skewed = [srt[: int(0.9 * srt.size)], srt[int(0.9 * srt.size):]]
    layouts.append(skewed)

    blobs = set()
    for layout in layouts:
        sketches = [DDSketch(alpha=0.001, bin_limit=1 << 22).update_batch(p)
                    for p in layout if p.size]
        for _ in range(3):  # several random merge orders per layout
            order = rng.permutation(len(sketches))
            acc = sketches[order[0]].copy()
            for i in order[1:]:
                acc.merge(sketches[i].copy())
            blobs.add(acc.to_bytes())
        blobs.add(DDSketch.merge_many(sketches).to_bytes())
    assert len(blobs) == 1


def test_merge_alpha_alignment():
    """Sketches that collapsed different numbers of times merge by
    aligning the finer one (reference `ddsketch.cc:582-596`)."""
    rng = np.random.default_rng(23)
    a_data = rng.lognormal(0, 1, 10_000)
    b_data = rng.lognormal(0, 6, 10_000)  # wide → forces collapses
    a = DDSketch(alpha=0.001, bin_limit=512, strategy="uniform").update_batch(a_data)
    b = DDSketch(alpha=0.001, bin_limit=512, strategy="uniform").update_batch(b_data)
    assert b.num_collapses > a.num_collapses
    merged = a.copy().merge(b)
    assert merged.n == 20_000
    assert merged.num_collapses >= b.num_collapses
    data = np.concatenate([a_data, b_data])
    for q in QS:
        assert rel_err(merged.quantile(q), exact_quantile(data, q)) <= merged.alpha * (1 + 1e-9)


def test_merge_alpha_mismatch_raises():
    a = DDSketch(alpha=0.01)
    b = DDSketch(alpha=0.02)
    with pytest.raises(ValueError):
        a.merge(b)


def test_quantile_out_of_range_raises():
    s = DDSketch(alpha=0.01).update_batch(np.array([1.0]))
    with pytest.raises(ValueError):
        s.quantile(1.5)  # reference error code −6, `ddsketch.cc:529-532`


# ------------------------------------------------------------ serialization

def test_bytes_roundtrip():
    rng = np.random.default_rng(31)
    s = DDSketch(alpha=0.005, bin_limit=400, strategy="first")
    s.update_batch(np.concatenate([rng.lognormal(0, 3, 5000), -rng.lognormal(0, 1, 500), np.zeros(3)]))
    t = DDSketch.from_bytes(s.to_bytes())
    assert t.to_bytes() == s.to_bytes()
    assert t.n == s.n and t.size == s.size
    assert np.isclose(t.quantile(0.9), s.quantile(0.9))


def test_bucket_bounds_and_bins_table():
    """DDS_GetBounds / DDS_PrintCSV analogs: every inserted value lies in
    its bucket's (lower, upper]; table counts sum to n."""
    s = DDSketch(alpha=0.01, bin_limit=1 << 20)
    rng = np.random.default_rng(41)
    vals = np.concatenate([rng.lognormal(0, 2, 1000), -rng.lognormal(0, 2, 1000)])
    s.update_batch(vals)
    keys = s.keys_for_values(vals)
    lo, hi = s.bucket_bounds(keys)
    assert ((vals > lo) & (vals <= hi + 1e-12 * np.abs(hi))).all()
    table = s.to_bins_table()
    assert sum(r["count"] for r in table) == s.n
    assert all(r["lower"] <= r["estimate"] <= r["upper"] for r in table)


def test_negative_and_zero_quantiles():
    s = DDSketch(alpha=0.01, bin_limit=1 << 20)
    data = np.array([-100.0, -10.0, -1.0, 0.0, 1.0, 10.0, 100.0])
    s.update_batch(data)
    assert s.quantile(0.0) < 0
    assert abs(s.quantile(0.5)) <= 0.02
    assert s.quantile(1.0) > 0
