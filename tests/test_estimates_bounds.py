"""Bound verification of the hash-dependent estimate VALUES from the
one-pass 8-sketch build (`q_sketch_estimates_events`) against exact
oracles — the pytest half of the round-3 split: deterministic counters
moved into the hard-oracled driver-gate query `sketch_counts_events`;
the estimates stay here, each checked against its sketch's published
guarantee (HLL standard error, KLL/t-digest rank error, DDSketch
relative error, SpaceSaving no-undercount, Bloom occupancy)."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def metrics(spark):
    from p2pddsketch_spark.plans import queries as Q
    df = Q.q_sketch_estimates_events(spark, SF_DIR).toPandas()
    return dict(zip(df["metric"], df["value"]))


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def rank_of(sorted_vals: np.ndarray, x: float) -> float:
    """Fractional rank of x in the sorted value array."""
    return np.searchsorted(sorted_vals, x, side="right") / len(sorted_vals)


def test_counters_exact(metrics, events):
    assert metrics["n_rows"] == float(events["value"].notna().sum())
    assert metrics["cms_users_total"] == float(events["user_id"].notna().sum())


def test_hll_cardinality_bound(metrics, events):
    """p=14 → relative standard error 1.04/√2¹⁴ ≈ 0.81%; allow 4σ (and the
    fixture cardinality sits in the near-exact linear-counting regime)."""
    exact = events["user_id"].nunique()
    assert abs(metrics["hll_users_cardinality"] - exact) <= max(4 * 0.0081 * exact, 2.0)


@pytest.mark.parametrize("metric,q,tol", [
    ("kll_value_p50", 0.50, 0.02),
    ("kll_value_p99", 0.99, 0.02),
    ("kllpm_value_p50", 0.50, 0.02),
    ("tdigest_value_p50", 0.50, 0.03),
    ("tdigest_value_p99", 0.99, 0.03),
])
def test_rank_error_bounds(metrics, events, metric, q, tol):
    """Rank-error sketches: the estimate's fractional rank among the true
    values must be within tol of q (KLL k=256 ⇒ ε ≈ 1.7%/√… well under
    2% at this n; t-digest δ=200 similar at the median, looser tails)."""
    vals = np.sort(events["value"].dropna().to_numpy(dtype=np.float64))
    r = rank_of(vals, metrics[metric])
    assert q - tol <= r <= min(q + tol, 1.0), (metric, r)


def test_ddsketch_relative_error(metrics, events):
    """DDSketch guarantee: p99 estimate within α=1% relative error of the
    exact rank-selected p99 (+1 ulp headroom for the round(6))."""
    vals = np.sort(events["value"].dropna().to_numpy(dtype=np.float64))
    exact = vals[int(np.ceil(0.99 * (len(vals) - 1)))]
    assert abs(metrics["dds_value_p99"] - exact) / exact <= 0.0101


def test_spacesaving_never_undercounts(metrics, events):
    """SpaceSaving reports count + error ceiling: the top item's reported
    count is ≥ its true count and ≤ true + n/k."""
    counts = events["user_id"].value_counts()
    true_top = counts.iloc[0]
    n = int(counts.sum())
    assert true_top <= metrics["ss_top_user_count"] <= true_top + n / 64


def test_bloom_occupancy(metrics, events):
    """Bits set ∈ (0, k·distinct]: at most k bits per distinct insert."""
    d = events["user_id"].nunique()
    assert 0 < metrics["bloom_users_bits_set"] <= 5 * d


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_hll_vs_spark_hllpp_all_fixture_scales(spark, sf):
    """Round-2 verdict item #6 receipt: our HLL++ (bias-corrected)
    against BOTH the exact distinct count and Spark's built-in HLL++
    (`approx_count_distinct`), at all three fixture scales. user_id sits
    in the linear-counting regime and event_id walks through mid-range
    (sf0.01: ~60k ∈ [2.5m, 5m] at p=14) into the raw regime (sf0.1)."""
    from pyspark.sql import functions as F
    from p2pddsketch_spark.sketches.hll import HyperLogLog
    ev = pd.read_parquet(f"/root/testdata/{sf}/events.parquet")
    sdf = spark.read.parquet(f"/root/testdata/{sf}/events.parquet")
    for col, tol in (("user_id", 0.02), ("event_id", 0.025)):
        exact = ev[col].nunique()
        h = HyperLogLog(p=14).update_batch(ev[col].to_numpy(dtype=np.int64))
        assert abs(h.cardinality() - exact) / max(exact, 1) <= tol, (col, exact)
        spark_est = sdf.agg(F.approx_count_distinct(col, 0.02)).collect()[0][0]
        assert abs(spark_est - exact) / max(exact, 1) <= 0.06, (col, exact)
