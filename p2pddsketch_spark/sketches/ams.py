"""AMS "tug-of-war" F2 sketch (Alon, Matias & Szegedy, STOC'96) —
mergeable second-moment / join-size estimator over key columns.

Why it belongs in this library: at 100 TB the single most consequential
planner decision is join strategy, and the planner's input is the join
CARDINALITY |A ⋈ B| = Σ_x f_A(x)·f_B(x) — the inner product of the two
key-frequency vectors (Alon, Gibbons, Matias & Szegedy, PODS'99 extends
the F2 sketch to exactly this). An AMS sketch is a tiny linear
projection of that frequency vector: r signed counters
z_j = Σ_x f(x)·s_j(x), s_j(x) ∈ {−1,+1}, so

  * it is MERGEABLE by plain vector addition (the same zero →
    update_batch → merge algebra as every sketch here, so it rides the
    mapInArrow → salted shuffle-merge-tree harness unchanged),
  * it is a LINEAR sketch: deletions are negative weights (same
    turnstile property the KLL± variant provides for quantiles —
    reference deletion semantics at /root/reference/ddsketch.cc:343-393),
  * ⟨z_A, z_B⟩ estimates the join size of two RELATIONS from two
    O(r)-byte states — no data co-location, no shuffle, usable to pick
    broadcast vs shuffle-hash vs sort-merge before launching the join,
  * z·z estimates F2 = Σ_x f(x)² (self-join size / skew mass), the
    quantity that predicts reducer hot keys before a groupBy runs.

Estimator: split the r counters into `groups` equal groups, take the
mean of z_j² (or z_aj·z_bj) within each group, return the MEDIAN of the
group means (median-of-means; variance ≤ 2·F2²/(r/groups) per mean).

Sign function: counter j = 64·ℓ + b takes its sign from bit b of
splitmix64(key, seed·1000003 + ℓ) — one 64-bit hash per (key, lane)
yields 64 signs at once, vectorized via np.unpackbits (no per-row
Python); r > 64 just adds hash lanes (the same seed-ladder count-min
uses for its depth rows, cms.py:36). The per-bit sign family is the
repo's own design choice (documented, deterministic, replayable in
HUGEINT SQL by the DuckDB twin); the classic construction uses 4-wise
independent h_j, and the empirical accuracy of the bit family is pinned
in tests/test_ams.py. Accuracy honesty: with k = r/groups counters per
group the per-group-mean std is ≈ √(2·F2(A)·F2(B)/k) — join-size
estimates are ORDER-OF-MAGNITUDE signals (enough to pick broadcast vs
shuffle), not exact counts; the F2/skew-mass estimate on a skewed
column is much tighter because the signal term dominates.

Deterministic state: given (seed, r), the counter vector is an exact
function of the key multiset — merge order cannot change it (integer
vector addition is associative and commutative), so the gate oracle
hard-checks every counter.
"""

from __future__ import annotations

import struct

import numpy as np

from p2pddsketch_spark.functions.hashing import splitmix64

_MAGIC = b"AMS1"


class AmsSketch:
    __slots__ = ("n_counters", "groups", "seed", "z", "n")

    def __init__(self, n_counters: int = 64, groups: int = 8, seed: int = 7) -> None:
        if n_counters < 1:
            raise ValueError("n_counters must be >= 1")
        if groups < 1 or n_counters % groups != 0:
            raise ValueError("groups must divide n_counters")
        self.n_counters = int(n_counters)
        self.groups = int(groups)
        self.seed = int(seed)
        self.z = np.zeros(n_counters, dtype=np.int64)
        self.n = 0

    # ------------------------------------------------------------- update

    def _sign_bits(self, values: np.ndarray) -> np.ndarray:
        """(len(values), n_counters) uint8 bit matrix; counter 64·ℓ + b's
        sign (1 → +1, 0 → −1) is bit b of lane ℓ's hash
        splitmix64(v, seed·1000003 + ℓ)."""
        v = np.asarray(values).astype(np.int64).ravel()
        lanes = []
        for lane in range((self.n_counters + 63) // 64):
            h = splitmix64(v, seed=self.seed * 1000003 + lane)
            lanes.append(np.unpackbits(
                h.astype("<u8").view(np.uint8).reshape(-1, 8),
                axis=1, bitorder="little"))
        return np.hstack(lanes)[:, : self.n_counters]

    def update_batch(self, values: np.ndarray,
                     weights: np.ndarray | None = None) -> "AmsSketch":
        v = np.asarray(values).astype(np.int64).ravel()
        if v.size == 0:
            return self
        w = (np.ones(v.size, dtype=np.int64) if weights is None
             else np.asarray(weights).astype(np.int64).ravel())
        bits = self._sign_bits(v)
        # z_j += Σ_i w_i·(2·b_ij − 1)  ==  2·(wᵀ b)_j − Σw : one int64
        # matvec instead of materializing the ±1 matrix
        s = bits.astype(np.int64).T @ w
        total = int(w.sum())
        self.z += 2 * s - total
        self.n += total
        return self

    # -------------------------------------------------------------- merge

    def merge(self, other: "AmsSketch") -> "AmsSketch":
        if (self.n_counters, self.groups, self.seed) != \
                (other.n_counters, other.groups, other.seed):
            raise ValueError("AMS shape/seed mismatch")
        self.z += other.z
        self.n += other.n
        return self

    # ----------------------------------------------------------- estimate

    def _median_of_means(self, prods: list[int]) -> float:
        """Median over `groups` of the group means of exact integer
        products. Group sums are exact Python ints (no int64 overflow at
        any scale: |z| ≤ n, so z² can exceed 2^63 once n > ~3·10^9);
        each mean is float(sum)/k — the same round-once-then-divide the
        DuckDB twin's SUM(...)::DOUBLE / k performs, keeping the gate
        comparison bit-stable."""
        k = self.n_counters // self.groups
        means = sorted(float(sum(prods[g * k:(g + 1) * k])) / k
                       for g in range(self.groups))
        mid = self.groups // 2
        if self.groups % 2:
            return means[mid]
        return (means[mid - 1] + means[mid]) / 2.0

    def estimate_f2(self) -> float:
        """Estimate F2 = Σ_x f(x)² (self-join size)."""
        return self._median_of_means([int(a) * int(a) for a in self.z])

    def inner_product(self, other: "AmsSketch") -> float:
        """Estimate Σ_x f_self(x)·f_other(x) — the equi-join cardinality
        of the two sketched key columns. Both sketches must share
        (n_counters, groups, seed) so counter j uses the same signs."""
        if (self.n_counters, self.groups, self.seed) != \
                (other.n_counters, other.groups, other.seed):
            raise ValueError("AMS shape/seed mismatch")
        return self._median_of_means(
            [int(a) * int(b) for a, b in zip(self.z, other.z)])

    # -------------------------------------------------------------- codec

    def to_bytes(self) -> bytes:
        return struct.pack("<4sqqqq", _MAGIC, self.n_counters, self.groups,
                           self.seed, self.n) + self.z.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "AmsSketch":
        magic, r, groups, seed, n = struct.unpack_from("<4sqqqq", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad AMS magic")
        s = cls(n_counters=int(r), groups=int(groups), seed=int(seed))
        s.n = int(n)
        s.z = np.frombuffer(data, dtype="<i8", count=r,
                            offset=struct.calcsize("<4sqqqq")).astype(np.int64)
        return s
