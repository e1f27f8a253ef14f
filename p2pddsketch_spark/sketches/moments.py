"""Moment sketch — quantile estimation from low-order moments.

After "Moment-Based Quantile Sketches for Efficient High Cardinality
Aggregation Queries" (Gan, Ding, Tai, Sharan, Bailis — VLDB'18): the
state is k power sums of arcsinh-transformed values plus (n, min, max);
queries solve the maximum-entropy density matching those moments and
read quantiles off its CDF. The state is O(k) — the smallest mergeable
quantile summary in the library — and merge is pure addition, so it
slots straight into the harness (`operators/harness.py`) beside
DDSketch (/root/reference/ddsketch.cc merge semantics analog: additive,
order-invariant, no collapse needed because the state never grows).

Two deliberate deviations from the paper, both for this repo's
oracle-parity discipline:

* the transform is written as `z = ln(x + sqrt(x*x + 1))` (literally
  asinh) and power sums use libm `pow` — ln/sqrt/pow are bit-identical
  across numpy, the JVM, and DuckDB on this platform, so every engine
  computes the same doubles;
* each row's `(z/zscale)^j` is quantized to an INTEGER
  (`floor(v * 2^40 + 0.5)`) before summing, making the distributed
  state exactly reproducible in SQL (integer sums are associative —
  float sums are not) at a 2^-40 moment precision far below the
  estimator's own error. `zscale` bounds |z/zscale| <= 1 for
  |x| < sinh(zscale), keeping every quantized row within int64;
  accumulators are Python ints (unbounded), serialized as 128-bit.

Estimates are solver-based (Newton on the Chebyshev-basis max-entropy
problem) and hence pytest-bound-verified like HLL/CMS estimates
(tests/test_estimates_bounds.py pattern); the REGISTERED gate surface
is the deterministic integer state, which has a hard DuckDB twin.
"""

from __future__ import annotations

import struct

import numpy as np

from p2pddsketch_spark.errors import MergeAlphaMismatch, ParamError

_MAGIC = b"MOM1"
QUANT_BITS = 40
QUANT = float(1 << QUANT_BITS)


def asinh_transform(x: np.ndarray) -> np.ndarray:
    """z = ln(x + sqrt(x² + 1)) — asinh spelled in the ln/sqrt ops that
    are bit-identical across numpy / JVM / DuckDB libm."""
    return np.log(x + np.sqrt(x * x + 1.0))


class MomentSketch:
    """Mergeable moment summary: n, z-min/max, and k quantized power
    sums of z/zscale. `k` in [2, 16]; `zscale` is a merge-compatibility
    parameter like DDSketch's alpha."""

    __slots__ = ("k", "zscale", "n", "zmin", "zmax", "sums", "_solved")

    def __init__(self, k: int = 8, zscale: float = 8.0):
        if not 2 <= k <= 16:
            raise ParamError(f"k must be in [2, 16], got {k}")
        if not zscale > 0:
            raise ParamError(f"zscale must be positive, got {zscale}")
        self.k = int(k)
        self.zscale = float(zscale)
        self.n = 0
        self.zmin = np.inf
        self.zmax = -np.inf
        self.sums = [0] * self.k          # Python ints: exact, unbounded
        self._solved = None               # (state_key, maxent solution)

    # ------------------------------------------------------------ build

    def update_batch(self, values: np.ndarray,
                     counts: np.ndarray | None = None) -> "MomentSketch":
        """Ingest values, optionally weighted by integer `counts` (the
        harness feeds (uniques, counts) — identical rows quantize
        identically, so the weighted sum equals the per-row sum).
        |q| ≤ 2^40 since |z/zscale| ≤ 1, so the in-batch Σ qⱼ·c stays
        int64-exact while total weight < 2^22; heavier batches (weighted
        OR raw) switch to a vectorized hi/lo 20-bit lane split, exact to
        2^42 total weight (see guard below). Cross-batch accumulation is
        always exact Python ints."""
        v = np.asarray(values, dtype=np.float64)
        fin = np.isfinite(v)
        if counts is not None:
            counts = np.asarray(counts, dtype=np.int64)[fin]
        v = v[fin]
        if v.size == 0:
            return self
        z = asinh_transform(v)
        zs = z / self.zscale
        if np.abs(zs).max() > 1.0:
            lim = np.sinh(self.zscale)
            raise ParamError(
                f"|value| beyond sinh(zscale)={lim:.3g}; raise zscale")
        self.zmin = min(self.zmin, float(z.min()))
        self.zmax = max(self.zmax, float(z.max()))
        self.n += int(v.size) if counts is None else int(counts.sum())
        # int64 wrap guard (weighted AND raw paths): |q| <= 2^40, so the
        # plain batch sum is bounded by 2^40 · W (W = Σcounts, or the
        # row count when unweighted) — exact int64 while W < 2^22. For
        # heavier batches (pre-aggregated frequency tables, or one huge
        # raw update_batch call) split q into hi/lo 20-bit lanes:
        # Σ q·c = 2^20·Σ q_hi·c + Σ q_lo·c with |q_hi|, q_lo < 2^21, so
        # each int64 lane is exact while W < 2^42 — vectorized, no
        # Python inner loop. Beyond 2^42 (absurd for one batch) fall
        # back to unbounded Python ints rather than wrap silently.
        total_w = int(v.size) if counts is None else int(counts.sum())
        lanes = total_w >= (1 << 22)
        for j in range(1, self.k + 1):
            # libm pow keeps the per-row doubles engine-identical
            q = np.floor(np.power(zs, float(j)) * QUANT + 0.5).astype(np.int64)
            if total_w >= (1 << 42):
                c_it = counts if counts is not None else (1,) * q.size
                self.sums[j - 1] += sum(
                    int(a) * int(c) for a, c in zip(q, c_it))
                continue
            if lanes:
                q_hi = q >> 20                  # arithmetic shift: floor
                q_lo = q - (q_hi << 20)         # in [0, 2^20)
                if counts is not None:
                    q_hi, q_lo = q_hi * counts, q_lo * counts
                self.sums[j - 1] += (
                    (int(q_hi.sum(dtype=np.int64)) << 20)
                    + int(q_lo.sum(dtype=np.int64)))
                continue
            if counts is not None:
                q = q * counts
            self.sums[j - 1] += int(q.sum(dtype=np.int64))
        self._solved = None
        return self

    def merge(self, other: "MomentSketch") -> "MomentSketch":
        if self.k != other.k or self.zscale != other.zscale:
            raise MergeAlphaMismatch(
                f"incompatible moment sketches: (k={self.k}, zscale="
                f"{self.zscale}) vs (k={other.k}, zscale={other.zscale})")
        self.n += other.n
        self.zmin = min(self.zmin, other.zmin)
        self.zmax = max(self.zmax, other.zmax)
        self.sums = [a + b for a, b in zip(self.sums, other.sums)]
        self._solved = None
        return self

    # ------------------------------------------------------------ codec

    def to_bytes(self) -> bytes:
        head = struct.pack("<4siddqd", _MAGIC, self.k, self.zscale,
                           float(self.zmin), self.n, float(self.zmax))
        body = b"".join(s.to_bytes(16, "little", signed=True)
                        for s in self.sums)
        return head + body

    @classmethod
    def from_bytes(cls, blob: bytes) -> "MomentSketch":
        magic, k, zscale, zmin, n, zmax = struct.unpack_from("<4siddqd", blob)
        if magic != _MAGIC:
            raise ValueError("not a MomentSketch blob")
        want = struct.calcsize("<4siddqd") + 16 * k
        if len(blob) != want:
            # a truncated blob would otherwise deserialize to silent
            # zero power sums (int.from_bytes over short slices)
            raise ValueError(
                f"truncated MomentSketch blob: {len(blob)} != {want} bytes")
        sk = cls(k=k, zscale=zscale)
        sk.n, sk.zmin, sk.zmax = int(n), float(zmin), float(zmax)
        off = struct.calcsize("<4siddqd")
        sk.sums = [int.from_bytes(blob[off + 16 * i: off + 16 * (i + 1)],
                                  "little", signed=True) for i in range(k)]
        return sk

    # --------------------------------------------------------- moments

    def scaled_moments(self) -> np.ndarray:
        """[1, E[zs], E[zs²], …, E[zs^k]] of zs = z/zscale."""
        if self.n == 0:
            raise ParamError("empty sketch")
        mu = np.empty(self.k + 1)
        mu[0] = 1.0
        for j in range(1, self.k + 1):
            mu[j] = (self.sums[j - 1] / QUANT) / self.n
        return mu

    def mean(self) -> float:
        """Mean of z (NOT of x — asinh-space, like the paper's log-mode)."""
        return float(self.scaled_moments()[1] * self.zscale)

    # ---------------------------------------------------- maxent solve

    def _solve_density(self, k_use: int):
        """Max-entropy density on u ∈ [-1, 1] (affine image of
        [zmin, zmax] in zs-space) matching the first k_use Chebyshev
        moments. Returns (u_grid, weights, density) or None."""
        from numpy.polynomial import chebyshev as C
        lo, hi = self.zmin / self.zscale, self.zmax / self.zscale
        if not hi > lo:                     # degenerate: all values equal
            return None
        a, b = 2.0 / (hi - lo), -(hi + lo) / (hi - lo)
        mu = self.scaled_moments()[: k_use + 1]
        # power moments of u = a·zs + b via the binomial transform
        mu_u = np.empty(k_use + 1)
        for m in range(k_use + 1):
            i = np.arange(m + 1)
            binom = np.array([_comb(m, t) for t in i], dtype=np.float64)
            mu_u[m] = float(np.sum(binom * (a ** i) * (b ** (m - i)) * mu[i]))
        # Chebyshev-basis targets d_m = E[T_m(u)]
        d = np.empty(k_use + 1)
        for m in range(k_use + 1):
            pc = C.cheb2poly(np.eye(k_use + 1)[m])
            d[m] = float(np.sum(pc * mu_u[: len(pc)]))
        # Newton on lambda: f(u) = exp(sum lambda_m T_m(u))
        ug, wg = np.polynomial.legendre.leggauss(256)
        tb = C.chebvander(ug, k_use)                     # (256, k_use+1)
        lam = np.zeros(k_use + 1)
        lam[0] = -np.log(2.0)                            # uniform start
        best = None
        for _ in range(200):
            expo = np.clip(tb @ lam, -300.0, 300.0)
            f = np.exp(expo)
            g = (tb * (wg * f)[:, None]).sum(axis=0) - d
            err = float(np.abs(g).max())
            if best is None or err < best[0]:
                best = (err, lam.copy(), f.copy())
            if err < 1e-10:
                break
            h = tb.T @ (tb * (wg * f)[:, None])
            try:
                step = np.linalg.solve(h, g)
            except np.linalg.LinAlgError:
                break
            # damped update: halve until the residual stops exploding
            scale = 1.0
            for _ in range(30):
                cand = lam - scale * step
                fc = np.exp(np.clip(tb @ cand, -300.0, 300.0))
                gc = (tb * (wg * fc)[:, None]).sum(axis=0) - d
                if float(np.abs(gc).max()) < err:
                    lam = cand
                    break
                scale *= 0.5
            else:
                break
        if best is None or best[0] > 1e-5:
            return None
        return ug, wg, best[2], (a, b)

    def quantile(self, q: float) -> float:
        """Estimate the q-quantile of the ingested values via the
        max-entropy density; falls back to fewer moments on solver
        failure and to the (min, max) interval in the worst case."""
        if not 0.0 <= q <= 1.0:
            from p2pddsketch_spark.errors import QuantileRangeError
            raise QuantileRangeError(f"q must be in [0,1], got {q}")
        if self.n == 0:
            raise ParamError("empty sketch")
        if self.zmax <= self.zmin:
            return float(np.sinh(self.zmin))
        # the Newton solve depends only on the state, not on q — cache it
        # so a multi-quantile probe (p50/p95/p99/p999…) solves once
        key = (self.n, self.zmin, self.zmax, tuple(self.sums))
        if self._solved is not None and self._solved[0] == key:
            sol = self._solved[1]
        else:
            sol = None
            for k_use in range(self.k, 1, -1):
                sol = self._solve_density(k_use)
                if sol is not None:
                    break
            self._solved = (key, sol)
        lo, hi = self.zmin / self.zscale, self.zmax / self.zscale
        if sol is None:                      # last resort: uniform on range
            zs = lo + q * (hi - lo)
            return float(np.sinh(zs * self.zscale))
        ug, wg, f, (a, b) = sol
        mass = wg * f
        cdf = np.cumsum(mass)
        cdf = cdf / cdf[-1]
        u = float(np.interp(q, cdf, ug))
        zs = (u - b) / a
        zs = min(max(zs, lo), hi)
        return float(np.sinh(zs * self.zscale))


def _comb(n: int, r: int) -> int:
    from math import comb
    return comb(n, r)
