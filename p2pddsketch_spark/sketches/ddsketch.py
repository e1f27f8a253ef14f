"""DDSketch — log-γ bucketed quantile sketch with relative-error guarantee α.

A from-scratch, vectorized (numpy) implementation of the sketch algebra of
the reference (`/root/reference/ddsketch.cc`), re-designed for Spark's
shuffle-based partial-aggregation merge tree:

* key codec:   v > 0 → ceil(ln v / ln γ) + offset
               v < 0 → -(ceil(ln(-v) / ln γ) + offset)
               v == 0 → key 0
  (reference `ddsketch.cc:84-104`; offset = 2^30 keeps the three key ranges
  disjoint and ascending-key order == ascending-value order)
* estimator:   x̂(k>0) =  2γ^(k-offset) / (γ+1)
               x̂(k<0) = -2γ^(-k-offset) / (γ+1)
               x̂(0)   = 0
  (reference `ddsketch.cc:106-127`; worst-case in-bucket relative error = α)
* quantile:    first bucket (ascending key) whose cumulative count exceeds
  q·(n−1) (reference `ddsketch.cc:520-557`)
* uniform collapse γ→γ²: every unsigned index i → ceil(i/2), α′=2α/(1+α²)
  (reference `ddsketch.cc:837-911` + `DDS_CollapseKey` `ddsketch.cc:184-210`)
* bounded-memory strategies: 'uniform' (γ² while over bin_limit,
  `DDS_AddCollapse` `ddsketch.cc:213-257`), 'first' (fold 2nd-lowest bucket
  into lowest, `ddsketch.cc:812-835` — the paper's collapsing-lowest variant
  with the published guarantee), 'last' (fold 2nd-highest into highest,
  `ddsketch.cc:788-810`).
* merge: ADDITIVE (sum counts by key, sum n — reference
  `DDS_MergeCollapseFirstBucket` `ddsketch.cc:718-786`), preceded by
  α-alignment: the finer sketch is uniform-collapsed until both γ match
  (reference `DDS_MergeCollapse` α-equalization loop `ddsketch.cc:582-596`).
  The gossip ÷2 averaging of `ddsketch.cc:613-615` and the push-sum weight
  rescaling (`DDS_finalizeGossip`, `ddsketch.cc:988-1002`) are intentionally
  dropped: Spark's shuffle merge tree computes the exact global sum.

Differences from the reference, on purpose:

* counts and n are int64 (reference doubles exist only for gossip
  averaging) → additive merge of canonically-serialized sketches is exact
  and byte-identical regardless of merge order (as long as no
  bound-triggered collapse fires; α-alignment collapses are pointwise
  re-keying and therefore commute with summation).
* the `min_value = γ^(2^29)` overflow quirk (`ddsketch.cc:52`, evaluates to
  +inf) is replaced by the explicit rule "only exact 0.0 maps to key 0".
* NaN policy is explicit: NaNs are skipped and counted in `nan_count`
  (reference `DDS_GetKey` leaves the key uninitialized on NaN).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from p2pddsketch_spark.errors import (EmptySketchError, MergeAlphaMismatch,
                                      ParamError, QuantileRangeError,
                                      SketchError, UnknownCollapseType)

__all__ = ["DDSketch", "DEFAULT_ALPHA", "DEFAULT_BIN_LIMIT", "DEFAULT_OFFSET"]

# Reference defaults: `main.cpp:49-51`.
DEFAULT_ALPHA = 0.01
DEFAULT_BIN_LIMIT = 500
DEFAULT_OFFSET = 1 << 30

# Reference-parity alpha from `main.cpp:51` (used in accuracy-reproduction
# tests; too fine for a 500-bin budget on wide-range data).
REFERENCE_ALPHA = 0.000161167

_STRATEGIES = ("uniform", "first", "last")
_MAGIC = b"DDS1"


def _gamma_chain(alpha0: float, num_collapses: int) -> tuple[float, float, float]:
    """(alpha, gamma, ln_gamma) after `num_collapses` uniform collapses.

    Mirrors the reference's iterative squaring (`ddsketch.cc:855-858`:
    gamma = gamma², ln_gamma = log(gamma), alpha = 2α/(1+α²)) so that two
    sketches that collapsed independently land on bit-identical parameters.
    """
    alpha = float(alpha0)
    gamma = (1.0 + alpha) / (1.0 - alpha)
    for _ in range(num_collapses):
        gamma = gamma * gamma
        alpha = (2.0 * alpha) / (1.0 + alpha * alpha)
    return alpha, gamma, math.log(gamma)


class DDSketch:
    """Mergeable DDSketch over a stream of float64 values.

    State: sorted int64 ``keys`` + int64 ``counts`` (the reference's
    ``std::map<int,double>`` bins, `ddsketch.h:37`), total count ``n``,
    collapse bookkeeping. All hot paths are numpy-vectorized — one
    ``update_batch`` per Arrow batch, never per-row Python.
    """

    __slots__ = (
        "base_alpha", "bin_limit", "offset", "strategy",
        "num_collapses", "alpha", "gamma", "ln_gamma",
        "keys", "counts", "n", "nan_count",
        "head_min_key", "tail_max_key",
    )

    def __init__(
        self,
        alpha: float = DEFAULT_ALPHA,
        bin_limit: int = DEFAULT_BIN_LIMIT,
        strategy: str = "first",
        offset: int = DEFAULT_OFFSET,
        num_collapses: int = 0,
    ) -> None:
        if not (0.0 < alpha < 1.0):
            raise ParamError(f"alpha must be in (0,1), got {alpha}")
        if bin_limit < 2:
            raise ParamError(f"bin_limit must be >= 2, got {bin_limit}")
        if strategy not in _STRATEGIES:
            raise UnknownCollapseType(
                f"strategy must be one of {_STRATEGIES}, got {strategy!r}")
        self.base_alpha = float(alpha)
        self.bin_limit = int(bin_limit)
        self.offset = int(offset)
        self.strategy = strategy
        self.num_collapses = int(num_collapses)
        self.alpha, self.gamma, self.ln_gamma = _gamma_chain(alpha, num_collapses)
        self.keys = np.empty(0, dtype=np.int64)
        self.counts = np.empty(0, dtype=np.int64)
        self.n = 0
        self.nan_count = 0
        # Collapsed-edge key ranges (reference tracks these in dds->min/max
        # for the first/last strategies, `ddsketch.cc:788-835`).
        self.head_min_key: int | None = None
        self.tail_max_key: int | None = None

    # ------------------------------------------------------------------ keys

    def keys_for_values(self, values: np.ndarray) -> np.ndarray:
        """Vectorized key codec (reference `DDS_GetKey`, `ddsketch.cc:84-104`).

        Caller must have removed NaNs. Returns int64 signed keys.
        """
        v = np.asarray(values, dtype=np.float64)
        keys = np.zeros(v.shape, dtype=np.int64)
        pos = v > 0
        neg = v < 0
        if pos.any():
            keys[pos] = np.ceil(np.log(v[pos]) / self.ln_gamma).astype(np.int64) + self.offset
        if neg.any():
            keys[neg] = -(np.ceil(np.log(-v[neg]) / self.ln_gamma).astype(np.int64) + self.offset)
        return keys

    def estimate_of_keys(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized rank estimator (reference `DDS_GetRank`, `ddsketch.cc:106-127`)."""
        k = np.asarray(keys, dtype=np.int64)
        out = np.zeros(k.shape, dtype=np.float64)
        pos = k > 0
        neg = k < 0
        if pos.any():
            out[pos] = 2.0 * np.power(self.gamma, (k[pos] - self.offset).astype(np.float64)) / (self.gamma + 1.0)
        if neg.any():
            out[neg] = -2.0 * np.power(self.gamma, (-k[neg] - self.offset).astype(np.float64)) / (self.gamma + 1.0)
        return out

    def bucket_upper_bounds(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized bucket upper bound γ^i (reference `DDS_GetValue`, `ddsketch.cc:129-150`)."""
        k = np.asarray(keys, dtype=np.int64)
        out = np.zeros(k.shape, dtype=np.float64)
        pos = k > 0
        neg = k < 0
        if pos.any():
            out[pos] = np.power(self.gamma, (k[pos] - self.offset).astype(np.float64))
        if neg.any():
            out[neg] = -np.power(self.gamma, (-k[neg] - self.offset).astype(np.float64))
        return out

    # --------------------------------------------------------------- updates

    def update_batch(self, values: np.ndarray, weights: np.ndarray | None = None) -> "DDSketch":
        """Insert a batch of values (reference `DDS_AddCollapse*` per item,
        `ddsketch.cc:213-341`, amortized over the whole batch).

        ``weights`` (int64, optional) supports pre-aggregated inputs.
        """
        v = np.asarray(values, dtype=np.float64).ravel()
        if v.size == 0:
            return self
        nan_mask = np.isnan(v)
        if nan_mask.any():
            if weights is None:
                self.nan_count += int(nan_mask.sum())
            else:
                self.nan_count += int(np.asarray(weights)[nan_mask].sum())
            v = v[~nan_mask]
            if weights is not None:
                weights = np.asarray(weights)[~nan_mask]
            if v.size == 0:
                return self
        keys = self.keys_for_values(v)
        if weights is None:
            uk, uc = np.unique(keys, return_counts=True)
            uc = uc.astype(np.int64)
        else:
            w = np.asarray(weights, dtype=np.int64).ravel()
            uk, inv = np.unique(keys, return_inverse=True)
            # float64-weighted bincount is EXACT while every partial sum
            # stays <= 2^53 — i.e. per-group mass up to ~9e15 rows, 9000x
            # the 10^12-row design point (the same bound holds at every
            # bincount below and in cms/tdigest). SpaceSaving/eh/ecm use
            # int64 scatter-adds instead because their arrays are tiny;
            # here bincount is the stage-1 hot path and np.add.at's
            # unbuffered scatter would cost real build throughput.
            uc = np.bincount(inv, weights=w.astype(np.float64)).astype(np.int64)
        self._absorb_sorted(uk, uc)
        self.n += int(uc.sum())
        self._maintain_limit()
        return self

    def add(self, value: float) -> "DDSketch":
        """Single-value insert (reference `DDS_AddCollapse`, `ddsketch.cc:213-257`)."""
        return self.update_batch(np.array([value], dtype=np.float64))

    def delete_batch(self, values: np.ndarray) -> "DDSketch":
        """Vectorized turnstile deletes (reference `DDS_DeleteCollapse*`
        per item, `ddsketch.cc:343-518`): decrement each value's bucket,
        clamp at zero, drop emptied buckets; keys inside a collapsed edge
        range redirect to the edge bucket."""
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[~np.isnan(v)]
        if v.size == 0 or self.keys.size == 0:
            return self
        keys = self.keys_for_values(v)
        if self.strategy == "last" and self.tail_max_key is not None:
            keys = np.minimum(keys, self.keys[-1])
        if self.strategy == "first" and self.head_min_key is not None:
            keys = np.maximum(keys, self.keys[0])
        uk, uc = np.unique(keys, return_counts=True)
        idx = np.searchsorted(self.keys, uk)
        valid = (idx < self.keys.size) & (self.keys[np.minimum(idx, self.keys.size - 1)] == uk)
        idx, uc = idx[valid], uc[valid]
        removed = np.minimum(self.counts[idx], uc.astype(np.int64))
        self.counts[idx] -= removed
        self.n -= int(removed.sum())
        keep = self.counts > 0
        if not keep.all():
            self.keys = self.keys[keep]
            self.counts = self.counts[keep]
        return self

    def delete(self, value: float) -> "DDSketch":
        """Remove one previously-inserted value (reference
        `DDS_DeleteCollapse*`, `ddsketch.cc:343-518`): decrement the value's
        bucket, erase it when it reaches zero; if the bucket fell inside a
        collapsed edge range, decrement the edge bucket instead.
        """
        if math.isnan(value):
            return self
        key = int(self.keys_for_values(np.array([value]))[0])
        if self.keys.size == 0:
            return self
        # Collapsed-edge redirects (reference `ddsketch.cc:404-418`, `:467-481`).
        if self.strategy == "last" and self.tail_max_key is not None and key >= int(self.keys[-1]):
            key = int(self.keys[-1])
        if self.strategy == "first" and self.head_min_key is not None and key <= int(self.keys[0]):
            key = int(self.keys[0])
        idx = int(np.searchsorted(self.keys, key))
        if idx < self.keys.size and self.keys[idx] == key and self.counts[idx] > 0:
            self.counts[idx] -= 1
            self.n -= 1
            if self.counts[idx] == 0:
                self.keys = np.delete(self.keys, idx)
                self.counts = np.delete(self.counts, idx)
        return self

    def delete_sketch(self, other: "DDSketch") -> "DDSketch":
        """Bucket-level turnstile subtraction — the batch form of
        `DDS_DeleteCollapse*` (reference `ddsketch.cc:343-518`): remove
        `other`'s entire (key, count) multiset from this sketch, clamped
        at zero, dropping emptied buckets. Distributed delete streams
        build the delete side as a normal (insert) sketch through the
        harness, then subtract here; when neither side has collapsed
        (the bin_limit 2^22 regime) the result's bin counts equal
        inserts − deletes exactly."""
        if self.num_collapses != other.num_collapses or \
                abs(self.base_alpha - other.base_alpha) > 1e-15 or \
                self.offset != other.offset:
            raise SketchError("delete_sketch requires identical codec "
                              "(alpha, offset, collapse state)")
        uk = other.keys.astype(np.int64)
        uc = other.counts.astype(np.int64)
        if uk.size == 0 or self.keys.size == 0:
            return self
        # Collapsed-edge redirects, as in delete_batch.
        if self.strategy == "last" and self.tail_max_key is not None:
            uk = np.minimum(uk, self.keys[-1])
        if self.strategy == "first" and self.head_min_key is not None:
            uk = np.maximum(uk, self.keys[0])
        if uk.size > 1 and (np.diff(uk) <= 0).any():
            uk, inv = np.unique(uk, return_inverse=True)
            uc = np.bincount(inv, weights=uc.astype(np.float64)).astype(np.int64)
        idx = np.searchsorted(self.keys, uk)
        valid = (idx < self.keys.size) & (self.keys[np.minimum(idx, self.keys.size - 1)] == uk)
        idx, uc = idx[valid], uc[valid]
        removed = np.minimum(self.counts[idx], uc)
        self.counts[idx] -= removed
        self.n -= int(removed.sum())
        nan_removed = min(self.nan_count, other.nan_count)
        self.nan_count -= nan_removed
        keep = self.counts > 0
        if not keep.all():
            self.keys = self.keys[keep]
            self.counts = self.counts[keep]
        return self

    def _absorb_sorted(self, uk: np.ndarray, uc: np.ndarray) -> None:
        """Sum-by-key merge of a sorted (key,count) run into the bins."""
        if self.keys.size == 0:
            self.keys, self.counts = uk.astype(np.int64), uc.astype(np.int64)
            return
        # Redirect keys past a collapsed edge into the edge bucket
        # (reference add-variants `ddsketch.cc:269-281`, `:311-323`).
        if self.strategy == "last" and self.tail_max_key is not None:
            hi = self.keys[-1]
            clip = uk > hi
            if clip.any():
                uk = np.where(clip, hi, uk)
                uk, inv = np.unique(uk, return_inverse=True)
                uc = np.bincount(inv, weights=uc.astype(np.float64)).astype(np.int64)
        if self.strategy == "first" and self.head_min_key is not None:
            lo = self.keys[0]
            clip = uk < lo
            if clip.any():
                uk = np.where(clip, lo, uk)
                uk, inv = np.unique(uk, return_inverse=True)
                uc = np.bincount(inv, weights=uc.astype(np.float64)).astype(np.int64)
        allk = np.concatenate([self.keys, uk])
        allc = np.concatenate([self.counts, uc])
        mk, inv = np.unique(allk, return_inverse=True)
        mc = np.bincount(inv, weights=allc.astype(np.float64)).astype(np.int64)
        self.keys, self.counts = mk, mc

    # -------------------------------------------------------------- collapse

    @staticmethod
    def _collapse_keys_once(keys: np.ndarray, offset: int) -> np.ndarray:
        """Re-key under γ→γ²: unsigned index i → ceil(i/2), sign/offset
        preserved (reference `DDS_CollapseKey`, `ddsketch.cc:184-210`)."""
        k = keys.astype(np.int64)
        out = np.zeros_like(k)
        pos = k > 0
        neg = k < 0
        if pos.any():
            i = k[pos] - offset
            out[pos] = -((-i) // 2) + offset  # ceil(i/2) in floor-div arithmetic
        if neg.any():
            i = -k[neg] - offset
            out[neg] = -((-((-i) // 2)) + offset)
        return out

    def _collapse_uniform(self) -> None:
        """γ→γ² uniform collapse (reference `DDS_Collapse`, `ddsketch.cc:837-911`)."""
        self.num_collapses += 1
        self.alpha, self.gamma, self.ln_gamma = _gamma_chain(self.base_alpha, self.num_collapses)
        if self.keys.size:
            nk = self._collapse_keys_once(self.keys, self.offset)
            mk, inv = np.unique(nk, return_inverse=True)
            mc = np.bincount(inv, weights=self.counts.astype(np.float64)).astype(np.int64)
            self.keys, self.counts = mk, mc
        if self.head_min_key is not None:
            self.head_min_key = int(self._collapse_keys_once(np.array([self.head_min_key]), self.offset)[0])
        if self.tail_max_key is not None:
            self.tail_max_key = int(self._collapse_keys_once(np.array([self.tail_max_key]), self.offset)[0])

    def _collapse_first(self) -> None:
        """Fold 2nd-lowest bucket into the lowest, keeping the lowest key
        (reference `DDS_CollapseFirstBucket`, `ddsketch.cc:812-835`:
        `first->second += second->second; erase(second)`)."""
        self.head_min_key = int(self.keys[0]) if self.head_min_key is None else min(self.head_min_key, int(self.keys[0]))
        self.counts[0] += self.counts[1]
        self.keys = np.delete(self.keys, 1)
        self.counts = np.delete(self.counts, 1)

    def _collapse_last(self) -> None:
        """Fold 2nd-highest bucket into highest (reference
        `DDS_CollapseLastBucket`, `ddsketch.cc:788-810`)."""
        self.tail_max_key = int(self.keys[-1]) if self.tail_max_key is None else max(self.tail_max_key, int(self.keys[-1]))
        self.counts[-1] += self.counts[-2]
        self.keys = np.delete(self.keys, self.keys.size - 2)
        self.counts = np.delete(self.counts, self.counts.size - 2)

    def _maintain_limit(self) -> None:
        while self.keys.size > self.bin_limit:
            if self.strategy == "uniform":
                self._collapse_uniform()
            elif self.strategy == "first":
                self._collapse_first()
            else:
                self._collapse_last()

    # ----------------------------------------------------------------- merge

    def merge(self, other: "DDSketch") -> "DDSketch":
        """Additive merge (reference `DDS_MergeCollapseFirstBucket`
        semantics, `ddsketch.cc:718-786`): α-align by uniform-collapsing the
        finer sketch (`ddsketch.cc:582-596`), sum counts by key, sum n,
        then bound-check. In-place on self; returns self.
        """
        if abs(self.base_alpha - other.base_alpha) > 1e-12 or self.offset != other.offset:
            raise MergeAlphaMismatch(
                f"merge alpha/offset mismatch: ({self.base_alpha},{self.offset}) "
                f"vs ({other.base_alpha},{other.offset})"
            )
        if other.num_collapses != self.num_collapses:
            if other.num_collapses > self.num_collapses:
                while self.num_collapses < other.num_collapses:
                    self._collapse_uniform()
            else:
                other = other.copy()
                while other.num_collapses < self.num_collapses:
                    other._collapse_uniform()
        self._absorb_sorted(other.keys, other.counts)
        self.n += other.n
        self.nan_count += other.nan_count
        if other.head_min_key is not None:
            self.head_min_key = other.head_min_key if self.head_min_key is None else min(self.head_min_key, other.head_min_key)
        if other.tail_max_key is not None:
            self.tail_max_key = other.tail_max_key if self.tail_max_key is None else max(self.tail_max_key, other.tail_max_key)
        self._maintain_limit()
        return self

    @classmethod
    def merge_many(cls, sketches: list["DDSketch"]) -> "DDSketch":
        """Order-invariant n-way merge: align every input to the max collapse
        level, sum all bins at once, bound-check ONCE at the end. Because
        uniform collapse is a pointwise re-keying, it commutes with
        summation, so this is associative/commutative by construction —
        the property the gossip protocol only approximates.
        """
        if not sketches:
            raise ValueError("merge_many of empty list")
        target = max(s.num_collapses for s in sketches)
        acc: "DDSketch" | None = None
        for s in sketches:
            s = s.copy()
            while s.num_collapses < target:
                s._collapse_uniform()
            if acc is None:
                acc = s
            else:
                acc._absorb_sorted(s.keys, s.counts)
                acc.n += s.n
                acc.nan_count += s.nan_count
                if s.head_min_key is not None:
                    acc.head_min_key = s.head_min_key if acc.head_min_key is None else min(acc.head_min_key, s.head_min_key)
                if s.tail_max_key is not None:
                    acc.tail_max_key = s.tail_max_key if acc.tail_max_key is None else max(acc.tail_max_key, s.tail_max_key)
        acc._maintain_limit()
        return acc

    # ----------------------------------------------------------------- query

    def quantile(self, q: float) -> float:
        """q-quantile estimate (reference `DDS_GetQuantile`, `ddsketch.cc:520-557`):
        first bucket in ascending key order whose cumulative count exceeds
        q·(n−1); return its rank estimate."""
        return float(self.quantiles([q])[0])

    def quantiles(self, qs) -> np.ndarray:
        qs = np.asarray(qs, dtype=np.float64)
        if ((qs < 0) | (qs > 1.01)).any():  # reference bound `ddsketch.cc:529`
            raise QuantileRangeError(f"quantile out of range: {qs}")
        if self.n <= 0 or self.keys.size == 0:
            return np.full(qs.shape, np.nan)
        cum = np.cumsum(self.counts)
        stops = qs * float(self.n - 1)
        idx = np.searchsorted(cum, stops, side="right")
        idx = np.minimum(idx, self.keys.size - 1)
        return self.estimate_of_keys(self.keys[idx])

    def quantile_key(self, q: float) -> int:
        """Bucket key holding the q-quantile (integer, for exact oracles)."""
        if self.n <= 0 or self.keys.size == 0:
            raise EmptySketchError("empty sketch")
        cum = np.cumsum(self.counts)
        idx = int(np.searchsorted(cum, q * float(self.n - 1), side="right"))
        idx = min(idx, self.keys.size - 1)
        return int(self.keys[idx])

    def bucket_bounds(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(lower, upper) value bounds per bucket (reference `DDS_GetBounds`,
        `ddsketch.cc:152-182`): upper = γ^i, lower = previous bucket's
        upper (γ^(i−1)), sign-mirrored for negative keys."""
        k = np.asarray(keys, dtype=np.int64)
        upper = self.bucket_upper_bounds(k)
        prev = np.where(k > 0, k - 1, np.where(k < 0, k + 1, 0))
        lower = self.bucket_upper_bounds(prev)
        lower = np.where(k == 0, 0.0, lower)
        # for negative buckets the γ-power of the "previous" key is the
        # larger-magnitude (more negative) bound — swap to (lo, hi) order
        lo = np.minimum(lower, upper)
        hi = np.maximum(lower, upper)
        return lo, hi

    def to_bins_table(self):
        """Bins as a list of dict rows (key, count, lower, upper, estimate)
        — the reference's CSV export (`DDS_PrintCSV`, `ddsketch.cc:913-954`)
        as a DataFrame-friendly structure; write with
        `spark.createDataFrame(sketch.to_bins_table())`."""
        lo, hi = self.bucket_bounds(self.keys)
        est = self.estimate_of_keys(self.keys)
        return [
            {"key": int(k), "count": int(c), "lower": float(l),
             "upper": float(h), "estimate": float(e)}
            for k, c, l, h, e in zip(self.keys, self.counts, lo, hi, est)
        ]

    def sum_bins(self) -> int:
        """Σ counts (reference `DDS_SumBins`, `ddsketch.cc:956-970`);
        invariant: equals n under add-only workloads."""
        return int(self.counts.sum())

    @property
    def size(self) -> int:
        """Occupied bins (reference `DDS_Size`, `ddsketch.cc:71-82`)."""
        return int(self.keys.size)

    # --------------------------------------------------------- serialization

    def copy(self) -> "DDSketch":
        s = DDSketch.__new__(DDSketch)
        s.base_alpha = self.base_alpha
        s.bin_limit = self.bin_limit
        s.offset = self.offset
        s.strategy = self.strategy
        s.num_collapses = self.num_collapses
        s.alpha, s.gamma, s.ln_gamma = self.alpha, self.gamma, self.ln_gamma
        s.keys = self.keys.copy()
        s.counts = self.counts.copy()
        s.n = self.n
        s.nan_count = self.nan_count
        s.head_min_key = self.head_min_key
        s.tail_max_key = self.tail_max_key
        return s

    def to_bytes(self) -> bytes:
        """Canonical serialization: keys ascending, little-endian int64.
        Byte-identical across merge orders (when no bound-collapse fires) —
        the north_rule's merge-order-invariance contract (reference CSV
        export `DDS_PrintCSV` `ddsketch.cc:913-954` is the analog)."""
        strat = _STRATEGIES.index(self.strategy)
        head = -(1 << 62) if self.head_min_key is None else self.head_min_key
        tail = -(1 << 62) if self.tail_max_key is None else self.tail_max_key
        hdr = struct.pack(
            "<4sdqqqqqqqq",
            _MAGIC, self.base_alpha, self.bin_limit, self.offset, strat,
            self.num_collapses, self.n, self.nan_count, head, tail,
        )
        return hdr + struct.pack("<q", self.keys.size) + \
            self.keys.astype("<i8").tobytes() + self.counts.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "DDSketch":
        hdr_fmt = "<4sdqqqqqqqq"
        hdr_size = struct.calcsize(hdr_fmt)
        magic, alpha, bin_limit, offset, strat, ncol, n, nan_count, head, tail = \
            struct.unpack_from(hdr_fmt, data, 0)
        if magic != _MAGIC:
            raise ValueError("bad DDSketch magic")
        (nbins,) = struct.unpack_from("<q", data, hdr_size)
        off = hdr_size + 8
        keys = np.frombuffer(data, dtype="<i8", count=nbins, offset=off).astype(np.int64)
        counts = np.frombuffer(data, dtype="<i8", count=nbins, offset=off + 8 * nbins).astype(np.int64)
        s = cls(alpha=alpha, bin_limit=int(bin_limit), strategy=_STRATEGIES[int(strat)],
                offset=int(offset), num_collapses=int(ncol))
        s.keys, s.counts = keys, counts
        s.n = int(n)
        s.nan_count = int(nan_count)
        s.head_min_key = None if head == -(1 << 62) else int(head)
        s.tail_max_key = None if tail == -(1 << 62) else int(tail)
        return s

    def __repr__(self) -> str:  # pragma: no cover
        return (f"DDSketch(alpha={self.alpha:.6g}, bins={self.size}, n={self.n}, "
                f"collapses={self.num_collapses}, strategy={self.strategy!r})")
