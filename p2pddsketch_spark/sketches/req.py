"""REQ sketch — Relative-Error Quantiles over streams.

After "Relative Error Streaming Quantiles" (Cormode, Karnin, Liberty,
Thaler, Veselý — PODS'21): a KLL-style compactor hierarchy whose
compactions always sacrifice the NON-favored end of each sorted buffer
and protect an exponentially managed section structure near the favored
tail, yielding rank error proportional to the rank FROM THAT TAIL —
i.e. multiplicative accuracy exactly where DDSketch gives
multiplicative VALUE accuracy and KLL gives only additive rank
accuracy. This implementation is high-ranks-accurate (HRA: quantiles
near 1 — p99/p999/p9999 — carry the guarantee), the variant a
long-tail latency / sequence-length monitor wants.

Design choices matching the library's discipline
(`sketches/kll.py` precedent):

* **derandomized**: the compaction coin is the low bit of the
  per-compactor state counter and the sections-to-compact count is
  `trailing_ones(state) + 1` — the deterministic schedule from the
  paper's derandomized variant, so identical input order reproduces
  identical state (tested);
* **vectorized**: updates append per-batch sorted slices; compaction
  is numpy sort + stride-2 selection, never per-item Python;
* merge concatenates level-wise then re-compacts — same three-phase
  `zero → update_batch → merge` shape as every other sketch, harness-
  integrated via the REQ1 blob magic.

Like t-digest, the estimator is pytest-bound-verified
(tests/test_req.py) rather than driver-gated: compaction state depends
on arrival order, so only its invariants (total weight, determinism,
bounds) are stable contracts.
"""

from __future__ import annotations

import struct

import numpy as np

from p2pddsketch_spark.errors import MergeAlphaMismatch, ParamError

_MAGIC = b"REQ1"
_SECTION_SIZE_MIN = 4
_INIT_NUM_SECTIONS = 3


def _trailing_ones(v: int) -> int:
    t = 0
    while v & 1:
        t += 1
        v >>= 1
    return t


class _Compactor:
    __slots__ = ("lg_weight", "section_size", "num_sections", "state", "buf")

    def __init__(self, lg_weight: int, section_size: int):
        self.lg_weight = lg_weight
        self.section_size = section_size
        self.num_sections = _INIT_NUM_SECTIONS
        self.state = 0
        self.buf = np.empty(0, dtype=np.float64)

    def capacity(self) -> int:
        return 2 * self.num_sections * self.section_size

    def compact(self) -> np.ndarray:
        """Compact the LOW end (HRA: high ranks are protected) until the
        buffer drops below capacity, promoting every other item of each
        compacted region; returns all promoted items. ONE sort per call
        — the carve loop walks the already-sorted buffer, so a large
        appended batch costs O(B log B), not O(B²) (each carve removes
        only ~sections·section_size items; re-sorting per carve made
        ingestion quadratic). Deterministic: sections-to-compact =
        trailing_ones(state) + 1, offset = state's low bit; compacted
        regions are forced EVEN so every promotion conserves weight
        exactly (2m items of weight w → m items of weight 2w)."""
        self.buf = np.sort(self.buf)
        promoted = []
        while len(self.buf) >= self.capacity():
            secs = min(_trailing_ones(self.state) + 1, self.num_sections - 1)
            compact_len = max(secs * self.section_size, 2)
            # leave at least one protected section; force even length
            compact_len = min(compact_len, len(self.buf) - self.section_size)
            compact_len &= ~1
            if compact_len < 2:
                break
            region = self.buf[:compact_len]
            offset = self.state & 1
            promoted.append(region[offset::2].copy())
            self.buf = self.buf[compact_len:]
            self.state += 1
            if self.state >= (1 << (self.num_sections - 1)):
                self.num_sections <<= 1
                self.section_size = max(self.section_size // 2,
                                        _SECTION_SIZE_MIN)
        return (np.concatenate(promoted) if promoted
                else np.empty(0, dtype=np.float64))


class ReqSketch:
    """High-ranks-accurate relative-error quantile sketch. `k` (even,
    >= 8) trades space for accuracy: rank error at rank r is
    O(sqrt(log(n/k)) / k) * (n - r) for the favored (high) tail."""

    NEEDS_RAW = True  # compaction semantics need the item stream

    __slots__ = ("k", "n", "compactors", "_min", "_max")

    def __init__(self, k: int = 32):
        if k < 8 or k % 2:
            raise ParamError(f"k must be an even integer >= 8, got {k}")
        self.k = int(k)
        self.n = 0
        self.compactors = [_Compactor(0, self.k)]
        self._min = np.inf
        self._max = -np.inf

    # ------------------------------------------------------------ build

    def update_batch(self, values: np.ndarray) -> "ReqSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        if v.size == 0:
            return self
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        self.n += int(v.size)
        c0 = self.compactors[0]
        c0.buf = np.concatenate([c0.buf, v])
        self._compress()
        return self

    def _compress(self) -> None:
        h = 0
        while h < len(self.compactors):
            c = self.compactors[h]
            if len(c.buf) >= c.capacity():
                if h + 1 == len(self.compactors):
                    self.compactors.append(
                        _Compactor(h + 1, self.compactors[h].section_size))
                promoted = c.compact()
                up = self.compactors[h + 1]
                up.buf = np.concatenate([up.buf, promoted])
            else:
                h += 1

    def merge(self, other: "ReqSketch") -> "ReqSketch":
        if self.k != other.k:
            raise MergeAlphaMismatch(
                f"incompatible REQ sketches: k={self.k} vs k={other.k}")
        while len(self.compactors) < len(other.compactors):
            self.compactors.append(_Compactor(
                len(self.compactors), self.compactors[-1].section_size))
        for h, oc in enumerate(other.compactors):
            c = self.compactors[h]
            c.buf = np.concatenate([c.buf, oc.buf])
            # adopt the more-advanced section schedule so the error
            # budget accounting stays monotone under merge
            if oc.num_sections > c.num_sections:
                c.num_sections = oc.num_sections
                c.section_size = oc.section_size
            c.state = max(c.state, oc.state)
        self.n += other.n
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._compress()
        return self

    # ------------------------------------------------------------ query

    def rank(self, x: float) -> int:
        """Estimated number of ingested items <= x."""
        if self.n == 0:
            return 0
        r = 0
        for c in self.compactors:
            if len(c.buf):
                r += int((c.buf <= x).sum()) << c.lg_weight
        return r

    def quantile(self, q: float) -> float:
        if not 0.0 <= q <= 1.0:
            from p2pddsketch_spark.errors import QuantileRangeError
            raise QuantileRangeError(f"q must be in [0,1], got {q}")
        if self.n == 0:
            raise ParamError("empty sketch")
        if q == 0.0:
            return self._min
        if q == 1.0:
            return self._max
        items, weights = [], []
        for c in self.compactors:
            if len(c.buf):
                items.append(c.buf)
                weights.append(np.full(len(c.buf), 1 << c.lg_weight,
                                       dtype=np.int64))
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        it, wt = it[order], wt[order]
        cum = np.cumsum(wt)
        target = q * self.n
        idx = int(np.searchsorted(cum, target, side="left"))
        idx = min(idx, len(it) - 1)
        return float(it[idx])

    @property
    def retained(self) -> int:
        return sum(len(c.buf) for c in self.compactors)

    # ------------------------------------------------------------ codec

    def to_bytes(self) -> bytes:
        head = struct.pack("<4siiqdd", _MAGIC, self.k,
                           len(self.compactors), self.n,
                           float(self._min), float(self._max))
        parts = [head]
        for c in self.compactors:
            c.buf = np.sort(c.buf)
            parts.append(struct.pack("<iiiii", c.lg_weight, c.section_size,
                                     c.num_sections, c.state, len(c.buf)))
            parts.append(c.buf.astype("<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ReqSketch":
        try:
            magic, k, n_comp, n, mn, mx = struct.unpack_from("<4siiqdd", blob)
        except struct.error as e:
            raise ValueError(f"truncated ReqSketch blob: {e}") from e
        if magic != _MAGIC:
            raise ValueError("not a ReqSketch blob")
        sk = cls(k=k)
        sk.n, sk._min, sk._max = int(n), float(mn), float(mx)
        sk.compactors = []
        off = struct.calcsize("<4siiqdd")
        for _ in range(n_comp):
            try:
                lgw, ssz, nsec, state, blen = struct.unpack_from(
                    "<iiiii", blob, off)
            except struct.error as e:
                raise ValueError(f"truncated ReqSketch blob: {e}") from e
            off += struct.calcsize("<iiiii")
            c = _Compactor(lgw, ssz)
            c.num_sections, c.state = nsec, state
            end = off + 8 * blen
            if end > len(blob):
                raise ValueError("truncated ReqSketch blob")
            c.buf = np.frombuffer(blob[off:end], dtype="<f8").copy()
            off = end
            sk.compactors.append(c)
        if off != len(blob):
            raise ValueError("trailing bytes in ReqSketch blob")
        return sk
