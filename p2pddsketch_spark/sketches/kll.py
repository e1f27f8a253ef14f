"""KLL quantile sketch (Karnin-Lang-Liberty 2016; KLL± VLDB'21 in
PAPERS.md) — uniform-rank-guarantee quantiles, complementing DDSketch's
relative-value guarantee.

Deterministic variant: the compaction offset alternates per level instead
of being random, so results are reproducible and merge trees yield
deterministic sketches (required by the north_rule's reproducibility
posture; the classic analysis assumes random offsets, the alternating
rule is the standard derandomization and behaves comparably in practice).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"KLL1"


class KLLSketch:
    __slots__ = ("k", "levels", "flip", "n")

    def __init__(self, k: int = 256) -> None:
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.flip: list[int] = [0]
        self.n = 0

    def _capacity(self, level: int) -> int:
        # capacity shrinks geometrically (2/3) toward lower levels
        depth = len(self.levels)
        c = self.k * (2.0 / 3.0) ** (depth - 1 - level)
        return max(2, int(np.ceil(c)))

    NEEDS_RAW = True  # rank guarantee needs individual items, not (value, weight)

    def update_batch(self, values: np.ndarray, weights=None) -> "KLLSketch":
        if weights is not None:
            raise ValueError("KLL update is unweighted; pass raw values")
        return self._update_raw(values)

    def _update_raw(self, values: np.ndarray) -> "KLLSketch":
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += int(v.size)
        self._compress()
        return self

    def _compress(self) -> None:
        changed = True
        while changed:
            changed = False
            for lvl in range(len(self.levels)):
                if self.levels[lvl].size > self._capacity(lvl):
                    buf = np.sort(self.levels[lvl])
                    # odd leftover stays at this level so 2·|promoted| + |kept|
                    # exactly preserves the level's weight
                    if buf.size % 2 == 1:
                        kept, buf = buf[:1], buf[1:]
                    else:
                        kept = buf[:0]
                    off = self.flip[lvl] & 1
                    self.flip[lvl] ^= 1
                    promoted = buf[off::2]
                    self.levels[lvl] = kept.astype(np.float64)
                    if lvl + 1 == len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                        self.flip.append(0)
                    self.levels[lvl + 1] = np.concatenate([self.levels[lvl + 1], promoted])
                    changed = True

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if self.k != other.k:
            raise ValueError("KLL k mismatch")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.flip.append(0)
        for lvl, arr in enumerate(other.levels):
            if arr.size:
                self.levels[lvl] = np.concatenate([self.levels[lvl], arr])
        self.n += other.n
        self._compress()
        return self

    def _items_weights(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for lvl, arr in enumerate(self.levels):
            if arr.size:
                vals.append(arr)
                wts.append(np.full(arr.size, 1 << lvl, dtype=np.int64))
        if not vals:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        return float(self.quantiles([q])[0])

    def quantiles(self, qs) -> np.ndarray:
        qs = np.asarray(qs, dtype=np.float64)
        v, w = self._items_weights()
        if v.size == 0:
            return np.full(qs.shape, np.nan)
        cum = np.cumsum(w)
        total = cum[-1]
        stops = qs * (total - 1)
        idx = np.minimum(np.searchsorted(cum, stops, side="right"), v.size - 1)
        return v[idx]

    def to_bytes(self) -> bytes:
        parts = [struct.pack("<4sqqq", _MAGIC, self.k, self.n, len(self.levels))]
        for lvl, arr in enumerate(self.levels):
            parts.append(struct.pack("<qq", self.flip[lvl], arr.size))
            parts.append(np.sort(arr).astype("<f8").tobytes())  # canonical order
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLLSketch":
        magic, k, n, nlvl = struct.unpack_from("<4sqqq", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad KLL magic")
        s = cls(k=int(k))
        s.n = int(n)
        s.levels, s.flip = [], []
        off = struct.calcsize("<4sqqq")
        for _ in range(int(nlvl)):
            flip, sz = struct.unpack_from("<qq", data, off)
            off += 16
            s.levels.append(np.frombuffer(data, dtype="<f8", count=int(sz), offset=off).astype(np.float64))
            s.flip.append(int(flip))
            off += 8 * int(sz)
        return s
