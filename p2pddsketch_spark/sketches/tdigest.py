"""Merging t-digest (Dunning & Ertl 2019) — interpolated quantiles with
accuracy concentrated at the tails.

Vectorized compression: centroids are binned by the k1 scale function
k(q) = (δ/2π)·asin(2q−1) on cumulative-weight midpoints; consecutive
centroids in the same k-bucket merge (weighted mean). Deterministic.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"TDG1"


class TDigest:
    __slots__ = ("delta", "means", "weights", "min_val", "max_val")

    def __init__(self, delta: float = 200.0) -> None:
        if delta < 10:
            raise ValueError("delta must be >= 10")
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.int64)
        self.min_val = np.inf
        self.max_val = -np.inf

    @property
    def n(self) -> int:
        return int(self.weights.sum())

    def update_batch(self, values: np.ndarray, weights: np.ndarray | None = None) -> "TDigest":
        v = np.asarray(values, dtype=np.float64).ravel()
        nan = np.isnan(v)
        if nan.any():
            v = v[~nan]
            if weights is not None:
                weights = np.asarray(weights)[~nan]
        if v.size == 0:
            return self
        self.min_val = min(self.min_val, float(v.min()))
        self.max_val = max(self.max_val, float(v.max()))
        if weights is None:
            uv, uc = np.unique(v, return_counts=True)
            self._absorb(uv, uc.astype(np.int64))
        else:
            w = np.asarray(weights, dtype=np.int64).ravel()
            uv, inv = np.unique(v, return_inverse=True)
            uc = np.bincount(inv, weights=w.astype(np.float64)).astype(np.int64)
            self._absorb(uv, uc)
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("t-digest delta mismatch")
        self.min_val = min(self.min_val, other.min_val)
        self.max_val = max(self.max_val, other.max_val)
        self._absorb(other.means, other.weights)
        return self

    def _absorb(self, means: np.ndarray, weights: np.ndarray) -> None:
        if means.size == 0:
            return
        m = np.concatenate([self.means, means])
        w = np.concatenate([self.weights, weights])
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        self.means, self.weights = self._compress(m, w)

    def _compress(self, m: np.ndarray, w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        total = w.sum()
        if total == 0 or m.size <= 1:
            return m, w
        cum = np.cumsum(w, dtype=np.float64)
        qmid = (cum - w / 2.0) / total
        kq = (self.delta / (2 * np.pi)) * np.arcsin(2 * np.clip(qmid, 0, 1) - 1)
        buckets = np.floor(kq).astype(np.int64)
        # group consecutive equal buckets
        new_group = np.empty(m.size, dtype=bool)
        new_group[0] = True
        new_group[1:] = buckets[1:] != buckets[:-1]
        gid = np.cumsum(new_group) - 1
        ng = int(gid[-1]) + 1
        gw = np.bincount(gid, weights=w.astype(np.float64))
        gm = np.bincount(gid, weights=m * w.astype(np.float64)) / gw
        return gm.astype(np.float64), gw.astype(np.int64)

    def quantile(self, q: float) -> float:
        return float(self.quantiles([q])[0])

    def quantiles(self, qs) -> np.ndarray:
        qs = np.asarray(qs, dtype=np.float64)
        if self.means.size == 0:
            return np.full(qs.shape, np.nan)
        total = float(self.weights.sum())
        cum = np.cumsum(self.weights, dtype=np.float64)
        centers = cum - self.weights / 2.0
        targets = qs * total
        out = np.interp(targets, centers, self.means)
        out = np.where(targets <= centers[0], self.means[0], out)
        out = np.where(targets >= centers[-1], self.means[-1], out)
        out = np.clip(out, self.min_val, self.max_val)
        return out

    def to_bytes(self) -> bytes:
        hdr = struct.pack("<4sdddq", _MAGIC, self.delta, self.min_val, self.max_val, self.means.size)
        return hdr + self.means.astype("<f8").tobytes() + self.weights.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        magic, delta, mn, mx, sz = struct.unpack_from("<4sdddq", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad t-digest magic")
        s = cls(delta=float(delta))
        off = struct.calcsize("<4sdddq")
        s.means = np.frombuffer(data, dtype="<f8", count=int(sz), offset=off).astype(np.float64)
        s.weights = np.frombuffer(data, dtype="<i8", count=int(sz), offset=off + 8 * int(sz)).astype(np.int64)
        s.min_val, s.max_val = float(mn), float(mx)
        return s
