"""KLL± — quantile sketching over turnstile (insert + delete) streams
(KLL±: Approximate Quantile Sketches over Dynamic Datasets, VLDB 2021 —
PAPERS.md).

Two-sided construction: an insert-side KLL and a delete-side KLL with
identical parameters; the rank of x in the live multiset is estimated as
rank⁺(x) − rank⁻(x), and quantiles come from the signed-weight merge of
both sketches' (item, weight) sets. Exact when no compaction has fired;
errors add across the two sides otherwise (the paper's additive-error
composition). Deletes of never-inserted items are the caller's contract,
as in the reference's `DDS_DeleteCollapse` (`ddsketch.cc:343-393`).

Mergeable and associative like every sketch here: merge = side-wise KLL
merge. Deterministic via the derandomized compaction of `KLLSketch`.
"""

from __future__ import annotations

import struct

import numpy as np

from p2pddsketch_spark.sketches.kll import KLLSketch

_MAGIC = b"KLT1"


class TurnstileKLL:
    __slots__ = ("k", "ins", "dels")

    NEEDS_RAW = True  # rank guarantees need individual items

    def __init__(self, k: int = 256) -> None:
        self.k = int(k)
        self.ins = KLLSketch(k=k)
        self.dels = KLLSketch(k=k)

    @property
    def n(self) -> int:
        return self.ins.n - self.dels.n

    def update_batch(self, values: np.ndarray, weights=None) -> "TurnstileKLL":
        if weights is not None:
            raise ValueError("KLL± update is unweighted; pass raw values")
        self.ins.update_batch(values)
        return self

    def delete_batch(self, values: np.ndarray) -> "TurnstileKLL":
        self.dels.update_batch(values)
        return self

    def merge(self, other: "TurnstileKLL") -> "TurnstileKLL":
        if self.k != other.k:
            raise ValueError("KLL± k mismatch")
        self.ins.merge(other.ins)
        self.dels.merge(other.dels)
        return self

    def _signed_items(self) -> tuple[np.ndarray, np.ndarray]:
        vi, wi = self.ins._items_weights()
        vd, wd = self.dels._items_weights()
        v = np.concatenate([vi, vd])
        w = np.concatenate([wi, -wd]).astype(np.int64)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def rank(self, x: float) -> float:
        """Estimated number of live items ≤ x."""
        v, w = self._signed_items()
        if v.size == 0:
            return 0.0
        cum = np.cumsum(w)
        idx = np.searchsorted(v, x, side="right") - 1
        return float(cum[idx]) if idx >= 0 else 0.0

    def quantile(self, q: float) -> float:
        return float(self.quantiles([q])[0])

    def quantiles(self, qs) -> np.ndarray:
        qs = np.asarray(qs, dtype=np.float64)
        v, w = self._signed_items()
        if v.size == 0 or self.n <= 0:
            return np.full(qs.shape, np.nan)
        cum = np.cumsum(w)
        total = self.n
        stops = qs.ravel() * (total - 1)
        # first item whose signed cumulative weight exceeds the stop —
        # mirrors the DDSketch/KLL scan rule on the live multiset.
        # (cum is NOT monotone under signed weights, so binary search is
        # out; argmax finds the first True lane, the any() mask guards
        # the all-False case where argmax would return 0.)
        hit = cum[None, :] > stops[:, None]
        idx = np.where(hit.any(axis=1), hit.argmax(axis=1), v.size - 1)
        return v[idx].reshape(qs.shape)

    def to_bytes(self) -> bytes:
        bi = self.ins.to_bytes()
        bd = self.dels.to_bytes()
        return struct.pack("<4sqqq", _MAGIC, self.k, len(bi), len(bd)) + bi + bd

    @classmethod
    def from_bytes(cls, data: bytes) -> "TurnstileKLL":
        magic, k, li, ld = struct.unpack_from("<4sqqq", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad KLL± magic")
        off = struct.calcsize("<4sqqq")
        s = cls(k=int(k))
        s.ins = KLLSketch.from_bytes(data[off:off + li])
        s.dels = KLLSketch.from_bytes(data[off + li:off + li + ld])
        return s
