"""SpaceSaving / Misra-Gries heavy-hitter sketch (Metwally et al. 2005).

Deterministic mergeable top-k frequency summary: k counters guarantee
f̂(x) − f(x) ≤ error(x) ≤ N/k, and every item with f(x) > N/k is present.
Complements count-min: CMS answers point queries for ANY id, SpaceSaving
carries the candidate set itself (no second pass to enumerate heavy
hitters — crucial at 10^12 rows where "scan again" is not an option).

Batch update is vectorized: pre-aggregate the batch (unique + counts),
then one dict-merge + one partial sort per batch, never per item.
Merge follows the Agarwal et al. 2012 mergeable-summaries construction:
sum counters (and errors) by key, keep top k, absorb the (k+1)-th
weight into the survivors' error bounds.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"SSV1"


class SpaceSaving:
    __slots__ = ("k", "keys", "counts", "errors", "n")

    def __init__(self, k: int = 64) -> None:
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.keys = np.empty(0, dtype=np.int64)
        self.counts = np.empty(0, dtype=np.int64)
        self.errors = np.empty(0, dtype=np.int64)
        self.n = 0

    def _truncate(self) -> None:
        if self.keys.size <= self.k:
            return
        order = np.argsort(-self.counts, kind="stable")
        keep, drop = order[:self.k], order[self.k:]
        # evicted mass inflates the survivors' worst-case error (the
        # SpaceSaving "count of the evicted minimum" rule): a new item
        # replacing counter min inherits count_min as error
        spill = int(self.counts[drop].max())
        new_counts = self.counts[keep]
        self.keys = self.keys[keep]
        self.errors = np.minimum(self.errors[keep] + spill, new_counts)
        self.counts = new_counts

    def update_batch(self, values: np.ndarray, weights: np.ndarray | None = None) -> "SpaceSaving":
        v = np.asarray(values).astype(np.int64).ravel()
        if v.size == 0:
            return self
        if weights is None:
            uk, uc = np.unique(v, return_counts=True)
            uc = uc.astype(np.int64)
        else:
            w = np.asarray(weights, dtype=np.int64).ravel()
            uk, inv = np.unique(v, return_inverse=True)
            uc = np.bincount(inv, weights=w.astype(np.float64)).astype(np.int64)
        self.n += int(uc.sum())
        allk = np.concatenate([self.keys, uk])
        allc = np.concatenate([self.counts, uc])
        alle = np.concatenate([self.errors, np.zeros(uk.size, dtype=np.int64)])
        mk, inv = np.unique(allk, return_inverse=True)
        mc = np.bincount(inv, weights=allc.astype(np.float64)).astype(np.int64)
        me = np.bincount(inv, weights=alle.astype(np.float64)).astype(np.int64)
        self.keys, self.counts, self.errors = mk, mc, me
        self._truncate()
        return self

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        if self.k != other.k:
            raise ValueError("SpaceSaving k mismatch")
        allk = np.concatenate([self.keys, other.keys])
        allc = np.concatenate([self.counts, other.counts])
        alle = np.concatenate([self.errors, other.errors])
        mk, inv = np.unique(allk, return_inverse=True)
        self.keys = mk
        self.counts = np.bincount(inv, weights=allc.astype(np.float64)).astype(np.int64)
        self.errors = np.bincount(inv, weights=alle.astype(np.float64)).astype(np.int64)
        self.n += other.n
        self._truncate()
        return self

    def top(self, m: int | None = None) -> list[tuple[int, int, int]]:
        """[(item, estimated_count, max_overestimate)] sorted by count desc,
        item asc for determinism."""
        order = np.lexsort((self.keys, -self.counts))
        if m is not None:
            order = order[:m]
        return [(int(self.keys[i]), int(self.counts[i]), int(self.errors[i]))
                for i in order]

    def to_bytes(self) -> bytes:
        hdr = struct.pack("<4sqqq", _MAGIC, self.k, self.n, self.keys.size)
        return hdr + self.keys.astype("<i8").tobytes() + \
            self.counts.astype("<i8").tobytes() + self.errors.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "SpaceSaving":
        magic, k, n, sz = struct.unpack_from("<4sqqq", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad SpaceSaving magic")
        s = cls(k=int(k))
        s.n = int(n)
        off = struct.calcsize("<4sqqq")
        sz = int(sz)
        s.keys = np.frombuffer(data, dtype="<i8", count=sz, offset=off).astype(np.int64)
        s.counts = np.frombuffer(data, dtype="<i8", count=sz, offset=off + 8 * sz).astype(np.int64)
        s.errors = np.frombuffer(data, dtype="<i8", count=sz, offset=off + 16 * sz).astype(np.int64)
        return s
