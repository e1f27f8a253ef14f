"""SpaceSaving / Misra-Gries heavy-hitter sketch (Metwally et al. 2005;
mergeable form per Agarwal et al. 2012).

Deterministic mergeable top-k frequency summary with the guarantees
f(x) ≤ f̂(x) ≤ f(x) + N/k for tracked items, and every item with
f(x) > N/k present in the summary. Complements count-min: CMS answers
point queries for ANY id, SpaceSaving carries the candidate set itself
(no second pass to enumerate heavy hitters — crucial at 10^12 rows).

Batch update is vectorized: pre-aggregate the batch (unique + counts),
one sorted merge + one partial sort per batch, never per item. The
classic per-item "replace the min counter, inherit its count" rule
becomes a batch `floor`: the largest count ever evicted. Items entering
the summary (or re-entering after eviction) inherit the floor as both
count offset and error bound — exactly the min-counter inheritance,
amortized. On merge the floors add (each side's floor ≤ N_side/k, so
the merged bound stays ≤ N/k).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"SSV2"


class SpaceSaving:
    __slots__ = ("k", "keys", "counts", "errors", "n", "floor")

    def __init__(self, k: int = 64) -> None:
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.keys = np.empty(0, dtype=np.int64)
        self.counts = np.empty(0, dtype=np.int64)
        self.errors = np.empty(0, dtype=np.int64)
        self.n = 0
        self.floor = 0  # max evicted count — the "min counter" inheritance

    def _absorb(self, uk: np.ndarray, uc: np.ndarray, ue: np.ndarray,
                entry_floor: int) -> None:
        """Sum (key, count, error) runs into the summary; keys NOT already
        tracked inherit `entry_floor` on count and error."""
        if self.keys.size:
            pos = np.searchsorted(self.keys, uk)
            pos_c = np.minimum(pos, self.keys.size - 1)
            is_new = self.keys[pos_c] != uk
        else:
            is_new = np.ones(uk.size, dtype=bool)
        uc = uc + np.where(is_new, entry_floor, 0)
        ue = ue + np.where(is_new, entry_floor, 0)
        allk = np.concatenate([self.keys, uk])
        allc = np.concatenate([self.counts, uc])
        alle = np.concatenate([self.errors, ue])
        mk, inv = np.unique(allk, return_inverse=True)
        self.keys = mk
        # exact int64 accumulation (np.add.at, not float-weighted
        # bincount): counts must stay exact past 2^53 — the same
        # no-float-weights discipline as eh.py/ecm.py; arrays here are
        # tiny (<= k + batch uniques) so the scatter-add costs nothing
        self.counts = np.zeros(mk.size, dtype=np.int64)
        np.add.at(self.counts, inv, allc)
        self.errors = np.zeros(mk.size, dtype=np.int64)
        np.add.at(self.errors, inv, alle)

    def _truncate(self) -> None:
        if self.keys.size <= self.k:
            return
        order = np.argsort(-self.counts, kind="stable")
        keep, drop = np.sort(order[:self.k]), order[self.k:]
        self.floor = max(self.floor, int(self.counts[drop].max()))
        self.keys = self.keys[keep]
        self.counts = self.counts[keep]
        self.errors = self.errors[keep]

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
            uc = np.zeros(uk.size, dtype=np.int64)
            np.add.at(uc, inv, w)  # exact int64, no float weights
        self.n += int(uc.sum())
        self._absorb(uk, uc, np.zeros(uk.size, dtype=np.int64), self.floor)
        self._truncate()
        return self

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        if self.k != other.k:
            raise ValueError("SpaceSaving k mismatch")
        # items tracked only on one side get the other side's floor
        # (their count there is ≤ that floor)
        self_floor = self.floor
        self._absorb(other.keys, other.counts, other.errors, self_floor)
        # keys in self but not in other inherit other's floor
        if other.keys.size:
            pos = np.searchsorted(other.keys, self.keys)
            pos_c = np.minimum(pos, other.keys.size - 1)
            only_self = other.keys[pos_c] != self.keys
        else:
            only_self = np.ones(self.keys.size, dtype=bool)
        self.counts = self.counts + np.where(only_self, other.floor, 0)
        self.errors = self.errors + np.where(only_self, other.floor, 0)
        self.floor = self_floor + other.floor
        self.n += other.n
        self._truncate()
        return self

    def copy(self) -> "SpaceSaving":
        c = SpaceSaving(k=self.k)
        c.keys = self.keys.copy()
        c.counts = self.counts.copy()
        c.errors = self.errors.copy()
        c.n = self.n
        c.floor = self.floor
        return c

    def top(self, m: int | None = None) -> list[tuple[int, int, int]]:
        """[(item, estimated_count, max_overestimate)] sorted by count desc,
        item asc for determinism."""
        order = np.lexsort((self.keys, -self.counts))
        if m is not None:
            order = order[:m]
        return [(int(self.keys[i]), int(self.counts[i]), int(self.errors[i]))
                for i in order]

    def to_bytes(self) -> bytes:
        hdr = struct.pack("<4sqqqq", _MAGIC, self.k, self.n, self.floor, self.keys.size)
        return hdr + self.keys.astype("<i8").tobytes() + \
            self.counts.astype("<i8").tobytes() + self.errors.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "SpaceSaving":
        magic, k, n, floor, sz = struct.unpack_from("<4sqqqq", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad SpaceSaving magic")
        s = cls(k=int(k))
        s.n = int(n)
        s.floor = int(floor)
        off = struct.calcsize("<4sqqqq")
        sz = int(sz)
        s.keys = np.frombuffer(data, dtype="<i8", count=sz, offset=off).astype(np.int64)
        s.counts = np.frombuffer(data, dtype="<i8", count=sz, offset=off + 8 * sz).astype(np.int64)
        s.errors = np.frombuffer(data, dtype="<i8", count=sz, offset=off + 16 * sz).astype(np.int64)
        return s
