"""Bottom-k sampler — deterministic, mergeable uniform sampling.

Every item gets a pseudorandom tag (seeded splitmix64 of its id); the
sketch keeps the k items with the smallest tags. Because min-k of a
union equals min-k of concatenated min-k's, the sample is exactly
mergeable — a uniform random sample of 10^12 rows materializes through
the same two-shuffle sketch tree as every other summary here, with no
raw-data shuffle and no second pass. Deterministic in (seed, data):
re-running always selects the same sample (reproducible training-data
subsets). Doubles as a KMV distinct-count estimator.

A training-data pipeline staple absent from the reference (which has no
sampling at all); stratified sampling falls out of the harness's
group_cols for free.
"""

from __future__ import annotations

import struct

import numpy as np

from p2pddsketch_spark.functions.hashing import splitmix64

_MAGIC = b"BTK1"


class BottomKSample:
    __slots__ = ("k", "seed", "tags", "ids")

    SET_SEMANTICS = True  # duplicates can't enter twice (same tag)

    def __init__(self, k: int = 1024, seed: int = 0) -> None:
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.seed = int(seed)
        self.tags = np.empty(0, dtype=np.uint64)   # sorted ascending
        self.ids = np.empty(0, dtype=np.int64)     # aligned payload

    def update_batch(self, values: np.ndarray, weights=None) -> "BottomKSample":
        v = np.asarray(values).astype(np.int64).ravel()
        if v.size == 0:
            return self
        tags = splitmix64(v, seed=self.seed)
        allt = np.concatenate([self.tags, tags])
        alli = np.concatenate([self.ids, v])
        # unique tags (identical id → identical tag) then k smallest
        ut, idx = np.unique(allt, return_index=True)
        keep = slice(0, self.k)
        self.tags = ut[keep]
        self.ids = alli[idx][keep]
        return self

    def merge(self, other: "BottomKSample") -> "BottomKSample":
        if (self.k, self.seed) != (other.k, other.seed):
            raise ValueError("bottom-k k/seed mismatch")
        allt = np.concatenate([self.tags, other.tags])
        alli = np.concatenate([self.ids, other.ids])
        ut, idx = np.unique(allt, return_index=True)
        self.tags = ut[:self.k]
        self.ids = alli[idx][:self.k]
        return self

    def sample(self) -> np.ndarray:
        """The sampled ids (ascending-tag order — a uniform permutation)."""
        return self.ids.copy()

    def cardinality(self) -> float:
        """KMV distinct estimate from the k-th minimum tag."""
        if self.tags.size < self.k:
            return float(self.tags.size)
        theta = float(self.tags[-1]) / float(1 << 64)
        return (self.k - 1) / theta

    def to_bytes(self) -> bytes:
        hdr = struct.pack("<4sqqq", _MAGIC, self.k, self.seed, self.tags.size)
        return hdr + self.tags.astype("<u8").tobytes() + self.ids.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BottomKSample":
        magic, k, seed, sz = struct.unpack_from("<4sqqq", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad bottom-k magic")
        s = cls(k=int(k), seed=int(seed))
        off = struct.calcsize("<4sqqq")
        sz = int(sz)
        s.tags = np.frombuffer(data, dtype="<u8", count=sz, offset=off).astype(np.uint64)
        s.ids = np.frombuffer(data, dtype="<i8", count=sz, offset=off + 8 * sz).astype(np.int64)
        return s
