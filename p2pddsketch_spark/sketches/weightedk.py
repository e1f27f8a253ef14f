"""Weighted reservoir sampling without replacement — the A-ES scheme
(Efraimidis & Spirakis 2006): item i gets tag u_i^(1/w_i) with
u_i ∈ (0,1); the k LARGEST tags are a weighted sample without
replacement (inclusion probability proportional to weight, sequentially).

Deterministic and mergeable exactly like `BottomKSample` (its weighted
twin): u_i derives from splitmix64 of the item id, so the tag is a pure
function of (id, weight, seed) — top-k of a union is top-k of
concatenated top-k's, and re-running always selects the same sample.
Used for importance sampling of training data (e.g. length-weighted doc
samples) through the same two-shuffle sketch harness.

The tag is SQL-expressible (pow of the splitmix64 hash), so the driver
query has an exact DuckDB twin.
"""

from __future__ import annotations

import struct

import numpy as np

from p2pddsketch_spark.errors import ParamError
from p2pddsketch_spark.functions.hashing import splitmix64

_MAGIC = b"WTK1"
_TWO64 = float(1 << 64)


def aes_tags(ids: np.ndarray, weights: np.ndarray, seed: int = 0) -> np.ndarray:
    """u^(1/w) with u = (splitmix64(id) + 0.5) / 2^64 ∈ (0, 1)."""
    u = (splitmix64(np.asarray(ids, dtype=np.int64), seed=seed)
         .astype(np.float64) + 0.5) / _TWO64
    w = np.asarray(weights, dtype=np.float64)
    return np.power(u, 1.0 / np.maximum(w, 1e-300))


class WeightedTopK:
    """Keep the k items with the LARGEST A-ES tags."""

    __slots__ = ("k", "seed", "tags", "ids")

    NEEDS_RAW = True  # (id, weight) pairs; pre-aggregation would drop weights

    def __init__(self, k: int = 1024, seed: int = 0) -> None:
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.seed = int(seed)
        self.tags = np.empty(0, dtype=np.float64)  # sorted DESCENDING
        self.ids = np.empty(0, dtype=np.int64)

    def update_batch(self, values: np.ndarray, weights=None) -> "WeightedTopK":
        """`values` is a flat int64 array of interleaved (id, weight)
        pairs — the harness's array extractor shape — or an (n, 2)
        matrix. Weights must be positive integers (e.g. doc lengths)."""
        v = np.asarray(values, dtype=np.int64)
        if v.ndim == 1:
            if v.size % 2:
                raise ValueError("flat input must interleave (id, weight)")
            v = v.reshape(-1, 2)
        if v.shape[0] == 0:
            return self
        ids, w = v[:, 0], v[:, 1]
        if w.min() < 1:
            raise ParamError(
                "weighted-k weights must be positive integers (>= 1); "
                f"got min weight {int(w.min())} — a weight of 0 would "
                "underflow u^(1/w) to 0.0 and silently drop the item")
        tags = aes_tags(ids, w, self.seed)
        return self._absorb(tags, ids)

    def _absorb(self, tags: np.ndarray, ids: np.ndarray) -> "WeightedTopK":
        allt = np.concatenate([self.tags, tags])
        alli = np.concatenate([self.ids, ids])
        # dedup by ID (an id recurs across batches/partitions; tag is a
        # pure function of (id, weight, seed) so duplicates normally tie,
        # and if weights ever disagree the LARGEST tag wins — still a
        # pure function of the (id, tag) set, hence merge-order-free)
        order = np.lexsort((-allt, alli))          # id asc, tag desc within id
        alli, allt = alli[order], allt[order]
        keep = np.ones(alli.size, dtype=bool)
        keep[1:] = alli[1:] != alli[:-1]
        alli, allt = alli[keep], allt[keep]
        # top-k by tag desc with id-asc tiebreak (deterministic even on
        # measure-zero tag collisions between distinct ids)
        sel = np.lexsort((alli, -allt))[: self.k]
        self.tags = allt[sel]
        self.ids = alli[sel]
        return self

    def merge(self, other: "WeightedTopK") -> "WeightedTopK":
        if (self.k, self.seed) != (other.k, other.seed):
            raise ValueError("weighted-k k/seed mismatch")
        return self._absorb(other.tags, other.ids)

    def sample(self) -> np.ndarray:
        """Sampled ids, strongest inclusion first."""
        return self.ids.copy()

    def to_bytes(self) -> bytes:
        hdr = struct.pack("<4sqqq", _MAGIC, self.k, self.seed, self.tags.size)
        return hdr + self.tags.astype("<f8").tobytes() + self.ids.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "WeightedTopK":
        magic, k, seed, sz = struct.unpack_from("<4sqqq", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad weighted-k magic")
        s = cls(k=int(k), seed=int(seed))
        off = struct.calcsize("<4sqqq")
        sz = int(sz)
        s.tags = np.frombuffer(data, dtype="<f8", count=sz, offset=off).copy()
        s.ids = np.frombuffer(data, dtype="<i8", count=sz, offset=off + 8 * sz).copy()
        return s
