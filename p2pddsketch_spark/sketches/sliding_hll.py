"""Sliding HyperLogLog — distinct counts over ANY trailing time window
from one pass (Chabchoub & Hébrail, "Sliding HyperLogLog: Estimating
cardinality in a data stream over a sliding window", ICDMW 2010).

Not present in the reference (its only sketch is DDSketch); this is the
sliding-window analog of `sketches/hll.py`: instead of each register
holding one max-rho byte, it holds the SKYLINE of (timestamp, rho)
pairs — a pair survives iff no other pair in the register is both
newer-or-equal and larger-or-equal. For any cutoff t, the max rho among
pairs with ts >= t is EXACTLY the register a plain HLL would have built
from only the items with ts >= t, so:

* `to_hll(cutoff)` derives a `HyperLogLog` whose registers (and
  therefore serialized bytes and estimate) are byte-identical to a
  fresh HLL fed only the window's items — the window query inherits
  HLL++'s published error (~1.04/sqrt(m)) with no extra looseness,
  pinned as a byte-equality property test, not an approximation test.
* The skyline is a canonical function of the observed (item, ts) set,
  so merge is fully order-invariant with byte-identical results — the
  same associativity contract as DDSketch/HLL, and the harness merge
  tree applies unchanged.
* Memory is bounded: a register's skyline has strictly increasing rho
  looking backwards in time, so it holds at most 64 - p + 1 pairs
  (expected O(ln n) per the paper). p=14 worst case ~5 MB, typical far
  less.

Updates are fully vectorized: the batch's (register, rho) -> max-ts
reduction and the dominance prune both run as numpy sorts over packed
keys; ranks replace raw timestamps inside the segment-prefix-max trick
so the arithmetic cannot overflow whatever the timestamp scale.

Harness integration: NEEDS_RAW with `pair_extractor(value_col, ts_col)`
(`operators/harness.py`) feeding an (n, 2) int64 [value, ts] batch.
"""

from __future__ import annotations

import struct

import numpy as np

from p2pddsketch_spark.functions.hashing import nlz64, splitmix64
from p2pddsketch_spark.sketches.hll import HyperLogLog

_MAGIC = b"SHL1"
_HDR = struct.calcsize("<4sqqqq")
_T_NONE = np.int64(np.iinfo(np.int64).min)


def _skyline(idx: np.ndarray, rho: np.ndarray, ts: np.ndarray):
    """Canonical skyline per register: keep (ts, rho) iff no pair in the
    same register has ts' >= ts and rho' >= rho (other than itself; exact
    duplicates collapse). Returns arrays sorted by (idx asc, rho asc) —
    ts is then strictly decreasing within each register."""
    if idx.size == 0:
        return idx, rho, ts
    # 1) max ts per (idx, rho)
    packed = (idx.astype(np.uint64) << np.uint64(6)) | rho.astype(np.uint64)
    order = np.lexsort((ts, packed))
    packed, rho, ts, idx = packed[order], rho[order], ts[order], idx[order]
    last = np.empty(packed.size, dtype=bool)
    last[:-1] = packed[1:] != packed[:-1]
    last[-1] = True
    idx, rho, ts = idx[last], rho[last], ts[last]
    # 2) dominance prune: within each register, visiting rho DESCENDING,
    # keep a pair iff its ts strictly exceeds every higher-rho ts seen.
    # Rank-compress ts so the per-segment offset trick cannot overflow.
    r = np.searchsorted(np.unique(ts), ts).astype(np.int64)  # dense ranks
    key = (idx.astype(np.int64) << np.int64(6)) | (np.int64(63) - rho)
    order2 = np.argsort(key, kind="stable")  # idx asc, rho desc
    i2, r2 = idx[order2], r[order2]
    start = np.empty(i2.size, dtype=bool)
    start[0] = True
    start[1:] = i2[1:] != i2[:-1]
    seg = np.cumsum(start) - 1
    big = np.int64(r2.max() + 1 if r2.size else 1)
    adj = r2 + seg * big
    run = np.maximum.accumulate(adj)
    keep2 = np.empty(adj.size, dtype=bool)
    keep2[0] = True
    keep2[1:] = adj[1:] > run[:-1]  # segment firsts always pass (see proof
    # in tests): prev segment's running max < this segment's offset
    kept = order2[keep2]
    idx, rho, ts = idx[kept], rho[kept], ts[kept]
    order3 = np.lexsort((rho, idx))
    return idx[order3], rho[order3], ts[order3]


class SlidingHyperLogLog:
    """Per-register (ts, rho) skylines; any-suffix-window HLL."""

    __slots__ = ("p", "m", "seed", "idx", "rho", "ts", "t_max")

    NEEDS_RAW = True  # duplicates carry fresh timestamps; no pre-agg

    def __init__(self, p: int = 14, seed: int = 0) -> None:
        if not (4 <= p <= 18):
            raise ValueError(f"p must be in [4,18], got {p}")
        self.p = int(p)
        self.m = 1 << p
        self.seed = int(seed)
        self.idx = np.zeros(0, dtype=np.int64)
        self.rho = np.zeros(0, dtype=np.uint8)
        self.ts = np.zeros(0, dtype=np.int64)
        self.t_max = _T_NONE

    @property
    def n_pairs(self) -> int:
        return int(self.idx.size)

    # --------------------------------------------------------------- updates

    def update(self, values: np.ndarray, timestamps: np.ndarray) -> "SlidingHyperLogLog":
        """Insert identifiers (hashed like `HyperLogLog.update_batch` —
        same splitmix64/seed, so derived windows match plain HLLs
        byte-for-byte) observed at int64 timestamps."""
        v = np.asarray(values).ravel()
        t = np.asarray(timestamps).astype(np.int64).ravel()
        if v.size != t.size:
            raise ValueError("values/timestamps length mismatch")
        if v.size == 0:
            return self
        h = splitmix64(v.astype(np.int64), seed=self.seed)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h << np.uint64(self.p)
        rho = (np.minimum(nlz64(w), 64 - self.p).astype(np.int64) + 1).astype(np.uint8)
        self.idx, self.rho, self.ts = _skyline(
            np.concatenate((self.idx, idx)),
            np.concatenate((self.rho, rho)),
            np.concatenate((self.ts, t)))
        self.t_max = max(self.t_max, np.int64(t.max()))
        return self

    def update_batch(self, pairs: np.ndarray, weights=None) -> "SlidingHyperLogLog":
        """Harness raw form: (n, 2) int64 [value, ts] array
        (`pair_extractor`). Weights are ignored — cardinality is a set
        property."""
        a = np.asarray(pairs)
        if a.size == 0:
            return self
        if a.ndim != 2 or a.shape[1] != 2:
            raise ValueError("update_batch expects an (n, 2) [value, ts] array")
        return self.update(a[:, 0], a[:, 1])

    # ----------------------------------------------------------------- merge

    def merge(self, other: "SlidingHyperLogLog") -> "SlidingHyperLogLog":
        if self.p != other.p or self.seed != other.seed:
            raise ValueError("SlidingHLL p/seed mismatch")
        self.idx, self.rho, self.ts = _skyline(
            np.concatenate((self.idx, other.idx)),
            np.concatenate((self.rho, other.rho)),
            np.concatenate((self.ts, other.ts)))
        self.t_max = max(self.t_max, other.t_max)
        return self

    # ----------------------------------------------------------------- query

    def registers_at(self, cutoff: int | None = None) -> np.ndarray:
        """uint8[m] register array restricted to items with ts >= cutoff
        (cutoff=None: all time) — exactly a plain HLL's registers over
        that window."""
        regs = np.zeros(self.m, dtype=np.uint8)
        if self.idx.size == 0:
            return regs
        if cutoff is None:
            elig = slice(None)
        else:
            elig = self.ts >= np.int64(cutoff)
        np.maximum.at(regs, self.idx[elig], self.rho[elig])
        return regs

    def to_hll(self, cutoff: int | None = None) -> HyperLogLog:
        h = HyperLogLog(p=self.p, seed=self.seed)
        h.registers = self.registers_at(cutoff)
        return h

    def cardinality(self, cutoff: int | None = None) -> float:
        """HLL++ estimate of distinct items with ts >= cutoff."""
        return self.to_hll(cutoff).cardinality()

    def distinct_in_last(self, window: int, now: int | None = None) -> float:
        """Distinct items in the trailing window: ts > now - window."""
        ref = int(self.t_max) if now is None else int(now)
        return self.cardinality(ref - int(window) + 1)

    # --------------------------------------------------------- serialization

    def to_bytes(self) -> bytes:
        return (struct.pack("<4sqqqq", _MAGIC, self.p, self.seed,
                            int(self.t_max), self.idx.size)
                + self.idx.astype("<u4").tobytes()
                + self.rho.tobytes()
                + self.ts.astype("<i8").tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "SlidingHyperLogLog":
        magic, p, seed, t_max, n = struct.unpack_from("<4sqqqq", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad SlidingHLL magic")
        s = cls(p=int(p), seed=int(seed))
        n = int(n)
        off = _HDR
        s.idx = np.frombuffer(data, dtype="<u4", count=n, offset=off).astype(np.int64)
        off += 4 * n
        s.rho = np.frombuffer(data, dtype=np.uint8, count=n, offset=off).copy()
        off += n
        s.ts = np.frombuffer(data, dtype="<i8", count=n, offset=off).astype(np.int64)
        s.t_max = np.int64(t_max)
        return s
