"""ECM-sketch — sliding-window frequency estimation: a count-min sketch
whose every counter is an exponential histogram (Papapetrou,
Garofalakis, Deligiannakis, "Sketch-based Querying of Distributed
Sliding-Window Data Streams", VLDB 2012).

Not present in the reference (its only sketch is DDSketch); this is the
sliding-window analog of `sketches/cms.py`: after one pass over a
timestamped keyed stream it answers "how often did key x appear in the
last w time units" for ANY w. Point queries take the count-min minimum
across d rows, but each cell answers through its EH, so the estimate
carries BOTH error terms: the CMS collision overestimate (eps = e/width
of the window's total mass, probabilistic) and the EH bucket-resolution
error (deterministic, reported per query).

Implementation: one global bucket table (cell, size, t_old, t_new) for
all d*w cells, compacted by `sketches/eh.py`'s level-ascending
vectorized pass — segment boundaries are cell ids, so a batch touching
tens of thousands of cells still compacts in O(levels) numpy passes,
no per-cell Python. Updates group-sum the batch per (cell, ts), then
binary-decompose; hashing is the library-wide splitmix64 with one
derived seed per row, matching `cms.py`'s row layout.

Returned guarantees (pinned in tests/test_eh_ecm.py):

* upper bound is hard: est + err_bound >= true windowed count of the
  key, ALWAYS (each row's cell mass dominates the key's mass; the EH
  deviation is inside err_bound).
* est - err_bound <= true + (CMS collision mass of that window), the
  probabilistic e/width bound — tested with margin at fixed seeds.
* merge is commutative with byte-identical results (canonical
  recompaction of the combined table); re-association stays inside the
  reported bounds, same contract as `ExpHistogram`.

Harness integration: NEEDS_RAW with `pair_extractor(key_col, ts_col)`
feeding an (n, 2) int64 [key, ts] batch.
"""

from __future__ import annotations

import struct

import numpy as np

from p2pddsketch_spark.functions.hashing import splitmix64
from p2pddsketch_spark.sketches.eh import (compact_table, decompose_counts,
                                           query_table)

_MAGIC = b"ECM1"
_HDR = struct.calcsize("<4sqqqqqq")
_T_NONE = np.int64(np.iinfo(np.int64).min)


class EcmSketch:
    """d x width count-min of exponential-histogram counters."""

    __slots__ = ("depth", "width", "k", "seed", "cell", "size", "t_old",
                 "t_new", "t_max", "_compacted_at")

    NEEDS_RAW = True  # harness feeds raw (key, ts) pair batches

    def __init__(self, depth: int = 4, width: int = 2048, k: int = 32,
                 seed: int = 0) -> None:
        if depth < 1 or width < 1:
            raise ValueError("depth/width must be >= 1")
        if depth * width > (1 << 31) - 1:
            # the wire format stores cell ids as int32 (to_bytes)
            raise ValueError(
                f"depth*width must fit int32, got {depth * width}")
        if k < 2:
            raise ValueError(f"k must be >= 2, got {k}")
        self.depth = int(depth)
        self.width = int(width)
        self.k = int(k)
        self.seed = int(seed)
        self.cell = np.zeros(0, dtype=np.int64)
        self.size = np.zeros(0, dtype=np.int64)
        self.t_old = np.zeros(0, dtype=np.int64)
        self.t_new = np.zeros(0, dtype=np.int64)
        self.t_max = _T_NONE
        self._compacted_at = 0  # table size right after the last compaction

    def _compact(self) -> None:
        self.cell, self.size, self.t_old, self.t_new = compact_table(
            self.cell, self.size, self.t_old, self.t_new, self.k)
        self._compacted_at = int(self.cell.size)

    def _ensure_compact(self) -> None:
        """Amortized compaction: `update` only appends (queries and the
        error receipts are correct on an un-canonicalized table, but it
        must be SORTED and bounded before querying, serializing, or
        merging). Recompacting every Arrow batch would rescan the whole
        table per batch — O(table · batches); deferring to 2x growth
        keeps the total compaction work O(n log n)."""
        if self.cell.size > max(4096, 2 * self._compacted_at):
            self._compact()

    @property
    def n_buckets(self) -> int:
        return int(self.cell.size)

    def _cells(self, keys: np.ndarray) -> np.ndarray:
        """(depth, n) cell ids — row r hashes with derived seed, offset
        r*width, matching cms.py's one-array-per-row layout."""
        out = np.empty((self.depth, keys.size), dtype=np.int64)
        for r in range(self.depth):
            h = splitmix64(keys, seed=self.seed + r + 1)
            out[r] = (h % np.uint64(self.width)).astype(np.int64) + r * self.width
        return out

    # --------------------------------------------------------------- updates

    def update(self, keys: np.ndarray, timestamps: np.ndarray,
               counts=None) -> "EcmSketch":
        kv = np.asarray(keys).astype(np.int64).ravel()
        t = np.asarray(timestamps).astype(np.int64).ravel()
        if kv.size != t.size:
            raise ValueError("keys/timestamps length mismatch")
        if kv.size == 0:
            return self
        if counts is None:
            c = np.ones(kv.size, dtype=np.int64)
        else:
            c = np.asarray(counts, dtype=np.int64).ravel()
            if (c < 0).any():
                raise ValueError("EcmSketch counts must be >= 0")
        cells = self._cells(kv)  # (depth, n)
        all_cells = cells.ravel()
        all_ts = np.tile(t, self.depth)
        all_cnt = np.tile(c, self.depth)
        # group-sum per (cell, ts) before decomposition
        packed_order = np.lexsort((all_ts, all_cells))
        gc, gt = all_cells[packed_order], all_ts[packed_order]
        gn = all_cnt[packed_order]
        newgrp = np.empty(gc.size, dtype=bool)
        newgrp[0] = True
        newgrp[1:] = (gc[1:] != gc[:-1]) | (gt[1:] != gt[:-1])
        gid = np.cumsum(newgrp) - 1
        sums = np.zeros(int(gid[-1]) + 1, dtype=np.int64)
        np.add.at(sums, gid, gn)
        fc, ft = gc[newgrp], gt[newgrp]
        dc, ds, dt = decompose_counts(fc, ft, sums)
        self.cell = np.concatenate((self.cell, dc))
        self.size = np.concatenate((self.size, ds))
        self.t_old = np.concatenate((self.t_old, dt))
        self.t_new = np.concatenate((self.t_new, dt))
        self._ensure_compact()
        self.t_max = max(self.t_max, np.int64(t.max()))
        return self

    def update_batch(self, pairs: np.ndarray, weights=None) -> "EcmSketch":
        """Harness raw form: (n, 2) int64 [key, ts] array
        (`pair_extractor`); optional weights are per-pair counts."""
        a = np.asarray(pairs)
        if a.size == 0:
            return self
        if a.ndim != 2 or a.shape[1] != 2:
            raise ValueError("update_batch expects an (n, 2) [key, ts] array")
        return self.update(a[:, 0], a[:, 1], counts=weights)

    # ----------------------------------------------------------------- merge

    def merge(self, other: "EcmSketch") -> "EcmSketch":
        if (self.depth, self.width, self.k, self.seed) != \
                (other.depth, other.width, other.k, other.seed):
            raise ValueError("EcmSketch shape/seed mismatch")
        # canonicalize BOTH sides first so the result is a function of
        # the two serialized states — merge(a, b) == merge(b, a) bytes
        self._compact()
        other._compact()
        self.cell, self.size, self.t_old, self.t_new = compact_table(
            np.concatenate((self.cell, other.cell)),
            np.concatenate((self.size, other.size)),
            np.concatenate((self.t_old, other.t_old)),
            np.concatenate((self.t_new, other.t_new)),
            self.k)
        self._compacted_at = int(self.cell.size)
        self.t_max = max(self.t_max, other.t_max)
        return self

    # ----------------------------------------------------------------- query

    def estimate(self, keys: np.ndarray, cutoff: int | None = None):
        """(est, err_bound) float64 arrays per key: count-min estimate of
        each key's occurrences with ts > cutoff (cutoff=None: all time).
        err_bound is the EH term only — est + err_bound is a hard upper
        bound on the true count; downward, collisions add the usual CMS
        e/width mass."""
        kv = np.asarray(keys).astype(np.int64).ravel()
        if kv.size == 0:
            return (np.zeros(0), np.zeros(0))
        if self.cell.size == 0:
            # before the int64 cast of cutoff: estimate_last on an
            # empty sketch derives cutoff from the t_max sentinel
            # (int64 min) minus the window, which underflows np.int64
            return (np.zeros(kv.size), np.zeros(kv.size))
        self._compact()  # query_table needs the cell-sorted canonical table
        co = np.int64(cutoff) if cutoff is not None else _T_NONE
        cells = self._cells(kv)
        ests = np.empty((self.depth, kv.size), dtype=np.float64)
        errs = np.empty((self.depth, kv.size), dtype=np.float64)
        for r in range(self.depth):
            ests[r], errs[r] = query_table(self.cell, self.size, self.t_old,
                                           self.t_new, cells[r], int(co))
        argmin = np.argmin(ests, axis=0)
        pick = np.arange(kv.size)
        return ests[argmin, pick], errs[argmin, pick]

    def estimate_last(self, keys: np.ndarray, window: int,
                      now: int | None = None):
        """Windowed point estimates: occurrences with ts > now - window."""
        ref = int(self.t_max) if now is None else int(now)
        return self.estimate(keys, ref - int(window))

    # --------------------------------------------------------- serialization

    def to_bytes(self) -> bytes:
        self._compact()  # canonical wire state
        # bucket sizes are powers of two by construction: one byte of
        # log2 each instead of an int64 (21 B/bucket on the wire)
        logsz = np.log2(self.size.astype(np.float64)).astype(np.uint8) \
            if self.size.size else np.zeros(0, dtype=np.uint8)
        return (struct.pack("<4sqqqqqq", _MAGIC, self.depth, self.width,
                            self.k, self.seed, int(self.t_max),
                            self.cell.size)
                + self.cell.astype("<i4").tobytes()
                + logsz.tobytes()
                + self.t_old.astype("<i8").tobytes()
                + self.t_new.astype("<i8").tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "EcmSketch":
        magic, d, w, k, seed, t_max, n = struct.unpack_from("<4sqqqqqq",
                                                            data, 0)
        if magic != _MAGIC:
            raise ValueError("bad EcmSketch magic")
        s = cls(depth=int(d), width=int(w), k=int(k), seed=int(seed))
        n = int(n)
        off = _HDR
        s.cell = np.frombuffer(data, dtype="<i4", count=n, offset=off).astype(np.int64)
        off += 4 * n
        logsz = np.frombuffer(data, dtype=np.uint8, count=n, offset=off)
        s.size = (np.int64(1) << logsz.astype(np.int64))
        off += n
        s.t_old = np.frombuffer(data, dtype="<i8", count=n, offset=off).astype(np.int64)
        off += 8 * n
        s.t_new = np.frombuffer(data, dtype="<i8", count=n, offset=off).astype(np.int64)
        s.t_max = np.int64(t_max)
        s._compacted_at = n  # wire state is canonical
        return s
