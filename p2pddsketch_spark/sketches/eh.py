"""Exponential histogram — sliding-window counts in O(k · log N) space
(Datar, Gionis, Indyk, Motwani, "Maintaining Stream Statistics over
Sliding Windows", SODA 2002).

Not present in the reference (its only sketch is DDSketch); this is the
sliding-window analog of a plain counter: after one pass over a
timestamped stream it answers "how many items arrived in the last w
time units" for ANY w, within a per-query error bound it also reports.
Same three-phase algebra as the other sketches (zero → update_batch →
merge, query at the end), so it rides the harness unchanged; the
ECM-sketch (`sketches/ecm.py`) reuses this module's vectorized bucket
table to make every count-min counter window-aware.

Design notes (vs the textbook formulation):

* Buckets store BOTH endpoints (t_old, t_new) of the item span they
  cover, not just the newest timestamp. That upgrades the estimator
  from "half the straddling bucket" guesswork to an exact per-query
  error receipt: a bucket is counted fully iff t_old > cutoff, counted
  size/2 iff it straddles (t_old <= cutoff < t_new), and the query
  returns err_bound = sum(straddler sizes)/2 alongside the estimate.
  |estimate - truth| <= err_bound holds UNCONDITIONALLY — including
  out-of-order / late arrivals, where the classic relative-error bound
  does not apply (spans may overlap; every straddler is accounted).
* Batched, vectorized compaction: a batch first group-sums counts per
  timestamp, binary-decomposes each sum into power-of-two buckets, then
  canonicalizes level-by-level (size 1, 2, 4, ... ascending): whenever
  a size class holds more than k buckets, the oldest are merged
  pairwise into the next class. One numpy pass per occupied level —
  no per-item Python, which is what lets the ECM-sketch run this over
  every (cell) segment of a d×w count-min table at once.
* merge(a, b) concatenates bucket tables and re-canonicalizes from the
  sorted union — a deterministic function of the combined bucket
  multiset, so merge is COMMUTATIVE with byte-identical results.
  Unlike HLL/DDSketch it is not byte-associative (compaction discards
  pairing history); re-association stays inside the reported error
  bound, which the property tests pin.

For in-order unit streams the classic guarantee applies: with k buckets
allowed per size class the relative error of a window count is at most
1/(2(k-1)) (`rel_error_bound`), checked empirically in
tests/test_eh_ecm.py.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"EXH1"
_HDR = struct.calcsize("<4sqqq")
_T_NONE = np.int64(np.iinfo(np.int64).min)


def compact_table(cell: np.ndarray, size: np.ndarray, t_old: np.ndarray,
                  t_new: np.ndarray, k: int):
    """Canonicalize a bucket table, vectorized across all cells at once.

    Input arrays are parallel; `cell` segments the table (a standalone
    ExpHistogram passes zeros). Returns arrays sorted by
    (cell, t_new, t_old, size) with at most k buckets per (cell, size).
    Merging pairs the oldest-by-t_new buckets of an over-full size class
    and carries t_old=min, t_new=max, deterministically — the output is
    a pure function of the input multiset.
    """
    cell = np.asarray(cell, dtype=np.int64)
    size = np.asarray(size, dtype=np.int64)
    t_old = np.asarray(t_old, dtype=np.int64)
    t_new = np.asarray(t_new, dtype=np.int64)
    if cell.size == 0:
        return cell, size, t_old, t_new
    # Bucket sizes are powers of two by construction (decompose_counts
    # emits bit buckets; merges double). Work per LEVEL slice, never the
    # whole table: an over-full level's oldest pairs merge upward into a
    # carry that joins the next level's pool. O(n log n) total vs the
    # naive per-level full-table rescan (O(n · levels) per call, which
    # dominated batched ECM updates).
    lvl = np.log2(size.astype(np.float64)).astype(np.int64)
    order0 = np.argsort(lvl, kind="stable")
    lvl_sorted = lvl[order0]
    bounds = np.searchsorted(lvl_sorted, np.arange(64), side="left")
    pools: dict[int, tuple] = {}
    for v in np.unique(lvl_sorted):
        sl = order0[bounds[v]:bounds[v + 1] if v < 63 else lvl_sorted.size]
        pools[int(v)] = (cell[sl], t_old[sl], t_new[sl])
    out_c, out_s, out_to, out_tn = [], [], [], []
    carry = None
    v = min(pools)
    while pools or carry is not None:
        parts = []
        if v in pools:
            parts.append(pools.pop(v))
        if carry is not None:
            parts.append(carry)
            carry = None
        if not parts:
            v = min(pools) if pools else v
            continue
        c = np.concatenate([p[0] for p in parts])
        to = np.concatenate([p[1] for p in parts])
        tn = np.concatenate([p[2] for p in parts])
        # oldest-first within each cell: order by (cell, t_new, t_old)
        order = np.lexsort((to, tn, c))
        c, to, tn = c[order], to[order], tn[order]
        _, counts = np.unique(c, return_counts=True)
        merges = np.maximum(0, -(-(counts - k) // 2))  # ceil((m-k)/2)
        if merges.any():
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            rank = np.arange(c.size) - np.repeat(starts, counts)
            in_pair = rank < np.repeat(2 * merges, counts)
            # pairs are (even_i, odd_i): consecutive oldest buckets of
            # the same cell; evens/odds interleave identically across
            # the (cell, rank)-ordered concatenation, so position i of
            # each slice is the same cell's i-th pair
            even = in_pair & (rank % 2 == 0)
            odd = in_pair & (rank % 2 == 1)
            carry = (c[even],
                     np.minimum(to[even], to[odd]),
                     np.maximum(tn[even], tn[odd]))
            keep = ~in_pair
            c, to, tn = c[keep], to[keep], tn[keep]
        if c.size:
            out_c.append(c)
            out_s.append(np.full(c.size, np.int64(1) << v, dtype=np.int64))
            out_to.append(to)
            out_tn.append(tn)
        v = v + 1 if carry is not None else (min(pools) if pools else v)
    cell = np.concatenate(out_c)
    size = np.concatenate(out_s)
    t_old = np.concatenate(out_to)
    t_new = np.concatenate(out_tn)
    order = np.lexsort((size, t_old, t_new, cell))
    return cell[order], size[order], t_old[order], t_new[order]


def decompose_counts(cell: np.ndarray, ts: np.ndarray, counts: np.ndarray):
    """Binary-decompose per-(cell, ts) counts into power-of-two unit
    buckets (t_old == t_new == ts). Vectorized over set bits."""
    counts = np.asarray(counts, dtype=np.int64)
    out_c, out_s, out_t = [], [], []
    live = counts > 0
    bit = 0
    while live.any():
        has = ((counts >> bit) & 1).astype(bool) & live
        if has.any():
            out_c.append(cell[has])
            out_s.append(np.full(int(has.sum()), 1 << bit, dtype=np.int64))
            out_t.append(ts[has])
        bit += 1
        live = (counts >> bit) > 0
    if not out_c:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    return (np.concatenate(out_c), np.concatenate(out_s),
            np.concatenate(out_t))


def query_table(cell: np.ndarray, size: np.ndarray, t_old: np.ndarray,
                t_new: np.ndarray, cells: np.ndarray, cutoff: int):
    """(estimate, err_bound) per queried cell id, counting items with
    ts > cutoff. Table must be sorted by cell (compact_table order).
    Full buckets (t_old > cutoff) count whole; straddlers
    (t_old <= cutoff < t_new) count size/2 and contribute size/2 to the
    error bound."""
    lo = np.searchsorted(cell, cells, side="left")
    hi = np.searchsorted(cell, cells, side="right")
    full = (t_old > cutoff).astype(np.float64) * size
    strad = ((t_old <= cutoff) & (t_new > cutoff)).astype(np.float64) * size
    cf = np.concatenate(([0.0], np.cumsum(full)))
    cs = np.concatenate(([0.0], np.cumsum(strad)))
    est = (cf[hi] - cf[lo]) + (cs[hi] - cs[lo]) / 2.0
    err = (cs[hi] - cs[lo]) / 2.0
    return est, err


class ExpHistogram:
    """Sliding-window counter over a timestamped stream."""

    __slots__ = ("k", "size", "t_old", "t_new", "t_max")

    NEEDS_RAW = True  # harness feeds raw (value, ts) pair batches

    def __init__(self, k: int = 32) -> None:
        if k < 2:
            raise ValueError(f"k must be >= 2, got {k}")
        self.k = int(k)
        self.size = np.zeros(0, dtype=np.int64)
        self.t_old = np.zeros(0, dtype=np.int64)
        self.t_new = np.zeros(0, dtype=np.int64)
        self.t_max = _T_NONE

    @property
    def rel_error_bound(self) -> float:
        """Classic DGIM guarantee for in-order unit streams."""
        return 1.0 / (2.0 * (self.k - 1))

    @property
    def n_buckets(self) -> int:
        return int(self.size.size)

    @property
    def total(self) -> int:
        """Exact all-time item count (bucket sizes are lossless)."""
        return int(self.size.sum())

    # --------------------------------------------------------------- updates

    def update_batch(self, timestamps: np.ndarray, counts=None) -> "ExpHistogram":
        """Record `counts[i]` (default 1) items at `timestamps[i]`.
        Accepts an (n, 2) [timestamp, count] array too (harness raw
        pair form)."""
        t = np.asarray(timestamps)
        if t.ndim == 2 and t.shape[1] == 2:
            counts = t[:, 1]
            t = t[:, 0]
        t = t.astype(np.int64).ravel()
        if t.size == 0:
            return self
        if counts is None:
            c = np.ones(t.size, dtype=np.int64)
        else:
            c = np.asarray(counts, dtype=np.int64).ravel()
            if (c < 0).any():
                raise ValueError("ExpHistogram counts must be >= 0")
        ut, inv = np.unique(t, return_inverse=True)
        uc = np.zeros(ut.size, dtype=np.int64)
        np.add.at(uc, inv, c)  # exact int64, no float weights
        zc = np.zeros(ut.size, dtype=np.int64)
        _, ns, nt = decompose_counts(zc, ut, uc)
        zero = np.zeros(self.size.size + ns.size, dtype=np.int64)
        _, self.size, self.t_old, self.t_new = compact_table(
            zero,
            np.concatenate((self.size, ns)),
            np.concatenate((self.t_old, nt)),
            np.concatenate((self.t_new, nt)),
            self.k)
        self.t_max = max(self.t_max, np.int64(ut[-1]))
        return self

    # ----------------------------------------------------------------- merge

    def merge(self, other: "ExpHistogram") -> "ExpHistogram":
        if self.k != other.k:
            raise ValueError("ExpHistogram k mismatch")
        zero = np.zeros(self.size.size + other.size.size, dtype=np.int64)
        _, self.size, self.t_old, self.t_new = compact_table(
            zero,
            np.concatenate((self.size, other.size)),
            np.concatenate((self.t_old, other.t_old)),
            np.concatenate((self.t_new, other.t_new)),
            self.k)
        self.t_max = max(self.t_max, other.t_max)
        return self

    # ----------------------------------------------------------------- query

    def count(self, cutoff: int | None = None) -> tuple[float, float]:
        """(estimate, err_bound) of items with ts > cutoff; cutoff=None
        counts everything (err_bound 0). |estimate - truth| <= err_bound
        always."""
        if self.size.size == 0:
            return 0.0, 0.0
        if cutoff is None:
            return float(self.size.sum()), 0.0
        zero = np.zeros(self.size.size, dtype=np.int64)
        est, err = query_table(zero, self.size, self.t_old, self.t_new,
                               np.zeros(1, dtype=np.int64), int(cutoff))
        return float(est[0]), float(err[0])

    def count_last(self, window: int, now: int | None = None) -> tuple[float, float]:
        """(estimate, err_bound) of items in the last `window` time
        units, i.e. ts > now - window."""
        ref = int(self.t_max) if now is None else int(now)
        return self.count(ref - int(window))

    # --------------------------------------------------------- serialization

    def to_bytes(self) -> bytes:
        return (struct.pack("<4sqqq", _MAGIC, self.k, int(self.t_max),
                            self.size.size)
                + self.size.astype("<i8").tobytes()
                + self.t_old.astype("<i8").tobytes()
                + self.t_new.astype("<i8").tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "ExpHistogram":
        magic, k, t_max, n = struct.unpack_from("<4sqqq", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad ExpHistogram magic")
        s = cls(k=int(k))
        n = int(n)
        off = _HDR
        s.size = np.frombuffer(data, dtype="<i8", count=n, offset=off).astype(np.int64)
        off += 8 * n
        s.t_old = np.frombuffer(data, dtype="<i8", count=n, offset=off).astype(np.int64)
        off += 8 * n
        s.t_new = np.frombuffer(data, dtype="<i8", count=n, offset=off).astype(np.int64)
        s.t_max = np.int64(t_max)
        return s
