"""Windowed SpaceSaving — trailing-window heavy hitters from one pass,
completing the sliding-window monitoring suite (quantiles = wdds,
cardinality = shll, per-key counts = ecm, row rate = eh, top-k = this).

Not present in the reference (whose sketches are full-stream only);
this composes the repo's SpaceSaving (`sketches/spacesaving.py`,
Metwally et al. 2005 / mergeable form per Agarwal et al. 2012) with the
aligned time-bucket shape of `sketches/wdds.py`: one SpaceSaving(k) per
bucket of width `bucket_width` (timestamp native units), oldest buckets
folded into a single `tail` summary once more than `max_buckets` are
live.

* A trailing-window query merges the live buckets overlapping the
  window (ascending bucket order — deterministic) into a fresh
  SpaceSaving and ranks from that, so it inherits SpaceSaving's
  guarantees over the covered rows: tracked items satisfy
  f(x) ≤ f̂(x) ≤ f(x) + Σ_b floor_b, with Σ floors ≤ n_covered/k, and
  every item with f(x) > n_covered/k is present. Per-item `err` is the
  sketch's own (tighter) bound. Coverage is bucket-granular with the
  same `(covered_from, covered_to)` reporting contract as wdds.
* The fold cutoff is a deterministic function of the final t_max and
  folding is ascending-bucket-ordered, so merge results don't depend on
  merge order WHEN no bucket ever truncates (k ≥ per-bucket universe:
  SpaceSaving state is then the exact count table, canonical by key).
  Under truncation SpaceSaving merges are order-dependent (as for the
  full-stream family) — the harness's `merge_blobs` sorts blobs first,
  keeping any single fold deterministic, and the error bounds hold for
  EVERY merge order.
* Memory is bounded: ≤ max_buckets live summaries plus one tail, each
  O(k).

Harness integration: NEEDS_RAW with the same (n, 2) int64 [item, ts]
batches as SlidingHyperLogLog / EcmSketch (`pair_extractor`, or
`apair_extractor` to stamp every element of a tokens array with its
row's event time). The explicit `weights` path is weight-exact
(weighted == repeated, pinned by test) for direct pre-aggregated use.
"""

from __future__ import annotations

import struct

import numpy as np

from p2pddsketch_spark.errors import ParamError
from p2pddsketch_spark.sketches.spacesaving import SpaceSaving

_MAGIC = b"WSS1"
_HDR = struct.calcsize("<4sqqqqqB")
_T_NONE = np.int64(np.iinfo(np.int64).min)


class WindowedSpaceSaving:
    """Aligned time-bucketed SpaceSaving with a fold-into-tail cap."""

    __slots__ = ("k", "bucket_width", "max_buckets", "buckets", "tail",
                 "t_max")

    NEEDS_RAW = True  # harness feeds raw (item, ts) pair batches

    def __init__(self, k: int = 64, bucket_width: int = 3600,
                 max_buckets: int = 1024):
        if k < 1:
            raise ParamError(f"k must be >= 1, got {k}")
        if bucket_width <= 0:
            raise ParamError(f"bucket_width must be > 0, got {bucket_width}")
        if max_buckets < 1:
            raise ParamError(f"max_buckets must be >= 1, got {max_buckets}")
        self.k = int(k)
        self.bucket_width = int(bucket_width)
        self.max_buckets = int(max_buckets)
        self.buckets: dict[int, SpaceSaving] = {}
        self.tail: SpaceSaving | None = None
        self.t_max = _T_NONE

    # ------------------------------------------------------------- internals

    def _mk(self) -> SpaceSaving:
        return SpaceSaving(k=self.k)

    def _cutoff(self) -> int | None:
        """Smallest live bucket id (deterministic in the final t_max —
        same retention contract as WindowedDDSketch)."""
        if self.t_max == _T_NONE:
            return None
        return int(self.t_max) // self.bucket_width - self.max_buckets + 1

    def _refold(self) -> None:
        cut = self._cutoff()
        if cut is None:
            return
        old = sorted(b for b in self.buckets if b < cut)
        if not old:
            return
        if self.tail is None:
            self.tail = self._mk()
        for b in old:
            self.tail.merge(self.buckets.pop(b))

    # --------------------------------------------------------------- updates

    @property
    def n(self) -> int:
        return (sum(s.n for s in self.buckets.values())
                + (self.tail.n if self.tail is not None else 0))

    @property
    def n_live_buckets(self) -> int:
        return len(self.buckets)

    def update_batch(self, pairs: np.ndarray,
                     weights: np.ndarray | None = None
                     ) -> "WindowedSpaceSaving":
        p = np.asarray(pairs)
        if p.ndim != 2 or p.shape[1] != 2:
            raise ValueError("update_batch expects an (n, 2) [item, ts] "
                             "int64 array (pair_extractor output)")
        if p.shape[0] == 0:
            return self
        v = p[:, 0].astype(np.int64)
        t = p[:, 1].astype(np.int64)
        w = None if weights is None \
            else np.asarray(weights, dtype=np.int64).ravel()
        self.t_max = max(self.t_max, np.int64(t.max()))
        bid = np.floor_divide(t, self.bucket_width)
        cut = self._cutoff()
        late = bid < cut
        if late.any():
            if self.tail is None:
                self.tail = self._mk()
            self.tail.update_batch(v[late], None if w is None else w[late])
            keep = ~late
            v, bid = v[keep], bid[keep]
            w = None if w is None else w[keep]
        if v.size:
            order = np.argsort(bid, kind="stable")
            v, bid = v[order], bid[order]
            w = None if w is None else w[order]
            starts = np.flatnonzero(np.concatenate(
                ([True], bid[1:] != bid[:-1])))
            ends = np.concatenate((starts[1:], [bid.size]))
            for s, e in zip(starts, ends):
                b = int(bid[s])
                sk = self.buckets.get(b)
                if sk is None:
                    sk = self.buckets[b] = self._mk()
                sk.update_batch(v[s:e], None if w is None else w[s:e])
        self._refold()
        return self

    def merge(self, other: "WindowedSpaceSaving") -> "WindowedSpaceSaving":
        if (self.k, self.bucket_width, self.max_buckets) != \
                (other.k, other.bucket_width, other.max_buckets):
            raise ValueError("WindowedSpaceSaving parameter mismatch")
        for b in sorted(other.buckets):
            sk = other.buckets[b]
            mine = self.buckets.get(b)
            if mine is None:
                self.buckets[b] = sk.copy()
            else:
                mine.merge(sk)
        if other.tail is not None:
            if self.tail is None:
                self.tail = other.tail.copy()
            else:
                self.tail.merge(other.tail)
        self.t_max = max(self.t_max, other.t_max)
        self._refold()
        return self

    # ----------------------------------------------------------------- query

    def window_sketch(self, window: int | None = None,
                      now: int | None = None):
        """(merged SpaceSaving | None, covered_from, covered_to) for the
        trailing window `ts > now - window` (now defaults to t_max).
        Same bucket-granular coverage contract as
        `WindowedDDSketch.window_sketch`; `window=None` covers
        everything including the tail. Merge order is ascending bucket
        id (tail last) — deterministic."""
        W = self.bucket_width
        if window is None:
            parts = [self.buckets[b] for b in sorted(self.buckets)]
            if self.tail is not None:
                parts.append(self.tail)
            lo_cov = int(_T_NONE)
            hi_cov = int(self.t_max) + 1 if self.t_max != _T_NONE else 0
        else:
            ref = int(self.t_max) if now is None else int(now)
            lo = ref - int(window)          # window is ts > lo
            blo = lo // W
            bid_min = blo + 1 if blo * W + W - 1 <= lo else blo
            bid_max = ref // W
            inc = sorted(b for b in self.buckets if bid_min <= b <= bid_max)
            parts = [self.buckets[b] for b in inc]
            lo_cov = inc[0] * W if inc else 0
            hi_cov = (inc[-1] + 1) * W if inc else 0
        if not parts:
            return None, 0, 0
        acc = self._mk()
        for part in parts:          # merge() reads, never mutates, `part`
            acc.merge(part)
        return acc, int(lo_cov), int(hi_cov)

    def window_top(self, m: int | None = None, window: int | None = None,
                   now: int | None = None):
        """([(item, count_est, count_err)] ranked count desc / item asc,
        n_covered, covered_from, covered_to) over the trailing window.
        True count of a listed item lies in [count_est - count_err,
        count_est]; every item with true windowed count > n_covered/k
        is listed (for m >= k)."""
        acc, lo_cov, hi_cov = self.window_sketch(window, now)
        if acc is None:
            return [], 0, 0, 0
        return acc.top(m), int(acc.n), lo_cov, hi_cov

    def top(self, m: int | None = None):
        """Full-history top-m (lets the generic `rollup_topk` decode
        path treat wss like any other heavy-hitter blob)."""
        rows, _, _, _ = self.window_top(m)
        return rows

    # --------------------------------------------------------- serialization

    def to_bytes(self) -> bytes:
        bids = sorted(self.buckets)
        blobs = [self.buckets[b].to_bytes() for b in bids]
        tail = b"" if self.tail is None else self.tail.to_bytes()
        head = struct.pack("<4sqqqqqB", _MAGIC, self.k, self.bucket_width,
                           self.max_buckets, int(self.t_max), len(bids),
                           1 if self.tail is not None else 0)
        idx = b"".join(struct.pack("<qq", b, len(blob))
                       for b, blob in zip(bids, blobs))
        return head + idx + b"".join(blobs) + tail

    @classmethod
    def from_bytes(cls, data: bytes) -> "WindowedSpaceSaving":
        magic, k, width, max_b, t_max, n, has_tail = \
            struct.unpack_from("<4sqqqqqB", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad WindowedSpaceSaving magic")
        s = cls(k=int(k), bucket_width=int(width), max_buckets=int(max_b))
        s.t_max = np.int64(t_max)
        off = _HDR
        idx = [struct.unpack_from("<qq", data, off + 16 * i)
               for i in range(n)]
        off += 16 * n
        for b, ln in idx:
            s.buckets[int(b)] = SpaceSaving.from_bytes(data[off:off + ln])
            off += ln
        if has_tail:
            s.tail = SpaceSaving.from_bytes(data[off:])
        return s
