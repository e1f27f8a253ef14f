"""Windowed DDSketch — quantiles over trailing time windows from one
pass, the sliding-window analog of the library's centerpiece.

Not present in the reference (whose DDSketch answers full-stream
quantiles only, `/root/reference/ddsketch.cc:520-557`); this composes
the repo's DDSketch (`sketches/ddsketch.py`) with the aligned
time-bucket rollup shape every monitoring warehouse uses: one DDSketch
per bucket of width `bucket_width` (in the timestamp's native units),
oldest buckets folded into a single `tail` sketch once more than
`max_buckets` are live.

* A trailing-window query merges the live buckets intersecting the
  window and answers from that merge, so it inherits DDSketch's
  published relative-error guarantee α EXACTLY over the covered rows —
  no extra looseness. Coverage is bucket-granular: the query reports
  `(covered_from, covered_to)` alongside the estimates, and a
  bucket-aligned window is covered exactly (pinned by test).
* State is a canonical function of the observed (value, ts) multiset:
  live buckets are exactly the data in buckets `> newest - max_buckets`
  (newest derived from the global t_max), the tail is exactly the rest,
  and DDSketch bins are insertion-order-independent — so merge is fully
  order-invariant with byte-identical results and the harness merge
  tree applies unchanged. (The caveat is DDSketch's own: a per-bucket
  `bin_limit` collapse is the one order-dependent path, which the
  default 2^20 limit never reaches in practice — same contract as the
  main harness.)
* Memory is bounded: ≤ max_buckets live DDSketches plus one tail, each
  bounded by bin_limit.

Harness integration: NEEDS_RAW with `vpair_extractor(value_col,
ts_col)` (`operators/harness.py`) feeding a structured (v float64,
t int64) batch — values keep full double precision (the int64 pair
extractor the counting sliders use would truncate them).
"""

from __future__ import annotations

import struct

import numpy as np

from p2pddsketch_spark.errors import ParamError
from p2pddsketch_spark.sketches.ddsketch import DDSketch

_MAGIC = b"WDD1"
_HDR = struct.calcsize("<4sdqqqqqB")
_T_NONE = np.int64(np.iinfo(np.int64).min)
PAIR_DTYPE = np.dtype([("v", "<f8"), ("t", "<i8")])


class WindowedDDSketch:
    """Aligned time-bucketed DDSketch with a fold-into-tail retention cap."""

    __slots__ = ("alpha", "bucket_width", "max_buckets", "bin_limit",
                 "buckets", "tail", "t_max")

    NEEDS_RAW = True  # harness feeds raw (value, ts) structured batches

    def __init__(self, alpha: float = 0.01, bucket_width: int = 3600,
                 max_buckets: int = 1024, bin_limit: int = 1 << 20):
        if bucket_width <= 0:
            raise ParamError(f"bucket_width must be > 0, got {bucket_width}")
        if max_buckets < 1:
            raise ParamError(f"max_buckets must be >= 1, got {max_buckets}")
        self.alpha = float(alpha)
        self.bucket_width = int(bucket_width)
        self.max_buckets = int(max_buckets)
        self.bin_limit = int(bin_limit)
        self.buckets: dict[int, DDSketch] = {}
        self.tail: DDSketch | None = None
        self.t_max = _T_NONE

    # ------------------------------------------------------------- internals

    def _mk(self) -> DDSketch:
        return DDSketch(alpha=self.alpha, bin_limit=self.bin_limit)

    def _cutoff(self) -> int | None:
        """Smallest live bucket id; buckets below it belong to the tail.
        A deterministic function of the final t_max — what makes merge
        order-invariant even though folding is lossy."""
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
                     weights: np.ndarray | None = None) -> "WindowedDDSketch":
        p = np.asarray(pairs)
        if p.dtype.names != ("v", "t"):
            raise ValueError("update_batch expects a (v float64, t int64) "
                             "structured array (vpair_extractor output)")
        if p.size == 0:
            return self
        v = p["v"]
        t = p["t"]
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

    def merge(self, other: "WindowedDDSketch") -> "WindowedDDSketch":
        if (self.alpha, self.bucket_width, self.max_buckets,
                self.bin_limit) != (other.alpha, other.bucket_width,
                                    other.max_buckets, other.bin_limit):
            raise ValueError("WindowedDDSketch parameter mismatch")
        for b, sk in other.buckets.items():
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
        """(merged DDSketch | None, covered_from, covered_to) for the
        trailing window `ts > now - window` (now defaults to t_max, the
        same convention as the counting sliders' `*_last`).

        Coverage is bucket-granular: every live bucket OVERLAPPING the
        window is merged whole, and `[covered_from, covered_to)` is the
        exact ts range those buckets span — equal to the requested
        window iff the window is bucket-aligned. A window reaching past
        the retention horizon silently covers only the live range (the
        returned covered_from says so); `window=None` covers everything
        including the tail (covered_from = t_min sentinel). None when
        no bucket overlaps."""
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
        # copy even the single-bucket case: the result is a caller-owned
        # sketch, never an alias into live windowed state
        merged = (parts[0].copy() if len(parts) == 1
                  else DDSketch.merge_many(parts))
        return merged, int(lo_cov), int(hi_cov)

    def window_quantiles(self, qs, window: int | None = None,
                         now: int | None = None):
        """(estimates, n_covered, covered_from, covered_to) — quantiles
        of `window_sketch` (see there for coverage semantics)."""
        qs = np.asarray(qs, dtype=np.float64)
        merged, lo_cov, hi_cov = self.window_sketch(window, now)
        if merged is None:
            return (np.full(qs.shape, np.nan), 0, 0, 0)
        return (merged.quantiles(qs), int(merged.n), lo_cov, hi_cov)

    def quantile(self, q: float) -> float:
        """Full-history quantile (lets the generic `rollup_quantiles`
        decode path treat wdds like any other quantile blob)."""
        ests, _, _, _ = self.window_quantiles([q])
        return float(ests[0])

    # --------------------------------------------------------- serialization

    def to_bytes(self) -> bytes:
        bids = sorted(self.buckets)
        blobs = [self.buckets[b].to_bytes() for b in bids]
        tail = b"" if self.tail is None else self.tail.to_bytes()
        head = struct.pack("<4sdqqqqqB", _MAGIC, self.alpha, self.bin_limit,
                           self.bucket_width, self.max_buckets,
                           int(self.t_max), len(bids),
                           1 if self.tail is not None else 0)
        idx = b"".join(struct.pack("<qq", b, len(blob))
                       for b, blob in zip(bids, blobs))
        return head + idx + b"".join(blobs) + tail

    @classmethod
    def from_bytes(cls, data: bytes) -> "WindowedDDSketch":
        magic, alpha, bin_limit, width, max_b, t_max, n, has_tail = \
            struct.unpack_from("<4sdqqqqqB", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad WindowedDDSketch magic")
        s = cls(alpha=alpha, bucket_width=int(width), max_buckets=int(max_b),
                bin_limit=int(bin_limit))
        s.t_max = np.int64(t_max)
        off = _HDR
        idx = [struct.unpack_from("<qq", data, off + 16 * i)
               for i in range(n)]
        off += 16 * n
        for b, ln in idx:
            s.buckets[int(b)] = DDSketch.from_bytes(data[off:off + ln])
            off += ln
        if has_tail:
            s.tail = DDSketch.from_bytes(data[off:])
        return s
