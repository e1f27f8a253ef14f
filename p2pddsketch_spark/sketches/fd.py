"""Frequent Directions — mergeable covariance/PCA sketch over a stream
of d-dimensional rows (Liberty, KDD 2013; Ghashami, Liberty, Phillips,
Woodruff, SIAM J. Comput. 2016 — PAPERS.md).

State: an ℓ×d matrix B. Updates append rows into a 2ℓ buffer; when full,
one SVD shrinks the spectrum by σ_ℓ² and keeps ℓ rows. Deterministic
guarantee (no randomness at all):

    0 ≼ AᵀA − BᵀB   and   ‖AᵀA − BᵀB‖₂ ≤ 2‖A‖_F² / ℓ

MERGEABLE: concatenating two sketches' rows and compacting preserves the
guarantee with added errors (Ghashami et al. Thm 3.1) — so it runs
through the same mapInArrow → shuffle-merge harness as every sketch
here. When ℓ ≥ rank(A) the shrinkage δ = σ_ℓ₊₁² is 0 at every
compaction, so BᵀB == AᵀA EXACTLY (lossless mode — the driver-gated
oracle `fd_gram_exact` exploits this; the compressive ℓ < d mode is
property-tested against the spectral bound).

What a 100 TB embedding pipeline uses it for: covariance/PCA directions
(whitening, low-rank structure checks, embedding-drift monitors) in one
pass with ℓ·d floats of state per partition instead of d² or n·d.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"FRD1"


class FrequentDirections:
    __slots__ = ("ell", "d", "rows", "n", "sum_sq")

    NEEDS_RAW = True  # needs the actual vectors, not (uniques, counts)

    def __init__(self, ell: int = 64, d: int = 64) -> None:
        if ell < 2:
            raise ValueError("ell must be >= 2")
        self.ell = int(ell)
        self.d = int(d)
        self.rows = np.zeros((0, self.d), dtype=np.float64)
        self.n = 0                  # rows ingested
        self.sum_sq = 0.0           # ‖A‖_F² (exact, for the bound)

    # --------------------------------------------------------------- update

    def update_batch(self, values: np.ndarray, weights=None) -> "FrequentDirections":
        """Ingest vectors. Accepts an (n, d) matrix or a flat array whose
        length is a multiple of d (the harness's list-column extractor
        flattens inside Arrow)."""
        if weights is not None:
            raise ValueError("FD update is unweighted")
        v = np.asarray(values, dtype=np.float64)
        if v.ndim == 1:
            if v.size % self.d:
                raise ValueError(f"flat input of {v.size} not a multiple of d={self.d}")
            v = v.reshape(-1, self.d)
        if v.shape[1] != self.d:
            raise ValueError(f"dim mismatch: got {v.shape[1]}, want {self.d}")
        if v.shape[0] == 0:
            return self
        self.n += v.shape[0]
        self.sum_sq += float(np.einsum("ij,ij->", v, v))
        self.rows = np.vstack([self.rows, v])
        # amortized compaction: keep at most 2ℓ buffered rows
        while self.rows.shape[0] > 2 * self.ell:
            self._compact()
        return self

    def _compact(self) -> None:
        take = self.rows[: 2 * self.ell]
        rest = self.rows[2 * self.ell:]
        _, s, vt = np.linalg.svd(take, full_matrices=False)
        if s.size > self.ell:
            delta = s[self.ell] ** 2
            s2 = np.sqrt(np.maximum(s[: self.ell] ** 2 - delta, 0.0))
            comp = s2[:, None] * vt[: self.ell]
        else:
            comp = s[:, None] * vt
        self.rows = np.vstack([comp, rest]) if rest.size else comp

    def _shrink_to_ell(self) -> np.ndarray:
        """Canonical ℓ-row form (compact whatever is buffered)."""
        b = self.rows
        if b.shape[0] > self.ell:
            _, s, vt = np.linalg.svd(b, full_matrices=False)
            if s.size > self.ell:
                delta = s[self.ell] ** 2
                s2 = np.sqrt(np.maximum(s[: self.ell] ** 2 - delta, 0.0))
                return s2[:, None] * vt[: self.ell]
            return s[:, None] * vt
        return b

    # ---------------------------------------------------------------- merge

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if (self.ell, self.d) != (other.ell, other.d):
            raise ValueError("FD ell/d mismatch")
        self.rows = np.vstack([self.rows, other.rows])
        self.n += other.n
        self.sum_sq += other.sum_sq
        while self.rows.shape[0] > 2 * self.ell:
            self._compact()
        return self

    # ---------------------------------------------------------------- query

    def gram(self) -> np.ndarray:
        """BᵀB of the canonical ℓ-row form — the covariance (uncentered)
        estimate; equals AᵀA exactly when ℓ ≥ rank(A). Queries use the
        canonical form (not the 2ℓ amortization buffer) so that
        serialization round-trips are value-preserving."""
        b = self._shrink_to_ell()
        return b.T @ b

    def singular_values(self) -> np.ndarray:
        return np.linalg.svd(self._shrink_to_ell(), compute_uv=False)

    def top_directions(self, k: int = 1) -> np.ndarray:
        """Top-k right singular vectors (PCA directions, rows)."""
        _, _, vt = np.linalg.svd(self._shrink_to_ell(), full_matrices=False)
        return vt[:k]

    def error_bound(self) -> float:
        """The deterministic spectral-error bound 2‖A‖_F²/ℓ."""
        return 2.0 * self.sum_sq / self.ell

    # -------------------------------------------------------- serialization

    def to_bytes(self) -> bytes:
        b = np.ascontiguousarray(self._shrink_to_ell(), dtype="<f8")
        hdr = struct.pack("<4sqqqqd", _MAGIC, self.ell, self.d,
                          b.shape[0], self.n, self.sum_sq)
        return hdr + b.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "FrequentDirections":
        magic, ell, d, nrows, n, sum_sq = struct.unpack_from("<4sqqqqd", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad FD magic")
        s = cls(ell=int(ell), d=int(d))
        off = struct.calcsize("<4sqqqqd")
        s.rows = np.frombuffer(data, dtype="<f8", count=int(nrows) * int(d),
                               offset=off).reshape(int(nrows), int(d)).copy()
        s.n = int(n)
        s.sum_sq = float(sum_sq)
        return s
