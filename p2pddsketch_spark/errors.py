"""Typed exceptions mirroring the reference's error-code table
(`/root/reference/error.h:10-26`, rendered by `error.cpp:7-58`).

Only the codes that can actually occur in the Spark-native design are
kept: memory/graph/gossip codes are meaningless here (no manual
allocation, no topology).
"""

from __future__ import annotations

__all__ = ["SketchError", "MergeAlphaMismatch", "QuantileRangeError",
           "EmptySketchError"]


class SketchError(ValueError):
    """Invalid sketch state or parameters (reference code −4, SKETCH_ERROR)."""


class MergeAlphaMismatch(SketchError):
    """Merging sketches with incompatible α/offset (reference code −5,
    MERGE_ERROR — `ddsketch.cc:673-676`)."""


class QuantileRangeError(SketchError):
    """q outside [0, 1.01] (reference code −6, QUANTILE_ERROR —
    `ddsketch.cc:529-532`)."""


class EmptySketchError(SketchError):
    """Query against a sketch with n == 0."""
