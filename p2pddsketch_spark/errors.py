"""Typed exceptions mirroring the reference's error-code table
(`/root/reference/error.h:10-26`, rendered by `error.cpp:7-58`).

Every reference code −1…−16 is accounted for: codes that can occur in
the Spark-native design map to a typed exception carrying `REF_CODE`;
codes that are structurally impossible here are documented in
`NOT_APPLICABLE` with the reason (no manual allocation, no gossip
topology, Spark owns partitioning).
"""

from __future__ import annotations

__all__ = ["SketchError", "MergeAlphaMismatch", "QuantileRangeError",
           "EmptySketchError", "GenericError", "FileError",
           "UnknownCollapseType", "ParamError", "UsageError",
           "ConflictingOptions", "REF_CODES", "NOT_APPLICABLE"]


class GenericError(RuntimeError):
    """Unclassified failure (reference code −1, GENERIC_ERROR)."""
    REF_CODE = -1


class FileError(OSError):
    """Input table/file unreadable or absent (reference code −3,
    FILE_ERROR — `loadDataset`, `main.cpp:399-441`)."""
    REF_CODE = -3


class SketchError(ValueError):
    """Invalid sketch state or parameters (reference code −4, SKETCH_ERROR)."""
    REF_CODE = -4


class MergeAlphaMismatch(SketchError):
    """Merging sketches with incompatible α/offset (reference code −5,
    MERGE_ERROR — `ddsketch.cc:673-676`)."""
    REF_CODE = -5


class QuantileRangeError(SketchError):
    """q outside [0, 1.01] (reference code −6, QUANTILE_ERROR —
    `ddsketch.cc:529-532`)."""
    REF_CODE = -6


class UnknownCollapseType(SketchError):
    """Collapse strategy not one of uniform/first/last (reference code
    −7, UNKNOWN_COLLAPSE_TYPE — `main.cpp:868-874`)."""
    REF_CODE = -7


class ParamError(SketchError):
    """Out-of-range parameter: α ∉ (0,1), bin_limit < 2, bad k/p/width
    (reference code −12, PARAM_ERROR — `main.cpp:797-938`). Subclass of
    SketchError so callers catching the broad class keep working."""
    REF_CODE = -12


class UsageError(ValueError):
    """CLI invoked with missing/invalid arguments (reference code −13,
    USAGE_ERROR). argparse raises SystemExit(2); jobs map it here when
    used as a library."""
    REF_CODE = -13


class ConflictingOptions(UsageError):
    """Mutually exclusive CLI options (reference code −14,
    CONFLICTING_OPTIONS)."""
    REF_CODE = -14


class EmptySketchError(SketchError):
    """Query against a sketch with n == 0 (no direct reference code; the
    reference returns NaN from `DDS_GetQuantile` on empty bins)."""


REF_CODES: dict[int, type] = {
    -1: GenericError,
    -3: FileError,
    -4: SketchError,
    -5: MergeAlphaMismatch,
    -6: QuantileRangeError,
    -7: UnknownCollapseType,
    -12: ParamError,
    -13: UsageError,
    -14: ConflictingOptions,
}

# Reference codes with no analog in the Spark design, and why.
NOT_APPLICABLE: dict[int, str] = {
    0: "SUCCESS — not an error",
    -2: "MEMORY_ERROR — no manual allocation (GC + Arrow buffers)",
    -8: "COPY_ERROR — no manual sketch copies (immutable blobs)",
    -9: "NULL_POINTER_ERROR — no raw pointers",
    -10: "GRAPH_GENERATION_ERROR — no gossip topology (shuffle tree)",
    -11: "UNKNOWN_GRAPH_TYPE — no gossip topology",
    -15: "DATASET_DIVISION_ERROR — Spark owns partitioning",
    -16: "EXIT — interactive simulator exit code",
}
