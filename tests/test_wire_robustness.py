"""Wire-format robustness across EVERY registered sketch family.

Warehouse blobs (operators/rollup.py) and checkpoint partials persist to
parquet and are re-decoded across sessions and versions; a torn write or
a corrupted byte must surface as a clean typed error, never a silent
mis-decode (which would poison every later merge). This suite pins, for
all 22 magics in `operators/harness.SKETCH_TYPES`:

* every strict prefix of a valid blob FAILS to decode (no silent
  truncation acceptance), and fails with ValueError or struct.error —
  the two types the rollup fsck / CLI error contract converts to the
  one-line JSON error;
* an unknown magic and a bit-flipped magic raise ValueError;
* `merge_blobs` refuses an empty list and a mixed-type blob set with a
  clean ValueError naming the magics (previously an IndexError /
  AttributeError from deep inside some .merge());
* the `sketch_merge` SQL UDAF aggregates an all-NULL group to NULL,
  matching built-in aggregate semantics.

Trailing EXTRA bytes after a valid blob are tolerated by design: every
decoder reads exactly what its header describes (header-driven decode),
so a blob stored in a fixed-size slot remains readable.
"""

import struct

import numpy as np
import pytest

from p2pddsketch_spark.operators.harness import (SKETCH_TYPES, merge_blobs,
                                                 sketch_from_bytes)

RNG = np.random.default_rng(3)
_INTS = RNG.integers(1, 1000, 300).astype(np.int64)
_FLOATS = RNG.normal(50.0, 10.0, 300)


def _tpair(vals: np.ndarray) -> np.ndarray:
    return np.stack([vals.astype(np.float64),
                     np.arange(vals.size, dtype=np.float64)], axis=1)


def _build(magic: bytes):
    """A small representative sketch per wire format."""
    cls = SKETCH_TYPES[magic]
    if magic == b"DDS1":
        return cls(alpha=0.01).update_batch(_FLOATS)
    if magic == b"HLL1":
        return cls(p=10).update_batch(_INTS)          # dense regime
    if magic == b"HLL2":
        return cls(p=10).update_batch(_INTS[:3])      # sparse regime
    if magic == b"CMS1":
        return cls(depth=3, width=64).update_batch(_INTS)
    if magic == b"BLM1":
        return cls(m_bits=1 << 10, k=3).update_batch(_INTS)
    if magic == b"CBF1":
        return cls(m=1 << 10, k=3).update_batch(_INTS)
    if magic == b"KLL1":
        return cls(k=16).update_batch(_FLOATS)
    if magic == b"KLT1":
        return cls().update_batch(_FLOATS)
    if magic == b"TDG1":
        return cls().update_batch(_FLOATS)
    if magic == b"SSV2":
        return cls(k=8).update_batch(_INTS)
    if magic == b"BTK1":
        return cls(k=8).update_batch(_INTS)
    if magic == b"THT1":
        return cls(k=16).update_batch(_INTS)
    if magic == b"FRD1":
        return cls(ell=4, d=6).update_batch(RNG.normal(size=(30, 6)))
    if magic == b"WTK1":
        return cls(k=8).update_batch(_INTS, np.ones(_INTS.size))
    if magic == b"MOM1":
        return cls().update_batch(_FLOATS)
    if magic == b"REQ1":
        return cls(k=8).update_batch(_FLOATS)
    if magic == b"AMS1":
        return cls(64).update_batch(_INTS)
    if magic == b"SHL1":
        return cls(p=8).update_batch(_tpair(_INTS))
    if magic == b"EXH1":
        return cls(k=4).update_batch(_tpair(np.ones(300)))
    if magic == b"ECM1":
        return cls().update_batch(_tpair(_INTS))
    if magic == b"WDD1":
        from p2pddsketch_spark.sketches.wdds import PAIR_DTYPE
        p = np.empty(300, dtype=PAIR_DTYPE)
        p["v"], p["t"] = _FLOATS, np.arange(300)
        return cls().update_batch(p)
    if magic == b"WSS1":
        return cls(k=8).update_batch(_tpair(_INTS))
    raise AssertionError(f"no builder for {magic!r} — add one here when "
                         "registering a new sketch family")


def _cuts(n: int):
    """Every prefix length up to 64, then a stride, then the tail."""
    dense = list(range(4, min(n, 64)))
    strided = list(range(64, n, 7))
    tail = list(range(max(4, n - 16), n))
    return sorted(set(dense + strided + tail))


@pytest.mark.parametrize("magic", sorted(SKETCH_TYPES), ids=lambda m: m.decode())
def test_every_strict_prefix_fails_cleanly(magic):
    sk = _build(magic)
    blob = sk.to_bytes()
    # HLL auto-selects its wire format; make sure the builder actually
    # produced the format under test
    assert bytes(blob[:4]) == magic, (magic, blob[:4])
    for cut in _cuts(len(blob)):
        with pytest.raises((ValueError, struct.error)):
            sketch_from_bytes(blob[:cut])


@pytest.mark.parametrize("magic", sorted(SKETCH_TYPES), ids=lambda m: m.decode())
def test_flipped_magic_rejected(magic):
    blob = bytearray(_build(magic).to_bytes())
    blob[0] ^= 0xFF
    with pytest.raises(ValueError):
        sketch_from_bytes(bytes(blob))


def test_unknown_magic_rejected():
    with pytest.raises(ValueError, match="unknown sketch magic"):
        sketch_from_bytes(b"ZZZZ" + b"\x00" * 32)
    with pytest.raises(ValueError):
        sketch_from_bytes(b"")


def test_merge_blobs_refuses_empty_and_mixed_types():
    from p2pddsketch_spark.sketches.hll import HyperLogLog
    from p2pddsketch_spark.sketches.kll import KLLSketch
    with pytest.raises(ValueError, match="no blobs"):
        merge_blobs([])
    h = HyperLogLog(p=10).update_batch(_INTS).to_bytes()
    k = KLLSketch(k=16).update_batch(_FLOATS).to_bytes()
    with pytest.raises(ValueError, match="mixed"):
        merge_blobs([h, k])
    # same class in two wire formats is NOT mixed: dense HLL1 + sparse
    # HLL2 merge fine
    h2 = HyperLogLog(p=10).update_batch(_INTS[:3]).to_bytes()
    assert h2[:4] == b"HLL2" and h[:4] == b"HLL1"
    merged = merge_blobs([h, h2])
    direct = HyperLogLog(p=10).update_batch(_INTS)  # INTS[:3] ⊂ INTS
    assert merged == direct.to_bytes()


def test_sketch_merge_udaf_all_null_group_is_null(spark):
    """An outer join can hand sketch_merge a group of only NULL blobs;
    it must aggregate to NULL like SUM/MAX do, not crash the worker."""
    from p2pddsketch_spark.functions.sketch_udfs import sketch_merge_udaf
    from p2pddsketch_spark.sketches.hll import HyperLogLog
    blob = HyperLogLog(p=10).update_batch(_INTS).to_bytes()
    rows = [(1, bytearray(blob)), (1, None), (2, None), (2, None)]
    df = spark.createDataFrame(rows, "g int, sk binary")
    got = {r["g"]: r["m"] for r in
           df.groupBy("g").agg(sketch_merge_udaf()("sk").alias("m")).collect()}
    assert bytes(got[1]) == blob
    assert got[2] is None
