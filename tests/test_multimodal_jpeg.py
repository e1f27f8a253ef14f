"""Baseline-JPEG codec tests (`operators/jpeg.py`).

The golden tests build minimal JPEG byte streams BY HAND per ITU-T T.81
(not via our encoder) with trivial Huffman tables, and check the decoder
against analytically computed IDCT outputs — so decoder conformance
does not rest on encoder/decoder sharing assumptions. Round-trip tests
then drive every decoder path (4:4:4, 4:2:0, grayscale, restart
markers, multi-MCU DC prediction) through the encoder."""

import math

import numpy as np
import pytest

from p2pddsketch_spark.operators.jpeg import decode_jpeg, encode_jpeg
from p2pddsketch_spark.operators.multimodal import decode_image

ZZ16 = bytes([16] * 64)  # flat quant table (zigzag order is moot)


def _seg(marker: bytes, body: bytes) -> bytes:
    return marker + (len(body) + 2).to_bytes(2, "big") + body


def _minimal_gray(entropy: bytes, dc_counts, dc_syms, ac_counts, ac_syms,
                  quant: bytes = ZZ16) -> bytes:
    """8×8 single-component baseline JPEG with caller-chosen tables."""
    out = b"\xff\xd8"
    out += _seg(b"\xff\xdb", bytes([0]) + quant)
    out += _seg(b"\xff\xc0", bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    out += _seg(b"\xff\xc4", bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    out += _seg(b"\xff\xc4", bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
    out += _seg(b"\xff\xda", bytes([1, 1, 0x00, 0, 63, 0]))
    return out + entropy + b"\xff\xd9"


def test_golden_dc_only_block():
    # DC table: one symbol (category 3), 1-bit code '0'.
    # AC table: one symbol (EOB), 1-bit code '0'.
    # Stream: '0' (huff cat3) + '100' (DC=4) + '0' (EOB), pad '111'
    # → 0b01000111 = 0x47. Dequant DC = 4*16 = 64 → every pixel
    # 64/8 + 128 = 136 exactly.
    dc_counts = [1] + [0] * 15
    ac_counts = [1] + [0] * 15
    data = _minimal_gray(b"\x47", dc_counts, [3], ac_counts, [0x00])
    img = decode_jpeg(data)
    assert img.shape == (8, 8, 3)
    assert np.all(img == 136)


def test_golden_single_ac_coefficient():
    # DC table: symbol 0 (category 0), code '0'. AC: two 2-bit symbols
    # [0x01, 0x00] → codes 00, 01. Stream: '0' (DC cat0, no bits) +
    # '00' (run0/size1) + '1' (amplitude +1) + '01' (EOB), pad '11'
    # → 0b00010111 = 0x17. Coefficient lands at zigzag index 1 =
    # natural (0,1): S[0,1] = 1*16; pixel(y,x) = A[0,y]·16·A[1,x] + 128
    # with A[0,·] = 1/(2√2), A[1,x] = ½·cos((2x+1)π/16).
    dc_counts = [1] + [0] * 15
    ac_counts = [0, 2] + [0] * 14
    data = _minimal_gray(b"\x17", dc_counts, [0], ac_counts, [0x01, 0x00])
    img = decode_jpeg(data)
    expected = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            expected[y, x] = (1 / (2 * math.sqrt(2)) * 16 *
                              0.5 * math.cos((2 * x + 1) * math.pi / 16) + 128)
    expected = np.clip(np.round(expected), 0, 255).astype(np.uint8)
    assert np.array_equal(img[:, :, 0], expected)
    assert np.array_equal(img[:, :, 0], img[:, :, 1])


def _smooth(h, w, seed=0):
    """Band-limited test image — JPEG should reproduce it closely."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3))
    for c in range(3):
        img[:, :, c] = (128 + 60 * np.sin(xx / (8 + 3 * c) + c) *
                        np.cos(yy / (11 - 2 * c)) + rng.normal(0, 2, (h, w)))
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def test_roundtrip_444():
    img = _smooth(40, 56)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample="444"))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 3 and err.max() < 32


def test_roundtrip_420_and_odd_size():
    img = _smooth(33, 47, seed=1)  # non-multiple of 16 exercises padding
    out = decode_jpeg(encode_jpeg(img, quality=92, subsample="420"))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 5 and err.max() < 48


def test_roundtrip_grayscale():
    g = _smooth(24, 24, seed=2)[:, :, 0]
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (24, 24, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 2])
    err = np.abs(out[:, :, 0].astype(int) - g.astype(int))
    assert err.mean() < 3


def test_restart_markers_do_not_change_pixels():
    img = _smooth(48, 64, seed=3)
    plain = decode_jpeg(encode_jpeg(img, quality=90, subsample="420"))
    rst = encode_jpeg(img, quality=90, subsample="420", restart_interval=2)
    assert b"\xff\xd0" in rst  # restart markers actually emitted
    assert np.array_equal(decode_jpeg(rst), plain)


def test_decode_image_dispatches_jpeg():
    img = _smooth(16, 16, seed=4)
    out = decode_image(encode_jpeg(img, quality=95))
    assert out.shape == (16, 16, 3)


def test_progressive_rejected():
    img = _smooth(8, 8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # masquerade as progressive
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_quality100_constant_tiles_roundtrip_exactly():
    """The jpeg_decode_features oracle's premise: at quality 100 every
    quant value is 1, so an 8×8-constant tile quantizes losslessly and
    decode reproduces it EXACTLY — pinned for all 256 gray levels."""
    vals = np.arange(256, dtype=np.uint8)
    img = np.repeat(np.repeat(vals.reshape(16, 16), 8, axis=0), 8, axis=1)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.array_equal(out[:, :, 0], img)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


def test_fuzz_roundtrip_shapes_and_qualities():
    """Randomized encoder/decoder agreement across sizes (odd included),
    qualities, subsampling modes, and restart intervals — shape always
    exact, error bounded by the quality tier."""
    rng = np.random.default_rng(42)
    for _ in range(12):
        h = int(rng.integers(8, 41))
        w = int(rng.integers(8, 41))
        q = int(rng.integers(70, 101))
        sub = rng.choice(["444", "420"])
        ri = int(rng.integers(0, 4))
        img = _smooth(h, w, seed=int(rng.integers(0, 1000)))
        out = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub,
                                      restart_interval=ri))
        assert out.shape == (h, w, 3), (h, w, q, sub, ri)
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.mean() < 12, (h, w, q, sub, ri, err.mean())


def test_corrupt_streams_raise_valueerror_not_crash():
    """Malformed JPEG bytes must raise ValueError (the mixed-corpus
    fallback contract of decode_features), never TypeError/KeyError."""
    img = _smooth(16, 16)
    good = encode_jpeg(img, quality=90)
    sos_before_sof = b"\xff\xd8" + good[good.find(b"\xff\xda"):]
    i = good.find(b"\xff\xc4")
    j = good.find(b"\xff\xda")
    no_dht = good[:i] + good[j:]
    for bad in [sos_before_sof, no_dht, good[:40], good[:len(good) // 2],
                b"\xff\xd8\xff\xd9", b"\xff\xd8" + b"\x00" * 30]:
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(bad)


def test_corrupt_jpeg_falls_back_to_byte_stats(spark):
    """A corrupt FF D8 payload in a media table must yield the byte-stat
    fallback row, not fail the task."""
    from p2pddsketch_spark.operators.multimodal import decode_features
    good = encode_jpeg(_smooth(8, 8), quality=90)
    rows = [(1, bytearray(good)), (2, bytearray(good[:30]))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r["features"] for r in decode_features(df).collect()}
    assert len(out) == 2
    assert out[1][0] == 8.0          # decoded: width feature
    assert out[2][0] == 30.0         # fallback: byte-count feature
