"""Round-3 PNG codec: real DEFLATE decode (stdlib zlib) + all five PNG
row filters in numpy — the 'compressed formats raise NotImplementedError'
gap closed for PNG without any imaging library. Golden checks: byte-level
hand-built PNGs per filter, reconstructed against an independent scalar
reference implementation."""

import struct
import zlib

import numpy as np
import pytest

from p2pddsketch_spark.operators.multimodal import (_decode_png, decode_image,
                                                    encode_png)


def _chunk(typ, body):
    return (struct.pack(">I", len(body)) + typ + body +
            struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))


def _png(w, h, color, filtered_rows):
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    raw = b"".join(bytes([f]) + bytes(r) for f, r in filtered_rows)
    assert all(len(r) == w * nch for _, r in filtered_rows)
    return (b"\x89PNG\r\n\x1a\n" +
            _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)) +
            _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if pa <= pb and pa <= pc else (b if pb <= pc else c)


def _reference_unfilter(w, h, nch, rows):
    """Independent scalar PNG reconstruction (spec pseudocode)."""
    out = np.zeros((h, w * nch), dtype=np.int64)
    for y, (f, r) in enumerate(rows):
        for x in range(w * nch):
            left = out[y, x - nch] if x >= nch else 0
            up = out[y - 1, x] if y > 0 else 0
            upleft = out[y - 1, x - nch] if (y > 0 and x >= nch) else 0
            v = r[x]
            if f == 1:
                v += left
            elif f == 2:
                v += up
            elif f == 3:
                v += (left + up) // 2
            elif f == 4:
                v += _paeth(left, up, upleft)
            out[y, x] = v & 255
    return out.astype(np.uint8).reshape(h, w, nch)


def test_png_roundtrip_random():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(px)), px)


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_png_each_filter_matches_reference(f):
    rng = np.random.default_rng(10 + f)
    w, h, nch = 6, 5, 3
    rows = [(f if y else min(f, 1), rng.integers(0, 256, w * nch, dtype=np.uint8))
            for y in range(h)]  # row 0 can't use Up/Avg/Paeth meaningfully but spec allows; keep f for y>0
    rows = [(f, r) for _, r in rows]
    data = _png(w, h, 2, rows)
    got = _decode_png(data)
    want = _reference_unfilter(w, h, nch, rows)
    assert np.array_equal(got, want), f


def test_png_gray_and_alpha_variants():
    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, size=(4, 3, 1), dtype=np.uint8)
    data = _png(3, 4, 0, [(0, g[y].reshape(-1)) for y in range(4)])
    px = _decode_png(data)
    assert np.array_equal(px, np.repeat(g, 3, axis=2))
    rgba = rng.integers(0, 256, size=(4, 3, 4), dtype=np.uint8)
    data = _png(3, 4, 6, [(0, rgba[y].reshape(-1)) for y in range(4)])
    assert np.array_equal(_decode_png(data), rgba[:, :, :3])


def test_png_unsupported_variants_raise():
    body = struct.pack(">IIBBBBB", 3, 3, 16, 2, 0, 0, 0)  # 16-bit
    data = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", body) +
            _chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        _decode_png(data)


def test_png_flows_through_distributed_features(spark):
    """PNG payloads flow through decode_features like PPM ones."""
    import pandas as pd
    from p2pddsketch_spark.operators.multimodal import decode_features
    rng = np.random.default_rng(6)
    rows = []
    for i in range(8):
        px = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
        rows.append((i, bytearray(encode_png(px)), px.astype(np.float64)))
    df = spark.createDataFrame([(i, p) for i, p, _ in rows],
                               "media_id long, payload binary")
    got = {r["media_id"]: np.array(r["features"])
           for r in decode_features(df).collect()}
    for i, _, px in rows:
        assert got[i][0] == 4 and got[i][1] == 4
        assert abs(got[i][2] - px[:, :, 0].mean()) < 1e-3
