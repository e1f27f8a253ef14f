"""Round-3 audio modality: RIFF/WAVE PCM decode (8/16/32-bit, proper
chunk walking) + distributed audio features — real codec, no external
library."""

import numpy as np
import pytest

from p2pddsketch_spark.operators.multimodal import (audio_features,
                                                    decode_wav, encode_wav)


def test_wav_roundtrip_mono_and_stereo():
    t = np.arange(1600)
    mono = (np.sin(2 * np.pi * 440 * t / 16000) * 20000).astype(np.int16)
    x, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and x.shape == (1600, 1)
    assert np.allclose(x[:, 0], mono / 32768.0)
    stereo = np.stack([mono, -mono], axis=1)
    x2, _ = decode_wav(encode_wav(stereo, 8000))
    assert x2.shape == (1600, 2)
    assert np.allclose(x2[:, 1], -mono / 32768.0)


def test_wav_walks_extra_chunks_and_rejects_compressed():
    import struct
    mono = np.array([0, 1000, -1000], dtype=np.int16)
    wav = bytearray(encode_wav(mono, 8000))
    # splice a LIST chunk between fmt and data (word-aligned odd body)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOX" + b"\x00"
    spliced = bytes(wav[:fmt_end]) + extra + bytes(wav[fmt_end:])
    x, rate = decode_wav(spliced)
    assert rate == 8000 and np.allclose(x[:, 0] * 32768.0, mono)
    # non-PCM format tag -> NotImplementedError
    bad = bytearray(encode_wav(mono, 8000))
    bad[20:22] = (3).to_bytes(2, "little")  # IEEE float tag
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))
    with pytest.raises(ValueError):
        decode_wav(b"nope")


def test_audio_features_distributed(spark):
    rows = []
    for i, freq in enumerate((220, 440, 880)):
        t = np.arange(8000)
        s = (np.sin(2 * np.pi * freq * t / 8000) * 16000).astype(np.int16)
        rows.append((i, bytearray(encode_wav(s, 8000))))
    rows.append((99, bytearray(b"not audio at all")))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in audio_features(df).collect()}
    for i, freq in enumerate((220, 440, 880)):
        r = got[i]
        assert r["sample_rate"] == 8000 and r["channels"] == 1
        assert abs(r["duration_ms"] - 1000.0) < 1e-3
        assert abs(r["rms"] - 16000 / 32768 / np.sqrt(2)) < 0.01
        # zero crossings of a sine ~ 2*freq per second
        assert abs(r["zero_crossings"] - 2 * freq) <= 2, freq
    assert got[99]["sample_rate"] is None and got[99]["rms"] is None
