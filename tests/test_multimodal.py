"""Multimodal header-decode tests: the parser reads REAL container
formats (PNG/WAV/MP4) from raw bytes; the synthetic source writes them
with fields derived from media_id so round-trips are checkable."""

from __future__ import annotations

import struct

from joern_spark.pipeline.multimodal import (
    _mp4_blob,
    _png_blob,
    _wav_blob,
    decode_media_header,
    extract_media_features,
    synthetic_media,
)


def test_png_header_decode_handcrafted():
    # a 640x480 PNG header built independently of the generator
    ihdr = struct.pack(">II", 640, 480) + bytes([8, 6, 0, 0, 0])
    blob = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + ihdr + b"\xaa\xbb\xcc\xdd")
    hdr = decode_media_header(blob)
    assert (hdr["width"], hdr["height"]) == (640, 480)
    assert hdr["n_channels"] is None and hdr["sample_rate"] is None


def test_wav_header_decode_handcrafted():
    # 2-channel 44100 Hz PCM with a junk chunk BEFORE fmt (chunk walk)
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
    body = (b"WAVE"
            + b"JUNK" + struct.pack("<I", 3) + b"abc\x00"  # odd size, padded
            + b"fmt " + struct.pack("<I", 16) + fmt)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    hdr = decode_media_header(blob)
    assert (hdr["n_channels"], hdr["sample_rate"]) == (2, 44100)
    assert hdr["width"] is None


def test_mp4_tkhd_decode_handcrafted():
    blob = _mp4_blob(5, b"payload")
    hdr = decode_media_header(blob)
    assert hdr["width"] == 320 + (5 % 8) * 16
    assert hdr["height"] == 240 + ((5 * 3) % 8) * 16


def test_unknown_format_yields_nulls():
    hdr = decode_media_header(b"not a media file at all")
    assert all(v is None for v in hdr.values())
    assert all(v is None for v in decode_media_header(b"").values())


def test_generator_roundtrip_pure_python():
    for mid in range(12):
        payload = b"x" * (16 * (1 + mid % 7))
        for blob, want in [
            (_png_blob(mid, payload),
             {"width": 16 + (mid % 32) * 4, "height": 16 + ((mid * 7) % 32) * 4}),
            (_wav_blob(mid, payload),
             {"n_channels": 1 + mid % 2, "sample_rate": 8000 * (1 + mid % 5)}),
            (_mp4_blob(mid, payload),
             {"width": 320 + (mid % 8) * 16, "height": 240 + ((mid * 3) % 8) * 16}),
        ]:
            hdr = decode_media_header(blob)
            for k, v in want.items():
                assert hdr[k] == v, (mid, k)


def test_spark_pipeline_roundtrip(spark):
    media = synthetic_media(spark, 12)
    rows = {r.media_id: r for r in extract_media_features(media).collect()}
    assert len(rows) == 12
    for mid, r in rows.items():
        plen = 16 * (1 + mid % 7)
        if mid % 3 == 0:
            assert r.media_type == "image/png"
            assert r.n_bytes == 33 + plen
            assert r.width == 16 + (mid % 32) * 4
            assert r.n_channels is None
        elif mid % 3 == 1:
            assert r.sample_rate == 8000 * (1 + mid % 5)
            assert r.width is None
        else:
            assert r.n_bytes == 132 + plen
            assert r.height == 240 + ((mid * 3) % 8) * 16
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-3
