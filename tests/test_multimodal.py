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
            w = 16 + (mid % 32) * 4
            h = 16 + ((mid * 7) % 32) * 4
            assert r.n_bytes == 68 + h * (1 + 3 * w)
            assert r.width == w
            assert r.n_channels is None
            assert r.mean_r is not None and r.pixel_entropy is not None
        elif mid % 3 == 1:
            assert r.sample_rate == 8000 * (1 + mid % 5)
            assert r.width is None
        else:
            assert r.n_bytes == 132 + plen
            assert r.height == 240 + ((mid * 3) % 8) * 16
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-3


# ---------------------------------------------------------------------------
# Pixel-level PNG decode (round-4): real inflate + scanline unfilter
# ---------------------------------------------------------------------------

import struct
import zlib

import numpy as np

from joern_spark.pipeline.multimodal import (
    _png_blob, _png_chunk, _PNG_SIG, png_pixel_stats, png_pixel_value,
)


def _expected_stats(mid):
    w = 16 + (mid % 32) * 4
    h = 16 + ((mid * 7) % 32) * 4
    xs, ys, cs = np.arange(w), np.arange(h), np.arange(3)
    grid = (xs[None, :, None] * 3 + ys[:, None, None] * 7
            + cs[None, None, :] * 11 + mid) % 256
    means = grid.reshape(-1, 3).mean(axis=0)
    counts = np.bincount(grid.reshape(-1), minlength=256).astype(float)
    p = counts[counts > 0] / (w * h * 3)
    return means, round(float(-(p * np.log2(p)).sum()), 6)


def test_png_pixel_stats_matches_closed_form():
    for mid in (0, 3, 9, 30, 63):
        st = png_pixel_stats(_png_blob(mid))
        means, ent = _expected_stats(mid)
        assert st["mean_r"] == float(means[0])
        assert st["mean_g"] == float(means[1])
        assert st["mean_b"] == float(means[2])
        assert st["pixel_entropy"] == ent


def _png_with_filters(pixels, filters):
    """Hand-encode an RGB8 PNG applying the given per-row filter types
    (exercises Average/Paeth, which the synthetic generator never emits)."""
    h, w, _ = pixels.shape
    bpp = 3
    raw = bytearray()
    flat = pixels.reshape(h, w * 3).astype(int)
    for y in range(h):
        ftype = filters[y]
        raw.append(ftype)
        prev = flat[y - 1] if y > 0 else np.zeros(w * 3, int)
        for i in range(w * 3):
            x = int(flat[y][i])
            left = int(flat[y][i - bpp]) if i >= bpp else 0
            up = int(prev[i])
            ul = int(prev[i - bpp]) if i >= bpp else 0
            if ftype == 0:
                enc = x
            elif ftype == 1:
                enc = x - left
            elif ftype == 2:
                enc = x - up
            elif ftype == 3:
                enc = x - ((left + up) >> 1)
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                enc = x - pred
            raw.append(enc & 0xFF)
    ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def test_png_unfilter_average_and_paeth():
    rng = np.random.RandomState(7)
    pixels = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    blob = _png_with_filters(pixels, [0, 1, 2, 3, 4, 3])
    st = png_pixel_stats(blob)
    flat = pixels.reshape(-1, 3)
    assert st["mean_r"] == float(flat[:, 0].mean())
    assert st["mean_g"] == float(flat[:, 1].mean())
    assert st["mean_b"] == float(flat[:, 2].mean())


def test_png_pixel_stats_rejects_non_rgb8_and_garbage():
    assert png_pixel_stats(b"not a png") is None
    # paletted header with no PLTE/IDAT → corrupt, not an exception
    ihdr = struct.pack(">II", 4, 4) + bytes([8, 3, 0, 0, 0])
    blob = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    assert png_pixel_stats(blob) is None
    # 16-bit depth → unsupported mode
    ihdr16 = struct.pack(">II", 4, 4) + bytes([16, 2, 0, 0, 0])
    blob16 = _PNG_SIG + _png_chunk(b"IHDR", ihdr16) + _png_chunk(b"IEND", b"")
    assert png_pixel_stats(blob16) is None
    # truncated IDAT → None, not an exception
    good = _png_blob(3)
    assert png_pixel_stats(good[:60]) is None


def test_png_paletted_decode_roundtrip():
    """Paletted decode: unfiltered indices map through PLTE to the same
    stats an equivalent RGB image would produce."""
    from joern_spark.pipeline.multimodal import _png_blob_paletted

    mid = 5
    st = png_pixel_stats(_png_blob_paletted(mid))
    w, h = 16 + (mid % 32) * 4, 16 + ((mid * 7) % 32) * 4
    vals = [(((x * 3 + y * 7 + mid) % 64) * 5 + c * 11 + mid) % 256
            for x in range(w) for y in range(h) for c in range(3)]
    for c, key in enumerate(("mean_r", "mean_g", "mean_b")):
        assert st[key] == sum(vals[c::3]) / (w * h)
    # index past the palette end is a spec violation → corrupt
    blob = bytearray(_png_blob_paletted(mid))
    plte_at = blob.index(b"PLTE")
    short = blob[:plte_at - 4] + _png_chunk(b"PLTE", bytes(3 * 8)) \
        + blob[plte_at + 4 + 192 + 4:]
    assert png_pixel_stats(bytes(short)) is None


def test_wav8_decode_and_codec_rejection():
    from joern_spark.pipeline.multimodal import (
        _wav_blob8, _wav_blob_float, _wav_blob24, _wav_sample_stats_ex,
    )

    payload = bytes(range(200, 256)) + bytes(range(0, 56))
    st, status = _wav_sample_stats_ex(_wav_blob8(1, payload))
    assert status == "ok"
    s = [b - 128 for b in payload]
    assert st["wav_rms"] == (sum(v * v for v in s) / len(s)) ** 0.5
    assert st["wav_zero_crossings"] == sum(
        (a < 0) != (b < 0) for a, b in zip(s, s[1:]))
    assert _wav_sample_stats_ex(_wav_blob_float(1, payload))[1] \
        == "wav_unsupported_codec"
    assert _wav_sample_stats_ex(_wav_blob24(1, payload))[1] \
        == "wav_unsupported_bits"


def _png_raw(pixels, color_type, filters):
    """Hand-encode an 8-bit PNG of arbitrary color type applying the
    given per-row filter types (channel-generic inverse of the decoder)."""
    h, w, bpp = pixels.shape
    raw = bytearray()
    flat = pixels.reshape(h, w * bpp).astype(int)
    for y in range(h):
        ftype = filters[y]
        raw.append(ftype)
        prev = flat[y - 1] if y > 0 else np.zeros(w * bpp, int)
        for i in range(w * bpp):
            x = int(flat[y][i])
            left = int(flat[y][i - bpp]) if i >= bpp else 0
            up = int(prev[i])
            ul = int(prev[i - bpp]) if i >= bpp else 0
            if ftype == 0:
                enc = x
            elif ftype == 1:
                enc = x - left
            elif ftype == 2:
                enc = x - up
            elif ftype == 3:
                enc = x - ((left + up) >> 1)
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                enc = x - pred
            raw.append(enc & 0xFF)
    ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 0])
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def test_png_pixel_stats_grayscale_and_rgba():
    """Grayscale decodes with mean_r=g=b; RGBA unfilters at bpp=4 but
    excludes alpha from the stats."""
    rng = np.random.RandomState(13)
    gray = rng.randint(0, 256, size=(5, 7, 1), dtype=np.uint8)
    st = png_pixel_stats(_png_raw(gray, 0, [0, 1, 2, 3, 4]))
    gm = float(gray.reshape(-1).astype(np.int64).sum() / float(5 * 7))
    assert st["mean_r"] == st["mean_g"] == st["mean_b"] == gm

    rgba = rng.randint(0, 256, size=(6, 5, 4), dtype=np.uint8)
    st = png_pixel_stats(_png_raw(rgba, 6, [0, 1, 2, 3, 4, 3]))
    rgb = rgba[:, :, :3].reshape(-1, 3).astype(np.int64)
    n = 6 * 5
    assert st["mean_r"] == float(rgb[:, 0].sum() / float(n))
    assert st["mean_g"] == float(rgb[:, 1].sum() / float(n))
    assert st["mean_b"] == float(rgb[:, 2].sum() / float(n))
    counts = np.bincount(rgb.reshape(-1), minlength=256).astype(float)
    p = counts[counts > 0] / (n * 3)
    assert st["pixel_entropy"] == round(float(-(p * np.log2(p)).sum()), 6)


def test_png_pixel_stats_bomb_guarded():
    """Attacker-controlled IHDR dims / decompression bombs return None
    before allocating or inflating past the expected output size."""
    # huge declared dimensions, tiny stream → dimension cap, no allocation
    ihdr = struct.pack(">II", 1 << 20, 1 << 20) + bytes([8, 2, 0, 0, 0])
    bomb = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 64))
            + _png_chunk(b"IEND", b""))
    assert png_pixel_stats(bomb) is None
    # stream inflating to MORE than height*(1+stride) → None (bounded
    # decompressobj stops at expected+1; 50 MB never materializes)
    ihdr = struct.pack(">II", 2, 2) + bytes([8, 2, 0, 0, 0])
    over = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (50 << 20)))
            + _png_chunk(b"IEND", b""))
    assert png_pixel_stats(over) is None


def test_mp4_sample_stats_known_values():
    """mp4_sample_stats walks the box table to mdat and recomputes the
    generator's closed form: payload = md5(str(id)) raw bytes x
    (1 + id % 7)."""
    import hashlib

    from joern_spark.pipeline.multimodal import _mp4_blob, mp4_sample_stats

    for mid in (2, 5, 8, 20, 62):
        payload = hashlib.md5(str(mid).encode()).digest() * (1 + mid % 7)
        st = mp4_sample_stats(_mp4_blob(mid, payload))
        assert st["mp4_mdat_bytes"] == len(payload)
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
        assert st["mp4_byte_mean"] == float(int(arr.sum()) / float(len(arr)))
        counts = np.bincount(arr, minlength=256).astype(float)
        p = counts[counts > 0] / len(arr)
        assert st["mp4_byte_entropy"] == round(float(-(p * np.log2(p)).sum()), 6)
    # non-MP4 and mdat-less input
    assert mp4_sample_stats(b"garbage") is None
    assert mp4_sample_stats(struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4) is None


def test_wav_sample_stats_known_values():
    """wav_sample_stats decodes the generator's PCM: payload is
    md5(str(id)) x reps as little-endian int16."""
    import hashlib

    from joern_spark.pipeline.multimodal import _wav_blob, wav_sample_stats

    for mid in (1, 4, 7, 13):
        payload = hashlib.md5(str(mid).encode()).digest() * (1 + mid % 7)
        st = wav_sample_stats(_wav_blob(mid, payload))
        s = np.frombuffer(payload, dtype="<i2").astype(np.int64)
        rms = float(np.sqrt((s * s).sum() / float(len(s))))
        neg = s < 0
        zc = int(np.count_nonzero(neg[:-1] != neg[1:]))
        assert st["wav_rms"] == rms
        assert st["wav_zero_crossings"] == zc


def test_wav_sample_stats_codec_and_depth_gates():
    from joern_spark.pipeline.multimodal import wav_sample_stats
    assert wav_sample_stats(b"not a wav") is None

    def blob(codec, bits, data):
        fmt = struct.pack("<HHIIHH", codec, 1, 8000,
                          8000 * bits // 8, bits // 8, bits)
        body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt \
            + b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # 8-bit PCM now DECODES: unsigned bytes with a 128 midpoint
    st = wav_sample_stats(blob(1, 8, bytes([1, 200, 3, 250])))
    s = np.array([1, 200, 3, 250], dtype=np.int64) - 128
    assert st["wav_rms"] == float(np.sqrt((s * s).sum() / 4.0))
    assert st["wav_zero_crossings"] == 3
    # 24-bit PCM -> unsupported bit depth
    assert wav_sample_stats(blob(1, 24, b"\x00" * 6)) is None
    # IEEE-float codec -> unsupported codec regardless of depth
    assert wav_sample_stats(blob(3, 32, b"\x00" * 8)) is None


def test_mp4_box_walk_edge_cases():
    """Size-0 final box = extends-to-EOF (valid real-world mdat layout);
    truncated/oversized boxes return None rather than partial stats."""
    from joern_spark.pipeline.multimodal import mp4_sample_stats

    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 512)
    payload = bytes(range(32))
    # mdat with size=0: body runs to EOF
    blob = ftyp + struct.pack(">I", 0) + b"mdat" + payload
    st = mp4_sample_stats(blob)
    assert st is not None and st["mp4_mdat_bytes"] == len(payload)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    assert st["mp4_byte_mean"] == float(int(arr.sum()) / float(len(arr)))
    # 64-bit largesize route
    blob = (ftyp + struct.pack(">I", 1) + b"mdat"
            + struct.pack(">Q", 16 + len(payload)) + payload)
    st = mp4_sample_stats(blob)
    assert st is not None and st["mp4_mdat_bytes"] == len(payload)
    # declared size overruns the payload -> None, not partial stats
    blob = ftyp + struct.pack(">I", 8 + 64) + b"mdat" + payload
    assert mp4_sample_stats(blob) is None


def test_ivf_cells_degrade_bad_embeddings(spark):
    """A null / ragged / zero-norm embedding row drops out of the IVF
    index instead of failing the Arrow batch."""
    from joern_spark.pipeline.similarity import _ivf_cells
    import numpy as np

    C = np.eye(4, 8)[:4].astype(float)  # 4 centroids in 8 dims
    rows = [
        (0, [float(x) for x in np.eye(8)[0]]),
        (1, None),
        (2, [1.0, 2.0]),            # ragged
        (3, [0.0] * 8),             # zero norm -> still assigned (ties by id)
        (4, [float(x) for x in np.eye(8)[1]]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.cell for r in _ivf_cells(df, [0, 1, 2, 3], C, 1).collect()}
    assert 1 not in got and 2 not in got
    assert got[0] == 0 and got[4] == 1
    assert 3 in got  # zero-norm degraded to a deterministic cell, no crash


def test_decode_status_per_reason(spark):
    """decode_status says WHY a payload decode produced stats or didn't:
    'ok' for the 64 valid blobs; the 16 edge blobs (ids 64-79, cycling
    id % 8) split into two DECODED classes (paletted PNG, 8-bit WAV —
    stats checked against the closed forms) and six specific
    unsupported/malformed reasons whose still-parseable header fields
    stay populated."""
    import math

    from joern_spark.pipeline.multimodal import (
        extract_media_features, png_pixel_value, synthetic_media,
    )

    feats = {r.media_id: r for r in extract_media_features(
        synthetic_media(spark, 64, n_edge=16)).collect()}
    assert len(feats) == 80
    assert all(feats[i].decode_status == "ok" for i in range(64))
    expect = {0: "ok", 1: "ok", 2: "mp4_no_mdat", 3: "unknown_format",
              4: "png_unsupported_mode", 5: "wav_unsupported_codec",
              6: "wav_unsupported_bits", 7: "mp4_malformed"}
    for mid in range(64, 80):
        r = feats[mid]
        assert r.decode_status == expect[mid % 8], (mid, r.decode_status)
        if mid % 8 == 0:
            # paletted decode == closed-form palette gradient
            w, h = 16 + (mid % 32) * 4, 16 + ((mid * 7) % 32) * 4
            assert r.width == w and r.height == h
            exp_r = sum((((x * 3 + y * 7 + mid) % 64) * 5 + mid) % 256
                        for x in range(w) for y in range(h)) / (w * h)
            assert math.isclose(r.mean_r, exp_r, rel_tol=1e-12)
            assert r.pixel_entropy is not None
        elif mid % 8 == 1:
            # 8-bit PCM decode: s = byte - 128 over the md5 payload
            import hashlib
            payload = hashlib.md5(str(mid).encode()).digest() * (1 + mid % 7)
            s = [b - 128 for b in payload]
            exp_rms = math.sqrt(sum(v * v for v in s) / len(s))
            assert math.isclose(r.wav_rms, exp_rms, rel_tol=1e-12)
            exp_zc = sum((a < 0) != (b < 0) for a, b in zip(s, s[1:]))
            assert r.wav_zero_crossings == exp_zc
            assert r.sample_rate == 8000 * (1 + mid % 5)
        elif mid % 8 == 2:
            assert r.width == 320 + (mid % 8) * 16 and r.mp4_mdat_bytes is None
        elif mid % 8 == 3:
            assert r.width is None and r.n_channels is None
        elif mid % 8 == 4:
            # 16-bit header still yields dims, no pixel stats
            assert r.width == 16 + (mid % 32) * 4 and r.mean_r is None
        elif mid % 8 in (5, 6):
            assert r.sample_rate == 8000 * (1 + mid % 5) and r.wav_rms is None
        else:
            # truncated MP4: tkhd dims parse, payload stats refused
            assert r.width == 320 + (mid % 8) * 16 and r.mp4_byte_mean is None
    # the closed-form helper stays in sync with the RGB generator too
    assert png_pixel_value(1, 2, 0, 3) == (1 * 3 + 2 * 7 + 3) % 256
