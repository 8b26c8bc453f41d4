"""Micro-bench: vectorized PNG scanline unfilter vs the round-4 scalar
loop, on a synthetic 1024x1024 RGB8 PNG using the generator's filter
profile (rows cycle None/Sub/Up — multimodal._png_blob).

Run: python tools/bench_png_unfilter.py
Prints one JSON line {old_sec, new_sec, speedup, px_per_sec_new}.
Numbers are recorded in docs/PLANS.md (round-5 item 4).
"""
from __future__ import annotations

import json
import struct
import time
import zlib

import numpy as np

from joern_spark.pipeline.multimodal import (
    _PNG_SIG, _png_chunk, png_pixel_stats,
)


def make_png(width: int = 1024, height: int = 1024) -> bytes:
    ihdr = struct.pack(">II", width, height) + bytes([8, 2, 0, 0, 0])
    stride = width * 3
    rng = np.random.RandomState(5)
    pix = rng.randint(0, 256, size=(height, stride)).astype(np.int64)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        row = pix[y]
        ftype = y % 3
        raw.append(ftype)
        if ftype == 0:
            enc = row
        elif ftype == 1:
            left = np.concatenate([np.zeros(3, np.int64), row[:-3]])
            enc = (row - left) & 0xFF
        else:
            enc = (row - prev) & 0xFF
        raw += bytes(enc.astype(np.uint8).tobytes())
        prev = row
    idat = zlib.compress(bytes(raw), 1)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def png_pixel_stats_scalar(payload: bytes):
    """The pre-round-5 implementation: per-BYTE Python loop for every
    non-None/Up scanline (kept verbatim here as the bench baseline)."""
    if not payload.startswith(_PNG_SIG):
        return None
    pos = 8
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if ctype == b"IHDR" and length >= 13:
            width, height = struct.unpack(">II", data[:8])
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = width * 3
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = 3
    for y in range(height):
        off = y * (1 + stride)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=off + 1).astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y > 0 else np.zeros(stride, np.int64)
        if ftype == 0:
            rec = line
        elif ftype == 2:
            rec = (line + prev) & 0xFF
        else:
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                up = prev[i]
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) >> 1
                else:
                    ul = int(prev[i - bpp]) if i >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                rec[i] = (line[i] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
    pix = out.reshape(height, width, 3)
    n = height * width
    means = pix.reshape(-1, 3).sum(axis=0, dtype=np.int64) / float(n)
    counts = np.bincount(pix.reshape(-1), minlength=256).astype(np.float64)
    probs = counts[counts > 0] / float(n * 3)
    entropy = float(-(probs * np.log2(probs)).sum())
    return {"mean_r": float(means[0]), "mean_g": float(means[1]),
            "mean_b": float(means[2]), "pixel_entropy": round(entropy, 6)}


def main():
    blob = make_png()
    old_stats = png_pixel_stats_scalar(blob)
    t0 = time.perf_counter()
    png_pixel_stats_scalar(blob)
    old_sec = time.perf_counter() - t0
    new_stats = png_pixel_stats(blob)
    assert new_stats == old_stats, (new_stats, old_stats)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        png_pixel_stats(blob)
    new_sec = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "old_sec": round(old_sec, 4),
        "new_sec": round(new_sec, 4),
        "speedup": round(old_sec / new_sec, 1),
        "px_per_sec_new": int(1024 * 1024 / new_sec),
    }))


if __name__ == "__main__":
    main()
