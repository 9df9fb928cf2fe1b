"""Minimal pure-stdlib PNG codec (zlib + numpy) for the multimodal
decode path.

The sandbox ships no image libraries, but PNG needs none: it is
zlib-compressed scanlines behind per-row difference filters, and zlib
is in the standard library. This module implements the subset a
training-data pipeline's image plumbing needs — 8-bit depth, gray /
gray+alpha / RGB / RGBA, no interlacing, all five scanline filters —
so `operators/multimodal.py` can decode REAL image bytes inside
mapInPandas instead of stubbing.

Scope notes: filter 0 (None) rows decode vectorized; filters 1/3/4
(Sub/Average/Paeth) need the per-pixel left-neighbor recurrence and run
as Python loops — correct, exercised by round-trip tests, and fine for
demonstration sizes. A production deployment swaps this for PIL/OpenCV;
the Spark-side shape (binary in, typed features out, map-only) is
identical either way.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

_COLOR_TO_CH = {0: 1, 4: 2, 2: 3, 6: 4}
_CH_TO_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array; C in {1, 2, 3, 4}.

    *filter_type* applies one filter to every scanline (0 is what this
    repo writes; 1-4 exist so decode's filter arms are testable against
    our own output).
    """
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = _CH_TO_COLOR[ch]
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    lines = []
    for y in range(h):
        row = flat[y]
        if filter_type == 0:
            filt = row
        elif filter_type == 2:
            filt = (row - prev) % 256
        else:
            filt = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(row[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                if filter_type == 1:
                    pred = a
                elif filter_type == 3:
                    pred = (a + b) // 2
                elif filter_type == 4:
                    pred = _paeth(a, b, c)
                else:
                    raise ValueError(f"unknown filter {filter_type}")
                filt[x] = (int(row[x]) - pred) % 256
        lines.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to an (H, W, C) uint8 array.

    Supports 8-bit depth, color types 0/2/4/6, no interlace; raises
    ValueError on anything else (16-bit, palette, Adam7)."""
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, b""
    w = h = color = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, inter = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _COLOR_TO_CH:
                raise ValueError(f"unsupported color type {color}")
            if inter != 0:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    ch = _COLOR_TO_CH[color]
    stride = w * ch
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = np.frombuffer(
            raw[pos + 1 : pos + 1 + stride], dtype=np.uint8
        ).astype(np.int32)
        pos += 1 + stride
        if f == 0:
            cur = line
        elif f == 2:
            cur = (line + prev) % 256
        elif f in (1, 3, 4):
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(a, b, c)
                cur[x] = (int(line[x]) + pred) % 256
        else:
            raise ValueError(f"bad scanline filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)
