"""Minimal dependency-free PNG writer (stdlib zlib only).

The reference's screenshot subsystem encodes PNG/JPEG via FFmpeg
(player/screenshot.c -> image_writer.c); this image has no FFmpeg, and
PNG is 30 lines of chunk framing over zlib, so the rebuild carries its
own: 8-bit grayscale or RGB, filter type 0 (None) per scanline, one
IDAT.  Enough for screenshots and dumps; not a general codec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """(H, W) uint8 grayscale or (H, W, 3) uint8 RGB -> PNG bytes."""
    if arr.dtype != np.uint8:
        raise ValueError("encode_png wants uint8 (convert/shift first)")
    if arr.ndim == 2:
        color_type = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type = 2
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    raw = np.ascontiguousarray(arr).reshape(h, -1)
    # filter byte 0 (None) prepended to each scanline
    scanlines = np.concatenate(
        [np.zeros((h, 1), np.uint8), raw], axis=1).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scanlines, compress_level))
            + _chunk(b"IEND", b""))


def write_png(path: str, arr: np.ndarray, compress_level: int = 6) -> str:
    with open(path, "wb") as fh:
        fh.write(encode_png(arr, compress_level))
    return path


def decode_png(data: bytes) -> np.ndarray:
    """Inverse of encode_png for the subset it emits (filter-0 scanlines,
    8-bit gray/RGB).  Test/verification helper, not a general decoder."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, meta = 8, b"", None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    w, h, depth, color_type = meta[0], meta[1], meta[2], meta[3]
    if depth != 8 or color_type not in (0, 2):
        raise ValueError("decode_png only reads what encode_png writes")
    ch = 3 if color_type == 2 else 1
    rows = np.frombuffer(zlib.decompress(idat), np.uint8)
    rows = rows.reshape(h, 1 + w * ch)
    if np.any(rows[:, 0]):
        raise ValueError("unexpected scanline filter")
    out = rows[:, 1:]
    return out.reshape(h, w, 3) if ch == 3 else out.reshape(h, w)
