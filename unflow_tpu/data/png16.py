"""Minimal 16-bit RGB PNG codec (numpy + zlib).

KITTI ground-truth flow ships as 16-bit-per-channel RGB PNGs; Pillow
truncates those to 8 bits on load, so we decode/encode them directly.
Implements the PNG spec subset KITTI uses: 8/16-bit, greyscale/RGB/RGBA,
all five scanline filters, single IDAT stream, no interlacing.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def read_png16(path: str | Path) -> np.ndarray:
    """Decode a PNG to (H, W, C) uint16 (8-bit inputs are upcast losslessly
    in value, i.e. returned as their raw 0..255 values)."""
    data = Path(path).read_bytes()
    if data[:8] != _SIGNATURE:
        raise ValueError(f"{path}: not a PNG")
    pos = 8
    width = height = bitdepth = colortype = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if interlace:
                raise ValueError(f"{path}: interlaced PNG unsupported")
            if colortype not in _CHANNELS or bitdepth not in (8, 16):
                raise ValueError(
                    f"{path}: unsupported PNG (depth={bitdepth}, color={colortype})"
                )
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    channels = _CHANNELS[colortype]
    bpp = channels * (bitdepth // 8)  # filter unit: bytes per pixel
    stride = width * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError(f"{path}: IDAT size mismatch")

    rows = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(height):
        cur = rows[y, 1:].astype(np.int32)
        f = filters[y]
        if f == 0:
            rec = cur
        elif f == 1:  # Sub
            rec = cur.copy()
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f == 3:  # Average
            rec = cur.copy()
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = cur.copy()
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (rec[i] + pred) & 0xFF
        else:
            raise ValueError(f"{path}: bad filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec

    if bitdepth == 16:
        arr = out.reshape(height, width, channels, 2)
        return (arr[..., 0].astype(np.uint16) << 8) | arr[..., 1]
    return out.reshape(height, width, channels).astype(np.uint16)


def write_png16(path: str | Path, arr: np.ndarray) -> None:
    """Encode (H, W, C) uint16 as a 16-bit PNG (C in {1, 2, 3, 4})."""
    if arr.dtype != np.uint16:
        raise ValueError(f"expected uint16, got {arr.dtype}")
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, c = arr.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    big = arr.astype(">u2").tobytes()
    stride = w * c * 2
    rows = b"".join(
        b"\x00" + big[y * stride : (y + 1) * stride] for y in range(h)
    )

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 16, colortype, 0, 0, 0)
    png = (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(rows, 6))
        + chunk(b"IEND", b"")
    )
    Path(path).write_bytes(png)
