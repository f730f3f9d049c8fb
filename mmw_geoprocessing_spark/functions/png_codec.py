"""Minimal pure-stdlib PNG codec (zlib + struct).

Exists so the REAL image-decode path (``operators.multimodal.
decode_image``) can run end-to-end in this container, which ships no
media library: the mapInPandas workers decode actual PNG bytes with
this module when Pillow is absent. Scope is deliberately small — 8-bit
greyscale (color type 0), RGB (2) and RGBA (6), no interlacing, any of
the 5 scanline filters on decode, filter 0 on encode. That covers every
fixture the tests generate while staying ~150 lines of stdlib.

This is a codec *backend*, not an operator: the Spark-side shape
(schema, Arrow batching, no driver-side binaries) lives in
``operators.multimodal`` and is identical for Pillow and this decoder.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> (samples per pixel, mode name)
_COLOR_TYPES = {0: (1, "L"), 2: (3, "RGB"), 6: (4, "RGBA")}
_MODES = {"L": 0, "RGB": 2, "RGBA": 6}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(rows: list[list[tuple]], mode: str = "RGB") -> bytes:
    """Encode a small image as PNG. ``rows``: list of scanlines, each a
    list of per-pixel tuples (ints 0-255; greyscale pixels may be bare
    ints). Filter 0 on every scanline."""
    if mode not in _MODES:
        raise ValueError(f"unsupported mode {mode!r}")
    height = len(rows)
    width = len(rows[0]) if height else 0
    raw = bytearray()
    for row in rows:
        if len(row) != width:
            raise ValueError("ragged scanlines")
        raw.append(0)  # filter type 0 (None)
        for px in row:
            if isinstance(px, int):
                px = (px,)
            raw.extend(int(v) & 0xFF for v in px)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _MODES[mode], 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, str, list[bytearray]]:
    """Decode PNG bytes -> ``(width, height, mode, scanlines)`` where
    each scanline is a bytearray of samples (spp per pixel). Supports
    8-bit color types 0/2/6, no interlace, all 5 filter types."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, width = 8, 0
    height, color_type, idat = 0, -1, bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth}")
            if color_type not in _COLOR_TYPES:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    spp, mode = _COLOR_TYPES[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * spp
    if len(raw) != (stride + 1) * height:
        raise ValueError("truncated pixel data")
    prev = bytearray(stride)
    out: list[bytearray] = []
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(spp, stride):
                line[i] = (line[i] + line[i - spp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - spp] if i >= spp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - spp] if i >= spp else 0
                upleft = prev[i - spp] if i >= spp else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        out.append(line)
        prev = line
    return width, height, mode, out


def mean_luma(width: int, height: int, mode: str, lines: list[bytearray]) -> float:
    """Mean luminance matching PIL's ``convert('L')`` arithmetic:
    Rec.601 integer weights with truncating division per pixel (alpha
    ignored), so a Pillow deployment and this fallback agree exactly."""
    total = 0
    for line in lines:
        if mode == "L":
            total += sum(line)
        else:
            spp = 3 if mode == "RGB" else 4
            for i in range(0, len(line), spp):
                total += (line[i] * 299 + line[i + 1] * 587 + line[i + 2] * 114) // 1000
    return total / float(width * height)
