"""Pure-stdlib PNG codec (zlib + numpy — no PIL/cv2): the first REAL
member of the compressed-decode path (reference decodes uploads with
PIL, app/services/ocr_service.py:513-525; this container has no PIL, so
PNG — whose compression IS stdlib zlib — closes the gap for the most
common lossless format).

Scope: 8-bit greyscale (color type 0), RGB (2), grey+alpha (4) and RGBA
(6), non-interlaced, all five scanline filters (None/Sub/Up/Average/
Paeth, RFC 2083 §6). Palette (3), 16-bit and Adam7 raise ``ValueError``
naming the unsupported feature. CRCs are verified on every chunk.

Performance shape: ENCODING is fully vectorized (every filter is a
direct subtraction against known neighbors). Decoding filters 0/2 is
vectorized; filter 1 (Sub) is a per-channel uint8 prefix sum (cumsum);
filters 3/4 are inherently sequential along x (each pixel needs the
RECONSTRUCTED left neighbor) and run a per-pixel loop vectorized over
channels — fine for document pages (the reference caps pages at
2000 px); a SIMD unfilter would be the first optimization if PNG decode
ever dominated a profile.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def is_png(payload: bytes) -> bool:
    return payload is not None and payload[:8] == _SIGNATURE


def _chunk(kind: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + kind
        + data
        + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, elementwise over int16+ arrays."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    ).astype(np.uint8)


def encode_png(
    img: np.ndarray, *, filter_type: int | str = "mixed", level: int = 6
) -> bytes:
    """Encode an (h, w) or (h, w, c) uint8 array. ``filter_type`` is a
    fixed filter 0-4 or ``"mixed"`` (row index mod 5 — deterministic,
    and exercises every unfilter branch in round-trip tests)."""
    if img.dtype != np.uint8:
        raise ValueError("encode_png requires uint8 pixels")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)

    raw = img.reshape(h, w * ch).astype(np.uint8)
    # neighbor planes for filtering (all directly available pre-filter)
    left = np.zeros_like(raw)
    left[:, ch:] = raw[:, :-ch]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    upleft = np.zeros_like(raw)
    upleft[1:, ch:] = raw[:-1, :-ch]

    out = bytearray()
    for y in range(h):
        f = (y % 5) if filter_type == "mixed" else int(filter_type)
        row = raw[y]
        if f == 0:
            filt = row
        elif f == 1:
            filt = row - left[y]
        elif f == 2:
            filt = row - up[y]
        elif f == 3:
            filt = row - (
                (left[y].astype(np.uint16) + up[y].astype(np.uint16)) // 2
            ).astype(np.uint8)
        elif f == 4:
            filt = row - _paeth(left[y], up[y], upleft[y])
        else:
            raise ValueError(f"bad filter {f}")
        out.append(f)
        out += filt.astype(np.uint8).tobytes()

    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), level))
        + _chunk(b"IEND", b"")
    )


def _parse_chunks(data: bytes):
    pos = 8
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        kind = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk body")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(kind + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {kind!r}")
        yield kind, body
        pos += 12 + length


def decode_png(data: bytes) -> np.ndarray:
    """Decode to (h, w) uint8 for greyscale or (h, w, c) otherwise."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    channels = None
    idat = bytearray()
    for kind, body in _parse_chunks(data):
        if kind == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace:
                raise ValueError("Adam7 interlace unsupported")
            channels = _CHANNELS[color]
        elif kind == b"IDAT":
            idat += body
        elif kind == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")

    stream = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    stride = width * channels
    if len(stream) != height * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    rows = stream.reshape(height, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((height, stride), np.uint8)
    prior = np.zeros(stride, np.uint8)
    ch = channels
    for y in range(height):
        f = int(filters[y])
        row = rows[y, 1:].copy()
        if f == 0:
            rec = row
        elif f == 1:  # Sub: per-channel prefix sum (mod 256)
            rec = (
                np.cumsum(
                    row.reshape(width, ch).astype(np.uint64), axis=0
                )
                & 0xFF
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            rec = row + prior
        elif f in (3, 4):  # Average / Paeth: sequential in x
            rec = np.zeros(stride, np.uint8)
            left = np.zeros(ch, np.uint8)
            upleft = np.zeros(ch, np.uint8)
            for x in range(0, stride, ch):
                up = prior[x : x + ch]
                if f == 3:
                    pred = (
                        (left.astype(np.uint16) + up.astype(np.uint16)) // 2
                    ).astype(np.uint8)
                else:
                    pred = _paeth(left, up, upleft)
                left = row[x : x + ch] + pred
                rec[x : x + ch] = left
                upleft = up
        else:
            raise ValueError(f"bad scanline filter {f}")
        out[y] = rec
        prior = rec
    img = out.reshape(height, width, channels)
    return img[:, :, 0] if channels == 1 else img
