"""Additional pure-stdlib image codecs beside PNG (kernels/png.py):
24-bit uncompressed BMP and binary netpbm (P6 PPM color / P5 PGM
grey). With these, every UNCOMPRESSED mainstream interchange format
decodes for real in this container — only entropy-coded formats
(JPEG) still require an external library.

BMP scope: BITMAPINFOHEADER, 24 bpp, BI_RGB (no compression),
bottom-up or top-down rows, 4-byte row padding. Everything else
raises ``ValueError`` naming the unsupported feature.
"""
from __future__ import annotations

import struct

import numpy as np


def is_bmp(payload: bytes) -> bool:
    return payload is not None and payload[:2] == b"BM"


def is_netpbm(payload: bytes) -> bool:
    return payload is not None and payload[:2] in (b"P5", b"P6")


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit bottom-up BMP."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8 RGB")
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    bgr = img[:, :, ::-1]
    pad = b"\x00" * (row_bytes - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        body += bgr[y].tobytes() + pad
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    return header + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    if not is_bmp(data):
        raise ValueError("not a BMP (missing BM signature)")
    _, _fsize, _, _, offset = struct.unpack("<2sIHHI", data[:14])
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h, _planes, bpp, comp = struct.unpack("<iiHHI", data[18:34])
    if bpp != 24:
        raise ValueError(f"unsupported BMP bit depth {bpp} (24 only)")
    if comp != 0:
        raise ValueError(f"unsupported BMP compression {comp}")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    need = offset + row_bytes * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        data, np.uint8, count=row_bytes * h, offset=offset
    ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


def encode_netpbm(img: np.ndarray) -> bytes:
    """(H, W) uint8 → P5 PGM; (H, W, 3) uint8 → P6 PPM."""
    if img.dtype != np.uint8:
        raise ValueError("encode_netpbm expects uint8")
    if img.ndim == 2:
        magic, body = b"P5", img.tobytes()
    elif img.ndim == 3 and img.shape[2] == 3:
        magic, body = b"P6", img.tobytes()
    else:
        raise ValueError("expected (H, W) or (H, W, 3)")
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + body


def _netpbm_header(data: bytes) -> tuple[int, int, int, int]:
    """Scan the ASCII header only: (width, height, maxval, body_offset)."""
    if not is_netpbm(data):
        raise ValueError("not a binary netpbm (P5/P6) payload")
    # header: magic, whitespace/comment-separated width, height, maxval
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    return w, h, maxval, pos


def netpbm_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the header alone — no pixel materialization."""
    w, h, _maxval, _pos = _netpbm_header(data)
    return w, h


def decode_netpbm(data: bytes) -> np.ndarray:
    magic = data[:2]
    w, h, maxval, pos = _netpbm_header(data)
    if maxval != 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    ch = 1 if magic == b"P5" else 3
    need = w * h * ch
    body = np.frombuffer(data, np.uint8, count=need, offset=pos)
    if body.size != need:
        raise ValueError("truncated netpbm pixel data")
    return (
        body.reshape(h, w) if ch == 1 else body.reshape(h, w, 3)
    )
