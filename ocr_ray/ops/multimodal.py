"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(``media_type``, ``width``/``height``/``duration``…); the transform
stages are actor-pool ``map_batches`` classes whose Ray-side plumbing —
schema handling, batch sizing, actor lifecycle, output layout — is real
and tested, while the codec work itself is STUBBED: the decode libraries
(PIL/cv2/ffmpeg) are not in this container, so decoding parses a small
deterministic fake header (``synthesize_media`` writes it) and the real
paths raise ``NotImplementedError`` naming the library they need.

Scale guidance baked into the defaults: binary rows are wide, so stages
use small ``batch_size`` and ``batch_format="pyarrow"`` (binary columns
do not survive pandas round-trips losslessly).
"""
from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
    ]
)

_MAGIC = b"OCRX"


def synthesize_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table: payload = magic + type byte +
    width/height/duration header + pseudo-random body bytes."""
    types = ["image", "audio", "video"]
    ids, kinds, payloads = [], [], []
    for i in range(n):
        h = hashlib.sha256(f"media|{seed}|{i}".encode()).digest()
        kind = types[h[0] % 3]
        width, height = 64 + h[1] * 8, 64 + h[2] * 8
        duration_ms = 500 + int.from_bytes(h[3:5], "big")
        body = hashlib.sha256(h).digest() * max(1, h[5] // 8)
        header = _MAGIC + struct.pack(
            ">BHHI", types.index(kind), width, height, duration_ms
        )
        ids.append(i)
        kinds.append(kind)
        payloads.append(header + body)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def _parse_header(payload: bytes) -> tuple[str, int, int, int]:
    if payload[:4] != _MAGIC:
        raise ValueError("not a synthetic media payload")
    kind_idx, width, height, duration = struct.unpack(">BHHI", payload[4:13])
    return ["image", "audio", "video"][kind_idx], width, height, duration


class DecodeMedia:
    """Actor stage: payload → typed metadata columns. A real deployment
    replaces ``_decode`` with PIL.Image.open / soundfile / PyAV — the
    actor keeps the codec context warm across batches."""

    def __init__(self, real_codecs: bool = False):
        if real_codecs:
            raise NotImplementedError(
                "real decode needs PIL/soundfile/PyAV (not in this container)"
            )

    @staticmethod
    def _decode(payload: bytes) -> dict:
        kind, width, height, duration = _parse_header(payload)
        return {
            "media_type": kind,
            "width": width,
            "height": height,
            "duration_ms": duration,
            "n_bytes": len(payload),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [self._decode(p) for p in batch.column("payload").to_pylist()]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": pa.array([m["media_type"] for m in metas], pa.string()),
                "width": pa.array([m["width"] for m in metas], pa.int32()),
                "height": pa.array([m["height"] for m in metas], pa.int32()),
                "duration_ms": pa.array([m["duration_ms"] for m in metas], pa.int64()),
                "n_bytes": pa.array([m["n_bytes"] for m in metas], pa.int64()),
                "payload": batch.column("payload"),
            }
        )


class ResizeImage:
    """Actor stage: cap the max dimension, preserving aspect ratio — the
    reference's resize guard (ocr_service.py:20-40, MAX_IMAGE_DIMENSION
    2000). Stub arithmetic on header metadata; a real stage transforms
    pixels."""

    def __init__(self, max_dimension: int = 2000):
        self.max_dimension = max_dimension

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch.column("height").to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, self.max_dimension / np.maximum(w, h))
        out = batch.drop_columns([c for c in ("new_width", "new_height") if c in batch.column_names])
        out = out.append_column("new_width", pa.array((w * scale).astype(np.int32), pa.int32()))
        out = out.append_column("new_height", pa.array((h * scale).astype(np.int32), pa.int32()))
        return out


class DeskewImage:
    """M4 analogue (reference _deskew_image, ocr_service.py:43-92 — note
    it is DEAD CODE there, never called by preprocess_gambar; kept here
    as an explicit opt-in stage). Real path: Otsu threshold → minAreaRect
    angle → rotate when ≥ min_angle. Stub: deterministic angle derived
    from the payload hash, recorded as metadata."""

    def __init__(self, min_angle: float = 0.5, real_codecs: bool = False):
        if real_codecs:
            raise NotImplementedError("real deskew needs cv2 (not in this container)")
        self.min_angle = min_angle

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        angles = []
        for p in batch.column("payload").to_pylist():
            h = hashlib.blake2b(p, digest_size=2).digest()
            angle = (int.from_bytes(h, "big") % 2000 - 1000) / 100.0  # ±10°
            angles.append(angle if abs(angle) >= self.min_angle else 0.0)
        return batch.append_column("deskew_angle", pa.array(angles, pa.float64()))


class RemoveBackground:
    """M5 analogue (reference _remove_yellow_background,
    ocr_service.py:95-122: LAB split → CLAHE on L → neutralize a/b).
    Stub: flags the stage as applied; a real stage transforms pixels."""

    def __init__(self, real_codecs: bool = False):
        if real_codecs:
            raise NotImplementedError("real background removal needs cv2")

    def __call__(self, batch: pa.Table) -> pa.Table:
        flags = pa.array([True] * batch.num_rows, pa.bool_())
        return batch.append_column("background_neutralized", flags)


class SampleFrames:
    """Actor stage: video → one row per sampled frame timestamp
    (deterministic every ``interval_ms``). Real frame extraction is the
    stubbed part; the explode plumbing is the point."""

    def __init__(self, interval_ms: int = 1000, max_frames: int = 16):
        self.interval_ms = interval_ms
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, ts_out, idx_out = [], [], []
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("media_type").to_pylist()
        durations = batch.column("duration_ms").to_pylist()
        for mid, kind, dur in zip(ids, kinds, durations):
            if kind != "video":
                continue
            n = min(self.max_frames, max(1, int(dur // self.interval_ms)))
            for f in range(n):
                ids_out.append(mid)
                ts_out.append(f * self.interval_ms)
                idx_out.append(f)
        return pa.table(
            {
                "media_id": pa.array(ids_out, pa.int64()),
                "frame_idx": pa.array(idx_out, pa.int32()),
                "ts_ms": pa.array(ts_out, pa.int64()),
            }
        )


def decode_media(media, concurrency=(1, 4), batch_size: int = 64):
    return media.map_batches(
        DecodeMedia, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_images(decoded, max_dimension: int = 2000, concurrency=(1, 4)):
    return decoded.map_batches(
        ResizeImage,
        fn_constructor_kwargs={"max_dimension": max_dimension},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def sample_frames(decoded, interval_ms: int = 1000, concurrency=(1, 4)):
    return decoded.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"interval_ms": interval_ms},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )
