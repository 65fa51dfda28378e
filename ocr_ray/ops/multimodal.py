"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(``media_type``, ``width``/``height``/``duration``…); the transform
stages are actor-pool ``map_batches`` classes whose Ray-side plumbing —
schema handling, batch sizing, actor lifecycle, output layout — is real
and tested. Two payload families flow through the same stages:

- **Raw images** (``RAWI`` magic: header + uncompressed RGB bytes) need
  no codec, so resize / deskew / background-neutralize run REAL pixel
  math on them (:mod:`ocr_ray.kernels.pixels` — bilinear resample,
  Otsu + projection-profile deskew, LAB+CLAHE neutralization, all
  reimplementing the reference's preprocessing semantics,
  ocr_service.py:19-122).
- **Opaque fake media** (``OCRX`` magic, ``synthesize_media``) stand in
  for compressed formats: the decode libraries (PIL/cv2/ffmpeg) are not
  in this container, so these rows take the metadata-stub path and the
  ``real_codecs=True`` constructors raise ``NotImplementedError`` naming
  the missing library.

Scale guidance baked into the defaults: binary rows are wide, so stages
use small ``batch_size`` and ``batch_format="pyarrow"`` (binary columns
do not survive pandas round-trips losslessly). The per-row Python loop
inside the pixel stages is NOT a hot-path smell: each row is a whole
image and the work per row is a vectorized numpy kernel — the image is
the vectorization unit.
"""
from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from ocr_ray.kernels import pixels as px

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
    if payload[:4] == _RAW_MAGIC:
        width, height = struct.unpack(">HH", payload[4:8])
        return "image", width, height, 0
    if payload[:4] != _MAGIC:
        raise ValueError("not a synthetic media payload")
    kind_idx, width, height, duration = struct.unpack(">BHHI", payload[4:13])
    return ["image", "audio", "video"][kind_idx], width, height, duration


# ------------------------------------------------- raw (codec-free) images

_RAW_MAGIC = b"RAWI"


def encode_raw_image(img: np.ndarray) -> bytes:
    """Pack an (H, W, 3) uint8 RGB array as an uncompressed payload:
    ``RAWI`` magic + big-endian (width, height) + row-major RGB bytes.
    No codec required to read it back — this is the format the real
    pixel kernels run on in this container."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8 RGB")
    h, w = img.shape[:2]
    return _RAW_MAGIC + struct.pack(">HH", w, h) + img.tobytes()


def decode_raw_image(payload: bytes) -> np.ndarray:
    """Inverse of :func:`encode_raw_image` (zero-copy frombuffer view,
    reshaped; callers must copy before mutating)."""
    if payload[:4] != _RAW_MAGIC:
        raise ValueError("not a raw image payload")
    w, h = struct.unpack(">HH", payload[4:8])
    body = np.frombuffer(payload, dtype=np.uint8, offset=8)
    if body.size != w * h * 3:
        raise ValueError(
            f"raw payload body is {body.size} bytes, expected {w * h * 3}"
        )
    return body.reshape(h, w, 3)


def is_raw_image(payload: bytes) -> bool:
    return payload[:4] == _RAW_MAGIC


def render_text_page(
    width: int = 96,
    height: int = 96,
    n_lines: int = 6,
    yellow: bool = False,
    seed: int = 0,
) -> np.ndarray:
    """Deterministic synthetic document page: dark horizontal text-line
    stripes (with per-line jittered extents, so the content mask is not
    degenerate) on a light — optionally yellow-aged — background.
    Gives the deskew / background kernels realistic structure without
    any image library."""
    img = np.full((height, width, 3), 245, dtype=np.uint8)
    if yellow:
        # aged-paper tint: strong in R/G, weak in B
        img[:, :] = (235, 220, 160)
    rng_bytes = hashlib.sha256(f"page|{seed}".encode()).digest()
    margin_y = height // 8
    margin_x = width // 10
    band = max(2, (height - 2 * margin_y) // (2 * n_lines))
    for i in range(n_lines):
        top = margin_y + i * 2 * band
        if top + band > height - margin_y:
            break
        jitter = rng_bytes[i % len(rng_bytes)] % max(1, width // 6)
        left = margin_x + (jitter // 2)
        right = width - margin_x - (jitter - jitter // 2)
        if right > left:
            img[top:top + band, left:right] = (40, 35, 30)
    return img


def synthesize_raw_images(
    n: int,
    seed: int = 42,
    max_dim: int = 128,
    skew_every: int = 3,
    yellow_every: int = 4,
) -> pa.Table:
    """Deterministic raw-image media table (MEDIA_SCHEMA shape): every
    ``skew_every``-th page is pre-rotated by a known angle (recorded
    nowhere — the deskew stage must measure it), every
    ``yellow_every``-th page is yellow-tinted."""
    ids, kinds, payloads = [], [], []
    for i in range(n):
        h = hashlib.sha256(f"rawimg|{seed}|{i}".encode()).digest()
        w = 64 + h[0] % max(1, max_dim - 63)
        ht = 64 + h[1] % max(1, max_dim - 63)
        page = render_text_page(
            w, ht, n_lines=4 + h[2] % 4,
            yellow=(yellow_every and i % yellow_every == 0), seed=i,
        )
        if skew_every and i % skew_every == 0:
            angle = 2.0 + (h[3] % 80) / 10.0  # 2.0..9.9°
            if h[4] % 2:
                angle = -angle
            page = px.rotate_expand(page, angle)
        ids.append(i)
        kinds.append("image")
        payloads.append(encode_raw_image(page))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def _to_rgb(img: np.ndarray) -> np.ndarray:
    """Any decoded image layout → (H, W, 3) uint8 RGB (the RAWI pixel
    contract): grey stacked, grey+alpha takes luma, RGBA drops alpha."""
    if img.ndim == 2:
        return np.repeat(img[:, :, None], 3, axis=2)
    if img.shape[2] == 2:
        return np.repeat(img[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(img[:, :, :3])


_JPEG_MAGIC = b"\xff\xd8\xff"


def decode_any_image(payload: bytes) -> np.ndarray | None:
    """(H, W, 3) RGB pixels for any stdlib-decodable payload — RAWI,
    PNG (kernels/png.py), BMP / netpbm (kernels/imagefmt.py), baseline
    JPEG (kernels/jpeg.py) — else None (progressive JPEG and video/
    audio containers still need external codecs)."""
    if payload is None:
        return None
    if is_raw_image(payload):
        return decode_raw_image(payload)
    from ocr_ray.kernels.imagefmt import (
        decode_bmp,
        decode_netpbm,
        is_bmp,
        is_netpbm,
    )
    from ocr_ray.kernels.jpeg import decode_jpeg, is_jpeg
    from ocr_ray.kernels.png import decode_png, is_png

    if is_png(payload):
        return _to_rgb(decode_png(payload))
    if is_bmp(payload):
        return decode_bmp(payload)
    if is_netpbm(payload):
        return _to_rgb(decode_netpbm(payload))
    if is_jpeg(payload):
        try:
            return _to_rgb(decode_jpeg(payload))
        except NotImplementedError:
            return None  # progressive/arithmetic — codec absent
        except ValueError:
            return None  # truncated/corrupt stream — best-effort helper
    return None


class DecodeMedia:
    """Actor stage: payload → typed metadata columns (and, with
    ``real_codecs=True``, real pixels). PNG decodes via the stdlib-zlib
    codec (kernels/png.py) and is TRANSCODED to the RAWI payload the
    downstream pixel kernels (resize/deskew/background, M3-M5) consume —
    the reference's PIL decode seam (ocr_service.py:513-525) with PNG
    closed for real, and baseline JPEG via kernels/jpeg.py —
    NotImplementedError now names only progressive/arithmetic streams.
    PNG dims come from the IHDR and JPEG dims from the SOF header in
    metadata-only mode (no decompression / entropy decode)."""

    def __init__(self, real_codecs: bool = False):
        self.real_codecs = real_codecs

    def _decode(self, payload: bytes) -> dict:
        from ocr_ray.kernels.imagefmt import (
            decode_bmp,
            decode_netpbm,
            is_bmp,
            is_netpbm,
            netpbm_dims,
        )
        from ocr_ray.kernels.png import decode_png, is_png

        if is_bmp(payload) or is_netpbm(payload):
            # stdlib codecs (kernels/imagefmt.py): decode for real in
            # real_codecs mode, header-only dims otherwise
            if self.real_codecs:
                img = _to_rgb(
                    decode_bmp(payload)
                    if is_bmp(payload)
                    else decode_netpbm(payload)
                )
                return {
                    "media_type": "image",
                    "width": img.shape[1],
                    "height": img.shape[0],
                    "duration_ms": 0,
                    "n_bytes": len(payload),
                    "payload": encode_raw_image(img),
                }
            import struct as _struct

            if is_bmp(payload):
                w, h = _struct.unpack("<ii", payload[18:26])
                h = abs(h)
            else:
                # header-only: no pixel-body materialization in
                # metadata mode (same as the BMP/PNG branches)
                w, h = netpbm_dims(payload)
            return {
                "media_type": "image",
                "width": w,
                "height": h,
                "duration_ms": 0,
                "n_bytes": len(payload),
                "payload": payload,
            }
        if is_png(payload):
            if self.real_codecs:
                img = _to_rgb(decode_png(payload))
                return {
                    "media_type": "image",
                    "width": img.shape[1],
                    "height": img.shape[0],
                    "duration_ms": 0,
                    "n_bytes": len(payload),
                    "payload": encode_raw_image(img),
                }
            import struct as _struct

            w, h = _struct.unpack(">II", payload[16:24])
            return {
                "media_type": "image",
                "width": w,
                "height": h,
                "duration_ms": 0,
                "n_bytes": len(payload),
                "payload": payload,
            }
        if payload[:3] == _JPEG_MAGIC:
            from ocr_ray.kernels.jpeg import decode_jpeg, jpeg_dims

            if self.real_codecs:
                # baseline decodes for real (kernels/jpeg.py) and is
                # transcoded to RAWI like PNG; the NotImplementedError
                # now fires ONLY for progressive/arithmetic streams
                img = _to_rgb(decode_jpeg(payload))
                return {
                    "media_type": "image",
                    "width": img.shape[1],
                    "height": img.shape[0],
                    "duration_ms": 0,
                    "n_bytes": len(payload),
                    "payload": encode_raw_image(img),
                }
            w, h = jpeg_dims(payload)  # SOF header only, all flavors
            return {
                "media_type": "image",
                "width": w,
                "height": h,
                "duration_ms": 0,
                "n_bytes": len(payload),
                "payload": payload,
            }
        if self.real_codecs and not is_raw_image(payload):
            raise NotImplementedError(
                "real decode of this payload needs soundfile/PyAV "
                "(not in this container); PNG, baseline JPEG, BMP, "
                "netpbm and RAWI decode for real"
            )
        kind, width, height, duration = _parse_header(payload)
        return {
            "media_type": kind,
            "width": width,
            "height": height,
            "duration_ms": duration,
            "n_bytes": len(payload),
            "payload": payload,
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
                "payload": pa.array(
                    [m["payload"] for m in metas], pa.binary()
                ),
            }
        )


class ResizeImage:
    """Actor stage: cap the max dimension, preserving aspect ratio — the
    reference's resize guard (ocr_service.py:19-39, MAX_IMAGE_DIMENSION
    2000). Raw-image payloads are REALLY resampled (bilinear,
    kernels/pixels.py) and the payload column replaced; opaque fake
    payloads take the metadata-arithmetic path (their codec is not in
    this container)."""

    def __init__(self, max_dimension: int = 2000):
        self.max_dimension = max_dimension

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch.column("height").to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, self.max_dimension / np.maximum(w, h))
        new_w = (w * scale).astype(np.int32)
        new_h = (h * scale).astype(np.int32)
        payloads = batch.column("payload").to_pylist()
        changed = False
        for i, p in enumerate(payloads):
            if p is not None and is_raw_image(p):
                img = decode_raw_image(p)
                resized = px.resize_if_needed(img, self.max_dimension)
                if resized is not img:
                    payloads[i] = encode_raw_image(resized)
                    changed = True
                # authoritative dims come from the actual pixel result
                new_h[i], new_w[i] = resized.shape[:2]
        drop = [
            c for c in ("new_width", "new_height") if c in batch.column_names
        ]
        out = batch.drop_columns(drop) if drop else batch
        if changed:
            idx = out.column_names.index("payload")
            out = out.set_column(
                idx, "payload", pa.array(payloads, pa.binary())
            )
        out = out.append_column("new_width", pa.array(new_w, pa.int32()))
        out = out.append_column("new_height", pa.array(new_h, pa.int32()))
        return out


class DeskewImage:
    """M4 analogue (reference _deskew_image, ocr_service.py:43-92 — note
    it is DEAD CODE there, never called by preprocess_gambar; kept here
    as an explicit opt-in stage). Real path: Otsu threshold → minAreaRect
    angle → rotate when ≥ min_angle. Stub: deterministic angle derived
    from the payload hash, recorded as metadata."""

    def __init__(self, min_angle: float = 0.5, real_codecs: bool = False):
        if real_codecs:
            raise NotImplementedError(
                "real deskew of COMPRESSED images needs cv2 (not in this "
                "container); raw-image payloads are deskewed for real by "
                "default via kernels/pixels.py"
            )
        self.min_angle = min_angle

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        angles = []
        payloads = batch.column("payload").to_pylist()
        changed = False
        for i, p in enumerate(payloads):
            if p is not None and is_raw_image(p):
                # real path: measure the skew (Otsu mask + projection-
                # profile) and straighten with expanded bounds —
                # reference _deskew_image semantics, ocr_service.py:42-89
                img = decode_raw_image(p)
                straightened, angle = px.deskew(img, min_angle=self.min_angle)
                if angle != 0.0:
                    payloads[i] = encode_raw_image(straightened)
                    changed = True
                angles.append(angle)
                continue
            # opaque payload: deterministic stub angle from the hash
            h = hashlib.blake2b(p, digest_size=2).digest()
            angle = (int.from_bytes(h, "big") % 2000 - 1000) / 100.0  # ±10°
            angles.append(angle if abs(angle) >= self.min_angle else 0.0)
        out = batch
        if changed:
            idx = out.column_names.index("payload")
            out = out.set_column(
                idx, "payload", pa.array(payloads, pa.binary())
            )
        return out.append_column("deskew_angle", pa.array(angles, pa.float64()))


class RemoveBackground:
    """M5 analogue (reference _remove_yellow_background,
    ocr_service.py:93-122: LAB split → CLAHE on L → neutralize a/b).
    Raw-image payloads get the REAL transform (numpy LAB round-trip +
    CLAHE, kernels/pixels.py); opaque payloads are flagged only (their
    codec is not in this container)."""

    def __init__(self, real_codecs: bool = False):
        if real_codecs:
            raise NotImplementedError(
                "background removal of COMPRESSED images needs cv2; "
                "raw-image payloads are neutralized for real by default"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        changed = False
        for i, p in enumerate(payloads):
            if p is not None and is_raw_image(p):
                img = decode_raw_image(p)
                payloads[i] = encode_raw_image(px.neutralize_background(img))
                changed = True
        out = batch
        if changed:
            idx = out.column_names.index("payload")
            out = out.set_column(
                idx, "payload", pa.array(payloads, pa.binary())
            )
        flags = pa.array([True] * out.num_rows, pa.bool_())
        return out.append_column("background_neutralized", flags)


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


class EnhanceImage:
    """M6: the COMPLETE preprocess_gambar enhance chain (reference
    ocr_service.py:145-223 — LAB neutralize → CLAHE 4.0 → 2×2 dilation
    thicken → unsharp σ2 1.8/−0.8 → convertScaleAbs 1.3/−30), run for
    REAL on every RAWI or PNG payload via kernels/pixels.py:
    enhance_chain; opaque payloads (progressive JPEG, corrupt or
    unknown formats) pass through
    flagged ``enhanced=False``. Replaces the payload with the enhanced
    RAWI page, exactly what a warm OCR engine would consume next."""

    def __init__(self, enhance: bool = True):
        self.enhance = enhance

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        flags = []
        changed = False
        for i, p in enumerate(payloads):
            img = decode_any_image(p) if self.enhance else None
            if img is None:
                flags.append(False)
                continue
            payloads[i] = encode_raw_image(px.enhance_chain(img))
            flags.append(True)
            changed = True
        out = batch
        if changed:
            idx = out.column_names.index("payload")
            out = out.set_column(
                idx, "payload", pa.array(payloads, pa.binary())
            )
        return out.append_column("enhanced", pa.array(flags, pa.bool_()))


def enhance_images(decoded, enhance: bool = True, concurrency=(1, 4)):
    return decoded.map_batches(
        EnhanceImage,
        fn_constructor_kwargs={"enhance": enhance},
        batch_format="pyarrow",
        batch_size=16,  # full-page pixel work: keep batches small
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


# ------------------------------------------- perceptual image near-dup

def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (dHash): luma → 8×9 block means → each bit
    says "right cell brighter than left". Block means are EXACT — 2-D
    integer prefix sums give cell sums, and the brightness comparison
    cross-multiplies sums by cell areas instead of dividing — so the
    hash is bit-stable across platforms (no float rounding anywhere).
    Requires at least 9×8 pixels (a real pipeline resizes first; the
    resize stage upstream guarantees this for any non-degenerate
    page)."""
    import ocr_ray.kernels.pixels as px

    gray = px.to_gray(img).astype(np.int64)
    h, w = gray.shape
    if h < 8 or w < 9:
        raise ValueError(f"dhash needs ≥9×8 pixels, got {w}×{h}")
    P = np.zeros((h + 1, w + 1), dtype=np.int64)
    P[1:, 1:] = gray.cumsum(axis=0).cumsum(axis=1)
    rb = (np.arange(9, dtype=np.int64) * h) // 8      # 9 row boundaries
    cb = (np.arange(10, dtype=np.int64) * w) // 9     # 10 col boundaries
    s = (
        P[rb[1:, None], cb[None, 1:]]
        - P[rb[:-1, None], cb[None, 1:]]
        - P[rb[1:, None], cb[None, :-1]]
        + P[rb[:-1, None], cb[None, :-1]]
    )  # (8, 9) exact cell sums
    cnt = (rb[1:, None] - rb[:-1, None]) * (cb[None, 1:] - cb[None, :-1])
    bits = s[:, 1:] * cnt[:, :-1] > s[:, :-1] * cnt[:, 1:]
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return int(np.bitwise_or.reduce(weights[bits.reshape(64)]) if bits.any()
               else 0)


def media_dhash_pairs(media, max_hamming: int = 3, max_bucket: int = 8192):
    """Near-duplicate images: perceptual dHash per RAWI payload, then
    the SHARED 64-bit Hamming machinery from text SimHash dedup
    (ops/dedup.py) — 4×16-bit pigeonhole chunk tables, one shuffle of
    slim (table, chunk, id, hash) rows, vectorized popcount all-pairs
    per bucket with the logged rep-pair overflow guard. RAWI and PNG
    payloads hash directly (PNG via the stdlib codec, kernels/png.py);
    non-baseline streams (progressive JPEG — needs libjpeg) are
    skipped here; the full decode seam is
    ``DecodeMedia(real_codecs=True)``.

    Output (media_a, media_b, hamming) for hamming ≤ ``max_hamming``.
    Not SQL-expressible (pixel access) — pinned by pytest instead
    (exact copy → 0, noise-perturbed → ≤ max_hamming, distinct pages →
    no pair)."""
    from ray.data.aggregate import Min

    from ocr_ray.ops.dedup import _simhash_block_pairs_factory
    from ocr_ray.stages.grouped import grouped_map

    def hash_batch(batch: pa.Table) -> pa.Table:
        ids_out, hashes = [], []
        ids = batch.column("media_id").to_pylist()
        for mid, payload in zip(ids, batch.column("payload").to_pylist()):
            img = decode_any_image(payload)
            if img is None:
                continue
            hashes.append(dhash64(img))
            ids_out.append(mid)
        n = len(ids_out)
        return pa.table(
            {
                "table_id": pa.array(
                    [t for t in range(4) for _ in range(n)], pa.int32()
                ),
                "chunk": pa.array(
                    [(x >> (16 * t)) & 0xFFFF for t in range(4) for x in hashes],
                    pa.int32(),
                ),
                "doc_id": pa.array(ids_out * 4, pa.int64()),
                "simhash": pa.array(
                    np.tile(np.array(hashes, dtype=np.uint64), 4), pa.uint64()
                ),
            }
        )

    sims = media.map_batches(hash_batch, batch_format="pyarrow")
    pairs = grouped_map(
        sims,
        ["table_id", "chunk"],
        _simhash_block_pairs_factory(max_hamming, max_bucket),
    )
    out = pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )

    def rename(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.schema(
                [("media_a", pa.int64()), ("media_b", pa.int64()),
                 ("hamming", pa.int64())]
            ).empty_table()
        return t.rename_columns(["media_a", "media_b", "hamming"])

    return out.map_batches(rename, batch_format="pyarrow")


def synthesize_texture_images(n: int, seed: int = 11,
                              max_dim: int = 128) -> pa.Table:
    """Deterministic full-entropy texture pages (SHAKE-256 expanded, no
    RNG-stream version risk) — unlike the striped text pages, distinct
    textures land ~32 bits apart under dHash, so near-dup queries over
    them have NO accidental collisions and planted duplicates are the
    only signal."""
    ids, kinds, payloads = [], [], []
    for i in range(n):
        h = hashlib.sha256(f"tex|{seed}|{i}".encode()).digest()
        w = 64 + h[0] % max(1, max_dim - 63)
        ht = 64 + h[1] % max(1, max_dim - 63)
        body = hashlib.shake_256(f"texbody|{seed}|{i}".encode()).digest(
            w * ht * 3
        )
        # values bounded to 0..249 so a small uniform brightness shift
        # (the planted near-dup transform) can never clip at 255 — the
        # cross-multiplied block comparison is then EXACTLY invariant
        img = (np.frombuffer(body, dtype=np.uint8) % 250).reshape(ht, w, 3)
        ids.append(i)
        kinds.append("image")
        payloads.append(encode_raw_image(img))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


# ----------------------------------------------- raw (codec-free) audio

_RAWA_MAGIC = b"RAWA"


def encode_raw_audio(pcm: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Pack mono int16 PCM as an uncompressed payload: ``RAWA`` magic +
    big-endian uint32 sample rate + little-endian int16 samples. Like
    RAWI images, no codec is needed to read it back, so the audio
    kernels below are REAL feature extraction, not stubs."""
    if pcm.ndim != 1 or pcm.dtype != np.int16:
        raise ValueError("expected 1-D int16 PCM")
    return _RAWA_MAGIC + struct.pack(">I", sample_rate) + pcm.tobytes()


def decode_raw_audio(payload: bytes) -> tuple[np.ndarray, int]:
    if payload[:4] != _RAWA_MAGIC:
        raise ValueError("not a raw audio payload")
    (rate,) = struct.unpack(">I", payload[4:8])
    pcm = np.frombuffer(payload, dtype="<i2", offset=8)
    return pcm, int(rate)


def synthesize_raw_audio(n: int, seed: int = 23,
                         sample_rate: int = 16_000) -> pa.Table:
    """Deterministic speech-shaped clips: alternating voiced bursts
    (hash-seeded sine mixtures) and near-silence gaps, 1-4 s long —
    enough structure for the RMS/ZCR kernels and the silence segmenter
    to produce non-degenerate output, with no audio library."""
    ids, kinds, payloads = [], [], []
    for i in range(n):
        h = hashlib.sha256(f"aud|{seed}|{i}".encode()).digest()
        total_ms = 1000 + (h[0] | (h[1] << 8)) % 3000
        t = np.arange(int(sample_rate * total_ms / 1000), dtype=np.float64)
        pcm = np.zeros(len(t))
        # voiced bursts every ~600 ms, 300 ms long, alternating with gaps
        burst = int(0.3 * sample_rate)
        period = int(0.6 * sample_rate)
        freq = 80.0 + h[2]  # fundamental per clip
        for k, s in enumerate(range(0, len(t) - burst, period)):
            f = freq * (1 + 0.25 * ((h[3 + k % 8] % 5) - 2) / 10.0)
            seg = t[s:s + burst] - t[s]
            pcm[s:s + burst] = (
                6000 * np.sin(2 * np.pi * f * seg / sample_rate)
                + 2000 * np.sin(2 * np.pi * 2.3 * f * seg / sample_rate)
            )
        # low deterministic noise floor everywhere
        noise = (
            np.frombuffer(
                hashlib.shake_256(f"audnoise|{seed}|{i}".encode()).digest(
                    2 * len(t)
                ),
                dtype="<i2",
            ).astype(np.float64)
            / 32768.0
            * 50.0
        )
        pcm = np.clip(pcm + noise[: len(t)], -32767, 32767).astype(np.int16)
        ids.append(i)
        kinds.append("audio")
        payloads.append(encode_raw_audio(pcm, sample_rate))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class AudioChunkStats:
    """Actor stage: audio → one row per ``chunk_ms`` window with RMS
    energy and zero-crossing rate — the VAD-ish features every speech
    pipeline extracts before ASR. Fully vectorized (reshape + einsum-
    free reductions); REAL computation on raw PCM, no codec needed.

    Output: (media_id, chunk_idx, start_ms, rms, zcr)."""

    def __init__(self, chunk_ms: int = 250):
        self.chunk_ms = chunk_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        o_id, o_idx, o_start, o_rms, o_zcr = [], [], [], [], []
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        for mid, payload in zip(ids, payloads):
            if payload[:4] != _RAWA_MAGIC:
                continue
            pcm, rate = decode_raw_audio(payload)
            win = max(1, int(rate * self.chunk_ms / 1000))
            n_chunks = len(pcm) // win
            if n_chunks == 0:
                continue
            x = pcm[: n_chunks * win].astype(np.float64).reshape(n_chunks, win)
            rms = np.sqrt(np.mean(x * x, axis=1))
            sign = np.signbit(x)
            zcr = np.mean(sign[:, 1:] != sign[:, :-1], axis=1)
            o_id.extend([mid] * n_chunks)
            o_idx.extend(range(n_chunks))
            o_start.extend(
                int(j * win * 1000 / rate) for j in range(n_chunks)
            )
            o_rms.extend(float(v) for v in rms)
            o_zcr.extend(float(v) for v in zcr)
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "chunk_idx": pa.array(o_idx, pa.int32()),
                "start_ms": pa.array(o_start, pa.int64()),
                "rms": pa.array(o_rms, pa.float64()),
                "zcr": pa.array(o_zcr, pa.float64()),
            }
        )


class SilenceSegments:
    """Actor stage: audio → speech segments (start_ms, end_ms) found by
    thresholding windowed RMS and collapsing runs — the segmentation
    primitive an ASR pipeline feeds its decoder. Vectorized run
    detection via flatnonzero on the thresholded diff."""

    def __init__(self, win_ms: int = 50, rms_threshold: float = 500.0,
                 min_segment_ms: int = 100):
        self.win_ms = win_ms
        self.rms_threshold = rms_threshold
        self.min_segment_ms = min_segment_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        o_id, o_seg, o_start, o_end = [], [], [], []
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        for mid, payload in zip(ids, payloads):
            if payload[:4] != _RAWA_MAGIC:
                continue
            pcm, rate = decode_raw_audio(payload)
            win = max(1, int(rate * self.win_ms / 1000))
            n = len(pcm) // win
            if n == 0:
                continue
            x = pcm[: n * win].astype(np.float64).reshape(n, win)
            voiced = np.sqrt(np.mean(x * x, axis=1)) >= self.rms_threshold
            edges = np.diff(np.concatenate([[0], voiced.view(np.int8), [0]]))
            starts = np.flatnonzero(edges == 1)
            ends = np.flatnonzero(edges == -1)
            seg_i = 0
            for s, e in zip(starts, ends):
                start_ms = int(s * win * 1000 / rate)
                end_ms = int(e * win * 1000 / rate)
                if end_ms - start_ms < self.min_segment_ms:
                    continue
                o_id.append(mid)
                o_seg.append(seg_i)
                o_start.append(start_ms)
                o_end.append(end_ms)
                seg_i += 1
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "segment_idx": pa.array(o_seg, pa.int32()),
                "start_ms": pa.array(o_start, pa.int64()),
                "end_ms": pa.array(o_end, pa.int64()),
            }
        )


def audio_chunk_stats(media, chunk_ms: int = 250, concurrency=(1, 4),
                      batch_size: int = 32):
    """Actor-pool audio feature extraction; small batches because
    payloads are large binaries (the memory-aware multimodal shape)."""
    return media.map_batches(
        AudioChunkStats,
        fn_constructor_kwargs={"chunk_ms": chunk_ms},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def silence_segments(media, concurrency=(1, 4), batch_size: int = 32,
                     **kwargs):
    return media.map_batches(
        SilenceSegments,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
