"""OCR engine registry — the stateful heart of the actor-pool stage.

Mirrors the reference's engine architecture (T1-T3 in SURVEY.md §2.3):
engines are constructed ONCE (per actor, in ``SpanProcessor.__init__``) and
reused per batch — the reference does the same per process behind a lock
(app/services/ocr_service.py:432-482). Selection: ``auto`` picks the first
available engine, or an explicit ``tesseract`` / ``paddle`` override
(reference :492-511, request param app/routers/ocr.py:83).

Real Tesseract/Paddle binaries and image libs are absent in this sandbox,
so the working engines are deterministic mocks over
``synth.media_payload`` (media_ref → page text + per-word confidences) —
the Ray-side plumbing (actor signature, batching, confidence defaulting)
is identical to what a real engine wrapper needs. ``TesseractEngine``
shows the real-subprocess shape and raises ``NotImplementedError`` when
the binary is missing.
"""
from __future__ import annotations

import shutil
from typing import Protocol, Sequence

from ocr_ray import synth

# language map kept from the reference (ocr_service.py:345-350)
LANG_MAP = {"id": "ind", "en": "eng", "mixed": "ind+eng"}

# when an engine yields no confidences, default to [0.75]
# (reference ocr_service.py:402-403)
DEFAULT_CONFIDENCES = [0.75]


class OcrEngine(Protocol):
    name: str

    def read_page(self, media_ref: str, language: str = "mixed",
                  enhance: bool = False) -> tuple[str, list[float]]:
        """One scanned page → (text, per-word confidences)."""
        ...


class MockTesseractEngine:
    """Deterministic stand-in for the Tesseract subprocess engine (T2)."""

    name = "tesseract"

    def __init__(self, language: str = "mixed"):
        self.lang = LANG_MAP.get(language, "ind+eng")

    def read_page(self, media_ref, language="mixed", enhance=False):
        text, confidences = synth.media_payload(media_ref)
        # `enhance` maps to the reference's cv2 preprocess chain
        # (ocr_service.py:145-223) — a no-op for the deterministic mock.
        if not confidences:
            confidences = list(DEFAULT_CONFIDENCES)
        return text, confidences


class MockPaddleEngine:
    """Deterministic stand-in for PaddleOCR (T1); same payload source but a
    distinct name so engine dispatch is observable in tests."""

    name = "paddle"

    def __init__(self, language: str = "mixed"):
        self.lang = language

    def read_page(self, media_ref, language="mixed", enhance=False):
        text, confidences = synth.media_payload(media_ref)
        if not confidences:
            confidences = list(DEFAULT_CONFIDENCES)
        return text, confidences


class TesseractEngine:
    """Real-subprocess engine shape (reference ocr_service.py:299-414).

    Requires the tesseract binary + image decode libs; neither exists in
    this container, so construction fails fast with a clear error. A real
    deployment resolves media_ref → bytes (S3/MinIO,
    minio_service.py:30-39), rasterizes PDFs at PDF_DPI, and runs
    ``tesseract --oem 3 --psm 6`` with a TSV pass for confidences.
    """

    name = "tesseract-real"

    def __init__(self, language: str = "mixed"):
        if shutil.which("tesseract") is None:
            raise NotImplementedError(
                "tesseract binary not available in this environment; "
                "use engine='tesseract' (deterministic mock)"
            )
        self.lang = LANG_MAP.get(language, "ind+eng")

    def read_page(self, media_ref, language="mixed", enhance=False):
        raise NotImplementedError("real OCR not wired in this sandbox")


_REGISTRY = {
    "tesseract": MockTesseractEngine,
    "paddle": MockPaddleEngine,
    "tesseract-real": TesseractEngine,
}


def make_engine(name: str = "auto", language: str = "mixed") -> OcrEngine:
    if name in (None, "auto"):
        name = "tesseract"  # the reference's availability probe lands here too
    try:
        cls = _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown OCR engine {name!r}; choose from {sorted(_REGISTRY)}")
    return cls(language=language)


def batch_confidence(confidences: Sequence[float]) -> list[float]:
    return list(confidences) if confidences else list(DEFAULT_CONFIDENCES)
