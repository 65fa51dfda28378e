from __future__ import annotations

import pytest

from ocr_ray.stages.engines import (
    DEFAULT_CONFIDENCES,
    LANG_MAP,
    MockTesseractEngine,
    TesseractEngine,
    make_engine,
)
from ocr_ray.synth import media_payload


def test_registry_dispatch():
    assert make_engine("auto").name == "tesseract"
    assert make_engine(None).name == "tesseract"
    assert make_engine("paddle").name == "paddle"
    with pytest.raises(ValueError, match="unknown OCR engine"):
        make_engine("nope")


def test_real_engine_fails_fast_without_binary():
    with pytest.raises(NotImplementedError, match="tesseract binary"):
        TesseractEngine()


def test_language_map_matches_reference():
    # ocr_service.py:345-350
    assert LANG_MAP == {"id": "ind", "en": "eng", "mixed": "ind+eng"}


def test_mock_engine_deterministic_and_confidence_default():
    eng = MockTesseractEngine()
    t1, c1 = eng.read_page("mem://pages/x/0")
    t2, c2 = eng.read_page("mem://pages/x/0")
    assert (t1, c1) == (t2, c2)
    assert t1 == media_payload("mem://pages/x/0")[0]
    assert len(c1) == max(1, len(t1.split()))
    assert DEFAULT_CONFIDENCES == [0.75]


def test_extract_empty_table(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.pipelines.extract import ExtractConfig, extract_documents
    from ocr_ray.synth import INTERLEAVED_SCHEMA

    empty = INTERLEAVED_SCHEMA.empty_table()
    out = extract_documents(rd.from_arrow(empty), ExtractConfig())
    assert out.count() == 0
