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


# ------------------------------------------- real-subprocess seam (T2)


def _fake_runner_factory(text_out: str, tsv_out: str, log: list):
    def run(cmd, timeout):
        log.append((list(cmd), timeout))
        return 0, tsv_out if cmd[-1] == "tsv" else text_out

    return run


def test_real_engine_command_construction():
    """Reference ocr_service.py:352-385: text pass then TSV pass, both
    with -l <mapped lang> --oem 3 --psm 6, 120 s timeout."""
    log: list = []
    eng = TesseractEngine(
        language="id", runner=_fake_runner_factory("halo", "", log)
    )
    text, confs = eng.read_page("/tmp/page.png")
    assert text == "halo"
    assert confs == [0.75]  # no TSV rows → reference default
    assert len(log) == 2
    text_cmd, timeout = log[0]
    assert text_cmd == [
        "tesseract", "/tmp/page.png", "stdout", "-l", "ind",
        "--oem", "3", "--psm", "6",
    ]
    assert timeout == 120
    tsv_cmd, _ = log[1]
    assert tsv_cmd == text_cmd + ["tsv"]


def test_real_engine_lang_fallback_and_binary_override():
    log: list = []
    eng = TesseractEngine(
        language="unknown-lang",
        runner=_fake_runner_factory("x", "", log),
        binary="/opt/bin/tesseract",
    )
    eng.read_page("p.png")
    assert log[0][0][0] == "/opt/bin/tesseract"
    assert log[0][0][4] == "ind+eng"  # unmapped → mixed default


def test_real_engine_tsv_confidence_parsing():
    """Golden TSV parse (ocr_service.py:389-399): header skipped, conf
    column 11, -1/0 rows dropped, malformed tolerated, percent → 0-1."""
    header = "\t".join(
        ["level", "page_num", "block_num", "par_num", "line_num", "word_num",
         "left", "top", "width", "height", "conf", "text"]
    )
    rows = [
        ["1"] * 10 + ["-1", ""],          # structural row: conf -1 → skip
        ["5"] * 10 + ["96.21", "SURAT"],  # → 0.9621
        ["5"] * 10 + ["0", "noise"],      # conf 0 → skip (reference: > 0)
        ["5"] * 10 + ["oops", "bad"],     # malformed float → skip
        ["5"] * 10 + ["80", "KEDUA"],     # → 0.80
        ["5", "2", "3"],                  # short row → skip
    ]
    tsv = "\n".join([header] + ["\t".join(r) for r in rows])
    assert TesseractEngine.parse_tsv_confidences(tsv) == [0.9621, 0.80]
    assert TesseractEngine.parse_tsv_confidences("") == []
    assert TesseractEngine.parse_tsv_confidences(header) == []


def test_real_engine_fetch_seam_and_tsv_failure_fallback():
    """media_ref → local path resolution is injected (the MinIO fetch,
    minio_service.py:30-39); a failing TSV pass degrades to the default
    confidence instead of failing the span (ocr_service.py:400-403)."""
    calls: list = []

    def fetch(ref):
        calls.append(ref)
        return "/scratch/resolved.png"

    def runner(cmd, timeout):
        if cmd[-1] == "tsv":
            raise RuntimeError("tsv pass exploded")
        return 0, "  teks hasil \n"

    eng = TesseractEngine(runner=runner, fetch=fetch)
    text, confs = eng.read_page("s3://bucket/page-7")
    assert calls == ["s3://bucket/page-7"]
    assert text == "teks hasil"
    assert confs == [0.75]


def test_real_engine_nonzero_exit_raises():
    """A failing tesseract run (nonzero exit) must surface as a wrapped
    engine error — NOT a successful empty page with default confidences
    (reference ocr_service.py:403-407 wraps every failure)."""
    import pytest

    eng = TesseractEngine(runner=lambda cmd, timeout: (1, ""))
    with pytest.raises(Exception, match="Tesseract error: exit code 1"):
        eng.read_page("p.png")


def test_real_engine_text_pass_exception_wrapped():
    """Timeouts/exceptions in the TEXT pass propagate wrapped (the TSV
    pass stays best-effort, tested separately)."""
    import pytest

    def runner(cmd, timeout):
        raise TimeoutError("timed out after 120s")

    eng = TesseractEngine(runner=runner)
    with pytest.raises(Exception, match="Tesseract error: timed out"):
        eng.read_page("p.png")


def test_real_engine_smoke_against_real_binary(tmp_path):
    """End-to-end against an actual tesseract subprocess when one is on
    PATH — a codec-enabled deployment validates the seam with zero code
    changes. Skipped in this sandbox (no binary, no image codecs); the
    command/TSV contract is covered by the fake-runner tests above."""
    import shutil

    import pytest

    if shutil.which("tesseract") is None:
        pytest.skip("tesseract binary not installed")
    # a 1-bit PBM "image" tesseract can open without extra codecs:
    # plain-text format, all-white 32x32 canvas → zero or more words,
    # but the subprocess must exit 0 and produce parseable output
    img = tmp_path / "blank.pbm"
    img.write_text("P1\n32 32\n" + ("0 " * 32 + "\n") * 32)
    eng = TesseractEngine(language="en")
    text, confs = eng.read_page(str(img))
    assert isinstance(text, str)
    assert confs and all(0.0 <= c <= 1.0 for c in confs)
