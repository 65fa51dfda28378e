"""Invalid spans survive the whole pipeline: routed to error_code at the
span stage, kept in offset order, and surfaced as n_error_spans on the
reassembled document (never dropped — reference M2 semantics)."""
from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ocr_ray.pipelines.extract import ExtractConfig, extract_documents
from ocr_ray.synth import INTERLEAVED_SCHEMA


def test_error_spans_survive_reassembly(ray_session):
    table = pa.table(
        {
            "doc_id": ["mixed", "clean"],
            "spans": [
                [
                    {"kind": "text", "text": "surat pertama", "media_ref": "", "offset": 0},
                    {"kind": "docx", "text": "nope", "media_ref": "", "offset": 1},
                    {"kind": "pdf", "text": "", "media_ref": "", "offset": 2},
                    {"kind": "text", "text": "surat kedua", "media_ref": "", "offset": 3},
                ],
                [
                    {"kind": "text", "text": "dokumen bersih", "media_ref": "", "offset": 0},
                ],
            ],
        },
        schema=INTERLEAVED_SCHEMA,
    )
    docs = (
        extract_documents(rd.from_arrow(table), ExtractConfig())
        .to_pandas()
        .set_index("doc_id")
    )
    assert docs.loc["mixed", "n_error_spans"] == 2  # invalid kind + empty ref
    assert docs.loc["clean", "n_error_spans"] == 0
    # order preserved, error spans present with empty text
    kinds = [s["kind"] for s in docs.loc["mixed", "spans"]]
    assert kinds == ["text", "docx", "pdf", "text"]
    texts = [s["text"] for s in docs.loc["mixed", "spans"]]
    assert texts[1] == "" and texts[2] == ""
    assert texts[0] and texts[3]
    # error spans contribute no text to the merged document
    assert "surat pertama" in docs.loc["mixed", "doc_text"]
    assert "surat kedua" in docs.loc["mixed", "doc_text"]


def test_oversized_span_routed_file_too_large(ray_session):
    """Reference M2 parity: a span whose inline payload exceeds the size
    cap (50 MB default, config.py:43 / ocr.py:167) routes to
    FILE_TOO_LARGE and the doc survives reassembly with n_error_spans
    incremented — never dropped, never OCR'd."""
    big = "kata " * 100  # 500 bytes, over the tiny test cap below
    table = pa.table(
        {
            "doc_id": ["doc"],
            "spans": [
                [
                    {"kind": "text", "text": "surat pendek", "media_ref": "", "offset": 0},
                    {"kind": "text", "text": big, "media_ref": "", "offset": 1},
                ],
            ],
        },
        schema=INTERLEAVED_SCHEMA,
    )
    cfg = ExtractConfig(max_span_bytes=256)
    docs = (
        extract_documents(rd.from_arrow(table), cfg).to_pandas().set_index("doc_id")
    )
    assert docs.loc["doc", "n_error_spans"] == 1
    spans = docs.loc["doc", "spans"]
    assert spans[1]["text"] == ""  # oversized payload never extracted
    assert "surat pendek" in docs.loc["doc", "doc_text"]
    assert "kata" not in docs.loc["doc", "doc_text"]

    from ocr_ray.stages.process import ERR_FILE_TOO_LARGE, process_span

    row = process_span("text", big, "", engine=None, max_span_bytes=256)
    assert row["error_code"] == ERR_FILE_TOO_LARGE and row["text"] == ""
    # under the default 50 MB cap the same span is processed normally
    ok = process_span("text", big, "", engine=None)
    assert ok["error_code"] is None and ok["text"]
