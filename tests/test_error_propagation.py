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
