"""End-to-end span-sequence equality: Ray pipeline vs plain-Python oracle.

The north-star invariant (BASELINE.json): per-row span-sequence equality
``(kind, text, media_ref, order)`` after routing, OCR, repair, shuffle and
reassembly — on shuffled input, so offset-order restoration is actually
exercised.
"""
from __future__ import annotations

import pyarrow as pa
import pytest

from ocr_ray import io, synth
from ocr_ray.oracle import extract_oracle
from ocr_ray.pipelines.extract import ExtractConfig, extract_documents, extract_spans


@pytest.fixture(scope="module")
def small_table() -> pa.Table:
    return synth.generate_interleaved(n_docs=40, seed=7)


@pytest.fixture(scope="module")
def interleaved_path(small_table, tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("interleaved") / "docs"
    return io.write_interleaved(small_table, str(path), max_rows_per_file=10)


def test_synth_deterministic():
    a = synth.generate_interleaved(n_docs=5, seed=3)
    b = synth.generate_interleaved(n_docs=5, seed=3)
    assert a.equals(b)
    assert not a.equals(synth.generate_interleaved(n_docs=5, seed=4))


def test_span_sequence_equality(ray_session, small_table, interleaved_path):
    config = ExtractConfig()
    ds = io.read_interleaved(interleaved_path)
    # shuffle spans between processing and reassembly: order must be
    # restored per-group by offset, never inherited from block order
    spans = extract_spans(ds, config).random_shuffle(seed=11)
    from ocr_ray.stages.reassemble import reassemble

    result = reassemble(spans, num_partitions=5).to_pandas()

    oracle = extract_oracle(small_table, config)
    assert len(result) == len(oracle) == small_table.num_rows

    for _, row in result.iterrows():
        expected = oracle[row["doc_id"]]
        got = [
            (s["kind"], s["text"], s["media_ref"], i)
            for i, s in enumerate(row["spans"])
        ]
        want = [
            (s["kind"], s["text"], s["media_ref"], i)
            for i, s in enumerate(expected["spans"])
        ]
        assert got == want, f"span mismatch for {row['doc_id']}"
        assert row["doc_text"] == expected["doc_text"]


def test_document_stats(ray_session, small_table, interleaved_path):
    ds = io.read_interleaved(interleaved_path)
    docs = extract_documents(ds, ExtractConfig()).to_pandas()
    spans_per_doc = {
        row["doc_id"]: len(row["spans"]) for _, row in docs.iterrows()
    }
    for row in small_table.to_pylist():
        assert spans_per_doc[row["doc_id"]] == len(row["spans"])
    assert (docs["n_spans"] >= 1).all()
    # media-heavy docs exist at this seed and survive intact
    assert docs["n_media_spans"].max() >= 1


def test_multipage_halaman_format(ray_session):
    table = pa.table(
        {
            "doc_id": ["d1"],
            "spans": [
                [
                    {"kind": "pdf", "text": "", "media_ref": "mem://pages/d1/0", "offset": 0},
                    {"kind": "text", "text": "antara halaman", "media_ref": "", "offset": 1},
                    {"kind": "pdf", "text": "", "media_ref": "mem://pages/d1/2", "offset": 2},
                ]
            ],
        },
        schema=synth.INTERLEAVED_SCHEMA,
    )
    import ray.data as rd

    docs = extract_documents(rd.from_arrow(table), ExtractConfig()).take_all()
    assert len(docs) == 1
    text = docs[0]["doc_text"]
    assert "--- Halaman 1 ---\n" in text
    assert "--- Halaman 2 ---\n" in text
    # the text span sits between the two pages and gets no header
    h1 = text.index("--- Halaman 1 ---")
    h2 = text.index("--- Halaman 2 ---")
    mid = text.index("antara halaman")
    assert h1 < mid < h2
