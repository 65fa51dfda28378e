"""Group-integrity stress: with a pathologically small target block size
(64 KB), the keyed repartition must still deliver every document's spans
to exactly one rebuild batch — no duplicated doc_ids, no lost spans.
Guards the sort=False + whole-block map_batches reassembly contract."""
from __future__ import annotations

import collections

import ray.data as rd

from ocr_ray import synth
from ocr_ray.pipelines.extract import ExtractConfig, extract_documents


def test_reassembly_survives_tiny_blocks(ray_session):
    from ocr_ray.context import configure

    ctx = configure()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 64 * 1024
        tbl = synth.generate_interleaved(150, seed=21)
        docs = extract_documents(rd.from_arrow(tbl), ExtractConfig()).to_pandas()
        counts = collections.Counter(docs["doc_id"])
        assert max(counts.values()) == 1
        expect = {r["doc_id"]: len(r["spans"]) for r in tbl.to_pylist()}
        for _, row in docs.iterrows():
            assert len(row["spans"]) == expect[row["doc_id"]]
    finally:
        ctx.target_max_block_size = old
