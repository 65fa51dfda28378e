"""Skew handling: a media-heavy document's spans must spread across the
actor pool rather than pinning one actor (SURVEY.md §4 — the 203 s
16-page-PDF exemplar)."""
from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ocr_ray.stages.explode import explode_spans
from ocr_ray.stages.process import SpanProcessor
from ocr_ray.synth import INTERLEAVED_SCHEMA


def test_media_heavy_doc_spreads_across_actors(ray_session):
    # Local class: cloudpickle serializes it BY VALUE — a module-level
    # class in tests/ (not a package) can't be re-imported by workers.
    class SlowSpanProcessor(SpanProcessor):
        """Emulates real OCR cost (~0.3 s/page-batch) so the scheduler's
        spreading is observable; the mock engine alone is too fast for a
        batch to outlast actor startup."""

        def __call__(self, batch):
            import time

            time.sleep(0.3)
            return super().__call__(batch)

    # one document with 64 pdf pages, tiny batches, a pool of 3 actors
    spans = [
        {"kind": "pdf", "text": "", "media_ref": f"mem://pages/big/{i}", "offset": i}
        for i in range(64)
    ]
    table = pa.table(
        {"doc_id": ["big-doc"], "spans": [spans]}, schema=INTERLEAVED_SCHEMA
    )
    processed = (
        rd.from_arrow(table)
        .map_batches(explode_spans, batch_format="pyarrow")
        # force fine-grained batches so the pool can interleave one doc
        .repartition(16)
        .map_batches(
            SlowSpanProcessor,
            fn_constructor_kwargs={"debug_worker_column": True, "score": False},
            batch_format="pyarrow",
            batch_size=4,
            concurrency=3,
            num_cpus=1,
        )
        .to_pandas()
    )
    assert len(processed) == 64
    pids = set(processed["worker_pid"])
    assert len(pids) >= 2, f"heavy doc pinned to one actor: {pids}"
    # ...and reassembly still restores offset order downstream (covered by
    # the e2e suite); here we only assert the spreading behavior.
