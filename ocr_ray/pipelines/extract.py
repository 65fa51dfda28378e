"""The flagship extraction pipeline, end-to-end:

    read interleaved table (Lance/Parquet)
      → explode spans            (stateless map_batches, zero-copy Arrow)
      → SpanProcessor actor pool (kind routing + OCR + repair chain)
      → reassemble by doc_id     (hash repartition, offset order restored)

This is the Ray-Data-native rebuild of the reference's per-request flow
(app/routers/ocr.py:79-327): validation → OCR → dictionary correction →
currency normalization → spelling normalization → quality scoring, with
the page-order reassembly of ocr_service.py:594-601 generalized to
interleaved spans.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from ocr_ray import io
from ocr_ray.stages.explode import explode_spans
from ocr_ray.stages.process import SpanProcessor
from ocr_ray.stages.reassemble import reassemble


@dataclass
class ExtractConfig:
    engine: str = "auto"
    language: str = "mixed"
    use_dictionary: bool = True
    normalize_spelling: bool = True
    enhance: bool = False
    score: bool = True
    # actor-pool sizing for the OCR/repair stage; None → (1, cluster CPUs).
    # batch_size is kept moderate so one media-heavy document spreads
    # across actors instead of pinning one (SURVEY.md §4 "Skew").
    ocr_concurrency: Optional[object] = None
    ocr_batch_size: int = 256
    reassemble_partitions: Optional[int] = None

    def processor_kwargs(self) -> dict:
        return {
            "engine": self.engine,
            "language": self.language,
            "use_dictionary": self.use_dictionary,
            "normalize_spelling": self.normalize_spelling,
            "enhance": self.enhance,
            "score": self.score,
        }


def _default_concurrency():
    import ray

    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    else:
        cpus = 8
    return (1, max(2, cpus))


def extract_spans(ds, config: ExtractConfig | None = None):
    """Interleaved docs Dataset → processed span rows (SPAN_OUT_SCHEMA)."""
    config = config or ExtractConfig()
    concurrency = config.ocr_concurrency or _default_concurrency()
    return ds.map_batches(
        explode_spans, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        SpanProcessor,
        fn_constructor_kwargs=config.processor_kwargs(),
        batch_format="pyarrow",
        batch_size=config.ocr_batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def extract_documents(ds, config: ExtractConfig | None = None):
    """Interleaved docs Dataset → reassembled documents (DOC_OUT_SCHEMA)."""
    config = config or ExtractConfig()
    return reassemble(
        extract_spans(ds, config), num_partitions=config.reassemble_partitions
    )


def extract_from_path(path: str, config: ExtractConfig | None = None):
    return extract_documents(io.read_interleaved(path), config)
