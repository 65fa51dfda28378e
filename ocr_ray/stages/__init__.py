"""Ray Data pipeline stages: explode → process (route by kind) → reassemble."""
from ocr_ray.stages.explode import explode_spans
from ocr_ray.stages.process import SpanProcessor, SPAN_OUT_SCHEMA
from ocr_ray.stages.reassemble import reassemble, rebuild_docs_block

__all__ = [
    "explode_spans",
    "SpanProcessor",
    "SPAN_OUT_SCHEMA",
    "reassemble",
    "rebuild_docs_block",
]
