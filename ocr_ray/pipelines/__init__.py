from ocr_ray.pipelines.extract import (
    ExtractConfig,
    extract_documents,
    extract_spans,
)

__all__ = ["ExtractConfig", "extract_documents", "extract_spans"]
