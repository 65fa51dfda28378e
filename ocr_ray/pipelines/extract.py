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
    # Ray fuses the explode task stage into the actor stage, so batch_size
    # is counted in DOCUMENTS (≈4.3 spans each): keep it small so work
    # spreads across the pool and a media-heavy document doesn't pin one
    # actor (SURVEY.md §4 "Skew").
    ocr_concurrency: Optional[object] = None
    ocr_batch_size: int = 16
    reassemble_partitions: Optional[int] = None
    # approved learned words merged into the kamus before the run (frozen
    # during it) — the reference's startup merge, see SpanProcessor
    learned_words: tuple = ()
    # per-span inline payload cap, reference's 50 MB upload limit
    # (config.py:43); oversized spans route to FILE_TOO_LARGE
    max_span_bytes: int = 50 * 1024 * 1024

    def processor_kwargs(self) -> dict:
        return {
            "engine": self.engine,
            "language": self.language,
            "use_dictionary": self.use_dictionary,
            "normalize_spelling": self.normalize_spelling,
            "enhance": self.enhance,
            "score": self.score,
            "learned_words": tuple(self.learned_words),
            "max_span_bytes": self.max_span_bytes,
        }


def _default_concurrency():
    # a FIXED pool of 0.75×CPUs actors: Ray's autoscaling pool ramps up
    # too slowly for short jobs (observed ~5 effective actors of 32),
    # one-actor-per-CPU oversubscribes and thrashes, and the 25% slack is
    # the same fraction at every cluster size so scaling measurements
    # compare like with like.
    import ray

    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    else:
        cpus = 8
    return max(1, round(0.75 * cpus))


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
        # 0.9, not 1.0: pool (0.75·cpus × 0.9 = 0.675·cpus) + a whole-CPU
        # read task must still leave a fraction free for the hash-shuffle
        # aggregators on the smallest clusters (4 CPUs: 3×0.9 + 1 = 3.7,
        # 0.3 left) — whole-CPU actors hit exactly 4.0 and the shuffle
        # deadlocks
        num_cpus=0.9,
    )


def extract_documents(ds, config: ExtractConfig | None = None):
    """Interleaved docs Dataset → reassembled documents (DOC_OUT_SCHEMA)."""
    config = config or ExtractConfig()
    return reassemble(
        extract_spans(ds, config), num_partitions=config.reassemble_partitions
    )


def extract_from_path(path: str, config: ExtractConfig | None = None):
    return extract_documents(io.read_interleaved(path), config)


def extract_table_cells(ds):
    """Side-channel structured extraction: every html span's <table>
    cells as flat rows (ops/htmlops.py:html_table_cells). Runs off the
    SAME interleaved Dataset as the main pipeline — callers wanting
    both outputs should materialize ``ds`` first so the source scan
    executes once:

        src = io.read_interleaved(path).materialize()
        docs  = extract_documents(src, cfg)
        cells = extract_table_cells(src)
    """
    from ocr_ray.ops.htmlops import html_table_cells

    return html_table_cells(ds)
