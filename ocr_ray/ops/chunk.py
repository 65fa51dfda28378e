"""Sliding-window document chunking — the standard prep step for LLM
training/embedding: split each document into overlapping fixed-size
token windows.

Semantics (shared verbatim with the DuckDB oracle): tokens are the
``\\S+`` runs of the raw text; windows start at multiples of ``stride``
below the token count and span ``chunk_tokens`` tokens (the last window
may be shorter); the chunk text is the window joined with single
spaces; zero-token documents emit no chunks.

Scale design: a stateless ``flat_map``-shaped ``map_batches`` stage —
each input block expands independently (no shuffle), so output blocks
stay bounded by ``batch_size × chunks_per_doc`` and stream straight
into the next stage or sink.
"""
from __future__ import annotations

import functools

import pyarrow as pa

DEFAULT_CHUNK_TOKENS = 64
DEFAULT_STRIDE = 32


def _chunk_batch(
    batch: pa.Table, *, chunk_tokens: int, stride: int
) -> pa.Table:
    out_id, out_idx, out_text, out_n = [], [], [], []
    ids = batch.column("doc_id").to_pylist()
    for doc_id, text in zip(ids, batch.column("text").to_pylist()):
        toks = (text or "").split()
        n = len(toks)
        for idx, start in enumerate(range(0, n, stride)):
            window = toks[start:start + chunk_tokens]
            out_id.append(doc_id)
            out_idx.append(idx)
            out_text.append(" ".join(window))
            out_n.append(len(window))
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "chunk_idx": pa.array(out_idx, pa.int64()),
            "chunk_text": pa.array(out_text, pa.string()),
            "n_tokens": pa.array(out_n, pa.int64()),
        }
    )


def chunk_documents(
    docs,
    *,
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
    stride: int = DEFAULT_STRIDE,
):
    """(doc_id, text) → one row per sliding window:
    (doc_id, chunk_idx, chunk_text, n_tokens)."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    return docs.map_batches(
        functools.partial(
            _chunk_batch, chunk_tokens=chunk_tokens, stride=stride
        ),
        batch_format="pyarrow",
    )


def oracle_sql(
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS, stride: int = DEFAULT_STRIDE
) -> str:
    """DuckDB equivalent: list-slice the \\S+ token array at the same
    window starts (1-based inclusive slices)."""
    return (
        "WITH toks AS (\n"
        " SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\\S+') AS t\n"
        " FROM documents\n"
        "), starts AS (\n"
        f" SELECT doc_id, t, unnest(range(0, len(t), {stride})) AS start\n"
        " FROM toks WHERE len(t) > 0\n"
        ")\n"
        "SELECT doc_id,\n"
        f" CAST(start / {stride} AS BIGINT) AS chunk_idx,\n"
        f" array_to_string(t[start + 1 : LEAST(start + {chunk_tokens}, len(t))], ' ') AS chunk_text,\n"
        f" CAST(LEAST(start + {chunk_tokens}, len(t)) - start AS BIGINT) AS n_tokens\n"
        "FROM starts"
    )
