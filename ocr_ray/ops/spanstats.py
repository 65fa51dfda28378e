"""Span-level statistics over the interleaved text+media docs table —
the north-star input shape (doc_id, spans:list<struct<kind, text,
media_ref, offset>>).

- ``doc_span_profile``: per-doc per-kind span counts and text volume —
  the media-density profile the skew-aware splitter consults when
  deciding which oversized media-heavy documents to split before the
  OCR actor pool (reference analogue: the per-request page/size
  accounting in ocr_history used for worker sizing).
- ``span_kind_stats``: the global per-kind rollup (spans, docs, chars).

Both are integer-exact. The profile is a PURE map (a document is one
row of the interleaved table, so no group ever crosses a batch — zero
shuffle); the rollup shuffles only (kind, partial) rows.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PROFILE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("kind", pa.string()),
        ("n_spans", pa.int64()),
        ("sum_chars", pa.int64()),
    ]
)

_KIND_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("n_spans", pa.int64()),
        ("n_docs", pa.int64()),
        ("sum_chars", pa.int64()),
    ]
)


def _profile_batch(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _PROFILE_SCHEMA.empty_table()
    spans = t.column("spans").combine_chunks()
    if isinstance(spans, pa.ChunkedArray):  # zero-chunk edge
        spans = pa.concat_arrays(spans.chunks or [pa.array([], spans.type)])
    lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    flat = spans.flatten()
    kind = flat.field("kind")
    chars = pc.coalesce(
        pc.utf8_length(flat.field("text")).cast(pa.int64()), pa.scalar(0)
    ).to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(t.num_rows, dtype=np.int64), lengths)
    # dictionary-encode kinds to small ints for the composite group key
    kind_dict = pc.dictionary_encode(kind)
    codes = kind_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    kinds_uniq = kind_dict.dictionary.to_pylist()
    key = parent * max(len(kinds_uniq), 1) + codes
    if len(key) == 0:
        return _PROFILE_SCHEMA.empty_table()
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
    seg_first = order[starts]
    n_spans = np.diff(np.r_[starts, len(key_s)])
    sum_chars = np.add.reduceat(chars[order], starts)
    return pa.table(
        {
            "doc_id": t.column("doc_id").take(pa.array(parent[seg_first])),
            "kind": kind.take(pa.array(seg_first)),
            "n_spans": pa.array(n_spans, pa.int64()),
            "sum_chars": pa.array(sum_chars, pa.int64()),
        }
    )


def doc_span_profile(interleaved):
    """(doc_id, kind, n_spans, sum_chars) per document × span kind —
    zero shuffle (a doc is one input row)."""
    return interleaved.map_batches(_profile_batch, batch_format="pyarrow")


def span_kind_stats(interleaved):
    """(kind, n_spans, n_docs, sum_chars) global rollup; n_docs is exact
    (one profile row per doc × kind by construction)."""
    from ray.data.aggregate import Count, Sum

    from ocr_ray.ops.dedup import _with_schema

    prof = doc_span_profile(interleaved)
    return _with_schema(
        prof.groupby("kind").aggregate(
            Sum("n_spans", alias_name="n_spans"),
            Count(alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
        ).select_columns(["kind", "n_spans", "n_docs", "sum_chars"]),
        _KIND_SCHEMA,
    ).sort("kind")


def doc_span_profile_sql(parquet_glob: str) -> str:
    return (
        "WITH s AS (SELECT doc_id, unnest(spans) AS sp"
        f" FROM read_parquet('{parquet_glob}'))\n"
        "SELECT doc_id, sp.kind AS kind,"
        " CAST(COUNT(*) AS BIGINT) AS n_spans,\n"
        " CAST(SUM(coalesce(length(sp.text), 0)) AS BIGINT) AS sum_chars\n"
        "FROM s GROUP BY doc_id, sp.kind"
    )


def span_kind_stats_sql(parquet_glob: str) -> str:
    return (
        "WITH s AS (SELECT doc_id, unnest(spans) AS sp"
        f" FROM read_parquet('{parquet_glob}'))\n"
        "SELECT sp.kind AS kind, CAST(COUNT(*) AS BIGINT) AS n_spans,\n"
        " CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,\n"
        " CAST(SUM(coalesce(length(sp.text), 0)) AS BIGINT) AS sum_chars\n"
        "FROM s GROUP BY sp.kind ORDER BY kind"
    )
