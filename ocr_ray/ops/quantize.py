"""Scalar quantization (SQ8) of an embedding column — the standard
vector-index compression step (FAISS ``SQ8`` / Milvus ``SQ8``): each
dimension is affinely mapped onto uint8 codes using GLOBAL per-dimension
min/max, cutting vector bytes 4× before an ANN index is built.

Two phases, both streaming:

1. **Train** — per-batch dimension-wise min/max partials (D-row
   tables), reduced with a tiny keyed aggregate (D groups — 64 here),
   and one bounded driver collect of the D-row result. At 100 TB this
   is the canonical "train the quantizer on a pass, broadcast the
   codebook" shape: the codebook is D×2 floats shipped once via the
   task closure, never per batch.
2. **Encode + audit** — a stateless vectorized map quantizes every
   value and emits per-label integer partials; a keyed aggregate rolls
   them up. The audit surface is integer-exact (code sums, squared
   sums, saturation counts), so the oracle comparison is bit-for-bit —
   no float tolerance anywhere.

Code rule (shared token-for-token with :func:`sq8_code_stats_sql`):
``code = min(floor(((x - mn) * 255.0) / (mx - mn)), 255)`` in float64,
``0`` when the dimension is constant (``mx == mn``). The explicit
multiply-then-divide ordering makes numpy and DuckDB produce identical
IEEE-754 doubles, hence identical floors.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ocr_ray.ops.similarity import _batch_matrix


def _minmax_partials(batch: pa.Table) -> pa.Table:
    e = pa.table(
        {
            "dim": pa.array([], pa.int64()),
            "mn": pa.array([], pa.float64()),
            "mx": pa.array([], pa.float64()),
        }
    )
    if batch.num_rows == 0:
        return e
    m = _batch_matrix(batch)
    return pa.table(
        {
            "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
            "mn": pa.array(m.min(axis=0)),
            "mx": pa.array(m.max(axis=0)),
        }
    )


def train_sq8(embeddings) -> tuple[np.ndarray, np.ndarray]:
    """One pass over the embedding column → (mn, mx) float64 vectors.
    The driver collect is D rows — bounded by the embedding
    dimensionality, independent of the table size."""
    from ray.data.aggregate import Max, Min

    parts = embeddings.map_batches(
        _minmax_partials, batch_format="pyarrow"
    )
    agg = parts.groupby("dim").aggregate(
        Min("mn", alias_name="mn"), Max("mx", alias_name="mx")
    )
    rows = sorted(agg.take_all(), key=lambda r: r["dim"])
    mn = np.array([r["mn"] for r in rows], dtype=np.float64)
    mx = np.array([r["mx"] for r in rows], dtype=np.float64)
    return mn, mx


def _encode(m: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    span = mx - mn
    with np.errstate(divide="ignore", invalid="ignore"):
        raw = np.floor(((m - mn) * 255.0) / span)
    codes = np.minimum(raw, 255.0)
    codes = np.where(span == 0.0, 0.0, codes)
    return codes.astype(np.int64)


def sq8_code_stats(embeddings_with_label):
    """Integer-exact per-label audit of the SQ8 code distribution:
    (label, n_vecs, n_values, sum_code, sum_code_sq, n_lo, n_hi).
    ``n_lo``/``n_hi`` count saturated codes (0 / 255) — the quantizer
    health signal (a dimension dominated by outliers saturates)."""
    from ray.data.aggregate import Sum

    mn, mx = train_sq8(embeddings_with_label)

    def partials(batch: pa.Table) -> pa.Table:
        e64 = pa.array([], pa.int64())
        if batch.num_rows == 0:
            return pa.table(
                {
                    "label": batch.column("label").slice(0, 0)
                    if "label" in batch.column_names
                    else pa.array([], pa.string()),
                    "n_vecs": e64,
                    "n_values": e64,
                    "sum_code": e64,
                    "sum_code_sq": e64,
                    "n_lo": e64,
                    "n_hi": e64,
                }
            )
        m = _batch_matrix(batch)
        codes = _encode(m, mn, mx)
        t = pa.table(
            {
                "label": batch.column("label"),
                "n_vecs": pa.array(np.ones(len(m), np.int64)),
                "n_values": pa.array(
                    np.full(len(m), m.shape[1], np.int64)
                ),
                "sum_code": pa.array(codes.sum(axis=1)),
                "sum_code_sq": pa.array((codes * codes).sum(axis=1)),
                "n_lo": pa.array((codes == 0).sum(axis=1).astype(np.int64)),
                "n_hi": pa.array(
                    (codes == 255).sum(axis=1).astype(np.int64)
                ),
            }
        )
        g = t.group_by(["label"]).aggregate(
            [
                ("n_vecs", "sum"),
                ("n_values", "sum"),
                ("sum_code", "sum"),
                ("sum_code_sq", "sum"),
                ("n_lo", "sum"),
                ("n_hi", "sum"),
            ]
        )
        return g.rename_columns(
            [
                "label",
                "n_vecs",
                "n_values",
                "sum_code",
                "sum_code_sq",
                "n_lo",
                "n_hi",
            ]
        )

    parts = embeddings_with_label.map_batches(
        partials, batch_format="pyarrow"
    )
    return parts.groupby("label").aggregate(
        Sum("n_vecs", alias_name="n_vecs"),
        Sum("n_values", alias_name="n_values"),
        Sum("sum_code", alias_name="sum_code"),
        Sum("sum_code_sq", alias_name="sum_code_sq"),
        Sum("n_lo", alias_name="n_lo"),
        Sum("n_hi", alias_name="n_hi"),
    )


def sq8_code_stats_sql() -> str:
    """DuckDB equivalent — identical code rule in DOUBLE arithmetic
    with the same multiply-then-divide ordering."""
    return (
        "WITH u AS (\n"
        " SELECT label, generate_subscripts(embedding, 1) AS dim,\n"
        "  CAST(unnest(embedding) AS DOUBLE) AS x\n"
        " FROM embeddings\n"
        "), mm AS (\n"
        " SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM u GROUP BY dim\n"
        "), q AS (\n"
        " SELECT label,\n"
        "  CASE WHEN mx = mn THEN 0\n"
        "   ELSE LEAST(CAST(FLOOR(((x - mn) * 255.0) / (mx - mn))"
        " AS BIGINT), 255) END AS code\n"
        " FROM u JOIN mm USING (dim)\n"
        "), v AS (\n"
        " SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs\n"
        " FROM embeddings GROUP BY label\n"
        ")\n"
        "SELECT CAST(q.label AS BIGINT) AS label, v.n_vecs,\n"
        " CAST(COUNT(*) AS BIGINT) AS n_values,\n"
        " CAST(SUM(code) AS BIGINT) AS sum_code,\n"
        " CAST(SUM(code * code) AS BIGINT) AS sum_code_sq,\n"
        " CAST(SUM(CASE WHEN code = 0 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_lo,\n"
        " CAST(SUM(CASE WHEN code = 255 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_hi\n"
        "FROM q JOIN v USING (label)\n"
        "GROUP BY q.label, v.n_vecs ORDER BY q.label"
    )
