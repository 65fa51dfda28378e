"""Corpus-statistic language scoring — the aggregate→join→score shape a
training-data pipeline uses to score documents against a model FITTED ON
THE CORPUS ITSELF (here: a bigram frequency table; the same plumbing
serves KenLM-style fluency filters at scale).

``bigram_familiarity``: per document, the number of adjacent token
pairs and the sum of each pair's corpus-wide occurrence count. Two
shuffles of slim derived rows: (bigram → count) aggregate, then a
hash-partitioned big-big join of the doc's pair rows against that
table, then a keyed sum per doc. Integer-exact end to end (counts, no
log-space floats), so the DuckDB oracle reproduces it bit-for-bit —
a real-valued log-prob variant would hit cross-engine libm/accumulation
-order drift, documented trade-off.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocr_ray.ops.analysis import _WORD_RE


def _pair_rows(batch: pa.Table) -> pa.Table:
    ids_out: list[int] = []
    grams: list[str] = []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        ws = _WORD_RE.findall((text or "").lower())
        for i in range(len(ws) - 1):
            ids_out.append(doc_id)
            grams.append(ws[i] + " " + ws[i + 1])
    return pa.table(
        {
            "doc_id": pa.array(ids_out, pa.int64()),
            "bigram": pa.array(grams, pa.string()),
        }
    )


def bigram_familiarity(docs):
    """(doc_id, n_pairs, familiarity): familiarity = Σ corpus count of
    each adjacent token pair; docs with fewer than 2 tokens emit no
    pairs and are absent (matches the SQL join semantics)."""
    from ray.data.aggregate import Count, Sum

    from ocr_ray.ops.joins import large_join

    pairs = docs.map_batches(_pair_rows, batch_format="pyarrow")
    model = pairs.groupby("bigram").aggregate(Count(alias_name="c"))
    # pairs re-derives from the same lineage on the other side of the
    # join; both sides stream through the hash shuffle
    joined = large_join(
        docs.map_batches(_pair_rows, batch_format="pyarrow"),
        model.select_columns(["bigram", "c"]),
        on="bigram",
    )

    def partials(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        cs = t["c"].to_numpy(zero_copy_only=False)
        ids_u, inv = np.unique(ids, return_inverse=True)
        return pa.table(
            {
                "doc_id": pa.array(ids_u, pa.int64()),
                "n_pairs": pa.array(np.bincount(inv), pa.int64()),
                "familiarity": pa.array(
                    np.bincount(inv, weights=cs).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        joined.map_batches(partials, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_pairs", alias_name="n_pairs"),
            Sum("familiarity", alias_name="familiarity"),
        )
    )
