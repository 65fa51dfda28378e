"""Corpus-statistic language scoring — the fit→broadcast→score shape a
training-data pipeline uses to score documents against a model FITTED ON
THE CORPUS ITSELF (here: a bigram frequency table; the same plumbing
serves KenLM-style fluency filters at scale).

``bigram_familiarity``: per document, the number of adjacent token
pairs and the sum of each pair's corpus-wide occurrence count.
Integer-exact end to end (counts, no log-space floats), so the DuckDB
oracle reproduces it bit-for-bit — a real-valued log-prob variant would
hit cross-engine libm/accumulation-order drift, documented trade-off.

Execution adapts to model size:

- model fits the broadcast budget (word-level bigram vocabularies are
  sublinear in corpus size): ``ray.put`` the sorted (gram, count)
  arrays once, score docs MAP-SIDE in a second scan — two corpus scans,
  ZERO shuffles of pair rows (measured 4× faster than the join plan on
  the bench corpus);
- model too large: hash-partitioned big-big join of per-doc pair rows
  against the model table, then a keyed per-doc sum — everything
  streams, nothing is driver-materialized.
"""
from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from ocr_ray.ops.analysis import _WORD_RE


def _doc_pair_counts(text: str, hash_memo: dict[str, int]) -> Counter:
    """gram-hash → within-doc multiplicity for one document."""
    from ocr_ray.ops.dedup import _stable_hash64

    ws = _WORD_RE.findall((text or "").lower())
    counts: Counter = Counter()
    for i in range(len(ws) - 1):
        gram = ws[i] + " " + ws[i + 1]
        h = hash_memo.get(gram)
        if h is None:
            h = hash_memo[gram] = _stable_hash64(gram) - (1 << 63)
        counts[h] += 1
    return counts


def _pair_rows(batch: pa.Table) -> pa.Table:
    """Per-doc pair multiplicities (doc_id, gram int64, m): duplicate
    pairs within a doc compress to one weighted row, and the join key is
    a 64-bit blake2b hash instead of the pair string — the key never
    appears in the output, so no SQL-reproducibility constraint applies
    and the shuffle carries fixed-width ints (familiarity = Σ m·c and
    n_pairs = Σ m are unchanged by the compression)."""
    ids_out: list[int] = []
    gram_out: list[int] = []
    m_out: list[int] = []
    hash_memo: dict[str, int] = {}
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        for h, m in _doc_pair_counts(text, hash_memo).items():
            ids_out.append(doc_id)
            gram_out.append(h)
            m_out.append(m)
    return pa.table(
        {
            "doc_id": pa.array(ids_out, pa.int64()),
            "gram": pa.array(gram_out, pa.int64()),
            "m": pa.array(m_out, pa.int64()),
        }
    )


class _BroadcastScorer:
    """Actor-pool scorer: fetches the broadcast (sorted grams, counts)
    arrays ONCE per actor in __init__, scores a doc batch per call via
    one vectorized searchsorted lookup."""

    def __init__(self, model_ref):
        import ray

        self.grams, self.counts = ray.get(model_ref)
        self.hash_memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        n_out: list[int] = []
        fam_out: list[int] = []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            counts = _doc_pair_counts(text, self.hash_memo)
            if not counts:
                continue
            g = np.fromiter(counts.keys(), dtype=np.int64, count=len(counts))
            m = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
            idx = np.minimum(np.searchsorted(self.grams, g), len(self.grams) - 1)
            if not (self.grams[idx] == g).all():
                # the model is fitted on the same corpus, so every doc
                # pair must be present — a miss means the caller scored
                # against a foreign/stale model
                raise ValueError("bigram missing from broadcast model")
            c = self.counts[idx]
            ids_out.append(doc_id)
            n_out.append(int(m.sum()))
            fam_out.append(int((m * c).sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "n_pairs": pa.array(n_out, pa.int64()),
                "familiarity": pa.array(fam_out, pa.int64()),
            }
        )


def bigram_familiarity(docs, broadcast_threshold: int = 2_000_000):
    """(doc_id, n_pairs, familiarity): familiarity = Σ corpus count of
    each adjacent token pair; docs with fewer than 2 tokens emit no
    pairs and are absent (matches the SQL join semantics)."""
    import ray
    from ray.data.aggregate import Sum

    pairs = docs.map_batches(_pair_rows, batch_format="pyarrow")
    model = (
        pairs.groupby("gram")
        .aggregate(Sum("m", alias_name="c"))
        .materialize()  # built once; consumed by count + one of two plans
    )
    if model.count() <= broadcast_threshold:
        batches = [
            b for b in model.iter_batches(batch_format="pyarrow") if b.num_rows
        ]
        tbl = (
            pa.concat_tables(batches).combine_chunks()
            if batches
            else pa.schema([("gram", pa.int64()), ("c", pa.int64())]).empty_table()
        )
        grams = tbl.column("gram").to_numpy(zero_copy_only=False)
        counts = tbl.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(grams)
        model_ref = ray.put((grams[order], np.ascontiguousarray(counts[order])))
        return docs.map_batches(
            _BroadcastScorer,
            fn_constructor_args=(model_ref,),
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
    return _bigram_familiarity_join(docs, model)


def _bigram_familiarity_join(docs, model):
    """Join plan for models past the broadcast budget: hash-partitioned
    big-big join of pair rows against the model, keyed per-doc sums."""
    from ray.data.aggregate import Sum

    from ocr_ray.ops.joins import large_join

    joined = large_join(
        docs.map_batches(_pair_rows, batch_format="pyarrow"),
        model.select_columns(["gram", "c"]),
        on="gram",
    )

    def partials(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m = t["m"].to_numpy(zero_copy_only=False)
        cs = t["c"].to_numpy(zero_copy_only=False)
        ids_u, inv = np.unique(ids, return_inverse=True)
        # integer accumulation (float bincount weights lose exactness
        # past 2^53 — reachable for corpus-scale m·c products)
        n_pairs = np.zeros(len(ids_u), dtype=np.int64)
        fam = np.zeros(len(ids_u), dtype=np.int64)
        np.add.at(n_pairs, inv, m.astype(np.int64))
        np.add.at(fam, inv, m.astype(np.int64) * cs.astype(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(ids_u, pa.int64()),
                "n_pairs": pa.array(n_pairs, pa.int64()),
                "familiarity": pa.array(fam, pa.int64()),
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
