"""Benchmark decontamination — measure n-gram overlap between every
corpus document and a (small) benchmark/eval set, the standard
pre-training hygiene pass.

Semantics (shared verbatim with the DuckDB oracle): shingles are
``k``-token windows (``\\S+`` tokens of the lowercased text, joined by
single spaces, every start offset); a document's contamination count is
the number of its DISTINCT shingles that appear anywhere in the
benchmark set; ``n_shingles`` is its distinct-shingle total. Documents
with fewer than ``k`` tokens have zero shingles and report 0/0.

Scale design: the benchmark side is SMALL by definition (an eval set),
so it is collected once, deduplicated, shipped to the object store with
one ``ray.put``, and read by every scoring task — membership is a set
probe per distinct shingle, with NO shuffle and no join; the corpus
streams through a single stateless ``map_batches``. The benchmark
shingle set is built distributed (map_batches over the benchmark docs)
before the driver collects the deduplicated result.
"""
from __future__ import annotations

import functools

import pyarrow as pa

DEFAULT_K = 8


def _shingles(text: str, k: int) -> list[str]:
    toks = (text or "").lower().split()
    return [
        " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)
    ]


def _shingle_batch(batch: pa.Table, *, k: int) -> pa.Table:
    out = set()
    for text in batch.column("text").to_pylist():
        out.update(_shingles(text, k))
    return pa.table({"shingle": pa.array(sorted(out), pa.string())})


def benchmark_shingle_set(benchmark_docs, *, k: int = DEFAULT_K):
    """Distinct k-token shingles of the benchmark set, as a Python
    frozenset. Collects ONLY the deduplicated shingle strings (the
    benchmark is small by definition); dedup happens per batch first,
    then globally on the collected column."""
    parts = benchmark_docs.map_batches(
        functools.partial(_shingle_batch, k=k), batch_format="pyarrow"
    )
    return frozenset(
        r["shingle"] for r in parts.take_all()
    )


class _ContaminationScorer:
    """Actor stage: the benchmark set is fetched from the object store
    ONCE per actor in ``__init__`` (zero-copy plasma read), never
    re-shipped per batch — the broadcast-small-side pattern."""

    def __init__(self, bench_ref, k: int):
        import ray

        self.bench = ray.get(bench_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        n_sh, n_hit = [], []
        for text in batch.column("text").to_pylist():
            sh = set(_shingles(text, self.k))
            n_sh.append(len(sh))
            n_hit.append(sum(1 for s in sh if s in self.bench))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_shingles": pa.array(n_sh, pa.int64()),
                "n_contaminated": pa.array(n_hit, pa.int64()),
            }
        )


def contamination_counts(
    docs, benchmark_shingles, *, k: int = DEFAULT_K, concurrency=(1, 8)
):
    """(doc_id, text) → (doc_id, n_shingles, n_contaminated):
    distinct-shingle totals and hits against the broadcast benchmark
    set. ``benchmark_shingles`` may be a frozenset or a Ray ObjectRef
    to one (``ray.put`` once; each actor reads it from the object
    store in ``__init__``)."""
    import ray

    ref = (
        benchmark_shingles
        if isinstance(benchmark_shingles, ray.ObjectRef)
        else ray.put(frozenset(benchmark_shingles))
    )
    return docs.map_batches(
        _ContaminationScorer,
        fn_constructor_kwargs={"bench_ref": ref, "k": k},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def decontaminate_report(docs, benchmark_docs, *, k: int = DEFAULT_K):
    """End-to-end: build the benchmark shingle set (distributed dedup,
    one driver collect of the small result, one ray.put) and score
    every document against it."""
    bench = benchmark_shingle_set(benchmark_docs, k=k)
    return contamination_counts(docs, bench, k=k)


# ----------------------------------------- duplicate n-gram coverage


def _dup_shingle_rows_factory(k: int):
    def rows(batch: pa.Table) -> pa.Table:
        import numpy as np

        from ocr_ray.ops.dedup import _md5_hash64

        hs, ids = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            # set-of-hashes (not set-of-shingles then hash): dedup at
            # the hash level mirrors the oracle's DISTINCT (doc, hi, lo)
            # so even an md5 collision produces identical output
            hset = {_md5_hash64(s) for s in _shingles(text, k)}
            hs.extend(hset)
            ids.extend([doc_id] * len(hset))
        return pa.table(
            {
                "h": pa.array(np.array(hs, dtype=np.uint64), pa.uint64()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    return rows


def _df_flag_block(block: pa.Table, starts) -> pa.Table:
    """Per shingle-hash group (rows already distinct per doc), df is
    simply the group size; emit (doc_id, dup∈{0,1}) — one vectorized
    repeat per block, no Python per group."""
    import numpy as np

    n = block.num_rows
    if n == 0 or len(starts) == 0:
        empty = pa.array(np.empty(0, np.int64), pa.int64())
        return pa.table({"doc_id": empty, "dup": empty})
    sizes = np.diff(np.append(starts, n))
    dup = np.repeat((sizes >= 2).astype(np.int64), sizes)
    return pa.table(
        {
            "doc_id": block.column("doc_id"),
            "dup": pa.array(dup, pa.int64()),
        }
    )


def dup_ngram_coverage(docs, *, k: int = DEFAULT_K):
    """RefinedWeb-style cross-document duplicate n-gram coverage: for
    every document, how many of its distinct ``k``-token shingles occur
    in at least one OTHER document (corpus document frequency ≥ 2), and
    the fraction of its shingle set that mass represents — the standard
    "document is mostly boilerplate shared with the rest of the crawl"
    curation signal.

    Scale design: documents never shuffle. One stateless map explodes
    each doc into slim distinct ``(md5-hash64, doc_id)`` rows (16
    bytes/shingle); a hash partition on the shingle hash co-locates
    equal shingles so df is the group size (no df table, no big-big
    join — the flag is computed inside the partitioned block); a keyed
    aggregate rolls the flags back up per doc; a LEFT OUTER join against
    the doc-id spine restores zero-shingle docs. Two shuffles of derived
    slim rows total.
    """
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from ocr_ray.ops.joins import large_join
    from ocr_ray.stages.grouped import grouped_map

    rows = docs.map_batches(
        _dup_shingle_rows_factory(k), batch_format="pyarrow"
    )
    flags = grouped_map(rows, ["h"], _df_flag_block)
    per_doc = (
        flags.groupby("doc_id")
        .aggregate(
            Count(alias_name="n_shingles"),
            Sum("dup", alias_name="n_dup_shingles"),
        )
    )
    spine = docs.select_columns(["doc_id"])
    joined = large_join(
        spine, per_doc, on="doc_id", join_type="left_outer"
    )

    def finish(t: pa.Table) -> pa.Table:
        n_sh = pc.fill_null(t.column("n_shingles"), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_dup = pc.fill_null(t.column("n_dup_shingles"), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        safe = np.maximum(n_sh, 1).astype(np.float64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_shingles": pa.array(n_sh, pa.int64()),
                "n_dup_shingles": pa.array(n_dup, pa.int64()),
                "dup_shingle_frac": pa.array(
                    n_dup.astype(np.float64) / safe, pa.float64()
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def dup_ngram_coverage_sql(k: int = DEFAULT_K) -> str:
    """DuckDB equivalent — identical shingle definition, identical
    md5-halves hash grouping, identical GREATEST-guarded division."""
    return (
        "WITH toks AS (\n"
        " SELECT doc_id, regexp_extract_all(lower(COALESCE(text, '')), '\\S+') AS t\n"
        " FROM documents\n"
        "), sh AS (\n"
        " SELECT DISTINCT doc_id,\n"
        f"  array_to_string(t[s + 1 : s + {k}], ' ') AS shingle\n"
        f" FROM (SELECT doc_id, t, unnest(range(0, len(t) - {k} + 1)) AS s\n"
        f"       FROM toks WHERE len(t) >= {k})\n"
        "), hs AS (\n"
        " SELECT DISTINCT doc_id,\n"
        "  ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS hi,\n"
        "  ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS lo\n"
        " FROM sh\n"
        "), df AS (\n"
        " SELECT hi, lo, COUNT(*) AS df FROM hs GROUP BY hi, lo\n"
        "), per AS (\n"
        " SELECT hs.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,\n"
        "  CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_dup\n"
        " FROM hs JOIN df USING (hi, lo) GROUP BY hs.doc_id\n"
        ")\n"
        "SELECT d.doc_id,\n"
        " COALESCE(per.n_shingles, 0) AS n_shingles,\n"
        " COALESCE(per.n_dup, 0) AS n_dup_shingles,\n"
        " CAST(COALESCE(per.n_dup, 0) AS DOUBLE)"
        " / CAST(GREATEST(COALESCE(per.n_shingles, 0), 1) AS DOUBLE)"
        " AS dup_shingle_frac\n"
        "FROM documents d LEFT JOIN per USING (doc_id)"
    )


def oracle_sql(k: int = DEFAULT_K, benchmark_pred: str = "doc_id % 50 = 0") -> str:
    """DuckDB equivalent: distinct shingles per doc LEFT-semi-counted
    against the distinct benchmark shingle set."""
    shingle_cte = (
        "WITH toks AS (\n"
        " SELECT doc_id, regexp_extract_all(lower(COALESCE(text, '')), '\\S+') AS t\n"
        " FROM documents\n"
        "), sh AS (\n"
        " SELECT DISTINCT doc_id,\n"
        f"  array_to_string(t[s + 1 : s + {k}], ' ') AS shingle\n"
        f" FROM (SELECT doc_id, t, unnest(range(0, len(t) - {k} + 1)) AS s\n"
        f"       FROM toks WHERE len(t) >= {k})\n"
        "), bench AS (\n"
        f" SELECT DISTINCT shingle FROM sh WHERE {benchmark_pred}\n"
        ")\n"
    )
    return (
        shingle_cte
        + "SELECT d.doc_id,\n"
        " CAST(COALESCE(s.n_shingles, 0) AS BIGINT) AS n_shingles,\n"
        " CAST(COALESCE(s.n_contaminated, 0) AS BIGINT) AS n_contaminated\n"
        "FROM documents d LEFT JOIN (\n"
        " SELECT doc_id, COUNT(*) AS n_shingles,\n"
        "  SUM(CASE WHEN shingle IN (SELECT shingle FROM bench)\n"
        "      THEN 1 ELSE 0 END) AS n_contaminated\n"
        " FROM sh GROUP BY doc_id\n"
        ") s USING (doc_id)"
    )
