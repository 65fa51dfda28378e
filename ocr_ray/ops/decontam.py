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
