"""Change-data-capture between two corpus snapshots — the incremental-
crawl refresh primitive: at 100 TB you never reprocess the whole corpus,
you diff the new snapshot against the old one and feed only the delta
into the dedup/extraction pipelines.

``corpus_diff`` classifies every doc_id as added / removed / changed by
content fingerprint (the same normalized-md5 fingerprint exact dedup
uses, so the DuckDB oracle reproduces it verbatim). Unchanged docs emit
NO row — output is proportional to the change volume, not the corpus.

Scale shape: both snapshots collapse map-side to slim (doc_id,
fingerprint) rows (32-hex string + int per doc), then ONE full-outer
hash join at doc_id grain classifies; nothing else moves.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_DIFF_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("status", pa.string())]
)


def corpus_diff(docs_a, docs_b):
    """(doc_id, status) for every doc that differs between snapshot A
    (old) and snapshot B (new): 'added' = only in B, 'removed' = only
    in A, 'changed' = both but different normalized content."""
    from ocr_ray.ops.dedup import _hash_batch, _renamed, _with_schema
    from ocr_ray.ops.joins import large_join

    fp_schema = pa.schema(
        [("fingerprint", pa.string()), ("doc_id", pa.int64())]
    )

    def hashed(ds):
        def fix(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return fp_schema.empty_table()
            h = _hash_batch(t)
            return pa.table(
                {
                    "fingerprint": h.column("fingerprint"),
                    "doc_id": h.column("doc_id").cast(pa.int64()),
                }
            )

        return _with_schema(
            ds.map_batches(fix, batch_format="pyarrow"), fp_schema
        )

    # materialize the slim fp manifests once: they are exactly the
    # per-snapshot manifest a production CDC keeps anyway, the join
    # consumes them without re-hashing the corpora, and an all-empty
    # side (new corpus / total wipe) can branch to the trivial answer —
    # Ray's native hash join crashes on a zero-block side
    a = hashed(docs_a).materialize()
    b = _renamed(hashed(docs_b), {"fingerprint": "fp_b"}).materialize()

    def _const_status(ds, col: str, status: str):
        def mk(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return _DIFF_SCHEMA.empty_table()
            return pa.table(
                {
                    "doc_id": t.column("doc_id").cast(pa.int64()),
                    "status": pa.array([status] * t.num_rows, pa.string()),
                }
            )

        return _with_schema(
            ds.map_batches(mk, batch_format="pyarrow"), _DIFF_SCHEMA
        ).sort("doc_id")

    if b.count() == 0:
        return _const_status(a, "fingerprint", "removed")
    if a.count() == 0:
        return _const_status(b, "fp_b", "added")

    joined = large_join(a, b, on="doc_id", join_type="full_outer")

    def classify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _DIFF_SCHEMA.empty_table()
        fa = t.column("fingerprint")
        fb = t.column("fp_b")
        status = pc.if_else(
            pc.is_null(fa),
            pa.scalar("added"),
            pc.if_else(
                pc.is_null(fb),
                pa.scalar("removed"),
                pc.if_else(
                    pc.not_equal(fa, fb),
                    pa.scalar("changed"),
                    pa.scalar(None, pa.string()),
                ),
            ),
        )
        out = pa.table(
            {"doc_id": t.column("doc_id").cast(pa.int64()), "status": status}
        )
        return out.filter(pc.is_valid(out.column("status")))

    return _with_schema(
        joined.map_batches(classify, batch_format="pyarrow"), _DIFF_SCHEMA
    ).sort("doc_id")


def snapshot_v2(docs, changed_mod: int = 17, removed_mod: int = 23,
                added_mod: int = 29, added_offset: int = 1_000_000):
    """Deterministic synthetic 'next crawl' of a documents Dataset, used
    by the driver query so the diff has a SQL-reproducible ground truth:
    docs with doc_id % removed_mod == 0 vanish; of the survivors those
    with doc_id % changed_mod == 0 gain a ' rev2' suffix; those with
    doc_id % added_mod == 0 also spawn a clone at doc_id+added_offset
    with a ' clone' suffix."""

    def derive(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("text", pa.string())]
            ).empty_table()
        import numpy as np

        ids = t.column("doc_id").cast(pa.int64())
        ids_np = ids.to_numpy(zero_copy_only=False)
        kept_mask = pa.array(ids_np % removed_mod != 0)
        kept = pa.table({"doc_id": ids, "text": t.column("text")}).filter(
            kept_mask
        )
        k_ids = kept.column("doc_id")
        k_np = k_ids.to_numpy(zero_copy_only=False)
        changed = pa.array(k_np % changed_mod == 0)
        new_text = pc.if_else(
            changed,
            pc.binary_join_element_wise(kept.column("text"), " rev2", ""),
            kept.column("text"),
        )
        base = pa.table({"doc_id": k_ids, "text": new_text})
        clones_src = kept.filter(pa.array(k_np % added_mod == 0))
        clones = pa.table(
            {
                "doc_id": pc.add(
                    clones_src.column("doc_id"),
                    pa.scalar(added_offset, pa.int64()),
                ),
                "text": pc.binary_join_element_wise(
                    clones_src.column("text"), " clone", ""
                ),
            }
        )
        return pa.concat_tables([base, clones])

    return docs.map_batches(derive, batch_format="pyarrow")


def corpus_diff_sql(changed_mod: int = 17, removed_mod: int = 23,
                    added_mod: int = 29, added_offset: int = 1_000_000,
                    fp_sql: str | None = None) -> str:
    fp = fp_sql or "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
    return (
        "WITH a AS (\n"
        f" SELECT doc_id, {fp} AS fp FROM documents\n"
        "), b_src AS (\n"
        " SELECT doc_id,"
        f" CASE WHEN doc_id % {changed_mod} = 0 THEN text || ' rev2'"
        " ELSE text END AS text\n"
        f" FROM documents WHERE doc_id % {removed_mod} <> 0\n"
        " UNION ALL\n"
        f" SELECT doc_id + {added_offset}, text || ' clone'\n"
        f" FROM documents WHERE doc_id % {added_mod} = 0"
        f" AND doc_id % {removed_mod} <> 0\n"
        "), b AS (\n"
        f" SELECT doc_id, {fp} AS fp FROM b_src\n"
        ")\n"
        "SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,\n"
        " CASE WHEN a.doc_id IS NULL THEN 'added'\n"
        "      WHEN b.doc_id IS NULL THEN 'removed'\n"
        "      WHEN a.fp <> b.fp THEN 'changed' END AS status\n"
        "FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id\n"
        "WHERE (a.doc_id IS NULL OR b.doc_id IS NULL OR a.fp <> b.fp)\n"
        "ORDER BY doc_id"
    )
