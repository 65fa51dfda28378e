"""Segment-level exact dedup — the C4/RefinedWeb "line dedup" family.

Web-pipeline curation removes the *unit of boilerplate* — a line, a
paragraph, a nav bar — that repeats across many pages, rather than the
whole document. The operator here is that rule over a pluggable
segmenter: a document is split into consecutive segments, a segment
that occurs in ``min_docs`` or more DISTINCT documents is "hot"
(global boilerplate), and every occurrence of a hot segment is removed
from every document. Two surfaces:

- :func:`hot_segments` — the global boilerplate inventory
  ``(segment, n_docs, n_occurrences)``.
- :func:`segment_dedup_stats` — the per-document removal report
  ``(doc_id, n_segments, n_hot_segments, n_kept_words)``.

On a real crawl the segmenter is ``text.split("\\n")``; the synthetic
corpus is single-line word soup, so the default segmenter is
consecutive non-overlapping ``width``-word windows — the same rule at
a granularity where the corpus actually has cross-document repeats
(its duplicate/near-duplicate documents). The segmenter is shared with
the SQL oracle (:func:`hot_segments_sql`) token-for-token.

Scale design (the C4 line-dedup shuffle): documents never shuffle.
One stateless vectorized map explodes each document into slim
``(segment, doc_id, cnt, n_words)`` rows — collapsed per (doc,
segment) inside the batch so repeated segments within a document ship
once; a hash partition on ``segment`` co-locates equal segments, so
document frequency is simply the group size and the hot flag is
computed inside the partitioned block (no df table, no broadcast of an
unbounded hot set, no big-big join); the stats surface then rolls the
flagged rows back up with a keyed aggregate on ``doc_id``. Two
shuffles of derived slim rows total, each bounded by the corpus token
count — at 100 TB you would additionally key the first shuffle by a
128-bit segment hash instead of the string to cut shuffle bytes
(identical semantics modulo 2^-128 collisions; the string key is kept
here so the result is bit-identical to the SQL oracle by construction).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_WIDTH = 12
DEFAULT_MIN_DOCS = 2


def _segment_rows_factory(width: int):
    """Vectorized segmenter: batch of (doc_id, text) → per-(doc,
    segment) partial rows (segment, doc_id, cnt, n_words). No Python
    loop over rows — split, window, and join are Arrow kernels; the
    window offsets are pure numpy index arithmetic."""

    def rows(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "segment": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        text = pc.fill_null(
            pc.cast(batch.column("text"), pa.string()), ""
        )
        words = pc.split_pattern(text, " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = np.diff(offs)  # ≥ 1 per doc: ''.split(' ') == ['']
        n_segs = (n_words + width - 1) // width
        total = int(n_segs.sum())
        doc_idx = np.repeat(np.arange(len(n_words), dtype=np.int64), n_segs)
        cum = np.concatenate(([0], np.cumsum(n_segs)))
        within = np.arange(total, dtype=np.int64) - cum[doc_idx]
        seg_words = (
            np.minimum((within + 1) * width, n_words[doc_idx])
            - within * width
        )
        seg_ends = offs[doc_idx] + within * width + seg_words
        seg_offsets = np.concatenate(([offs[0]], seg_ends))
        seg_list = pa.ListArray.from_arrays(
            pa.array(seg_offsets, pa.int32()), words.values
        )
        segments = pc.binary_join(seg_list, " ")
        doc_ids = pc.take(batch.column("doc_id"), pa.array(doc_idx))
        exploded = pa.table(
            {
                "segment": segments,
                "doc_id": doc_ids,
                "cnt": pa.array(np.ones(total, np.int64), pa.int64()),
                "n_words": pa.array(seg_words, pa.int64()),
            }
        )
        # collapse per (doc, segment): a segment repeated inside one
        # document ships as a single row with its occurrence count
        # (n_words is a function of the segment string — min == the value)
        collapsed = exploded.group_by(["doc_id", "segment"]).aggregate(
            [("cnt", "sum"), ("n_words", "min")]
        )
        # pyarrow names key columns first, aggregates as <col>_<fn>
        return collapsed.rename_columns(
            ["doc_id", "segment", "cnt", "n_words"]
        ).select(["segment", "doc_id", "cnt", "n_words"])

    return rows


def _hot_block_factory(min_docs: int):
    """Per segment group (rows already distinct per doc): df = group
    size; emit the inventory row for hot groups only."""

    def block(block_tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "segment": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "n_occurrences": pa.array([], pa.int64()),
            }
        )
        n = block_tbl.num_rows
        if n == 0 or len(starts) == 0:
            return empty
        sizes = np.diff(np.append(starts, n))
        cnt = block_tbl.column("cnt").to_numpy(zero_copy_only=False)
        occ = np.add.reduceat(cnt, starts)
        hot = sizes >= min_docs
        if not hot.any():
            return empty
        segs = pc.take(
            block_tbl.column("segment"), pa.array(starts[hot])
        )
        return pa.table(
            {
                "segment": segs,
                "n_docs": pa.array(sizes[hot], pa.int64()),
                "n_occurrences": pa.array(occ[hot], pa.int64()),
            }
        )

    return block


def hot_segments(
    docs, *, width: int = DEFAULT_WIDTH, min_docs: int = DEFAULT_MIN_DOCS
):
    """Global boilerplate inventory: every ``width``-word segment that
    occurs in ≥ ``min_docs`` distinct documents, with its document
    frequency and total occurrence count."""
    from ocr_ray.stages.grouped import grouped_map

    rows = docs.map_batches(
        _segment_rows_factory(width), batch_format="pyarrow"
    )
    return grouped_map(rows, ["segment"], _hot_block_factory(min_docs))


def _mark_block_factory(min_docs: int):
    """Per segment group: flag rows of hot groups, emit per-doc
    partials (doc_id, n_seg, n_hot, kept_words) — one vectorized
    repeat per block."""

    def block(block_tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        e = pa.array([], pa.int64())
        if block_tbl.num_rows == 0 or len(starts) == 0:
            return pa.table(
                {"doc_id": e, "n_seg": e, "n_hot": e, "kept_words": e}
            )
        n = block_tbl.num_rows
        sizes = np.diff(np.append(starts, n))
        hot = np.repeat(sizes >= min_docs, sizes)
        cnt = block_tbl.column("cnt").to_numpy(zero_copy_only=False)
        wrd = block_tbl.column("n_words").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": block_tbl.column("doc_id"),
                "n_seg": pa.array(cnt, pa.int64()),
                "n_hot": pa.array(np.where(hot, cnt, 0), pa.int64()),
                "kept_words": pa.array(
                    np.where(hot, 0, cnt * wrd), pa.int64()
                ),
            }
        )

    return block


def segment_dedup_stats(
    docs, *, width: int = DEFAULT_WIDTH, min_docs: int = DEFAULT_MIN_DOCS
):
    """Per-document removal report under the hot-segment rule:
    (doc_id, n_segments, n_hot_segments, n_kept_words). Every document
    has ≥ 1 segment (the empty text segments to [""]), so no spine
    join is needed."""
    from ray.data.aggregate import Sum

    from ocr_ray.stages.grouped import grouped_map

    rows = docs.map_batches(
        _segment_rows_factory(width), batch_format="pyarrow"
    )
    marked = grouped_map(rows, ["segment"], _mark_block_factory(min_docs))
    agg = marked.groupby("doc_id").aggregate(
        Sum("n_seg", alias_name="n_segments"),
        Sum("n_hot", alias_name="n_hot_segments"),
        Sum("kept_words", alias_name="n_kept_words"),
    )
    return agg


def _positioned_rows_factory(width: int):
    """Like :func:`_segment_rows_factory` but keeps every occurrence
    with its position ``k`` (no per-doc collapse) — the rebuild surface
    needs each slot back in order."""

    def rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "segment": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "k": pa.array([], pa.int64()),
                }
            )
        text = pc.fill_null(
            pc.cast(batch.column("text"), pa.string()), ""
        )
        words = pc.split_pattern(text, " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = np.diff(offs)
        n_segs = (n_words + width - 1) // width
        total = int(n_segs.sum())
        doc_idx = np.repeat(np.arange(len(n_words), dtype=np.int64), n_segs)
        cum = np.concatenate(([0], np.cumsum(n_segs)))
        within = np.arange(total, dtype=np.int64) - cum[doc_idx]
        seg_words = (
            np.minimum((within + 1) * width, n_words[doc_idx])
            - within * width
        )
        seg_ends = offs[doc_idx] + within * width + seg_words
        seg_list = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([offs[0]], seg_ends)), pa.int32()),
            words.values,
        )
        return pa.table(
            {
                "segment": pc.binary_join(seg_list, " "),
                "doc_id": pc.take(batch.column("doc_id"), pa.array(doc_idx)),
                "k": pa.array(within, pa.int64()),
            }
        )

    return rows


def _flag_block_factory(min_docs: int):
    """Per segment group over POSITIONED rows (a doc may occur twice in
    a group): df = distinct-doc count, computed from doc_id change
    points inside the (segment, doc_id)-sorted block."""

    def block(block_tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        e64 = pa.array([], pa.int64())
        if block_tbl.num_rows == 0 or len(starts) == 0:
            return pa.table(
                {
                    "doc_id": e64,
                    "k": e64,
                    "segment": pa.array([], pa.string()),
                    "hot": pa.array([], pa.bool_()),
                }
            )
        n = block_tbl.num_rows
        doc = block_tbl.column("doc_id").to_numpy(zero_copy_only=False)
        new_grp = np.zeros(n, dtype=bool)
        new_grp[starts] = True
        new_doc = new_grp.copy()
        new_doc[1:] |= doc[1:] != doc[:-1]
        grp_sizes = np.diff(np.append(starts, n))
        n_docs = np.add.reduceat(new_doc.astype(np.int64), starts)
        hot = np.repeat(n_docs >= min_docs, grp_sizes)
        return pa.table(
            {
                "doc_id": block_tbl.column("doc_id"),
                "k": block_tbl.column("k"),
                "segment": block_tbl.column("segment"),
                "hot": pa.array(hot),
            }
        )

    return block


def _rebuild_block(block_tbl: pa.Table, starts: np.ndarray) -> pa.Table:
    """Per doc (rows sorted by k): join kept segments back in order."""
    if block_tbl.num_rows == 0 or len(starts) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "clean_text": pa.array([], pa.string()),
                "n_dropped_segments": pa.array([], pa.int64()),
            }
        )
    n = block_tbl.num_rows
    hot = block_tbl.column("hot").to_numpy(zero_copy_only=False)
    kept = ~hot
    seg = block_tbl.column("segment")
    if isinstance(seg, pa.ChunkedArray):
        seg = seg.combine_chunks()
    kept_segs = seg.filter(pa.array(kept))
    bounds = np.append(starts, n)
    kept_cum = np.concatenate(([0], np.cumsum(kept.astype(np.int64))))
    offsets = kept_cum[bounds]  # kept-run end per doc, prefixed by 0
    doc_lists = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), kept_segs
    )
    dropped = np.add.reduceat(hot.astype(np.int64), starts)
    return pa.table(
        {
            "doc_id": pc.take(block_tbl.column("doc_id"), pa.array(starts)),
            "clean_text": pc.binary_join(doc_lists, " "),
            "n_dropped_segments": pa.array(dropped, pa.int64()),
        }
    )


def segment_dedup_docs(
    docs, *, width: int = DEFAULT_WIDTH, min_docs: int = DEFAULT_MIN_DOCS
):
    """The C4 line-dedup TRANSFORM: every occurrence of a hot segment
    is removed and each document's surviving segments are joined back
    in position order → (doc_id, clean_text, n_dropped_segments).

    Same two-shuffle plan as the stats surface, but positioned rows
    flow end-to-end: explode (segment, doc_id, k) → hash partition on
    segment, flag hot inside the block (distinct-doc df via doc-change
    points) → hash partition on doc_id, vectorized ordered rebuild
    (one filter + one ListArray + one binary_join per block)."""
    from ocr_ray.stages.grouped import grouped_map

    rows = docs.map_batches(
        _positioned_rows_factory(width), batch_format="pyarrow"
    )
    flagged = grouped_map(
        rows,
        ["segment"],
        _flag_block_factory(min_docs),
        sort_within=["doc_id"],
    )
    return grouped_map(
        flagged, ["doc_id"], _rebuild_block, sort_within=["k"]
    )


_SEG_CTE = (
    "WITH w AS (\n"
    " SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ws\n"
    " FROM documents\n"
    "), seg AS (\n"
    " SELECT doc_id,\n"
    "  array_to_string(ws[(k * {w} + 1):(k * {w} + {w})], ' ') AS segment,\n"
    "  len(ws[(k * {w} + 1):(k * {w} + {w})]) AS n_words\n"
    " FROM w, (SELECT unnest(range(0, 64)) AS k)\n"
    " WHERE k * {w} < len(ws)\n"
    "), df AS (\n"
    " SELECT segment, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,\n"
    "  CAST(COUNT(*) AS BIGINT) AS n_occurrences\n"
    " FROM seg GROUP BY segment\n"
    ")\n"
)


def hot_segments_sql(
    width: int = DEFAULT_WIDTH, min_docs: int = DEFAULT_MIN_DOCS
) -> str:
    """DuckDB equivalent — identical segmenter (1-based inclusive list
    slice == the numpy window), identical hot rule. The range(0, 64)
    cap covers documents up to 64×width words (corpus max is 100)."""
    return (
        _SEG_CTE.format(w=width)
        + f"SELECT segment, n_docs, n_occurrences FROM df"
        f" WHERE n_docs >= {min_docs} ORDER BY segment"
    )


def segment_dedup_stats_sql(
    width: int = DEFAULT_WIDTH, min_docs: int = DEFAULT_MIN_DOCS
) -> str:
    return (
        _SEG_CTE.format(w=width)
        + "SELECT seg.doc_id,\n"
        " CAST(COUNT(*) AS BIGINT) AS n_segments,\n"
        f" CAST(SUM(CASE WHEN df.n_docs >= {min_docs} THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_hot_segments,\n"
        f" CAST(SUM(CASE WHEN df.n_docs >= {min_docs} THEN 0 ELSE"
        " seg.n_words END) AS BIGINT) AS n_kept_words\n"
        "FROM seg JOIN df USING (segment)\n"
        "GROUP BY seg.doc_id ORDER BY seg.doc_id"
    )


def segment_dedup_docs_sql(
    width: int = DEFAULT_WIDTH, min_docs: int = DEFAULT_MIN_DOCS
) -> str:
    """DuckDB equivalent of the transform: kept segments re-joined in
    position order; docs whose every segment is hot keep an empty
    string. The seg CTE keeps ``k``, so occurrences (not distinct
    segments) are what survive or drop."""
    return (
        "WITH w AS (\n"
        " SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ws\n"
        " FROM documents\n"
        "), seg AS (\n"
        " SELECT doc_id, k,\n"
        f"  array_to_string(ws[(k * {width} + 1):(k * {width} + {width})],"
        " ' ') AS segment\n"
        " FROM w, (SELECT unnest(range(0, 64)) AS k)\n"
        f" WHERE k * {width} < len(ws)\n"
        "), df AS (\n"
        " SELECT segment, COUNT(DISTINCT doc_id) AS n_docs\n"
        " FROM seg GROUP BY segment\n"
        ")\n"
        "SELECT seg.doc_id,\n"
        " COALESCE(array_to_string(\n"
        f"  list(seg.segment ORDER BY seg.k)"
        f" FILTER (WHERE df.n_docs < {min_docs}), ' '), '')"
        " AS clean_text,\n"
        f" CAST(SUM(CASE WHEN df.n_docs >= {min_docs} THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_dropped_segments\n"
        "FROM seg JOIN df USING (segment)\n"
        "GROUP BY seg.doc_id ORDER BY seg.doc_id"
    )


# ------------------------------- char-gram exact substring duplication


def char_dup_coverage(docs, gram: int = 64, stride: int = 32):
    """Per-document duplicated-substring coverage, the exact-substring
    dedup signal (strided char ``gram``-grams shared with >= 2 distinct
    documents; cf. Lee et al., "Deduplicating Training Data Makes
    Language Models Better" — anchor-sampled rather than suffix-array).

    Scale shape: each block emits slim per-(doc, gram) position counts
    (in-batch pre-aggregated); ONE hash shuffle by gram computes each
    gram's distinct-doc count and flags the rows in place (vectorized
    run arithmetic); a per-doc keyed sum finishes. The grams shipped
    are ``len/stride`` per doc — a tunable constant factor of the
    corpus, never the quadratic pair space. Grams join on their exact
    bytes (no fingerprint collisions), matching the substr-lateral SQL
    oracle verbatim.

    Output: (doc_id, n_grams, n_dup_grams, dup_millionths) for docs
    with at least one full gram."""
    from ray.data.aggregate import Sum

    from ocr_ray.stages.grouped import grouped_map

    row_schema = pa.schema(
        [
            ("gram", pa.string()),
            ("doc_id", pa.int64()),
            ("pos_count", pa.int64()),
        ]
    )

    def gram_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return row_schema.empty_table()
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        out_ids, out_grams = [], []
        for did, tx in zip(ids, texts):
            if tx is None or len(tx) < gram:
                continue
            for p in range(0, len(tx) - gram + 1, stride):
                out_ids.append(did)
                out_grams.append(tx[p:p + gram])
        if not out_ids:
            return row_schema.empty_table()
        t2 = pa.table(
            {
                "gram": pa.array(out_grams, pa.string()),
                "doc_id": pa.array(out_ids, pa.int64()),
                "pos_count": pa.array(
                    np.ones(len(out_ids), np.int64), pa.int64()
                ),
            }
        )
        g = t2.group_by(["gram", "doc_id"]).aggregate([("pos_count", "sum")])
        return pa.table(
            {
                "gram": g["gram"],
                "doc_id": g["doc_id"],
                "pos_count": pc.cast(g["pos_count_sum"], pa.int64()),
            }
        )

    flag_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("pos_count", pa.int64()),
            ("dup_count", pa.int64()),
        ]
    )

    def flag_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n == 0 or len(starts) == 0:
            return flag_schema.empty_table()
        ids = block.column("doc_id").to_numpy(zero_copy_only=False)
        cnt = block.column("pos_count").to_numpy(zero_copy_only=False)
        # combine (gram, doc) partials split across input batches —
        # block is sorted by (gram, doc_id)
        garr = block.column("gram")
        if isinstance(garr, pa.ChunkedArray):
            garr = garr.combine_chunks()
        gcodes = pc.dictionary_encode(garr).indices.to_numpy(
            zero_copy_only=False
        )
        change = np.ones(n, dtype=bool)
        change[1:] = (gcodes[1:] != gcodes[:-1]) | (ids[1:] != ids[:-1])
        first = np.flatnonzero(change)
        cnt = np.add.reduceat(cnt, first)
        ids = ids[first]
        run_starts = np.unique(np.searchsorted(first, starts))
        sizes = np.diff(np.append(run_starts, len(ids)))
        n_docs = np.repeat(sizes, sizes)  # rows per gram = distinct docs
        dup = np.where(n_docs >= 2, cnt, 0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pos_count": pa.array(cnt, pa.int64()),
                "dup_count": pa.array(dup, pa.int64()),
            }
        )

    flagged = grouped_map(
        docs.map_batches(gram_rows, batch_format="pyarrow"),
        ["gram"],
        flag_block,
        sort_within=["doc_id"],
    )
    agg = flagged.groupby("doc_id").aggregate(
        Sum("pos_count", alias_name="n_grams"),
        Sum("dup_count", alias_name="n_dup_grams"),
    )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_grams", pa.int64()),
            ("n_dup_grams", pa.int64()),
            ("dup_millionths", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        ng = t["n_grams"].to_numpy(zero_copy_only=False)
        nd = t["n_dup_grams"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_grams": t["n_grams"],
                "n_dup_grams": t["n_dup_grams"],
                "dup_millionths": pa.array(
                    nd * 1_000_000 // ng, pa.int64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def char_dup_coverage_sql(gram: int = 64, stride: int = 32) -> str:
    return (
        "WITH g AS (\n"
        f" SELECT doc_id, substr(text, CAST(p AS INTEGER), {gram}) AS gram\n"
        " FROM documents CROSS JOIN LATERAL"
        f" unnest(generate_series(1, len(text)-{gram - 1}, {stride}))"
        " AS u(p)\n"
        f" WHERE len(text) >= {gram}\n"
        "), dg AS (\n"
        " SELECT doc_id, gram, COUNT(*) AS pos_count FROM g GROUP BY 1, 2\n"
        "), gd AS (\n"
        " SELECT gram, COUNT(*) AS n_docs FROM dg GROUP BY 1\n"
        ")\n"
        "SELECT dg.doc_id, CAST(SUM(pos_count) AS BIGINT) AS n_grams,\n"
        " CAST(SUM(CASE WHEN gd.n_docs >= 2 THEN pos_count ELSE 0 END)"
        " AS BIGINT) AS n_dup_grams,\n"
        " CAST(SUM(CASE WHEN gd.n_docs >= 2 THEN pos_count ELSE 0 END)"
        " * 1000000 // SUM(pos_count) AS BIGINT) AS dup_millionths\n"
        "FROM dg JOIN gd USING (gram) GROUP BY dg.doc_id"
    )
