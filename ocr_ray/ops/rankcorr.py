"""Distributed rank concordance (Kendall-tau pair counts) per group.

Curation pipelines sanity-check that two quality signals *agree in
rank* — e.g. document length vs token count, model score vs heuristic
score — before blending them. Pearson correlation (already covered by
``length_token_correlation``) is moment-based and outlier-dominated;
the rank-concordance audit is the robust counterpart: over all C(n,2)
document pairs within a group, how many are concordant, discordant, or
tied. Kendall's tau-b is a one-line post-process of these five exact
integer counts, so the operator surfaces the counts (bit-exact,
oracle-comparable) rather than the float.

Scale design: one stateless map projects each document to a slim
``(group, x, y)`` row; a hash partition on the group key co-locates
each group; inside the block every count is O(n log² n) — ties via
``np.unique`` run lengths, discordant pairs via a vectorized
divide-and-conquer inversion count (``np.searchsorted`` across sorted
halves — no Python-per-element work, no O(n²) pair matrix), and
concordant pairs by subtraction from C(n,2). A group must fit in one
block (same contract as every keyed windowed op here); for web-scale
groups the same inversion counter runs per block with a final
cross-block merge on the sorted boundaries, noted in
:func:`_count_inversions`.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _count_inversions(a: np.ndarray) -> int:
    """Strict inversions (i < j, a[i] > a[j]) by divide-and-conquer:
    cross-half counts via one ``searchsorted`` per level over the
    already-sorted halves — O(n log² n), fully vectorized. (Cross-node
    extension: each block returns its sorted array + inversion count;
    pairwise merges apply the same cross-count, which is how the op
    would span groups larger than a block.)"""
    n = len(a)
    if n < 2:
        return 0
    stack = [np.asarray(a)]
    total = 0
    while stack:
        cur = stack.pop()
        if len(cur) < 2:
            continue
        mid = len(cur) // 2
        left, right = cur[:mid], cur[mid:]
        ls, rs = np.sort(left), np.sort(right)
        # pairs (i in left, j in right) with left > right:
        # for each r in right, count of left elements strictly greater
        total += int(
            (len(ls) - np.searchsorted(ls, rs, side="right")).sum()
        )
        stack.append(left)
        stack.append(right)
    return total


def _tie_pairs(a: np.ndarray) -> int:
    _, counts = np.unique(a, return_counts=True)
    return int((counts.astype(np.int64) * (counts - 1) // 2).sum())


def kendall_counts(arr_x: np.ndarray, arr_y: np.ndarray) -> dict:
    """Exact disjoint pair-category counts for one group."""
    n = len(arr_x)
    order = np.lexsort((arr_y, arr_x))  # x asc, then y asc
    y_sorted = arr_y[order]
    # with equal-x runs sorted by y ascending, every strict y-inversion
    # has strictly increasing x — i.e. it is exactly a discordant pair
    discordant = _count_inversions(y_sorted)
    total = n * (n - 1) // 2
    tx = _tie_pairs(arr_x)
    ty = _tie_pairs(arr_y)
    joint = np.rec.fromarrays([arr_x, arr_y])
    txy = _tie_pairs(joint)
    concordant = total - tx - ty + txy - discordant
    return {
        "n_docs": n,
        "concordant": concordant,
        "discordant": discordant,
        "tie_x_only": tx - txy,
        "tie_y_only": ty - txy,
        "tie_both": txy,
    }


def _xy_rows(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "x": pa.array([], pa.int64()),
                "y": pa.array([], pa.int64()),
            }
        )
    text = pc.fill_null(pc.cast(batch.column("text"), pa.string()), "")
    words = pc.split_pattern(text, " ")
    n_tok = pc.list_value_length(words)
    return pa.table(
        {
            "lang": batch.column("lang"),
            "x": pc.cast(batch.column("n_chars"), pa.int64()),
            "y": pc.cast(n_tok, pa.int64()),
        }
    )


def _kendall_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
    e = pa.array([], pa.int64())
    if block.num_rows == 0 or len(starts) == 0:
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "n_docs": e,
                "concordant": e,
                "discordant": e,
                "tie_x_only": e,
                "tie_y_only": e,
                "tie_both": e,
            }
        )
    n = block.num_rows
    bounds = np.append(starts, n)
    x = block.column("x").to_numpy(zero_copy_only=False)
    y = block.column("y").to_numpy(zero_copy_only=False)
    rows = []
    langs = pc.take(block.column("lang"), pa.array(starts))
    for i in range(len(starts)):
        lo, hi = bounds[i], bounds[i + 1]
        rows.append(kendall_counts(x[lo:hi], y[lo:hi]))
    out = {k: pa.array([r[k] for r in rows], pa.int64()) for k in rows[0]}
    return pa.table({"lang": langs, **out})


def kendall_by_lang(docs):
    """Per-language rank concordance between document char length
    (``n_chars``) and whitespace token count: (lang, n_docs,
    concordant, discordant, tie_x_only, tie_y_only, tie_both)."""
    from ocr_ray.stages.grouped import grouped_map

    rows = docs.map_batches(_xy_rows, batch_format="pyarrow")
    return grouped_map(rows, ["lang"], _kendall_block)


def kendall_by_lang_sql() -> str:
    """DuckDB equivalent — explicit self-join over i < j pairs within a
    language; category definitions are the same disjoint five."""
    return (
        "WITH t AS (\n"
        " SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS x,\n"
        "  CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT)"
        " AS y\n"
        " FROM documents\n"
        "), p AS (\n"
        " SELECT a.lang,\n"
        "  (a.x - b.x) AS dx, (a.y - b.y) AS dy\n"
        " FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id\n"
        "), agg AS (\n"
        " SELECT lang,\n"
        "  CAST(SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS concordant,\n"
        "  CAST(SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS discordant,\n"
        "  CAST(SUM(CASE WHEN dx = 0 AND dy <> 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS tie_x_only,\n"
        "  CAST(SUM(CASE WHEN dy = 0 AND dx <> 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS tie_y_only,\n"
        "  CAST(SUM(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS tie_both\n"
        " FROM p GROUP BY lang\n"
        "), n AS (\n"
        " SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs\n"
        " FROM t GROUP BY lang\n"
        ")\n"
        "SELECT n.lang, n.n_docs,\n"
        " COALESCE(concordant, 0) AS concordant,\n"
        " COALESCE(discordant, 0) AS discordant,\n"
        " COALESCE(tie_x_only, 0) AS tie_x_only,\n"
        " COALESCE(tie_y_only, 0) AS tie_y_only,\n"
        " COALESCE(tie_both, 0) AS tie_both\n"
        "FROM n LEFT JOIN agg USING (lang) ORDER BY n.lang"
    )
