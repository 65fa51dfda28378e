"""Curriculum ordering — assign every document a global curriculum
position and NTILE bucket by a difficulty proxy (document length,
the classic short-to-long curriculum), computed as a DISTRIBUTED
prefix rank with no global sort:

- pass 1: per-batch counts keyed by a coarse length range bucket
  (``n_chars // bucket_width``) — a tiny aggregate, bounded by
  ``max_chars / bucket_width`` rows;
- the driver cumsums the bucket counts into base offsets (bounded,
  broadcast once);
- pass 2: one ``grouped_map`` hash-partitioned by range bucket, sorted
  within by (n_chars, doc_id), adds the broadcast base offset to the
  in-block position — every doc gets its EXACT global rank under
  ``ORDER BY n_chars, doc_id`` without any all-to-all sort.

The NTILE arithmetic replays DuckDB's exactly: with n rows and k
tiles, the first ``n % k`` tiles hold ``n // k + 1`` rows.

This is the ops/chunk.py pack_sequences distributed-prefix pattern
applied to ranking; same partitioning assumption (range buckets are
balanced enough — document-length distributions are heavy-middled, and
a skewed bucket degrades to one larger sort block, never a driver
fold).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_TILES = 10
DEFAULT_RANGE_WIDTH = 64


def curriculum_ntile(docs, k: int = DEFAULT_TILES,
                     range_width: int = DEFAULT_RANGE_WIDTH):
    """(doc_id, n_chars, position, tile): global 0-based curriculum
    position under ORDER BY (n_chars, doc_id) and the 1-based NTILE(k)
    bucket. ``docs`` needs (doc_id, n_chars)."""
    import ray
    from ray.data.aggregate import Count

    from ocr_ray.ops.dedup import _with_schema
    from ocr_ray.stages.grouped import grouped_map

    tok_schema = pa.schema(
        [
            ("range_bucket", pa.int64()),
            ("doc_id", pa.int64()),
            ("n_chars", pa.int64()),
        ]
    )
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_chars", pa.int64()),
            ("position", pa.int64()),
            ("tile", pa.int64()),
        ]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return tok_schema.empty_table()
        nc = t.column("n_chars").cast(pa.int64())
        import pyarrow.compute as pc

        return pa.table(
            {
                "range_bucket": pc.divide(
                    nc, pa.scalar(range_width, pa.int64())
                ),
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "n_chars": nc,
            }
        )

    tok = _with_schema(
        docs.map_batches(bucketize, batch_format="pyarrow"), tok_schema
    ).materialize()

    counts = (
        tok.groupby("range_bucket").aggregate(Count(alias_name="n"))
    ).take_all()  # bounded: max_chars / range_width rows
    counts.sort(key=lambda r: int(r["range_bucket"]))
    offsets: dict[int, int] = {}
    acc = 0
    for r in counts:
        offsets[int(r["range_bucket"])] = acc
        acc += int(r["n"])
    n_total = acc
    offsets_ref = ray.put(offsets)

    # DuckDB NTILE(k): the first (n % k) tiles get (n // k + 1) rows
    small = n_total // k
    n_big = n_total % k
    big = small + 1
    cut = n_big * big  # positions below this sit in a big tile

    def rank_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n_rows = block.num_rows
        if n_rows == 0 or len(starts) == 0:
            return out_schema.empty_table()
        base = ray.get(offsets_ref)
        bk = block.column("range_bucket").to_numpy(zero_copy_only=False)
        sizes = np.diff(np.append(starts, n_rows))
        pos = np.arange(n_rows, dtype=np.int64)
        pos -= np.repeat(pos[starts], sizes)
        pos += np.repeat(
            np.array([base[int(b)] for b in bk[starts]], np.int64), sizes
        )
        if small > 0:
            tile = np.where(
                pos < cut,
                pos // big,
                n_big + (pos - cut) // small,
            )
        else:  # k > n: each row is its own (big) tile
            tile = pos.copy()
        return pa.table(
            {
                "doc_id": block.column("doc_id"),
                "n_chars": block.column("n_chars"),
                "position": pa.array(pos, pa.int64()),
                "tile": pa.array(tile + 1, pa.int64()),
            }
        )

    return grouped_map(
        tok, ["range_bucket"], rank_block, sort_within=["n_chars", "doc_id"]
    )


def curriculum_ntile_sql(k: int = DEFAULT_TILES) -> str:
    return (
        "SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,\n"
        " CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1"
        " AS BIGINT) AS position,\n"
        f" CAST(NTILE({k}) OVER (ORDER BY n_chars, doc_id)"
        " AS BIGINT) AS tile\n"
        "FROM documents"
    )
