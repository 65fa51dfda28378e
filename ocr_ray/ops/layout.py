"""Data-layout operators — Z-order (Morton) clustering keys.

Multi-dimensional locality is what lets a 100 TB table serve range
predicates on TWO columns from few files: interleaving the bits of two
quantized dimensions gives a single sort/partition key under which rows
close in (x, y) land in the same file (the Delta/Iceberg Z-ORDER
feature, Morton 1966). The engine computes the key vectorized
(magic-number bit spreading); the oracle reproduces it bit-for-bit with
a 16-term shift-and-mask SQL expression per dimension.

Scale shape: one stateless pass — each row's key depends on that row
alone — so the key add never shuffles; the subsequent
``repartition(keys=["zkey"])`` / ``sort("zkey")`` the caller runs for
the actual layout is the standard one-shuffle write path.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BITS = 16
_MASK = (1 << _BITS) - 1


def _spread16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each value onto even bit positions
    (uint64 lanes, classic magic-number interleave)."""
    v = v.astype(np.uint64) & np.uint64(_MASK)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def morton_key(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """32-bit Morton key: x on even bits, y on odd bits (low 16 bits of
    each input)."""
    return (_spread16(x) | (_spread16(y) << np.uint64(1))).astype(np.int64)


def zorder_keys(ds, id_col: str, x_col: str, y_col: str,
                x_expr=None, y_expr=None):
    """Add a Z-order key over two integer dimensions. ``x_expr`` /
    ``y_expr`` optionally map the raw column to its quantized integer
    form (numpy int64 → int64); default is identity. Output rows are
    ``(id, x_q, y_q, zkey)`` — slim, one per input row."""
    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("x_q", pa.int64()),
            ("y_q", pa.int64()),
            ("zkey", pa.int64()),
        ]
    )

    def add_key(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        x = t.column(x_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        y = t.column(y_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        if x_expr is not None:
            x = x_expr(x)
        if y_expr is not None:
            y = y_expr(y)
        xq = x & _MASK
        yq = y & _MASK
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()),
                "x_q": pa.array(xq, pa.int64()),
                "y_q": pa.array(yq, pa.int64()),
                "zkey": pa.array(morton_key(x, y), pa.int64()),
            }
        )

    return ds.map_batches(add_key, batch_format="pyarrow")


def morton_sql(x: str, y: str, bits: int = _BITS) -> str:
    """SQL expression computing the same Morton key: per bit i,
    ((x >> i) & 1) << 2i  |  ((y >> i) & 1) << 2i+1, summed."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_keys_sql(table: str, id_col: str, x_sql: str, y_sql: str) -> str:
    """DuckDB oracle for :func:`zorder_keys` over quantized integer
    expressions ``x_sql`` / ``y_sql`` (already masked to 16 bits)."""
    return (
        f"WITH q AS (SELECT {id_col}, CAST({x_sql} AS BIGINT) AS x_q,"
        f" CAST({y_sql} AS BIGINT) AS y_q FROM {table})\n"
        f"SELECT {id_col}, x_q, y_q,"
        f" CAST({morton_sql('x_q', 'y_q')} AS BIGINT) AS zkey\nFROM q"
    )


def compaction_plan(rows, key_col: str = "doc_id",
                    bytes_col: str = "n_chars",
                    target_bytes: int = 65_536,
                    key_bucket_width: int = 1_024):
    """Small-files compaction planner: assign key-ordered rows to
    output chunks of ~``target_bytes`` via the floor-of-prefix-sum rule
    ``chunk_id = exclusive_prefix(bytes) // target`` (next-fit packing
    over the canonical key order — the Delta/Iceberg OPTIMIZE bin
    layout, deterministic and SQL-replayable, unlike first-fit-
    decreasing).

    The global ordered prefix sum is distributed, no global sort: keys
    bucket by ``key // width``; per-bucket byte totals collapse to a
    tiny driver cumsum (one row per bucket) that becomes each bucket's
    base offset; one hash shuffle by bucket then computes exact local
    exclusive prefixes vectorized, and a per-chunk keyed sum finishes.

    Output: (chunk_id, n_docs, bytes)."""
    import ray
    from ray.data.aggregate import Sum

    from ocr_ray.ops.dedup import _with_schema
    from ocr_ray.stages.grouped import grouped_map

    row_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            (key_col, pa.int64()),
            (bytes_col, pa.int64()),
        ]
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return row_schema.empty_table()
        k = t.column(key_col).cast(pa.int64())
        return pa.table(
            {
                "bucket": pc.divide(
                    k, pa.scalar(key_bucket_width, pa.int64())
                ),
                key_col: k,
                bytes_col: t.column(bytes_col).cast(pa.int64()),
            }
        )

    bucketed = _with_schema(
        rows.map_batches(add_bucket, batch_format="pyarrow"), row_schema
    ).materialize()
    totals = (
        bucketed.groupby("bucket")
        .aggregate(Sum(bytes_col, alias_name="b"))
        .take_all()
    )  # bounded: one row per key bucket
    totals.sort(key=lambda r: r["bucket"])
    base: dict[int, int] = {}
    acc = 0
    for r in totals:
        base[r["bucket"]] = acc
        acc += r["b"]
    base_ref = ray.put(base)

    part_schema = pa.schema(
        [("chunk_id", pa.int64()), ("n_docs", pa.int64()),
         ("bytes", pa.int64())]
    )

    def chunk_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n == 0 or len(starts) == 0:
            return part_schema.empty_table()
        offs = ray.get(base_ref)
        bk = block.column("bucket").to_numpy(zero_copy_only=False)
        b = block.column(bytes_col).to_numpy(zero_copy_only=False)
        # exclusive prefix within the (key-sorted) bucket run + base
        prefix = np.concatenate([[0], np.cumsum(b)[:-1]])
        sizes = np.diff(np.append(starts, n))
        run_base = np.array(
            [offs[int(x)] for x in bk[starts]], np.int64
        ) - prefix[starts]
        prefix = prefix + np.repeat(run_base, sizes)
        chunk = prefix // target_bytes
        t2 = pa.table(
            {
                "chunk_id": pa.array(chunk, pa.int64()),
                "n_docs": pa.array(np.ones(n, np.int64), pa.int64()),
                "bytes": pa.array(b, pa.int64()),
            }
        )
        g = t2.group_by("chunk_id").aggregate(
            [("n_docs", "sum"), ("bytes", "sum")]
        )
        return pa.table(
            {
                "chunk_id": g["chunk_id"],
                "n_docs": pc.cast(g["n_docs_sum"], pa.int64()),
                "bytes": pc.cast(g["bytes_sum"], pa.int64()),
            }
        )

    parts = grouped_map(
        bucketed, ["bucket"], chunk_block, sort_within=[key_col]
    )
    return (
        parts.groupby("chunk_id")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("bytes", alias_name="bytes"),
        )
    )


def compaction_plan_sql(table: str = "documents", key_col: str = "doc_id",
                        bytes_col: str = "n_chars",
                        target_bytes: int = 65_536) -> str:
    return (
        "WITH p AS (\n"
        f" SELECT {key_col}, {bytes_col},\n"
        f"  COALESCE(SUM({bytes_col}) OVER (ORDER BY {key_col}\n"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        " AS prefix\n"
        f" FROM {table}\n"
        ")\n"
        f"SELECT CAST(prefix // {target_bytes} AS BIGINT) AS chunk_id,\n"
        " CAST(COUNT(*) AS BIGINT) AS n_docs,\n"
        f" CAST(SUM({bytes_col}) AS BIGINT) AS bytes\n"
        "FROM p GROUP BY 1"
    )
