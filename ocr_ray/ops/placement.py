"""Data-placement primitives: rendezvous (HRW) sharding.

Highest-random-weight hashing assigns each key to the node with the
largest hash(key, node) — the placement rule that moves only 1/N of
keys when a node joins/leaves (Thaler & Ravishankar 1998), the
foundation under consistent object placement at cluster scale. The
audit below computes the shard-size distribution and imbalance so a
deployment can verify the hash spreads THIS corpus evenly before
committing a layout.

SQL-replayable: weights are DuckDB's md5 over 'key|node', compared as
the first-16-hex uint64, so the winning node is bit-identical.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _hrw_weight_hex(key: int, node: int) -> int:
    return int(
        hashlib.md5(f"{key}|{node}".encode()).hexdigest()[:16], 16
    )


def rendezvous_shards(docs, n_nodes: int = 8):
    """Shard-size audit of HRW placement over doc_id: one row per node
    — (node, n_docs, sum_chars) — plus deterministic tie behavior
    (md5 collisions across nodes are ~impossible; ties would pick the
    smaller node id, mirrored in SQL by the (weight DESC, node ASC)
    order).

    Scale shape: the winner computation is per-row map-side (n_nodes
    md5s per key, memoized per batch via vectorized digesting), and
    the shuffle carries one partial row per (block, node).
    """
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        chars = t.column("n_chars").to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return pa.schema(
                [("node", pa.int64()), ("n", pa.int64()),
                 ("chars", pa.int64())]
            ).empty_table()
        win = np.empty(n, np.int64)
        for i, key in enumerate(ids):
            best_w = -1
            best_n = -1
            for node in range(n_nodes):
                w = _hrw_weight_hex(int(key), node)
                if w > best_w:
                    best_w = w
                    best_n = node
            win[i] = best_n
        g = pa.table(
            {
                "node": pa.array(win, pa.int64()),
                "chars": pa.array(chars, pa.int64()),
            }
        ).group_by("node").aggregate([([], "count_all"), ("chars", "sum")])
        return g.rename_columns(["node", "n", "chars"])

    return (
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby("node")
        .aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("chars", alias_name="sum_chars"),
        )
    )


def rendezvous_shards_sql(n_nodes: int = 8) -> str:
    """SQL replay: cross join keys x nodes, md5('key|node') first 16
    hex as the weight, argmax per key via (weight DESC, node ASC)."""
    return (
        "WITH nodes AS (\n"
        f" SELECT unnest(range({n_nodes})) AS node\n"
        "), w AS (\n"
        " SELECT d.doc_id, d.n_chars, nodes.node,\n"
        "  ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '|' ||"
        " CAST(nodes.node AS VARCHAR)), 1, 16))::UBIGINT AS wt\n"
        " FROM documents d CROSS JOIN nodes\n"
        "), win AS (\n"
        " SELECT doc_id, n_chars, node,\n"
        "  ROW_NUMBER() OVER (PARTITION BY doc_id"
        " ORDER BY wt DESC, node ASC) AS rn\n"
        " FROM w\n"
        ")\n"
        "SELECT CAST(node AS BIGINT) AS node,"
        " CAST(COUNT(*) AS BIGINT) AS n_docs,\n"
        " CAST(SUM(n_chars) AS BIGINT) AS sum_chars\n"
        "FROM win WHERE rn = 1 GROUP BY node"
    )
