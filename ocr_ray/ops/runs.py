"""Gaps-and-islands run collapse — the SCD2 / sessionized-state op.

Warehouse pipelines constantly collapse an ordered event stream into
*runs of constant state* per entity: SCD2 validity intervals, device
state timelines, user activity phases. The relational idiom is the
gaps-and-islands double ROW_NUMBER; the Ray-Data-native shape is one
hash partition on the entity key plus a single vectorized run-length
encode per block — no window functions, no per-group Python.

Output: one row per (user, run) — ``(user_id, run_idx, event_type,
ts_from, ts_to, n_events)`` where a run is a maximal streak of
consecutive same-type events in ``(ts, event_id)`` order and
``run_idx`` numbers runs 1..R within each user.

Scale design: slim projected rows shuffle once (hash partition on
``user_id``; the block sort provides the per-user ordering); the RLE
is numpy boundary arithmetic over the whole block at once — boundary
flags, ``diff`` of change points, one ``take`` per output column.
Skewed users are bounded by the block size the same way every keyed
windowed op here is; ``event_id`` breaks timestamp ties so the result
is deterministic and bit-comparable with the SQL oracle.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _runs_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
    if block.num_rows == 0 or len(starts) == 0:
        e64 = pa.array([], pa.int64())
        return pa.table(
            {
                "user_id": e64,
                "run_idx": e64,
                "event_type": pa.array([], pa.string()),
                "ts_from": pa.array([], pa.timestamp("us")),
                "ts_to": pa.array([], pa.timestamp("us")),
                "n_events": e64,
            }
        )
    n = block.num_rows
    type_col = block.column("event_type")
    if isinstance(type_col, pa.ChunkedArray):
        type_col = type_col.combine_chunks()
    codes = pc.dictionary_encode(type_col).indices.to_numpy(
        zero_copy_only=False
    )
    new_user = np.zeros(n, dtype=bool)
    new_user[starts] = True
    change = new_user.copy()
    change[1:] |= codes[1:] != codes[:-1]
    run_start = np.flatnonzero(change)
    run_len = np.diff(np.append(run_start, n))
    # run ordinal within its user: position minus the position of the
    # user's first run (runs are contiguous per user in block order)
    run_is_new_user = new_user[run_start]
    user_ord = np.cumsum(run_is_new_user) - 1
    run_pos = np.arange(len(run_start), dtype=np.int64)
    first_pos = run_pos[run_is_new_user][user_ord]
    run_idx = run_pos - first_pos + 1
    starts_arr = pa.array(run_start)
    ends_arr = pa.array(run_start + run_len - 1)
    return pa.table(
        {
            "user_id": pc.take(block.column("user_id"), starts_arr),
            "run_idx": pa.array(run_idx, pa.int64()),
            "event_type": pc.take(type_col, starts_arr),
            "ts_from": pc.take(block.column("ts"), starts_arr),
            "ts_to": pc.take(block.column("ts"), ends_arr),
            "n_events": pa.array(run_len, pa.int64()),
        }
    )


def user_event_runs(events):
    """Collapse each user's event stream into maximal same-type runs."""
    from ocr_ray.stages.grouped import grouped_map

    return grouped_map(
        events,
        ["user_id"],
        _runs_block,
        sort_within=["ts", "event_id"],
    )


def user_event_runs_sql() -> str:
    """DuckDB gaps-and-islands equivalent (double ROW_NUMBER), same
    (ts, event_id) tie-break."""
    return (
        "WITH s AS (\n"
        " SELECT user_id, ts, event_id, event_type,\n"
        "  ROW_NUMBER() OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id) AS rn,\n"
        "  ROW_NUMBER() OVER (PARTITION BY user_id, event_type"
        " ORDER BY ts, event_id) AS rne\n"
        " FROM events\n"
        "), r AS (\n"
        " SELECT user_id, event_type, MIN(ts) AS ts_from,\n"
        "  MAX(ts) AS ts_to, CAST(COUNT(*) AS BIGINT) AS n_events,\n"
        "  MIN(rn) AS first_rn\n"
        " FROM s GROUP BY user_id, event_type, rn - rne\n"
        ")\n"
        "SELECT user_id,\n"
        " CAST(ROW_NUMBER() OVER (PARTITION BY user_id"
        " ORDER BY first_rn) AS BIGINT) AS run_idx,\n"
        " event_type, ts_from, ts_to, n_events\n"
        "FROM r ORDER BY user_id, run_idx"
    )
