"""Decayed daily series — exact geometric EWMA over the event log.

``events_ewma_daily`` computes, per event type and day, the
exponentially decayed running sum of daily cents with half-life one
day, EXACTLY: weights are powers of two over a finite 20-day horizon,
so the decayed sum is an integer left-shift convolution —
``ewma_scaled(t) = Σ_{0<=d<=20} daycents(t-d) << (20-d)`` — with no
float ``exp`` anywhere (the established power-of-two decay contract,
see ops/asof.py:attribution_time_decay). A day with no events
contributes nothing but still appears in the output grid (the decayed
tail keeps moving), reusing the dense-grid shape of ops/resample.py.

Scale: daily partials collapse each block to slim (type, day, cents)
rows; the convolution runs inside a per-type ``grouped_map`` block on
the dense day grid — vectorized correlate, no per-day Python.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HORIZON = 20  # days; 2^-20 of a cent is far below output resolution


def events_ewma_daily(events):
    """(event_type, day_idx, day_cents, ewma_scaled): ewma_scaled is
    the decayed sum in cents × 2^20 (divide by 1<<20 for display)."""
    from ray.data.aggregate import Max, Min, Sum

    from ocr_ray.driver import _cents
    from ocr_ray.stages.grouped import grouped_map

    part_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("day_idx", pa.int64()),
            ("cents", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return part_schema.empty_table()
        ts = t["ts"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        days = (
            pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
            // 1_000_000
            // 86_400
        )
        t2 = pa.table(
            {
                "event_type": t["event_type"],
                "day_idx": pa.array(days, pa.int64()),
                "cents": _cents(t["value"]),
            }
        )
        g = t2.group_by(["event_type", "day_idx"]).aggregate(
            [("cents", "sum")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "day_idx": g["day_idx"],
                "cents": pc.cast(g["cents_sum"], pa.int64()),
            }
        )

    sparse = (
        events.map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "day_idx"])
        .aggregate(Sum("cents", alias_name="cents"))
        .materialize()
    )
    bounds = sparse.aggregate(
        Min("day_idx", alias_name="lo"), Max("day_idx", alias_name="hi")
    )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = hi - lo + 1
    # power-of-two decay kernel, most-recent day first
    kernel = (1 << (HORIZON - np.arange(HORIZON + 1))).astype(np.int64)

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("day_idx", pa.int64()),
            ("day_cents", pa.int64()),
            ("ewma_scaled", pa.int64()),
        ]
    )

    def ewma_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n == 0 or len(starts) == 0:
            return out_schema.empty_table()
        types = block.column("event_type").to_pylist()
        days = block.column("day_idx").to_numpy(zero_copy_only=False)
        cents = block.column("cents").to_numpy(zero_copy_only=False)
        ends = np.append(starts[1:], n)
        out = []
        for s, e in zip(starts, ends):
            dense = np.zeros(width, np.int64)
            dense[days[s:e] - lo] = cents[s:e]
            # integer shift-convolution: for each day t,
            # Σ_{d=0..H} dense[t-d] << (H-d)
            ew = np.zeros(width, np.int64)
            for d in range(min(HORIZON, width - 1) + 1):
                ew[d:] += dense[: width - d] * kernel[d]
            out.append(
                pa.table(
                    {
                        "event_type": pa.array(
                            [types[s]] * width, pa.string()
                        ),
                        "day_idx": pa.array(
                            np.arange(lo, hi + 1, dtype=np.int64),
                            pa.int64(),
                        ),
                        "day_cents": pa.array(dense, pa.int64()),
                        "ewma_scaled": pa.array(ew, pa.int64()),
                    }
                )
            )
        return pa.concat_tables(out)

    return grouped_map(sparse, ["event_type"], ewma_block,
                       sort_within=["day_idx"])


def events_ewma_daily_sql() -> str:
    """DuckDB oracle: dense grid LEFT JOIN + a 21-term shift self-join."""
    return (
        "WITH b AS (\n"
        " SELECT event_type, epoch_us(ts)//1000000//86400 AS day_idx,\n"
        "  SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS cents\n"
        " FROM events GROUP BY 1, 2\n"
        "), bounds AS (\n"
        " SELECT MIN(day_idx) AS lo, MAX(day_idx) AS hi FROM b\n"
        "), grid AS (\n"
        " SELECT t.event_type, gs.day_idx\n"
        " FROM (SELECT DISTINCT event_type FROM events) t,\n"
        "  (SELECT unnest(generate_series(lo, hi)) AS day_idx FROM bounds)"
        " gs\n"
        "), dense AS (\n"
        " SELECT g.event_type, g.day_idx, COALESCE(b.cents, 0) AS cents\n"
        " FROM grid g LEFT JOIN b USING (event_type, day_idx)\n"
        ")\n"
        "SELECT event_type, day_idx, day_cents, ewma_scaled FROM (\n"
        " SELECT d.event_type AS event_type, d.day_idx AS day_idx,\n"
        "  CAST(d.cents AS BIGINT) AS day_cents,\n"
        "  CAST(COALESCE(SUM(s.cents *"
        " (1 << (20 - (d.day_idx - s.day_idx)))),"
        " 0) AS BIGINT) AS ewma_scaled\n"
        " FROM dense d LEFT JOIN dense s\n"
        "  ON s.event_type = d.event_type\n"
        "  AND s.day_idx <= d.day_idx"
        f"  AND s.day_idx >= d.day_idx - {HORIZON}\n"
        " GROUP BY d.event_type, d.day_idx, d.cents\n"
        ")"
    )
