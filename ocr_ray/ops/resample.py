"""Time-series regularization: dense calendar fill + LOCF over an
irregular event log.

Real event streams have gap days; every downstream time-series consumer
(forecasting, anomaly scans, dashboard sparklines) wants a REGULAR
grid. ``daily_dense_fill`` re-expresses the warehouse resample:

1. one scan collapses each block to slim ``(event_type, day_idx, n,
   cents)`` partials, merged by a tiny keyed aggregate (bounded by
   types × days, inherently small — a decade of days is ~3.7k rows per
   type no matter how many trillion events fed them);
2. the global [min_day, max_day] bounds come from one scalar aggregate
   over that small stream (driver materialization bounded by 2 ints);
3. a ``grouped_map`` by event_type densifies each type's run against
   the shared bounds: zero-filled counts, running cumulative counts,
   and last-observation-carried-forward daily cents — all vectorized
   (np.maximum.accumulate index trick for the LOCF; no Python loop
   over days).

Everything is exact int64 (micro/cents fixed point), so the DuckDB
oracle (generate_series × LEFT JOIN + last_value IGNORE NULLS windows)
matches bit-for-bit.

Reference parity: the reference's per-day history rollup
(``ocr_service.py`` history stats endpoint) reports only days that had
runs; this operator is the dense-grid upgrade of that rollup.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def daily_dense_fill(events):
    """(event_type, day_idx, n_events, cum_events, locf_cents) over the
    dense global [min_day, max_day] grid: zero-filled daily counts,
    per-type running totals, and gap days carrying the last observed
    daily cents sum forward (0 before the first observation)."""
    from ray.data.aggregate import Max, Min, Sum

    from ocr_ray.driver import _cents
    from ocr_ray.stages.grouped import grouped_map

    part_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("day_idx", pa.int64()),
            ("n", pa.int64()),
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
                "n": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                "cents": _cents(t["value"]),
            }
        )
        g = t2.group_by(["event_type", "day_idx"]).aggregate(
            [("n", "sum"), ("cents", "sum")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "day_idx": g["day_idx"],
                "n": pc.cast(g["n_sum"], pa.int64()),
                "cents": pc.cast(g["cents_sum"], pa.int64()),
            }
        )

    sparse = (
        events.map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "day_idx"])
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
    )
    sparse = sparse.materialize()
    bounds = sparse.aggregate(
        Min("day_idx", alias_name="lo"), Max("day_idx", alias_name="hi")
    )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("day_idx", pa.int64()),
            ("n_events", pa.int64()),
            ("cum_events", pa.int64()),
            ("locf_cents", pa.int64()),
        ]
    )

    def dense_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n == 0 or len(starts) == 0:
            return out_schema.empty_table()
        types = block.column("event_type").to_pylist()
        days = block.column("day_idx").to_numpy(zero_copy_only=False)
        cnts = block.column("n").to_numpy(zero_copy_only=False)
        cents = block.column("cents").to_numpy(zero_copy_only=False)
        width = hi - lo + 1
        ends = np.append(starts[1:], n)
        out = []
        for s, e in zip(starts, ends):
            dense_n = np.zeros(width, np.int64)
            dense_c = np.zeros(width, np.int64)
            pos = days[s:e] - lo
            dense_n[pos] = cnts[s:e]
            dense_c[pos] = cents[s:e]
            has = np.full(width, -1, np.int64)
            has[pos] = pos
            last = np.maximum.accumulate(has)
            locf = np.where(last >= 0, dense_c[np.clip(last, 0, None)], 0)
            out.append(
                pa.table(
                    {
                        "event_type": pa.array(
                            [types[s]] * width, pa.string()
                        ),
                        "day_idx": pa.array(
                            np.arange(lo, hi + 1, dtype=np.int64), pa.int64()
                        ),
                        "n_events": pa.array(dense_n, pa.int64()),
                        "cum_events": pa.array(
                            np.cumsum(dense_n), pa.int64()
                        ),
                        "locf_cents": pa.array(locf, pa.int64()),
                    }
                )
            )
        return pa.concat_tables(out)

    return grouped_map(sparse, ["event_type"], dense_block,
                       sort_within=["day_idx"])


def daily_dense_fill_sql() -> str:
    """DuckDB oracle: generate_series grid × LEFT JOIN + window LOCF."""
    return (
        "WITH b AS (\n"
        " SELECT event_type, epoch_us(ts)//1000000//86400 AS day_idx,\n"
        "  COUNT(*) AS n, SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS c\n"
        " FROM events GROUP BY 1, 2\n"
        "), bounds AS (\n"
        " SELECT MIN(day_idx) AS lo, MAX(day_idx) AS hi FROM b\n"
        "), grid AS (\n"
        " SELECT t.event_type, gs.day_idx\n"
        " FROM (SELECT DISTINCT event_type FROM events) t,\n"
        "  (SELECT unnest(generate_series(lo, hi)) AS day_idx FROM bounds) gs\n"
        "), j AS (\n"
        " SELECT g.event_type, g.day_idx, COALESCE(b.n, 0) AS n_events, b.c\n"
        " FROM grid g LEFT JOIN b USING (event_type, day_idx)\n"
        ")\n"
        "SELECT event_type, day_idx, CAST(n_events AS BIGINT) AS n_events,\n"
        " CAST(SUM(n_events) OVER (PARTITION BY event_type ORDER BY day_idx)\n"
        "  AS BIGINT) AS cum_events,\n"
        " CAST(COALESCE(last_value(c IGNORE NULLS) OVER (\n"
        "  PARTITION BY event_type ORDER BY day_idx), 0) AS BIGINT)\n"
        "  AS locf_cents\n"
        "FROM j"
    )


_INTERP_OFF = 1 << 40  # cents; see interp offset comment


def daily_linear_interp(events):
    """Linear gap-fill companion to ``daily_dense_fill``: per event
    type, the dense day grid over THAT TYPE'S [first, last] observed
    range with missing days linearly interpolated between their
    anchoring observations — in EXACT milli-cent fixed point
    (``(pv*1000*(nd-d) + nv*1000*(d-pd)) // (nd-pd)``, pure integer,
    so the oracle's window replay matches bit-for-bit; observed days
    carry ``cents*1000``).

    Same scale shape as the LOCF fill: slim per-(type, day) partials,
    one keyed aggregate bounded by types x days, vectorized densify
    per type block.

    Output: (event_type, day_idx, observed, interp_milli_cents).
    """
    from ray.data.aggregate import Sum

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
    )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("day_idx", pa.int64()),
            ("observed", pa.int64()),
            ("interp_milli_cents", pa.int64()),
        ]
    )

    def interp_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n == 0 or len(starts) == 0:
            return out_schema.empty_table()
        types = block.column("event_type").to_pylist()
        days = block.column("day_idx").to_numpy(zero_copy_only=False)
        cents = block.column("cents").to_numpy(zero_copy_only=False)
        ends = np.append(starts[1:], n)
        out = []
        for s, e in zip(starts, ends):
            d = days[s:e]
            v = cents[s:e]
            lo, hi = int(d[0]), int(d[-1])  # sorted within group
            width = hi - lo + 1
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            pos = d - lo
            obs = np.zeros(width, np.int64)
            obs[pos] = 1
            # previous / next anchor index per grid day
            has = np.full(width, -1, np.int64)
            has[pos] = np.arange(len(d))
            prev = np.maximum.accumulate(has)
            nxt_rev = np.full(width, len(d), np.int64)
            nxt_rev[pos] = np.arange(len(d))
            nxt = np.minimum.accumulate(nxt_rev[::-1])[::-1]
            # interior grid (between anchors) always has valid prev/nxt
            pv = v[np.clip(prev, 0, None)].astype(object)
            nv = v[np.clip(nxt, 0, len(d) - 1)].astype(object)
            pd_ = d[np.clip(prev, 0, None)].astype(object)
            nd_ = d[np.clip(nxt, 0, len(d) - 1)].astype(object)
            g = grid.astype(object)
            span = nd_ - pd_
            # +K offset on both anchors keeps the // numerator positive
            # (it cancels exactly: K*1000*span is divisible by span), so
            # Python floor-div and DuckDB truncate-div agree even for
            # negative daily sums (ADVICE r03; the convention split
            # similarity.py's _KM_OFFSET guards the same way)
            interp = np.where(
                obs == 1,
                v[np.clip(has, 0, None)].astype(object) * 1000,
                ((pv + _INTERP_OFF) * 1000 * (nd_ - g)
                 + (nv + _INTERP_OFF) * 1000 * (g - pd_))
                // np.where(span == 0, 1, span) - _INTERP_OFF * 1000,
            )
            out.append(
                pa.table(
                    {
                        "event_type": pa.array(
                            [types[s]] * width, pa.string()
                        ),
                        "day_idx": pa.array(grid, pa.int64()),
                        "observed": pa.array(obs, pa.int64()),
                        "interp_milli_cents": pa.array(
                            [int(x) for x in interp], pa.int64()
                        ),
                    }
                )
            )
        return pa.concat_tables(out)

    return grouped_map(sparse, ["event_type"], interp_block,
                       sort_within=["day_idx"])


def daily_linear_interp_sql() -> str:
    return (
        "WITH d AS (\n"
        " SELECT event_type, epoch_us(ts)//1000000//86400 AS day,\n"
        "  SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS cents\n"
        " FROM events GROUP BY 1, 2\n"
        "), b AS (\n"
        " SELECT event_type, MIN(day) AS lo, MAX(day) AS hi FROM d GROUP BY 1\n"
        "), grid AS (\n"
        " SELECT b.event_type, unnest(generate_series(b.lo, b.hi)) AS day FROM b\n"
        "), j AS (\n"
        " SELECT g.event_type, g.day, d.cents,\n"
        "  CASE WHEN d.cents IS NULL THEN 0 ELSE 1 END AS observed\n"
        " FROM grid g LEFT JOIN d ON d.event_type = g.event_type AND d.day = g.day\n"
        "), w AS (\n"
        " SELECT event_type, day, cents, observed,\n"
        "  last_value(cents IGNORE NULLS) OVER\n"
        "   (PARTITION BY event_type ORDER BY day ROWS UNBOUNDED PRECEDING) AS pv,\n"
        "  last_value(CASE WHEN observed = 1 THEN day END IGNORE NULLS) OVER\n"
        "   (PARTITION BY event_type ORDER BY day ROWS UNBOUNDED PRECEDING) AS pd,\n"
        "  first_value(cents IGNORE NULLS) OVER\n"
        "   (PARTITION BY event_type ORDER BY day\n"
        "    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,\n"
        "  first_value(CASE WHEN observed = 1 THEN day END IGNORE NULLS) OVER\n"
        "   (PARTITION BY event_type ORDER BY day\n"
        "    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd\n"
        " FROM j\n"
        ")\n"
        "SELECT event_type, day AS day_idx, CAST(observed AS BIGINT) AS observed,\n"
        " CAST(CASE WHEN observed = 1 THEN cents * 1000\n"
        f"      ELSE ((pv + {_INTERP_OFF}) * 1000 * (nd - day)"
        f" + (nv + {_INTERP_OFF}) * 1000 * (day - pd))\n"
        f"           // (nd - pd) - {_INTERP_OFF} * 1000"
        " END AS BIGINT) AS interp_milli_cents\n"
        "FROM w"
    )
