"""Interval-union and control-chart analytics over the event log.

Two operator families the reference's run-history rollups
(ocr_service.py run stats; app/middleware/auth.py sliding-window rate
accounting) gesture at but never compute, both standard in large-scale
usage/telemetry pipelines:

- ``user_active_time``: per-user UNION length of event-anchored
  intervals [ts, ts+span] — the "billable active seconds" metric. The
  sweep identity makes it one hash shuffle: within a user's
  time-ordered run, an interval's novel contribution is
  ``max(0, end_i - max(start_i, end_{i-1}))`` (ends are monotone when
  span is constant), so a vectorized clip + segment-sum replaces the
  classic stack-merge loop.

- ``cusum_drift``: per-user one-sided CUSUM over the daily value
  series, exact in integers. ``S_t = max(0, S_{t-1} + a_t)`` has the
  reflection closed form ``S_t = R_t - min(0, min_{j<=t} R_j)`` with
  ``R`` the plain running sum — so the sequential control chart
  becomes two windowed scans, both expressible in SQL for the oracle
  and as a vectorized cumsum/cummin per user run here. Deviations are
  self-normalized without rational arithmetic by scaling: with
  ``x_t`` the day sum and ``n``/``tot`` the user's day count/total,
  ``a_t = n*x_t - tot`` (CUSUM commutes with positive scaling).

All quantities are exact int64 (micro-units via the DuckDB-compatible
half-away-from-zero rounding in driver._cents) — no float drift between
the Ray path and the DuckDB oracle.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _epoch_seconds(ts_col) -> np.ndarray:
    if isinstance(ts_col, pa.ChunkedArray):
        ts_col = ts_col.combine_chunks()
    return (
        pc.cast(ts_col, pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
    )


def user_active_time(events, span_sec: int = 1800):
    """(user_id, n_intervals, active_sec): union length of the per-event
    intervals [ts, ts + span_sec] per user, plus the merged-interval
    count. One hash shuffle of (user_id, ts); inside each block the
    merge is a clip + np.add.reduceat — no per-interval Python."""
    from ocr_ray.stages.grouped import grouped_map

    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_intervals", pa.int64()),
            ("active_sec", pa.int64()),
        ]
    )

    def block_fn(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n == 0 or len(starts) == 0:
            return schema.empty_table()
        users = block.column("user_id").to_numpy(zero_copy_only=False)
        s = _epoch_seconds(block["ts"])  # sorted within each user run
        e = s + span_sec
        # previous interval's end within the run; at run starts pretend
        # prev_end == own start so the first interval contributes span
        # and is not counted as a gap
        prev_e = np.empty(n, dtype=np.int64)
        prev_e[1:] = e[:-1]
        prev_e[starts] = s[starts]
        contrib = np.clip(e - np.maximum(s, prev_e), 0, None)
        contrib[starts] = span_sec
        gaps = (s > prev_e).astype(np.int64)
        active = np.add.reduceat(contrib, starts)
        n_iv = np.add.reduceat(gaps, starts) + 1
        return pa.table(
            {
                "user_id": pa.array(users[starts], pa.int64()),
                "n_intervals": pa.array(n_iv, pa.int64()),
                "active_sec": pa.array(active, pa.int64()),
            }
        )

    return grouped_map(events, ["user_id"], block_fn, sort_within=["ts"])


def user_active_time_sql(span_sec: int = 1800) -> str:
    """DuckDB oracle: the same sweep identity via window functions."""
    return (
        "WITH iv AS (\n"
        " SELECT user_id, epoch_us(ts)//1000000 AS s,\n"
        f"  epoch_us(ts)//1000000 + {span_sec} AS e\n"
        " FROM events\n"
        "), m AS (\n"
        " SELECT user_id, s, e,\n"
        "  MAX(e) OVER (PARTITION BY user_id ORDER BY s, e\n"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe\n"
        " FROM iv\n"
        ")\n"
        "SELECT user_id,\n"
        " CAST(SUM(CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_intervals,\n"
        f" CAST(SUM(CASE WHEN pe IS NULL THEN {span_sec}\n"
        "  ELSE GREATEST(e - GREATEST(s, pe), 0) END) AS BIGINT) AS active_sec\n"
        "FROM m GROUP BY user_id"
    )


def cusum_drift(events):
    """(user_id, day_idx, cusum): one-sided CUSUM of the user's daily
    value sums against their own mean, exact in scaled int64
    (micro-units × day-count). Stage 1 pre-aggregates (user, day)
    micro-sums inside each batch; stage 2 is one hash shuffle by
    user_id with the reflection-identity scan per run."""
    from ocr_ray.driver import _cents
    from ocr_ray.stages.grouped import grouped_map

    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("day_idx", pa.int64()),
            ("cusum", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("day_idx", pa.int64()),
                    ("x_micro", pa.int64()),
                ]
            ).empty_table()
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        days = _epoch_seconds(t["ts"]) // 86400
        micro = _cents(t["value"], 1_000_000.0).to_numpy(zero_copy_only=False)
        key = users * 1_000_000 + days  # day_idx < 1e6 (epoch days ~2e4)
        uniq, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, micro)
        return pa.table(
            {
                "user_id": pa.array(uniq // 1_000_000, pa.int64()),
                "day_idx": pa.array(uniq % 1_000_000, pa.int64()),
                "x_micro": pa.array(sums, pa.int64()),
            }
        )

    def block_fn(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n == 0 or len(starts) == 0:
            return schema.empty_table()
        users = block.column("user_id").to_numpy(zero_copy_only=False)
        days = block.column("day_idx").to_numpy(zero_copy_only=False)
        x = block.column("x_micro").to_numpy(zero_copy_only=False).copy()
        # combine partial rows for the same (user, day) — the block is
        # sorted by (user_id, day_idx) so duplicates are adjacent
        change = np.ones(n, dtype=bool)
        change[1:] = (users[1:] != users[:-1]) | (days[1:] != days[:-1])
        first = np.flatnonzero(change)
        x = np.add.reduceat(x, first)
        users, days = users[first], days[first]
        # remap user-run starts onto the combined rows
        run_starts = np.searchsorted(first, starts)
        run_starts = np.unique(run_starts)
        ends = np.append(run_starts[1:], len(users))
        counts = ends - run_starts
        tots = np.add.reduceat(x, run_starts)
        adj = np.repeat(counts, counts) * x - np.repeat(tots, counts)
        out_cusum = np.empty(len(x), dtype=np.int64)
        for s, e in zip(run_starts, ends):
            run = np.cumsum(adj[s:e])
            runmin = np.minimum.accumulate(run)
            out_cusum[s:e] = run - np.minimum(runmin, 0)
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "day_idx": pa.array(days, pa.int64()),
                "cusum": pa.array(out_cusum, pa.int64()),
            }
        )

    pre = events.map_batches(partials, batch_format="pyarrow")
    return grouped_map(pre, ["user_id"], block_fn, sort_within=["day_idx"])


def cusum_drift_sql() -> str:
    """DuckDB oracle: reflection identity S_t = R_t - LEAST(0, min R)."""
    return (
        "WITH d AS (\n"
        " SELECT user_id, epoch_us(ts)//1000000//86400 AS day_idx,\n"
        "  SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS x\n"
        " FROM events GROUP BY 1, 2\n"
        "), s AS (\n"
        " SELECT user_id, day_idx, x,\n"
        "  COUNT(*) OVER (PARTITION BY user_id) AS n,\n"
        "  SUM(x) OVER (PARTITION BY user_id) AS tot\n"
        " FROM d\n"
        "), r AS (\n"
        " SELECT user_id, day_idx,\n"
        "  SUM(n*x - tot) OVER (PARTITION BY user_id ORDER BY day_idx) AS run\n"
        " FROM s\n"
        "), mm AS (\n"
        " SELECT user_id, day_idx, run,\n"
        "  MIN(run) OVER (PARTITION BY user_id ORDER BY day_idx) AS runmin\n"
        " FROM r\n"
        ")\n"
        "SELECT user_id, day_idx,\n"
        " CAST(run - LEAST(0, runmin) AS BIGINT) AS cusum\n"
        "FROM mm"
    )


def order_gap_hist(orders):
    """Histogram of per-customer consecutive order gaps in whole days —
    (gap_days, n_pairs) — the repeat-purchase cadence profile behind
    churn models. One hash shuffle on o_custkey; gaps resolve inside
    each (custkey)-sorted run vectorized, then a tiny keyed count
    collapses the bounded gap domain. Ordering within a customer is
    (o_orderdate, o_orderkey), so equal-date ties are deterministic on
    both sides.
    """
    from ray.data.aggregate import Sum

    from ocr_ray.stages.grouped import grouped_map

    DAY_US = 86_400_000_000

    def tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cust": t["o_custkey"].cast(pa.int64()),
                "ts": t["o_orderdate"].cast(pa.int64()),
                "ok": t["o_orderkey"].cast(pa.int64()),
            }
        )

    part_schema = pa.schema(
        [("gap_days", pa.int64()), ("n", pa.int64())]
    )

    def gaps_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n == 0 or len(starts) == 0:
            return part_schema.empty_table()
        ts = block.column("ts").to_numpy(zero_copy_only=False)
        ends = np.append(starts[1:], n)
        out: dict[int, int] = {}
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            d = (ts[s + 1:e] - ts[s:e - 1]) // DAY_US
            vals, cnts = np.unique(d, return_counts=True)
            for v, c in zip(vals, cnts):
                out[int(v)] = out.get(int(v), 0) + int(c)
        if not out:
            return part_schema.empty_table()
        ks = sorted(out)
        return pa.table(
            {
                "gap_days": pa.array(ks, pa.int64()),
                "n": pa.array([out[k] for k in ks], pa.int64()),
            }
        )

    tagged = orders.map_batches(tag, batch_format="pyarrow")
    return (
        grouped_map(tagged, ["cust"], gaps_block, sort_within=("ts", "ok"))
        .groupby("gap_days")
        .aggregate(Sum("n", alias_name="n_pairs"))
    )


def order_gap_hist_sql() -> str:
    return (
        "WITH g AS (\n"
        " SELECT o_custkey,\n"
        "  (epoch_us(o_orderdate) - epoch_us(LAG(o_orderdate) OVER w))"
        " // 86400000000 AS gap_days\n"
        " FROM orders\n"
        " WINDOW w AS (PARTITION BY o_custkey"
        " ORDER BY o_orderdate, o_orderkey)\n"
        ")\n"
        "SELECT CAST(gap_days AS BIGINT) AS gap_days,"
        " CAST(COUNT(*) AS BIGINT) AS n_pairs\n"
        "FROM g WHERE gap_days IS NOT NULL GROUP BY 1"
    )
