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


# ----------------------------------------- daily-count autocorrelation


def autocorr_daily(events, max_lag: int = 7):
    """Lag-1..``max_lag`` Pearson autocorrelation of the daily
    event-count series — the periodicity probe (a strong lag-7 spike
    means weekly seasonality) run before picking a training-data time
    split. Lags are in ROW space over the observed-day series sorted
    ascending (missing days are skipped, exactly like the SQL LEAD
    replay over the same ordered series).

    Scale shape: the corpus reduces map-side to per-day counts (one
    keyed aggregate, bounded by #days); the lag products fold
    driver-side in exact Python big-int arithmetic, and the ONLY float
    ops are the final casts + sqrt + divide, written identically in
    the oracle so the statistic compares bit-exact.

    Output: (lag, n_pairs, corr).
    """
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us")
        )
        g = pa.table({"day": day}).group_by(["day"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["day", "n"])

    rows = (
        events.map_batches(partials, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
    ).take_all()  # bounded by #days
    rows.sort(key=lambda r: r["day"])
    x = [int(r["n"]) for r in rows]

    out_lag, out_n, out_corr = [], [], []
    for k in range(1, max_lag + 1):
        m = len(x) - k
        if m < 2:
            continue
        a = x[:m]
        b = x[k:]
        s1 = sum(a)
        s2 = sum(b)
        q1 = sum(v * v for v in a)
        q2 = sum(v * v for v in b)
        q11 = sum(u * v for u, v in zip(a, b))
        num = m * q11 - s1 * s2
        d1 = m * q1 - s1 * s1
        d2 = m * q2 - s2 * s2
        if d1 == 0 or d2 == 0:
            continue  # constant series: correlation undefined
        corr = float(num) / (
            np.sqrt(np.float64(d1)) * np.sqrt(np.float64(d2))
        )
        out_lag.append(k)
        out_n.append(m)
        out_corr.append(float(corr))
    return pa.table(
        {
            "lag": pa.array(out_lag, pa.int64()),
            "n_pairs": pa.array(out_n, pa.int64()),
            "corr": pa.array(out_corr, pa.float64()),
        }
    )


def autocorr_daily_sql(max_lag: int = 7) -> str:
    """SQL replay: daily counts, LEAD(k) over the ordered day series,
    HUGEINT moment sums, then the identical DOUBLE cast/sqrt/divide."""
    legs = []
    for k in range(1, max_lag + 1):
        legs.append(
            "SELECT CAST({k} AS BIGINT) AS lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,\n"
            " CAST(COUNT(*) * SUM(a * b) - SUM(a) * SUM(b) AS DOUBLE)\n"
            "  / (SQRT(CAST(COUNT(*) * SUM(a * a) - SUM(a) * SUM(a)"
            " AS DOUBLE))\n"
            "     * SQRT(CAST(COUNT(*) * SUM(b * b) - SUM(b) * SUM(b)"
            " AS DOUBLE))) AS corr\n"
            "FROM (SELECT n AS a, LEAD(n, {k}) OVER (ORDER BY day) AS b"
            " FROM daily) WHERE b IS NOT NULL\n"
            "HAVING COUNT(*) >= 2\n"
            " AND COUNT(*) * SUM(a * a) - SUM(a) * SUM(a) <> 0\n"
            " AND COUNT(*) * SUM(b * b) - SUM(b) * SUM(b) <> 0".format(k=k)
        )
    return (
        "WITH daily AS (\n"
        " SELECT date_trunc('day', ts) AS day, COUNT(*) AS n\n"
        " FROM events GROUP BY 1\n"
        ")\n" + "\nUNION ALL\n".join(legs)
    )


# ------------------------------------ day-over-day active-user overlap


def dau_jaccard(events):
    """Jaccard overlap between consecutive days' active-user sets —
    (day, dau, dau_next, inter, jaccard) for every day whose successor
    day is also observed. The retention/churn shape: a sudden Jaccard
    drop means the audience turned over.

    Scale shape: distinct (day, user) pairs collapse map-side; each
    pair emits itself tagged 'cur' and its PREVIOUS day tagged 'nxt',
    so one keyed aggregate co-locates day d's users with day d+1's.
    The per-day fold is a second tiny keyed pass. No self-join, no
    driver materialization beyond the bounded day table.
    """
    from ray.data.aggregate import Max, Sum

    from ocr_ray.stages.grouped import grouped_map

    DAY_US = 86_400_000_000

    def tag(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us")),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        users = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # map-side dedup before fan-out
        pairs = np.unique(np.stack([day, users], axis=1), axis=0)
        d, u = pairs[:, 0], pairs[:, 1]
        return pa.table(
            {
                "day_us": pa.array(np.concatenate([d, d - DAY_US]), pa.int64()),
                "user_id": pa.array(np.concatenate([u, u]), pa.int64()),
                "cur": pa.array(
                    np.concatenate(
                        [np.ones(len(d), np.int64), np.zeros(len(d), np.int64)]
                    ),
                    pa.int64(),
                ),
                "nxt": pa.array(
                    np.concatenate(
                        [np.zeros(len(d), np.int64), np.ones(len(d), np.int64)]
                    ),
                    pa.int64(),
                ),
            }
        )

    flags = (
        events.map_batches(tag, batch_format="pyarrow")
        .groupby(["day_us", "user_id"])
        .aggregate(Max("cur", alias_name="cur"), Max("nxt", alias_name="nxt"))
    )

    out_schema = pa.schema(
        [
            ("day", pa.timestamp("us")),
            ("dau", pa.int64()),
            ("dau_next", pa.int64()),
            ("inter", pa.int64()),
            ("jaccard", pa.float64()),
        ]
    )

    def fold(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n == 0 or block.num_columns == 0:
            return out_schema.empty_table()
        ends = np.append(starts[1:], n)
        day_us = block.column("day_us").to_numpy(zero_copy_only=False)
        cur = block.column("cur").to_numpy(zero_copy_only=False)
        nxt = block.column("nxt").to_numpy(zero_copy_only=False)
        o_day, o_dau, o_dn, o_in, o_j = [], [], [], [], []
        for s, e in zip(starts, ends):
            c = int(cur[s:e].sum())
            x = int(nxt[s:e].sum())
            i = int((cur[s:e] * nxt[s:e]).sum())
            if c == 0 or x == 0:
                continue  # day or its successor not observed
            o_day.append(int(day_us[s]))
            o_dau.append(c)
            o_dn.append(x)
            o_in.append(i)
            o_j.append(float(i) / float(c + x - i))
        return pa.table(
            {
                "day": pa.array(o_day, pa.int64()).cast(pa.timestamp("us")),
                "dau": pa.array(o_dau, pa.int64()),
                "dau_next": pa.array(o_dn, pa.int64()),
                "inter": pa.array(o_in, pa.int64()),
                "jaccard": pa.array(o_j, pa.float64()),
            }
        )

    return grouped_map(flags, ["day_us"], fold)


def dau_jaccard_sql() -> str:
    return (
        "WITH du AS (\n"
        " SELECT DISTINCT date_trunc('day', ts) AS day, user_id"
        " FROM events\n"
        "), t AS (\n"
        " SELECT day, user_id, 1 AS cur, 0 AS nxt FROM du\n"
        " UNION ALL\n"
        " SELECT day - INTERVAL 1 DAY, user_id, 0, 1 FROM du\n"
        "), g AS (\n"
        " SELECT day, user_id, MAX(cur) AS cur, MAX(nxt) AS nxt\n"
        " FROM t GROUP BY 1, 2\n"
        ")\n"
        "SELECT day, CAST(SUM(cur) AS BIGINT) AS dau,\n"
        " CAST(SUM(nxt) AS BIGINT) AS dau_next,\n"
        " CAST(SUM(cur * nxt) AS BIGINT) AS inter,\n"
        " CAST(SUM(cur * nxt) AS DOUBLE)\n"
        "  / CAST(SUM(cur) + SUM(nxt) - SUM(cur * nxt) AS DOUBLE)"
        " AS jaccard\n"
        "FROM g GROUP BY day\n"
        "HAVING SUM(cur) > 0 AND SUM(nxt) > 0"
    )


def rolling_corr_daily(events, window: int = 7):
    """Rolling Pearson correlation between the daily event COUNT and
    the daily revenue (exact cents) series, over a window of
    ``window`` consecutive OBSERVED days (row-space, like
    ``autocorr_daily``) — the load-vs-revenue coupling monitor a
    capacity/mix decision reads.

    Scale shape: one keyed aggregate collapses the stream to
    (day, n, cents) — bounded by #days — and the rolling moments fold
    driver-side over that bounded series in exact big-int arithmetic.
    The ONLY floats are the final casts + sqrt + divide, written
    identically in the oracle (window SUMs over HUGEINT there), so the
    statistic compares bit-exact.

    Output: (day, n_days, corr) for every window fully inside the
    observed-day series with nonzero variance on both sides.
    """
    from ray.data.aggregate import Sum

    from ocr_ray.driver import _cents

    def partials(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us")
        )
        g = (
            pa.table({"day": day, "cents": _cents(t["value"])})
            .group_by(["day"])
            .aggregate([("cents", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["day", "cents", "n"])

    rows = (
        events.map_batches(partials, batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            Sum("cents", alias_name="cents"), Sum("n", alias_name="n")
        )
    ).take_all()  # bounded by #days
    rows.sort(key=lambda r: r["day"])
    days = [r["day"] for r in rows]
    xs = [int(r["n"]) for r in rows]
    ys = [int(r["cents"]) for r in rows]

    out_day, out_n, out_c = [], [], []
    for i in range(window - 1, len(xs)):
        a = xs[i - window + 1 : i + 1]
        b = ys[i - window + 1 : i + 1]
        m = window
        s1, s2 = sum(a), sum(b)
        q1 = sum(v * v for v in a)
        q2 = sum(v * v for v in b)
        q11 = sum(u * v for u, v in zip(a, b))
        num = m * q11 - s1 * s2
        d1 = m * q1 - s1 * s1
        d2 = m * q2 - s2 * s2
        if d1 == 0 or d2 == 0:
            continue
        corr = float(num) / (
            np.sqrt(np.float64(d1)) * np.sqrt(np.float64(d2))
        )
        out_day.append(days[i])
        out_n.append(m)
        out_c.append(float(corr))
    return pa.table(
        {
            "day": pa.array(out_day, pa.timestamp("us")),
            "n_days": pa.array(out_n, pa.int64()),
            "corr": pa.array(out_c, pa.float64()),
        }
    )


def rolling_corr_daily_sql(window: int = 7) -> str:
    w = window - 1
    return (
        "WITH d AS (\n"
        " SELECT date_trunc('day', ts) AS day,\n"
        "  COUNT(*)::HUGEINT AS n,\n"
        "  SUM(CAST(ROUND(value * 100.0) AS BIGINT))::HUGEINT AS cents\n"
        " FROM events GROUP BY 1\n"
        "), m AS (\n"
        " SELECT day,\n"
        f"  COUNT(*) OVER w AS cnt,\n"
        "  SUM(n) OVER w AS s1, SUM(cents) OVER w AS s2,\n"
        "  SUM(n * n) OVER w AS q1, SUM(cents * cents) OVER w AS q2,\n"
        "  SUM(n * cents) OVER w AS q11\n"
        " FROM d\n"
        f" WINDOW w AS (ORDER BY day ROWS BETWEEN {w} PRECEDING AND CURRENT ROW)\n"
        "), f AS (\n"
        f" SELECT day, {window}::HUGEINT * q11 - s1 * s2 AS num,\n"
        f"  {window}::HUGEINT * q1 - s1 * s1 AS d1,\n"
        f"  {window}::HUGEINT * q2 - s2 * s2 AS d2\n"
        f" FROM m WHERE cnt = {window}\n"
        ")\n"
        f"SELECT day, {window}::BIGINT AS n_days,\n"
        " CAST(num AS DOUBLE) / (sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE))) AS corr\n"
        "FROM f WHERE d1 <> 0 AND d2 <> 0"
    )
