"""As-of (most-recent-prior) join — the custom temporal operator Ray
Data lacks natively, built as grouped_map over a single keyed shuffle.

Semantics: for every LEFT row, attach the payload of the RIGHT row with
the greatest ``time <= left.time`` for the same key (right rows at the
exact left timestamp match). Deterministic tie-break when several right
rows share a timestamp: the largest ``event_id`` wins.

Implementation (one exchange, vectorized fill):

1. one pass over the source emits tagged rows — right rows ``src=0``,
   left rows ``src=1`` — so both sides ride the SAME shuffle;
2. ``grouped_map`` hash-partitions by key and sorts each group by
   ``(time, src, event_id)``: a right row sorts before a left row at the
   equal timestamp, and equal-timestamp right rows sort ascending so the
   forward-carry naturally keeps the max event_id;
3. inside the block, a numpy ``maximum.accumulate`` over right-row
   indices forward-fills "index of the latest right row so far"; run
   starts clamp the carry so nothing leaks between keys. No Python
   per-row loop.

Partitioning assumption: one key's rows fit a block (same as every
grouped_map operator here) — keys are users/entities, their event
streams are small; a pathological single-key stream would need
time-range bucketing first.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def asof_attach(tagged, key: str, time: str, left_cols: list[str],
                payload_cols: list[str]):
    """``tagged``: Dataset of rows carrying ``src`` (0=right, 1=left),
    ``key``, ``time``, ``event_id``, the left columns and the right
    payload columns (nulls on the other side). Returns left rows with
    payload columns filled from the as-of match (null when none)."""
    from ocr_ray.stages.grouped import grouped_map

    def fill_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        out_schema = pa.schema(
            [block.schema.field(c) for c in (key, time, *left_cols)]
            + [block.schema.field(c) for c in payload_cols]
        )
        if n == 0:
            return out_schema.empty_table()
        src = block.column("src").to_numpy(zero_copy_only=False)
        idx = np.arange(n, dtype=np.int64)
        # index of the most recent right row at-or-before each position
        carry = np.maximum.accumulate(np.where(src == 0, idx, -1))
        # clamp at group boundaries: a carry pointing before the row's
        # run start is a leak from the previous key
        lengths = np.diff(np.append(starts, n))
        run_start = np.repeat(starts, lengths)
        carry = np.where(carry >= run_start, carry, -1)

        import pyarrow.compute as pc

        left_mask = src == 1
        left_rows = block.filter(pa.array(left_mask))
        match = carry[left_mask]
        has = pa.array(match >= 0)
        safe = pa.array(np.where(match >= 0, match, 0), pa.int64())
        cols = {c: left_rows.column(c) for c in (key, time, *left_cols)}
        for c in payload_cols:
            taken = block.column(c).take(safe)
            if isinstance(taken, pa.ChunkedArray):
                taken = taken.combine_chunks()
            # null-out rows with no as-of match (if_else keeps the type)
            cols[c] = pc.if_else(has, taken, pa.scalar(None, taken.type))
        return pa.table(cols).select(out_schema.names)

    return grouped_map(
        tagged, [key], fill_block, sort_within=(time, "src", "event_id")
    )


def range_count_attach(tagged, key: str, time: str, window_us: int,
                       count_name: str):
    """Key-scoped RANGE join, count form: for every left row (src=1),
    the number of right rows (src=0) with ``time`` in
    ``[left.time − window, left.time]`` (both ends inclusive), same key.
    One hash exchange; inside each sorted group the counts are two
    vectorized ``searchsorted`` calls over the right-row timestamps —
    no pairwise expansion, so a burst of N right rows costs O(N log N),
    not O(N²)."""
    from ocr_ray.stages.grouped import grouped_map

    def count_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        out_schema = pa.schema(
            [
                block.schema.field(key),
                block.schema.field(time),
                block.schema.field("event_id"),
                pa.field(count_name, pa.int64()),
            ]
        )
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        src = block.column("src").to_numpy(zero_copy_only=False)
        ts = block.column(time).cast(pa.int64()).to_numpy(zero_copy_only=False)
        cols = {
            key: [], time: [], "event_id": [], count_name: [],
        }
        key_vals = block.column(key).to_pylist()
        ts_col = block.column(time).to_pylist()
        ev = block.column("event_id").to_pylist()
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            run_src = src[s:e]
            right_ts = np.sort(ts[s:e][run_src == 0])
            left_idx = np.flatnonzero(run_src == 1) + s
            if len(left_idx) == 0:
                continue
            lts = ts[left_idx]
            hi = np.searchsorted(right_ts, lts, side="right")
            lo = np.searchsorted(right_ts, lts - window_us, side="left")
            counts = (hi - lo).astype(np.int64)
            for i, c in zip(left_idx, counts):
                cols[key].append(key_vals[i])
                cols[time].append(ts_col[i])
                cols["event_id"].append(ev[i])
                cols[count_name].append(int(c))
        return pa.table(
            {
                key: pa.array(cols[key], out_schema.field(key).type),
                time: pa.array(cols[time], out_schema.field(time).type),
                "event_id": pa.array(cols["event_id"], pa.int64()),
                count_name: pa.array(cols[count_name], pa.int64()),
            }
        )

    return grouped_map(tagged, [key], count_block, sort_within=(time,))


def purchases_click_count_1h(events):
    """For each 'purchase' event: how many 'click' events the same user
    made in the hour up to and including the purchase. Output
    (user_id, ts, event_id, n_clicks_1h)."""
    import pyarrow.compute as pc

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t.column("event_type"), value_set=pa.array(["click", "purchase"])
        )
        t = t.filter(keep)
        is_left = pc.equal(t.column("event_type"), "purchase")
        return pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "ts": t.column("ts"),
                "src": pc.cast(is_left, pa.int8()),
                "event_id": t.column("event_id").cast(pa.int64()),
            }
        )

    tagged = events.map_batches(tag, batch_format="pyarrow")
    return range_count_attach(
        tagged, key="user_id", time="ts",
        window_us=3_600_000_000, count_name="n_clicks_1h",
    )


def purchases_with_last_click(events):
    """For each 'purchase' event: the most recent at-or-before 'click'
    by the same user (click_event_id, click_value; null when the user
    never clicked before). Output (event_id, user_id, ts,
    click_event_id, click_value)."""

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        types = t.column("event_type")
        keep = pc.is_in(types, value_set=pa.array(["click", "purchase"]))
        t = t.filter(keep)
        is_left = pc.equal(t.column("event_type"), "purchase")
        return pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "ts": t.column("ts"),
                "src": pc.cast(is_left, pa.int8()),
                "event_id": t.column("event_id").cast(pa.int64()),
                "click_event_id": pc.if_else(
                    is_left,
                    pa.scalar(None, pa.int64()),
                    t.column("event_id").cast(pa.int64()),
                ),
                "click_value": pc.if_else(
                    is_left,
                    pa.scalar(None, pa.float64()),
                    t.column("value").cast(pa.float64()),
                ),
            }
        )

    tagged = events.map_batches(tag, batch_format="pyarrow")
    return asof_attach(
        tagged,
        key="user_id",
        time="ts",
        left_cols=["event_id"],
        payload_cols=["click_event_id", "click_value"],
    )


def asof_attach_forward(tagged, key: str, time: str, left_cols: list[str],
                        payload_cols: list[str]):
    """Forward as-of: for every LEFT row, attach the payload of the
    EARLIEST right row with ``time >= left.time`` for the same key
    (right rows at the exact left timestamp match; ties on timestamp
    break to the SMALLEST event_id — the mirror of the backward join's
    largest-wins). Same single-exchange shape as ``asof_attach``; inside
    each group the match is one vectorized ``searchsorted`` of left
    times into the ordered right times."""
    from ocr_ray.stages.grouped import grouped_map

    def fill_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        import pyarrow.compute as pc

        n = block.num_rows
        out_schema = pa.schema(
            [block.schema.field(c) for c in (key, time, *left_cols)]
            + [block.schema.field(c) for c in payload_cols]
        )
        if n == 0:
            return out_schema.empty_table()
        src = block.column("src").to_numpy(zero_copy_only=False)
        ts = block.column(time).cast(pa.int64()).to_numpy(zero_copy_only=False)
        ends = np.append(starts[1:], n)
        left_parts: list[np.ndarray] = []
        match_parts: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            run_src = src[s:e]
            # block order within the group is (time, src, event_id) —
            # so the right rows appear sorted by (time, event_id)
            p_r = np.flatnonzero(run_src == 0) + s
            p_l = np.flatnonzero(run_src == 1) + s
            if len(p_l) == 0:
                continue
            if len(p_r):
                idx = np.searchsorted(ts[p_r], ts[p_l], side="left")
                match = np.where(
                    idx < len(p_r), p_r[np.minimum(idx, len(p_r) - 1)], -1
                )
            else:
                match = np.full(len(p_l), -1, dtype=np.int64)
            left_parts.append(p_l)
            match_parts.append(match)
        if not left_parts:
            return out_schema.empty_table()
        left_idx = np.concatenate(left_parts)
        match_idx = np.concatenate(match_parts)
        left_rows = block.take(pa.array(left_idx, pa.int64()))
        has = pa.array(match_idx >= 0)
        safe = pa.array(np.where(match_idx >= 0, match_idx, 0), pa.int64())
        cols = {c: left_rows.column(c) for c in (key, time, *left_cols)}
        for c in payload_cols:
            taken = block.column(c).take(safe)
            if isinstance(taken, pa.ChunkedArray):
                taken = taken.combine_chunks()
            cols[c] = pc.if_else(has, taken, pa.scalar(None, taken.type))
        return pa.table(cols).select(out_schema.names)

    return grouped_map(
        tagged, [key], fill_block, sort_within=(time, "src", "event_id")
    )


def purchases_with_next_click(events):
    """For each 'purchase' event: the earliest at-or-after 'click' by
    the same user (null when the user never clicks again). Output
    (event_id, user_id, ts, click_event_id, click_value)."""
    import pyarrow.compute as pc

    def tag(t: pa.Table) -> pa.Table:
        types = t.column("event_type")
        keep = pc.is_in(types, value_set=pa.array(["click", "purchase"]))
        t = t.filter(keep)
        is_left = pc.equal(t.column("event_type"), "purchase")
        return pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "ts": t.column("ts"),
                "src": pc.cast(is_left, pa.int8()),
                "event_id": t.column("event_id").cast(pa.int64()),
                "click_event_id": pc.if_else(
                    is_left,
                    pa.scalar(None, pa.int64()),
                    t.column("event_id").cast(pa.int64()),
                ),
                "click_value": pc.if_else(
                    is_left,
                    pa.scalar(None, pa.float64()),
                    t.column("value").cast(pa.float64()),
                ),
            }
        )

    tagged = events.map_batches(tag, batch_format="pyarrow")
    return asof_attach_forward(
        tagged,
        key="user_id",
        time="ts",
        left_cols=["event_id"],
        payload_cols=["click_event_id", "click_value"],
    )


def attribution_linear_1h(events, window_us: int = 3_600_000_000,
                          scale: int = 1_000_000):
    """Linear multi-touch attribution: every non-purchase event in the
    hour strictly before a purchase shares that purchase's credit
    equally; credit quantizes to ``scale // n`` integer units so the
    big cross-cluster sum is exact (the established quantized-fraction
    pattern — floats only ever appear in final expressions).

    Scale shape: same as ``range_count_attach`` — one hash exchange on
    user_id; inside each sorted user run the touch windows resolve with
    two vectorized ``searchsorted`` calls and per-type prefix sums
    (types are a tiny fixed domain), so a user with N events costs
    O(N·K), never O(N²) pairwise expansion. Each block emits one
    partial row per event type; a ≤K-row keyed sum finishes.

    Output: (event_type, n_touches, credit) — n_touches the number of
    (touch, purchase) pairs, credit the summed quantized units."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ocr_ray.stages.grouped import grouped_map

    def tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "ts": t.column("ts"),
                "event_type": t.column("event_type"),
            }
        )

    part_schema = pa.schema(
        [("event_type", pa.string()), ("n_touches", pa.int64()),
         ("credit", pa.int64())]
    )

    def credit_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n == 0 or len(starts) == 0:
            return part_schema.empty_table()
        types = block.column("event_type")
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        enc = pc.dictionary_encode(types)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        names = enc.dictionary.to_pylist()
        k = len(names)
        is_p = np.array([t == "purchase" for t in names], bool)[codes]
        ts = block.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        touches = np.zeros(k, np.int64)
        credit = np.zeros(k, np.int64)
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            run_p = is_p[s:e]
            if not run_p.any() or run_p.all():
                continue
            # sort_within=ts ⇒ the run is time-ordered already
            ets = ts[s:e][~run_p]
            ecodes = codes[s:e][~run_p]
            pts = ts[s:e][run_p]
            lo = np.searchsorted(ets, pts - window_us, side="left")
            hi = np.searchsorted(ets, pts, side="left")
            cnt = hi - lo
            valid = cnt > 0
            if not valid.any():
                continue
            per = (scale // cnt[valid]).astype(np.int64)
            # per-type prefix counts over the touch subsequence
            for t_code in np.unique(ecodes):
                pref = np.concatenate(
                    [[0], np.cumsum(ecodes == t_code)]
                )
                c_t = pref[hi[valid]] - pref[lo[valid]]
                touches[t_code] += int(c_t.sum())
                credit[t_code] += int((c_t * per).sum())
        keep = touches > 0
        return pa.table(
            {
                "event_type": pa.array(
                    [names[i] for i in np.flatnonzero(keep)], pa.string()
                ),
                "n_touches": pa.array(touches[keep], pa.int64()),
                "credit": pa.array(credit[keep], pa.int64()),
            }
        )

    tagged = events.map_batches(tag, batch_format="pyarrow")
    return (
        grouped_map(tagged, ["user_id"], credit_block, sort_within=("ts",))
        .groupby("event_type")
        .aggregate(
            Sum("n_touches", alias_name="n_touches"),
            Sum("credit", alias_name="credit"),
        )
    )


def attribution_time_decay(events, bucket_us: int = 900_000_000,
                           n_buckets: int = 4, scale: int = 1 << 20):
    """Time-decay multi-touch attribution: a touch ``d`` buckets before
    the purchase earns ``scale >> d`` credit units (geometric half-life
    of one bucket). Weights are exact powers of two, so every credit is
    an exact integer — no float ``exp`` whose libm could differ from
    the oracle's.

    Same one-shuffle shape as ``attribution_linear_1h``: inside each
    time-sorted user run, each decay bucket resolves with two
    vectorized searchsorted calls against the touch subsequence and
    per-type prefix sums; cost O(N·K·B) with K event types and B
    buckets, never a pairwise expansion.

    Output: (event_type, n_touches, credit)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ocr_ray.stages.grouped import grouped_map

    def tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "ts": t.column("ts"),
                "event_type": t.column("event_type"),
            }
        )

    part_schema = pa.schema(
        [("event_type", pa.string()), ("n_touches", pa.int64()),
         ("credit", pa.int64())]
    )

    def credit_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n == 0 or len(starts) == 0:
            return part_schema.empty_table()
        types = block.column("event_type")
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        enc = pc.dictionary_encode(types)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        names = enc.dictionary.to_pylist()
        k = len(names)
        is_p = np.array([t == "purchase" for t in names], bool)[codes]
        ts = block.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        touches = np.zeros(k, np.int64)
        credit = np.zeros(k, np.int64)
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            run_p = is_p[s:e]
            if not run_p.any() or run_p.all():
                continue
            ets = ts[s:e][~run_p]
            ecodes = codes[s:e][~run_p]
            pts = ts[s:e][run_p]
            prefs = {
                int(c): np.concatenate([[0], np.cumsum(ecodes == c)])
                for c in np.unique(ecodes)
            }
            for b in range(n_buckets):
                # bucket b = touches with (pts - ets) in
                # [b*bucket, (b+1)*bucket), strictly before the purchase
                lo = np.searchsorted(
                    ets, pts - (b + 1) * bucket_us, side="right"
                )
                if b == 0:
                    hi = np.searchsorted(ets, pts, side="left")
                else:
                    hi = np.searchsorted(
                        ets, pts - b * bucket_us, side="right"
                    )
                if not (hi > lo).any():
                    continue
                w = scale >> b
                for c, pref in prefs.items():
                    c_t = pref[hi] - pref[lo]
                    touches[c] += int(c_t.sum())
                    credit[c] += int(c_t.sum()) * w
        keep = touches > 0
        return pa.table(
            {
                "event_type": pa.array(
                    [names[i] for i in np.flatnonzero(keep)], pa.string()
                ),
                "n_touches": pa.array(touches[keep], pa.int64()),
                "credit": pa.array(credit[keep], pa.int64()),
            }
        )

    tagged = events.map_batches(tag, batch_format="pyarrow")
    return (
        grouped_map(tagged, ["user_id"], credit_block, sort_within=("ts",))
        .groupby("event_type")
        .aggregate(
            Sum("n_touches", alias_name="n_touches"),
            Sum("credit", alias_name="credit"),
        )
    )


def attribution_time_decay_sql(bucket_us: int = 900_000_000,
                               n_buckets: int = 4,
                               scale: int = 1 << 20) -> str:
    window_us = bucket_us * n_buckets
    return (
        "WITH t AS (\n"
        " SELECT user_id, ts, event_type FROM events"
        " WHERE event_type <> 'purchase'\n"
        "), p AS (\n"
        " SELECT user_id, ts FROM events WHERE event_type = 'purchase'\n"
        ")\n"
        "SELECT t.event_type, CAST(COUNT(*) AS BIGINT) AS n_touches,\n"
        f" CAST(SUM({scale} >> CAST((epoch_us(p.ts) - epoch_us(t.ts))"
        f" // {bucket_us} AS BIGINT)) AS BIGINT) AS credit\n"
        "FROM p JOIN t ON t.user_id = p.user_id\n"
        " AND t.ts < p.ts\n"
        f" AND epoch_us(p.ts) - epoch_us(t.ts) < {window_us}\n"
        "GROUP BY t.event_type"
    )


def attribution_position(events, window_us: int = 3_600_000_000):
    """Position-based (U-shaped) multi-touch attribution: for each
    purchase, the click touches in the preceding ``window_us`` earn —
    n=1 touch: the whole credit (1/1); n=2: half each (1/2); n>=3:
    first and last 40% each (2/5), each middle an equal share of the
    remaining 20% (1/(5*(n-2))). Credit is emitted as an exact integer
    FRACTION (credit_numer, credit_denom) per (purchase, touch) pair —
    never a float division whose mixed denominators would make the sum
    order-sensitive. Touch order within a purchase window is
    (ts, event_id), so ties are deterministic on both sides.

    Scale shape: one hash shuffle on user_id, then each time-sorted
    user run resolves every purchase's window with two vectorized
    searchsorted calls; output is bounded by touches-in-window per
    purchase (the same expansion the SQL range self-join performs).

    Output: (purchase_id, click_id, position, credit_numer,
    credit_denom) with position in {'only','first','last','middle'}.
    """
    import pyarrow.compute as pc

    from ocr_ray.stages.grouped import grouped_map

    out_schema = pa.schema(
        [
            ("purchase_id", pa.int64()),
            ("click_id", pa.int64()),
            ("position", pa.string()),
            ("credit_numer", pa.int64()),
            ("credit_denom", pa.int64()),
        ]
    )

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["event_type"], value_set=pa.array(["click", "purchase"])
        )
        f = t.filter(keep)
        return pa.table(
            {
                "user_id": f["user_id"].cast(pa.int64()),
                "ts": f["ts"],
                "event_id": f["event_id"].cast(pa.int64()),
                "is_p": pc.equal(f["event_type"], "purchase"),
            }
        )

    def credit_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n == 0 or len(starts) == 0:
            return out_schema.empty_table()
        ts = block.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = block.column("event_id").to_numpy(zero_copy_only=False)
        is_p = block.column("is_p").to_numpy(zero_copy_only=False)
        ends = np.append(starts[1:], n)
        o_pid, o_cid, o_pos, o_num, o_den = [], [], [], [], []
        for s, e in zip(starts, ends):
            run_p = is_p[s:e]
            if not run_p.any() or run_p.all():
                continue
            cts = ts[s:e][~run_p]
            cid = eid[s:e][~run_p]
            pts = ts[s:e][run_p]
            pid = eid[s:e][run_p]
            # lo side="left" admits a click exactly window_us before the
            # purchase — mirrors the oracle's `<=` window bound
            lo = np.searchsorted(cts, pts - window_us, side="left")
            hi = np.searchsorted(cts, pts, side="left")
            for k in np.flatnonzero(hi > lo):
                w = slice(int(lo[k]), int(hi[k]))
                ids = cid[w]
                m = len(ids)
                if m == 1:
                    rows = [(int(ids[0]), "only", 1, 1)]
                elif m == 2:
                    rows = [
                        (int(ids[0]), "first", 1, 2),
                        (int(ids[1]), "last", 1, 2),
                    ]
                else:
                    mid_den = 5 * (m - 2)
                    rows = (
                        [(int(ids[0]), "first", 2, 5)]
                        + [
                            (int(i), "middle", 1, mid_den)
                            for i in ids[1:-1]
                        ]
                        + [(int(ids[-1]), "last", 2, 5)]
                    )
                for cidv, pos, num, den in rows:
                    o_pid.append(int(pid[k]))
                    o_cid.append(cidv)
                    o_pos.append(pos)
                    o_num.append(num)
                    o_den.append(den)
        return pa.table(
            {
                "purchase_id": pa.array(o_pid, pa.int64()),
                "click_id": pa.array(o_cid, pa.int64()),
                "position": pa.array(o_pos, pa.string()),
                "credit_numer": pa.array(o_num, pa.int64()),
                "credit_denom": pa.array(o_den, pa.int64()),
            }
        )

    tagged = events.map_batches(tag, batch_format="pyarrow")
    return grouped_map(
        tagged, ["user_id"], credit_block, sort_within=("ts", "event_id")
    )


def attribution_position_sql(window_us: int = 3_600_000_000) -> str:
    """SQL replay: range self-join purchases x clicks, ROW_NUMBER by
    (ts, event_id) within each purchase window, the same integer
    fraction table."""
    return (
        "WITH c AS (\n"
        " SELECT user_id, ts, event_id FROM events"
        " WHERE event_type = 'click'\n"
        "), p AS (\n"
        " SELECT user_id, ts, event_id FROM events"
        " WHERE event_type = 'purchase'\n"
        "), w AS (\n"
        " SELECT p.event_id AS purchase_id, c.event_id AS click_id,\n"
        "  ROW_NUMBER() OVER (PARTITION BY p.event_id"
        " ORDER BY c.ts, c.event_id) AS rn,\n"
        "  COUNT(*) OVER (PARTITION BY p.event_id) AS m\n"
        " FROM p JOIN c ON c.user_id = p.user_id AND c.ts < p.ts\n"
        f"  AND epoch_us(p.ts) - epoch_us(c.ts) <= {window_us}\n"
        ")\n"
        "SELECT purchase_id, click_id,\n"
        " CASE WHEN m = 1 THEN 'only' WHEN rn = 1 THEN 'first'\n"
        "      WHEN rn = m THEN 'last' ELSE 'middle' END AS position,\n"
        " CAST(CASE WHEN m <= 2 THEN 1 WHEN rn IN (1, m) THEN 2 ELSE 1"
        " END AS BIGINT) AS credit_numer,\n"
        " CAST(CASE WHEN m = 1 THEN 1 WHEN m = 2 THEN 2\n"
        "      WHEN rn IN (1, m) THEN 5 ELSE 5 * (m - 2)"
        " END AS BIGINT) AS credit_denom\n"
        "FROM w"
    )
