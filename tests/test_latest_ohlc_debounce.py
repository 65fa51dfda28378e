"""latest-row-per-key, daily OHLC, and chained debounce vs hand oracles."""
from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa

T0 = dt.datetime(2024, 1, 1)


def _events(rows):
    # rows: (user, sec, event_id, type, value)
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [T0 + dt.timedelta(seconds=float(r[1])) for r in rows],
                pa.timestamp("us"),
            ),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


def test_latest_event_per_user(ray_session):
    import ray.data as rd

    from ocr_ray.ops.windows import latest_event_per_user

    rows = [
        (1, 10, 1, "click", 1.0),
        (1, 20, 3, "purchase", 2.5),
        (1, 20, 2, "view", 9.0),  # same ts: event_id 3 wins
        (2, 5, 4, "view", 0.4),
    ]
    got = (
        latest_event_per_user(rd.from_arrow(_events(rows)))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert got.loc[1, "event_type"] == "purchase"
    assert int(got.loc[1, "cents"]) == 250
    assert got.loc[2, "event_type"] == "view"
    assert int(got.loc[2, "cents"]) == 40


def test_daily_value_ohlc(ray_session):
    import ray.data as rd

    from ocr_ray.ops.windows import daily_value_ohlc

    rows = [
        (1, 100, 1, "a", 5.0),     # day 0 open
        (2, 200, 2, "a", 1.0),     # day 0 low
        (3, 300, 3, "a", 9.0),     # day 0 high + close
        (4, 86400 + 10, 4, "a", 7.0),  # day 1 single event
    ]
    got = (
        daily_value_ohlc(rd.from_arrow(_events(rows)))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert got.loc[0, ["open_cents", "high_cents", "low_cents",
                       "close_cents", "n_events"]].tolist() == [
        500, 900, 100, 900, 3
    ]
    assert got.loc[1, ["open_cents", "close_cents", "n_events"]].tolist() == [
        700, 700, 1
    ]


def test_debounced_event_counts_chained(ray_session):
    import ray.data as rd

    from ocr_ray.ops.windows import debounced_event_counts

    # user 1 clicks at 0, 3, 6, 12 with gap 5s:
    # chained: keep 0 (drop 3: 3<5) keep 6 (6-0>=5? no — chained is vs
    # LAST SURVIVOR: 6-0>=5 -> keep), keep 12 (12-6>=5)
    rows = [
        (1, 0, 1, "click", 0.0),
        (1, 3, 2, "click", 0.0),
        (1, 6, 3, "click", 0.0),
        (1, 12, 4, "click", 0.0),
        (1, 1, 5, "view", 0.0),   # different type: independent chain
        (2, 0, 6, "click", 0.0),
        (2, 100, 7, "click", 0.0),
    ]
    got = (
        debounced_event_counts(rd.from_arrow(_events(rows)), gap_us=5_000_000)
        .to_pandas()
        .set_index("event_type")
    )
    assert int(got.loc["click", "n_raw"]) == 6
    assert int(got.loc["click", "n_survivors"]) == 5  # drops only t=3
    assert int(got.loc["view", "n_raw"]) == 1
    assert int(got.loc["view", "n_survivors"]) == 1


def test_multigrain_rollup(ray_session):
    import ray.data as rd

    from ocr_ray.ops.stats import multigrain_event_rollup

    rows = [
        (1, 0, 1, "a", 1.0),
        (2, 1800, 2, "a", 2.0),       # same hour as first
        (3, 7200, 3, "a", 4.0),       # different hour, same day
        (4, 86400 * 8, 4, "a", 8.0),  # next week
    ]
    got = (
        multigrain_event_rollup(rd.from_arrow(_events(rows)))
        .to_pandas()
    )
    by = {
        (r.grain, int(r.bucket_start)): (int(r.n_events), int(r.sum_cents))
        for r in got.itertuples()
    }
    HOUR, DAY, WEEK = 3_600_000_000, 86_400_000_000, 604_800_000_000
    t0_us = int(pa.scalar(T0, pa.timestamp("us")).value)
    h0 = (t0_us // HOUR) * HOUR
    assert by[("hour", h0)] == (2, 300)
    assert by[("hour", h0 + 2 * HOUR)] == (1, 400)
    d0 = (t0_us // DAY) * DAY
    assert by[("day", d0)] == (3, 700)
    w0 = (t0_us // WEEK) * WEEK
    w_next = ((t0_us + 8 * DAY) // WEEK) * WEEK
    assert by[("week", w0)] == (3, 700)
    assert by[("week", w_next)] == (1, 800)
    assert len([k for k in by if k[0] == "hour"]) == 3
