"""sliding_window_distinct and activity_reconciliation vs hand oracles."""
from __future__ import annotations

import pyarrow as pa


def test_sliding_window_distinct(ray_session):
    import ray.data as rd

    from ocr_ray.ops.windows import sliding_window_distinct

    # events at t=0s (u1), t=100s (u1 dup), t=950s (u2): windows are 1h
    # wide sliding every 15 min. Window starting at -900s contains all
    # three events → 2 users; window 0s likewise; window -3600+900*3=-900…
    events = pa.table(
        {
            "ts": pa.array(
                [0, 100_000_000, 950_000_000], pa.timestamp("us")
            ),
            "user_id": pa.array([1, 1, 2], pa.int64()),
        }
    )
    out = sliding_window_distinct(
        rd.from_arrow(events), window_sec=3600, slide_sec=900
    ).to_pandas()
    got = {
        int(r.window_start.timestamp()): int(r.n_users)
        for r in out.itertuples()
    }
    # windows covering t∈{0,100}: starts -2700,-1800,-900,0
    # windows covering t=950: starts -1800,-900,0,900
    assert got == {
        -2700: 1,
        -1800: 2,
        -900: 2,
        0: 2,
        900: 1,
    }


def test_activity_reconciliation(ray_session):
    import ray.data as rd

    from ocr_ray.ops.stats import activity_reconciliation

    day = 86_400_000_000  # us
    orders = pa.table(
        {
            "o_orderdate": pa.array(
                [0, 0, day], pa.timestamp("us")
            )  # day0 ×2, day1 ×1
        }
    )
    events = pa.table(
        {
            "ts": pa.array(
                [day + 1, 2 * day + 5, 2 * day + 9], pa.timestamp("us")
            )  # day1 ×1, day2 ×2
        }
    )
    out = activity_reconciliation(
        rd.from_arrow(orders), rd.from_arrow(events)
    ).to_pandas()
    rows = [
        (int(r.day.timestamp()) // 86_400, int(r.n_orders), int(r.n_events))
        for r in out.itertuples()
    ]
    assert rows == [(0, 2, 0), (1, 1, 1), (2, 0, 2)]
