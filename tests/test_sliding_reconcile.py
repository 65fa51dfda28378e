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


def test_user_funnel_windowed_boundaries(ray_session):
    import ray.data as rd

    from ocr_ray.ops.stats import user_funnel

    day = 86_400_000_000
    rows = [
        # user 1: click exactly AT the 3-day bound (inclusive) → counts;
        # purchase 1 us past the 7-day bound → excluded → stage 2
        (1, 0, "signup"), (1, 3 * day, "click"),
        (1, 3 * day + 7 * day + 1, "purchase"),
        # user 2: click 1 us past the bound → stage 1 (even though a
        # later in-window purchase exists, the chain is broken)
        (2, 0, "signup"), (2, 3 * day + 1, "click"), (2, 4 * day, "purchase"),
        # user 3: full in-window chain, also an earlier out-of-window
        # click BEFORE signup that must not count
        (3, 5 * day, "click"), (3, 6 * day, "signup"),
        (3, 7 * day, "click"), (3, 8 * day, "purchase"),
    ]
    events = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    out = user_funnel(
        rd.from_arrow(events), windows=(3 * 86400, 7 * 86400)
    ).to_pandas()
    stages = dict(zip(out["user_id"].astype(int), out["stage"].astype(int)))
    assert stages == {1: 2, 2: 1, 3: 3}
