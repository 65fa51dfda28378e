"""decayed_user_value vs a plain-pandas oracle, including the dyadic
half-way weight (week 7 → 1e6/128 = 7812.5 → FLOOR, not ROUND)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _events_table():
    # anchor = max ts; rows placed so ages span weeks 0, 1, 7 (the
    # 7812.5-ppm half-way case) and a mid-week remainder that must
    # floor to the same whole week in both engines
    week = 7 * 86400
    rows = [
        # (ts_sec, user, type, value)
        (100 * week, 1, "purchase", 10.00),   # wk 0 → ppm 1_000_000
        (100 * week - 1, 1, "purchase", 10.00),  # age <1 wk → wk 0
        (99 * week, 1, "purchase", 4.00),     # exactly 1 wk → wk 1
        (93 * week, 2, "purchase", 1.28),     # wk 7 → ppm 7812 (floor!)
        (93 * week + 3600, 2, "purchase", 1.28),  # wk 6 remainder
        (95 * week, 2, "click", 999.0),       # filtered out
        (100 * week, 3, "view", 5.0),         # user with no purchases
    ]
    return pa.table(
        {
            "ts": pa.array(
                [r[0] * 1_000_000 for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def test_decayed_user_value_exact(ray_session):
    import ray.data as rd

    from ocr_ray.ops.stats import decayed_user_value

    out = decayed_user_value(_ds := rd.from_arrow(_events_table()))
    df = out.to_pandas()

    # hand-computed: weights ppm by whole weeks of age
    # user 1: 1000*1e6 + 1000*1e6 + 400*500000 = 2_200_000_000
    # user 2: wk7: 128 cents * 7812 = 999_936; wk6: 128 * 15625 = 2_000_000
    expect = pd.DataFrame(
        {
            "user_id": [1, 2],
            "decayed_micros": [2_200_000_000, 2_999_936],
            "n_events": [3, 2],
        }
    )
    pd.testing.assert_frame_equal(df.reset_index(drop=True), expect)


def test_decayed_user_value_no_purchases(ray_session):
    import ray.data as rd

    from ocr_ray.ops.stats import decayed_user_value

    t = _events_table().filter(
        pa.compute.equal(pa.compute.field("event_type"), "view")
    )
    out = decayed_user_value(rd.from_arrow(t))
    assert out.count() == 0
