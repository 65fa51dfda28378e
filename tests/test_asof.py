"""As-of join: most-recent-prior semantics, same-timestamp inclusion,
deterministic tie-break, null when no prior right row, key isolation."""
from __future__ import annotations

import datetime as dt

import pyarrow as pa
import ray.data as rd

from ocr_ray.ops.asof import purchases_with_last_click


def _ts(minute: int):
    return dt.datetime(2026, 1, 1, 10, minute)


def _events(rows):
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([_ts(r[1]) for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[0]) for r in rows], pa.float64()),
        }
    )


def test_asof_semantics(ray_session):
    rows = [
        # user 1: click@0, click@5, purchase@3 -> matches click@0;
        # purchase@5 (same ts as click 11) -> matches click@5
        (10, 0, 1, "click"),
        (11, 5, 1, "click"),
        (20, 3, 1, "purchase"),
        (21, 5, 1, "purchase"),
        # user 2: purchase@1 with NO prior click -> nulls; click@2 later
        (30, 2, 2, "click"),
        (40, 1, 2, "purchase"),
        # user 3: two clicks at the SAME ts -> max event_id (51) wins
        (50, 0, 3, "click"),
        (51, 0, 3, "click"),
        (60, 4, 3, "purchase"),
        # noise: other event types are ignored
        (70, 0, 1, "view"),
    ]
    out = (
        purchases_with_last_click(rd.from_arrow(_events(rows)))
        .to_pandas()
        .set_index("event_id")
    )
    assert len(out) == 4
    assert out.loc[20, "click_event_id"] == 10
    assert out.loc[21, "click_event_id"] == 11  # same-ts click matches
    assert out.loc[40, "click_event_id"] is None or (
        out.loc[40][["click_event_id"]].isna().all()
    )
    assert out.loc[60, "click_event_id"] == 51  # tie-break: max event_id
    assert out.loc[60, "click_value"] == 51.0
    # cross-user isolation: user 2's purchase never sees user 1's clicks
    assert out.loc[40][["click_event_id", "click_value"]].isna().all()


def test_range_count_1h(ray_session):
    """Window [ts − 1h, ts] is inclusive at both ends; same-ts clicks
    count; users are isolated; purchases with no clicks report 0."""
    import ray.data as rd

    from ocr_ray.ops.asof import purchases_click_count_1h

    rows = [
        # user 1: clicks at minutes 0, 30, 59 (two of them at 59,
        # including same-ts as the purchase) → purchase@59 counts 4
        (1, 0, 1, "click"),
        (2, 30, 1, "click"),
        (3, 59, 1, "click"),
        (4, 59, 1, "click"),
        (10, 59, 1, "purchase"),
        # user 2: no clicks at all → 0
        (20, 10, 2, "purchase"),
    ]
    out = (
        purchases_click_count_1h(rd.from_arrow(_events(rows)))
        .to_pandas()
        .set_index("event_id")
    )
    assert out.loc[10, "n_clicks_1h"] == 4
    assert out.loc[20, "n_clicks_1h"] == 0


def test_forward_asof_equal_ts_and_tiebreak(ray_session):
    """Forward as-of: an at-timestamp click matches; equal-ts clicks
    break to the SMALLEST event_id; a purchase after the user's last
    click gets nulls."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.ops.asof import purchases_with_next_click

    us = 1_000_000
    rows = [
        # user 1: purchase at t=10 with clicks at t=10 (ids 100, 101)
        (1, 1, 10 * us, "purchase", 0.0),
        (100, 1, 10 * us, "click", 5.0),
        (101, 1, 10 * us, "click", 7.0),
        # user 1: purchase at t=20, next click at t=25
        (2, 1, 20 * us, "purchase", 0.0),
        (102, 1, 25 * us, "click", 9.0),
        # user 2: purchase with no click ever after
        (3, 2, 30 * us, "purchase", 0.0),
        (103, 2, 29 * us, "click", 1.0),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    got = {
        r["event_id"]: (r["click_event_id"], r["click_value"])
        for r in purchases_with_next_click(
            rd.from_arrow(tbl).repartition(3)
        ).take_all()
    }
    assert got == {1: (100, 5.0), 2: (102, 9.0), 3: (None, None)}
