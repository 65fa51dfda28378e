"""user_active_time / cusum_drift vs hand oracles and the DuckDB SQL."""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ts(seconds):
    return pa.array(
        [int(s) * 1_000_000 for s in seconds], pa.timestamp("us")
    )


def test_user_active_time_hand(ray_session):
    import ray.data as rd

    from ocr_ray.ops.intervals import user_active_time

    events = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            # u1: [0,10]+[5,15] merge, [30,40] apart → 25s / 2 intervals
            # u2: [0,10]+[10,20] touch (s == prev_end) → merged → 20s / 1
            # u3: single → 10s / 1
            "ts": _ts([0, 5, 30, 0, 10, 100]),
        }
    )
    out = (
        user_active_time(rd.from_arrow(events), span_sec=10)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert out.loc[1, "active_sec"] == 25 and out.loc[1, "n_intervals"] == 2
    assert out.loc[2, "active_sec"] == 20 and out.loc[2, "n_intervals"] == 1
    assert out.loc[3, "active_sec"] == 10 and out.loc[3, "n_intervals"] == 1


def test_cusum_drift_hand(ray_session):
    import ray.data as rd

    from ocr_ray.ops.intervals import cusum_drift

    day = 86_400
    events = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 7], pa.int64()),
            # u1 daily sums: d0=1.0 (two events 0.25+0.75), d1=1.0, d2=4.0
            # → adj = 3x-tot = [-3e6,-3e6,+6e6], R=[-3,-6,0]e6,
            #   cusum = [0, 0, 6e6]
            "ts": _ts([0, 10, day, 2 * day, 0]),
            "value": pa.array([0.25, 0.75, 1.0, 4.0, 2.5], pa.float64()),
        }
    )
    out = cusum_drift(rd.from_arrow(events)).to_pandas()
    u1 = out[out.user_id == 1].sort_values("day_idx")
    assert list(u1.cusum) == [0, 0, 6_000_000]
    u7 = out[out.user_id == 7]
    assert list(u7.cusum) == [0]  # single day → adj = 1*x - x = 0


def test_intervals_vs_duckdb_multiblock(ray_session):
    """Both operators over a 4-block random corpus vs their own oracle
    SQL executed in DuckDB — the same compare the graft harness runs."""
    import duckdb
    import ray.data as rd

    from ocr_ray.ops.intervals import (
        cusum_drift,
        cusum_drift_sql,
        user_active_time,
        user_active_time_sql,
    )

    rng = np.random.default_rng(7)
    n = 4000
    events = pa.table(
        {
            "user_id": pa.array(rng.integers(1, 60, n), pa.int64()),
            "ts": pa.array(
                rng.integers(0, 20 * 86_400, n) * 1_000_000, pa.timestamp("us")
            ),
            "value": pa.array(
                np.round(rng.uniform(0.01, 99.99, n), 2), pa.float64()
            ),
        }
    )
    con = duckdb.connect()
    con.register("events", events)
    ds = rd.from_arrow(events).repartition(4)

    got = (
        user_active_time(ds, span_sec=1800)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        con.execute(user_active_time_sql(span_sec=1800) + " ORDER BY user_id")
        .df()
        .reset_index(drop=True)
    )
    assert got.astype("int64").equals(want.astype("int64"))

    got = (
        cusum_drift(ds)
        .to_pandas()
        .sort_values(["user_id", "day_idx"])
        .reset_index(drop=True)
    )
    want = (
        con.execute(cusum_drift_sql() + " ORDER BY user_id, day_idx")
        .df()
        .reset_index(drop=True)
    )
    assert got.astype("int64").equals(want.astype("int64"))
