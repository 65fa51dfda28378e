"""event_trigrams / temporal_split_audit."""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ts(seconds):
    return pa.array([int(s) * 1_000_000 for s in seconds], pa.timestamp("us"))


def test_event_trigrams_hand(ray_session):
    import ray.data as rd

    from ocr_ray.ops.windows import event_trigrams

    events = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 2, 2, 2], pa.int64()),
            "ts": _ts([0, 1, 2, 3, 0, 1, 2]),
            "event_id": pa.array(list(range(7)), pa.int64()),
            "event_type": pa.array(
                ["a", "b", "c", "b", "a", "b", "c"], pa.string()
            ),
        }
    )
    out = event_trigrams(rd.from_arrow(events)).to_pandas()
    rows = {
        (r.t1, r.t2, r.t3): (int(r.n), int(r.rank))
        for r in out.itertuples()
    }
    # (a,b,c) appears in both users; (b,c,b) once in user 1
    assert rows[("a", "b", "c")] == (2, 1)
    assert rows[("b", "c", "b")] == (1, 2)
    assert len(rows) == 2


def test_event_trigrams_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from ocr_ray.ops.windows import event_trigrams, event_trigrams_sql

    rng = np.random.default_rng(41)
    n = 3000
    events = pa.table(
        {
            "user_id": pa.array(rng.integers(1, 50, n), pa.int64()),
            "ts": pa.array(
                rng.integers(0, 86_400, n) * 1_000_000, pa.timestamp("us")
            ),
            "event_id": pa.array(np.arange(n), pa.int64()),
            "event_type": pa.array(
                rng.choice(["u", "v", "w", "x"], n).tolist(), pa.string()
            ),
        }
    )
    got = event_trigrams(
        rd.from_arrow(events).repartition(4)
    ).to_pandas()
    con = duckdb.connect()
    con.register("events", events)
    want = con.execute(event_trigrams_sql()).df()
    assert got[["t1", "t2", "t3"]].values.tolist() == (
        want[["t1", "t2", "t3"]].values.tolist()
    )
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    assert list(got["rank"]) == list(want["rank"])


def test_temporal_split_audit_hand(ray_session):
    import ray.data as rd

    from ocr_ray.ops.windows import temporal_split_audit

    day = 86_400
    events = pa.table(
        {
            # first day observed = day 100 → cutoff = day 102
            # u1: only before; u2: both sides; u3: only after
            "user_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "ts": _ts(
                [
                    100 * day,
                    101 * day,
                    100 * day,
                    103 * day,
                    105 * day,
                ]
            ),
        }
    )
    out = temporal_split_audit(
        rd.from_arrow(events), cutoff_day=2
    ).to_pandas()
    r = out.iloc[0]
    assert r.n_users == 3
    assert r.n_train_only == 1
    assert r.n_test_only == 1
    assert r.n_cross == 1
    assert r.cross_millionths == 1_000_000 // 3
