"""Skew placement planner: hot-key isolation, LPT balance, and the
invariant gate — on a corpus where plain hashing would collapse."""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _skewed_events(n=6000, hot=7, hot_frac=0.6, seed=1):
    rng = np.random.RandomState(seed)
    users = np.where(
        rng.uniform(size=n) < hot_frac, hot, rng.randint(100, 400, n)
    ).astype(np.int64)
    return pa.table({"user_id": pa.array(users, pa.int64())}), users


def test_skew_placement_plan(ray_session):
    import ray.data as rd

    from ocr_ray.ops.skewplan import skew_placement_plan

    t, users = _skewed_events()
    plan, assignment = skew_placement_plan(
        rd.from_arrow(t).repartition(4), n_partitions=8
    )
    df = plan.to_pandas().set_index("partition").sort_index()
    # conservation
    assert int(df.total_load.sum()) == len(users)
    assert (df.total_load == df.tail_load + df.heavy_load).all()
    # the hot user is heavy and explicitly placed
    assert 7 in assignment
    # balance: the hot key dominates (60% of rows) so its partition is
    # the max, but every OTHER partition stays near the tail average
    hot_part = assignment[7]
    others = df.drop(index=hot_part).total_load
    assert others.max() <= (len(users) // 8) + others.min() + 200


def test_skew_plan_violations_empty(ray_session):
    import ray.data as rd

    from ocr_ray.ops.skewplan import skew_plan_violations

    t, _ = _skewed_events()
    gate = skew_plan_violations(rd.from_arrow(t).repartition(3))
    assert gate.num_rows == 0


def test_skew_plan_uniform_no_heavy(ray_session):
    import ray.data as rd

    from ocr_ray.ops.skewplan import skew_placement_plan

    rng = np.random.RandomState(9)
    users = rng.randint(0, 5000, 4000).astype(np.int64)
    t = pa.table({"user_id": pa.array(users, pa.int64())})
    plan, assignment = skew_placement_plan(
        rd.from_arrow(t), n_partitions=8, heavy_divisor=2
    )
    df = plan.to_pandas()
    assert int(df.total_load.sum()) == 4000
    # uniform keys: nothing crosses the heavy threshold
    assert assignment == {}
    assert (df.heavy_load == 0).all()


def test_skew_plan_empty_input(ray_session):
    import ray.data as rd

    from ocr_ray.ops.skewplan import skew_placement_plan, skew_plan_violations

    empty = rd.from_arrow(
        pa.schema([("user_id", pa.int64())]).empty_table()
    )
    plan, assignment = skew_placement_plan(empty)
    assert plan.num_rows == 0 and assignment == {}
    assert skew_plan_violations(empty).num_rows == 0
