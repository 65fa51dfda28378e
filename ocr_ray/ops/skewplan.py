"""Skew-aware placement planning: heavy keys explicit, tail hashed.

The production recipe for a skewed shuffle key: keys hot enough to
imbalance a hash partitioning get EXPLICIT placements chosen by greedy
LPT (largest processing time first onto the least-loaded partition);
the long tail stays on plain hash partitioning. The planner emits the
per-partition projected loads so a job can validate balance BEFORE
paying for the shuffle — the missing step between "we salted it" and
"we proved the salt works".

Scale shape: per-key counts reduce through one keyed aggregate; only
keys above the heavy threshold are collected driver-side (bounded by
total/threshold — a few hundred at any skew worth planning for); tail
loads fold map-side into one slim row per (block, partition).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

_PLAN_SCHEMA = pa.schema(
    [
        ("partition", pa.int64()),
        ("tail_load", pa.int64()),
        ("heavy_load", pa.int64()),
        ("total_load", pa.int64()),
        ("n_heavy_keys", pa.int64()),
    ]
)

_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(0xFFFFFFFF)


def skew_placement_plan(events, key_col: str = "user_id",
                        n_partitions: int = 8,
                        heavy_divisor: int = 32):
    """Plan a skew-defused partitioning of ``key_col``: keys with more
    than ``total / (n_partitions * heavy_divisor)`` rows are placed
    greedily (count DESC, key ASC, onto the least-loaded partition —
    deterministic LPT); the rest hash by Knuth multiply. Returns
    (plan_table, heavy_assignment) where plan_table is one row per
    partition (projected loads) and heavy_assignment maps each heavy
    key to its partition."""
    from ray.data.aggregate import Sum

    from ocr_ray.stages.grouped import grouped_map  # noqa: F401 (doc link)

    def count_partials(t: pa.Table) -> pa.Table:
        g = (
            t.select([key_col])
            .group_by(key_col)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["key", "n"])

    counts = (
        events.map_batches(count_partials, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
    ).materialize()  # slim (key, n); feeds the threshold probe AND the fold

    tot_row = counts.aggregate(Sum("n", alias_name="t"))
    total = int((tot_row or {"t": 0})["t"] or 0)
    if total == 0:
        return _PLAN_SCHEMA.empty_table(), {}
    threshold = total // (n_partitions * heavy_divisor)

    # heavy keys: bounded driver collect (≤ total/threshold keys);
    # vectorized batch filter, never a per-row Python predicate
    import pyarrow.compute as pc

    heavy_rows = counts.map_batches(
        lambda t, _th=threshold: t.filter(pc.greater(t["n"], _th)),
        batch_format="pyarrow",
    ).take_all()
    heavy = sorted(
        ((int(r["n"]), int(r["key"])) for r in heavy_rows),
        key=lambda x: (-x[0], x[1]),
    )
    heavy_arr = np.array(sorted(k for _, k in heavy), np.int64)

    # tail loads per partition: map-side fold, one slim row per block
    import ray

    heavy_ref = ray.put(heavy_arr)

    def tail_fold(t: pa.Table, _ref=heavy_ref) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.schema(
                [("partition", pa.int64()), ("load", pa.int64())]
            ).empty_table()
        hk = ray.get(_ref)
        keys = t.column("key").to_numpy(zero_copy_only=False)
        ns = t.column("n").to_numpy(zero_copy_only=False)
        mask = ~np.isin(keys, hk)
        part = (
            (keys[mask].astype(np.uint64) * _KNUTH) & _M32
        ) % np.uint64(n_partitions)
        loads = np.zeros(n_partitions, np.int64)
        np.add.at(loads, part.astype(np.int64), ns[mask])
        return pa.table(
            {
                "partition": pa.array(np.arange(n_partitions), pa.int64()),
                "load": pa.array(loads, pa.int64()),
            }
        )

    tail_rows = (
        counts.map_batches(tail_fold, batch_format="pyarrow")
        .groupby("partition")
        .aggregate(Sum("load", alias_name="load"))
    ).take_all()
    tail = np.zeros(n_partitions, np.int64)
    for r in tail_rows:
        tail[int(r["partition"])] = int(r["load"])

    # greedy LPT over the heavy keys, seeded with the tail loads
    loads = tail.astype(np.int64).copy()
    heavy_load = np.zeros(n_partitions, np.int64)
    n_heavy = np.zeros(n_partitions, np.int64)
    assignment: dict[int, int] = {}
    for cnt, key in heavy:
        p = int(np.argmin(loads))  # ties -> lowest partition id
        assignment[key] = p
        loads[p] += cnt
        heavy_load[p] += cnt
        n_heavy[p] += 1

    plan = pa.table(
        {
            "partition": pa.array(np.arange(n_partitions), pa.int64()),
            "tail_load": pa.array(tail, pa.int64()),
            "heavy_load": pa.array(heavy_load, pa.int64()),
            "total_load": pa.array(loads, pa.int64()),
            "n_heavy_keys": pa.array(n_heavy, pa.int64()),
        }
    )
    return plan, assignment


def skew_plan_violations(events, key_col: str = "user_id",
                         n_partitions: int = 8, heavy_divisor: int = 32):
    """Empty-oracle gate for the placement planner:

    1. conservation — partition loads sum to the INDEPENDENTLY counted
       total row count (catches lost / double-placed keys);
    2. the LPT balance bound — max load ≤ max(largest tail partition
       alone, average + largest heavy key) (greedy can never do worse;
       a broken argmin or threshold trips it);
    3. plan shape — exactly n_partitions rows, non-negative loads,
       total = tail + heavy per partition.
    """
    plan, assignment = skew_placement_plan(
        events, key_col=key_col, n_partitions=n_partitions,
        heavy_divisor=heavy_divisor,
    )
    out_schema = pa.schema(
        [("partition", pa.int64()), ("reason", pa.string())]
    )
    violations: list[tuple[int, str]] = []

    # independent conservation witness: count() ships per-block row
    # counts only, never rows
    total = int(events.count())
    if plan.num_rows == 0:
        if total != 0:
            violations.append((-1, "empty plan on non-empty input"))
        return pa.Table.from_pylist(
            [{"partition": p, "reason": r} for p, r in violations],
            schema=out_schema,
        )

    tail = plan.column("tail_load").to_numpy(zero_copy_only=False)
    heavy = plan.column("heavy_load").to_numpy(zero_copy_only=False)
    tot = plan.column("total_load").to_numpy(zero_copy_only=False)
    if plan.num_rows != n_partitions:
        violations.append((-1, f"{plan.num_rows} rows != {n_partitions}"))
    if int(tot.sum()) != total:
        violations.append(
            (-1, f"loads sum {int(tot.sum())} != exact count {total}")
        )
    for p in range(plan.num_rows):
        if tot[p] != tail[p] + heavy[p]:
            violations.append((p, "total != tail + heavy"))
        if min(tail[p], heavy[p]) < 0:
            violations.append((p, "negative load"))
    if total:
        import math

        avg = math.ceil(total / n_partitions)
        max_heavy = 0
        if assignment:
            # recover the largest heavy count from the plan is not
            # possible; bound with the largest single heavy partition
            # contribution, which is >= the largest heavy key count
            max_heavy = int(heavy.max())
        bound = max(int(tail.max()), avg + max_heavy)
        if int(tot.max()) > bound:
            violations.append(
                (-1, f"max load {int(tot.max())} > LPT bound {bound}")
            )
    return pa.Table.from_pylist(
        [{"partition": int(p), "reason": r} for p, r in violations],
        schema=out_schema,
    )


def skew_plan_violations_sql() -> str:
    return (
        "SELECT CAST(NULL AS BIGINT) AS partition,"
        " CAST(NULL AS VARCHAR) AS reason\nWHERE FALSE"
    )
