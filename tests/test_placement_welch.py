"""Rendezvous sharding vs a brute-force argmax; Welch t vs the direct
formula; HRW minimal-disruption property on node removal."""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _hrw_winner(key: int, n_nodes: int) -> int:
    best = (-1, -1)
    for node in range(n_nodes):
        w = int(hashlib.md5(f"{key}|{node}".encode()).hexdigest()[:16], 16)
        if w > best[0]:
            best = (w, node)
    return best[1]


def test_rendezvous_shards(ray_session):
    import ray.data as rd

    from ocr_ray.ops.placement import rendezvous_shards

    n = 500
    ids = np.arange(n, dtype=np.int64)
    chars = (ids * 7 % 100).astype(np.int64)
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars": pa.array(chars, pa.int64()),
        }
    )
    got = (
        rendezvous_shards(rd.from_arrow(t).repartition(4), n_nodes=8)
        .to_pandas()
        .set_index("node")
        .sort_index()
    )
    want_n = np.zeros(8, np.int64)
    want_c = np.zeros(8, np.int64)
    for k, c in zip(ids, chars):
        w = _hrw_winner(int(k), 8)
        want_n[w] += 1
        want_c[w] += int(c)
    assert got.n_docs.tolist() == [int(x) for x in want_n if True]
    assert got.sum_chars.tolist() == [int(x) for x in want_c]
    # md5 spreads uniformly: no node takes more than 2x the fair share
    assert got.n_docs.max() < 2 * (n / 8)


def test_hrw_minimal_disruption():
    """Removing one node only moves the keys that LIVED on it — the
    defining property of rendezvous hashing."""
    keys = list(range(300))
    before = {k: _hrw_winner(k, 8) for k in keys}
    # removing node 7 = winner among nodes 0..6
    after = {}
    for k in keys:
        best = (-1, -1)
        for node in range(7):
            w = int(
                hashlib.md5(f"{k}|{node}".encode()).hexdigest()[:16], 16
            )
            if w > best[0]:
                best = (w, node)
        after[k] = best[1]
    moved = [k for k in keys if before[k] != after[k]]
    assert all(before[k] == 7 for k in moved)
    assert len(moved) == sum(1 for k in keys if before[k] == 7)


def test_welch_t_by_group(ray_session):
    import ray.data as rd

    from ocr_ray.ops.stats import welch_t_by_group

    rng = np.random.RandomState(17)
    a = rng.randint(100, 200, 80)
    b = rng.randint(300, 420, 50)  # clearly shifted group
    vals = np.concatenate([a, b]).astype(np.int64)
    srcs = ["base"] * 80 + ["shifted"] * 50
    t = pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "n_chars": pa.array(vals, pa.int64()),
        }
    )
    got = (
        welch_t_by_group(rd.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("source")
    )

    def welch(x, y):
        mx, my = x.mean(), y.mean()
        vx = x.var(ddof=1) / len(x)
        vy = y.var(ddof=1) / len(y)
        return (mx - my) / np.sqrt(vx + vy)

    t_shift = float(got.loc["shifted", "t_stat"])
    ref = welch(b.astype(np.float64), a.astype(np.float64))
    assert abs(t_shift - ref) < 1e-9
    assert t_shift > 10  # strongly shifted
    assert got.loc["base", "t_stat"] == -got.loc["shifted", "t_stat"]
