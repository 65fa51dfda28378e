"""bfs_distances vs a plain-Python BFS oracle, both execution regimes
(broadcast and distributed-join fallback), round bound, empty input."""
from __future__ import annotations

from collections import deque

import pyarrow as pa

# two components: a 0-1-2-3-4 chain with a 1-5 twig, plus {10, 11};
# BFS from min node (0) never reaches the second component
EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (10, 11)]


def _py_bfs(edges, source, max_rounds):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    dist = {source: 0}
    q = deque([source])
    while q:
        n = q.popleft()
        if dist[n] >= max_rounds:
            continue
        for m in adj.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    return sorted(dist.items())


def _edge_ds(edges):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "u": pa.array([u for u, _ in edges], pa.int64()),
                "v": pa.array([v for _, v in edges], pa.int64()),
            }
        )
    )


def _run(ray_session, max_rounds, broadcast_limit):
    from ocr_ray.ops.graph import bfs_distances

    out = bfs_distances(
        _edge_ds(EDGES),
        max_rounds=max_rounds,
        broadcast_limit=broadcast_limit,
    ).to_pandas()
    return sorted(zip(out["node"], out["dist"]))


def test_bfs_broadcast_regime(ray_session):
    assert _run(ray_session, 8, 2_000_000) == _py_bfs(EDGES, 0, 8)


def test_bfs_distributed_regime(ray_session):
    assert _run(ray_session, 8, 0) == _py_bfs(EDGES, 0, 8)


def test_bfs_round_bound(ray_session):
    # only 2 rounds: node 3 (dist 3) and 4 (dist 4) stay unreached
    got = _run(ray_session, 2, 2_000_000)
    assert got == _py_bfs(EDGES, 0, 2)
    assert all(d <= 2 for _, d in got)


def test_bfs_empty_edges(ray_session):
    from ocr_ray.ops.graph import bfs_distances

    out = bfs_distances(_edge_ds([]))
    assert out.count() == 0
