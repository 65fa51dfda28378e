"""Property tests: distributed connected components vs an in-test
union-find reference on random graphs; attach_pair_payloads equivalence
between the broadcast (small) and hash-join (large) regimes."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ocr_ray.ops.dedup import connected_components


def _union_find_labels(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_components_match_union_find(ray_session, seed):
    # denser than the old 45-edge config: random sparse graphs drew
    # diameter-17 components, and at test scale each propagation round
    # costs ~10 s of fixed Ray overhead (~250 s/seed). Diameter shrinks
    # to ~4 at 90 edges while the union-find comparison property is
    # unchanged; the deep-diameter path is covered by the long-chain
    # pointer-doubling test below.
    rng = np.random.RandomState(seed)
    n_nodes, n_edges = 60, 90
    a = rng.randint(0, n_nodes, n_edges)
    b = rng.randint(0, n_nodes, n_edges)
    keep = a != b
    edges = list(zip(a[keep].tolist(), b[keep].tolist()))
    pairs = rd.from_arrow(
        pa.table(
            {"doc_a": pa.array([e[0] for e in edges], pa.int64()),
             "doc_b": pa.array([e[1] for e in edges], pa.int64())}
        )
    )
    got = {
        int(r["node"]): int(r["label"])
        for r in connected_components(pairs).take_all()
    }
    assert got == _union_find_labels(edges)


def test_attach_pair_payloads_regime_equivalence(ray_session):
    from ocr_ray.ops.joins import attach_pair_payloads

    rng = np.random.RandomState(3)
    n_pairs = 60
    pairs_tbl = pa.table(
        {
            "doc_a": pa.array(rng.randint(0, 40, n_pairs), pa.int64()),
            "doc_b": pa.array(rng.randint(40, 80, n_pairs), pa.int64()),
        }
    )
    side_tbl = pa.table(
        {
            "doc_id": pa.array(range(80), pa.int64()),
            "payload": pa.array([f"p{i}" for i in range(80)], pa.string()),
        }
    )

    def run(threshold):
        out = attach_pair_payloads(
            rd.from_arrow(pairs_tbl),
            rd.from_arrow(side_tbl),
            key_a="doc_a",
            key_b="doc_b",
            side_key="doc_id",
            payloads={"payload": ("pay_a", "pay_b")},
            dedupe=True,
            small_threshold=threshold,
        ).take_all()
        return sorted(
            (r["doc_a"], r["doc_b"], r["pay_a"], r["pay_b"]) for r in out
        )

    small = run(10_000)  # broadcast regime
    large = run(1)       # forced hash-join regime
    assert small == large and len(small) > 0
    # every payload correctly looked up
    for a, b, pa_, pb in small:
        assert pa_ == f"p{a}" and pb == f"p{b}"


def test_long_chain_converges_via_pointer_doubling(ray_session, caplog):
    """A 64-hop chain with a 12-round budget — pure min-label
    propagation (O(diameter) rounds) could not converge it; pointer
    doubling, which engages after ``doubling_from=3`` propagation-only
    rounds, must — silently, with every node labeled 0. (The 4-CPU test
    fixture pays ~6-10 s of fixed per-round Ray overhead, so the
    in-suite case stays small; a 300-hop chain converges the same
    way — measured out-of-band.)"""
    import logging

    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.ops.dedup import connected_components

    n = 64
    chain = pa.table(
        {
            "doc_a": pa.array(range(n), pa.int64()),
            "doc_b": pa.array(range(1, n + 1), pa.int64()),
        }
    )
    with caplog.at_level(logging.WARNING, logger="ocr_ray.dedup"):
        out = {
            r["node"]: r["label"]
            for r in connected_components(rd.from_arrow(chain), max_iters=12).take_all()
        }
    assert len(out) == n + 1
    assert set(out.values()) == {0}
    assert not any("did NOT converge" in r.message for r in caplog.records)


def test_pagerank_matches_serial_reference(ray_session):
    """Random undirected graph: the distributed integer PageRank must
    equal a serial replay of the same recurrence exactly, and a star
    hub must outrank leaf nodes."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.ops.graph import BASE, DAMP_DEN, DAMP_NUM, SCALE, pagerank

    rng = np.random.RandomState(7)
    n_nodes, n_edges = 30, 45
    a = rng.randint(0, n_nodes, n_edges)
    b = rng.randint(0, n_nodes, n_edges)
    keep = a != b
    pairs = {(min(x, y), max(x, y)) for x, y in zip(a[keep], b[keep])}
    # add a star: node 100 connected to 8 leaves
    pairs |= {(100, 200 + i) for i in range(8)}
    tbl = pa.table(
        {
            "doc_a": pa.array([p[0] for p in pairs], pa.int64()),
            "doc_b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )

    # serial reference of the identical recurrence
    adj, deg = {}, {}
    for x, y in pairs:
        adj.setdefault(x, []).append(y)
        adj.setdefault(y, []).append(x)
    for k, v in adj.items():
        deg[k] = len(v)
    r = {k: SCALE for k in adj}
    for _ in range(5):
        inflow = {k: 0 for k in adj}
        for u, nbrs in adj.items():
            share = r[u] // deg[u]
            for v in nbrs:
                inflow[v] += share
        r = {k: BASE + (DAMP_NUM * s) // DAMP_DEN for k, s in inflow.items()}

    got = {
        row["doc_id"]: row["rank_scaled"]
        for row in pagerank(rd.from_arrow(tbl), iters=5).take_all()
    }
    assert got == r
    assert all(got[100] > got[200 + i] for i in range(8))


def test_triangle_counts_k4_plus_wedge(ray_session):
    """K4 (every node in 3 triangles) plus an open wedge hanging off
    node 3 (adds no triangle)."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.ops.graph import triangle_counts

    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    wedge = [(3, 10), (3, 11)]  # open: 10-11 not an edge
    edges = pa.table(
        {
            "u": pa.array([e[0] for e in k4 + wedge], pa.int64()),
            "v": pa.array([e[1] for e in k4 + wedge], pa.int64()),
        }
    )
    out = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(rd.from_arrow(edges)).take_all()
    }
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_copurchase_edges_dedup_and_cap(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.ops.graph import copurchase_edges

    li = pa.table(
        {
            # order 1: parts 5,7,5 (dup) -> one edge (5,7)
            # order 2: parts 1,2,3 -> three edges
            # order 3: 4 distinct parts with max_basket=3 -> dropped whole
            "l_orderkey": pa.array([1, 1, 1, 2, 2, 2, 3, 3, 3, 3], pa.int64()),
            "l_partkey": pa.array([5, 7, 5, 1, 2, 3, 8, 9, 10, 11], pa.int64()),
        }
    )
    got = {
        (r["u"], r["v"])
        for r in copurchase_edges(rd.from_arrow(li), max_basket=3).take_all()
    }
    assert got == {(5, 7), (1, 2), (1, 3), (2, 3)}


def test_clustering_coefficients_k4_plus_wedge(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.ops.graph import clustering_coefficients

    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    wedge = [(3, 10), (3, 11)]
    edges = pa.table(
        {
            "u": pa.array([e[0] for e in k4 + wedge], pa.int64()),
            "v": pa.array([e[1] for e in k4 + wedge], pa.int64()),
        }
    )
    out = {
        r["node"]: r
        for r in clustering_coefficients(rd.from_arrow(edges)).take_all()
    }
    # inner K4 nodes: deg 3, all wedges closed -> lcc 1.0
    for n in (0, 1, 2):
        assert out[n]["deg"] == 3 and out[n]["lcc"] == 1.0
    # node 3: deg 5 (K4 + two leaves), 3 triangles -> 6/20
    assert out[3]["deg"] == 5 and out[3]["n_triangles"] == 3
    assert out[3]["lcc"] == 6 / 20
    # leaves: deg 1, no triangles, guarded division -> 0.0
    assert out[10]["lcc"] == 0.0 and out[11]["n_triangles"] == 0


def test_kcore_peeling_and_convergence(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.ops.graph import kcore

    # K4 {0,1,2,3} plus a tail 3-10-11: the tail peels off in two
    # rounds (11 first, then 10), the K4 is the 3-core
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 10), (10, 11)]
    tbl = pa.table(
        {
            "u": pa.array([e[0] for e in edges], pa.int64()),
            "v": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    out = {r["node"]: r["deg"] for r in kcore(rd.from_arrow(tbl), k=3).take_all()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}

    # k above the max degree -> empty core, empty (named) schema
    empty = kcore(rd.from_arrow(tbl), k=10).take_all()
    assert empty == []

    # k=1 keeps everything, degrees measured on the intact graph
    all_k1 = {r["node"]: r["deg"] for r in kcore(rd.from_arrow(tbl), k=1).take_all()}
    assert all_k1[3] == 4 and all_k1[11] == 1 and len(all_k1) == 6

    # max_iters too small for the peel depth -> loud failure
    import pytest

    chain = pa.table(
        {
            "u": pa.array([0, 1, 2, 3], pa.int64()),
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(rd.from_arrow(chain), k=2, max_iters=1)


def test_label_propagation_matches_serial_reference(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.ops.graph import label_propagation

    rng = np.random.default_rng(17)
    n_nodes, n_edges, iters = 40, 90, 4
    es = set()
    while len(es) < n_edges:
        u, v = rng.integers(0, n_nodes, 2)
        if u != v:
            es.add((min(int(u), int(v)), max(int(u), int(v))))
    edges = sorted(es)

    # serial synchronous LPA: mode of neighbor labels, ties -> min label
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    labels = {n: n for n in adj}
    for _ in range(iters):
        nxt = {}
        for node, nbrs in adj.items():
            counts: dict[int, int] = {}
            for nb in nbrs:
                counts[labels[nb]] = counts.get(labels[nb], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            nxt[node] = best[0]
        labels = nxt

    tbl = pa.table(
        {
            "u": pa.array([e[0] for e in edges], pa.int64()),
            "v": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(rd.from_arrow(tbl), iters=iters).take_all()
    }
    assert got == labels
