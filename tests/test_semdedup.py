"""SemDeDup (within-cluster cosine dedup) — block-level unit tests plus
an e2e check against an independent numpy replay of the keep rule."""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocr_ray.ops.similarity import _semdedup_block_factory


def _pack(vectors: np.ndarray, ids, clusters) -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(clusters, pa.int64()),
            "emb": pa.array(
                [np.asarray(v, np.float64).tobytes() for v in vectors],
                pa.binary(),
            ),
        }
    )


def _starts(clusters) -> np.ndarray:
    c = np.asarray(clusters)
    return np.flatnonzero(np.r_[True, c[1:] != c[:-1]])


def test_block_drops_larger_id_of_near_pair():
    # cluster 0: v1 ≈ v2 (cos 1.0), v3 orthogonal; cluster 1: all far
    vecs = np.array(
        [
            [1.0, 0.0],
            [2.0, 0.0],
            [0.0, 1.0],
            [1.0, 1.0],
            [-1.0, 1.0],
        ]
    )
    ids = [1, 2, 3, 10, 11]
    cls = [0, 0, 0, 1, 1]
    fn = _semdedup_block_factory(threshold=0.9, max_cluster=4096)
    out = fn(_pack(vecs, ids, cls), _starts(cls))
    assert out.column("vec_id").to_pylist() == [2]
    assert out.column("cluster").to_pylist() == [0]


def test_block_keep_rule_is_smaller_id_even_unsorted_input():
    # same near-pair but the larger id appears FIRST in the block — the
    # keeper must still be the smaller vec_id
    vecs = np.array([[2.0, 0.0], [1.0, 0.0]])
    out = _semdedup_block_factory(0.9, 4096)(
        _pack(vecs, [7, 3], [0, 0]), _starts([0, 0])
    )
    assert out.column("vec_id").to_pylist() == [7]


def test_block_no_cross_cluster_pairs():
    # identical vectors in DIFFERENT clusters never pair
    vecs = np.array([[1.0, 0.0], [1.0, 0.0]])
    out = _semdedup_block_factory(0.9, 4096)(
        _pack(vecs, [1, 2], [0, 1]), _starts([0, 1])
    )
    assert out.num_rows == 0


def test_block_overflow_head_only():
    # max_cluster=2: overflow ids (3rd, 4th) compare against the head
    # two only; overflow-overflow pairs are skipped
    base = np.array([[1.0, 0.0], [0.0, 1.0]])
    dup = np.array([[0.70711, 0.70711], [0.70711, 0.70711]])  # pair 3-4
    vecs = np.vstack([base, dup])
    out = _semdedup_block_factory(0.99, max_cluster=2)(
        _pack(vecs, [1, 2, 3, 4], [0] * 4), _starts([0] * 4)
    )
    # 3 and 4 are near-dups of each other but NOT of the head — with
    # head-only comparison neither is dropped (bounded degradation)
    assert out.num_rows == 0
    # identical corpus: everyone is a near-dup of head id 1
    same = np.tile([[1.0, 0.0]], (4, 1))
    out2 = _semdedup_block_factory(0.99, max_cluster=2)(
        _pack(same, [1, 2, 3, 4], [0] * 4), _starts([0] * 4)
    )
    assert out2.column("vec_id").to_pylist() == [2, 3, 4]


def test_semdedup_e2e_matches_numpy_replay(ray_session):
    """Full pipeline vs an independent replay: k-means assignment from
    the engine, then brute-force same-cluster cosine pairs in numpy."""
    import ray.data as rd

    from ocr_ray.ops.similarity import kmeans_integer, semdedup_drop_list

    rng = np.random.default_rng(7)
    n, dim = 160, 8
    base = rng.normal(size=(n, dim))
    # implant near-duplicates: rows 100.. copy earlier rows + tiny noise
    for i in range(100, 130):
        base[i] = base[i - 100] + rng.normal(scale=1e-3, size=dim)
    rows = [
        {"vec_id": i, "embedding": base[i].tolist()} for i in range(n)
    ]
    ds = rd.from_items(rows)

    got = (
        semdedup_drop_list(ds, k=4, iters=3, threshold=0.95)
        .to_pandas()
        .sort_values("vec_id")
    )

    assign = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_integer(
            rd.from_items(rows), k=4, iters=3
        ).take_all()
    }
    mn = base / np.linalg.norm(base, axis=1, keepdims=True)
    expect = set()
    for b in range(n):
        for a in range(b):
            if assign[a] == assign[b] and mn[a] @ mn[b] >= 0.95:
                expect.add(b)
                break
    assert got["vec_id"].tolist() == sorted(expect)
    assert len(expect) >= 25  # the implanted near-dups were found
    for _, row in got.iterrows():
        assert assign[row["vec_id"]] == row["cluster"]


def test_kcenter_coreset_hand(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.ops.similarity import kcenter_coreset

    # 2-D points: start at min id (0,0); farthest is (10,0); then (5,5)
    pts = {1: [0.0, 0.0], 2: [10.0, 0.0], 3: [5.0, 5.0], 4: [0.1, 0.0]}
    emb = pa.table(
        {
            "vec_id": pa.array(list(pts), pa.int64()),
            "embedding": pa.array(
                list(pts.values()), pa.list_(pa.float64())
            ),
        }
    )
    out = (
        kcenter_coreset(rd.from_arrow(emb), k=3)
        .to_pandas()
        .sort_values("center_rank")
        .reset_index(drop=True)
    )
    assert out["vec_id"].tolist() == [1, 2, 3]
    s = 1_000_000
    assert out["min_dist"].tolist() == [
        0,
        (10 * s) ** 2,
        2 * (5 * s) ** 2,
    ]


def test_kcenter_coreset_degenerate_stops(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.ops.similarity import kcenter_coreset

    emb = pa.table(
        {
            "vec_id": pa.array([5, 9], pa.int64()),
            "embedding": pa.array(
                [[1.0, 2.0], [1.0, 2.0]], pa.list_(pa.float64())
            ),
        }
    )
    out = kcenter_coreset(rd.from_arrow(emb), k=4).to_pandas()
    # identical points: only the first center is selectable
    assert out["vec_id"].tolist() == [5]


def test_embedding_top_pc_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.ops.search import embedding_top_pc

    # anisotropic cloud: dominant direction along (1, 0.5)
    rng = [(i * 37 % 19) - 9 for i in range(40)]
    base = np.array([[1.0, 0.5]]) * np.array(rng, dtype=float)[:, None]
    noise = np.array(
        [[(i * 53 % 7 - 3) / 50.0, (i * 29 % 11 - 5) / 50.0] for i in range(40)]
    )
    m = base + noise
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(40), pa.int64()),
            "embedding": pa.array([list(r) for r in m], pa.list_(pa.float64())),
        }
    )
    out = (
        embedding_top_pc(rd.from_arrow(emb))
        .to_pandas()
        .sort_values("dim")
        .reset_index(drop=True)
    )
    v = out["v_fixed"].to_numpy().astype(float)
    v = v / np.linalg.norm(v)
    # numpy reference on the SAME quantized second-moment matrix
    q = np.floor(m * 1000).astype(np.int64)
    g = (q.T @ q).astype(float)
    evals, evecs = np.linalg.eigh(g)
    ref = evecs[:, -1]
    cos = abs(float(v @ ref))
    assert cos > 0.9999
