"""kmeans_inertia vs a local numpy Lloyd replay on the same quantized
integer algebra (seeds = smallest vec_ids, SUM // COUNT updates)."""
from __future__ import annotations

import numpy as np
import pyarrow as pa

LO = [[0.0, 0.0, 0.1, 0.0], [0.1, 0.0, 0.0, 0.1], [0.0, 0.1, 0.0, 0.0]]
HI = [[5.0, 5.0, 5.1, 5.0], [5.1, 5.0, 5.0, 5.1], [5.0, 5.1, 5.0, 5.0]]


def _table():
    return pa.table(
        {
            "vec_id": pa.array([0, 2, 4, 1, 3, 5], pa.int64()),
            "embedding": pa.array(
                [LO[0], LO[1], LO[2], HI[0], HI[1], HI[2]],
                pa.list_(pa.float32()),
            ),
        }
    )


def _local_inertia(k=2, iters=3):
    from ocr_ray.ops.similarity import _KM_OFFSET, _KM_SCALE

    ids = np.array([0, 2, 4, 1, 3, 5])
    vecs = np.array(
        [LO[0], LO[1], LO[2], HI[0], HI[1], HI[2]], np.float32
    ).astype(np.float64)
    q = np.floor(vecs * _KM_SCALE).astype(np.int64) + _KM_OFFSET
    order = np.argsort(ids)
    cents = q[order[:k]].copy()
    for _ in range(iters):
        d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d, axis=1)
        for c in range(k):
            if (a == c).any():
                cents[c] = np.sum(q[a == c], axis=0) // (a == c).sum()
    d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(d, axis=1)
    out = {}
    for c in range(k):
        mask = a == c
        out[c] = (int(mask.sum()), int(d[mask, c].sum()))
    return out


def test_kmeans_inertia_matches_local_replay(ray_session):
    import ray.data as rd

    from ocr_ray.ops.similarity import kmeans_inertia

    got = {
        int(r["cluster"]): (int(r["n_vectors"]), int(r["inertia"]))
        for r in kmeans_inertia(rd.from_arrow(_table()), k=2, iters=3)
        .take_all()
    }
    assert got == _local_inertia()
    # tight separated blobs: each cluster holds its 3 members
    assert all(n == 3 for n, _ in got.values())
