"""embedding_dispersion_by_label: the moment identity must equal the
brute-force quantized pairwise mean; single-vector labels take the
guarded branch."""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _dataset(vectors, labels):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "label": pa.array(labels, pa.int32()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vectors],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )


def test_dispersion_matches_bruteforce(ray_session):
    from ocr_ray.ops.search import embedding_dispersion_by_label

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(12, 5)).astype(np.float32)
    labels = [0] * 7 + [1] * 4 + [2]  # label 2 has a single vector
    out = {
        r["label"]: r
        for r in embedding_dispersion_by_label(
            _dataset(vecs, labels)
        ).take_all()
    }

    q = np.floor(vecs.astype(np.float64) * 1000)
    for lab, lo, hi in ((0, 0, 7), (1, 7, 11)):
        m = q[lo:hi]
        n = len(m)
        d2 = ((m[:, None, :] - m[None, :, :]) ** 2).sum(axis=2)
        brute = d2.sum() / (n * (n - 1)) / 1e6
        assert out[lab]["n_vecs"] == n
        assert abs(out[lab]["mean_sq_dist"] - brute) < 1e-9 * max(brute, 1)
    assert out[2]["n_vecs"] == 1 and out[2]["mean_sq_dist"] == 0.0
