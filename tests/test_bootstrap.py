"""Poisson-bootstrap determinism: the hash-derived weights are
recomputed independently here and checked exactly; replicate means
must bracket the true mean."""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ocr_ray.ops.bootstrap import C1, C2, C3, POISSON_T


def _expected_weight(event_id: int, rep: int) -> int:
    d = hashlib.md5(str(event_id).encode()).hexdigest()
    hi, lo = int(d[:8], 16), int(d[8:16], 16)
    u = (lo * C1 + rep * C2 + hi * C3) % (1 << 32)
    return sum(1 for t in POISSON_T if u >= t)


def test_single_event_weights_exact(ray_session):
    import ray.data as rd

    from ocr_ray.ops.bootstrap import bootstrap_mean_ci

    events = pa.table(
        {
            "event_id": pa.array([7], pa.int64()),
            "value": pa.array([3.0], pa.float64()),
        }
    )
    out = (
        bootstrap_mean_ci(rd.from_arrow(events), replicates=8)
        .to_pandas()
        .sort_values("replicate")
        .reset_index(drop=True)
    )
    assert len(out) == 8
    for r in range(8):
        w = _expected_weight(7, r)
        assert out["n_eff"][r] == w
        assert out["total_cents"][r] == w * 300
        assert out["mean_cents"][r] == (300.0 if w else 0.0)


def test_replicate_means_bracket_truth(ray_session):
    import ray.data as rd

    from ocr_ray.ops.bootstrap import bootstrap_mean_ci

    n = 4000
    vals = np.round(
        np.linspace(1.0, 9.0, n), 2
    )  # mean 5.00 dollars = 500 cents
    events = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    out = bootstrap_mean_ci(rd.from_arrow(events)).to_pandas()
    assert len(out) == 32
    # Poisson(1) weights: n_eff within a few sd of n
    assert abs(out["n_eff"].mean() - n) < 4 * np.sqrt(n)
    # replicate means cluster around the truth (sd ~ sd(vals)/sqrt(n))
    assert abs(out["mean_cents"].mean() - 500.0) < 15.0
    assert out["mean_cents"].std() < 15.0
