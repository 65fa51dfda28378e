"""winsorized_value_stats vs a hand oracle (clamp at the integer-rank
p05/p95 bounds; same rank rule as value_percentiles_by_type)."""
from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _oracle(values, lo_q=0.05, hi_q=0.95):
    cents = np.array([round(v * 100) for v in values], np.int64)
    uniq, cnt = np.unique(cents, return_counts=True)
    cum = np.cumsum(cnt)
    total = int(cum[-1])
    lo = int(uniq[np.searchsorted(cum, math.ceil(lo_q * total), "left")])
    hi = int(uniq[np.searchsorted(cum, math.ceil(hi_q * total), "left")])
    w = np.clip(cents, lo, hi)
    return lo, hi, total, int(w.sum()), float(w.sum()) / total


def test_winsorized_value_stats(ray_session):
    import ray.data as rd

    from ocr_ray.ops.stats import winsorized_value_stats

    rng = np.random.RandomState(7)
    vals_a = list(rng.uniform(0, 50, 200)) + [10_000.0, -5.0]  # outliers
    vals_b = list(rng.uniform(5, 6, 40))
    t = pa.table(
        {
            "event_type": pa.array(
                ["a"] * len(vals_a) + ["b"] * len(vals_b), pa.string()
            ),
            "value": pa.array(vals_a + vals_b, pa.float64()),
        }
    )
    out = winsorized_value_stats(rd.from_arrow(t)).to_pandas()
    got = {
        r.event_type: (
            int(r.lo_cents), int(r.hi_cents), int(r.n_events),
            int(r.winsorized_sum_cents), float(r.winsorized_mean),
        )
        for r in out.itertuples()
    }
    assert got["a"] == _oracle(vals_a)
    assert got["b"] == _oracle(vals_b)
    # the 10k outlier must be clamped: mean far below the raw mean
    assert got["a"][4] < np.mean([v * 100 for v in vals_a]) / 2
