"""MOSS-style winnow-overlap pairs vs a serial fingerprint replay."""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_winnow_overlap_matches_serial(ray_session):
    from itertools import combinations

    from ocr_ray.ops.textstats import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(50)]

    def text(seed):
        r = np.random.default_rng(seed)
        return " ".join(vocab[i] for i in r.integers(0, 50, 60))

    rows = [(i, text(i)) for i in range(20)]
    # doc 20 = doc 0 with a short suffix → heavy fingerprint overlap
    rows.append((20, rows[0][1] + " trailing extra words"))

    min_shared, max_df = 4, 10
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_shared"], r["size_a"], r["size_b"])
        for r in winnow_overlap_pairs(
            _ds(rows), min_shared=min_shared, max_df=max_df
        ).take_all()
    }

    fps = {i: set(winnow_fingerprints(t)) for i, t in rows}
    df: dict[int, int] = {}
    for s in fps.values():
        for fp in s:
            df[fp] = df.get(fp, 0) + 1
    surviving = {fp for fp, c in df.items() if c <= max_df}
    expect = {}
    for a, b in combinations(sorted(fps), 2):
        shared = len(fps[a] & fps[b] & surviving)
        if shared >= min_shared:
            expect[(a, b)] = (shared, len(fps[a]), len(fps[b]))
    assert got == expect
    assert (0, 20) in got  # the planted near-copy is detected
