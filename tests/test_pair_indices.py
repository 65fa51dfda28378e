"""Property tests for the vectorized intra-group pair generator against
a brute-force reference — both overflow policies (rep-pair, drop) over
random group layouts, including duplicate (group, id) rows."""
from __future__ import annotations

import numpy as np
import pytest

from ocr_ray.ops.dedup import _dedup_sorted_by_group, _intra_group_pair_indices


def _brute_pairs(ids, gidx, cap, drop_over):
    """Reference: per group, dedupe + sort ids; head cap all-pairs,
    tail rep-paired with the min (or drop the whole group)."""
    out = set()
    for g in np.unique(gidx):
        vals = sorted(set(ids[gidx == g].tolist()))
        if len(vals) < 2:
            continue
        if drop_over and len(vals) > cap:
            continue
        head = vals[:cap]
        for i in range(len(head)):
            for j in range(i + 1, len(head)):
                out.add((head[i], head[j]))
        for t in vals[cap:]:
            out.add((vals[0], t))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("cap,drop_over", [(4, False), (4, True), (1024, False)])
def test_pair_indices_match_bruteforce(seed, cap, drop_over):
    rng = np.random.default_rng(seed)
    n = 600
    gidx_raw = np.sort(rng.integers(0, 40, n))
    ids_raw = rng.integers(0, 25, n).astype(np.int64)  # duplicates likely
    ids, gidx = _dedup_sorted_by_group(ids_raw, gidx_raw.astype(np.int64))
    ii, jj, n_over = _intra_group_pair_indices(gidx, cap, drop_over=drop_over)
    got = set(zip(ids[ii].tolist(), ids[jj].tolist()))
    # pairs are (smaller, larger) because ids sort ascending per group
    assert all(a < b for a, b in got)
    assert got == _brute_pairs(ids_raw, gidx_raw, cap, drop_over)
    if drop_over:
        assert n_over == 0  # dropped groups are not counted as overflow


def test_dedup_sorted_by_group_payload_alignment():
    ids = np.array([5, 3, 3, 7, 5], dtype=np.int64)
    gidx = np.array([1, 1, 1, 0, 0], dtype=np.int64)
    pay = np.array([50, 30, 31, 70, 51], dtype=np.int64)
    ids_d, g_d, pay_d = _dedup_sorted_by_group(ids, gidx, pay)
    assert ids_d.tolist() == [5, 7, 3, 5]
    assert g_d.tolist() == [0, 0, 1, 1]
    # first occurrence in (group, id) sort order wins
    assert pay_d.tolist() == [51, 70, 30, 50]


def test_empty_input():
    ii, jj, n_over = _intra_group_pair_indices(np.empty(0, np.int64), 8)
    assert len(ii) == 0 and len(jj) == 0 and n_over == 0
