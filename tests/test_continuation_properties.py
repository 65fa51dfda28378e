"""Property tests for the continuation-session operators: chained
debounce vs a brute-force scan, and the quantile sketch's rank-error
bound on adversarial weight distributions."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    gaps=st.lists(st.integers(min_value=0, max_value=12), min_size=1,
                  max_size=40),
    gap_limit=st.integers(min_value=1, max_value=10),
)
def test_debounce_chain_matches_bruteforce(gaps, gap_limit):
    """The op's run scanner must equal an independent brute-force
    survivors-set walk for ANY gap sequence, including zeros and ties."""
    from ocr_ray.ops.windows import _debounce_run

    ts = np.cumsum([0] + gaps).astype(np.int64)
    survivors = [int(ts[0])]
    for t in ts[1:]:
        if int(t) - survivors[-1] >= gap_limit:
            survivors.append(int(t))
    assert _debounce_run(ts, gap_limit) == len(survivors)


@settings(max_examples=20, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),  # value
            st.integers(min_value=1, max_value=10_000),    # weight
        ),
        min_size=1,
        max_size=200,
    ),
    m=st.sampled_from([4, 16, 64]),
)
def test_qsk_compress_rank_error_bound(data, m):
    """After one compression, any query point's rank moves by at most
    total/m — even with heavy duplicate weights, two-point
    distributions, or all-equal values."""
    from ocr_ray.ops.sketch import _qsk_compress

    vals = np.array([v for v, _ in data], np.int64)
    wts = np.array([w for _, w in data], np.int64)
    cv, cw = _qsk_compress(vals, wts, m)
    total = int(wts.sum())
    assert int(cw.sum()) == total
    assert len(cv) <= m
    # exact cumulative rank functions at every distinct value
    order = np.argsort(vals, kind="stable")
    sv, sw = vals[order], wts[order]
    scum = np.cumsum(sw)
    ccum = np.cumsum(cw)
    for q in np.unique(np.concatenate([vals, cv])):
        true_rank = int(scum[np.searchsorted(sv, q, side="right") - 1]) if (
            np.searchsorted(sv, q, side="right") > 0
        ) else 0
        est_rank = int(ccum[np.searchsorted(cv, q, side="right") - 1]) if (
            np.searchsorted(cv, q, side="right") > 0
        ) else 0
        assert abs(true_rank - est_rank) <= total // m + 1, (
            q, true_rank, est_rank, total, m
        )


@settings(max_examples=25, deadline=None)
@given(
    users=st.lists(st.integers(min_value=0, max_value=300), min_size=1,
                   max_size=300),
)
def test_bitmap_popcount_equals_set_size(users):
    """Word-bitmap distinct counting equals the set cardinality for any
    id multiset (single-type degenerate case of the co-occurrence op)."""
    from ocr_ray.ops.bitmap import _popcount

    ids = np.array(users, np.int64)
    words = ids >> 6
    acc: dict[int, np.uint64] = {}
    for w, b in zip(words, np.uint64(1) << (ids & 63).astype(np.uint64)):
        acc[int(w)] = acc.get(int(w), np.uint64(0)) | b
    total = int(
        _popcount(np.array(list(acc.values()), np.uint64)).sum()
    ) if acc else 0
    assert total == len(set(users))
