"""Collocation mining (integer positive-PMI lift test) — both plans."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


TEXTS = [
    "hash table join hash table scan",
    "hash table merge sort merge sort",
    "random words appear here once only",
    "hash table again and sort merge follows",
]


def _expected(min_count, lift):
    import re
    from collections import Counter

    uni, bi = Counter(), Counter()
    for t in TEXTS:
        ws = re.findall(r"[a-zA-Z]{3,}", t.lower())
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    n = sum(bi.values())
    return {
        (a, b, c, uni[a], uni[b])
        for (a, b), c in bi.items()
        if c >= min_count and c * n >= lift * uni[a] * uni[b]
    }


def test_collocation_broadcast_plan(ray_session):
    from ocr_ray.ops.lm import collocation_pairs

    got = collocation_pairs(_docs_ds(TEXTS), min_count=2, lift=1).take_all()
    rows = {
        (r["w1"], r["w2"], r["c_ab"], r["c_a"], r["c_b"]) for r in got
    }
    assert rows == _expected(2, 1)
    assert ("hash", "table") in {(a, b) for a, b, *_ in rows}


def test_collocation_join_plan_matches(ray_session):
    from ocr_ray.ops.lm import collocation_pairs

    got = collocation_pairs(
        _docs_ds(TEXTS), min_count=2, lift=1, broadcast_threshold=0
    ).take_all()
    rows = {
        (r["w1"], r["w2"], r["c_ab"], r["c_a"], r["c_b"]) for r in got
    }
    assert rows == _expected(2, 1)


def test_collocation_lift_filters(ray_session):
    from ocr_ray.ops.lm import collocation_pairs

    # high lift: only pairs well above independence survive
    got = collocation_pairs(_docs_ds(TEXTS), min_count=2, lift=5).take_all()
    rows = {(r["w1"], r["w2"]) for r in got}
    assert rows == {(a, b) for a, b, *_ in _expected(2, 5)}


def test_collocation_empty_corpus(ray_session):
    from ocr_ray.ops.lm import collocation_pairs

    got = collocation_pairs(_docs_ds(["", "a b"]), min_count=1).take_all()
    assert got == []
