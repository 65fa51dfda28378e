"""association_rules vs hand-computed supports: basket cap drops whole
baskets, duplicate line rows collapse, sentinel N carries through, and
confidence/lift match the closed-form values."""
from __future__ import annotations

import math

import pyarrow as pa
import pytest


def _run(rows, **kw):
    import ray.data as rd

    from ocr_ray.ops.graph import association_rules

    lineitem = rd.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )
    out = association_rules(lineitem, **kw).take_all()
    return {(r["antecedent"], r["consequent"]): r for r in out}


BASKETS = {
    1: [1, 2, 3],
    2: [1, 2, 1],  # duplicate line row for part 1 — must collapse
    3: [1, 2],
    4: [2, 3],
    5: [1],
    6: [1, 2, 3, 4],  # over the cap at max_basket=3 — dropped whole
}
ROWS = [(o, p) for o, parts in BASKETS.items() for p in parts]


def test_rules_match_closed_form(ray_session):
    rules = _run(ROWS, min_support=2, max_basket=3)
    # in-cap baskets: 1..5 (N=5); supports p1=4, p2=4, p3=2
    # pairs: (1,2)=3, (2,3)=2, (1,3)=1 (below min_support)
    assert set(rules) == {(1, 2), (2, 1), (2, 3), (3, 2)}
    r12 = rules[(1, 2)]
    assert r12["supp_pair"] == 3 and r12["supp_antecedent"] == 4
    assert r12["confidence"] == pytest.approx(0.75)
    assert r12["lift"] == pytest.approx(3 * 5 / (4 * 4))
    r32 = rules[(3, 2)]
    assert r32["supp_pair"] == 2 and r32["supp_antecedent"] == 2
    assert r32["confidence"] == pytest.approx(1.0)
    assert r32["lift"] == pytest.approx(2 * 5 / (2 * 4))


def test_cap_inclusion_changes_supports(ray_session):
    # raising the cap admits basket 6: N=6, p1=5, p2=5, pair (1,2)=4
    rules = _run(ROWS, min_support=2, max_basket=16)
    r12 = rules[(1, 2)]
    assert r12["supp_pair"] == 4 and r12["supp_antecedent"] == 5
    assert r12["confidence"] == pytest.approx(4 / 5)
    assert r12["lift"] == pytest.approx(4 * 6 / (5 * 5))
    # the (1,4)/(2,4)/(3,4) pairs exist only in basket 6 → below min_support
    assert (1, 4) not in rules and (4, 1) not in rules


def test_empty_and_all_singletons(ray_session):
    rules = _run([(1, 7), (2, 8), (3, 9)], min_support=1)
    assert rules == {}
