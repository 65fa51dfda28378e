"""gini_coefficient vs the classic rank identity on hand data, and the
pareto-frontier query's skyline semantics vs a brute-force dominance
check (including ties at the frontier price)."""
from __future__ import annotations

import pyarrow as pa


def _brute_gini(values):
    v = sorted(values)
    n = len(v)
    tot = sum(v)
    srv = sum((i + 1) * x for i, x in enumerate(v))
    return float(2 * srv - (n + 1) * tot) / float(n * tot)


def test_gini_matches_rank_identity(ray_session):
    import ray.data as rd

    from ocr_ray.ops.stats import gini_coefficient

    vals = [100, 100, 250, 400, 1, 9_999, 42, 42, 42, 7_000]
    t = pa.table(
        {
            "k": pa.array(list(range(len(vals))), pa.int64()),
            "v": pa.array(vals, pa.int64()),
        }
    )
    r = gini_coefficient(rd.from_arrow(t), "k", "v", bucket_width=64)
    assert r["n"] == len(vals)
    assert r["sum_value"] == sum(vals)
    assert abs(r["gini"] - _brute_gini(vals)) < 1e-12


def test_gini_uniform_is_zero(ray_session):
    import ray.data as rd

    from ocr_ray.ops.stats import gini_coefficient

    t = pa.table(
        {
            "k": pa.array(list(range(8)), pa.int64()),
            "v": pa.array([5] * 8, pa.int64()),
        }
    )
    r = gini_coefficient(rd.from_arrow(t), "k", "v", bucket_width=2)
    assert abs(r["gini"]) < 1e-12


def test_gini_empty(ray_session):
    import ray.data as rd

    from ocr_ray.ops.stats import gini_coefficient

    t = pa.schema([("k", pa.int64()), ("v", pa.int64())]).empty_table()
    r = gini_coefficient(rd.from_arrow(t), "k", "v")
    assert r == {"n": 0, "sum_value": 0, "gini": 0.0}


def _brute_frontier(points):
    """Multiset skyline: (d minimized, c maximized)."""
    out = {}
    for d, c in points:
        dominated = any(
            (d2 <= d and c2 >= c and (d2 < d or c2 > c)) for d2, c2 in points
        )
        if not dominated:
            out[(d, c)] = out.get((d, c), 0) + 1
    return out


def test_pareto_frontier_orders(ray_session, tmp_path, monkeypatch):
    import pyarrow.parquet as pq

    from ocr_ray.driver import q_pareto_frontier_orders

    day = 86_400_000_000
    # (day, price): day 1 holds the early cheap order; day 0 high price
    # dominates everything later-or-equal priced; duplicate frontier
    # points on day 3 must both count.
    pts = [
        (0, 50.00), (0, 20.00),
        (1, 30.00),          # dominated by (0, 50)
        (2, 50.00),          # dominated by (0, 50) (same price, later)
        (3, 75.25), (3, 75.25),  # frontier, multiplicity 2
        (4, 60.00),          # dominated by (3, 75.25)
        (5, 80.00),          # frontier
    ]
    t = pa.table(
        {
            "o_orderdate": pa.array(
                [p[0] * day for p in pts], pa.timestamp("us")
            ),
            "o_totalprice": pa.array([p[1] for p in pts], pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    out = q_pareto_frontier_orders(str(tmp_path)).to_pandas()

    brute = _brute_frontier(
        [(d, round(p * 100)) for d, p in pts]
    )
    got = {
        (int(r.o_orderdate.value // 1000) // day, int(r.price_cents)):
            int(r.n_orders)
        for r in out.itertuples()
    }
    assert got == brute
    assert got[(3, 7525)] == 2
