"""customer_rfm vs a hand NTILE oracle (uneven split: 6 customers into
quartiles → tile sizes 2,2,1,1; key tie-break on equal values)."""
from __future__ import annotations

import pyarrow as pa


def _ntile(vals_keys, tiles=4):
    """SQL NTILE over (value, key) ascending."""
    order = sorted(range(len(vals_keys)), key=lambda i: vals_keys[i])
    n = len(order)
    big = n % tiles
    hi = -(-n // tiles)
    lo = n // tiles
    cut = big * hi
    out = {}
    for rank0, i in enumerate(order):
        rn = rank0 + 1
        t = (rn - 1) // hi + 1 if rn <= cut else big + (rn - cut - 1) // max(lo, 1) + 1
        out[vals_keys[i][1]] = t
    return out


def test_customer_rfm(ray_session):
    import ray.data as rd

    from ocr_ray.ops.stats import customer_rfm

    day = 86_400_000_000
    # (custkey, order day index, price) — customer 1 has two orders
    orders = [
        (1, 10, 100.00), (1, 2, 50.00),
        (2, 9, 10.00),
        (3, 8, 10.00),   # same spend as 2 → m tie-break by key
        (4, 5, 300.00),
        (5, 10, 20.00),  # same recency as 1 → r tie-break by key
        (6, 1, 999.99),
    ]
    t = pa.table(
        {
            "o_custkey": pa.array([o[0] for o in orders], pa.int64()),
            "o_orderdate": pa.array(
                [o[1] * day for o in orders], pa.timestamp("us")
            ),
            "o_totalprice": pa.array([o[2] for o in orders], pa.float64()),
        }
    )
    out = customer_rfm(rd.from_arrow(t)).to_pandas()

    r_days = {1: 0, 2: 1, 3: 2, 4: 5, 5: 0, 6: 9}
    n_ord = {1: 2, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1}
    cents = {1: 15000, 2: 1000, 3: 1000, 4: 30000, 5: 2000, 6: 99999}
    r_t = _ntile([(r_days[c], c) for c in r_days])
    f_t = _ntile([(n_ord[c], c) for c in n_ord])
    m_t = _ntile([(cents[c], c) for c in cents])

    for row in out.itertuples():
        c = int(row.c_custkey)
        assert (
            int(row.r_days), int(row.n_orders), int(row.total_cents)
        ) == (r_days[c], n_ord[c], cents[c]), c
        assert (int(row.r_tile), int(row.f_tile), int(row.m_tile)) == (
            r_t[c], f_t[c], m_t[c]
        ), c
        assert int(row.rfm_code) == r_t[c] * 100 + f_t[c] * 10 + m_t[c]
    assert len(out) == 6
