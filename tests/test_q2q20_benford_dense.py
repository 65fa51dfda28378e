"""Q2/Q20 join shapes, Benford audit, and dense daily resample."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("lineitem", "supplier", "nation", "orders", "events")


def _oracle(name: str) -> pd.DataFrame:
    import duckdb

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con.execute(e.oracle_sql()[name]).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (
        df[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )


@pytest.mark.parametrize(
    "name",
    [
        "cheapest_supplier_per_part",
        "excess_supply_suppliers",
        "benford_orders",
        "events_daily_dense",
    ],
)
def test_vs_oracle_sf0001(ray_session, name):
    from ocr_ray import driver as drv

    got = _norm(drv.QUERIES[name](SF).to_pandas())
    want = _norm(_oracle(name))
    assert len(got) == len(want), (name, len(got), len(want))
    for c in want.columns:
        g, w = got[c], want[c]
        if w.dtype.kind in "iuf":
            assert (
                g.astype("int64").equals(w.astype("int64"))
            ), (name, c)
        else:
            assert g.astype(str).equals(w.astype(str)), (name, c)


def test_benford_digits_hand(ray_session):
    import ray.data as rd

    from ocr_ray.ops.profile import benford_digits

    t = pa.table(
        {"v": pa.array([1.5, 19.0, 0.5, 23.0, 9.99], pa.float64())}
    )
    out = (
        benford_digits(rd.from_arrow(t), "v")
        .to_pandas()
        .set_index("digit")
    )
    # floor → 1, 19, (0.5 excluded), 23, 9 → first digits 1, 1, 2, 9
    assert list(out.index) == list(range(1, 10))
    assert out.loc[1, "n"] == 2 and out.loc[2, "n"] == 1
    assert out.loc[9, "n"] == 1 and out["n"].sum() == 4
    assert (out["chi2_nano"] >= 0).all()
    assert out.loc[1, "expected_millionths"] == 301030


def test_daily_dense_fill_hand(ray_session):
    import ray.data as rd

    from ocr_ray.ops.resample import daily_dense_fill

    day = 86_400_000_000
    events = pa.table(
        {
            "ts": pa.array([0, 2 * day, day + 5], pa.timestamp("us")),
            "event_type": pa.array(["a", "a", "b"], pa.string()),
            "value": pa.array([1.0, 2.0, 3.5], pa.float64()),
        }
    )
    out = daily_dense_fill(rd.from_arrow(events)).to_pandas()
    a = out[out.event_type == "a"].sort_values("day_idx")
    assert list(a.n_events) == [1, 0, 1]
    assert list(a.cum_events) == [1, 1, 2]
    assert list(a.locf_cents) == [100, 100, 200]
    b = out[out.event_type == "b"].sort_values("day_idx")
    assert list(b.n_events) == [0, 1, 0]
    assert list(b.cum_events) == [0, 1, 1]
    assert list(b.locf_cents) == [0, 350, 350]
