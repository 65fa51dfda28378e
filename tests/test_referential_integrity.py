"""referential_integrity must count planted orphans, weighted by row
multiplicity, and read zero on a clean snapshot."""
from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, lineitem_keys, order_keys, order_custs, cust_keys):
    pq.write_table(
        pa.table({"l_orderkey": pa.array(lineitem_keys, pa.int64())}),
        tmp_path / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(order_keys, pa.int64()),
                "o_custkey": pa.array(order_custs, pa.int64()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array(cust_keys, pa.int64())}),
        tmp_path / "customer.parquet",
    )


def test_planted_orphans(ray_session, tmp_path):
    from ocr_ray.driver import q_referential_integrity

    # lineitems 7,7,8 have no order (3 orphan ROWS over 2 keys);
    # order 3 references customer 99 which does not exist
    _write(
        tmp_path,
        lineitem_keys=[1, 1, 2, 7, 7, 8],
        order_keys=[1, 2, 3],
        order_custs=[10, 11, 99],
        cust_keys=[10, 11],
    )
    out = q_referential_integrity(str(tmp_path)).to_pandas()
    assert int(out.n_orphan_lineitems[0]) == 3
    assert int(out.n_orphan_orders[0]) == 1


def test_clean_snapshot(ray_session, tmp_path):
    from ocr_ray.driver import q_referential_integrity

    _write(
        tmp_path,
        lineitem_keys=[1, 2, 2],
        order_keys=[1, 2],
        order_custs=[10, 10],
        cust_keys=[10],
    )
    out = q_referential_integrity(str(tmp_path)).to_pandas()
    assert int(out.n_orphan_lineitems[0]) == 0
    assert int(out.n_orphan_orders[0]) == 0
