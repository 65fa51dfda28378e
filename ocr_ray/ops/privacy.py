"""Privacy audits beyond k-anonymity: l-diversity.

k-anonymity (driver.q_k_anonymity_customer) only checks equivalence-
class SIZE; a class of 1,000 rows that all share one sensitive value
still leaks it. l-diversity requires every quasi-identifier class to
contain at least ``l`` DISTINCT sensitive values (Machanavajjhala et
al. 2007). The reference keeps analogous exposure rollups in its
stats endpoints (ocr_service.py); this is the release-gate variant a
training-data pipeline runs before publishing per-group aggregates.

Scale shape: the sensitive attribute is bucketed map-side, then the
corpus reduces to distinct (qid, bucket) triples with per-triple row
counts — one keyed aggregate, output bounded by #classes x #buckets,
independent of row count. The class-level distinct count and exposure
fold is a second tiny keyed pass over that bounded table.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_L = 3
BUCKET_WIDTH = 1000.0


def l_diversity_audit(customer, l_threshold: int = DEFAULT_L,
                      bucket_width: float = BUCKET_WIDTH):
    """Violating quasi-identifier classes under l-diversity.

    Quasi-identifiers: (c_nationkey, c_mktsegment). Sensitive
    attribute: the account-balance bucket ``floor(c_acctbal /
    bucket_width)`` — one IEEE divide + floor on the raw double, so
    the bucket id is bit-identical to the SQL oracle's
    ``FLOOR(c_acctbal / w)``.

    Output: one row per class — (nat, seg, n_rows, l_distinct,
    violates) — with ``violates`` true where the class has fewer than
    ``l_threshold`` distinct sensitive buckets (the rows a release
    gate would block). All classes are emitted so the audit is
    non-degenerate on corpora with zero violations.
    """
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        bucket = pc.cast(
            pc.floor(pc.divide(t["c_acctbal"], bucket_width)), pa.int64()
        )
        tbl = pa.table(
            {
                "nat": t["c_nationkey"].cast(pa.int64()),
                "seg": t["c_mktsegment"],
                "bucket": bucket,
            }
        )
        g = tbl.group_by(["nat", "seg", "bucket"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["nat", "seg", "bucket", "n"])

    triples = (
        customer.map_batches(partials, batch_format="pyarrow")
        .groupby(["nat", "seg", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
    )

    # bounded: #classes x #buckets rows survive the shuffle
    tbl = pa.Table.from_pylist(
        triples.take_all(),
        schema=pa.schema(
            [
                ("nat", pa.int64()),
                ("seg", pa.string()),
                ("bucket", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
    )
    out_schema = pa.schema(
        [
            ("nat", pa.int64()),
            ("seg", pa.string()),
            ("n_rows", pa.int64()),
            ("l_distinct", pa.int64()),
            ("violates", pa.bool_()),
        ]
    )
    if tbl.num_rows == 0:
        return out_schema.empty_table()
    agg = (
        tbl.group_by(["nat", "seg"])
        .aggregate([("n", "sum"), ("bucket", "count_distinct")])
        .rename_columns(["nat", "seg", "n_rows", "l_distinct"])
    )
    l_dist = agg["l_distinct"].cast(pa.int64())
    return pa.table(
        {
            "nat": agg["nat"],
            "seg": agg["seg"],
            "n_rows": agg["n_rows"].cast(pa.int64()),
            "l_distinct": l_dist,
            "violates": pc.less(l_dist, l_threshold),
        }
    )


def l_diversity_audit_sql(l_threshold: int = DEFAULT_L,
                          bucket_width: float = BUCKET_WIDTH) -> str:
    """SQL replay: same FLOOR-divide bucket, COUNT(DISTINCT) per class,
    violation flag below the threshold."""
    return (
        "SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,\n"
        " CAST(COUNT(*) AS BIGINT) AS n_rows,\n"
        " CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / "
        f"{bucket_width!r}) AS BIGINT)) AS BIGINT) AS l_distinct,\n"
        f" COUNT(DISTINCT CAST(FLOOR(c_acctbal / {bucket_width!r})"
        f" AS BIGINT)) < {l_threshold} AS violates\n"
        "FROM customer GROUP BY 1, 2"
    )
