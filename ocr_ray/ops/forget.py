"""Right-to-be-forgotten deletion propagation.

A GDPR-style erasure request names customers; every fact row reachable
from them (their orders, those orders' lineitems) must go too, and the
operator has to PROVE what it deleted — per-table deleted/remaining
counts plus a checksum of the surviving keys, the audit record the
reference keeps for destructive maintenance in its history DB
(ocr_history manifests; see SURVEY.md section on the history sink).

Scale shape: no table is ever materialized. Each table reduces map-side
to three integers (deleted count, remaining count, remaining-key
checksum) via per-batch partials and one keyed-less aggregate. The only
join is the genuine cascade edge — lineitem -> deleted orderkeys —
which runs through ``adaptive_key_join`` (broadcast while the deletion
set is small, hash join at scale); everything else derives the deletion
predicate from a local column (c_custkey / o_custkey) and never
shuffles.

Checksum arithmetic is overflow-safe by construction: each ROW
contributes ``key % P`` (< P = 2^31-1), each BATCH pre-reduces those
mod P (so a batch partial is < P), and the final sum of batch partials
stays inside int64 for up to ~4.3e9 batches — far past 100 TB at any
sane block size. The SQL oracle mirrors the identical mod chain (mod is
distributive over addition, so batch boundaries don't change the
value).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CHECKSUM_P = 2_147_483_647  # 2^31 - 1
DEFAULT_MOD = 97


def _partials(dm: np.ndarray, keys: np.ndarray) -> pa.Table:
    """One slim partial row per batch: (n_del, n_rem, rem_sum mod P)."""
    rem_keys = keys[~dm] % CHECKSUM_P
    return pa.table(
        {
            "n_del": pa.array([int(dm.sum())], pa.int64()),
            "n_rem": pa.array([int((~dm).sum())], pa.int64()),
            "rem_sum": pa.array([int(rem_keys.sum() % CHECKSUM_P)], pa.int64()),
        }
    )


def _reduce(ds) -> tuple[int, int, int]:
    from ray.data.aggregate import Sum

    agg = ds.aggregate(
        Sum("n_del", alias_name="d"),
        Sum("n_rem", alias_name="r"),
        Sum("rem_sum", alias_name="s"),
    )
    if agg is None:  # zero-block input: Ray returns no aggregate row
        return 0, 0, 0
    return (
        int(agg["d"] or 0),
        int(agg["r"] or 0),
        int(agg["s"] or 0) % CHECKSUM_P,
    )


def forget_customers(customer, orders, lineitem, mod: int = DEFAULT_MOD):
    """Cascade-delete every customer with ``c_custkey % mod == 0`` and
    report, per table, how many rows were erased, how many survive, and
    the mod-P checksum of the surviving primary keys (lineitem key =
    l_orderkey * 16 + l_linenumber — l_linenumber <= 7 in TPC-H shaped
    data, so the composite is injective and fits int64).

    ``customer`` / ``orders`` need no join: their deletion predicate is
    a local column. ``lineitem`` is the real cascade edge and goes
    through ``adaptive_key_join`` against the deleted-orderkey set.
    """
    from ocr_ray.ops.joins import adaptive_key_join

    def cust_partials(t: pa.Table) -> pa.Table:
        keys = pc.cast(t["c_custkey"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return _partials(keys % mod == 0, keys)

    def ord_partials(t: pa.Table) -> pa.Table:
        keys = pc.cast(t["o_orderkey"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ck = pc.cast(t["o_custkey"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return _partials(ck % mod == 0, keys)

    c_del, c_rem, c_sum = _reduce(
        customer.map_batches(cust_partials, batch_format="pyarrow")
    )
    o_del, o_rem, o_sum = _reduce(
        orders.map_batches(ord_partials, batch_format="pyarrow")
    )

    # --- the cascade edge: lineitems of deleted orders -------------------
    def _del_orders_batch(t: pa.Table) -> pa.Table:
        ok = pc.cast(t["o_orderkey"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ck = pc.cast(t["o_custkey"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {"o_orderkey": pa.array(ok[ck % mod == 0], pa.int64())}
        )

    del_orders = orders.map_batches(_del_orders_batch, batch_format="pyarrow")

    li = lineitem.map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "li_key": pc.add(
                    pc.multiply(pc.cast(t["l_orderkey"], pa.int64()), 16),
                    pc.cast(t["l_linenumber"], pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    # totals + matched (deleted) moments in two streaming passes; the
    # remaining side is totals minus matched, so no anti-join is needed
    def li_tot(t: pa.Table) -> pa.Table:
        keys = t["li_key"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "s": pa.array(
                    [int((keys % CHECKSUM_P).sum() % CHECKSUM_P)], pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Sum

    tot = li.map_batches(li_tot, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("s", alias_name="s")
    )
    tot = tot or {"n": 0, "s": 0}
    l_tot_n = int(tot["n"] or 0)
    l_tot_s = int(tot["s"] or 0) % CHECKSUM_P

    matched = adaptive_key_join(
        del_orders, li, on="o_orderkey", right_on="l_orderkey"
    )

    def li_del(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "li_key" not in t.column_names:
            return pa.table(
                {"n": pa.array([0], pa.int64()), "s": pa.array([0], pa.int64())}
            )
        keys = t["li_key"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "s": pa.array(
                    [int((keys % CHECKSUM_P).sum() % CHECKSUM_P)], pa.int64()
                ),
            }
        )

    md = matched.map_batches(li_del, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("s", alias_name="s")
    )
    md = md or {"n": 0, "s": 0}
    l_del_n = int(md["n"] or 0)
    l_del_s = int(md["s"] or 0) % CHECKSUM_P

    return pa.table(
        {
            "table_name": pa.array(
                ["customer", "lineitem", "orders"], pa.string()
            ),
            "n_deleted": pa.array([c_del, l_del_n, o_del], pa.int64()),
            "n_remaining": pa.array(
                [c_rem, l_tot_n - l_del_n, o_rem], pa.int64()
            ),
            "remaining_checksum": pa.array(
                [c_sum, (l_tot_s - l_del_s) % CHECKSUM_P, o_sum], pa.int64()
            ),
        }
    )


def forget_customers_sql(mod: int = DEFAULT_MOD) -> str:
    """SQL replay of the cascade audit. SUM runs in HUGEINT, each row
    contributes key % P, and the final mod matches the engine's
    batch-wise mod chain exactly (mod distributes over addition)."""
    p = CHECKSUM_P
    return (
        "SELECT 'customer' AS table_name,\n"
        f" CAST(COUNT(*) FILTER (WHERE c_custkey % {mod} = 0) AS BIGINT)"
        " AS n_deleted,\n"
        f" CAST(COUNT(*) FILTER (WHERE c_custkey % {mod} <> 0) AS BIGINT)"
        " AS n_remaining,\n"
        f" CAST(COALESCE(SUM(c_custkey % {p})"
        f" FILTER (WHERE c_custkey % {mod} <> 0), 0) % {p} AS BIGINT)"
        " AS remaining_checksum\n"
        "FROM customer\n"
        "UNION ALL\n"
        "SELECT 'lineitem',\n"
        f" CAST(COUNT(*) FILTER (WHERE o.o_custkey % {mod} = 0) AS BIGINT),\n"
        f" CAST(COUNT(*) FILTER (WHERE o.o_custkey % {mod} <> 0) AS BIGINT),\n"
        f" CAST(COALESCE(SUM((l.l_orderkey * 16 + l.l_linenumber) % {p})"
        f" FILTER (WHERE o.o_custkey % {mod} <> 0), 0) % {p} AS BIGINT)\n"
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey\n"
        "UNION ALL\n"
        "SELECT 'orders',\n"
        f" CAST(COUNT(*) FILTER (WHERE o_custkey % {mod} = 0) AS BIGINT),\n"
        f" CAST(COUNT(*) FILTER (WHERE o_custkey % {mod} <> 0) AS BIGINT),\n"
        f" CAST(COALESCE(SUM(o_orderkey % {p})"
        f" FILTER (WHERE o_custkey % {mod} <> 0), 0) % {p} AS BIGINT)\n"
        "FROM orders"
    )
