"""Deterministic Poisson bootstrap over the event stream.

The standard way to put an error bar on a metric computed from a
stream that is too large to resample by shuffling: each of R
replicates assigns every record an independent Poisson(1) weight, and
the spread of the R weighted means estimates the sampling
distribution of the plain mean (Chamandy et al., "Estimating
Uncertainty for Massive Data Streams", the production bootstrap at
map-reduce scale).

Determinism discipline: the Poisson draw is a pure hash — a 64-bit
md5-derived key per event scrambled per replicate with 32-bit integer
arithmetic, inverse-CDF'd through PRECOMPUTED scaled thresholds — so
both engines replay the identical weights and the only float is the
final mean division.  Everything reduces map-side to R partial rows
per batch (R = 32 by default): no shuffle of event rows, one tiny
keyed sum.

Scale shape: the per-batch cost is one md5 per event plus vectorized
numpy over an (events x R) implicit grid folded immediately to R
partial sums; output is R rows regardless of input size.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# Poisson(1) inverse-CDF thresholds scaled to 2^32 (floor(CDF_k * 2^32)
# for k = 0..7, weight capped at 8); frozen literals so both engines
# and any platform agree bit-for-bit
POISSON_T = (
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
    4294609777,
    4294923276,
)
C1 = 2654435761  # Knuth multiplicative constant
C2 = 40503
C3 = 2246822519  # xxhash prime


def bootstrap_mean_ci(events, replicates: int = 32):
    """Per-replicate Poisson-bootstrap weighted mean of event value
    cents: (replicate, n_eff, total_cents, mean_cents), R rows total.
    The caller reads the CI off the sorted replicate means (e.g.
    2.5%/97.5% ranks); rows are emitted per replicate so the oracle
    hash pins every weighted sum exactly.
    """
    from ray.data.aggregate import Sum

    from ocr_ray.driver import _cents
    from ocr_ray.ops.dedup import _with_schema

    reps = np.arange(replicates, dtype=np.uint64)
    thresholds = np.asarray(POISSON_T, dtype=np.uint64)

    part_schema = pa.schema(
        [
            ("replicate", pa.int64()),
            ("n_eff", pa.int64()),
            ("total_cents", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        ids = t.column("event_id").to_pylist()
        hi = np.empty(len(ids), dtype=np.uint64)
        lo = np.empty(len(ids), dtype=np.uint64)
        for i, eid in enumerate(ids):
            d = hashlib.md5(str(eid).encode()).hexdigest()
            hi[i] = int(d[:8], 16)
            lo[i] = int(d[8:16], 16)
        cents = _cents(t["value"]).to_numpy(zero_copy_only=False)
        # (events x R) scrambles mod 2^32; uint64 wrap-around is exact
        # because 2^32 divides 2^64
        u = (
            lo[:, None] * np.uint64(C1)
            + reps[None, :] * np.uint64(C2)
            + hi[:, None] * np.uint64(C3)
        ) & np.uint64(0xFFFFFFFF)
        w = np.searchsorted(thresholds, u.ravel(), side="right").reshape(
            u.shape
        )  # Poisson(1) weight 0..8 per (event, replicate)
        return pa.table(
            {
                "replicate": pa.array(
                    np.arange(replicates, dtype=np.int64), pa.int64()
                ),
                "n_eff": pa.array(
                    w.sum(axis=0).astype(np.int64), pa.int64()
                ),
                "total_cents": pa.array(
                    (w * cents[:, None]).sum(axis=0).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    summed = (
        events.map_batches(partials, batch_format="pyarrow")
        .groupby("replicate")
        .aggregate(
            Sum("n_eff", alias_name="n_eff"),
            Sum("total_cents", alias_name="total_cents"),
        )
    )

    out_schema = pa.schema(
        [
            ("replicate", pa.int64()),
            ("n_eff", pa.int64()),
            ("total_cents", pa.int64()),
            ("mean_cents", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        n = t.column("n_eff").to_numpy(zero_copy_only=False)
        s = t.column("total_cents").to_numpy(zero_copy_only=False)
        mean = np.where(
            n > 0, s.astype(np.float64) / n.astype(np.float64), 0.0
        )
        return pa.table(
            {
                "replicate": t.column("replicate").cast(pa.int64()),
                "n_eff": t.column("n_eff").cast(pa.int64()),
                "total_cents": t.column("total_cents").cast(pa.int64()),
                "mean_cents": pa.array(mean, pa.float64()),
            }
        )

    return _with_schema(summed, part_schema).map_batches(
        finish, batch_format="pyarrow"
    )


def bootstrap_mean_ci_sql(replicates: int = 32) -> str:
    w_terms = " + ".join(
        f"(u >= {t}::HUGEINT)::INT" for t in POISSON_T
    )
    return (
        "WITH e AS (\n"
        " SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT AS hi,\n"
        "  ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 9, 8))::BIGINT AS lo,\n"
        "  CAST(ROUND(value * 100.0) AS BIGINT) AS cents\n"
        " FROM events\n"
        "), reps AS (\n"
        f" SELECT unnest(generate_series(0, {replicates - 1})) AS replicate\n"
        "), u AS (\n"
        f" SELECT replicate, cents,\n"
        f"  (lo::HUGEINT * {C1} + replicate * {C2} + hi::HUGEINT * {C3})\n"
        "   % 4294967296 AS u\n"
        " FROM e CROSS JOIN reps\n"
        "), w AS (\n"
        f" SELECT replicate, cents, ({w_terms}) AS w FROM u\n"
        ")\n"
        "SELECT replicate, CAST(SUM(w) AS BIGINT) AS n_eff,\n"
        " CAST(SUM(w * cents) AS BIGINT) AS total_cents,\n"
        " CASE WHEN SUM(w) > 0 THEN\n"
        "  CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)\n"
        " ELSE 0.0 END AS mean_cents\n"
        "FROM w GROUP BY replicate"
    )
