"""Table profiling — the data-quality family every engine front-door
needs before a 100 TB job: per-column completeness / cardinality /
range / central-tendency (``table_profile``) and the pairwise Pearson
correlation matrix over a table's numeric columns (``corr_matrix``).

Reference parity: the reference surfaces per-run dataset statistics
(``ocr_service.py`` run stats, history rollups); this module is the
generic engine-level version of that capability, expressed
Ray-Data-first.

Scale shape
-----------
``table_profile`` makes exactly TWO passes' worth of work from ONE scan:

* moment partials — each input block collapses to ≤ n_cols slim rows
  (count / nulls / fixed-point min / max / sum as exact int64), merged
  by a tiny ``groupby(column)``; nothing the size of the input ever
  shuffles;
* exact distinct counts — each block emits its per-column UNIQUE values
  as slim ``(column, val)`` string rows (in-block dedup first, so a
  column with few distincts ships few rows regardless of block size),
  hash-partitioned by ``(column, val)`` so one more in-block dedup +
  count per column is globally exact. The value encoding is injective
  (``repr`` for doubles round-trips), so the COUNT matches SQL's
  ``COUNT(DISTINCT col)`` without shipping native values.

All means use the established fixed-point contract: per-value
micro-units (×1e6, half-away-from-zero like DuckDB's ROUND) summed as
exact integers, one double division at the very end — bit-identical to
the SQL oracle regardless of Ray's unordered partial aggregation.

``corr_matrix`` generalizes ``ops.stats.length_token_correlation`` to
all column pairs in one pass: every block emits one exact-int64 moment
row per pair (Σx, Σy, Σxy, Σx², Σy² on fixed-point integers), a ≤(k²)
-row groupby merges them, and the final float expression is shared
term-for-term with the oracle. An explicit n·mx² < 2^63 witness guards
silent int64 wrap (same contract as the stats module).
"""
from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MICRO = 1_000_000

# column kinds the profiler understands
K_INT = "int"
K_FLOAT = "float"
K_TS = "ts"
K_STR = "str"


def _micro_ints(arr: pa.ChunkedArray | pa.Array, kind: str) -> np.ndarray:
    """Exact fixed-point (×1e6) integers for a numeric/timestamp column,
    nulls dropped. Doubles round half away from zero (DuckDB ROUND)."""
    arr = pc.drop_null(arr)
    if kind == K_INT:
        vals = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return vals * MICRO
    if kind == K_FLOAT:
        return (
            pc.cast(
                pc.round(
                    pc.multiply(arr, float(MICRO)),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
        )
    if kind == K_TS:
        # epoch microseconds — already the integer micro-unit
        return arr.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
    raise ValueError(f"not a numeric kind: {kind}")


def _distinct_keys(arr: pa.ChunkedArray | pa.Array, kind: str) -> list[str]:
    """Injective string encodings of a column's in-block distinct values
    (nulls excluded — COUNT(DISTINCT) semantics)."""
    uniq = pc.drop_null(pc.unique(
        arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    ))
    if kind == K_FLOAT:
        # repr(float) round-trips: distinct reprs == distinct doubles
        return [repr(v) for v in uniq.to_pylist()]
    if kind == K_TS:
        return [str(v) for v in uniq.cast(pa.timestamp("us")).cast(pa.int64()).to_pylist()]
    return [str(v) for v in uniq.to_pylist()]


_PART_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("n", pa.int64()),
        ("nulls", pa.int64()),
        ("min_num", pa.int64()),   # fixed-point micro (numeric/ts); null for str
        ("max_num", pa.int64()),
        ("sum_micro", pa.int64()),  # numeric only; null otherwise
        ("min_str", pa.string()),   # string columns only
        ("max_str", pa.string()),
    ]
)

_OUT_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("n", pa.int64()),
        ("nulls", pa.int64()),
        ("n_distinct", pa.int64()),
        ("min_num", pa.int64()),
        ("max_num", pa.int64()),
        ("mean_micro", pa.int64()),
        ("min_str", pa.string()),
        ("max_str", pa.string()),
    ]
)

_DISTINCT_SCHEMA = pa.schema([("column", pa.string()), ("val", pa.string())])


def table_profile(ds, spec: Sequence[tuple[str, str]]):
    """Per-column profile of ``ds``: row count, null count, exact
    distinct count, fixed-point min/max/mean for numeric (int/float)
    and timestamp columns, lexicographic min/max for strings.

    ``spec`` is ``[(column, kind)]`` with kind in {int, float, ts, str}.
    Returns a Dataset with one row per profiled column (≤ len(spec)
    rows total — the driver-side combine is bounded by construction).
    """
    from ray.data.aggregate import Max, Min, Sum

    from ocr_ray.ops.dedup import _with_schema
    from ocr_ray.stages.grouped import grouped_map

    spec = list(spec)
    numeric_kinds = (K_INT, K_FLOAT, K_TS)

    def moment_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PART_SCHEMA.empty_table()
        rows = []
        for col, kind in spec:
            arr = t.column(col)
            n = t.num_rows
            nulls = arr.null_count
            row = {
                "column": col, "n": n, "nulls": nulls,
                "min_num": None, "max_num": None, "sum_micro": None,
                "min_str": None, "max_str": None,
            }
            if n > nulls:
                if kind in numeric_kinds:
                    vals = _micro_ints(arr, kind)
                    row["min_num"] = int(vals.min())
                    row["max_num"] = int(vals.max())
                    if kind != K_TS:
                        # Python-int sum: exact regardless of magnitude
                        row["sum_micro"] = int(sum(int(v) for v in vals))
                else:
                    valid = pc.drop_null(arr)
                    row["min_str"] = pc.min(valid).as_py()
                    row["max_str"] = pc.max(valid).as_py()
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=_PART_SCHEMA)

    moments = _with_schema(
        ds.map_batches(moment_partials, batch_format="pyarrow")
        .groupby("column")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("nulls", alias_name="nulls"),
            Min("min_num", alias_name="min_num"),
            Max("max_num", alias_name="max_num"),
            Sum("sum_micro", alias_name="sum_micro"),
            Min("min_str", alias_name="min_str"),
            Max("max_str", alias_name="max_str"),
        ),
        pa.schema(
            [
                ("column", pa.string()),
                ("n", pa.int64()),
                ("nulls", pa.int64()),
                ("min_num", pa.int64()),
                ("max_num", pa.int64()),
                ("sum_micro", pa.int64()),
                ("min_str", pa.string()),
                ("max_str", pa.string()),
            ]
        ),
    )

    def distinct_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _DISTINCT_SCHEMA.empty_table()
        cols, vals = [], []
        for col, kind in spec:
            keys = _distinct_keys(t.column(col), kind)
            cols.extend([col] * len(keys))
            vals.extend(keys)
        return pa.table(
            {"column": pa.array(cols, pa.string()),
             "val": pa.array(vals, pa.string())},
        )

    def count_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        out = pa.schema([("column", pa.string()), ("nd", pa.int64())])
        if block.num_rows == 0:
            return out.empty_table()
        # hash partition by (column, val) ⇒ each distinct pair lives in
        # exactly one group here; count groups per column
        col_at_start = block.column("column").take(
            pa.array(starts, pa.int64())
        )
        agg = pa.table({"column": col_at_start}).group_by("column").aggregate(
            [("column", "count")]
        )
        return pa.table(
            {"column": agg.column("column"),
             "nd": agg.column("column_count").cast(pa.int64())},
        )

    distinct = grouped_map(
        ds.map_batches(distinct_rows, batch_format="pyarrow"),
        keys=["column", "val"],
        block_fn=count_block,
    )
    from ray.data.aggregate import Sum as _Sum

    distinct_final = _with_schema(
        distinct.groupby("column").aggregate(_Sum("nd", alias_name="n_distinct")),
        pa.schema([("column", pa.string()), ("n_distinct", pa.int64())]),
    )

    # both sides are ≤ len(spec) rows — the driver combine is bounded
    mrows = {r["column"]: r for r in moments.take_all()}
    drows = {r["column"]: r["n_distinct"] for r in distinct_final.take_all()}
    out = []
    for col, kind in spec:
        m = mrows.get(col)
        if m is None:  # empty input dataset
            out.append(
                {"column": col, "n": 0, "nulls": 0, "n_distinct": 0,
                 "min_num": None, "max_num": None, "mean_micro": None,
                 "min_str": None, "max_str": None}
            )
            continue
        n_valid = m["n"] - m["nulls"]
        mean_micro = None
        if kind in (K_INT, K_FLOAT) and n_valid > 0 and m["sum_micro"] is not None:
            # one double division over exact ints, rounded half away
            # from zero (DuckDB ROUND) — the oracle's exact form
            q = m["sum_micro"] / float(n_valid)
            mean_micro = int(math.copysign(math.floor(abs(q) + 0.5), q))
        out.append(
            {
                "column": col, "n": m["n"], "nulls": m["nulls"],
                "n_distinct": int(drows.get(col, 0)),
                "min_num": m["min_num"], "max_num": m["max_num"],
                "mean_micro": mean_micro,
                "min_str": m["min_str"], "max_str": m["max_str"],
            }
        )
    return pa.Table.from_pylist(out, schema=_OUT_SCHEMA)


def table_profile_sql(table: str, spec: Sequence[tuple[str, str]]) -> str:
    """DuckDB oracle for :func:`table_profile` — one UNION ALL branch per
    column, term-for-term the engine's fixed-point expressions."""
    branches = []
    for col, kind in spec:
        if kind == K_INT:
            min_num = f"CAST(MIN({col}) * 1000000 AS BIGINT)"
            max_num = f"CAST(MAX({col}) * 1000000 AS BIGINT)"
            mean = (
                f"CAST(ROUND(SUM(CAST({col} AS BIGINT) * 1000000)"
                f" / CAST(COUNT({col}) AS DOUBLE)) AS BIGINT)"
            )
        elif kind == K_FLOAT:
            micro = f"CAST(ROUND({col} * 1000000.0) AS BIGINT)"
            min_num = f"MIN({micro})"
            max_num = f"MAX({micro})"
            mean = (
                f"CAST(ROUND(SUM({micro})"
                f" / CAST(COUNT({col}) AS DOUBLE)) AS BIGINT)"
            )
        elif kind == K_TS:
            min_num = f"CAST(epoch_us(MIN({col})) AS BIGINT)"
            max_num = f"CAST(epoch_us(MAX({col})) AS BIGINT)"
            mean = "CAST(NULL AS BIGINT)"
        else:
            min_num = "CAST(NULL AS BIGINT)"
            max_num = "CAST(NULL AS BIGINT)"
            mean = "CAST(NULL AS BIGINT)"
        if kind == K_STR:
            min_str, max_str = f"MIN({col})", f"MAX({col})"
        else:
            min_str = max_str = "CAST(NULL AS VARCHAR)"
        branches.append(
            f"SELECT '{col}' AS column,"
            " CAST(COUNT(*) AS BIGINT) AS n,"
            f" CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS nulls,"
            f" CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,"
            f" {min_num} AS min_num, {max_num} AS max_num,"
            f" {mean} AS mean_micro,"
            f" {min_str} AS min_str, {max_str} AS max_str"
            f" FROM {table}"
        )
    return "\nUNION ALL\n".join(branches)


# ---------------------------------------------------------------------------
# pairwise correlation matrix


def corr_matrix(ds, cols: Sequence[tuple[str, float]]):
    """Pearson correlation for every unordered pair of the fixed-point
    numeric columns ``cols`` = [(name, scale)] — values ×scale must be
    exactly integral (the TPC-H money/rate columns are: price has cents,
    discount/tax have hundredths, quantity is whole).

    One pass: each block emits one exact-int64 moment row per pair;
    a ≤C(k,2)-row groupby merges; the closing float expression is shared
    term-for-term with :func:`corr_matrix_sql`.
    """
    from ray.data.aggregate import Max, Sum

    from ocr_ray.ops.dedup import _with_schema

    cols = list(cols)
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    # moment sums ship as TWO int64 limbs (hi·2^62 + lo) so no sum can
    # overflow Ray's int64 aggregate at any corpus size — the MinHash
    # HUGEINT-limb precedent (Σx² for cents-scaled prices exceeds 2^63
    # from ~6·10^8 rows; the old single-int64 schema crashed the
    # aggregator at sf0.1)
    _SUMS = ("sx", "sy", "sxy", "sxx", "syy")
    # limb width 42: per-block lo < 2^42, so Ray's int64 Sum over even
    # a million blocks stays < 2^62 (no carry logic needed); hi carries
    # the magnitude and its sum is ≤ total/2^42 — tiny
    _LIMB = 1 << 42
    part_schema = pa.schema(
        [("col_x", pa.string()), ("col_y", pa.string()),
         ("n", pa.int64())]
        + [(f"{s}_{p}", pa.int64()) for s in _SUMS for p in ("hi", "lo")]
        + [("mx", pa.int64())]
    )

    def to_ints(t: pa.Table, name: str, scale: float) -> np.ndarray:
        arr = t.column(name)
        if scale == 1.0:
            return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pc.cast(
            pc.round(pc.multiply(arr, scale), round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)

    def exact_dot(a: np.ndarray, b: np.ndarray) -> int:
        """Exact Σ a_i·b_i for nonnegative int64 arrays: chunk so each
        int64 partial dot cannot wrap, fold chunks in Python ints."""
        if len(a) == 0:
            return 0
        m = int(a.max()) * int(b.max())
        if m >= 1 << 62:
            # per-ELEMENT product would overflow the vectorized dot
            raise OverflowError(
                "corr_matrix: per-element product >= 2^62 — lower the "
                "fixed-point scale for this column pair"
            )
        step = max(1, (1 << 62) // max(m, 1))
        return sum(
            int(np.dot(a[s:s + step], b[s:s + step]))
            for s in range(0, len(a), step)
        )

    def moments(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        ints = {name: to_ints(t, name, scale) for name, scale in cols}
        for name, v in ints.items():
            if len(v) and int(v.min()) < 0:
                raise ValueError(
                    f"corr_matrix: negative fixed-point values in {name} "
                    "— the limb encoding assumes nonnegative columns"
                )
        rows = []
        for (nx, _), (ny, _) in pairs:
            x, y = ints[nx], ints[ny]
            ones_x = np.ones_like(x)
            sums = {
                "sx": exact_dot(x, ones_x),
                "sy": exact_dot(y, np.ones_like(y)),
                "sxy": exact_dot(x, y),
                "sxx": exact_dot(x, x),
                "syy": exact_dot(y, y),
            }
            row = {"col_x": nx, "col_y": ny, "n": len(x),
                   "mx": int(max(x.max(), y.max()))}
            for s, v in sums.items():
                row[f"{s}_hi"], row[f"{s}_lo"] = divmod(v, _LIMB)
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=part_schema)

    merged = _with_schema(
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby(["col_x", "col_y"])
        .aggregate(
            Sum("n", alias_name="n"),
            *[
                Sum(f"{s}_{p}", alias_name=f"{s}_{p}")
                for s in _SUMS
                for p in ("hi", "lo")
            ],
            Max("mx", alias_name="mx"),
        ),
        part_schema,
    )

    out_schema = pa.schema(
        [
            ("col_x", pa.string()),
            ("col_y", pa.string()),
            ("n", pa.int64()),
            ("corr", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        # rebuild exact Python big ints from the limbs; float(bigint)
        # and DuckDB CAST(HUGEINT AS DOUBLE) are both correctly rounded,
        # so the shared final expression stays bit-identical
        cols_np = {c: t.column(c).to_pylist() for c in t.schema.names}
        corr_out = []
        for i in range(t.num_rows):
            fn = float(cols_np["n"][i])
            f = {}
            for s in _SUMS:
                v = (
                    int(cols_np[f"{s}_hi"][i]) * _LIMB
                    + int(cols_np[f"{s}_lo"][i])
                )
                f[s] = float(v)
            denom = np.sqrt(fn * f["sxx"] - f["sx"] * f["sx"]) * np.sqrt(
                fn * f["syy"] - f["sy"] * f["sy"]
            )
            corr_out.append(
                (fn * f["sxy"] - f["sx"] * f["sy"]) / denom
                if denom > 0.0
                else 0.0
            )
        return pa.table(
            {
                "col_x": t.column("col_x"),
                "col_y": t.column("col_y"),
                "n": t.column("n").cast(pa.int64()),
                "corr": pa.array(corr_out, pa.float64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def corr_matrix_sql(table: str, cols: Sequence[tuple[str, float]]) -> str:
    """DuckDB oracle for :func:`corr_matrix` — exact HUGEINT moment sums
    cast to DOUBLE before any arithmetic, the engine's exact term order."""
    cols = list(cols)

    def ix(name: str, scale: float) -> str:
        if scale == 1.0:
            return f"CAST({name} AS BIGINT)"
        return f"CAST(ROUND({name} * {scale}) AS BIGINT)"

    branches = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            (nx, sx_), (ny, sy_) = cols[i], cols[j]
            x, y = ix(nx, sx_), ix(ny, sy_)
            # sums stay HUGEINT (DuckDB's exact SUM over BIGINT) — a
            # BIGINT cast here overflows from ~6·10^8 cents-scaled rows
            branches.append(
                f"SELECT '{nx}' AS col_x, '{ny}' AS col_y,"
                " CAST(COUNT(*) AS BIGINT) AS n,"
                f" SUM({x}) AS sx,"
                f" SUM({y}) AS sy,"
                f" SUM({x} * {y}) AS sxy,"
                f" SUM({x} * {x}) AS sxx,"
                f" SUM({y} * {y}) AS syy"
                f" FROM {table}"
            )
    return (
        "WITH m AS (\n" + "\nUNION ALL\n".join(branches) + "\n)\n"
        ", d AS (SELECT col_x, col_y, n,"
        " CAST(n AS DOUBLE) AS fn, CAST(sx AS DOUBLE) AS fsx,"
        " CAST(sy AS DOUBLE) AS fsy, CAST(sxy AS DOUBLE) AS fsxy,"
        " CAST(sxx AS DOUBLE) AS fsxx, CAST(syy AS DOUBLE) AS fsyy"
        " FROM m)\n"
        "SELECT col_x, col_y, n,"
        " CASE WHEN sqrt(fn * fsxx - fsx * fsx)"
        " * sqrt(fn * fsyy - fsy * fsy) > 0.0"
        " THEN (fn * fsxy - fsx * fsy)"
        " / (sqrt(fn * fsxx - fsx * fsx) * sqrt(fn * fsyy - fsy * fsy))"
        " ELSE 0.0 END AS corr\n"
        "FROM d"
    )


# first-significant-digit expected frequencies, log10(1 + 1/d) in exact
# integer millionths — hardcoded so neither engine depends on its libm
_BENFORD_PM = (301030, 176091, 124939, 96910, 79181, 66947, 57992,
               51153, 45757)


def benford_digits(ds, col: str):
    """(digit, n, expected_millionths, chi2_nano): first-significant-
    digit histogram of ``col`` (rows with value >= 1) against Benford's
    law, with the per-digit chi-square contribution in nano-units.

    Fraud/entry-error screening is the classic 100 TB-ingest audit for
    monetary columns. Each block collapses to <= 9 count rows (the
    first digit comes from an integer divide loop, no log10 / no string
    round-trip); a 9-row keyed aggregate merges them; the final block
    reindexes to the full 1..9 support and evaluates the chi-square
    expression with the exact term order the SQL oracle uses, so the
    rounded nano-int matches bit-for-bit."""
    from ray.data.aggregate import Sum

    part_schema = pa.schema([("digit", pa.int64()), ("n", pa.int64())])

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return part_schema.empty_table()
        vals = t[col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        x = pc.cast(pc.floor(vals), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        x = x[x >= 1]
        if len(x) == 0:
            return part_schema.empty_table()
        # strip trailing digits: <= 19 iterations for any int64
        while (x >= 10).any():
            x = np.where(x >= 10, x // 10, x)
        digits, counts = np.unique(x, return_counts=True)
        return pa.table(
            {
                "digit": pa.array(digits, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
        .repartition(1)
    )

    out_schema = pa.schema(
        [
            ("digit", pa.int64()),
            ("n", pa.int64()),
            ("expected_millionths", pa.int64()),
            ("chi2_nano", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        dig = t["digit"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        dense = np.zeros(9, np.int64)
        dense[dig - 1] = n
        total = int(dense.sum())
        pm = np.array(_BENFORD_PM, np.int64)
        a = (dense * 1_000_000 - total * pm).astype(np.float64)
        den = float(total) * pm.astype(np.float64) * 1_000_000.0
        val = a * a / den * 1_000_000_000.0
        chi2 = np.floor(val + 0.5).astype(np.int64)
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                "n": pa.array(dense, pa.int64()),
                "expected_millionths": pa.array(pm, pa.int64()),
                "chi2_nano": pa.array(chi2, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def benford_sql(table: str, col: str) -> str:
    """DuckDB oracle: identical digit extraction (FLOOR + string head)
    and the chi-square expression with the same operation order."""
    pm_rows = ", ".join(
        f"({d}, {p})" for d, p in enumerate(_BENFORD_PM, start=1)
    )
    return (
        "WITH raw AS (\n"
        f" SELECT substr(CAST(CAST(FLOOR({col}) AS BIGINT) AS VARCHAR), 1, 1)"
        " AS ds\n"
        f" FROM {table} WHERE {col} >= 1\n"
        "), c AS (\n"
        " SELECT CAST(ds AS BIGINT) AS digit, COUNT(*) AS cnt"
        " FROM raw GROUP BY 1\n"
        f"), pm(digit, pm) AS (VALUES {pm_rows}),\n"
        "t AS (SELECT SUM(cnt) AS total FROM c),\n"
        "j AS (\n"
        " SELECT p.digit, COALESCE(c.cnt, 0) AS n, p.pm, t.total\n"
        " FROM pm p LEFT JOIN c ON p.digit = c.digit CROSS JOIN t\n"
        "), k AS (\n"
        " SELECT digit, n, pm, total,\n"
        "  CAST(n * 1000000 - total * pm AS DOUBLE) AS a\n"
        " FROM j\n"
        ")\n"
        "SELECT CAST(digit AS BIGINT) AS digit, CAST(n AS BIGINT) AS n,\n"
        " CAST(pm AS BIGINT) AS expected_millionths,\n"
        " CAST(FLOOR(a * a / (CAST(total AS DOUBLE) * CAST(pm AS DOUBLE)"
        " * 1000000.0) * 1000000000.0 + 0.5) AS BIGINT) AS chi2_nano\n"
        "FROM k"
    )


def diurnal_trend_by_type(events):
    """Per-event-type OLS of value-in-cents against hour-of-day
    (0..23): slope + intercept from exact int64 moment partials (n, Σx,
    Σy, Σxy, Σx²), one <= K-row keyed merge, and a final float
    expression shared term-for-term with the SQL oracle (the corr_matrix
    contract — never a float accumulation whose order could differ).

    Output: (event_type, n, slope, intercept); slope/intercept are 0
    for a degenerate (constant-x) group."""
    from ray.data.aggregate import Sum

    from ocr_ray.driver import _cents

    part_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("n", pa.int64()),
            ("sx", pa.int64()),
            ("sy", pa.int64()),
            ("sxy", pa.int64()),
            ("sxx", pa.int64()),
        ]
    )

    def moments(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return part_schema.empty_table()
        ts = t["ts"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        secs = pc.cast(ts, pa.int64()).to_numpy(
            zero_copy_only=False
        ) // 1_000_000
        x = (secs // 3600) % 24
        y = _cents(t["value"]).to_numpy(zero_copy_only=False)
        t2 = pa.table(
            {
                "event_type": t["event_type"],
                "n": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                "sx": pa.array(x, pa.int64()),
                "sy": pa.array(y, pa.int64()),
                "sxy": pa.array(x * y, pa.int64()),
                "sxx": pa.array(x * x, pa.int64()),
            }
        )
        g = t2.group_by("event_type").aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                **{
                    c: pc.cast(g[c + "_sum"], pa.int64())
                    for c in ("n", "sx", "sy", "sxy", "sxx")
                },
            }
        )

    merged = (
        events.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            *[
                Sum(c, alias_name=c)
                for c in ("n", "sx", "sy", "sxy", "sxx")
            ]
        )
    )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("n", pa.int64()),
            ("slope", pa.float64()),
            ("intercept", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        fn = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        fsx = t["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        fsy = t["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        fsxy = t["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        fsxx = t["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        den = fn * fsxx - fsx * fsx
        slope = np.where(den != 0.0, (fn * fsxy - fsx * fsy) / den, 0.0)
        intercept = np.where(
            fn != 0.0, (fsy - slope * fsx) / fn, 0.0
        )
        return pa.table(
            {
                "event_type": t["event_type"],
                "n": t["n"],
                "slope": pa.array(slope, pa.float64()),
                "intercept": pa.array(intercept, pa.float64()),
            }
        )

    return merged.map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def diurnal_trend_by_type_sql() -> str:
    return (
        "WITH m AS (\n"
        " SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,\n"
        "  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,\n"
        "  CAST(SUM(x * y) AS BIGINT) AS sxy,"
        " CAST(SUM(x * x) AS BIGINT) AS sxx\n"
        " FROM (SELECT event_type,\n"
        "   (epoch_us(ts) // 1000000 // 3600) % 24 AS x,\n"
        "   CAST(ROUND(value * 100.0) AS BIGINT) AS y\n"
        "  FROM events)\n"
        " GROUP BY event_type\n"
        "), d AS (\n"
        " SELECT event_type, n, CAST(n AS DOUBLE) AS fn,"
        " CAST(sx AS DOUBLE) AS fsx, CAST(sy AS DOUBLE) AS fsy,"
        " CAST(sxy AS DOUBLE) AS fsxy, CAST(sxx AS DOUBLE) AS fsxx\n"
        " FROM m\n"
        "), s AS (\n"
        " SELECT event_type, n, fn, fsx, fsy,\n"
        "  CASE WHEN fn * fsxx - fsx * fsx <> 0.0\n"
        "   THEN (fn * fsxy - fsx * fsy) / (fn * fsxx - fsx * fsx)\n"
        "   ELSE 0.0 END AS slope\n"
        " FROM d\n"
        ")\n"
        "SELECT event_type, n, slope,\n"
        " CASE WHEN fn <> 0.0 THEN (fsy - slope * fsx) / fn"
        " ELSE 0.0 END AS intercept\n"
        "FROM s"
    )
