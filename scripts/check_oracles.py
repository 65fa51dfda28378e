"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side at a given sf and compare
row-count, schema and an order-insensitive value hash.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""
from __future__ import annotations

import hashlib
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, dict):
        return pd.DataFrame([result])
    return result.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        df.astype(str).itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for row in rows:
        h.update("|".join(row).encode())
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    # oracles that read the synthetic interleaved corpus resolve its
    # path from this (the graft driver always runs at sf0.01, the default)
    os.environ["OCR_ORACLE_SF_DIR"] = sf_dir

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import time

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    n_ok = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}", flush=True)
            continue
        sql = oracles.get(name)
        if sql is None:
            n_rows_only += 1
            print(f"rows  {name}: {len(mine)} rows (no oracle) [{time.perf_counter()-t0:.1f}s]", flush=True)
            continue
        try:
            ref = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}", flush=True)
            continue
        problems = []
        if len(mine) != len(ref):
            problems.append(f"rows {len(mine)} != {len(ref)}")
        if sorted(mine.columns) != sorted(ref.columns):
            problems.append(f"cols {sorted(mine.columns)} != {sorted(ref.columns)}")
        else:
            mt = {c: str(mine[c].dtype) for c in sorted(mine.columns)}
            rt = {c: str(ref[c].dtype) for c in sorted(ref.columns)}
            if mt != rt:
                problems.append(f"dtypes {mt} != {rt}")
            if value_hash(mine) != value_hash(ref):
                problems.append("value-hash mismatch")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}", flush=True)
            if "value-hash mismatch" in problems:
                merged = mine.merge(
                    ref, how="outer", on=sorted(set(mine.columns) & set(ref.columns)),
                    indicator=True,
                )
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(6).to_string())
        else:
            n_ok += 1
            print(f"ok    {name}: {len(mine)} rows [{time.perf_counter()-t0:.1f}s]", flush=True)
    ray.shutdown()
    if not only:
        # full sweep: persist the one-line summary so bench.py can embed
        # it in the drive-visible artifact (VERDICT r04 #8)
        import datetime
        import json as _json
        import subprocess as _sp

        try:
            rev = _sp.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True,
                cwd=pathlib.Path(__file__).resolve().parent.parent,
            ).stdout.strip()
        except OSError:
            rev = ""
        pathlib.Path(
            pathlib.Path(__file__).resolve().parent.parent / "SWEEP_LATEST.json"
        ).write_text(
            _json.dumps(
                {
                    "ok": n_ok,
                    "rows_only": n_rows_only,
                    "fail": len(failures),
                    "failing": failures,
                    "n_queries": n_ok + n_rows_only + len(failures),
                    "sf_dir": sf_dir,
                    "git_rev": rev,
                    "utc": datetime.datetime.utcnow().isoformat(
                        timespec="seconds"
                    ),
                }
            )
            + "\n"
        )
    if failures:
        sys.exit(f"{len(failures)} failing: {failures}")
    print("all oracles consistent")


if __name__ == "__main__":
    main()
