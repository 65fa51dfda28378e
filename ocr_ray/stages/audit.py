"""Append-only audit/event sink — the batch-engine rebuild of the
reference's audit logger (app/services/audit_logger.py:60-84, an
append-only event writer), S7 in SURVEY.md §2.1.

Layout under ``output_path``::

    seg=00000001/ *.parquet           one immutable segment per append
    _manifest/seg-00000001.json       {n_rows, schema names, source}

Each ``append_events`` call writes a NEW segment — existing segments are
never rewritten (append-only invariant). A segment is written to a temp
dir and atomically renamed, and its manifest row is written only after
the rename, so readers never observe a half-written segment and a killed
writer leaves at most an invisible temp dir. Sequence numbers come from
the manifest directory (max + 1): single-writer semantics, like the
reference's one service process; at engine scale one writer per
partition/stream keyes segments by its own prefix.

``read_events`` streams ALL committed segments back as one Dataset —
partition-pruned by Parquet, so per-type / per-day rollups
(ops.analysis / driver.events_by_type) run unchanged on the sink's own
output.
"""
from __future__ import annotations

import json
import os
import pathlib
import shutil

import pyarrow as pa
import pyarrow.parquet as pq


def _manifest_dir(out: pathlib.Path) -> pathlib.Path:
    return out / "_manifest"


def _segments(out: pathlib.Path) -> list[int]:
    mdir = _manifest_dir(out)
    if not mdir.exists():
        return []
    segs = []
    for f in mdir.glob("seg-*.json"):
        try:
            segs.append(int(f.stem.split("-")[1]))
        except (IndexError, ValueError):
            continue
    return sorted(segs)


def append_events(events, output_path: str, source: str = "") -> dict:
    """Append a batch of events (pyarrow Table or Ray Dataset) as a new
    immutable segment; returns the manifest row."""
    out = pathlib.Path(output_path)
    out.mkdir(parents=True, exist_ok=True)
    seq = (_segments(out)[-1] + 1) if _segments(out) else 1
    seg_dir = out / f"seg={seq:08d}"
    tmp_dir = out / "_tmp" / f"seg-{seq:08d}"
    if tmp_dir.exists():
        shutil.rmtree(tmp_dir)
    tmp_dir.mkdir(parents=True)

    if isinstance(events, pa.Table):
        pq.write_table(events, tmp_dir / "part-0.parquet")
        n_rows = events.num_rows
        names = events.schema.names
    else:  # Ray Dataset — distributed write, then count from footers
        events.write_parquet(str(tmp_dir))
        n_rows = 0
        names = []
        for f in tmp_dir.glob("*.parquet"):
            md = pq.ParquetFile(f)
            n_rows += md.metadata.num_rows
            names = md.schema_arrow.names

    if seg_dir.exists():  # stale dir without a manifest row: not committed
        shutil.rmtree(seg_dir)
    os.replace(tmp_dir, seg_dir)

    row = {"segment": seq, "n_rows": n_rows, "columns": names, "source": source}
    mdir = _manifest_dir(out)
    mdir.mkdir(parents=True, exist_ok=True)
    (mdir / f"seg-{seq:08d}.json").write_text(json.dumps(row))
    return row


def read_events(output_path: str):
    """Dataset over every COMMITTED segment (manifest row present)."""
    import ray.data as rd

    from ocr_ray.context import configure

    configure()
    out = pathlib.Path(output_path)
    files = [
        str(f)
        for s in _segments(out)
        for f in sorted((out / f"seg={s:08d}").glob("*.parquet"))
    ]
    if not files:
        raise FileNotFoundError(f"no committed segments under {output_path}")
    return rd.read_parquet(files)


def sink_stats(output_path: str) -> dict:
    """Whole-sink rollup from manifests alone (no data read)."""
    out = pathlib.Path(output_path)
    rows = [
        json.loads((_manifest_dir(out) / f"seg-{s:08d}.json").read_text())
        for s in _segments(out)
    ]
    return {
        "segments": len(rows),
        "n_rows": sum(r["n_rows"] for r in rows),
        "sources": sorted({r["source"] for r in rows if r.get("source")}),
    }
