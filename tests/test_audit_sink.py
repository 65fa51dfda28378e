"""Append-only audit sink: immutable segments, atomic commit, rollups
over the sink's own output (S7, reference audit_logger.py:60-84)."""
from __future__ import annotations

import pathlib

import pyarrow as pa
import pytest

from ocr_ray.stages import audit


def _events(n, etype, start=0):
    return pa.table(
        {
            "event_id": pa.array(range(start, start + n), pa.int64()),
            "event_type": pa.array([etype] * n, pa.string()),
            "value": pa.array([float(i) for i in range(n)], pa.float64()),
        }
    )


def test_append_read_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "audit")
    r1 = audit.append_events(_events(10, "login"), out, source="svc-a")
    r2 = audit.append_events(_events(5, "export", start=10), out, source="svc-b")
    assert (r1["segment"], r2["segment"]) == (1, 2)

    df = audit.read_events(out).to_pandas()
    assert len(df) == 15
    assert df["event_type"].value_counts().to_dict() == {"login": 10, "export": 5}

    stats = audit.sink_stats(out)
    assert stats == {"segments": 2, "n_rows": 15, "sources": ["svc-a", "svc-b"]}


def test_segments_are_immutable(ray_session, tmp_path):
    out = str(tmp_path / "audit")
    audit.append_events(_events(3, "a"), out)
    seg1 = pathlib.Path(out) / "seg=00000001"
    before = {p.name: p.stat().st_mtime_ns for p in seg1.rglob("*.parquet")}
    audit.append_events(_events(4, "b"), out)
    after = {p.name: p.stat().st_mtime_ns for p in seg1.rglob("*.parquet")}
    assert before == after  # first segment untouched by later appends


def test_uncommitted_segment_invisible(ray_session, tmp_path):
    out = str(tmp_path / "audit")
    audit.append_events(_events(3, "a"), out)
    # simulate a crash AFTER rename but BEFORE manifest commit
    stale = pathlib.Path(out) / "seg=00000002"
    stale.mkdir()
    (stale / "part-0.parquet").write_bytes(b"garbage")
    assert len(audit.read_events(out).to_pandas()) == 3
    # the next append reclaims the orphan sequence number cleanly
    audit.append_events(_events(2, "c"), out)
    assert audit.sink_stats(out)["n_rows"] == 5


def test_dataset_input_and_rollup_on_own_output(ray_session, tmp_path):
    import ray.data as rd
    from ray.data.aggregate import Count

    out = str(tmp_path / "audit")
    audit.append_events(rd.from_arrow(_events(20, "click")), out)
    audit.append_events(rd.from_arrow(_events(10, "view", start=20)), out)
    # the events_by_type-style rollup runs unchanged on the sink output
    counts = {
        r["event_type"]: r["count()"]
        for r in audit.read_events(out)
        .groupby("event_type")
        .aggregate(Count())
        .take_all()
    }
    assert counts == {"click": 20, "view": 10}


def test_read_empty_sink_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        audit.read_events(str(tmp_path / "nothing"))
