"""Checkpoint/resume: partitioned output, manifest lineage, skip-on-rerun."""
from __future__ import annotations

import json
import pathlib

import pyarrow.parquet as pq

from ocr_ray import io, synth
from ocr_ray.stages.checkpoint import run_extract_checkpointed


def test_checkpoint_run_and_resume(ray_session, tmp_path):
    table = synth.generate_interleaved(n_docs=30, seed=5)
    inp = tmp_path / "input"
    io.write_interleaved(table, str(inp), max_rows_per_file=10)  # 3 files
    out = tmp_path / "out"

    metrics = run_extract_checkpointed(str(inp), str(out), files_per_partition=1)
    assert metrics["partitions"] == 3
    assert metrics["partitions_run"] == 3
    assert metrics["n_docs"] == 30
    assert metrics["docs_per_sec"] > 0

    # partitioned layout + manifests
    parts = sorted(p.name for p in out.glob("part=*"))
    assert parts == ["part=00000", "part=00001", "part=00002"]
    manifest = json.loads((out / "_manifest" / "part-00001.json").read_text())
    assert manifest["n_docs"] == 10 and len(manifest["files"]) == 1

    total_rows = sum(
        pq.ParquetFile(f).metadata.num_rows for f in out.glob("part=*/*.parquet")
    )
    assert total_rows == 30

    # simulate a failed partition: delete one manifest → only it reruns
    (out / "_manifest" / "part-00002.json").unlink()
    before = {f: f.stat().st_mtime for f in out.glob("part=00000/*.parquet")}
    metrics2 = run_extract_checkpointed(str(inp), str(out), files_per_partition=1)
    assert metrics2["partitions_run"] == 1
    assert metrics2["partitions_skipped"] == 2
    after = {f: f.stat().st_mtime for f in out.glob("part=00000/*.parquet")}
    assert before == after  # untouched partitions not rewritten
    assert metrics2["n_docs"] == 30


def test_repartitioned_rerun_invalidates_and_prunes(ray_session, tmp_path):
    """Changing --files-per-partition must NOT silently reuse stale
    partition outputs (the manifest file list no longer matches), and
    part dirs beyond the new layout are removed (ADVICE r01)."""
    table = synth.generate_interleaved(n_docs=30, seed=6)
    inp = tmp_path / "input"
    io.write_interleaved(table, str(inp), max_rows_per_file=10)  # 3 files
    out = tmp_path / "out"

    m1 = run_extract_checkpointed(str(inp), str(out), files_per_partition=1)
    assert m1["partitions"] == 3

    # coarser layout: 2 partitions (2 files + 1 file) — every manifest's
    # file list mismatches, so nothing is skipped, and part=00002 from
    # the finer run is an orphan
    m2 = run_extract_checkpointed(str(inp), str(out), files_per_partition=2)
    assert m2["partitions"] == 2
    assert m2["partitions_run"] == 2 and m2["partitions_skipped"] == 0
    assert m2["orphans_removed"] == 1
    assert sorted(p.name for p in out.glob("part=*")) == ["part=00000", "part=00001"]
    assert not (out / "_manifest" / "part-00002.json").exists()
    assert m2["n_docs"] == 30

    # identical rerun now skips everything
    m3 = run_extract_checkpointed(str(inp), str(out), files_per_partition=2)
    assert m3["partitions_run"] == 0 and m3["partitions_skipped"] == 2


def test_concurrent_partitions_same_output(ray_session, tmp_path):
    """max_concurrent=2 must produce byte-identical row content and the
    same manifests/metrics as the serial path (many-small-partition
    layouts overlap pipelines, commit protocol unchanged)."""
    from ocr_ray.pipelines.extract import ExtractConfig

    table = synth.generate_interleaved(n_docs=24, seed=9)
    inp = tmp_path / "input"
    io.write_interleaved(table, str(inp), max_rows_per_file=6)  # 4 files
    out_serial = tmp_path / "serial"
    out_conc = tmp_path / "conc"

    # one OCR actor per pipeline: two concurrent FIXED pools at the
    # default 0.75×CPU sizing would oversubscribe the 4-CPU test session
    # and starve the shuffle (the deadlock documented in context.py)
    cfg = ExtractConfig(ocr_concurrency=1)
    m1 = run_extract_checkpointed(
        str(inp), str(out_serial), config=cfg, files_per_partition=1
    )
    m2 = run_extract_checkpointed(
        str(inp), str(out_conc), config=cfg, files_per_partition=1,
        max_concurrent=2,
    )
    assert m1["partitions"] == m2["partitions"] == 4
    assert m2["partitions_run"] == 4
    assert m1["n_docs"] == m2["n_docs"] == 24
    assert m1["n_spans"] == m2["n_spans"]

    def doc_texts(root):
        rows = {}
        for f in root.glob("part=*/*.parquet"):
            t = pq.read_table(f, columns=["doc_id", "doc_text"])
            rows.update(zip(t.column("doc_id").to_pylist(),
                            t.column("doc_text").to_pylist()))
        return rows

    assert doc_texts(out_serial) == doc_texts(out_conc)


def test_concurrent_kill_and_resume_no_reprocessing(ray_session, tmp_path, monkeypatch):
    """Mid-run death with max_concurrent > 1 (VERDICT r02): a run that
    dies after committing some partitions must resume with ZERO
    re-processed partitions and identical output. The kill is injected
    by making the partition runner raise once a commit quota is hit —
    committed partitions have already done their atomic rename +
    manifest write, exactly the state a SIGKILL leaves behind."""
    import threading

    from ocr_ray.stages import checkpoint as cp

    table = synth.generate_interleaved(n_docs=120, seed=7)
    inp = tmp_path / "input"
    io.write_interleaved(table, str(inp), max_rows_per_file=15)  # 8 files
    out = tmp_path / "out"

    real_run = cp.run_partition
    lock = threading.Lock()
    done = {"n": 0}

    def dying_run(files, output_path, k, config):
        with lock:
            if done["n"] >= 3:
                raise RuntimeError("simulated mid-run death")
        result = real_run(files, output_path, k, config)
        with lock:
            done["n"] += 1
        return result

    monkeypatch.setattr(cp, "run_partition", dying_run)
    try:
        cp.run_extract_checkpointed(
            str(inp), str(out), files_per_partition=1, max_concurrent=3
        )
        raise AssertionError("expected the injected death to propagate")
    except RuntimeError:
        pass
    monkeypatch.setattr(cp, "run_partition", real_run)

    committed = sorted(out.glob("_manifest/part-*.json"))
    assert 1 <= len(committed) < 8, "death must land mid-run"
    before = {
        f: f.stat().st_mtime_ns
        for f in list(out.glob("part=*/*.parquet")) + committed
    }

    metrics = cp.run_extract_checkpointed(
        str(inp), str(out), files_per_partition=1, max_concurrent=3
    )
    assert metrics["partitions"] == 8
    assert metrics["partitions_skipped"] == len(committed)
    assert metrics["partitions_run"] == 8 - len(committed)
    assert metrics["n_docs"] == 120
    # zero re-processing: every pre-death output byte untouched
    after = {f: f.stat().st_mtime_ns for f in before}
    assert before == after

    total_rows = sum(
        pq.ParquetFile(f).metadata.num_rows for f in out.glob("part=*/*.parquet")
    )
    assert total_rows == 120
