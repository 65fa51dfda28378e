"""Kill-and-resume exercise for the curation DAG at bench scale: run
the staged checkpoint runner over an 80k-doc duplicate-heavy corpus in
a subprocess, SIGKILL it mid-run (a REAL kill — no cooperative stop
hook), then resume to completion and report how much work the resume
repeated.

Corpus: the sf0.1 documents table tiled 16× under shifted doc_ids
(80,000 docs, 15/16 exact duplicates — the exact-dedup stage carries
real weight), 16 input partitions.

Usage: python scripts/bench_curation_resume.py [kill_after_sec] [ncpu]
Prints one JSON line; the record lives in BASELINE.md.
"""
from __future__ import annotations

import json
import os
import pathlib
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

KILL_AFTER = float(sys.argv[1]) if len(sys.argv) > 1 else 25.0
NCPU = int(sys.argv[2]) if len(sys.argv) > 2 else 32
TILES = 16
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

CORPUS = pathlib.Path("/tmp/ocr_ray_cache") / f"curation-resume-{TILES}x"
OUT = pathlib.Path("/tmp/curation_resume_bench")

_CHILD = r"""
import sys, json
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus={ncpu}, include_dashboard=False,
         logging_level="ERROR")
from ocr_ray.context import configure
configure()
from ocr_ray.pipelines.curation import (CurationConfig,
                                        run_curation_checkpointed)
m = run_curation_checkpointed({corpus!r}, {out!r},
    CurationConfig(partitions_per_launch=4))
print("METRICS " + json.dumps(m))
ray.shutdown()
"""


def build_corpus() -> None:
    if CORPUS.exists():
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    tmp = CORPUS.with_suffix(".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    for k in range(TILES):
        t = pa.table(
            {
                "doc_id": pa.compute.add(
                    base.column("doc_id"), k * 1_000_000
                ),
                "text": base.column("text"),
            }
        )
        pq.write_table(t, tmp / f"part-{k:02d}.parquet")
    os.replace(tmp, CORPUS)


def run_child() -> tuple[subprocess.Popen, float]:
    code = _CHILD.format(
        repo=str(pathlib.Path(__file__).resolve().parent.parent),
        ncpu=NCPU,
        corpus=str(CORPUS),
        out=str(OUT),
    )
    t0 = time.perf_counter()
    return (
        subprocess.Popen(
            [sys.executable, "-c", code],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        ),
        t0,
    )


def main() -> None:
    build_corpus()
    if OUT.exists():
        shutil.rmtree(OUT)

    # phase 1: start cold, SIGKILL mid-run (kills the whole Ray tree)
    child, t0 = run_child()
    time.sleep(KILL_AFTER)
    killed_alive = child.poll() is None
    os.kill(child.pid, signal.SIGKILL)
    child.wait()
    # committed partitions at kill time
    committed = len(list((OUT / "_manifests").glob("score-part=*.json"))) \
        if (OUT / "_manifests").exists() else 0
    subprocess.run(
        ["pkill", "-9", "-f", "rayle[t]|gcs_serve[r]|default_worke[r]"],
        check=False,
    )
    time.sleep(2)

    # phase 2: resume to completion in a fresh process
    child2, t1 = run_child()
    out, _ = child2.communicate()
    wall_resume = time.perf_counter() - t1
    metrics = json.loads(
        [ln for ln in out.splitlines() if ln.startswith("METRICS ")][-1][8:]
    )

    print(
        json.dumps(
            {
                "metric": "curation_kill_resume",
                "n_docs": metrics["funnel"]["n_raw"],
                "kill_after_sec": KILL_AFTER,
                "killed_while_running": killed_alive,
                "partitions_committed_at_kill": committed,
                "resume_wall_sec": round(wall_resume, 3),
                "partitions_skipped_on_resume":
                    metrics["partitions_skipped"],
                "partitions_run_on_resume": metrics["partitions_run"],
                "funnel": metrics["funnel"],
                "num_cpus": NCPU,
                "protocol": f"SIGKILL at t={KILL_AFTER}s, fresh process "
                "resume, 16-tile dup-heavy corpus",
            }
        )
    )


if __name__ == "__main__":
    main()
