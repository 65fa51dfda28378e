"""VERDICT r04 #2 probe: with the runner's launches fused (8 per cold
run), the staged curation job at >= 200k docs should be COMPUTE-bound —
the high-CPU leg must beat the low-CPU leg by a real margin (the target
ratio is >= 1.5x where round 4 measured 0.94x, i.e. launch-bound).

Corpus: the sf0.1 documents table tiled under shifted doc_ids to the
requested size (default 200k docs, 25% planted exact duplicates so the
dedup stages carry weight), 32 input files. Each leg runs the FULL
checkpoint runner cold in a fresh taskset-pinned process.

Usage: python scripts/bench_curation_probe.py [n_docs] [lo] [hi]
Prints one JSON line; the record lives in BASELINE.md.
"""
from __future__ import annotations

import json
import os
import pathlib
import shutil
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 8
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 32
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 32

CORPUS = pathlib.Path(f"/tmp/ocr_ray_cache/curation-probe-{N_DOCS}")

_CHILD = r"""
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus={ncpu}, include_dashboard=False,
         logging_level="ERROR")
from ocr_ray.context import configure
configure()
from ocr_ray.pipelines.curation import (CurationConfig,
                                        run_curation_checkpointed)
out = tempfile.mkdtemp(prefix="curation-probe-")
t0 = time.perf_counter()
m = run_curation_checkpointed({corpus!r}, out, CurationConfig())
print("CHILD " + json.dumps({{"wall": round(time.perf_counter() - t0, 2),
                              "funnel": m["funnel"],
                              "walls": m["walls_sec"]}}))
ray.shutdown()
import shutil as sh
sh.rmtree(out, ignore_errors=True)
"""


def build_corpus() -> None:
    if CORPUS.exists():
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    nb = base.num_rows
    tiles = []
    made = 0
    k = 0
    while made < N_DOCS:
        n = min(nb, N_DOCS - made)
        t = base.slice(0, n)
        if k % 4 == 3:
            # every 4th tile repeats tile 0's text under fresh ids:
            # planted exact duplicates so the dedup stages carry weight
            ids = pa.compute.add(t.column("doc_id"), (k + 1) * 1_000_000)
            tiles.append(pa.table({"doc_id": ids, "text": t.column("text")}))
        else:
            import hashlib

            salted = [
                (tx or "") + f" tile{k} " + hashlib.md5(
                    f"{k}|{i}".encode()
                ).hexdigest()[:8]
                for i, tx in enumerate(t.column("text").to_pylist())
            ]
            ids = pa.compute.add(t.column("doc_id"), (k + 1) * 1_000_000)
            tiles.append(
                pa.table(
                    {
                        "doc_id": ids,
                        "text": pa.array(salted, pa.string()),
                    }
                )
            )
        made += n
        k += 1
    full = pa.concat_tables(tiles)
    tmp = CORPUS.parent / (CORPUS.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    rows = full.num_rows
    for i in range(N_FILES):
        lo = i * rows // N_FILES
        pq.write_table(
            full.slice(lo, (i + 1) * rows // N_FILES - lo),
            tmp / f"part-{i:02d}.parquet",
        )
    os.replace(tmp, CORPUS)


def run_point(ncpu: int) -> dict:
    code = _CHILD.format(
        repo=str(pathlib.Path(__file__).resolve().parent.parent),
        ncpu=ncpu,
        corpus=str(CORPUS),
    )
    cmd = [sys.executable, "-c", code]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True
    ).stdout
    line = [l for l in out.splitlines() if l.startswith("CHILD ")][-1]
    return json.loads(line[len("CHILD "):])


def main() -> None:
    build_corpus()
    load0 = os.getloadavg()[0]
    hi = run_point(HI)
    lo = run_point(LO)
    print(json.dumps({
        "n_docs": N_DOCS,
        "lo_cpus": LO, "hi_cpus": HI,
        "lo_wall": lo["wall"], "hi_wall": hi["wall"],
        "hi_over_lo_speedup": round(lo["wall"] / hi["wall"], 3),
        "lo_walls": lo["walls"], "hi_walls": hi["walls"],
        "funnel": hi["funnel"],
        "load1_at_start": round(load0, 1),
        "protocol": "full checkpoint runner cold per leg, fresh "
        "taskset-pinned processes, 32-file corpus",
    }))


if __name__ == "__main__":
    main()
