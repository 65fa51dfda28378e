"""VERDICT r04 #6: push the scaling evidence past the 100k-doc stress
point — ONE 1M-doc extraction run (10x the prior stress corpus) with
object-store spill stats, plus the low/high-CPU raw ratio at that size.

The corpus is built once as 10 x 100k-doc chunks (distinct synth seeds,
so doc_ids never collide) under /tmp/ocr_ray_cache/interleaved-1m; each
measurement runs in a fresh taskset-pinned process so the OS CPU set
matches the simulated cluster size (same protocol as bench.py).

Usage: python scripts/bench_scale1m.py [n_docs] [lo_cpus] [hi_cpus]
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

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 4
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 16
CHUNK = 100_000

CORPUS = pathlib.Path(f"/tmp/ocr_ray_cache/interleaved-1m-{N_DOCS}")

_CHILD = r"""
import json, pathlib, time, re, sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus={ncpu}, include_dashboard=False,
         logging_level="ERROR")
from ocr_ray.context import configure
configure()
from ocr_ray import io as oio
from ocr_ray.pipelines.extract import ExtractConfig, extract_documents
t0 = time.perf_counter()
n = extract_documents(
    oio.read_interleaved({corpus!r}), ExtractConfig()
).count()
wall = time.perf_counter() - t0
spilled_mb = 0.0
restored_mb = 0.0
try:
    from ray._private.internal_api import memory_summary
    s = memory_summary(stats_only=True)
    m = re.search(r"Spilled (\d+) MiB", s)
    if m:
        spilled_mb = float(m.group(1))
    m = re.search(r"Restored (\d+) MiB", s)
    if m:
        restored_mb = float(m.group(1))
except Exception:
    pass
print("CHILD " + json.dumps({{
    "n": n, "wall": round(wall, 2),
    "spilled_mb": spilled_mb, "restored_mb": restored_mb,
}}))
ray.shutdown()
"""


def build_corpus() -> None:
    if (CORPUS / "_SUCCESS").exists():
        return
    from ocr_ray import io as oio
    from ocr_ray import synth

    tmp = CORPUS.parent / (CORPUS.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    n_chunks = -(-N_DOCS // CHUNK)
    for c in range(n_chunks):
        n = min(CHUNK, N_DOCS - c * CHUNK)
        table = synth.generate_interleaved(n_docs=n, seed=100 + c)
        oio.write_interleaved(
            table, str(tmp / f"chunk={c:03d}"),
            max_rows_per_file=max(50, N_DOCS // 256),
        )
        print(f"chunk {c + 1}/{n_chunks} written ({n} docs)", flush=True)
    (tmp / "_SUCCESS").write_text("ok")
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
    if os.environ.get("SCALE1M_BUILD_ONLY"):
        print("corpus ready:", CORPUS)
        return

    load0 = os.getloadavg()[0]
    hi = run_point(HI)
    lo = run_point(LO)
    ratio = lo["wall"] / hi["wall"]
    eff = ratio / (HI / LO)
    print(json.dumps({
        "n_docs": N_DOCS,
        "lo_cpus": LO, "hi_cpus": HI,
        "lo": lo, "hi": hi,
        "docs_per_sec_hi": round(N_DOCS / hi["wall"], 1),
        "docs_per_sec_lo": round(N_DOCS / lo["wall"], 1),
        "raw_ratio": round(ratio, 3),
        "raw_efficiency": round(eff, 3),
        "load1_at_start": round(load0, 1),
        "protocol": "fresh taskset-pinned processes, cold per point, "
        "spill stats from ray memory_summary",
    }))


if __name__ == "__main__":
    main()
