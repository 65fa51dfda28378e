"""VERDICT r04 #7: a SKEWED-corpus scaling point for the near-dup
stage. The band-skew histogram (minhash_band_skew) diagnoses hot LSH
buckets; this measures whether the skew guards (max_bucket caps,
grouped_map block-level pair generation) actually hold the scaling
ratio on a 50%-duplicate corpus — the worst realistic shape, where
half the corpus lands in the same band buckets.

Corpus: the sf0.1 documents table + an equal number of exact copies
under shifted doc_ids (50% dups), 16 files. Each leg runs
dedup_minhash_drop_list cold in a fresh taskset-pinned process at the
requested CPU count.

Usage: python scripts/bench_skew_scaling.py [lo] [hi] [rounds]
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

LO = int(sys.argv[1]) if len(sys.argv) > 1 else 4
HI = int(sys.argv[2]) if len(sys.argv) > 2 else 16
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
# tile the base table so the walls clear the fixed launch costs and
# the measurement reflects the shuffle/pair stages, not Ray boot
TILES = int(sys.argv[4]) if len(sys.argv) > 4 else 8
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

CORPUS = pathlib.Path(f"/tmp/ocr_ray_cache/skew-50dup-{TILES}x")

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus={ncpu}, include_dashboard=False,
         logging_level="ERROR")
from ocr_ray.context import configure
configure()
import ray.data as rd
from ocr_ray.ops.dedup import dedup_minhash_drop_list
docs = rd.read_parquet({corpus!r}, columns=["doc_id", "text"])
t0 = time.perf_counter()
n = dedup_minhash_drop_list(docs, threshold=0.5).count()
print("CHILD " + json.dumps({{"wall": round(time.perf_counter() - t0, 2),
                              "n_drops": n}}))
ray.shutdown()
"""


def build_corpus() -> None:
    if CORPUS.exists():
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    import hashlib

    base0 = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    tiles = []
    for k in range(TILES):
        if k == 0:
            tiles.append(base0)
            continue
        # distinct texts per tile (salted) so the dup rate stays 50%
        salted = [
            (t or "") + f" tile{k} " + hashlib.md5(
                f"{k}|{i}".encode()
            ).hexdigest()[:8]
            for i, t in enumerate(base0.column("text").to_pylist())
        ]
        tiles.append(
            pa.table(
                {
                    "doc_id": pa.compute.add(
                        base0.column("doc_id"), k * 1_000_000
                    ),
                    "text": pa.array(salted, pa.string()),
                }
            )
        )
    base = pa.concat_tables(tiles)
    dup = pa.table(
        {
            "doc_id": pa.compute.add(base.column("doc_id"), 100_000_000),
            "text": base.column("text"),
        }
    )
    full = pa.concat_tables([base, dup])
    tmp = CORPUS.parent / (CORPUS.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    rows = full.num_rows
    for i in range(16):
        lo = i * rows // 16
        pq.write_table(
            full.slice(lo, (i + 1) * rows // 16 - lo),
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
    # fixed interleaved rounds (the bench.py scaling protocol): no
    # early exit, so the target cannot shape the sampling
    his, los = [], []
    for _ in range(ROUNDS):
        his.append(run_point(HI))
        los.append(run_point(LO))
    hw = sorted(r["wall"] for r in his)[ROUNDS // 2]
    lw = sorted(r["wall"] for r in los)[ROUNDS // 2]
    eff = (lw / hw) / (HI / LO)
    print(json.dumps({
        "corpus": "sf0.1 documents + 100% exact copies (50% dups)",
        "n_drops": his[0]["n_drops"],
        "lo_cpus": LO, "hi_cpus": HI, "rounds": ROUNDS,
        "lo_walls": [r["wall"] for r in los],
        "hi_walls": [r["wall"] for r in his],
        "median_lo_wall": lw, "median_hi_wall": hw,
        "raw_efficiency": round(eff, 3),
        "load1_at_start": round(load0, 1),
        "protocol": "dedup_minhash_drop_list cold per leg, fresh "
        "taskset-pinned processes, median of fixed rounds",
    }))


if __name__ == "__main__":
    main()
