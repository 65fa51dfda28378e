"""CLI surface: synth, query (registry listing, parquet output, print),
extract — all in-process against the shared Ray session (the CLI must
not tear down a session it didn't start)."""
from __future__ import annotations

import json

import pyarrow.parquet as pq
import ray

from ocr_ray.__main__ import main


def test_query_list(capsys):
    assert main(["query", "--list"]) == 0
    names = json.loads(capsys.readouterr().out)["queries"]
    assert "dedup_exact" in names and "extract_documents" in names


def test_query_unknown(capsys):
    assert main(["query", "--name", "nope"]) == 2


def test_query_to_parquet_and_session_preserved(ray_session, tmp_path, capsys):
    out = tmp_path / "res"
    rc = main(
        ["query", "--name", "doc_stats_by_lang",
         "--sf-dir", "/root/testdata/sf0.001", "--output", str(out)]
    )
    assert rc == 0
    rows = sum(
        pq.ParquetFile(f).metadata.num_rows for f in out.glob("**/*.parquet")
    )
    assert rows >= 1
    # the CLI attached to the fixture's session and must NOT kill it
    assert ray.is_initialized()


def test_query_print(ray_session, capsys):
    rc = main(
        ["query", "--name", "top_docs_by_chars",
         "--sf-dir", "/root/testdata/sf0.001", "--limit", "5"]
    )
    assert rc == 0
    assert "doc_id" in capsys.readouterr().out
    assert ray.is_initialized()


def test_synth_cli(tmp_path, capsys):
    rc = main(["synth", "--n-docs", "12", "--out", str(tmp_path / "corpus")])
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["n_docs"] == 12


def test_curate_cli(ray_session, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = tmp_path / "docs"
    corpus.mkdir()
    stops = "the and with this that "
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(30), pa.int64()),
                "text": pa.array(
                    [stops * 5 + f"doc{i} " + " ".join(
                        f"w{i}x{j}" for j in range(20)
                    ) for i in range(30)]
                ),
            }
        ),
        corpus / "part-0.parquet",
    )
    out = tmp_path / "curated"
    rc = main(["curate", "--input", str(corpus), "--output", str(out)])
    assert rc == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["aborted_at"] is None
    assert m["funnel"]["n_raw"] == 30
    assert (out / "metrics.json").exists()
    # resume through the CLI: nothing re-runs
    rc = main(["curate", "--input", str(corpus), "--output", str(out)])
    assert rc == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2["partitions_run"] == {"score": 0, "text": 0}
    assert ray.is_initialized()
