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
