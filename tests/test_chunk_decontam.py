"""Sliding-window chunking (ops/chunk.py) and benchmark
decontamination (ops/decontam.py)."""
from __future__ import annotations

import pyarrow as pa
import pytest

from ocr_ray.ops.chunk import chunk_documents
from ocr_ray.ops.decontam import (
    benchmark_shingle_set,
    contamination_counts,
    decontaminate_report,
)


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_chunk_windows_and_stride(ray_session):
    text = " ".join(f"t{i}" for i in range(5))  # 5 tokens
    out = sorted(
        chunk_documents(_ds([(1, text), (2, ""), (3, None)]),
                        chunk_tokens=4, stride=2).take_all(),
        key=lambda r: r["chunk_idx"],
    )
    # starts 0, 2, 4 -> windows of 4, 3, 1 tokens; empty/null docs: none
    assert [r["doc_id"] for r in out] == [1, 1, 1]
    assert [r["chunk_idx"] for r in out] == [0, 1, 2]
    assert [r["n_tokens"] for r in out] == [4, 3, 1]
    assert out[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out[1]["chunk_text"] == "t2 t3 t4"
    assert out[2]["chunk_text"] == "t4"


def test_chunk_exact_multiple(ray_session):
    # 64 tokens with defaults: starts 0 and 32 (start == n is excluded)
    text = " ".join(f"w{i}" for i in range(64))
    out = chunk_documents(_ds([(1, text)])).take_all()
    assert sorted(r["chunk_idx"] for r in out) == [0, 1]
    assert sorted(r["n_tokens"] for r in out) == [32, 64]


def test_chunk_rejects_bad_params(ray_session):
    with pytest.raises(ValueError):
        chunk_documents(_ds([(1, "a")]), stride=0)


BENCH = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def test_decontamination_hits(ray_session):
    corpus = [
        (0, BENCH),                                    # the benchmark doc itself
        (1, "intro words then " + BENCH + " trailing"),  # contains all bench 8-grams
        (2, "alpha beta gamma delta nothing matches here at all okay"),
        (3, "too short"),                              # < 8 tokens -> 0/0
    ]
    bench_set = benchmark_shingle_set(_ds([corpus[0]]), k=8)
    # 10 tokens -> 3 distinct 8-gram shingles
    assert len(bench_set) == 3
    out = {
        r["doc_id"]: r
        for r in contamination_counts(_ds(corpus), bench_set, k=8).take_all()
    }
    assert out[0]["n_contaminated"] == out[0]["n_shingles"] == 3
    assert out[1]["n_contaminated"] == 3  # fully contains the bench text
    assert out[1]["n_shingles"] > 3
    assert out[2]["n_contaminated"] == 0 and out[2]["n_shingles"] == 3
    assert out[3]["n_shingles"] == 0 and out[3]["n_contaminated"] == 0


def test_decontaminate_report_case_insensitive(ray_session):
    corpus = [(0, BENCH.upper()), (1, BENCH)]
    out = {
        r["doc_id"]: r
        for r in decontaminate_report(
            _ds(corpus), _ds([corpus[0]]), k=8
        ).take_all()
    }
    # shingling lowercases, so the upper/lower pair coincide exactly
    assert out[1]["n_contaminated"] == 3


def test_dup_ngram_coverage(ray_session):
    import ray.data as rd

    from ocr_ray.ops.decontam import dup_ngram_coverage

    shared = "one two three four five six seven eight"  # exactly 8 tokens
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        f"{shared} tail alpha",
                        f"head {shared} tail beta",
                        "completely different words nine ten eleven twelve "
                        "thirteen fourteen fifteen",
                        "short doc",  # < 8 tokens: zero shingles
                    ]
                ),
            }
        )
    )
    rows = {r["doc_id"]: r for r in dup_ngram_coverage(docs, k=8).take_all()}
    assert len(rows) == 4
    # doc 1: 3 shingles; "one…eight" AND "two…eight tail" occur in doc 2
    assert rows[1]["n_shingles"] == 3 and rows[1]["n_dup_shingles"] == 2
    assert rows[1]["dup_shingle_frac"] == 2 / 3
    # doc 2: 4 shingles, the same two shared
    assert rows[2]["n_shingles"] == 4 and rows[2]["n_dup_shingles"] == 2
    # doc 3: 10 tokens → 3 shingles, all unique
    assert rows[3]["n_shingles"] == 3 and rows[3]["n_dup_shingles"] == 0
    assert rows[3]["dup_shingle_frac"] == 0.0
    # doc 4: too short — zero shingles survives via the spine join
    assert rows[4]["n_shingles"] == 0 and rows[4]["dup_shingle_frac"] == 0.0


def test_pack_sequences_hand_case(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.ops.chunk import pack_sequences

    # token counts in doc_id order: 3, 0, 5, 4  (seq_len=4)
    # prefix:                       0, -, 3, 8
    docs = pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
            "text": pa.array(
                ["a b c", "   ", "d e f g h", "i j k l"], pa.string()
            ),
        }
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(
            rd.from_arrow(docs), seq_len=4, bucket_width=2
        ).take_all()
    }
    assert 11 not in out  # zero-token doc occupies no sequence
    assert (out[10]["seq_first"], out[10]["seq_last"]) == (0, 0)
    # doc 12 spans tokens 3..7 -> sequences 0 and 1 (crosses a cut)
    assert (out[12]["seq_first"], out[12]["seq_last"]) == (0, 1)
    # doc 13 spans tokens 8..11 -> exactly sequence 2; also exercises a
    # bucket (13//2=6) whose offset comes from three earlier buckets
    assert (out[13]["seq_first"], out[13]["seq_last"]) == (2, 2)
    assert out[13]["n_tokens"] == 4
