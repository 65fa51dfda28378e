"""Incremental near-dup admission gate (LSH bands vs a known corpus)."""
from __future__ import annotations

import pyarrow as pa


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


def test_minhash_incremental_admits_novel_rejects_duplicate(ray_session):
    from ocr_ray.ops.dedup import dedup_minhash_incremental

    base = " ".join(f"token{i} filler{i} common{i}" for i in range(14))
    near = base.replace("filler7", "changed7")  # 42 words, 3 shingles churn
    known = _ds(
        [
            (1, base),
            (2, "pack my box with five dozen liquor jugs right now"),
        ]
    )
    new = _ds(
        [
            # verbatim copy of known doc 1 → every band collides → reject
            (100, base),
            # disjoint vocabulary → no shingle overlap → admit
            (101, "completely different sentences about distributed "
                  "arrow batches and shuffle partitions everywhere"),
            # near-copy: one word changed in a 42-word doc (Jaccard
            # ≈ 0.86) → some band still collides → reject
            (102, near),
        ]
    )
    got = sorted(
        r["doc_id"]
        for r in dedup_minhash_incremental(new, known).take_all()
    )
    assert got == [101]


def test_minhash_incremental_join_plan_matches_broadcast(ray_session):
    """Force the hash-join plan (broadcast_threshold=0) on a corpus big
    enough to populate every join partition; both plans must admit the
    same set."""
    import numpy as np

    from ocr_ray.ops.dedup import dedup_minhash_incremental

    rng = np.random.default_rng(11)
    vocab = [f"word{i}" for i in range(400)]

    def text(seed):
        r = np.random.default_rng(seed)
        return " ".join(vocab[i] for i in r.integers(0, 400, 30))

    known = _ds([(i, text(i)) for i in range(150)])
    # half the new shard are verbatim copies of known docs, half fresh
    new_rows = [(1000 + i, text(i)) for i in range(75)] + [
        (2000 + i, text(10_000 + i)) for i in range(75)
    ]
    new = _ds(new_rows)

    via_bcast = sorted(
        r["doc_id"]
        for r in dedup_minhash_incremental(new, known).take_all()
    )
    via_join = sorted(
        r["doc_id"]
        for r in dedup_minhash_incremental(
            new, known, broadcast_threshold=0
        ).take_all()
    )
    assert via_bcast == via_join
    copies = {1000 + i for i in range(75)}
    assert not copies & set(via_bcast)  # every copy rejected
    assert len(via_bcast) >= 70  # nearly all fresh docs admitted


def test_minhash_incremental_empty_known_admits_all(ray_session):
    from ocr_ray.ops.dedup import dedup_minhash_incremental

    known = _ds([])
    new = _ds([(7, "some words that form shingles here today")])
    got = [r["doc_id"] for r in dedup_minhash_incremental(new, known).take_all()]
    assert got == [7]
