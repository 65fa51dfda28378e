"""corpus_diff vs a hand-built snapshot pair, and snapshot_v2 rules."""
from __future__ import annotations

import pyarrow as pa


def _docs(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in rows], pa.int64()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        )
    )


def test_corpus_diff_classification(ray_session):
    from ocr_ray.ops.cdc import corpus_diff

    a = _docs([(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "Delta  x")])
    b = _docs(
        [
            (1, "alpha"),          # unchanged → no row
            (2, "beta prime"),     # changed
            (4, "delta x"),        # normalization-equal → unchanged
            (9, "new doc"),        # added
        ]                           # 3 removed
    )
    out = corpus_diff(a, b).to_pandas()
    got = sorted(zip(out["doc_id"], out["status"]))
    assert got == [(2, "changed"), (3, "removed"), (9, "added")]


def test_snapshot_v2_rules(ray_session):
    from ocr_ray.ops.cdc import snapshot_v2

    rows = [(17, "a"), (23, "b"), (29, "c"), (30, "d"), (0, "z")]
    out = snapshot_v2(_docs(rows)).to_pandas()
    got = dict(zip(out["doc_id"], out["text"]))
    # 23 removed; 0 removed (0 % 23 == 0); 17 changed; 29 cloned
    assert got == {
        17: "a rev2",
        29: "c",
        1_000_029: "c clone",
        30: "d",
    }


def test_corpus_diff_empty_b(ray_session):
    from ocr_ray.ops.cdc import corpus_diff

    a = _docs([(1, "x")])
    b = _docs([])  # empty dataset, same schema
    out = corpus_diff(a, b).to_pandas()
    assert sorted(zip(out["doc_id"], out["status"])) == [(1, "removed")]
