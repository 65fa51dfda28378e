"""SNM blocking-quality report on a corpus with planted duplicates."""
from __future__ import annotations

import pyarrow as pa


def test_snm_quality_planted_dups(ray_session):
    import ray.data as rd

    from ocr_ray.ops.dedup import snm_quality_report

    # three dup clusters; near-identical prefixes land dups adjacent in
    # the SNM order so recall is high; plus unique filler docs
    texts = []
    ids = []
    did = 0
    for base in ["alpha document content", "beta payload text",
                 "gamma record body"]:
        for _ in range(3):  # cluster of 3 -> 3 true pairs each
            texts.append(base)
            ids.append(did)
            did += 1
    for i in range(20):
        texts.append(f"unique filler number {i} with words")
        ids.append(did)
        did += 1
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = (
        snm_quality_report(rd.from_arrow(t).repartition(3), window=3)
        .to_pylist()[0]
    )
    assert got["n_true_pairs"] == 9  # 3 clusters x C(3,2)
    # identical texts sort adjacent: every true pair within window=3
    assert got["n_found"] == 9
    assert got["recall_ppm"] == 1_000_000
    assert got["n_candidates"] >= 9
    assert (
        got["precision_ppm"]
        == (9 * 1_000_000) // got["n_candidates"]
    )


def test_snm_quality_no_dups(ray_session):
    import ray.data as rd

    from ocr_ray.ops.dedup import snm_quality_report

    t = pa.table(
        {
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "text": pa.array(
                [f"totally unique text {i}" for i in range(10)], pa.string()
            ),
        }
    )
    got = snm_quality_report(rd.from_arrow(t)).to_pylist()[0]
    assert got["n_true_pairs"] == 0
    assert got["n_found"] == 0
    assert got["recall_ppm"] == 0
