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


def test_snm_quality_half_duplicate_skew_corpus(ray_session):
    """The r03 VERDICT scale-killer scenario: one exact-dup cluster
    holding 50% of the corpus. The rewritten report never materializes
    cluster rows or pair sets on the driver — n_true comes from the
    keyed C(n,2) aggregate, n_found from slim fp-equality joins — so
    this passes in test budget where the old O(cluster^2) fold would
    have built 31k pairs in Python (and billions at web scale)."""
    import ray.data as rd

    from ocr_ray.ops.dedup import snm_quality_report

    n_dup, n_uniq = 250, 250
    texts = ["shared duplicate body text"] * n_dup + [
        f"unique document {i} content" for i in range(n_uniq)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(n_dup + n_uniq), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = (
        snm_quality_report(rd.from_arrow(t).repartition(4), window=3)
        .to_pylist()[0]
    )
    assert got["n_true_pairs"] == n_dup * (n_dup - 1) // 2  # 31125
    # identical keys sort adjacent: window=3 finds exactly the pairs
    # within 3 ranks inside the cluster = 3n - 6 of them
    assert got["n_found"] == 3 * n_dup - 6
    assert got["recall_ppm"] == (
        (3 * n_dup - 6) * 1_000_000 // (n_dup * (n_dup - 1) // 2)
    )
