"""Product quantization: codebook shape, ADC exactness on a planted
corpus, re-rank recall, and the violations gate."""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _clustered_embeddings(n=400, dim=64, n_clusters=5, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.normal(0, 1.0, (n_clusters, dim))
    rows = []
    for i in range(n):
        c = i % n_clusters
        rows.append(centers[c] + rng.normal(0, 0.05, dim))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": [list(map(float, r)) for r in rows],
            "label": pa.array(np.arange(n) % n_clusters, pa.int32()),
        }
    )


def test_pq_train_shapes(ray_session):
    import ray.data as rd

    from ocr_ray.ops.similarity import pq_train

    t = _clustered_embeddings()
    books, qds = pq_train(rd.from_arrow(t), m_sub=16, k=8)
    assert books.shape == (16, 8, 4)
    assert books.dtype == np.int64
    assert qds.count() == 400


def test_pq_adc_self_retrieval(ray_session):
    import ray.data as rd

    from ocr_ray.ops.similarity import pq_adc_topk

    t = _clustered_embeddings(n=200)
    q = np.stack(
        [np.asarray(v, np.float64) for v in t["embedding"].to_pylist()[:3]]
    )
    got = pq_adc_topk(rd.from_arrow(t), q, k=5, m_sub=16, n_codes=8)
    df = got.to_pandas()
    # on tightly clustered data each query's own cluster dominates: the
    # query vector itself must appear in its candidate list
    for qi in range(3):
        hits = set(df[df.query_id == qi].vec_id)
        assert qi in hits or len(hits & set(range(qi, 200, 5))) >= 3


def test_pq_rerank_beats_floor_and_gate_empty(ray_session):
    import ray.data as rd

    from ocr_ray.ops.similarity import (
        ann_brute_topk,
        pq_adc_rerank_topk,
        pq_adc_violations,
    )

    t = _clustered_embeddings(n=300)
    ds = rd.from_arrow(t)
    q = np.stack(
        [np.asarray(v, np.float64) for v in t["embedding"].to_pylist()[:4]]
    )
    rr = pq_adc_rerank_topk(ds, q, k=10).to_pandas()
    brute = ann_brute_topk(ds, q, k=10).take_all()
    bq: dict[int, set] = {}
    for r in brute:
        bq.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    recalls = []
    for qi, exact in bq.items():
        got = set(rr[rr.query_id == qi].vec_id)
        recalls.append(len(got & exact) / len(exact))
    assert sum(recalls) / len(recalls) >= 0.7
    # re-ranked sims are true cosines: top hit of query 0 is itself
    top = rr[(rr["query_id"] == 0) & (rr["rank"] == 1)]
    assert abs(float(top.sim.iloc[0]) - 1.0) < 1e-5

    gate = pq_adc_violations(ds, q)
    assert gate.num_rows == 0
