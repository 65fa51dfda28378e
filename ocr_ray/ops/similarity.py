"""Similarity search over an embedding column (list<float>).

- ``ann_brute_topk``: exact cosine top-k — the baseline. Queries are
  broadcast once (``ray.put``); each batch does one float64 matmul
  against the query matrix and emits a per-batch partial top-k, so the
  final exact merge sees ``n_batches × k`` rows per query, not the
  corpus.
- ``ann_ivf_topk``: the scale path — deterministic mini-KMeans centroids
  from a driver-side sample, broadcast; an assign stage labels vectors;
  queries probe only the ``nprobe`` nearest clusters. Approximate;
  recall is pinned by tests against the brute-force baseline.
- ``embedding_cosine_dedup``: near-dup pairs by cosine ≥ threshold via
  random-hyperplane (SimHash-for-vectors) bucketing.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_matrix(batch: pa.Table, column: str = "embedding") -> np.ndarray:
    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


class _BruteTopK:
    """Per-batch partial top-k against a broadcast query matrix."""

    def __init__(self, queries_ref, k: int):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q_norm = _normalize(np.asarray(q, dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch))
        sims = m @ self.q_norm.T  # (batch, n_queries)
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        k = min(self.k, sims.shape[0])
        q_out, v_out, s_out = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            top = np.argpartition(-col, k - 1)[:k] if k < len(col) else np.arange(len(col))
            for i in top:
                q_out.append(qi)
                v_out.append(int(vec_ids[i]))
                s_out.append(float(col[i]))
        return pa.table(
            {
                "query_id": pa.array(q_out, pa.int64()),
                "vec_id": pa.array(v_out, pa.int64()),
                "sim": pa.array(s_out, pa.float64()),
            }
        )


def _final_topk_factory(k: int):
    def final_topk(group: pa.Table) -> pa.Table:
        sims = group.column("sim").to_numpy(zero_copy_only=False)
        vec_ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        # deterministic: sort by (-sim, vec_id)
        order = np.lexsort((vec_ids, -sims))[:k]
        qid = group.column("query_id")[0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(order), pa.int64()),
                "vec_id": pa.array(vec_ids[order], pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
                "sim": pa.array(np.round(sims[order], 6), pa.float64()),
            }
        )

    return final_topk


def ann_brute_topk(embeddings, queries: np.ndarray, k: int = 10):
    """Exact cosine top-k for each query row; output
    (query_id, vec_id, rank, sim) with rank 1 = most similar, ties by
    vec_id."""
    import ray

    queries_ref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = embeddings.map_batches(
        _BruteTopK,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return partials.groupby("query_id").map_groups(
        _final_topk_factory(k), batch_format="pyarrow"
    )


# ------------------------------------------------------------------ IVF


def train_centroids(sample: np.ndarray, n_clusters: int, iters: int = 8) -> np.ndarray:
    """Deterministic Lloyd KMeans on a sample: init = first distinct rows
    in vec_id order, fixed iteration count, no RNG."""
    sample = np.asarray(sample, dtype=np.float64)
    centroids = sample[:n_clusters].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_clusters):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


class _IvfAssign:
    def __init__(self, centroids_ref):
        import ray

        self.centroids = ray.get(centroids_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch)
        d = ((m[:, None, :] - self.centroids[None, :, :]) ** 2).sum(axis=2)
        return batch.append_column("cluster", pa.array(d.argmin(axis=1), pa.int32()))


def ann_ivf_topk(embeddings, queries: np.ndarray, k: int = 10,
                 n_clusters: int = 16, nprobe: int = 4, sample_size: int = 2048):
    """IVF-style ANN: probe only the nprobe nearest clusters per query.

    The centroid sample is a bounded driver-side materialization
    (``limit(sample_size)``) — at 100 TB this is the one deliberate
    small-materialization in the family; everything else streams.
    """
    import ray
    import pyarrow.compute as pc

    sample_tbl = pa.Table.from_pylist(embeddings.limit(sample_size).take_all())
    sample = _batch_matrix(sample_tbl)
    centroids = train_centroids(sample, n_clusters)
    centroids_ref = ray.put(centroids)

    q = np.asarray(queries, dtype=np.float64)
    qd = ((q[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe_clusters = np.unique(np.argsort(qd, axis=1)[:, :nprobe])

    assigned = embeddings.map_batches(
        _IvfAssign,
        fn_constructor_kwargs={"centroids_ref": centroids_ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    probed = assigned.map_batches(
        lambda t: t.filter(
            pc.is_in(t["cluster"], value_set=pa.array(probe_clusters, pa.int32()))
        ),
        batch_format="pyarrow",
    )
    return ann_brute_topk(probed, q, k)


# ------------------------------------------- cosine near-dup bucketing


class _HyperplaneSig:
    def __init__(self, dim: int, bits: int = 16, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, bits))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch))
        bits = (m @ self.planes) > 0
        sig = np.zeros(len(m), dtype=np.int64)
        for i in range(bits.shape[1]):
            sig |= bits[:, i].astype(np.int64) << i
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "bucket": pa.array(sig, pa.int64()),
                "embedding": batch.column("embedding"),
            }
        )


def _cosine_block_pairs_factory(threshold: float, max_bucket: int = 256):
    def pairs(block: pa.Table, starts: np.ndarray) -> pa.Table:
        a_out, b_out, s_out = [], [], []
        ends = np.append(starts[1:], block.num_rows)
        multi = ends - starts >= 2
        if multi.any():
            ids_all = block.column("vec_id").to_numpy(zero_copy_only=False)
            for s, e in zip(starts[multi], ends[multi]):
                sub = block.slice(s, e - s)
                ids = ids_all[s:e]
                order = np.argsort(ids)[:max_bucket]
                m = _normalize(_batch_matrix(sub))[order]
                ids = ids[order]
                sims = m @ m.T
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        if sims[i, j] >= threshold and ids[i] != ids[j]:
                            a_out.append(int(ids[i]))
                            b_out.append(int(ids[j]))
                            s_out.append(round(float(sims[i, j]), 6))
        return pa.table(
            {
                "vec_a": pa.array(a_out, pa.int64()),
                "vec_b": pa.array(b_out, pa.int64()),
                "cosine": pa.array(s_out, pa.float64()),
            }
        )

    return pairs


def embedding_cosine_dedup(embeddings, threshold: float = 0.95, bits: int = 16):
    """Near-duplicate vector pairs (cosine ≥ threshold) found inside
    random-hyperplane buckets. Recall is probabilistic in bits; exact
    within a bucket."""
    from ray.data.aggregate import Max

    from ocr_ray.stages.grouped import grouped_map

    dim = len(embeddings.take(1)[0]["embedding"])
    sigs = embeddings.map_batches(
        _HyperplaneSig,
        fn_constructor_kwargs={"dim": dim, "bits": bits},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    pairs = grouped_map(sigs, ["bucket"], _cosine_block_pairs_factory(threshold))
    return pairs.groupby(["vec_a", "vec_b"]).aggregate(
        Max("cosine", alias_name="cosine")
    )
