"""Deduplication operators over a documents table — the large-scale
training-data pipeline family: exact, MinHash-LSH, SimHash and exact
n-gram Jaccard via an inverted-index join. All deterministic (seeded
hashing, sorted tie-breaks) and expressed as map_batches partials +
small groupbys; no operator materializes the corpus on the driver.

Reference analogue: the only dedup the reference does is exact
word-level (UNIQUE constraint, db_service.py:69; list(set()),
dictionary_corrector.py:235); the near-dup family generalizes it for
100 TB corpora (SURVEY.md §2.7).
"""
from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pyarrow as pa

from ocr_ray.ops.analysis import normalize_for_fingerprint

_WORD_RE = re.compile(r"[a-zA-Z0-9]+")

# ---------------------------------------------------------------- exact


def _hash_batch(batch: pa.Table) -> pa.Table:
    fps = [
        hashlib.md5(normalize_for_fingerprint(t).encode("utf-8")).hexdigest()
        for t in batch.column("text").to_pylist()
    ]
    return pa.table(
        {"fingerprint": pa.array(fps, pa.string()), "doc_id": batch.column("doc_id")}
    )


def dedup_exact(docs):
    """Exact dedup: hash-partition on content fingerprint, keep the
    smallest doc_id per group (D2 semantics, deterministic keeper)."""
    from ray.data.aggregate import Count, Min

    return (
        docs.map_batches(_hash_batch, batch_format="pyarrow")
        .groupby("fingerprint")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
    )


# ------------------------------------------------------------- shingles


def _stable_hash64(token: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "big"
    )


def word_shingles(text: str, n: int = 3) -> set[str]:
    words = _WORD_RE.findall((text or "").lower())
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


# ---------------------------------------------------------- MinHash-LSH

def _minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 62, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, 1 << 62, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: set[str], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm uint64 min-hashes via multiply-shift hashing
    ``(a·h + b) mod 2^64`` (odd a; natural uint64 wraparound) — fully
    vectorized (num_perm × n_shingles), no bignum arithmetic."""
    if not shingles:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    h = np.fromiter(
        (_stable_hash64(s) for s in shingles), dtype=np.uint64, count=len(shingles)
    )
    with np.errstate(over="ignore"):
        prod = a[:, None] * h[None, :] + b[:, None]
    return prod.min(axis=1)


class MinHashLsh:
    """map_batches stage: doc → one row per LSH band
    (band, band_hash, doc_id, signature). Stateful (hash params built
    once per actor)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_n: int = 3):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.n = num_perm, bands, shingle_n
        self.rows_per_band = num_perm // bands
        self.a, self.b = _minhash_params(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, bands, band_hashes, sigs = [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sig = minhash_signature(word_shingles(text, self.n), self.a, self.b)
            sig_bytes = sig.tobytes()
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                doc_ids.append(doc_id)
                bands.append(band)
                band_hashes.append(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                )
                sigs.append(sig_bytes)
        return pa.table(
            {
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.string()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "signature": pa.array(sigs, pa.binary()),
            }
        )


def _minhash_block_pairs(block: pa.Table, starts: np.ndarray,
                         max_bucket: int = 64) -> pa.Table:
    """Candidate pairs from every multi-row LSH bucket in one sorted block
    — single-doc buckets (the overwhelming majority) are skipped in bulk
    via the precomputed run boundaries. Jaccard is estimated from
    signature agreement. Buckets larger than max_bucket are truncated
    deterministically by doc_id order (hot-key guard)."""
    a_out, b_out, est = [], [], []
    ends = np.append(starts[1:], block.num_rows)
    multi = ends - starts >= 2
    if multi.any():
        ids_col = block.column("doc_id")
        sigs_col = block.column("signature")
        for s, e in zip(starts[multi], ends[multi]):
            ids = ids_col.slice(s, e - s).to_pylist()
            sigs = sigs_col.slice(s, e - s).to_pylist()
            order = np.argsort(ids)[:max_bucket]
            for x in range(len(order)):
                i = order[x]
                si = np.frombuffer(sigs[i], dtype=np.uint64)
                for y in range(x + 1, len(order)):
                    j = order[y]
                    if ids[i] == ids[j]:
                        continue
                    sj = np.frombuffer(sigs[j], dtype=np.uint64)
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    est.append(float(np.mean(si == sj)))
    return pa.table(
        {
            "doc_a": pa.array(a_out, pa.int64()),
            "doc_b": pa.array(b_out, pa.int64()),
            "est_jaccard": pa.array(est, pa.float64()),
        }
    )


def dedup_minhash(docs, num_perm: int = 64, bands: int = 16, threshold: float = 0.5):
    """MinHash-LSH near-dup candidate pairs with estimated Jaccard ≥
    threshold: shingle→minhash per batch, explode to band rows, block-level
    bucket grouping (grouped_map), pairwise signature compare, pair dedup
    via groupby-max."""
    from ray.data.aggregate import Max

    from ocr_ray.stages.grouped import grouped_map

    band_rows = docs.map_batches(
        MinHashLsh,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    pairs = grouped_map(band_rows, ["band", "band_hash"], _minhash_block_pairs)
    return (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Max("est_jaccard", alias_name="est_jaccard"))
        .filter(expr=f"est_jaccard >= {threshold}")
    )


# -------------------------------------------------------------- SimHash


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens weighted by term frequency."""
    counts = Counter(_WORD_RE.findall((text or "").lower()))
    if not counts:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for token, weight in counts.items():
        h = _stable_hash64(token)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), weight, -weight)
    return int(
        np.bitwise_or.reduce(
            (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
    )


def _simhash_batch(batch: pa.Table) -> pa.Table:
    """Long format: 4 rows per doc, one per 16-bit chunk table — near-dups
    (hamming ≤ 3 over 4 chunks) collide in ≥1 table (pigeonhole), and one
    pass + one shuffle covers all 4 tables."""
    hashes = [simhash64(t) for t in batch.column("text").to_pylist()]
    ids = batch.column("doc_id").to_pylist()
    n = len(hashes)
    return pa.table(
        {
            "table_id": pa.array([t for t in range(4) for _ in range(n)], pa.int32()),
            "chunk": pa.array(
                [(h >> (16 * t)) & 0xFFFF for t in range(4) for h in hashes],
                pa.int32(),
            ),
            "doc_id": pa.array(ids * 4, pa.int64()),
            "simhash": pa.array(
                np.tile(np.array(hashes, dtype=np.uint64), 4), pa.uint64()
            ),
        }
    )


def _simhash_block_pairs_factory(max_hamming: int, max_bucket: int = 256):
    def block_pairs(block: pa.Table, starts: np.ndarray) -> pa.Table:
        a_out, b_out, dist = [], [], []
        ends = np.append(starts[1:], block.num_rows)
        multi = ends - starts >= 2
        if multi.any():
            ids_col = block.column("doc_id")
            hash_col = block.column("simhash")
            for s, e in zip(starts[multi], ends[multi]):
                ids = ids_col.slice(s, e - s).to_pylist()
                hashes = hash_col.slice(s, e - s).to_pylist()
                order = np.argsort(ids)[:max_bucket]
                for x in range(len(order)):
                    i = order[x]
                    for y in range(x + 1, len(order)):
                        j = order[y]
                        if ids[i] == ids[j]:
                            continue
                        d = bin(hashes[i] ^ hashes[j]).count("1")
                        if d <= max_hamming:
                            a_out.append(ids[i])
                            b_out.append(ids[j])
                            dist.append(d)
        return pa.table(
            {
                "doc_a": pa.array(a_out, pa.int64()),
                "doc_b": pa.array(b_out, pa.int64()),
                "hamming": pa.array(dist, pa.int32()),
            }
        )

    return block_pairs


def dedup_simhash(docs, max_hamming: int = 3):
    """SimHash near-dup pairs within hamming distance ≤ max_hamming,
    candidate-generated by 16-bit chunk tables (pigeonhole: d ≤ 3 over 4
    chunks → at least one identical chunk)."""
    from ray.data.aggregate import Min

    from ocr_ray.stages.grouped import grouped_map

    sims = docs.map_batches(_simhash_batch, batch_format="pyarrow")
    pairs = grouped_map(
        sims, ["table_id", "chunk"], _simhash_block_pairs_factory(max_hamming)
    )
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


def dedup_exact_drop_list(docs):
    """Docs to REMOVE under exact dedup: everything but the min doc_id of
    each fingerprint group. Fully distributed (block-level grouped map on
    the fingerprint — no driver-side keeper set). Output (doc_id)."""
    from ocr_ray.stages.grouped import grouped_map

    hashed = docs.map_batches(_hash_batch, batch_format="pyarrow")

    def drop_non_min(block: pa.Table, starts: np.ndarray) -> pa.Table:
        ids = block.column("doc_id").to_numpy(zero_copy_only=False)
        ends = np.append(starts[1:], block.num_rows)
        out = []
        for s, e in zip(starts, ends):
            if e - s >= 2:
                grp = np.sort(ids[s:e])
                out.extend(int(x) for x in grp[1:])
        return pa.table({"doc_id": pa.array(sorted(out), pa.int64())})

    return grouped_map(hashed, ["fingerprint"], drop_non_min)


def dedup_minhash_drop_list(docs, threshold: float = 0.5, **kwargs):
    """Docs to REMOVE under MinHash near-dedup: greedy keep-smallest —
    the larger doc_id of every candidate pair at/above threshold."""
    from ray.data.aggregate import Count

    pairs = dedup_minhash(docs, threshold=threshold, **kwargs)
    return (
        pairs.map_batches(
            lambda t: pa.table({"doc_id": t["doc_b"]}), batch_format="pyarrow"
        )
        .groupby("doc_id")
        .aggregate(Count(alias_name="n_pairs"))
        .select_columns(["doc_id"])
    )


# ------------------------------------------- exact n-gram Jaccard pairs


def _shingle_rows_factory(shingle_n: int):
    def shingle_rows(batch: pa.Table) -> pa.Table:
        sh_out, id_out, size_out = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            shingles = word_shingles(text, shingle_n)
            for s in shingles:
                sh_out.append(_stable_hash64(s))
                id_out.append(doc_id)
                size_out.append(len(shingles))
        return pa.table(
            {
                "shingle": pa.array(np.array(sh_out, dtype=np.uint64), pa.uint64()),
                "doc_id": pa.array(id_out, pa.int64()),
                "set_size": pa.array(size_out, pa.int64()),
            }
        )

    return shingle_rows


def _cooccur_block_factory(max_df: int):
    def cooccur(block: pa.Table, starts: np.ndarray) -> pa.Table:
        a_out, b_out, sa, sb = [], [], [], []
        ends = np.append(starts[1:], block.num_rows)
        sizes = ends - starts
        multi = (sizes >= 2) & (sizes <= max_df)  # stop-shingle guard
        if multi.any():
            ids_col = block.column("doc_id")
            size_col = block.column("set_size")
            for s, e in zip(starts[multi], ends[multi]):
                ids = sorted(
                    zip(
                        ids_col.slice(s, e - s).to_pylist(),
                        size_col.slice(s, e - s).to_pylist(),
                    )
                )
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        if ids[i][0] == ids[j][0]:
                            continue
                        a_out.append(ids[i][0])
                        b_out.append(ids[j][0])
                        sa.append(ids[i][1])
                        sb.append(ids[j][1])
        return pa.table(
            {
                "doc_a": pa.array(a_out, pa.int64()),
                "doc_b": pa.array(b_out, pa.int64()),
                "size_a": pa.array(sa, pa.int64()),
                "size_b": pa.array(sb, pa.int64()),
            }
        )

    return cooccur


def ngram_jaccard_pairs(docs, shingle_n: int = 3, threshold: float = 0.5,
                        max_df: int = 256):
    """EXACT n-gram Jaccard similarity for all pairs sharing ≥1 shingle,
    via a distributed inverted-index join: explode (shingle, doc) rows →
    bucket by shingle → co-occurrence pairs (each contributes 1 to
    |A∩B|) → groupby-pair count → jaccard = inter/(|A|+|B|−inter).
    Shingles appearing in more than max_df docs are dropped (stop-shingle
    skew guard — document-identical pairs still meet through their other
    shingles)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max

    from ocr_ray.stages.grouped import grouped_map

    rows = docs.map_batches(
        _shingle_rows_factory(shingle_n), batch_format="pyarrow"
    )
    pairs = grouped_map(rows, ["shingle"], _cooccur_block_factory(max_df))
    counted = pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="intersection"),
        Max("size_a", alias_name="size_a"),
        Max("size_b", alias_name="size_b"),
    )

    def add_jaccard(t: pa.Table) -> pa.Table:
        inter = t["intersection"].to_numpy(zero_copy_only=False).astype(np.float64)
        union = (
            t["size_a"].to_numpy(zero_copy_only=False)
            + t["size_b"].to_numpy(zero_copy_only=False)
            - inter
        )
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        out = t.append_column("jaccard", pa.array(jac, pa.float64()))
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return counted.map_batches(add_jaccard, batch_format="pyarrow")
