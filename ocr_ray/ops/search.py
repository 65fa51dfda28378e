"""Inverted-index keyword search + per-label embedding centroids —
training-data-pipeline operators beyond the reference (SURVEY.md §2
extension surface; the reference's nearest analogue is the per-request
dictionary probe, dictionary_corrector.py:217-235).

Scale shape:

- ``term_postings``: one stateless ``map_batches`` pass emits slim
  ``(word, doc_id, tf)`` rows — a document's term frequencies are
  complete within its own row, so NO shuffle is needed to build them;
  hash-partitioning by word (for serving locality) is the caller's
  choice via ``grouped_map``/``repartition``.
- ``search_topk``: per-batch partial scores (each doc fully contained
  in its batch) → global ``sort + limit`` over the ≤ one-row-per-
  matching-doc score table. The corpus never shuffles; only matching
  doc scores move.
- ``label_centroids``: per-batch partial component sums as slim
  ``(label, dim, sum, count)`` rows → small ``groupby`` — the classic
  partial-aggregation pattern; vector components are fixed-point
  integers end-to-end so the result is bit-reproducible (and
  SQL-checkable) regardless of summation order.
"""
from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# shared with ops.analysis / the DuckDB oracles
_WORD_RE = re.compile(r"[a-zA-Z]{3,}")


def term_postings(docs):
    """Inverted-index postings: (word, doc_id, tf) for every word
    occurrence, tf = in-document term frequency."""

    def postings(batch: pa.Table) -> pa.Table:
        words, ids, tfs = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for w, n in Counter(_WORD_RE.findall((text or "").lower())).items():
                words.append(w)
                ids.append(doc_id)
                tfs.append(n)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    return docs.map_batches(postings, batch_format="pyarrow")


def search_topk(docs, terms, k: int = 20):
    """Top-k documents by summed term frequency over ``terms``
    (score DESC, doc_id ASC). The term set is captured in the task
    closure (tiny); scores are complete per batch, so the only global
    step is a sort+limit over matching docs."""
    term_set = frozenset(t.lower() for t in terms)

    def score(batch: pa.Table) -> pa.Table:
        ids, scores = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            s = sum(
                1 for w in _WORD_RE.findall((text or "").lower()) if w in term_set
            )
            if s:
                ids.append(doc_id)
                scores.append(s)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array(scores, pa.int64()),
            }
        )

    return (
        docs.map_batches(score, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


# fixed-point scale for centroid components: sums become exact int64
# arithmetic, so Ray's unordered partial aggregation and DuckDB's
# sequential SUM produce identical results (float sums are
# order-dependent — the established integer-cents pattern)
CENTROID_SCALE = 1_000_000


def label_centroids(embeddings):
    """Per-label element-wise mean vector, exploded to one row per
    (label, dim): (label, dim, centroid, n_vecs). dim is 1-based.

    Components are rounded half-away-from-zero to 1e-6 fixed point
    BEFORE summation; the mean is the double quotient of exact integers.
    """
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.cast(
            pc.round(
                pc.multiply(
                    pc.cast(emb.flatten(), pa.float64()), float(CENTROID_SCALE)
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        dim = len(flat) // batch.num_rows if batch.num_rows else 0
        m = flat.reshape(batch.num_rows, dim) if dim else flat.reshape(0, 0)
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        out_label, out_dim, out_sum, out_n = [], [], [], []
        for lab in np.unique(labels):
            rows = m[labels == lab]
            sums = rows.sum(axis=0, dtype=np.int64)
            out_label.extend([int(lab)] * dim)
            out_dim.extend(range(1, dim + 1))
            out_sum.extend(int(s) for s in sums)
            out_n.extend([len(rows)] * dim)
        return pa.table(
            {
                "label": pa.array(out_label, pa.int64()),
                "dim": pa.array(out_dim, pa.int64()),
                "isum": pa.array(out_sum, pa.int64()),
                "n_vecs": pa.array(out_n, pa.int64()),
            }
        )

    agg = (
        embeddings.map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(
            Sum("isum", alias_name="isum"), Sum("n_vecs", alias_name="n_vecs")
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.schema(
                [("label", pa.int64()), ("dim", pa.int64()),
                 ("centroid", pa.float64()), ("n_vecs", pa.int64())]
            ).empty_table()
        centroid = pc.divide(
            pc.cast(t["isum"], pa.float64()),
            pc.multiply(pc.cast(t["n_vecs"], pa.float64()), float(CENTROID_SCALE)),
        )
        return pa.table(
            {
                "label": t.column("label"),
                "dim": t.column("dim"),
                "centroid": centroid,
                "n_vecs": t.column("n_vecs"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def embedding_dispersion_by_label(embeddings):
    """Per-label within-group scatter: the mean squared pairwise
    Euclidean distance over all ordered pairs, via the moment identity
    Σ_{i≠j}‖xᵢ−xⱼ‖² = 2·(N·Σ‖xᵢ‖² − ‖Σxᵢ‖²) — so vectors NEVER pair up
    and never shuffle; each batch emits per-(label, dim) component sums
    plus one sentinel dim=0 row carrying the squared-norm sum, one keyed
    sum reduces them, and one tiny per-label block finishes.

    Determinism: components are quantized ``floor(x·1000)`` (the k-means
    convention) so every moment is an exact integer — Python ints in the
    finishing block, HUGEINT in the oracle — and the final dispersion is
    one shared IEEE expression over the casts. Labels with one vector
    take the guarded 0.0 branch."""
    from ray.data.aggregate import Sum

    from ocr_ray.stages.grouped import grouped_map

    Q = 1000

    def partials(batch: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("label", pa.int64()),
                ("dim", pa.int64()),
                ("isum", pa.int64()),
                ("n", pa.int64()),
            ]
        )
        if batch.num_rows == 0:
            return schema.empty_table()
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = np.floor(
            emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            * Q
        ).astype(np.int64)
        dim = len(flat) // batch.num_rows
        m = flat.reshape(batch.num_rows, dim)
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        out = {"label": [], "dim": [], "isum": [], "n": []}
        for lab in np.unique(labels):
            rows = m[labels == lab]
            sums = rows.sum(axis=0, dtype=np.int64)
            sq = int((rows * rows).sum(dtype=np.int64))
            out["label"].extend([int(lab)] * (dim + 1))
            out["dim"].extend(range(0, dim + 1))  # 0 = squared-norm sentinel
            out["isum"].extend([sq] + [int(s) for s in sums])
            out["n"].extend([len(rows)] * (dim + 1))
        return pa.table(
            {
                "label": pa.array(out["label"], pa.int64()),
                "dim": pa.array(out["dim"], pa.int64()),
                "isum": pa.array(out["isum"], pa.int64()),
                "n": pa.array(out["n"], pa.int64()),
            }
        )

    agg = (
        embeddings.map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("isum", alias_name="isum"), Sum("n", alias_name="n"))
    )

    out_schema = pa.schema(
        [
            ("label", pa.int64()),
            ("n_vecs", pa.int64()),
            ("mean_sq_dist", pa.float64()),
        ]
    )

    def finish_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        rows = block.num_rows
        if rows == 0 or len(starts) == 0:
            return out_schema.empty_table()
        labels = block.column("label").to_numpy(zero_copy_only=False)
        dims = block.column("dim").to_numpy(zero_copy_only=False)
        isum = block.column("isum").to_numpy(zero_copy_only=False)
        ncol = block.column("n").to_numpy(zero_copy_only=False)
        ends = np.append(starts[1:], rows)
        out = {"label": [], "n_vecs": [], "mean_sq_dist": []}
        for s, e in zip(starts, ends):
            d, v = dims[s:e], isum[s:e]
            n = int(ncol[s])
            s2 = int(v[d == 0][0])
            ss1 = sum(int(x) * int(x) for x in v[d > 0])  # exact Python ints
            if n < 2:
                msd = 0.0
            else:
                # shared IEEE tree with the oracle
                msd = (
                    2.0
                    * (float(n) * float(s2) - float(ss1))
                    / (float(n) * (float(n) - 1.0))
                    / float(Q * Q)
                )
            out["label"].append(int(labels[s]))
            out["n_vecs"].append(n)
            out["mean_sq_dist"].append(msd)
        return pa.table(
            {
                "label": pa.array(out["label"], pa.int64()),
                "n_vecs": pa.array(out["n_vecs"], pa.int64()),
                "mean_sq_dist": pa.array(out["mean_sq_dist"], pa.float64()),
            }
        )

    return grouped_map(agg, ["label"], finish_block)


def embedding_dispersion_sql() -> str:
    """DuckDB replay: parallel unnest with subscripts, same floor(x·1000)
    quantization, HUGEINT moments, same guarded closed form."""
    return (
        "WITH q AS (\n"
        " SELECT label,\n"
        "  unnest(range(1, len(embedding) + 1)) AS i,\n"
        "  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT)"
        " AS qv\n"
        " FROM embeddings\n"
        "), nv AS (\n"
        " SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label\n"
        "), s2 AS (\n"
        " SELECT label, SUM(CAST(qv AS HUGEINT) * qv) AS s2"
        " FROM q GROUP BY label\n"
        "), dimsum AS (\n"
        " SELECT label, i, SUM(CAST(qv AS HUGEINT)) AS s1"
        " FROM q GROUP BY label, i\n"
        "), ss1 AS (\n"
        " SELECT label, SUM(s1 * s1) AS ss1 FROM dimsum GROUP BY label\n"
        ")\n"
        "SELECT CAST(nv.label AS BIGINT) AS label,\n"
        " CAST(nv.n AS BIGINT) AS n_vecs,\n"
        " CASE WHEN nv.n < 2 THEN 0.0 ELSE\n"
        "  2.0 * (CAST(nv.n AS DOUBLE) * CAST(s2.s2 AS DOUBLE)"
        " - CAST(ss1.ss1 AS DOUBLE))\n"
        "  / (CAST(nv.n AS DOUBLE) * (CAST(nv.n AS DOUBLE) - 1.0))"
        " / 1000000.0 END AS mean_sq_dist\n"
        "FROM nv JOIN s2 ON s2.label = nv.label"
        " JOIN ss1 ON ss1.label = nv.label"
    )


def embedding_gram_moments(embeddings, quant: int = 1000):
    """Exact quantized Gram/covariance moments of the embedding matrix —
    the mergeable sufficient statistics for distributed PCA / whitening
    (the d×d second-moment matrix, the d dim-sums and the row count;
    covariance = G/n − μμᵀ follows driver-side from these alone).

    Components quantize ``floor(x·quant)`` (the k-means convention) so
    every moment is an EXACT int64 — each batch contributes one d×d
    integer matmul (``Qᵀ·Q``, BLAS-shaped, no per-row Python) and emits
    the upper triangle as slim (i, j, s) rows; one keyed sum over the
    fixed d(d+1)/2 + d + 1 row domain reduces all batches. Nothing
    scales with corpus size except the map pass.

    Output rows (i, j, s), 1-based dims: i≤j ⇒ Σ qᵢ·qⱼ; (i, 0) ⇒ Σ qᵢ;
    (0, 0) ⇒ n."""
    from ray.data.aggregate import Sum

    from ocr_ray.ops.similarity import _batch_matrix

    out_schema = pa.schema(
        [("i", pa.int64()), ("j", pa.int64()), ("s", pa.int64())]
    )

    def partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        m = _batch_matrix(batch)
        q = np.floor(m.astype(np.float64) * quant).astype(np.int64)
        d = q.shape[1]
        gram = q.T @ q  # exact int64 matmul
        iu, ju = np.triu_indices(d)
        dims = q.sum(axis=0, dtype=np.int64)
        return pa.table(
            {
                "i": pa.array(
                    np.concatenate([iu + 1, np.arange(1, d + 1), [0]]),
                    pa.int64(),
                ),
                "j": pa.array(
                    np.concatenate(
                        [ju + 1, np.zeros(d, np.int64), [0]]
                    ),
                    pa.int64(),
                ),
                "s": pa.array(
                    np.concatenate(
                        [gram[iu, ju], dims, [batch.num_rows]]
                    ),
                    pa.int64(),
                ),
            }
        )

    return (
        embeddings.map_batches(partials, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("s", alias_name="s"))
    )


def embedding_gram_moments_sql(quant: int = 1000) -> str:
    """DuckDB replay: parallel unnest + self-join on vec_id for the
    upper triangle, HUGEINT inner sums, same quantization."""
    return (
        "WITH q AS (\n"
        " SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i,\n"
        f"  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {quant})"
        " AS BIGINT) AS qv\n"
        " FROM embeddings\n"
        "), gram AS (\n"
        " SELECT a.i AS i, b.i AS j,\n"
        "  CAST(SUM(CAST(a.qv AS HUGEINT) * b.qv) AS BIGINT) AS s\n"
        " FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i\n"
        " GROUP BY 1, 2\n"
        "), dims AS (\n"
        " SELECT i, CAST(0 AS BIGINT) AS j,\n"
        "  CAST(SUM(CAST(qv AS HUGEINT)) AS BIGINT) AS s FROM q GROUP BY i\n"
        "), cnt AS (\n"
        " SELECT CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS j,\n"
        "  CAST(COUNT(*) AS BIGINT) AS s FROM embeddings\n"
        ")\n"
        "SELECT i, j, s FROM gram\n"
        "UNION ALL SELECT i, j, s FROM dims\n"
        "UNION ALL SELECT i, j, s FROM cnt"
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (Okapi k1=1.2, b=0.75) in exact fixed-point


def bm25_postings(docs, term_set: frozenset):
    """One scan of the corpus → slim derived rows only: per matching
    (doc, term) a ``(doc_id, term, tf, dl)`` posting, plus ONE stats row
    per input batch (reserved ``term=''`` — the token regex requires ≥3
    letters, so no real term collides) carrying the batch's doc count in
    ``tf`` and token total in ``dl``. Collection size N and token total L
    therefore ride the same pass that builds the postings — the corpus
    is scanned exactly once."""
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
            ("dl", pa.int64()),
        ]
    )

    def posts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return schema.empty_table()
        ids, ts, tfs, dls = [], [], [], []
        total_tokens = 0
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            words = _WORD_RE.findall((text or "").lower())
            total_tokens += len(words)
            hits = Counter(w for w in words if w in term_set)
            for t_, n in hits.items():
                ids.append(doc_id)
                ts.append(t_)
                tfs.append(n)
                dls.append(len(words))
        ids.append(-1)
        ts.append("")
        tfs.append(batch.num_rows)
        dls.append(total_tokens)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "term": pa.array(ts, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "dl": pa.array(dls, pa.int64()),
            }
        )

    return docs.map_batches(posts, batch_format="pyarrow")


def bm25_topk(docs, terms, k: int = 20):
    """Top-k documents by Okapi BM25 (k1=1.2, b=0.75) over ``terms``,
    in EXACT fixed-point integer arithmetic shared with the SQL oracle.

    With k1=11/10 · 12/11 = 6/5 and b=3/4 the per-term score
    ``idf · tf(k1+1) / (tf + k1(1-b+b·dl/avgdl))`` reduces to the
    rational form ``idf · 22·tf·L / (10·tf·L + 3L + 9·dl·N)``; dividing
    through by L/1e6 gives integer-only arithmetic over
    ``idf_micro = ⌊1e6·ln((2N+2)/(2df+1)) + 0.5⌋`` and
    ``r_micro = ⌊((1e6·dl)·N)/L + 0.5⌋`` — the only floats are one
    ``ln`` and one division chain, both evaluated in the identical
    IEEE-754 term order on both sides, so scores match bit-for-bit.

    Scale shape: one corpus scan builds slim postings restricted to the
    query terms (``bm25_postings``); the postings MATERIALIZE (bounded:
    matching docs × |terms| slim rows + one stats row per block) so the
    tiny df/stats aggregates don't re-scan the corpus; scoring is a
    stateless vectorized pass; only per-doc integer scores shuffle into
    the final ``groupby → sort+limit``."""
    from ray.data.aggregate import Sum

    from ocr_ray.ops.dedup import _with_schema

    term_set = frozenset(t.lower() for t in terms)
    posts = bm25_postings(docs, term_set).materialize()

    def _split(want_stats: bool):
        def f(t: pa.Table) -> pa.Table:
            mask = pc.equal(t.column("term"), "")
            return t.filter(mask if want_stats else pc.invert(mask))

        return f

    stats_tf = posts.map_batches(_split(True), batch_format="pyarrow")
    # ≤ one row per input block: a driver fold is bounded by block count
    n_docs, total_tokens = 0, 0
    for row in stats_tf.take_all():
        n_docs += row["tf"]
        total_tokens += row["dl"]
    if n_docs == 0 or total_tokens == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.int64())}
        )

    real = posts.map_batches(_split(False), batch_format="pyarrow")
    df_rows = (
        real.groupby("term").count().take_all()
    )  # ≤ |terms| rows by construction
    import math as _math

    idf_micro = {
        r["term"]: int(
            _math.floor(
                1_000_000.0
                * _math.log((2 * n_docs + 2.0) / (2 * r["count()"] + 1.0))
                + 0.5
            )
        )
        for r in df_rows
    }
    max_idf = max(idf_micro.values(), default=0)

    score_schema = pa.schema([("doc_id", pa.int64()), ("score", pa.int64())])
    n_f, l_f = float(n_docs), float(total_tokens)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return score_schema.empty_table()
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        dl = batch.column("dl").to_numpy(zero_copy_only=False)
        idf = np.array(
            [idf_micro[t_] for t_ in batch.column("term").to_pylist()],
            dtype=np.int64,
        )
        # ((1e6·dl)·N)/L — the oracle's exact left-to-right term order
        r_micro = np.floor(
            ((1_000_000.0 * dl.astype(np.float64)) * n_f) / l_f + 0.5
        ).astype(np.int64)
        denom = 10 * tf * 1_000_000 + 3_000_000 + 9 * r_micro
        if max_idf * 22 * int(tf.max()) * 1_000_000 < 2**63:
            s = (idf * 22 * tf * 1_000_000) // denom
        else:  # exact-int fallback past the int64 witness (huge corpora)
            s = np.array(
                [
                    (int(i) * 22 * int(t_) * 1_000_000) // int(d)
                    for i, t_, d in zip(idf, tf, denom)
                ],
                dtype=np.int64,
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score": pa.array(s, pa.int64()),
            }
        )

    scored = _with_schema(
        real.map_batches(score, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("score", alias_name="score")),
        score_schema,
    )
    return scored.sort(["score", "doc_id"], descending=[True, False]).limit(k)


PC_SCALE = 10**9  # fixed-point one for the power iteration


def embedding_top_pc(embeddings, iters: int = 20, quant: int = 1000):
    """Dominant eigenvector of the embedding second-moment (Gram)
    matrix by fixed-point power iteration — the first PCA direction
    (uncentered), the spectral summary a whitening / dimensionality
    decision reads.

    The distributed part is ``embedding_gram_moments`` (exact int64
    quantized moments, d(d+1)/2 + d + 1 rows regardless of corpus
    size); the 20-step iteration folds driver-side in pure integers:
    w = G·v exactly, then renormalize v' = sign(w)·(|w|·S // max|w|)
    (truncating division on NON-NEGATIVE operands only — DuckDB's
    ``//`` truncates toward zero while Python floors, so the sign is
    split identically in both engines). The oracle replays the
    iteration with unrolled MATERIALIZED CTEs and the fixed-point
    vector compares exactly.

    Output: (dim, v_fixed) — 1-based dimension index and the
    fixed-point eigenvector component (scale 10^9, max-norm 1).
    """
    moments = embedding_gram_moments(embeddings, quant=quant).take_all()
    cells = {(int(r["i"]), int(r["j"])): int(r["s"]) for r in moments}
    d = max((i for i, _ in cells), default=0)
    if d == 0:
        return pa.table(
            {
                "dim": pa.array([], pa.int64()),
                "v_fixed": pa.array([], pa.int64()),
            }
        )
    g = np.zeros((d, d), dtype=object)
    for (i, j), s in cells.items():
        if i >= 1 and j >= 1:
            g[i - 1][j - 1] = s
            if i != j:
                g[j - 1][i - 1] = s

    v = [PC_SCALE] * d
    for _ in range(iters):
        w = [sum(int(g[i][j]) * v[j] for j in range(d)) for i in range(d)]
        mx = max(abs(x) for x in w)
        if mx == 0:
            break
        v = [
            (abs(x) * PC_SCALE // mx) * (1 if x >= 0 else -1) for x in w
        ]
    return pa.table(
        {
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64), pa.int64()),
            "v_fixed": pa.array(v, pa.int64()),
        }
    )


def embedding_top_pc_sql(iters: int = 20, quant: int = 1000) -> str:
    base = embedding_gram_moments_sql(quant=quant)
    s = PC_SCALE
    parts = [
        "WITH m AS MATERIALIZED (\n" + base + "\n),\n"
        "g AS MATERIALIZED (\n"
        " SELECT i, j, s FROM m WHERE i >= 1 AND j >= 1\n"
        " UNION ALL\n"
        " SELECT j, i, s FROM m WHERE i >= 1 AND j > i\n"
        "),\n"
        "dims AS MATERIALIZED (SELECT DISTINCT i AS dim FROM g),\n"
        f"v0 AS MATERIALIZED (SELECT dim, {s}::HUGEINT AS v FROM dims)"
    ]
    for t in range(iters):
        parts.append(
            f", w{t} AS MATERIALIZED (\n"
            f" SELECT g.i AS dim, SUM(g.s::HUGEINT * v.v) AS w\n"
            f" FROM g JOIN v{t} v ON v.dim = g.j GROUP BY g.i\n"
            f"), mx{t} AS MATERIALIZED (SELECT MAX(ABS(w)) AS mx FROM w{t}),\n"
            f"v{t + 1} AS MATERIALIZED (\n"
            " SELECT d.dim,\n"
            " CASE WHEN m.mx = 0 THEN v_prev.v\n"
            f"  WHEN w.w >= 0 THEN (ABS(w.w) * {s}::HUGEINT) // m.mx\n"
            f"  ELSE -((ABS(w.w) * {s}::HUGEINT) // m.mx) END AS v\n"
            f" FROM dims d JOIN w{t} w ON w.dim = d.dim\n"
            f" JOIN v{t} v_prev ON v_prev.dim = d.dim\n"
            f" CROSS JOIN mx{t} m\n"
            ")"
        )
    return (
        "".join(parts)
        + f"\nSELECT dim, CAST(v AS BIGINT) AS v_fixed FROM v{iters}"
    )
