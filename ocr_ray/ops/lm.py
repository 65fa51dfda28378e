"""Corpus-statistic language scoring — the fit→broadcast→score shape a
training-data pipeline uses to score documents against a model FITTED ON
THE CORPUS ITSELF (here: a bigram frequency table; the same plumbing
serves KenLM-style fluency filters at scale).

``bigram_familiarity``: per document, the number of adjacent token
pairs and the sum of each pair's corpus-wide occurrence count.
Integer-exact end to end (counts, no log-space floats), so the DuckDB
oracle reproduces it bit-for-bit — a real-valued log-prob variant would
hit cross-engine libm/accumulation-order drift, documented trade-off.

Execution adapts to model size:

- model fits the broadcast budget (word-level bigram vocabularies are
  sublinear in corpus size): ``ray.put`` the sorted (gram, count)
  arrays once, score docs MAP-SIDE in a second scan — two corpus scans,
  ZERO shuffles of pair rows (measured 4× faster than the join plan on
  the bench corpus);
- model too large: hash-partitioned big-big join of per-doc pair rows
  against the model table, then a keyed per-doc sum — everything
  streams, nothing is driver-materialized.
"""
from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from ocr_ray.ops.analysis import _WORD_RE


def _doc_pair_counts(text: str, hash_memo: dict[str, int]) -> Counter:
    """gram-hash → within-doc multiplicity for one document."""
    from ocr_ray.ops.dedup import _stable_hash64

    ws = _WORD_RE.findall((text or "").lower())
    counts: Counter = Counter()
    for i in range(len(ws) - 1):
        gram = ws[i] + " " + ws[i + 1]
        h = hash_memo.get(gram)
        if h is None:
            h = hash_memo[gram] = _stable_hash64(gram) - (1 << 63)
        counts[h] += 1
    return counts


def _pair_rows(batch: pa.Table) -> pa.Table:
    """Per-doc pair multiplicities (doc_id, gram int64, m): duplicate
    pairs within a doc compress to one weighted row, and the join key is
    a 64-bit blake2b hash instead of the pair string — the key never
    appears in the output, so no SQL-reproducibility constraint applies
    and the shuffle carries fixed-width ints (familiarity = Σ m·c and
    n_pairs = Σ m are unchanged by the compression)."""
    ids_out: list[int] = []
    gram_out: list[int] = []
    m_out: list[int] = []
    hash_memo: dict[str, int] = {}
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        for h, m in _doc_pair_counts(text, hash_memo).items():
            ids_out.append(doc_id)
            gram_out.append(h)
            m_out.append(m)
    return pa.table(
        {
            "doc_id": pa.array(ids_out, pa.int64()),
            "gram": pa.array(gram_out, pa.int64()),
            "m": pa.array(m_out, pa.int64()),
        }
    )


class _BroadcastScorer:
    """Actor-pool scorer: fetches the broadcast (sorted grams, counts)
    arrays ONCE per actor in __init__, scores a doc batch per call via
    one vectorized searchsorted lookup."""

    def __init__(self, model_ref):
        import ray

        self.grams, self.counts = ray.get(model_ref)
        self.hash_memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        n_out: list[int] = []
        fam_out: list[int] = []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            counts = _doc_pair_counts(text, self.hash_memo)
            if not counts:
                continue
            g = np.fromiter(counts.keys(), dtype=np.int64, count=len(counts))
            m = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
            idx = np.minimum(np.searchsorted(self.grams, g), len(self.grams) - 1)
            if not (self.grams[idx] == g).all():
                # the model is fitted on the same corpus, so every doc
                # pair must be present — a miss means the caller scored
                # against a foreign/stale model
                raise ValueError("bigram missing from broadcast model")
            c = self.counts[idx]
            ids_out.append(doc_id)
            n_out.append(int(m.sum()))
            fam_out.append(int((m * c).sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "n_pairs": pa.array(n_out, pa.int64()),
                "familiarity": pa.array(fam_out, pa.int64()),
            }
        )


def bigram_familiarity(docs, broadcast_threshold: int = 2_000_000):
    """(doc_id, n_pairs, familiarity): familiarity = Σ corpus count of
    each adjacent token pair; docs with fewer than 2 tokens emit no
    pairs and are absent (matches the SQL join semantics)."""
    import ray
    from ray.data.aggregate import Sum

    pairs = docs.map_batches(_pair_rows, batch_format="pyarrow")
    model = (
        pairs.groupby("gram")
        .aggregate(Sum("m", alias_name="c"))
        .materialize()  # built once; consumed by count + one of two plans
    )
    if model.count() <= broadcast_threshold:
        batches = [
            b for b in model.iter_batches(batch_format="pyarrow") if b.num_rows
        ]
        tbl = (
            pa.concat_tables(batches).combine_chunks()
            if batches
            else pa.schema([("gram", pa.int64()), ("c", pa.int64())]).empty_table()
        )
        grams = tbl.column("gram").to_numpy(zero_copy_only=False)
        counts = tbl.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(grams)
        model_ref = ray.put((grams[order], np.ascontiguousarray(counts[order])))
        return docs.map_batches(
            _BroadcastScorer,
            fn_constructor_args=(model_ref,),
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
    return _bigram_familiarity_join(docs, model)


def _bigram_familiarity_join(docs, model):
    """Join plan for models past the broadcast budget: hash-partitioned
    big-big join of pair rows against the model, keyed per-doc sums."""
    from ray.data.aggregate import Sum

    from ocr_ray.ops.joins import large_join

    joined = large_join(
        docs.map_batches(_pair_rows, batch_format="pyarrow"),
        model.select_columns(["gram", "c"]),
        on="gram",
    )

    def partials(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m = t["m"].to_numpy(zero_copy_only=False)
        cs = t["c"].to_numpy(zero_copy_only=False)
        ids_u, inv = np.unique(ids, return_inverse=True)
        # integer accumulation (float bincount weights lose exactness
        # past 2^53 — reachable for corpus-scale m·c products)
        n_pairs = np.zeros(len(ids_u), dtype=np.int64)
        fam = np.zeros(len(ids_u), dtype=np.int64)
        np.add.at(n_pairs, inv, m.astype(np.int64))
        np.add.at(fam, inv, m.astype(np.int64) * cs.astype(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(ids_u, pa.int64()),
                "n_pairs": pa.array(n_pairs, pa.int64()),
                "familiarity": pa.array(fam, pa.int64()),
            }
        )

    return (
        joined.map_batches(partials, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_pairs", alias_name="n_pairs"),
            Sum("familiarity", alias_name="familiarity"),
        )
    )


# ------------------------------------------------- collocation mining

_COLLOC_PARTIAL_SCHEMA = pa.schema(
    [("w1", pa.string()), ("w2", pa.string()), ("m", pa.int64())]
)


def _colloc_partials(batch: pa.Table) -> pa.Table:
    """ONE tokenization scan emitting both count families as weighted
    rows: bigram multiplicities (w1, w2, m) and unigram multiplicities
    as (w1=w, w2="", m) — the empty-string sentinel can never collide
    with a real token (the word regex requires ≥3 chars), and it lets a
    SINGLE keyed sum aggregate both families in one shuffle. The words
    themselves are the output payload here (unlike _pair_rows), so no
    hash compression applies; duplicates within the batch still
    collapse to one weighted row each."""
    from collections import Counter

    bi: Counter = Counter()
    uni: Counter = Counter()
    for text in batch.column("text").to_pylist():
        ws = _WORD_RE.findall((text or "").lower())
        uni.update(ws)
        for i in range(len(ws) - 1):
            bi[(ws[i], ws[i + 1])] += 1
    if not bi and not uni:
        return _COLLOC_PARTIAL_SCHEMA.empty_table()
    bkeys = list(bi.keys())
    ukeys = list(uni.keys())
    return pa.table(
        {
            "w1": pa.array(
                [k[0] for k in bkeys] + ukeys, pa.string()
            ),
            "w2": pa.array(
                [k[1] for k in bkeys] + [""] * len(ukeys), pa.string()
            ),
            "m": pa.array(
                [bi[k] for k in bkeys] + [uni[k] for k in ukeys],
                pa.int64(),
            ),
        }
    )


def collocation_pairs(docs, min_count: int = 3, lift: int = 1,
                      broadcast_threshold: int = 2_000_000):
    """Collocation mining: adjacent word pairs whose observed corpus
    count meets ``min_count`` AND beats independence by factor ``lift``
    — the positive-PMI test done in EXACT integer arithmetic,
    c_ab · N ≥ lift · c_a · c_b (N = total bigram tokens), so the
    boundary decision is bit-identical across engines (a float
    PMI = log(c_ab·N / (c_a·c_b)) ranking would hit libm drift).
    Returns (w1, w2, c_ab, c_a, c_b).

    Scale shape: ONE tokenization scan emits both count families as
    weighted rows (unigrams under the "" sentinel w2) and ONE keyed sum
    aggregates them together; the slim result splits into the bigram
    and vocabulary tables. The vocabulary (sublinear in corpus size)
    broadcasts once via ray.put when it fits ``broadcast_threshold``,
    so attaching c_a/c_b to the bigram rows is map-side — else two
    hash-partitioned joins (same dual-plan shape as
    bigram_familiarity). N is a driver scalar off the materialized
    aggregate. int64 overflow of c_ab·N is guarded loudly."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from ocr_ray.ops.dedup import _with_schema

    agg_schema = pa.schema(
        [("w1", pa.string()), ("w2", pa.string()), ("c", pa.int64())]
    )
    agg = _with_schema(
        _with_schema(
            docs.map_batches(_colloc_partials, batch_format="pyarrow"),
            _COLLOC_PARTIAL_SCHEMA,
        )
        .groupby(["w1", "w2"])
        .aggregate(Sum("m", alias_name="c")),
        agg_schema,
    ).materialize()

    def bigrams(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["w2"], ""))
        return t.rename_columns(["w1", "w2", "c_ab"])

    def unigrams(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["w2"], ""))
        return pa.table({"w": t["w1"], "c": t["c"]})

    cab = agg.map_batches(bigrams, batch_format="pyarrow")
    uni = agg.map_batches(unigrams, batch_format="pyarrow")
    total = cab.sum("c_ab") or 0
    if uni.count() > broadcast_threshold:
        return _collocation_join(cab, uni, min_count, lift, total)

    batches = [
        b for b in uni.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    tbl = (
        pa.concat_tables(batches).combine_chunks()
        if batches
        else pa.schema([("w", pa.string()), ("c", pa.int64())]).empty_table()
    )
    lut = dict(
        zip(tbl.column("w").to_pylist(),
            tbl.column("c").to_numpy(zero_copy_only=False).tolist())
    )
    lut_ref = ray.put(lut)

    def attach_filter(t: pa.Table, _ref=lut_ref) -> pa.Table:
        empty = pa.schema(
            [
                ("w1", pa.string()),
                ("w2", pa.string()),
                ("c_ab", pa.int64()),
                ("c_a", pa.int64()),
                ("c_b", pa.int64()),
            ]
        ).empty_table()
        if t.num_rows == 0 or "w1" not in t.column_names:
            return empty
        m = ray.get(_ref)
        c_ab = t.column("c_ab").to_numpy(zero_copy_only=False)
        c_a = np.array(
            [m[w] for w in t.column("w1").to_pylist()], np.int64
        )
        c_b = np.array(
            [m[w] for w in t.column("w2").to_pylist()], np.int64
        )
        if c_ab.size and (
            int(c_ab.max()) * total >= 2 ** 62
            or lift * int(c_a.max()) * int(c_b.max()) >= 2 ** 62
        ):
            raise OverflowError(
                "collocation lift test would overflow int64; corpus too "
                "large for the integer fast test — widen to Python-int "
                "or HUGEINT arithmetic"
            )
        keep = (c_ab >= min_count) & (
            c_ab * total >= lift * c_a * c_b
        )
        mask = pa.array(keep)
        return pa.table(
            {
                "w1": t.column("w1").filter(mask),
                "w2": t.column("w2").filter(mask),
                "c_ab": t.column("c_ab").filter(mask).cast(pa.int64()),
                "c_a": pa.array(c_a[keep], pa.int64()),
                "c_b": pa.array(c_b[keep], pa.int64()),
            }
        )

    return cab.map_batches(attach_filter, batch_format="pyarrow")


def _collocation_join(cab, uni, min_count: int, lift: int, total: int):
    """Vocabulary past the broadcast budget: two hash-partitioned joins
    attach c_a and c_b, then the same map-side integer filter."""
    from ocr_ray.ops.joins import large_join

    j = large_join(cab, _rename_uni(uni, "w1", "c_a"), on="w1")
    j = large_join(j, _rename_uni(uni, "w2", "c_b"), on="w2")

    def filt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "w1" not in t.column_names:
            return pa.schema(
                [
                    ("w1", pa.string()),
                    ("w2", pa.string()),
                    ("c_ab", pa.int64()),
                    ("c_a", pa.int64()),
                    ("c_b", pa.int64()),
                ]
            ).empty_table()
        c_ab = t.column("c_ab").to_numpy(zero_copy_only=False)
        c_a = t.column("c_a").to_numpy(zero_copy_only=False)
        c_b = t.column("c_b").to_numpy(zero_copy_only=False)
        if c_ab.size and (
            int(c_ab.max()) * total >= 2 ** 62
            or lift * int(c_a.max()) * int(c_b.max()) >= 2 ** 62
        ):
            raise OverflowError("collocation lift test would overflow")
        keep = pa.array(
            (c_ab >= min_count) & (c_ab * total >= lift * c_a * c_b)
        )
        return t.select(["w1", "w2", "c_ab", "c_a", "c_b"]).filter(keep)

    return j.map_batches(filt, batch_format="pyarrow")


def _rename_uni(uni, key: str, val: str):
    def apply(t: pa.Table) -> pa.Table:
        return t.rename_columns([key, val])

    return uni.select_columns(["w", "c"]).map_batches(
        apply, batch_format="pyarrow"
    )


def collocation_sql(min_count: int = 3, lift: int = 1) -> str:
    """DuckDB replay of :func:`collocation_pairs` over the documents
    view: positions via generate_subscripts, adjacency by i+1 self
    join, the same integer lift test."""
    return (
        "WITH t AS MATERIALIZED (SELECT doc_id,"
        " regexp_extract_all(lower(text), '[a-zA-Z]{3,}') AS ws"
        " FROM documents),\n"
        "pos AS MATERIALIZED (SELECT doc_id, unnest(ws) AS w,"
        " generate_subscripts(ws, 1) AS i FROM t),\n"
        "uni AS (SELECT w, COUNT(*) AS c FROM pos GROUP BY w),\n"
        "bi AS (SELECT a.w AS w1, b.w AS w2 FROM pos a JOIN pos b"
        " ON a.doc_id = b.doc_id AND b.i = a.i + 1),\n"
        "cab AS (SELECT w1, w2, COUNT(*) AS c_ab FROM bi GROUP BY 1, 2),\n"
        "n AS (SELECT COUNT(*) AS total FROM bi)\n"
        "SELECT w1, w2, c_ab, ua.c AS c_a, ub.c AS c_b\n"
        "FROM cab, n, uni ua, uni ub\n"
        "WHERE ua.w = cab.w1 AND ub.w = cab.w2\n"
        f" AND c_ab >= {min_count}"
        f" AND c_ab * n.total >= {lift} * ua.c * ub.c"
    )


def bigram_logprob(docs, scale: int = 1_000_000):
    """Per-document conditional bigram LM score against the corpus's own
    bigram table: Σ over adjacent word pairs of qlog(c(w₁w₂)/c(w₁·)),
    with c(w₁·) the context count (bigrams starting with w₁) — the
    fluency companion to ``unigram_logprob`` (same quantized-log
    determinism: each log floors to an integer ×scale, the corpus-wide
    sum is exact int64, the per-doc average is the one shared IEEE
    float).

    Scale shape: slim (doc_id, w₁, w₂, m) rows (within-doc multiplicity
    compressed) hash-partition by CONTEXT w₁ — both the context count
    (run segment-sum) and the pair count (sub-run segment-sum over the
    w₂-sorted run) resolve inside one block with reduceat, no
    count-table join; per-doc partials pre-combine in-block before the
    final (doc)-keyed sum. Two shuffles of derived rows total.

    Output: (doc_id, n_bigrams, qlogprob, avg_logprob); docs with fewer
    than two words emit no row."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ocr_ray.stages.grouped import grouped_map

    row_schema = pa.schema(
        [("doc_id", pa.int64()), ("w1", pa.string()),
         ("w2", pa.string()), ("m", pa.int64())]
    )

    def pair_rows(batch: pa.Table) -> pa.Table:
        ids, w1s, w2s, ms = [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            ws = _WORD_RE.findall((text or "").lower())
            counts: Counter = Counter(zip(ws, ws[1:]))
            for (a, b), m in sorted(counts.items()):
                ids.append(doc_id)
                w1s.append(a)
                w2s.append(b)
                ms.append(m)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "w1": pa.array(w1s, pa.string()),
                "w2": pa.array(w2s, pa.string()),
                "m": pa.array(ms, pa.int64()),
            }
        )

    part_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
         ("qsum", pa.int64())]
    )

    def score_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n == 0 or len(starts) == 0:
            return part_schema.empty_table()
        m = block.column("m").to_numpy(zero_copy_only=False)
        ends = np.append(starts[1:], n)
        # context counts: Σm over each w1 run
        cc = np.repeat(np.add.reduceat(m, starts), ends - starts)
        # pair counts: Σm over each (w1, w2) sub-run of the sorted block
        w2 = block.column("w2")
        if isinstance(w2, pa.ChunkedArray):
            w2 = w2.combine_chunks()
        codes = pc.dictionary_encode(w2).indices.to_numpy(
            zero_copy_only=False
        )
        sub = np.zeros(n, bool)
        sub[starts] = True
        np.logical_or(sub[1:], codes[1:] != codes[:-1], out=sub[1:])
        sub_starts = np.flatnonzero(sub)
        sub_ends = np.append(sub_starts[1:], n)
        cp = np.repeat(
            np.add.reduceat(m, sub_starts), sub_ends - sub_starts
        )
        q = np.floor(
            np.log(cp.astype(np.float64) / cc.astype(np.float64)) * scale
        ).astype(np.int64)
        g = (
            pa.table(
                {
                    "doc_id": block.column("doc_id").cast(pa.int64()),
                    "n_bigrams": pa.array(m, pa.int64()),
                    "qsum": pa.array(m * q, pa.int64()),
                }
            )
            .group_by("doc_id")
            .aggregate([("n_bigrams", "sum"), ("qsum", "sum")])
        )
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "n_bigrams": g["n_bigrams_sum"].cast(pa.int64()),
                "qsum": g["qsum_sum"].cast(pa.int64()),
            }
        )

    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        pair_rows, batch_format="pyarrow"
    )
    agg = (
        grouped_map(rows, ["w1"], score_block, sort_within=["w2"])
        .groupby("doc_id")
        .aggregate(
            Sum("n_bigrams", alias_name="n_bigrams"),
            Sum("qsum", alias_name="qlogprob"),
        )
    )

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
         ("qlogprob", pa.int64()), ("avg_logprob", pa.float64())]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        nb = t["n_bigrams"].cast(pa.int64())
        qs = t["qlogprob"].cast(pa.int64())
        avg = (
            qs.to_numpy(zero_copy_only=False).astype(np.float64)
            / nb.to_numpy(zero_copy_only=False).astype(np.float64)
            / float(scale)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_bigrams": nb,
                "qlogprob": qs,
                "avg_logprob": pa.array(avg, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
