"""Sliding-window document chunking — the standard prep step for LLM
training/embedding: split each document into overlapping fixed-size
token windows.

Semantics (shared verbatim with the DuckDB oracle): tokens are the
``\\S+`` runs of the raw text; windows start at multiples of ``stride``
below the token count and span ``chunk_tokens`` tokens (the last window
may be shorter); the chunk text is the window joined with single
spaces; zero-token documents emit no chunks.

Scale design: a stateless ``flat_map``-shaped ``map_batches`` stage —
each input block expands independently (no shuffle), so output blocks
stay bounded by ``batch_size × chunks_per_doc`` and stream straight
into the next stage or sink.
"""
from __future__ import annotations

import functools

import pyarrow as pa

DEFAULT_CHUNK_TOKENS = 64
DEFAULT_STRIDE = 32


def _chunk_batch(
    batch: pa.Table, *, chunk_tokens: int, stride: int
) -> pa.Table:
    out_id, out_idx, out_text, out_n = [], [], [], []
    ids = batch.column("doc_id").to_pylist()
    for doc_id, text in zip(ids, batch.column("text").to_pylist()):
        toks = (text or "").split()
        n = len(toks)
        for idx, start in enumerate(range(0, n, stride)):
            window = toks[start:start + chunk_tokens]
            out_id.append(doc_id)
            out_idx.append(idx)
            out_text.append(" ".join(window))
            out_n.append(len(window))
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "chunk_idx": pa.array(out_idx, pa.int64()),
            "chunk_text": pa.array(out_text, pa.string()),
            "n_tokens": pa.array(out_n, pa.int64()),
        }
    )


def chunk_documents(
    docs,
    *,
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
    stride: int = DEFAULT_STRIDE,
):
    """(doc_id, text) → one row per sliding window:
    (doc_id, chunk_idx, chunk_text, n_tokens)."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    return docs.map_batches(
        functools.partial(
            _chunk_batch, chunk_tokens=chunk_tokens, stride=stride
        ),
        batch_format="pyarrow",
    )


def oracle_sql(
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS, stride: int = DEFAULT_STRIDE
) -> str:
    """DuckDB equivalent: list-slice the \\S+ token array at the same
    window starts (1-based inclusive slices)."""
    return (
        "WITH toks AS (\n"
        " SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\\S+') AS t\n"
        " FROM documents\n"
        "), starts AS (\n"
        f" SELECT doc_id, t, unnest(range(0, len(t), {stride})) AS start\n"
        " FROM toks WHERE len(t) > 0\n"
        ")\n"
        "SELECT doc_id,\n"
        f" CAST(start / {stride} AS BIGINT) AS chunk_idx,\n"
        f" array_to_string(t[start + 1 : LEAST(start + {chunk_tokens}, len(t))], ' ') AS chunk_text,\n"
        f" CAST(LEAST(start + {chunk_tokens}, len(t)) - start AS BIGINT) AS n_tokens\n"
        "FROM starts"
    )


# --------------------------------------------------- sequence packing

DEFAULT_SEQ_LEN = 512
DEFAULT_BUCKET_WIDTH = 65536


def pack_sequences(
    docs,
    *,
    seq_len: int = DEFAULT_SEQ_LEN,
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
):
    """Greedy concat-and-split sequence packing: documents are laid out
    in doc_id order as one token stream and cut into training sequences
    of ``seq_len`` tokens; each document reports the first and last
    sequence index it lands in. Equivalent to the window cumsum
    ``SUM(n_tokens) OVER (ORDER BY doc_id)`` — but computed as a
    DISTRIBUTED ordered prefix sum, no global sort:

    - pass 1 collapses each batch to slim (doc_id, n_tokens) rows and a
      range bucket ``doc_id // bucket_width``;
    - a tiny keyed aggregate yields per-bucket token totals; the
      driver cumsums them into per-bucket base offsets (bounded:
      one int64 pair per bucket — size ``bucket_width`` so
      n_docs / bucket_width stays driver-small, e.g. 1e6 buckets = 16 MB
      at 1e12 docs / width 1e6) and ``ray.put``s the lookup once;
    - pass 2 hash-partitions the slim rows by bucket and runs one
      vectorized in-block cumsum per bucket group (segment-base
      subtraction), adding the broadcast base offset.

    Documents themselves never shuffle; both passes move only integer
    triples. Zero-token documents are dropped (they occupy no
    sequence), matching the oracle's WHERE."""
    import numpy as np
    import ray

    from ocr_ray.stages.grouped import grouped_map

    if seq_len <= 0 or bucket_width <= 0:
        raise ValueError("seq_len and bucket_width must be positive")

    tok_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
        ]
    )
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("seq_first", pa.int64()),
            ("seq_last", pa.int64()),
        ]
    )

    def counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return tok_schema.empty_table()
        import pyarrow.compute as pc

        ids = t.column("doc_id").cast(pa.int64())
        # vectorized \S+ run count — verified identical to DuckDB's
        # len(regexp_extract_all(text, '\S+')) incl. unicode and nulls
        n = pc.count_substring_regex(
            pc.coalesce(t.column("text"), pa.scalar("")), pattern=r"\S+"
        ).cast(pa.int64())
        return pa.table(
            {
                "bucket": pc.divide(ids, pa.scalar(bucket_width, pa.int64())),
                "doc_id": ids,
                "n_tokens": n,
            }
        )

    from ocr_ray.ops.dedup import _with_schema

    tok = _with_schema(
        docs.map_batches(counts, batch_format="pyarrow"), tok_schema
    ).materialize()

    from ray.data.aggregate import Sum

    totals = (
        tok.groupby("bucket").aggregate(Sum("n_tokens", alias_name="s"))
    ).take_all()  # bounded: one row per bucket
    totals.sort(key=lambda r: r["bucket"])
    offsets: dict[int, int] = {}
    acc = 0
    for r in totals:
        offsets[r["bucket"]] = acc
        acc += r["s"]
    offsets_ref = ray.put(offsets)

    def pack_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n_rows = block.num_rows
        if n_rows == 0 or len(starts) == 0:
            return out_schema.empty_table()
        base = ray.get(offsets_ref)
        nt = block.column("n_tokens").to_numpy(zero_copy_only=False)
        bk = block.column("bucket").to_numpy(zero_copy_only=False)
        sizes = np.diff(np.append(starts, n_rows))
        cum = np.cumsum(nt) - nt  # exclusive prefix within the block
        seg_base = cum[starts]  # subtract each bucket group's base
        prefix = cum - np.repeat(seg_base, sizes)
        prefix += np.repeat(
            np.array([base[int(b)] for b in bk[starts]], np.int64), sizes
        )
        keep = nt > 0
        first = prefix[keep] // seq_len
        last = (prefix[keep] + nt[keep] - 1) // seq_len
        return pa.table(
            {
                "doc_id": pa.array(
                    block.column("doc_id").to_numpy(zero_copy_only=False)[
                        keep
                    ],
                    pa.int64(),
                ),
                "n_tokens": pa.array(nt[keep], pa.int64()),
                "seq_first": pa.array(first, pa.int64()),
                "seq_last": pa.array(last, pa.int64()),
            }
        )

    return grouped_map(tok, ["bucket"], pack_block, sort_within=["doc_id"])


def pack_oracle_sql(seq_len: int = DEFAULT_SEQ_LEN) -> str:
    """DuckDB equivalent: the global ordered window cumsum and the same
    integer floor divisions."""
    return (
        "WITH t AS (\n"
        " SELECT doc_id,"
        " CAST(len(regexp_extract_all(COALESCE(text, ''), '\\S+'))"
        " AS BIGINT) AS n_tokens\n"
        " FROM documents\n"
        "), c AS (\n"
        " SELECT doc_id, n_tokens,\n"
        "  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id\n"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        " AS BIGINT) AS prefix\n"
        " FROM t\n"
        ")\n"
        "SELECT doc_id, n_tokens,\n"
        f" prefix // {seq_len} AS seq_first,\n"
        f" (prefix + n_tokens - 1) // {seq_len} AS seq_last\n"
        "FROM c WHERE n_tokens > 0"
    )


DEFAULT_SWEEP_SEQ_LENS = (256, 512, 1024, 2048)


def packing_efficiency_sweep(docs, seq_lens=DEFAULT_SWEEP_SEQ_LENS):
    """Sequence-length planning table: for each candidate ``seq_len``,
    the cost of the two standard packing strategies over THIS corpus —
    per-document padding (every doc padded up to its own
    ``ceil(tokens/L)`` sequences; no cross-doc attention contamination,
    pays padding waste) versus greedy concat-and-split (zero padding
    except the final sequence; documents cross boundaries). The
    padding-waste-vs-seq-len curve is what picks L before a 100 TB
    tokenization run.

    Scale shape: stateless map-side integer partials (one row per
    seq_len per batch), one tiny keyed sum — the sweep rides a single
    token-count scan regardless of ``len(seq_lens)``.

    Output per seq_len: (seq_len, n_docs, total_tokens, n_seqs_padded,
    waste_padded, n_seqs_packed, waste_packed), zero-token documents
    excluded (they occupy no sequence under either strategy)."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ocr_ray.ops.dedup import _with_schema

    lens = [int(x) for x in seq_lens]
    part_schema = pa.schema(
        [
            ("seq_len", pa.int64()),
            ("n_docs", pa.int64()),
            ("total_tokens", pa.int64()),
            ("n_seqs_padded", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.column_names:
            return part_schema.empty_table()
        n = (
            pc.count_substring_regex(
                pc.coalesce(t.column("text"), pa.scalar("")), pattern=r"\S+"
            )
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        n = n[n > 0]
        rows_l, rows_d, rows_t, rows_p = [], [], [], []
        for L in lens:
            rows_l.append(L)
            rows_d.append(len(n))
            rows_t.append(int(n.sum()))
            rows_p.append(int(((n + L - 1) // L).sum()))
        return pa.table(
            {
                "seq_len": pa.array(rows_l, pa.int64()),
                "n_docs": pa.array(rows_d, pa.int64()),
                "total_tokens": pa.array(rows_t, pa.int64()),
                "n_seqs_padded": pa.array(rows_p, pa.int64()),
            }
        )

    rows = (
        _with_schema(
            docs.map_batches(partials, batch_format="pyarrow"), part_schema
        )
        .groupby("seq_len")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_tokens", alias_name="total_tokens"),
            Sum("n_seqs_padded", alias_name="n_seqs_padded"),
        )
    ).take_all()  # bounded: len(seq_lens) rows
    rows.sort(key=lambda r: int(r["seq_len"]))
    out = {
        "seq_len": [], "n_docs": [], "total_tokens": [],
        "n_seqs_padded": [], "waste_padded": [],
        "n_seqs_packed": [], "waste_packed": [],
    }
    for r in rows:
        L = int(r["seq_len"])
        tot = int(r["total_tokens"])
        pad = int(r["n_seqs_padded"])
        packed = (tot + L - 1) // L
        out["seq_len"].append(L)
        out["n_docs"].append(int(r["n_docs"]))
        out["total_tokens"].append(tot)
        out["n_seqs_padded"].append(pad)
        out["waste_padded"].append(pad * L - tot)
        out["n_seqs_packed"].append(packed)
        out["waste_packed"].append(packed * L - tot)
    return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


def packing_efficiency_sql(seq_lens=DEFAULT_SWEEP_SEQ_LENS) -> str:
    values = ", ".join(f"({int(x)})" for x in seq_lens)
    return (
        "WITH t AS (\n"
        " SELECT CAST(len(regexp_extract_all(COALESCE(text, ''),"
        " '\\S+')) AS BIGINT) AS n\n"
        " FROM documents\n"
        "), nz AS (SELECT n FROM t WHERE n > 0),\n"
        f"ls(seq_len) AS (VALUES {values}),\n"
        "a AS (\n"
        " SELECT seq_len, CAST(COUNT(*) AS BIGINT) AS n_docs,\n"
        "  CAST(SUM(n) AS BIGINT) AS total_tokens,\n"
        "  CAST(SUM((n + seq_len - 1) // seq_len) AS BIGINT)"
        " AS n_seqs_padded\n"
        " FROM nz CROSS JOIN ls GROUP BY seq_len\n"
        ")\n"
        "SELECT CAST(seq_len AS BIGINT) AS seq_len, n_docs,"
        " total_tokens, n_seqs_padded,\n"
        " CAST(n_seqs_padded * seq_len - total_tokens AS BIGINT)"
        " AS waste_padded,\n"
        " CAST((total_tokens + seq_len - 1) // seq_len AS BIGINT)"
        " AS n_seqs_packed,\n"
        " CAST(((total_tokens + seq_len - 1) // seq_len) * seq_len"
        " - total_tokens AS BIGINT) AS waste_packed\n"
        "FROM a"
    )
