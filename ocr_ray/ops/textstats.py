"""Generic text-quality heuristics for training-data curation — the
length / punctuation / stopword / case ratios family, plus a BPE-ish
regex tokenizer count and winnowing rolling-hash fingerprints.

These complement the reference's composite OCR quality score
(kernels/scoring.py): that one scores OCR fidelity against the kamus;
these score generic corpus quality the way large-scale pipeline filters
(C4/Gopher-style) do. All vectorizable per batch; ratios are plain
float64 divisions with a fixed operand order so the DuckDB oracles match
bit-for-bit.
"""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ocr_ray.ops.analysis import STOP_EN, STOP_ID

_WORD_RE = re.compile(r"[a-zA-Z]{3,}")
_PUNCT_RE = re.compile(r"[^\w\s]")
_UPPER_RE = re.compile(r"[A-Z]")
_ALPHA_RE = re.compile(r"[a-zA-Z]")
# BPE-ish pretokenizer, RE2-compatible (no lookahead/backrefs) so the
# same pattern runs in DuckDB: common English contraction suffixes,
# space-prefixed letter runs, digit runs, symbol runs, whitespace runs
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"
_BPE_RE = re.compile(BPE_ISH_PATTERN)


def quality_heuristics_batch(batch: pa.Table) -> pa.Table:
    stops = set(STOP_EN) | set(STOP_ID)
    n_chars, n_words, punct, upper, alpha, stop_hits, wordlen = [], [], [], [], [], [], []
    for text in batch.column("text").to_pylist():
        t = text or ""
        words = _WORD_RE.findall(t.lower())
        n_chars.append(len(t))
        n_words.append(len(words))
        punct.append(len(_PUNCT_RE.findall(t)))
        upper.append(len(_UPPER_RE.findall(t)))
        alpha.append(len(_ALPHA_RE.findall(t)))
        stop_hits.append(sum(1 for w in words if w in stops))
        wordlen.append(sum(len(w) for w in words))

    n_chars = np.array(n_chars, dtype=np.float64)
    n_words_a = np.array(n_words, dtype=np.float64)
    safe_chars = np.maximum(n_chars, 1.0)
    safe_words = np.maximum(n_words_a, 1.0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(n_chars.astype(np.int64), pa.int64()),
            "n_words": pa.array(n_words_a.astype(np.int64), pa.int64()),
            "punct_ratio": pa.array(np.array(punct) / safe_chars, pa.float64()),
            "upper_ratio": pa.array(np.array(upper) / np.maximum(alpha, 1), pa.float64()),
            "stopword_ratio": pa.array(np.array(stop_hits) / safe_words, pa.float64()),
            "mean_word_len": pa.array(np.array(wordlen) / safe_words, pa.float64()),
        }
    )


def quality_heuristics(docs):
    return docs.map_batches(quality_heuristics_batch, batch_format="pyarrow")


def bpe_token_counts_batch(batch: pa.Table) -> pa.Table:
    counts = [
        len(_BPE_RE.findall(t or "")) for t in batch.column("text").to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_bpe_tokens": pa.array(counts, pa.int64()),
        }
    )


def bpe_token_counts(docs):
    """Whitespace + BPE-ish regex token counts (pattern shared verbatim
    with the DuckDB oracle)."""
    return docs.map_batches(bpe_token_counts_batch, batch_format="pyarrow")


# ------------------------------------------------- repetition stats


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style intra-document repetition signals, vectorized across
    the whole batch: one pyarrow regex split produces the token lists,
    then token factorization (np.unique) + integer-keyed (doc, token)
    and (doc, bigram) count reductions + unbuffered segment max
    (np.maximum.at) compute every per-doc statistic with zero per-row
    Python dispatch. Fractions are single IEEE divisions of exact
    integers in the same operand order as the DuckDB oracle, so values
    match bit-for-bit.
    """
    n = batch.num_rows
    col = batch.column("text")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lst = pc.split_pattern_regex(pc.utf8_lower(col), pattern="[^a-z0-9]+")
    lengths = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths.astype(np.float64)).astype(np.int64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
    vals = np.asarray(lst.flatten().to_pylist(), dtype=object)
    keep = vals != ""  # regex split emits empty edge pieces; drop them
    vals, doc_idx = vals[keep], doc_idx[keep]

    n_words = np.bincount(doc_idx, minlength=n).astype(np.int64)
    top_c = np.zeros(n, dtype=np.int64)
    top_bc = np.zeros(n, dtype=np.int64)
    n_distinct = np.zeros(n, dtype=np.int64)
    n_bigrams = np.zeros(n, dtype=np.int64)
    if len(vals):
        uniq, inv = np.unique(vals, return_inverse=True)
        U = np.int64(len(uniq))
        key = doc_idx * U + inv
        uk, uc = np.unique(key, return_counts=True)
        pair_doc = uk // U
        n_distinct = np.bincount(pair_doc, minlength=n).astype(np.int64)
        np.maximum.at(top_c, pair_doc, uc)

        adj = doc_idx[1:] == doc_idx[:-1]  # split preserves doc order
        bdoc = doc_idx[:-1][adj]
        n_bigrams = np.bincount(bdoc, minlength=n).astype(np.int64)
        if len(bdoc):
            t1, t2 = inv[:-1][adj], inv[1:][adj]
            if int(n) * int(U) * int(U) < (1 << 62):
                bkey = (bdoc * U + t1) * U + t2
                buk, buc = np.unique(bkey, return_counts=True)
                bpair_doc = buk // (U * U)
            else:  # giant-vocabulary batch: key would overflow int64
                buk, buc = np.unique(
                    np.stack([bdoc, t1, t2], axis=1), axis=0, return_counts=True
                )
                bpair_doc = buk[:, 0]
            np.maximum.at(top_bc, bpair_doc, buc)

    safe_w = np.maximum(n_words, 1).astype(np.float64)
    safe_b = np.maximum(n_bigrams, 1).astype(np.float64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "n_distinct_words": pa.array(n_distinct, pa.int64()),
            "top_word_count": pa.array(top_c, pa.int64()),
            "top_word_frac": pa.array(top_c.astype(np.float64) / safe_w, pa.float64()),
            "top_bigram_count": pa.array(top_bc, pa.int64()),
            "top_bigram_frac": pa.array(top_bc.astype(np.float64) / safe_b, pa.float64()),
            "dup_word_frac": pa.array(
                1.0 - (n_distinct.astype(np.float64) / safe_w), pa.float64()
            ),
        }
    )


def repetition_stats(docs):
    """Per-document repetition quality signals (Rae et al. Gopher
    curation family): total/distinct word counts, most-frequent word
    and bigram mass fractions, duplicate-word fraction. Stateless
    per-batch map — no shuffle, streams at any scale."""
    return docs.map_batches(repetition_stats_batch, batch_format="pyarrow")


# ------------------------------------------------- winnowing fingerprints


def rolling_hashes(text: str, k: int = 7, base: int = 257,
                   mod: int = (1 << 61) - 1) -> np.ndarray:
    """Polynomial rolling hash of every k-gram of the normalized text."""
    data = [ord(c) for c in " ".join((text or "").lower().split())]
    n = len(data)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(n - k + 1, dtype=np.uint64)
    h = 0
    power = pow(base, k - 1, mod)
    for i, c in enumerate(data[:k]):
        h = (h * base + c) % mod
    out[0] = h
    for i in range(k, n):
        h = ((h - data[i - k] * power) * base + data[i]) % mod
        out[i - k + 1] = h
    return out


def winnow_fingerprints(text: str, k: int = 7, window: int = 8) -> list[int]:
    """Winnowing (Schleimer et al.): the minimum hash of every
    ``window``-sized run of k-gram hashes, deduplicated in order —
    a compact position-robust document fingerprint set."""
    hashes = rolling_hashes(text, k)
    if len(hashes) == 0:
        return []
    if len(hashes) <= window:
        return [int(hashes.min())]
    idx = np.arange(len(hashes) - window + 1)
    windows = np.lib.stride_tricks.sliding_window_view(hashes, window)
    mins = windows.min(axis=1)
    out, last = [], None
    for m in mins:
        if m != last:
            out.append(int(m))
            last = m
    return out


def _winnow_batch(batch: pa.Table) -> pa.Table:
    fps = [winnow_fingerprints(t) for t in batch.column("text").to_pylist()]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprints": pa.array(fps, pa.list_(pa.uint64())),
            "n_fingerprints": pa.array([len(f) for f in fps], pa.int64()),
        }
    )


def winnowing_fingerprints(docs):
    return docs.map_batches(_winnow_batch, batch_format="pyarrow")


def _fp_rows(batch: pa.Table) -> pa.Table:
    """Distinct winnowing fingerprints per doc as slim (fp, doc_id,
    set_size) rows — the inverted-index input for overlap pairing."""
    fp_out: list[np.ndarray] = []
    id_out: list[np.ndarray] = []
    sz_out: list[np.ndarray] = []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(),
        batch.column("text").to_pylist(),
    ):
        fps = np.unique(
            np.array(winnow_fingerprints(text), dtype=np.int64)
        )
        if not fps.size:
            continue
        fp_out.append(fps)
        id_out.append(np.full(fps.size, doc_id, dtype=np.int64))
        sz_out.append(np.full(fps.size, fps.size, dtype=np.int64))
    if not fp_out:
        return pa.schema(
            [("fp", pa.int64()), ("doc_id", pa.int64()),
             ("set_size", pa.int64())]
        ).empty_table()
    return pa.table(
        {
            "fp": pa.array(np.concatenate(fp_out), pa.int64()),
            "doc_id": pa.array(np.concatenate(id_out), pa.int64()),
            "set_size": pa.array(np.concatenate(sz_out), pa.int64()),
        }
    )


def winnow_overlap_pairs(docs, min_shared: int = 8, max_df: int = 64):
    """MOSS-style near-copy detection (Schleimer et al. 2003): doc
    pairs sharing at least ``min_shared`` distinct winnowing
    fingerprints. The same distributed inverted-index join as
    ngram_jaccard_pairs — explode distinct (fp, doc) rows, bucket by
    fingerprint, co-occurrence pairs, keyed pair count — with the
    stop-fingerprint guard: fingerprints in more than ``max_df`` docs
    are dropped whole before pairing (mirrored by the oracle's df
    filter; shared fps above the cap reduce the measured overlap, the
    documented underestimate semantics of the jaccard family). Returns
    (doc_a, doc_b, n_shared, size_a, size_b)."""
    import pyarrow.compute as pc

    from ocr_ray.ops.dedup import _cooccur_block_factory, _pair_sum_block
    from ocr_ray.stages.grouped import grouped_map

    rows = docs.map_batches(_fp_rows, batch_format="pyarrow")
    pairs = grouped_map(rows, ["fp"], _cooccur_block_factory(max_df))
    # grouped_map segment-sum, not the native hash aggregate — the
    # all-pairs candidate table is mostly singleton groups (see
    # ops/dedup.py:_ngram_cooccur_counts)
    counted = grouped_map(pairs, ["doc_a", "doc_b"], _pair_sum_block)

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return pa.schema(
                [
                    ("doc_a", pa.int64()),
                    ("doc_b", pa.int64()),
                    ("n_shared", pa.int64()),
                    ("size_a", pa.int64()),
                    ("size_b", pa.int64()),
                ]
            ).empty_table()
        t = t.rename_columns(
            ["n_shared" if c == "intersection" else c for c in t.column_names]
        )
        return t.select(
            ["doc_a", "doc_b", "n_shared", "size_a", "size_b"]
        ).filter(pc.greater_equal(t["n_shared"], min_shared))

    return counted.map_batches(keep, batch_format="pyarrow")


_CHAR_DIV_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_chars", pa.int64()),
        ("n_distinct", pa.int64()),
        ("sum_sq", pa.int64()),
    ]
)


def char_diversity_batch(batch: pa.Table) -> pa.Table:
    """Per-doc character-distribution profile: total codepoints, distinct
    codepoints, and the collision sum Σ count(c)² — the integer core of
    Simpson diversity / gini impurity (sum_sq/n² = char collision
    probability, a gibberish/repetition quality signal à la the
    Gopher-style repetition filters). All-integer outputs so the DuckDB
    oracle (string_split per char) matches bit-for-bit; empty docs emit
    no row in BOTH engines (string_split('','') yields [''], excluded
    by length(text) > 0).

    Vectorized: one pass over the batch's concatenated UTF-32 codepoints;
    per-(doc, char) counts via np.unique on composite int64 keys, then
    segment reductions — no per-row Python beyond the join of text
    offsets."""
    ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    texts = batch.column("text").to_pylist()
    lens = np.fromiter(
        (len(t) if t else 0 for t in texts), np.int64, len(texts)
    )
    joined = "".join(t for t in texts if t)
    if not joined:
        return _CHAR_DIV_SCHEMA.empty_table()
    cps = np.frombuffer(joined.encode("utf-32-le"), np.uint32).astype(
        np.int64
    )
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    keys = doc_idx * 0x110000 + cps
    uniq, counts = np.unique(keys, return_counts=True)
    owner = uniq // 0x110000
    starts = np.flatnonzero(np.r_[True, owner[1:] != owner[:-1]])
    return pa.table(
        {
            "doc_id": pa.array(ids[owner[starts]], pa.int64()),
            "n_chars": pa.array(np.add.reduceat(counts, starts), pa.int64()),
            "n_distinct": pa.array(
                np.diff(np.r_[starts, len(uniq)]), pa.int64()
            ),
            "sum_sq": pa.array(
                np.add.reduceat(counts * counts, starts), pa.int64()
            ),
        }
    )


def char_diversity(docs):
    """(doc_id, n_chars, n_distinct, sum_sq) per non-empty doc — pure
    stateless map_batches, zero shuffle (one output row per doc computed
    map-side); sorted by doc_id for a stable gate."""
    return docs.map_batches(
        char_diversity_batch, batch_format="pyarrow"
    ).sort("doc_id")


_ZIPF_SCALE = 1_000_000


def zipf_slope_by_lang(docs):
    """Per-language Zipf fit: OLS slope/intercept of ln(freq) on
    ln(rank) over the exact word-frequency table (rank 1 = most
    frequent, count DESC / word ASC tie-break — the same deterministic
    rank rule as ``top_terms_by_lang``).

    Cross-engine determinism: ln() outputs differ from DuckDB's by
    ~1 ulp, and float SUM order is engine-defined — both break a value
    hash. So each ln is quantized to an int64 (``floor(ln(k) ·
    _ZIPF_SCALE)``, verified bit-identical between numpy and DuckDB over
    the full 1..2M integer domain), the four moments accumulate as
    EXACT integers (Python ints engine-side, HUGEINT in SQL), and the
    closed-form slope/intercept are one shared IEEE expression over the
    moment casts. Scale shape: map-side (lang, word) count partials →
    one keyed sum of slim rows → one (lang)-partitioned block computes
    rank + moments vectorized (chunked int64 partial sums, converted
    exactly before they can overflow). A language's vocabulary is slim
    (word, n) rows — fine in one block up to ~1e8 distinct words; past
    that the rank would move to the range-partitioned NTILE machinery
    (ops/stats.py)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from ocr_ray.stages.grouped import grouped_map

    def partials(t: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        langs = t.column("lang").to_pylist()
        texts = t.column("text").to_pylist()
        for lang, text in zip(langs, texts):
            for w in _WORD_RE.findall((text or "").lower()):
                counts[(lang, w)] += 1
        if not counts:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "word": pa.array([], pa.string()),
                    "partial": pa.array([], pa.int64()),
                }
            )
        keys, vals = zip(*sorted(counts.items()))
        return pa.table(
            {
                "lang": pa.array([k[0] for k in keys], pa.string()),
                "word": pa.array([k[1] for k in keys], pa.string()),
                "partial": pa.array(vals, pa.int64()),
            }
        )

    counted = (
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby(["lang", "word"])
        .aggregate(Sum("partial", alias_name="n"))
    )

    out_schema = pa.schema(
        [
            ("lang", pa.string()),
            ("n_words", pa.int64()),
            ("zipf_slope", pa.float64()),
            ("zipf_intercept", pa.float64()),
        ]
    )

    def _exact_sum(a: np.ndarray) -> int:
        # int64 partial sums stay exact in 16k chunks (max |x·y| ≈ 2.9e14
        # per element → 4.7e18 per chunk < 2^63); chunk totals then
        # accumulate as Python ints (arbitrary precision)
        total = 0
        for i in range(0, len(a), 16384):
            total += int(a[i : i + 16384].sum())
        return total

    def slope_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n_rows = block.num_rows
        if n_rows == 0 or len(starts) == 0:
            return out_schema.empty_table()
        langs, slopes, intercepts, vocab = [], [], [], []
        bounds = np.append(starts, n_rows)
        for gi in range(len(starts)):
            sub = block.slice(bounds[gi], bounds[gi + 1] - bounds[gi])
            lang = sub.column("lang")[0].as_py()
            n = sub.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
            words = sub.column("word").to_numpy(zero_copy_only=False)
            order = np.lexsort((words, -n))
            n_sorted = n[order]
            v = len(n_sorted)
            rank = np.arange(1, v + 1, dtype=np.float64)
            x = np.floor(np.log(rank) * _ZIPF_SCALE).astype(np.int64)
            y = np.floor(np.log(n_sorted.astype(np.float64)) * _ZIPF_SCALE).astype(np.int64)
            sx, sy = _exact_sum(x), _exact_sum(y)
            sxy, sxx = _exact_sum(x * y), _exact_sum(x * x)
            # shared IEEE tree with the oracle (see zipf_slope_sql)
            num = float(v) * float(sxy) - float(sx) * float(sy)
            den = float(v) * float(sxx) - float(sx) * float(sx)
            slope = num / den if den != 0.0 else 0.0
            intercept = (
                (float(sy) - slope * float(sx)) / float(v)
                if v
                else 0.0
            )
            langs.append(lang)
            slopes.append(slope)
            intercepts.append(intercept)
            vocab.append(v)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "n_words": pa.array(vocab, pa.int64()),
                "zipf_slope": pa.array(slopes, pa.float64()),
                "zipf_intercept": pa.array(intercepts, pa.float64()),
            }
        )

    return grouped_map(counted, ["lang"], slope_block)


def zipf_slope_sql(words_sql: str) -> str:
    """DuckDB replay: same rank rule, same ln quantization, HUGEINT
    moments, same closed-form expressions. ``words_sql`` is the
    engine-shared word extraction expression over ``documents.text``."""
    s = _ZIPF_SCALE
    return (
        "WITH words AS (\n"
        f" SELECT lang, unnest({words_sql}) AS word FROM documents\n"
        "), counted AS (\n"
        " SELECT lang, word, COUNT(*) AS n FROM words GROUP BY lang, word\n"
        "), ranked AS (\n"
        " SELECT lang, n,\n"
        "  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, word ASC)"
        " AS rank\n"
        " FROM counted\n"
        "), q AS (\n"
        f" SELECT lang,\n"
        f"  CAST(floor(ln(CAST(rank AS DOUBLE)) * {s}) AS BIGINT) AS x,\n"
        f"  CAST(floor(ln(CAST(n AS DOUBLE)) * {s}) AS BIGINT) AS y\n"
        " FROM ranked\n"
        "), m AS (\n"
        " SELECT lang, COUNT(*) AS v,\n"
        "  SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,\n"
        "  SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,\n"
        "  SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx\n"
        " FROM q GROUP BY lang\n"
        "), fit AS (\n"
        " SELECT lang, v,\n"
        "  CASE WHEN (CAST(v AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0.0 THEN 0.0\n"
        "  ELSE (CAST(v AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))\n"
        "  / (CAST(v AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS slope,\n"
        "  CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd\n"
        " FROM m\n"
        ")\n"
        "SELECT lang, CAST(v AS BIGINT) AS n_words, slope AS zipf_slope,\n"
        " (syd - slope * sxd) / CAST(v AS DOUBLE) AS zipf_intercept\n"
        "FROM fit"
    )


# ---------------------------------------------------------------------------
# readability — integer-exact Flesch-style moments per language


_SENT_RE = re.compile(r"[.!?]+")
_VOWEL_RE = re.compile(r"[aeiouy]+")

_READ_SCHEMA = pa.schema(
    [
        ("lang", pa.string()),
        ("n_docs", pa.int64()),
        ("n_words", pa.int64()),
        ("n_sents", pa.int64()),
        ("n_syll", pa.int64()),
        ("flesch_micro", pa.int64()),
    ]
)


def readability_scores(docs):
    """Per-language Flesch reading-ease moments: word / sentence /
    syllable-proxy counts (vowel groups — the standard heuristic
    syllable counter) as exact integer sums, plus the Flesch score of
    the AGGREGATE (206.835 − 1.015·W/S − 84.6·Y/W) quantized to micro
    units. Readability is a standard quality-filter signal for training
    corpora (e.g. C4/CCNet-style heuristics keep mid-band documents).

    All sums are order-free exact integers; the one float expression is
    shared term-for-term with the SQL oracle. Sentences = maximal
    [.!?]+ runs + 1 floor (a text with no terminator is one sentence);
    words = [a-z]+ runs on the lowered text.

    Scale shape: one stateless scan → ≤|langs| partial rows per block →
    tiny keyed sum → vectorized finish."""
    from ray.data.aggregate import Sum

    from ocr_ray.ops.dedup import _with_schema

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _READ_SCHEMA.empty_table()
        acc: dict[str, list[int]] = {}
        for lang, text in zip(
            t.column("lang").to_pylist(), t.column("text").to_pylist()
        ):
            low = (text or "").lower()
            words = _WORD_RE2.findall(low)
            sents = max(1, len(_SENT_RE.findall(low)))
            syll = sum(
                max(1, len(_VOWEL_RE.findall(w))) for w in words
            )
            row = acc.setdefault(lang, [0, 0, 0, 0])
            row[0] += 1
            row[1] += len(words)
            row[2] += sents
            row[3] += syll
        return pa.Table.from_pylist(
            [
                {"lang": k, "n_docs": v[0], "n_words": v[1],
                 "n_sents": v[2], "n_syll": v[3], "flesch_micro": 0}
                for k, v in acc.items()
            ],
            schema=_READ_SCHEMA,
        )

    merged = _with_schema(
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_words", alias_name="n_words"),
            Sum("n_sents", alias_name="n_sents"),
            Sum("n_syll", alias_name="n_syll"),
        ),
        pa.schema([f for f in _READ_SCHEMA if f.name != "flesch_micro"]),
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _READ_SCHEMA.empty_table()
        w = t.column("n_words").to_numpy(zero_copy_only=False).astype(np.float64)
        s = t.column("n_sents").to_numpy(zero_copy_only=False).astype(np.float64)
        y = t.column("n_syll").to_numpy(zero_copy_only=False).astype(np.float64)
        # the oracle's exact term order; guard W=0 with the same CASE
        flesch = np.where(
            w > 0.0,
            206.835 - 1.015 * (w / s) - 84.6 * (y / w),
            0.0,
        )
        micro = np.floor(1_000_000.0 * flesch + 0.5).astype(np.int64)
        return pa.table(
            {
                "lang": t.column("lang"),
                "n_docs": t.column("n_docs").cast(pa.int64()),
                "n_words": t.column("n_words").cast(pa.int64()),
                "n_sents": t.column("n_sents").cast(pa.int64()),
                "n_syll": t.column("n_syll").cast(pa.int64()),
                "flesch_micro": pa.array(micro, pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


_WORD_RE2 = re.compile(r"[a-z]+")


def readability_scores_sql() -> str:
    """DuckDB oracle for :func:`readability_scores`."""
    return (
        "WITH per_doc AS (\n"
        " SELECT lang,\n"
        "  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)"
        " AS w,\n"
        "  CAST(GREATEST(1, len(regexp_extract_all(lower(text),"
        " '[.!?]+'))) AS BIGINT) AS s,\n"
        "  CAST(COALESCE(list_sum(list_transform("
        "regexp_extract_all(lower(text), '[a-z]+'),"
        " t -> GREATEST(1, len(regexp_extract_all(t, '[aeiouy]+'))))), 0)"
        " AS BIGINT) AS y\n"
        " FROM documents\n"
        "), m AS (\n"
        " SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,"
        " CAST(SUM(w) AS BIGINT) AS n_words,"
        " CAST(SUM(s) AS BIGINT) AS n_sents,"
        " CAST(SUM(y) AS BIGINT) AS n_syll\n"
        " FROM per_doc GROUP BY lang\n"
        ")\n"
        "SELECT lang, n_docs, n_words, n_sents, n_syll,\n"
        " CAST(FLOOR(1000000.0 * (CASE WHEN n_words > 0 THEN\n"
        "  206.835 - 1.015 * (CAST(n_words AS DOUBLE)"
        " / CAST(n_sents AS DOUBLE))\n"
        "  - 84.6 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE))\n"
        "  ELSE 0.0 END) + 0.5) AS BIGINT) AS flesch_micro\n"
        "FROM m"
    )


def sentence_length_hist(docs, cap: int = 50):
    """Corpus histogram of sentence lengths in words: documents split on
    ``[.!?]+`` runs, each sentence's ``[a-zA-Z]+`` word count clipped at
    ``cap``; zero-word fragments drop. Fully vectorized — one Arrow
    regex split per batch, one regex count over the flattened sentence
    array, one bincount — and each block collapses to <= cap slim
    partial rows before the tiny keyed merge.

    Both engines run RE2 ('[.!?]+' split, '[a-zA-Z]+' count), so the
    histogram is exact against the DuckDB unnest oracle."""
    from ray.data.aggregate import Sum

    part_schema = pa.schema([("wc", pa.int64()), ("n_sentences", pa.int64())])

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return part_schema.empty_table()
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        sentences = pc.split_pattern_regex(text, "[.!?]+")
        flat = pc.list_flatten(sentences)
        wc = pc.count_substring_regex(flat, "[a-zA-Z]+").to_numpy(
            zero_copy_only=False
        )
        wc = wc[wc >= 1]
        if len(wc) == 0:
            return part_schema.empty_table()
        wc = np.minimum(wc, cap)
        counts = np.bincount(wc, minlength=cap + 1)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "wc": pa.array(nz.astype(np.int64), pa.int64()),
                "n_sentences": pa.array(
                    counts[nz].astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby("wc")
        .aggregate(Sum("n_sentences", alias_name="n_sentences"))
    )


def sentence_length_hist_sql(cap: int = 50) -> str:
    return (
        "WITH s AS (\n"
        " SELECT unnest(regexp_split_to_array(text, '[.!?]+')) AS sent\n"
        " FROM documents\n"
        "), w AS (\n"
        f" SELECT LEAST(len(regexp_extract_all(sent, '[a-zA-Z]+')), {cap})"
        " AS wc\n"
        " FROM s\n"
        " WHERE len(regexp_extract_all(sent, '[a-zA-Z]+')) >= 1\n"
        ")\n"
        "SELECT CAST(wc AS BIGINT) AS wc,"
        " CAST(COUNT(*) AS BIGINT) AS n_sentences\n"
        "FROM w GROUP BY wc"
    )


def cross_source_overlap_matrix(docs, max_df: int = 64):
    """Source-granular MOSS matrix: for every unordered source pair
    (a <= b), the number of cross-document winnowing-fingerprint
    co-occurrences with one doc in each source (within-source
    co-occurrences count C(n,2)) — "which crawls copy from which", the
    provenance contamination rollup a corpus-mixing decision reads.
    Fingerprints present in more than ``max_df`` docs are dropped
    whole before pairing (stop-fingerprint guard, mirrored by the
    oracle's df filter).

    Scale shape: one hash shuffle of slim (fp, source) rows; each
    fingerprint group collapses to per-source counts and emits at most
    S^2 pair rows — co-occurrences are COUNTED via n_a*n_b, never
    enumerated.  A tiny keyed sum finishes.

    Output: (source_a, source_b, n_cooccurrences), source_a <= source_b.
    """
    from ray.data.aggregate import Sum

    from ocr_ray.ops.dedup import _with_schema
    from ocr_ray.stages.grouped import grouped_map

    def fp_src_rows(batch: pa.Table) -> pa.Table:
        fp_out, src_out = [], []
        for text, src in zip(
            batch.column("text").to_pylist(),
            batch.column("source").to_pylist(),
        ):
            fps = np.unique(
                np.array(winnow_fingerprints(text), dtype=np.int64)
            )
            fp_out.append(fps)
            src_out.extend([src] * fps.size)
        if not fp_out:
            return pa.schema(
                [("fp", pa.int64()), ("source", pa.string())]
            ).empty_table()
        return pa.table(
            {
                "fp": pa.array(np.concatenate(fp_out), pa.int64()),
                "source": pa.array(src_out, pa.string()),
            }
        )

    pair_schema = pa.schema(
        [
            ("source_a", pa.string()),
            ("source_b", pa.string()),
            ("c", pa.int64()),
        ]
    )

    def pairs(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n == 0 or len(starts) == 0:
            return pair_schema.empty_table()
        src = np.asarray(block.column("source").to_pylist(), dtype=object)
        ends = np.append(starts[1:], n)
        a_o, b_o, c_o = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2 or e - s > max_df:
                continue  # unique fp, or stop-fingerprint
            uniq, cnt = np.unique(src[s:e], return_counts=True)
            for i in range(len(uniq)):
                if cnt[i] > 1:
                    a_o.append(uniq[i])
                    b_o.append(uniq[i])
                    c_o.append(int(cnt[i]) * (int(cnt[i]) - 1) // 2)
                for j in range(i + 1, len(uniq)):
                    a_o.append(uniq[i])
                    b_o.append(uniq[j])
                    c_o.append(int(cnt[i]) * int(cnt[j]))
        return pa.table(
            {
                "source_a": pa.array(a_o, pa.string()),
                "source_b": pa.array(b_o, pa.string()),
                "c": pa.array(c_o, pa.int64()),
            }
        )

    out = (
        grouped_map(
            docs.map_batches(fp_src_rows, batch_format="pyarrow"),
            ["fp"],
            pairs,
        )
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("c", alias_name="n_cooccurrences"))
    )
    return _with_schema(
        out,
        pa.schema(
            [
                ("source_a", pa.string()),
                ("source_b", pa.string()),
                ("n_cooccurrences", pa.int64()),
            ]
        ),
    )


def term_burstiness(docs, min_df: int = 5, k: int = 200):
    """Term burstiness (Church & Gale overdispersion): for each word,
    the variance-to-mean ratio of its per-document counts over the
    documents that CONTAIN it. VMR ≈ 1 is Poisson-like function-word
    behavior; VMR ≫ 1 marks bursty content words that pile up in a few
    documents — the signal separating topical vocabulary from glue
    words when building filter lists at corpus scale.

    Scale shape: per-(doc, word) counts are complete inside a batch
    (a document is one row), so each batch folds to slim
    (word, df, total, sum_sq) integer partials — fully vectorized via
    the dictionary-encode trick (no per-word Python) — and one keyed
    sum finishes; the final sort is over the word vocabulary only.

    Output: (word, df, total, sum_sq, vmr), df ≥ ``min_df``, top ``k``
    by (total DESC, word ASC)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ocr_ray.ops.dedup import _with_schema

    part_schema = pa.schema(
        [
            ("word", pa.string()),
            ("df", pa.int64()),
            ("total", pa.int64()),
            ("sum_sq", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.column_names:
            return part_schema.empty_table()
        col = t.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        arr = pc.coalesce(col, pa.scalar("", pa.string()))
        words = pc.split_pattern_regex(
            pc.utf8_lower(arr), pattern="[^a-zA-Z]+"
        )
        parent = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False
        )
        flat = pc.list_flatten(words)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if len(flat) == 0:
            return part_schema.empty_table()
        d = flat.dictionary_encode()
        vocab = np.asarray(d.dictionary.to_pylist(), dtype=object)
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        valid = np.fromiter(
            (len(w) >= 3 for w in vocab), bool, len(vocab)
        )[idx]
        if not valid.any():
            return part_schema.empty_table()
        keys = parent[valid] * np.int64(len(vocab)) + idx[valid]
        uk, cnt = np.unique(keys, return_counts=True)
        widx = (uk % len(vocab)).astype(np.int64)
        cnt = cnt.astype(np.int64)
        # fold the per-(doc, word) counts to per-word partials
        uw, winv = np.unique(widx, return_inverse=True)
        df = np.bincount(winv, minlength=len(uw)).astype(np.int64)
        tot = np.zeros(len(uw), np.int64)
        np.add.at(tot, winv, cnt)
        sq = np.zeros(len(uw), np.int64)
        np.add.at(sq, winv, cnt * cnt)
        return pa.table(
            {
                "word": pa.array(list(vocab[uw]), pa.string()),
                "df": pa.array(df, pa.int64()),
                "total": pa.array(tot, pa.int64()),
                "sum_sq": pa.array(sq, pa.int64()),
            }
        )

    agg = (
        _with_schema(
            docs.map_batches(partials, batch_format="pyarrow"), part_schema
        )
        .groupby("word")
        .aggregate(
            Sum("df", alias_name="df"),
            Sum("total", alias_name="total"),
            Sum("sum_sq", alias_name="sum_sq"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        out_schema = part_schema.append(pa.field("vmr", pa.float64()))
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        t = t.filter(pc.greater_equal(t.column("df"), min_df))
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.column("df").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        tot = t.column("total").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        sq = t.column("sum_sq").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        m = tot / df
        vmr = (sq / df - m * m) / m
        return t.append_column("vmr", pa.array(vmr, pa.float64()))

    return (
        _with_schema(
            agg.map_batches(finalize, batch_format="pyarrow"),
            part_schema.append(pa.field("vmr", pa.float64())),
        )
        .sort(["total", "word"], descending=[True, False])
        .limit(k)
    )


def term_burstiness_sql(min_df: int = 5, k: int = 200) -> str:
    m = "(CAST(total AS DOUBLE) / CAST(df AS DOUBLE))"
    return (
        "WITH w AS (\n"
        " SELECT doc_id,"
        " unnest(regexp_extract_all(lower(text), '[a-zA-Z]{3,}'))"
        " AS word\n"
        " FROM documents\n"
        "), c AS (\n"
        " SELECT doc_id, word, COUNT(*) AS n FROM w GROUP BY 1, 2\n"
        "), a AS (\n"
        " SELECT word, CAST(COUNT(*) AS BIGINT) AS df,\n"
        "  CAST(SUM(n) AS BIGINT) AS total,\n"
        "  CAST(SUM(n * n) AS BIGINT) AS sum_sq\n"
        " FROM c GROUP BY word\n"
        ")\n"
        "SELECT word, df, total, sum_sq,\n"
        f" (CAST(sum_sq AS DOUBLE) / CAST(df AS DOUBLE) - {m} * {m})"
        f" / {m} AS vmr\n"
        f"FROM a WHERE df >= {min_df}\n"
        f"ORDER BY total DESC, word ASC LIMIT {k}"
    )
