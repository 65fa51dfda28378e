"""Composite corpus-curation pipeline — the flagship shape of a
training-data engine: score → filter → exact-dedup → rollup, in one
streaming pass plus one slim shuffle.

Scale design (the point of the composition):

- ONE ``map_batches`` pass computes every per-doc signal (language-ID
  stopword counts, quality heuristics, content fingerprint, token
  count) and applies the keep-filter INSIDE the batch — rejected docs
  never leave the scoring task, and the full ``text`` column never
  enters a shuffle.
- The dedup groupby shuffles only slim derived rows
  ``(fingerprint, lang_pred, n_tokens)`` — ~50 bytes/doc regardless of
  document size.
- ``lang_pred`` and ``n_tokens`` are invariant under the fingerprint
  normalization (lowercase + whitespace-collapse: ``\\S+`` token counts
  and lowercased word sets cannot differ between fingerprint-equal
  texts), so they ride in the group key instead of needing a join back
  to the keeper row.
- The final per-language rollup is a second groupby over
  already-deduped slim rows — at most one row per distinct document.

Filter semantics (applied BEFORE dedup, like a real curation run —
a low-quality copy never shields a good one because fingerprint-equal
texts score identically on every signal the filter uses):
keep docs with ``n_words >= min_words`` AND
``stopword_ratio >= min_stopword_ratio`` AND
``punct_ratio <= max_punct_ratio``.

All signals reuse the exact kernels of the standalone queries
(``ops.analysis`` language-ID / fingerprint, ``ops.textstats`` quality
heuristics), so the DuckDB oracle composes their proven SQL fragments.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ocr_ray.ops.analysis import normalize_for_fingerprint
from ocr_ray.ops.textstats import STOP_EN, STOP_ID, _PUNCT_RE, _WORD_RE

DEFAULT_MIN_WORDS = 20
DEFAULT_MIN_STOPWORD_RATIO = 0.02
DEFAULT_MAX_PUNCT_RATIO = 0.2


def _score_filter_batch(
    batch: pa.Table,
    *,
    min_words: int,
    min_stopword_ratio: float,
    max_punct_ratio: float,
) -> pa.Table:
    stop_id, stop_en = set(STOP_ID), set(STOP_EN)
    stops = stop_id | stop_en
    ids = batch.column("doc_id").to_pylist()
    out_id, out_fp, out_lang, out_tok = [], [], [], []
    n_words_l, punct_l, stop_l = [], [], []
    for doc_id, text in zip(ids, batch.column("text").to_pylist()):
        t = text or ""
        words = _WORD_RE.findall(t.lower())
        n_words = len(words)
        punct_ratio = len(_PUNCT_RE.findall(t)) / max(len(t), 1)
        stop_ratio = sum(1 for w in words if w in stops) / max(n_words, 1)
        if (
            n_words < min_words
            or stop_ratio < min_stopword_ratio
            or punct_ratio > max_punct_ratio
        ):
            continue
        sid = sum(1 for w in words if w in stop_id)
        sen = sum(1 for w in words if w in stop_en)
        out_id.append(doc_id)
        out_fp.append(
            hashlib.md5(
                normalize_for_fingerprint(t).encode("utf-8")
            ).hexdigest()
        )
        out_lang.append("id" if sid >= sen else "en")
        out_tok.append(len(t.split()))
        n_words_l.append(n_words)
        punct_l.append(punct_ratio)
        stop_l.append(stop_ratio)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "fingerprint": pa.array(out_fp, pa.string()),
            "lang_pred": pa.array(out_lang, pa.string()),
            "n_tokens": pa.array(out_tok, pa.int64()),
        }
    )


def curate_corpus(
    docs,
    *,
    min_words: int = DEFAULT_MIN_WORDS,
    min_stopword_ratio: float = DEFAULT_MIN_STOPWORD_RATIO,
    max_punct_ratio: float = DEFAULT_MAX_PUNCT_RATIO,
):
    """Score + filter + exact-dedup: one row per SURVIVING distinct
    document ``(fingerprint, lang_pred, n_tokens, doc_id=keeper,
    n_copies)``. ``docs`` needs (doc_id, text)."""
    from ray.data.aggregate import Count, Min

    import functools

    scored = docs.map_batches(
        functools.partial(
            _score_filter_batch,
            min_words=min_words,
            min_stopword_ratio=min_stopword_ratio,
            max_punct_ratio=max_punct_ratio,
        ),
        batch_format="pyarrow",
    )
    return (
        scored.groupby(["fingerprint", "lang_pred", "n_tokens"])
        .aggregate(
            Min("doc_id", alias_name="doc_id"),
            Count(alias_name="n_copies"),
        )
    )


def curate_stats(
    docs,
    *,
    min_words: int = DEFAULT_MIN_WORDS,
    min_stopword_ratio: float = DEFAULT_MIN_STOPWORD_RATIO,
    max_punct_ratio: float = DEFAULT_MAX_PUNCT_RATIO,
):
    """Per-language rollup of the curated corpus: distinct surviving
    docs, pre-dedup survivor count, total tokens, keeper-id span."""
    from ray.data.aggregate import Count, Max, Min, Sum

    kept = curate_corpus(
        docs,
        min_words=min_words,
        min_stopword_ratio=min_stopword_ratio,
        max_punct_ratio=max_punct_ratio,
    )
    return kept.groupby("lang_pred").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_copies", alias_name="n_docs_before_dedup"),
        Sum("n_tokens", alias_name="sum_tokens"),
        Min("doc_id", alias_name="min_doc_id"),
        Max("doc_id", alias_name="max_doc_id"),
    )


def length_outliers(docs, k_sigma: float = 3.0):
    """(doc_id, lang, n_chars) — documents whose length is more than
    ``k_sigma`` population standard deviations from their language's
    mean: the two-pass normalized filter every curation pipeline runs
    (pass 1: tiny per-language integer aggregate; pass 2: map-side
    filter against the broadcast thresholds — no shuffle of documents).

    Cross-engine determinism: the per-language sums are exact integers,
    and mean/std derive from them via the SAME IEEE expression the SQL
    oracle uses (each op correctly rounded, identical association order
    → bit-identical doubles → identical boundary decisions):
    ``mean = s/n``, ``std = sqrt(ss/n - (s/n)*(s/n))``.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def square_partials(t: pa.Table) -> pa.Table:
        chars = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "lang": t.column("lang"),
                "n_chars": pa.array(chars, pa.int64()),
                "sq": pa.array(chars * chars, pa.int64()),
            }
        )

    stats_rows = (
        docs.map_batches(square_partials, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Count(alias_name="n"),
            Sum("n_chars", alias_name="s"),
            Sum("sq", alias_name="ss"),
        )
        .take_all()  # ≤ n_langs rows by construction
    )
    bounds: dict[str, tuple[float, float]] = {}
    for r in stats_rows:
        n, s, ss = float(r["n"]), float(r["s"]), float(r["ss"])
        mean = s / n
        std = float(np.sqrt(ss / n - (s / n) * (s / n)))
        bounds[r["lang"]] = (mean - k_sigma * std, mean + k_sigma * std)

    def flag(t: pa.Table) -> pa.Table:
        chars = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        langs = t.column("lang").to_pylist()
        lo = np.array([bounds[l][0] for l in langs])
        hi = np.array([bounds[l][1] for l in langs])
        keep = (chars < lo) | (chars > hi)
        return t.select(["doc_id", "lang", "n_chars"]).filter(pa.array(keep))

    return docs.map_batches(flag, batch_format="pyarrow")


def length_outliers_sql(k_sigma: float = 3.0) -> str:
    """Oracle: identical integer aggregates, identical IEEE expression
    for the bounds, identical strict-inequality boundary rule."""
    return (
        "WITH st AS (\n"
        " SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n,\n"
        "  CAST(SUM(n_chars) AS DOUBLE) AS s,\n"
        "  CAST(SUM(n_chars * n_chars) AS DOUBLE) AS ss\n"
        " FROM documents GROUP BY lang\n"
        "), b AS (\n"
        f" SELECT lang, (s/n) - {k_sigma} * sqrt(ss/n - (s/n)*(s/n)) AS lo,\n"
        f"  (s/n) + {k_sigma} * sqrt(ss/n - (s/n)*(s/n)) AS hi\n"
        " FROM st\n"
        ")\n"
        "SELECT d.doc_id, d.lang, d.n_chars\n"
        "FROM documents d JOIN b USING (lang)\n"
        "WHERE CAST(d.n_chars AS DOUBLE) < b.lo"
        " OR CAST(d.n_chars AS DOUBLE) > b.hi"
    )


# -------------------------------------------- distributed percent rank


def length_percent_rank(docs, col: str = "n_chars"):
    """Global RANK / PERCENT_RANK over an integer column WITHOUT a
    global sort: a two-pass broadcast-histogram plan.

    Pass 1 reduces the corpus to a tiny exact histogram of distinct
    column values (map-side per-batch value counts → one keyed
    aggregate; the result is bounded by the number of DISTINCT values —
    for document lengths that is ≤ max plausible length, a few hundred
    thousand rows at worst, independent of corpus row count). The
    driver turns it into a cumulative lookup, ships it once with
    ``ray.put``, and pass 2 assigns every row its rank map-side with
    one vectorized searchsorted — no all-to-all exchange of documents,
    ever. Rank semantics match SQL RANK() (ties share the minimum
    rank); pct_rank = (rank−1)/(n−1) as the single IEEE division both
    engines perform.
    """
    import ray
    from ray.data.aggregate import Sum

    hist = (
        docs.map_batches(
            lambda t: pa.table(
                {
                    "v": t.column(col),
                    "c": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                }
            )
            .group_by("v")
            .aggregate([("c", "sum")])
            .rename_columns(["v", "c"]),
            batch_format="pyarrow",
        )
        .groupby("v")
        .aggregate(Sum("c", alias_name="cnt"))
    )
    rows = hist.sort("v").take_all()  # bounded by #distinct values
    vals = np.array([r["v"] for r in rows], dtype=np.int64)
    cnts = np.array([r["cnt"] for r in rows], dtype=np.int64)
    cum_less = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    n = int(cnts.sum())
    lookup_ref = ray.put((vals, cum_less, n))

    class _Ranker:
        def __init__(self, ref):
            self.vals, self.cum_less, self.n = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = t.column(col).to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.vals, v)
            rank = self.cum_less[idx] + 1
            denom = float(max(self.n - 1, 1))
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    col: t.column(col),
                    "rnk": pa.array(rank.astype(np.int64), pa.int64()),
                    "pct_rank": pa.array(
                        (rank - 1).astype(np.float64) / denom, pa.float64()
                    ),
                }
            )

    return docs.map_batches(
        _Ranker,
        fn_constructor_kwargs={"ref": lookup_ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def length_percent_rank_sql(col: str = "n_chars") -> str:
    return (
        f"SELECT doc_id, {col},\n"
        f" CAST(RANK() OVER (ORDER BY {col}) AS BIGINT) AS rnk,\n"
        f" PERCENT_RANK() OVER (ORDER BY {col}) AS pct_rank\n"
        "FROM documents"
    )


# ------------------------------------- cross-source quantile normalization


def quantile_normalize(docs, col: str = "n_chars", group: str = "source"):
    """Map every document's ``col`` onto the GLOBAL distribution at the
    document's within-``group`` quantile — the rank-based batch-effect
    correction (classic quantile normalization) that puts sources with
    systematically different length/quality distributions on one common
    scale before mixing.

    Same scale shape as ``length_percent_rank``: pass 1 reduces the
    corpus to per-(group, value) exact histograms (bounded by groups ×
    distinct values, independent of row count); the driver builds each
    group's cumulative-rank lookup plus the global (pct_rank → value)
    step function and broadcasts them once with ``ray.put``; pass 2
    assigns ``pct_rank = (RANK-1)/(n-1)`` within the group and reads
    the normalized value with one vectorized searchsorted — an ASOF
    lookup into the global quantile function, no all-to-all exchange.
    Both engines compute pct_rank as the same single IEEE division, so
    the ASOF boundary (greatest global pct <= row pct) is bit-stable
    against the DuckDB PERCENT_RANK + ASOF JOIN oracle.
    """
    import ray
    from ray.data.aggregate import Sum

    hist = (
        docs.map_batches(
            lambda t: pa.table(
                {
                    "g": t.column(group),
                    "v": t.column(col),
                    "c": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                }
            )
            .group_by(["g", "v"])
            .aggregate([("c", "sum")])
            .rename_columns(["g", "v", "c"]),
            batch_format="pyarrow",
        )
        .groupby(["g", "v"])
        .aggregate(Sum("c", alias_name="cnt"))
    )
    rows = hist.sort(["g", "v"]).take_all()  # bounded: groups × distincts
    by_group: dict = {}
    for r in rows:
        by_group.setdefault(r["g"], []).append((int(r["v"]), int(r["cnt"])))
    lookups = {}
    g_vals_all, g_cnts_all = {}, {}
    for g, pairs in by_group.items():
        vals = np.array([p[0] for p in pairs], np.int64)
        cnts = np.array([p[1] for p in pairs], np.int64)
        cum_less = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        n = int(cnts.sum())
        lookups[g] = (vals, cum_less, max(n - 1, 1))
        g_vals_all[g], g_cnts_all[g] = vals, cnts
    # global step function: distinct value → its global pct_rank
    import collections

    tot = collections.Counter()
    for g in by_group:
        for v, c in zip(g_vals_all[g], g_cnts_all[g]):
            tot[int(v)] += int(c)
    gvals = np.array(sorted(tot), np.int64)
    gcnts = np.array([tot[int(v)] for v in gvals], np.int64)
    g_cum_less = np.concatenate([[0], np.cumsum(gcnts)[:-1]])
    n_all = int(gcnts.sum())
    gpct = g_cum_less.astype(np.float64) / float(max(n_all - 1, 1))
    ref = ray.put((lookups, gpct, gvals))

    class _Normalizer:
        def __init__(self, ref):
            self.lookups, self.gpct, self.gvals = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            garr = t.column(group)
            if isinstance(garr, pa.ChunkedArray):
                garr = garr.combine_chunks()
            enc = pc.dictionary_encode(garr)
            codes = enc.indices.to_numpy(zero_copy_only=False)
            v = t.column(col).to_numpy(zero_copy_only=False)
            pct = np.empty(len(v), np.float64)
            for ci, g in enumerate(enc.dictionary.to_pylist()):
                mask = codes == ci
                vals, cum_less, denom = self.lookups[g]
                idx = np.searchsorted(vals, v[mask])
                pct[mask] = cum_less[idx].astype(np.float64) / float(denom)
            gidx = np.searchsorted(self.gpct, pct, side="right") - 1
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    group: t.column(group),
                    col: t.column(col),
                    "pct_rank": pa.array(pct, pa.float64()),
                    "norm_" + col: pa.array(
                        self.gvals[gidx], pa.int64()
                    ),
                }
            )

    return docs.map_batches(
        _Normalizer,
        fn_constructor_kwargs={"ref": ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def quantile_normalize_sql(col: str = "n_chars",
                           group: str = "source") -> str:
    return (
        "WITH r AS (\n"
        f" SELECT doc_id, {group}, {col},\n"
        f"  PERCENT_RANK() OVER (PARTITION BY {group} ORDER BY {col})"
        " AS pct_rank\n"
        " FROM documents\n"
        "), gd AS (\n"
        " SELECT DISTINCT gval, gpct FROM (\n"
        f"  SELECT {col} AS gval,\n"
        f"   PERCENT_RANK() OVER (ORDER BY {col}) AS gpct\n"
        "  FROM documents\n"
        " )\n"
        ")\n"
        f"SELECT r.doc_id, r.{group}, r.{col}, r.pct_rank,\n"
        f" gd.gval AS norm_{col}\n"
        "FROM r ASOF JOIN gd ON r.pct_rank >= gd.gpct"
    )
