"""Brand-name training-data curation filters, exact-arithmetic edition:

* ``gopher_quality_flags`` — the Gopher rule-set (Rae et al. 2021,
  "Scaling Language Models: ... Gopher", App. A1.1): per-document
  quality rules rolled up per (lang, source). Every rule is evaluated
  by INTEGER cross-multiplication (``10·symbols > tokens`` instead of
  ``symbols/tokens > 0.1``), so there is no float anywhere and the
  DuckDB oracle matches exactly.

* ``dsir_weights`` — Data Selection with Importance Resampling (Xie et
  al. 2023, arXiv:2302.03169): per-document importance log-weights of a
  target slice vs the raw corpus over a hashed bag-of-bigram feature
  space. Here the feature hash is the word's leading letter pair
  (676 buckets) — deterministic and SQL-expressible, which is the DSIR
  construction with a trivially portable hash. Bucket log-ratios are
  quantized once to micro units (the only ``ln`` on either side, same
  IEEE term order), then per-doc weights are exact integer sums.

Scale shape
-----------
``gopher_quality_flags``: one stateless scan; each block collapses to
≤ |lang×source| partial rows; a tiny groupby merges. Nothing but the
rollup ever shuffles.

``dsir_weights``: two scans by construction (importance weighting needs
corpus statistics before it can score). Scan 1 collapses each block to
≤ 676 ``(bucket, raw_n, tgt_n)`` rows and the merged 676-row table
materializes on the driver (bounded by the feature-space size, not the
data); the quantized log-ratio table broadcasts in the task closure
(~5 KB); scan 2 is stateless scoring emitting one slim row per doc.
"""
from __future__ import annotations

import math
import re
from typing import Sequence

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# Gopher quality rules

_TOK_RE = re.compile(r"\S+")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_WORD_RE = re.compile(r"[a-z]+")
_HASH_RE = re.compile(r"#")
_ELLIPSIS_RE = re.compile(r"\.\.\.")
_BULLET_RE = re.compile(r"^[-*•]")
_LINE_ELLIPSIS_RE = re.compile(r"(\.\.\.|…)$")

# small closed stopword list, shared verbatim with the SQL oracle
GOPHER_STOPWORDS = (
    "the", "a", "and", "of", "to", "in", "is", "it", "that", "for",
)

_FLAGS = ("f_wc", "f_mwl", "f_sym", "f_bullet", "f_ellipsis", "f_alpha", "f_stop")

_ROLLUP_SCHEMA = pa.schema(
    [("lang", pa.string()), ("source", pa.string()), ("n_docs", pa.int64()),
     ("n_pass", pa.int64())]
    + [(f, pa.int64()) for f in _FLAGS]
)


def _doc_flags(text: str) -> tuple[int, ...]:
    """The 7 Gopher failure flags for one document, integer-exact."""
    t = text or ""
    toks = _TOK_RE.findall(t)
    n_tok = len(toks)
    words = _WORD_RE.findall(t.lower())
    n_words = len(words)
    wl_sum = sum(len(w) for w in words)
    n_alpha_tok = sum(1 for tok in toks if _ALPHA_RE.search(tok))
    n_sym = len(_HASH_RE.findall(t)) + len(_ELLIPSIS_RE.findall(t))
    lines = t.split("\n")
    n_lines = len(lines)
    n_bullet = sum(1 for ln in lines if _BULLET_RE.search(ln))
    n_ellip = sum(1 for ln in lines if _LINE_ELLIPSIS_RE.search(ln))
    n_stop = len(set(words) & set(GOPHER_STOPWORDS))
    return (
        int(n_words < 50 or n_words > 100_000),
        int(wl_sum < 3 * n_words or wl_sum > 10 * n_words),
        int(10 * n_sym > n_tok),
        int(10 * n_bullet > 9 * n_lines),
        int(10 * n_ellip > 3 * n_lines),
        int(10 * n_alpha_tok < 8 * n_tok),
        int(n_stop < 2),
    )


def gopher_quality_flags(docs):
    """Per-(lang, source) rollup of the Gopher rule-set: doc count, docs
    passing every rule, and per-rule failure counts. ``docs`` needs
    (lang, source, text)."""
    from ray.data.aggregate import Sum

    from ocr_ray.ops.dedup import _with_schema

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _ROLLUP_SCHEMA.empty_table()
        acc: dict[tuple[str, str], list[int]] = {}
        for lang, source, text in zip(
            t.column("lang").to_pylist(),
            t.column("source").to_pylist(),
            t.column("text").to_pylist(),
        ):
            flags = _doc_flags(text)
            row = acc.setdefault((lang, source), [0, 0] + [0] * len(_FLAGS))
            row[0] += 1
            row[1] += int(not any(flags))
            for i, f in enumerate(flags):
                row[2 + i] += f
        return pa.Table.from_pylist(
            [
                {"lang": k[0], "source": k[1], "n_docs": v[0], "n_pass": v[1],
                 **dict(zip(_FLAGS, v[2:]))}
                for k, v in acc.items()
            ],
            schema=_ROLLUP_SCHEMA,
        )

    return _with_schema(
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_pass", alias_name="n_pass"),
            *[Sum(f, alias_name=f) for f in _FLAGS],
        ),
        _ROLLUP_SCHEMA,
    )


def gopher_quality_flags_sql(stopwords: Sequence[str] = GOPHER_STOPWORDS) -> str:
    """DuckDB oracle for :func:`gopher_quality_flags` — the same integer
    cross-multiplied rules over the same regex token definitions."""
    stop_in = ", ".join(f"'{w}'" for w in stopwords)
    return (
        "WITH per_doc AS (\n"
        " SELECT lang, source,\n"
        "  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok,\n"
        "  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)"
        " AS n_words,\n"
        "  CAST(COALESCE(list_sum(list_transform("
        "regexp_extract_all(lower(text), '[a-z]+'), w -> length(w))), 0)"
        " AS BIGINT) AS wl_sum,\n"
        "  CAST(len(list_filter(regexp_extract_all(text, '\\S+'),"
        " x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha_tok,\n"
        "  CAST(len(regexp_extract_all(text, '#'))"
        " + len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS n_sym,\n"
        "  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,\n"
        "  CAST(len(list_filter(string_split(text, chr(10)),"
        " l -> regexp_matches(l, '^[-*•]'))) AS BIGINT) AS n_bullet,\n"
        "  CAST(len(list_filter(string_split(text, chr(10)),"
        " l -> regexp_matches(l, '(\\.\\.\\.|…)$'))) AS BIGINT)"
        " AS n_ellip,\n"
        "  CAST(len(list_distinct(list_filter("
        "regexp_extract_all(lower(text), '[a-z]+'),"
        f" w -> w IN ({stop_in})))) AS BIGINT) AS n_stop\n"
        " FROM documents\n"
        "), flags AS (\n"
        " SELECT lang, source,\n"
        "  CASE WHEN n_words < 50 OR n_words > 100000 THEN 1 ELSE 0 END"
        " AS f_wc,\n"
        "  CASE WHEN wl_sum < 3 * n_words OR wl_sum > 10 * n_words"
        " THEN 1 ELSE 0 END AS f_mwl,\n"
        "  CASE WHEN 10 * n_sym > n_tok THEN 1 ELSE 0 END AS f_sym,\n"
        "  CASE WHEN 10 * n_bullet > 9 * n_lines THEN 1 ELSE 0 END"
        " AS f_bullet,\n"
        "  CASE WHEN 10 * n_ellip > 3 * n_lines THEN 1 ELSE 0 END"
        " AS f_ellipsis,\n"
        "  CASE WHEN 10 * n_alpha_tok < 8 * n_tok THEN 1 ELSE 0 END"
        " AS f_alpha,\n"
        "  CASE WHEN n_stop < 2 THEN 1 ELSE 0 END AS f_stop\n"
        " FROM per_doc\n"
        ")\n"
        "SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,\n"
        " CAST(SUM(CASE WHEN f_wc + f_mwl + f_sym + f_bullet + f_ellipsis"
        " + f_alpha + f_stop = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,\n"
        + ",\n".join(
            f" CAST(SUM({f}) AS BIGINT) AS {f}" for f in _FLAGS
        )
        + "\nFROM flags GROUP BY lang, source"
    )


# ---------------------------------------------------------------------------
# DSIR importance weights

N_BUCKETS = 26 * 26
_DSIR_WORD_RE = re.compile(r"[a-z]{2,}")

_CNT_SCHEMA = pa.schema(
    [("bucket", pa.int64()), ("raw_n", pa.int64()), ("tgt_n", pa.int64())]
)
_WEIGHT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("weight_micro", pa.int64()), ("n_feat", pa.int64())]
)


def _doc_buckets(text: str) -> np.ndarray:
    words = _DSIR_WORD_RE.findall((text or "").lower())
    if not words:
        return np.empty(0, np.int64)
    return np.fromiter(
        ((ord(w[0]) - 97) * 26 + (ord(w[1]) - 97) for w in words),
        dtype=np.int64,
        count=len(words),
    )


def dsir_weights(docs, target_lang: str = "en"):
    """Per-document DSIR importance log-weight (micro units) of the
    ``lang == target_lang`` slice vs the whole corpus, over leading
    letter-pair feature buckets. ``docs`` needs (doc_id, lang, text).
    Documents with no extractable feature emit no row (no evidence →
    no weight), matching the SQL join semantics."""
    from ray.data.aggregate import Sum

    from ocr_ray.ops.dedup import _with_schema

    def count_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _CNT_SCHEMA.empty_table()
        raw = np.zeros(N_BUCKETS, np.int64)
        tgt = np.zeros(N_BUCKETS, np.int64)
        for lang, text in zip(
            t.column("lang").to_pylist(), t.column("text").to_pylist()
        ):
            b = _doc_buckets(text)
            if not len(b):
                continue
            cnt = np.bincount(b, minlength=N_BUCKETS)
            raw += cnt
            if lang == target_lang:
                tgt += cnt
        nz = np.flatnonzero(raw)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "raw_n": pa.array(raw[nz], pa.int64()),
                "tgt_n": pa.array(tgt[nz], pa.int64()),
            }
        )

    counts = _with_schema(
        docs.map_batches(count_partials, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum("raw_n", alias_name="raw_n"),
            Sum("tgt_n", alias_name="tgt_n"),
        ),
        _CNT_SCHEMA,
    ).take_all()  # ≤ 676 rows by construction

    raw_tot = sum(r["raw_n"] for r in counts)
    tgt_tot = sum(r["tgt_n"] for r in counts)
    # quantized add-one-smoothed log-ratio per bucket — the oracle's
    # exact FLOOR(1e6·LN(((tgt+1)·(raw_tot+K)) / ((raw+1)·(tgt_tot+K)))
    # + 0.5) term order; FLOOR(x+0.5) on BOTH sides (not ROUND) so the
    # negative-half tie behavior is identical
    lr_micro = np.zeros(N_BUCKETS, np.int64)
    k = float(N_BUCKETS)
    for r in counts:
        val = 1_000_000.0 * math.log(
            ((r["tgt_n"] + 1.0) * (raw_tot + k))
            / ((r["raw_n"] + 1.0) * (tgt_tot + k))
        )
        lr_micro[r["bucket"]] = int(math.floor(val + 0.5))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _WEIGHT_SCHEMA.empty_table()
        ids, weights, feats = [], [], []
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            b = _doc_buckets(text)
            if not len(b):
                continue
            ids.append(doc_id)
            weights.append(int(lr_micro[b].sum()))
            feats.append(len(b))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "weight_micro": pa.array(weights, pa.int64()),
                "n_feat": pa.array(feats, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def dsir_weights_sql(target_lang: str = "en") -> str:
    """DuckDB oracle for :func:`dsir_weights`."""
    return (
        "WITH b AS (\n"
        " SELECT doc_id, lang,"
        " (ascii(substr(w, 1, 1)) - 97) * 26 + ascii(substr(w, 2, 1)) - 97"
        " AS bucket\n"
        " FROM (SELECT doc_id, lang,"
        " unnest(regexp_extract_all(lower(text), '[a-z]{2,}')) AS w"
        " FROM documents)\n"
        "), cnt AS (\n"
        " SELECT bucket, CAST(COUNT(*) AS BIGINT) AS raw_n,\n"
        f"  CAST(SUM(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END)"
        " AS BIGINT) AS tgt_n\n"
        " FROM b GROUP BY bucket\n"
        "), tot AS (\n"
        " SELECT CAST(SUM(raw_n) AS BIGINT) AS raw_tot,"
        " CAST(SUM(tgt_n) AS BIGINT) AS tgt_tot FROM cnt\n"
        "), lr AS (\n"
        " SELECT bucket,\n"
        "  CAST(FLOOR(1000000.0 * LN(((tgt_n + 1.0) * (raw_tot + 676.0))"
        " / ((raw_n + 1.0) * (tgt_tot + 676.0))) + 0.5) AS BIGINT)"
        " AS lr_micro\n"
        " FROM cnt CROSS JOIN tot\n"
        ")\n"
        "SELECT doc_id, CAST(SUM(lr_micro) AS BIGINT) AS weight_micro,\n"
        " CAST(COUNT(*) AS BIGINT) AS n_feat\n"
        "FROM b JOIN lr USING (bucket) GROUP BY doc_id"
    )


DEFAULT_ESS_CLIPS = (0, 500_000, 1_000_000, 2_000_000)

# sign-safe offset for the frozen exp-input grid: added before the
# integer 1024-step floor so the floor-div operand is positive on both
# engines (numpy // floors, DuckDB // truncates toward zero — they
# agree only for non-negative operands)
_EXP_OFF = 1 << 40
_EXP_OFF_LIT = str(_EXP_OFF)


def dsir_clip_ess(docs, target_lang: str = "en",
                  clips: tuple[int, ...] = DEFAULT_ESS_CLIPS):
    """Weight-clipping sweep for the DSIR importance weights: for each
    clip threshold (micro log-units), the effective sample size
    ESS = (Σw)²/Σw² of the clipped weights
    ``w = floor(exp(min(log_w, clip)/1e6)·1e6)`` — the diagnostic that
    picks the clip value balancing bias (hard clip) against variance
    (a few huge weights dominating the mixture).  Weights quantize to
    integers through the same FLOOR(·1e6) discipline as the log-ratio
    table itself, so both engines sum identical integers; ESS is the
    single shared float expression.

    Scale shape: rides the dsir scoring pass (per-doc slim weight
    rows), folds to ``len(clips)`` partial rows per batch, one tiny
    keyed sum.

    Output: (clip_micro, n_docs, sum_wq, sum_wq2, ess).
    """
    from ray.data.aggregate import Sum

    from ocr_ray.ops.dedup import _with_schema

    weights = dsir_weights(docs, target_lang=target_lang)
    clip_arr = np.asarray(clips, dtype=np.int64)

    part_schema = pa.schema(
        [
            ("clip_micro", pa.int64()),
            ("n_docs", pa.int64()),
            ("sum_wq", pa.int64()),
            ("sum_wq2", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "weight_micro" not in t.column_names:
            return part_schema.empty_table()
        w = t.column("weight_micro").to_numpy(zero_copy_only=False)
        rows_n, rows_s, rows_s2 = [], [], []
        for c in clip_arr:
            # exponent snapped to a frozen 1024-micro grid via
            # sign-safe integer arithmetic (offset keeps the operand
            # positive so numpy floor-div == DuckDB // — ADVICE r03:
            # a raw libm-vs-DuckDB exp 1-ulp divergence could flip
            # floor(exp(w)*1e6) at a boundary; the coarse frozen grid
            # makes the exp-input set small and auditable)
            q = np.minimum(w, c).astype(np.int64)
            q = ((q + _EXP_OFF) // 1024) * 1024 - _EXP_OFF
            wq = np.floor(np.exp(q.astype(np.float64) / 1e6) * 1e6).astype(
                np.int64
            )
            rows_n.append(len(wq))
            rows_s.append(int(wq.sum()))
            rows_s2.append(int((wq * wq).sum()))
        return pa.table(
            {
                "clip_micro": pa.array(clip_arr, pa.int64()),
                "n_docs": pa.array(rows_n, pa.int64()),
                "sum_wq": pa.array(rows_s, pa.int64()),
                "sum_wq2": pa.array(rows_s2, pa.int64()),
            }
        )

    rows = (
        weights.map_batches(partials, batch_format="pyarrow")
        .groupby("clip_micro")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_wq", alias_name="sum_wq"),
            Sum("sum_wq2", alias_name="sum_wq2"),
        )
    ).take_all()  # bounded: len(clips) rows
    rows.sort(key=lambda r: int(r["clip_micro"]))
    return pa.table(
        {
            "clip_micro": pa.array(
                [int(r["clip_micro"]) for r in rows], pa.int64()
            ),
            "n_docs": pa.array([int(r["n_docs"]) for r in rows], pa.int64()),
            "sum_wq": pa.array([int(r["sum_wq"]) for r in rows], pa.int64()),
            "sum_wq2": pa.array(
                [int(r["sum_wq2"]) for r in rows], pa.int64()
            ),
            "ess": pa.array(
                [
                    float(int(r["sum_wq"])) * float(int(r["sum_wq"]))
                    / float(int(r["sum_wq2"]))
                    if int(r["sum_wq2"]) > 0
                    else 0.0
                    for r in rows
                ],
                pa.float64(),
            ),
        }
    )


def dsir_clip_ess_sql(target_lang: str = "en",
                      clips: tuple[int, ...] = DEFAULT_ESS_CLIPS) -> str:
    values = ", ".join(f"({c})" for c in clips)
    return (
        "WITH d AS MATERIALIZED (\n"
        + dsir_weights_sql(target_lang=target_lang)
        + "\n), clips(clip_micro) AS (VALUES " + values + "),\n"
        "w AS (\n"
        " SELECT clips.clip_micro,\n"
        "  CAST(floor(exp(CAST((((LEAST(d.weight_micro,"
        f" clips.clip_micro) + {_EXP_OFF_LIT}) // 1024) * 1024"
        f" - {_EXP_OFF_LIT})"
        " AS DOUBLE) / 1000000.0) * 1000000.0) AS HUGEINT) AS wq\n"
        " FROM d CROSS JOIN clips\n"
        ")\n"
        "SELECT CAST(clip_micro AS BIGINT) AS clip_micro,"
        " CAST(COUNT(*) AS BIGINT) AS n_docs,\n"
        " CAST(SUM(wq) AS BIGINT) AS sum_wq,\n"
        " CAST(SUM(wq * wq) AS BIGINT) AS sum_wq2,\n"
        " CASE WHEN SUM(wq * wq) > 0 THEN\n"
        "  CAST(SUM(wq) AS DOUBLE) * CAST(SUM(wq) AS DOUBLE)\n"
        "   / CAST(SUM(wq * wq) AS DOUBLE)\n"
        " ELSE 0.0 END AS ess\n"
        "FROM w GROUP BY clip_micro"
    )
