"""Lexicon tagging: multi-pattern phrase matching over the corpus.

The curation move behind topic tagging, banned-phrase screening and
taxonomy labeling: given a fixed phrase list, count per-phrase total
occurrences and matched-document counts across the corpus.  The match
is plain substring semantics (non-overlapping, left-to-right —
``str.count`` / SQL ``replace``-length arithmetic), which the oracle
reproduces exactly; phrases with a proper border (self-overlapping
like ``"aa"``) would diverge between overlapping and non-overlapping
counters, so callers should avoid them (the default lexicon does).

Scale shape: each batch folds to at most ``len(phrases)`` partial
rows via vectorized ``pyarrow.compute.count_substring`` — no shuffle
of document text, one tiny keyed sum at the end.  The phrase list
rides into the tasks as a closure constant (broadcast once per task
spec, not per batch).
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# deterministic default lexicon over the synthetic corpus vocabulary:
# single words and bigrams, none with a proper border (no self-overlap)
DEFAULT_PHRASES = (
    "filter",
    "stream",
    "hash value",
    "fast table",
    "merge batch",
    "slow scan",
)


def phrase_match_counts(docs, phrases: tuple[str, ...] = DEFAULT_PHRASES):
    """(phrase, n_occurrences, n_docs) per lexicon phrase.

    n_occurrences counts non-overlapping substring hits summed over
    all documents; n_docs counts documents with at least one hit.
    """
    from ray.data.aggregate import Sum

    phrase_list = list(phrases)
    schema = pa.schema(
        [
            ("phrase", pa.string()),
            ("n_occurrences", pa.int64()),
            ("n_docs", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        text = t.column("text")
        occ, ndoc = [], []
        for p in phrase_list:
            c = pc.count_substring(text, p)
            occ.append(int(pc.sum(c).as_py() or 0))
            ndoc.append(
                int(pc.sum(pc.cast(pc.greater(c, 0), pa.int64())).as_py() or 0)
            )
        return pa.table(
            {
                "phrase": pa.array(phrase_list, pa.string()),
                "n_occurrences": pa.array(occ, pa.int64()),
                "n_docs": pa.array(ndoc, pa.int64()),
            }
        )

    out = (
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby("phrase")
        .aggregate(
            Sum("n_occurrences", alias_name="n_occurrences"),
            Sum("n_docs", alias_name="n_docs"),
        )
    )
    from ocr_ray.ops.dedup import _with_schema

    return _with_schema(out, schema)


def phrase_match_counts_sql(
    phrases: tuple[str, ...] = DEFAULT_PHRASES,
) -> str:
    values = ", ".join("('" + p.replace("'", "''") + "')" for p in phrases)
    return (
        f"WITH lex(phrase) AS (VALUES {values})\n"
        "SELECT lex.phrase,\n"
        " CAST(COALESCE(SUM((length(d.text) - length(replace(d.text, lex.phrase, '')))\n"
        "   // length(lex.phrase)), 0) AS BIGINT) AS n_occurrences,\n"
        " CAST(COALESCE(SUM(CASE WHEN contains(d.text, lex.phrase) THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_docs\n"
        "FROM lex CROSS JOIN documents d\n"
        "GROUP BY lex.phrase"
    )
